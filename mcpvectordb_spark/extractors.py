"""Dependency-free binary document extractors: PDF / DOCX / PPTX / XLSX.

The reference converts these through MarkItDown (/root/reference/src/
mcpvectordb/converter.py:44-68); this module is the container-local real
path for the four most common binary formats, pure stdlib (zlib, zipfile,
xml.etree).  Outputs Markdown-ish plain text, matching the converter
contract: return text, raise on malformed input (the caller turns raises
into error rows, never exceptions — batch-continues semantics).

Scope honestly stated:
- PDF: text operators (Tj / TJ / ' / ") from FlateDecode or raw content
  streams.  Simple fonts with identity-ish encodings (the overwhelming
  majority of text PDFs); no CMap/ToUnicode remapping, no OCR.
- DOCX/PPTX/XLSX: the OOXML zip member XML, text runs / shared strings.
- DOC/PPT/XLS (legacy OLE2): a real Compound File Binary reader
  (FAT/miniFAT/directory chains), then per-format record parsing —
  Word piece table ([MS-DOC] FIB + Clx/PlcPcd), PowerPoint
  TextCharsAtom/TextBytesAtom record walk ([MS-PPT]), Excel BIFF8
  record stream with SST/LABELSST/NUMBER/RK cells ([MS-XLS]).
  No OLE-embedded objects, no charts, no cell formulas' cached strings
  beyond the STRING record.
"""

from __future__ import annotations

import re
import struct
import zipfile
import zlib
from io import BytesIO
from xml.etree import ElementTree

# ---------------------------------------------------------------------------
# PDF

_PDF_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}
_OP_RE = re.compile(rb"[A-Za-z'\"*01]+")


def _pdf_streams(raw: bytes):
    """Yield decompressed candidate content streams (skips images/fonts)."""
    for m in re.finditer(rb"stream\r?\n", raw):
        start = m.end()
        end = raw.find(b"endstream", start)
        if end < 0:
            continue
        head = raw.rfind(b"<<", 0, m.start())
        d = raw[head:m.start()] if head >= 0 else b""
        if b"/Image" in d or b"/FontFile" in d or b"/XRef" in d:
            continue
        data = raw[start:end].rstrip(b"\r\n")
        if b"FlateDecode" in d:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        yield data


def _pdf_tokens(s: bytes):
    """Minimal content-stream tokenizer: ('str', bytes) | ('op', bytes)."""
    i, n = 0, len(s)
    while i < n:
        c = s[i:i + 1]
        if c == b"(":
            j, depth, buf = i + 1, 1, bytearray()
            while j < n and depth:
                ch = s[j:j + 1]
                if ch == b"\\":
                    nxt = s[j + 1:j + 2]
                    if nxt in _PDF_ESC:
                        buf += _PDF_ESC[nxt]
                        j += 2
                    elif nxt.isdigit():
                        k = j + 1
                        while k < min(j + 4, n) and s[k:k + 1].isdigit():
                            k += 1
                        buf.append(int(s[j + 1:k], 8) & 0xFF)
                        j = k
                    else:  # line continuation or unknown escape
                        j += 2
                elif ch == b"(":
                    depth += 1
                    buf += ch
                    j += 1
                elif ch == b")":
                    depth -= 1
                    if depth:
                        buf += ch
                    j += 1
                else:
                    buf += ch
                    j += 1
            yield ("str", bytes(buf))
            i = j
        elif c == b"<" and s[i + 1:i + 2] != b"<":
            j = s.find(b">", i)
            if j < 0:
                break
            hexs = re.sub(rb"\s", b"", s[i + 1:j])
            if len(hexs) % 2:
                hexs += b"0"
            try:
                yield ("str", bytes.fromhex(hexs.decode("ascii")))
            except (ValueError, UnicodeDecodeError):
                pass
            i = j + 1
        elif c == b"<":  # dict <<
            i += 2
        else:
            m = _OP_RE.match(s, i)
            if m:
                yield ("op", m.group())
                i = m.end()
            else:
                i += 1


def _decode_pdf_string(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1", errors="replace")


def extract_pdf(raw: bytes) -> str:
    """Concatenate the text shown by every content stream's text operators."""
    if not raw.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    parts: list[str] = []
    for stream in _pdf_streams(raw):
        if b"BT" not in stream:
            continue
        pending: list[str] = []
        line: list[str] = []

        def flush_line():
            if line:
                parts.append("".join(line))
                line.clear()

        for kind, val in _pdf_tokens(stream):
            if kind == "str":
                pending.append(_decode_pdf_string(val))
            elif val in (b"Tj", b"TJ"):
                line.extend(pending)
                pending.clear()
            elif val in (b"'", b'"'):
                flush_line()
                line.extend(pending)
                pending.clear()
            elif val in (b"Td", b"TD", b"T*", b"ET"):
                pending.clear()  # positioning operands, not text
                flush_line()
        flush_line()
    text = "\n".join(p for p in (s.strip() for s in parts) if p)
    if not text:
        raise ValueError("PDF contains no extractable text operators (scanned/image-only?)")
    return text


# ---------------------------------------------------------------------------
# OOXML (docx / pptx / xlsx) — zip members of namespaced XML

def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _zip_xml(zf: zipfile.ZipFile, name: str) -> ElementTree.Element:
    return ElementTree.fromstring(zf.read(name))


def extract_docx(raw: bytes) -> str:
    """word/document.xml paragraphs; <w:t> runs joined, one line per <w:p>."""
    with zipfile.ZipFile(BytesIO(raw)) as zf:
        root = _zip_xml(zf, "word/document.xml")
    lines: list[str] = []
    for para in root.iter():
        if _local(para.tag) != "p":
            continue
        runs = [el.text or "" for el in para.iter() if _local(el.tag) == "t"]
        lines.append("".join(runs))
    text = "\n".join(lines).strip()
    if not text:
        raise ValueError("docx contains no text")
    return text


def extract_pptx(raw: bytes) -> str:
    """All ppt/slides/slideN.xml in slide order; <a:t> runs, one line per
    paragraph, a blank line between slides."""
    with zipfile.ZipFile(BytesIO(raw)) as zf:
        slides = sorted(
            (n for n in zf.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[-1]).group()),
        )
        blocks: list[str] = []
        for name in slides:
            root = _zip_xml(zf, name)
            lines = []
            for para in root.iter():
                if _local(para.tag) != "p":
                    continue
                runs = [el.text or "" for el in para.iter() if _local(el.tag) == "t"]
                if "".join(runs).strip():
                    lines.append("".join(runs))
            if lines:
                blocks.append("\n".join(lines))
    text = "\n\n".join(blocks).strip()
    if not text:
        raise ValueError("pptx contains no text")
    return text


def extract_xlsx(raw: bytes) -> str:
    """Sheets as tab-separated rows (shared strings resolved, numbers as-is)."""
    with zipfile.ZipFile(BytesIO(raw)) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            for si in _zip_xml(zf, "xl/sharedStrings.xml"):
                shared.append("".join(el.text or "" for el in si.iter() if _local(el.tag) == "t"))
        sheets = sorted(
            (n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[-1]).group()),
        )
        blocks: list[str] = []
        for name in sheets:
            root = _zip_xml(zf, name)
            rows: list[str] = []
            for row in root.iter():
                if _local(row.tag) != "row":
                    continue
                cells: list[str] = []
                for c in row:
                    if _local(c.tag) != "c":
                        continue
                    v = next((el.text or "" for el in c.iter() if _local(el.tag) in ("v", "t")), "")
                    if c.get("t") == "s" and v != "":
                        v = shared[int(v)]
                    cells.append(v)
                if any(cells):
                    rows.append("\t".join(cells))
            if rows:
                blocks.append("\n".join(rows))
    text = "\n\n".join(blocks).strip()
    if not text:
        raise ValueError("xlsx contains no cell values")
    return text


# ---------------------------------------------------------------------------
# OLE2 / CFB (Compound File Binary) — container of the legacy doc/ppt/xls
# formats.  The reference routes these through MarkItDown's legacy handlers
# (/root/reference/src/mcpvectordb/converter.py:13-39); here the container
# and record parsing are pure stdlib.

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF


class _Cfb:
    """Minimal CFB reader: header → DIFAT → FAT → directory → streams,
    with small streams resolved through the miniFAT/mini-stream.  Malformed
    chains raise ValueError (the converter turns raises into error rows)."""

    def __init__(self, raw: bytes):
        if raw[:8] != _CFB_MAGIC:
            raise ValueError("not an OLE2 compound file (bad magic)")
        if len(raw) < 512:
            raise ValueError("truncated OLE2 header")
        (sector_shift,) = struct.unpack_from("<H", raw, 30)
        (mini_shift,) = struct.unpack_from("<H", raw, 32)
        if not 6 <= sector_shift <= 12 or mini_shift >= sector_shift:
            raise ValueError("implausible OLE2 sector shifts")
        self.raw = raw
        self.ssz = 1 << sector_shift
        self.mssz = 1 << mini_shift
        (first_dir,) = struct.unpack_from("<I", raw, 48)
        (self.cutoff,) = struct.unpack_from("<I", raw, 56)
        first_mini, n_mini, first_difat, n_difat = struct.unpack_from("<IIII", raw, 60)
        difat = list(struct.unpack_from("<109I", raw, 76))
        sec, seen = first_difat, 0
        while sec not in (_ENDOFCHAIN, _FREESECT) and seen < n_difat:
            entries = struct.unpack(f"<{self.ssz // 4}I", self._sector(sec))
            difat += entries[:-1]
            sec = entries[-1]
            seen += 1
        fat: list[int] = []
        for s in difat:
            if s in (_ENDOFCHAIN, _FREESECT):
                continue
            fat += struct.unpack(f"<{self.ssz // 4}I", self._sector(s))
        self.fat = fat

        dir_raw = self._chain(first_dir)
        self.entries: list[tuple[str, int, int, int]] = []  # (name, type, start, size)
        for off in range(0, len(dir_raw) - 127, 128):
            ent = dir_raw[off:off + 128]
            (cb,) = struct.unpack_from("<H", ent, 64)
            name = ent[: max(min(cb, 64) - 2, 0)].decode("utf-16-le", errors="replace")
            otype = ent[66]
            start, size = struct.unpack_from("<IQ", ent, 116)
            if otype in (2, 5):
                self.entries.append((name, otype, start, size))

        root = next((e for e in self.entries if e[1] == 5), None)
        if root is None:
            raise ValueError("OLE2 file has no root directory entry")
        self.mini_stream = self._chain(root[2])[: root[3]] if root[3] else b""
        mf_raw = self._chain(first_mini) if n_mini else b""
        self.minifat = struct.unpack(f"<{len(mf_raw) // 4}I", mf_raw)

    def _sector(self, i: int) -> bytes:
        off = (i + 1) * self.ssz
        if off + self.ssz > len(self.raw):
            raise ValueError(f"OLE2 sector {i} beyond end of file")
        return self.raw[off:off + self.ssz]

    def _chain(self, start: int) -> bytes:
        parts, sec, hops = [], start, 0
        limit = len(self.raw) // self.ssz + 2
        while sec not in (_ENDOFCHAIN, _FREESECT):
            parts.append(self._sector(sec))
            if sec >= len(self.fat) or (hops := hops + 1) > limit:
                raise ValueError("broken OLE2 FAT chain")
            sec = self.fat[sec]
        return b"".join(parts)

    def _mini_chain(self, start: int) -> bytes:
        parts, sec, hops = [], start, 0
        limit = len(self.mini_stream) // self.mssz + 2
        while sec not in (_ENDOFCHAIN, _FREESECT):
            parts.append(self.mini_stream[sec * self.mssz:(sec + 1) * self.mssz])
            if sec >= len(self.minifat) or (hops := hops + 1) > limit:
                raise ValueError("broken OLE2 miniFAT chain")
            sec = self.minifat[sec]
        return b"".join(parts)

    def stream(self, name: str) -> bytes:
        for ename, otype, start, size in self.entries:
            if otype == 2 and ename == name:
                if size == 0:  # spec: zero-length streams carry ENDOFCHAIN
                    return b""
                data = self._mini_chain(start) if size < self.cutoff else self._chain(start)
                if len(data) < size:
                    raise ValueError(f"OLE2 stream {name!r} shorter than directory size")
                return data[:size]
        raise KeyError(name)


# --- Word 97+ (.doc): FIB → Clx piece table → text pieces ([MS-DOC]) ------

_DOC_CTRL = re.compile(r"[\x00-\x08\x0c-\x1f]")


def extract_doc(raw: bytes) -> str:
    """Main-document text via the real piece table: FibBase.fWhichTblStm
    picks 0Table/1Table, fcClx/lcbClx locate the Clx, each Pcd maps a CP run
    to a WordDocument offset (cp1252 when fCompressed, else UTF-16LE)."""
    cfb = _Cfb(raw)
    wd = cfb.stream("WordDocument")
    if len(wd) < 0x01AA:
        raise ValueError("WordDocument stream too short for a FIB")
    (w_ident,) = struct.unpack_from("<H", wd, 0)
    if w_ident != 0xA5EC:
        raise ValueError("not a Word binary file (bad wIdent)")
    (flags,) = struct.unpack_from("<H", wd, 10)
    table_name = "1Table" if flags & 0x0200 else "0Table"
    # FibRgLw97 starts at 32+2+28+2 = 64; ccpText is its 4th dword (offset 76)
    (ccp_text,) = struct.unpack_from("<i", wd, 0x004C)
    # fibRgFcLcbBlob starts at 154; fcClx/lcbClx are pair index 33 → 418
    fc_clx, lcb_clx = struct.unpack_from("<II", wd, 0x01A2)
    table = cfb.stream(table_name)
    clx = table[fc_clx:fc_clx + lcb_clx]
    i = 0
    while i < len(clx) and clx[i] == 0x01:  # skip Prc property blocks
        (cb,) = struct.unpack_from("<h", clx, i + 1)
        i += 3 + max(cb, 0)
    if i + 5 > len(clx) or clx[i] != 0x02:
        raise ValueError("doc Clx has no piece table (Pcdt)")
    (lcb,) = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5:i + 5 + lcb]
    if len(plc) < lcb or lcb < 4 or (lcb - 4) % 12:
        raise ValueError("malformed PlcPcd")
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out: list[str] = []
    remaining = max(ccp_text, 0)
    for k in range(n):
        if remaining <= 0:
            break
        ncp = min(cps[k + 1] - cps[k], remaining)
        (fc_raw,) = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * k + 2)
        fc = fc_raw & 0x3FFFFFFF
        if fc_raw & 0x40000000:  # fCompressed: 8-bit cp1252 at fc/2
            out.append(wd[fc // 2:fc // 2 + ncp].decode("cp1252", errors="replace"))
        else:
            out.append(wd[fc:fc + 2 * ncp].decode("utf-16-le", errors="replace"))
        remaining -= ncp
    text = "".join(out)
    # Word's in-stream markers: CR = paragraph, 0x0B = soft break, 0x07 = cell
    text = text.replace("\r\n", "\n").replace("\r", "\n").replace("\x0b", "\n")
    text = _DOC_CTRL.sub("", text.replace("\x07", "\t")).strip()
    if not text:
        raise ValueError("doc contains no text")
    return text


# --- PowerPoint 97+ (.ppt): record-tree walk for text atoms ([MS-PPT]) ----

_PPT_TEXT_CHARS = 0x0FA0   # TextCharsAtom: UTF-16LE
_PPT_TEXT_BYTES = 0x0FA8   # TextBytesAtom: 8-bit cp1252
_PPT_CSTRING = 0x0FBA      # CString (titles/notes metadata): UTF-16LE


def extract_ppt(raw: bytes) -> str:
    """Walk the 'PowerPoint Document' record tree (8-byte headers; a record
    with recVer 0xF is a container) collecting text atoms in stream order."""
    cfb = _Cfb(raw)
    stream = cfb.stream("PowerPoint Document")
    texts: list[str] = []

    def walk(pos: int, end: int, depth: int) -> None:
        while pos + 8 <= end and depth < 32:
            ver_inst, rtype, rlen = struct.unpack_from("<HHI", stream, pos)
            pos += 8
            rend = min(pos + rlen, end)
            if ver_inst & 0x000F == 0x000F:
                walk(pos, rend, depth + 1)
            elif rtype in (_PPT_TEXT_CHARS, _PPT_CSTRING):
                texts.append(stream[pos:rend].decode("utf-16-le", errors="replace"))
            elif rtype == _PPT_TEXT_BYTES:
                texts.append(stream[pos:rend].decode("cp1252", errors="replace"))
            pos = rend

    walk(0, len(stream), 0)
    lines = [t.replace("\r", "\n").strip() for t in texts]
    text = "\n".join(t for t in lines if t)
    if not text:
        raise ValueError("ppt contains no text")
    return text


# --- Excel 97+ (.xls): BIFF8 record stream ([MS-XLS]) ---------------------

def _xl_unicode(data: bytes, pos: int, cch_bytes: int) -> tuple[str, int]:
    """XLUnicodeRichExtendedString at pos → (text, next_pos)."""
    if cch_bytes == 1:
        cch = data[pos]
        pos += 1
    else:
        (cch,) = struct.unpack_from("<H", data, pos)
        pos += 2
    opts = data[pos]
    pos += 1
    c_run = cb_ext = 0
    if opts & 0x08:  # fRichSt
        (c_run,) = struct.unpack_from("<H", data, pos)
        pos += 2
    if opts & 0x04:  # fExtSt
        (cb_ext,) = struct.unpack_from("<I", data, pos)
        pos += 4
    if opts & 0x01:  # fHighByte: UTF-16LE
        s = data[pos:pos + 2 * cch].decode("utf-16-le", errors="replace")
        pos += 2 * cch
    else:
        s = data[pos:pos + cch].decode("latin-1", errors="replace")
        pos += cch
    return s, pos + 4 * c_run + cb_ext


class _XlsStrCursor:
    """Cursor over an SST's record bodies (SST + its CONTINUE records).
    [MS-XLS]: strings may split across CONTINUE boundaries; header fields
    never split mid-field, but CHARACTER DATA does — and each continued
    fragment begins with a fresh grbit byte that may switch the encoding
    (a string can be compressed in one record and UTF-16 in the next)."""

    def __init__(self, parts: list[bytes]):
        self.parts = parts
        self.r = 0
        self.pos = 0

    def _norm(self) -> None:
        while self.r < len(self.parts) and self.pos >= len(self.parts[self.r]):
            self.r += 1
            self.pos = 0

    def read(self, n: int) -> bytes:
        """Raw bytes, spanning records transparently (headers / rich-run /
        ext-data — no grbit at the boundary for these)."""
        out = bytearray()
        while n > 0:
            self._norm()
            if self.r >= len(self.parts):
                raise ValueError("xls SST truncated")
            part = self.parts[self.r]
            take = min(n, len(part) - self.pos)
            out += part[self.pos:self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: int) -> str:
        out: list[str] = []
        while cch > 0:
            self._norm()
            if self.r >= len(self.parts):
                raise ValueError("xls SST truncated in character data")
            avail = len(self.parts[self.r]) - self.pos
            width = 2 if high else 1
            n = min(cch, avail // width)
            if n == 0:
                raise ValueError("xls SST fragment not on a character boundary")
            frag = self.read(n * width)
            out.append(frag.decode("utf-16-le" if high else "latin-1", errors="replace"))
            cch -= n
            if cch > 0:  # crossing into a CONTINUE: fresh grbit byte
                self._norm()
                high = self.read(1)[0] & 0x01
        return "".join(out)


def _read_sst_string(cur: _XlsStrCursor) -> str:
    (cch,) = struct.unpack("<H", cur.read(2))
    opts = cur.read(1)[0]
    c_run = struct.unpack("<H", cur.read(2))[0] if opts & 0x08 else 0
    cb_ext = struct.unpack("<I", cur.read(4))[0] if opts & 0x04 else 0
    s = cur.read_chars(cch, opts & 0x01)
    skip = 4 * c_run + cb_ext
    if skip:
        cur.read(skip)
    return s


def _rk_value(rk: int) -> float:
    v: float
    if rk & 0x02:  # fInt: signed 30-bit integer
        v = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFF))[0] >> 2)
    else:  # top 30 bits are the high bits of an IEEE double
        v = struct.unpack("<d", struct.pack("<II", 0, rk & 0xFFFFFFFC))[0]
    return v / 100.0 if rk & 0x01 else v


def _num_str(x: float) -> str:
    return str(int(x)) if float(x).is_integer() and abs(x) < 1e15 else repr(x)


def extract_xls(raw: bytes) -> str:
    """Workbook-globals SST + per-sheet cell records (LABELSST / LABEL /
    NUMBER / RK / MULRK / FORMULA-cached STRING), rendered like the xlsx
    extractor: tab-separated rows, a blank line between sheets.  SSTs that
    spill into CONTINUE records (every real-world workbook with >8 KB of
    strings) are handled via :class:`_XlsStrCursor`, including mid-string
    splits that switch encoding at the boundary."""
    cfb = _Cfb(raw)
    wb = None
    for name in ("Workbook", "Book"):
        try:
            wb = cfb.stream(name)
            break
        except KeyError:
            continue
    if wb is None:
        raise ValueError("xls has no Workbook stream")

    sst: list[str] = []
    sheets: list[dict[tuple[int, int], str]] = []
    cur: dict[tuple[int, int], str] | None = None
    pending_string_cell: tuple[int, int] | None = None
    pos, bof_seen = 0, 0
    while pos + 4 <= len(wb):
        rid, rlen = struct.unpack_from("<HH", wb, pos)
        pos += 4
        data = wb[pos:pos + rlen]
        pos += rlen
        if rid == 0x0809:  # BOF — first is globals, later ones open sheets
            bof_seen += 1
            if bof_seen > 1:
                cur = {}
                sheets.append(cur)
            continue
        if rid == 0x00FC:  # SST (+ any CONTINUE records it spills into)
            parts = [data]
            while pos + 4 <= len(wb):
                nid, nlen = struct.unpack_from("<HH", wb, pos)
                if nid != 0x003C:
                    break
                parts.append(wb[pos + 4:pos + 4 + nlen])
                pos += 4 + nlen
            (cst_unique,) = struct.unpack_from("<I", data, 4)
            cursor = _XlsStrCursor([parts[0][8:]] + parts[1:])
            for _ in range(cst_unique):
                sst.append(_read_sst_string(cursor))
            continue
        if cur is None:
            continue
        if rid == 0x00FD and rlen >= 10:  # LABELSST
            rw, col, _, isst = struct.unpack_from("<HHHI", data, 0)
            cur[(rw, col)] = sst[isst] if isst < len(sst) else ""
        elif rid == 0x0204 and rlen >= 8:  # LABEL
            rw, col = struct.unpack_from("<HH", data, 0)
            cur[(rw, col)], _ = _xl_unicode(data, 6, 2)
        elif rid == 0x0203 and rlen >= 14:  # NUMBER
            rw, col = struct.unpack_from("<HH", data, 0)
            (x,) = struct.unpack_from("<d", data, 6)
            cur[(rw, col)] = _num_str(x)
        elif rid == 0x027E and rlen >= 10:  # RK
            rw, col = struct.unpack_from("<HH", data, 0)
            (rk,) = struct.unpack_from("<I", data, 6)
            cur[(rw, col)] = _num_str(_rk_value(rk))
        elif rid == 0x00BD and rlen >= 12:  # MULRK
            rw, col_first = struct.unpack_from("<HH", data, 0)
            (col_last,) = struct.unpack_from("<H", data, rlen - 2)
            for j in range(col_last - col_first + 1):
                (rk,) = struct.unpack_from("<I", data, 4 + 6 * j + 2)
                cur[(rw, col_first + j)] = _num_str(_rk_value(rk))
        elif rid == 0x0006 and rlen >= 14:  # FORMULA — cache a STRING follow-up
            rw, col = struct.unpack_from("<HH", data, 0)
            pending_string_cell = (rw, col)
        elif rid == 0x0207 and pending_string_cell is not None:  # STRING
            cur[pending_string_cell], _ = _xl_unicode(data, 0, 2)
            pending_string_cell = None

    blocks: list[str] = []
    for cells in sheets:
        if not cells:
            continue
        rows: dict[int, dict[int, str]] = {}
        for (rw, col), v in cells.items():
            rows.setdefault(rw, {})[col] = v
        lines = []
        for rw in sorted(rows):
            cols = rows[rw]
            width = max(cols) + 1
            lines.append("\t".join(cols.get(c, "") for c in range(width)))
        blocks.append("\n".join(lines))
    text = "\n\n".join(blocks).strip()
    if not text:
        raise ValueError("xls contains no cell values")
    return text
