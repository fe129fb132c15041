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
"""

from __future__ import annotations

import re
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
