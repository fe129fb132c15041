"""JPEG decode (baseline AND progressive), pure stdlib + numpy — no
imaging library.

The reference's image path hands JPEG files to MarkItDown/PIL
(/root/reference/src/mcpvectordb/converter.py:13-39); this container has no
codec library, so the entropy decode is implemented directly from the
JFIF/JPEG spec (ITU-T T.81):

- marker parse: DQT (8/16-bit tables), SOF0/SOF2, DHT (canonical Huffman
  from BITS/HUFFVAL), multi-SOS, DRI/RSTn restarts;
- baseline: per-MCU Huffman DC (category + EXTEND) and AC (run/size,
  ZRL, EOB) with FF00 byte-unstuffing;
- progressive (T.81 G.2): scans accumulate into per-component
  coefficient buffers — interleaved/non-interleaved DC first + one-bit
  refinement, per-band AC first with EOB runs, and AC
  successive-approximation refinement with zero-history runs and
  interleaved correction bits (the libjpeg decode_mcu_AC_refine
  semantics), reconstructed once at EOI;
- reconstruction: dequantize in zig-zag order, orthonormal 8×8 IDCT as
  two numpy matmuls per block, nearest-neighbour chroma upsampling for
  4:2:0/4:2:2, BT.601 YCbCr→RGB.

Scope: Huffman 8-bit, 1 or 3 components, sequential or progressive —
effectively every web JPEG.  Arithmetic coding, 12-bit, and hierarchical
return None; callers fall back to header dims + byte-histogram features
(sources/multimodal.py).

Everything here is per-payload CPU work inside an Arrow-batched stage —
no Spark semantics, so the hot loop favours clarity; at 100 TB the
parallelism unit is the image row, not the pixel.
"""

from __future__ import annotations

import struct


def _idct_matrix():
    import numpy as np

    # orthonormal DCT-II basis; IDCT(B) = T.T @ B @ T
    k = np.arange(8)
    T = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * 0.5
    T[0, :] *= 1 / np.sqrt(2)
    return T


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _Huff:
    """Canonical Huffman table as a {(length, code): value} dict."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: caller handles via sync()
            else:
                return False  # EOI / next segment
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def bit(self) -> int:
        if self.n == 0 and not self._fill():
            return 0  # spec: pad with zero bits past the end
        if self.n == 0:
            return 0
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            v = table.lut.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker and clear the bit state."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.acc = self.n = 0
                return
            p += 1
        self.pos = len(d)
        self.acc = self.n = 0


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes):
    """Baseline JPEG → HxWx3 uint8 RGB, or None if out of scope."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    coefs = None  # progressive: per-component DCT coefficient accumulators
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI — before the segment-length read: it has none
            if frame is not None and frame.get("progressive"):
                for c in frame["comps"]:
                    if c["tq"] not in qt:
                        return None
                return _reconstruct_progressive(frame, coefs, qt)
            break
        if pos + 4 > n:
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                if prec:
                    vals = np.frombuffer(body[i:i + 128], ">u2").astype(np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(body[i:i + 64], np.uint8).astype(np.int32)
                    i += 64
                if len(vals) < 64:
                    return None  # truncated table
                tbl = np.zeros(64, np.int32)
                tbl[_ZIGZAG] = vals  # stored zig-zag → natural order
                qt[tid] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                cnt = sum(bits)
                vals = body[i + 17:i + 17 + cnt]
                (huff_ac if cls else huff_dc)[tid] = _Huff(bits, vals)
                i += 17 + cnt
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if len(body) < 6:
                return None
            _, h, w, nc = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + 3 * nc or w == 0 or h == 0:
                return None
            if w * h > 100_000_000:  # 100 MP: refuse absurd (garbage) dims
                return None          # before any buffer allocation
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                sh, sv = samp >> 4, samp & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    return None
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                coefs = _alloc_coefs(frame)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # extended / lossless / arithmetic: out of scope
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None or len(body) < 4 + 2 * body[0]:
                return None
            ns = body[0]
            scomp_ids = []
            tabs = {}
            for s in range(ns):
                cid, tt = body[1 + 2 * s], body[2 + 2 * s]
                tabs[cid] = (tt >> 4, tt & 0x0F)
                scomp_ids.append(cid)
            if not frame["progressive"]:
                for c in frame["comps"]:
                    dc_t, ac_t = tabs.get(c["id"], (None, None))
                    if dc_t not in huff_dc or ac_t not in huff_ac or c["tq"] not in qt:
                        return None  # scan references a table that never arrived
                return _decode_scan(
                    payload, pos + 2 + seg_len, frame, tabs, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            pos = _decode_progressive_scan(
                payload, pos + 2 + seg_len, frame, scomp_ids, tabs,
                ss, se, ahal >> 4, ahal & 0x0F,
                coefs, huff_dc, huff_ac, restart_interval,
            )
            if pos is None:
                return None
            continue  # pos now points at the next marker
        pos += 2 + seg_len
    return None


def _decode_scan(payload, pos, frame, tabs, qt, huff_dc, huff_ac, restart_interval):
    import numpy as np

    T = _idct_matrix()
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), np.float64))

    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = tabs[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, np.float64)
                        size = reader.huff(huff_dc[dc_t])
                        pred[ci] += _extend(reader.bits(size), size)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(huff_ac[ac_t])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: sixteen zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                break
                            coef[_ZIGZAG[k]] = _extend(reader.bits(s), s)
                            k += 1
                        block = coef.reshape(8, 8) * q
                        px = T.T @ block @ T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    return _planes_to_rgb(frame, planes)


def _planes_to_rgb(frame, planes):
    """Nearest-neighbour chroma upsample, crop, BT.601 convert — shared by
    the baseline and progressive reconstruction paths."""
    import numpy as np

    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive (SOF2): scans accumulate into per-component coefficient
# buffers — spectral selection picks the band, successive approximation
# delivers magnitude bits — reconstructed once at EOI (T.81 G.2).


def _frame_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _comp_block_dims(frame, c):
    """Non-interleaved scans cover the component's OWN ceil dims, not the
    MCU-padded grid (T.81 A.2.2)."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _alloc_coefs(frame):
    import numpy as np

    _, _, mcux, mcuy = _frame_geometry(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
        for c in frame["comps"]
    ]


def _ac_first_band(reader, htab, block, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.huff(htab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.bits(r)
            break
        k += r
        if k > se:
            break
        block[_ZIGZAG[k]] = _extend(reader.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_band(reader, htab, block, ss, se, al, eobrun):
    """Successive-approximation refinement (T.81 G.2.2 / libjpeg
    decode_mcu_AC_refine): already-nonzero coefficients receive one
    correction bit as they are passed over; zero-history runs count toward
    the next newly-significant ±1<<Al."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.huff(htab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break
                # r == 15: skip 16 zero-history positions
            else:  # s must be 1 in a refinement scan
                val = p1 if reader.bit() else m1
            while k <= se:
                z = _ZIGZAG[k]
                cur = int(block[z])
                if cur != 0:
                    if reader.bit() and (cur & p1) == 0:
                        block[z] = cur + (p1 if cur > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[_ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = _ZIGZAG[k]
            cur = int(block[z])
            if cur != 0:
                if reader.bit() and (cur & p1) == 0:
                    block[z] = cur + (p1 if cur > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    payload, pos, frame, scomp_ids, tabs, ss, se, ah, al,
    coefs, huff_dc, huff_ac, restart_interval,
):
    """Decode ONE scan into the coefficient buffers; returns the payload
    position of the next marker, or None on malformed input."""
    comps = frame["comps"]
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    sci = [by_id.get(cid) for cid in scomp_ids]
    if None in sci:
        return None
    reader = _BitReader(payload, pos)
    try:
        if ss == 0:  # DC scan (interleaved over its components)
            if se != 0:
                return None
            for ci in sci:
                if ah == 0 and tabs[comps[ci]["id"]][0] not in huff_dc:
                    return None
            _, _, mcux, mcuy = _frame_geometry(frame)
            interleaved = len(sci) > 1
            pred = {ci: 0 for ci in sci}
            unit = 0
            if interleaved:
                for my in range(mcuy):
                    for mx in range(mcux):
                        if restart_interval and unit and unit % restart_interval == 0:
                            reader.sync_restart()
                            pred = {ci: 0 for ci in sci}
                        for ci in sci:
                            c = comps[ci]
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    block = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                                    _dc_one(reader, huff_dc, tabs, comps, ci, block, pred, ah, al)
                        unit += 1
            else:
                ci = sci[0]
                bh, bw = _comp_block_dims(frame, comps[ci])
                for by in range(bh):
                    for bx in range(bw):
                        if restart_interval and unit and unit % restart_interval == 0:
                            reader.sync_restart()
                            pred = {ci: 0 for ci in sci}
                        _dc_one(reader, huff_dc, tabs, comps, ci, coefs[ci][by, bx], pred, ah, al)
                        unit += 1
        else:  # AC scan: exactly one component, never interleaved
            if len(sci) != 1 or not (1 <= ss <= se <= 63):
                return None
            ci = sci[0]
            ac_t = tabs[comps[ci]["id"]][1]
            if ah == 0 and ac_t not in huff_ac:
                return None
            htab = huff_ac.get(ac_t)
            if htab is None:
                return None
            bh, bw = _comp_block_dims(frame, comps[ci])
            eobrun = 0
            unit = 0
            fn = _ac_first_band if ah == 0 else _ac_refine_band
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        reader.sync_restart()
                        eobrun = 0
                    eobrun = fn(reader, htab, coefs[ci][by, bx], ss, se, al, eobrun)
                    unit += 1
    except (ValueError, IndexError):
        return None

    # skip to the next marker (the reader stops AT an FF of a marker; any
    # residual RST markers between scans are stepped over)
    p = reader.pos
    while p + 1 < len(payload):
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            if 0xD0 <= payload[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(payload)


def _dc_one(reader, huff_dc, tabs, comps, ci, block, pred, ah, al):
    if ah == 0:
        size = reader.huff(huff_dc[tabs[comps[ci]["id"]][0]])
        pred[ci] += _extend(reader.bits(size), size)
        block[0] = pred[ci] << al
    else:  # refinement: one raw bit per block
        if reader.bit():
            block[0] = int(block[0]) | (1 << al)


def _reconstruct_progressive(frame, coefs, qt):
    import numpy as np

    T = _idct_matrix()
    _, _, mcux, mcuy = _frame_geometry(frame)
    planes = []
    for ci, c in enumerate(frame["comps"]):
        q = qt[c["tq"]]
        plane = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        buf = coefs[ci]
        for by in range(buf.shape[0]):
            for bx in range(buf.shape[1]):
                block = buf[by, bx].astype(np.float64).reshape(8, 8) * q
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = T.T @ block @ T + 128.0
        planes.append(plane)
    return _planes_to_rgb(frame, planes)
