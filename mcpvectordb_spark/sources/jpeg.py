"""Baseline JPEG decode, pure stdlib + numpy — no imaging library.

The reference's image path hands JPEG files to MarkItDown/PIL
(/root/reference/src/mcpvectordb/converter.py:13-39); this container has no
codec library, so the entropy decode is implemented directly from the
JFIF/JPEG spec (ITU-T T.81):

- marker parse: DQT (8/16-bit tables), SOF0 (baseline sequential DCT),
  DHT (canonical Huffman from BITS/HUFFVAL), SOS, DRI/RSTn restarts;
- entropy decode: per-MCU Huffman DC (category + EXTEND) and AC
  (run/size, ZRL, EOB) with FF00 byte-unstuffing;
- reconstruction: dequantize in zig-zag order, orthonormal 8×8 IDCT as
  two numpy matmuls per block, nearest-neighbour chroma upsampling for
  4:2:0/4:2:2, BT.601 YCbCr→RGB.

Scope: baseline (SOF0) Huffman 8-bit, 1 or 3 components — the overwhelming
majority of web JPEGs.  Progressive (SOF2), arithmetic coding, and 12-bit
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
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
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
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                return None
            _, h, w, nc = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + 3 * nc or w == 0 or h == 0:
                return None
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                sh, sv = samp >> 4, samp & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    return None
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # progressive / extended / arithmetic: out of scope
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None or len(body) < 1 + 2 * body[0]:
                return None
            ns = body[0]
            tabs = {}
            for s in range(ns):
                cid, tt = body[1 + 2 * s], body[2 + 2 * s]
                tabs[cid] = (tt >> 4, tt & 0x0F)
            for c in frame["comps"]:
                dc_t, ac_t = tabs.get(c["id"], (None, None))
                if dc_t not in huff_dc or ac_t not in huff_ac or c["tq"] not in qt:
                    return None  # scan references a table that never arrived
            return _decode_scan(
                payload, pos + 2 + seg_len, frame, tabs, qt, huff_dc, huff_ac,
                restart_interval,
            )
        elif marker == 0xD9:
            break
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

    # upsample to full resolution (nearest), crop, colour-convert
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
