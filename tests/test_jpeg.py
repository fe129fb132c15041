"""Baseline JPEG decoder vs a hand-rolled numpy encoder.

The encoder below is test apparatus: forward DCT + quantize + canonical
Huffman (every used symbol at one code length, which is a legal JPEG
table), emitting real SOI/DQT/SOF0/DHT/SOS/EOI streams — so the decoder
is exercised against independently-constructed spec-conformant bytes,
not against its own inverse.
"""

import struct

import numpy as np
import pytest

from mcpvectordb_spark.sources.jpeg import _ZIGZAG, _idct_matrix, decode_jpeg

T = _idct_matrix()


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val, cnt):
        for i in range(cnt - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _category(v):
    return int(abs(int(v))).bit_length()


def _extra_bits(v, size):
    return int(v) if v >= 0 else int(v) + (1 << size) - 1


def _block_symbols(zz, pred):
    """(dc_symbol, dc_extra), [(ac_symbol, ac_extra)...] for one block."""
    diff = int(zz[0]) - pred
    s = _category(diff)
    dc = (s, (_extra_bits(diff, s), s))
    acs = []
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))
            run -= 16
        s = _category(v)
        acs.append(((run << 4) | s, (_extra_bits(v, s), s)))
        run = 0
    if run:
        acs.append((0x00, (0, 0)))  # EOB
    return dc, acs, int(zz[0])


def _huff_table(symbols):
    """All symbols at one canonical length L: legal, and the decoder's
    canonical reconstruction assigns code i to the i-th listed symbol."""
    syms = sorted(set(symbols))
    L = max(2, (len(syms) + 1).bit_length())  # leave the all-ones code unused
    bits = [0] * 16
    bits[L - 1] = len(syms)
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return bits, bytes(syms), enc


def _quant_zz(q):
    tbl = np.asarray(q, np.int32).reshape(64)
    return bytes(int(tbl[_ZIGZAG[k]]) for k in range(64))


def _plane_blocks(plane, bh, bw_):
    """Pad a plane to block multiples by edge replication, yield 8×8 blocks
    in raster order grouped per MCU externally."""
    h, w = plane.shape
    ph, pw = bh * 8, bw_ * 8
    out = np.empty((ph, pw), np.float64)
    out[:h, :w] = plane
    out[h:, :w] = plane[-1:, :]
    out[:h, w:] = plane[:, -1:]
    out[h:, w:] = plane[-1, -1]
    return out


def encode_jpeg(px, subsample=False, restart_interval=0):
    """px: HxWx3 uint8 RGB (or HxW for grayscale) → baseline JFIF bytes."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        samps = [(1, 1)]
    else:
        x = px.astype(np.float64)
        y = 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]
        cb = -0.168736 * x[:, :, 0] - 0.331264 * x[:, :, 1] + 0.5 * x[:, :, 2] + 128
        cr = 0.5 * x[:, :, 0] - 0.418688 * x[:, :, 1] - 0.081312 * x[:, :, 2] + 128
        if subsample:  # 4:2:0 — average 2×2 chroma
            he, we = h + (h & 1), w + (w & 1)
            def sub(p):
                q = np.empty((he, we))
                q[:h, :w] = p
                q[h:, :w] = p[-1:, :]
                q[:h, w:] = p[:, -1:]
                q[h:, w:] = p[-1, -1]
                return q.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            planes = [y, sub(cb), sub(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1)] * 3
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    q = np.ones((8, 8), np.int32)

    padded = [
        _plane_blocks(p, mcuy * s[1], mcux * s[0]) for p, s in zip(planes, samps)
    ]

    # pass 1: quantized zig-zag coefficients for every block, MCU order
    mcus = []
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcus and len(mcus) % restart_interval == 0:
                preds = [0] * len(planes)
            blocks = []
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samps)):
                for by in range(sv):
                    for bx in range(sh):
                        y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8]
                        coef = T @ (blk - 128.0) @ T.T
                        qc = np.round(coef / q).astype(int)
                        zz = np.array([qc.reshape(-1)[_ZIGZAG[k]] for k in range(64)])
                        dc, acs, pred = _block_symbols(zz, preds[ci])
                        preds[ci] = pred
                        blocks.append((ci, dc, acs))
            mcus.append(blocks)

    dc_syms = [d[0] for m in mcus for (_, d, _) in m]
    ac_syms = [s for m in mcus for (_, _, a) in m for (s, _) in a]
    dc_bits, dc_vals, dc_enc = _huff_table(dc_syms)
    ac_bits, ac_vals, ac_enc = _huff_table(ac_syms)

    # pass 2: bitstream with optional restarts
    chunks = []
    bw = _BitWriter()
    for i, m in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            bw.flush()
            chunks.append(bytes(bw.buf) + bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)]))
            bw = _BitWriter()
        for (_, (dsym, (dv, dn)), acs) in m:
            c, ln = dc_enc[dsym]
            bw.write(c, ln)
            bw.write(dv, dn)
            for (asym, (av, an)) in acs:
                c, ln = ac_enc[asym]
                bw.write(c, ln)
                bw.write(av, an)
    bw.flush()
    chunks.append(bytes(bw.buf))
    entropy = b"".join(chunks)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + _quant_zz(q))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    out += seg(0xDA, sos)
    out += entropy + b"\xff\xd9"
    return out


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.dstack([r, g, b])


def test_flat_color_roundtrip():
    px = np.full((16, 8, 3), 0, np.uint8)
    px[:, :, 0] = 200
    px[:, :, 1] = 60
    px[:, :, 2] = 30
    got = decode_jpeg(encode_jpeg(px))
    assert got.shape == (16, 8, 3)
    # unit quant + flat blocks: only DCT/rounding error
    assert np.max(np.abs(got.astype(int) - px.astype(int))) <= 2


def test_gradient_roundtrip_nonmultiple_of_8():
    px = _gradient(17, 24)  # 17 rows → bottom block row is padding
    got = decode_jpeg(encode_jpeg(px))
    assert got.shape == (17, 24, 3)
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.mean() < 2.0 and err.max() <= 8, (err.mean(), err.max())


def test_grayscale_single_component():
    px = (np.outer(np.arange(16), np.ones(16)) * 15).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(px))
    assert got.shape == (16, 16, 3)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])  # gray replicated
    assert np.abs(got[:, :, 0].astype(int) - px.astype(int)).max() <= 2


def test_420_subsampled_luma_exactness():
    # r=g=b content → chroma identically 128, so 4:2:0 upsampling is exact
    # and the luma path is isolated (MCU interleave: 4 Y + Cb + Cr blocks)
    g = _gradient(20, 28)[:, :, 0]
    px = np.dstack([g, g, g])
    got = decode_jpeg(encode_jpeg(px, subsample=True))
    assert got.shape == (20, 28, 3)
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 4, err.max()


def test_restart_markers():
    px = _gradient(24, 24)
    raw = encode_jpeg(px, restart_interval=2)
    assert b"\xff\xd0" in raw or b"\xff\xd1" in raw  # RSTn really emitted
    got = decode_jpeg(raw)
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.mean() < 2.0 and err.max() <= 8


def test_out_of_scope_and_malformed_return_none():
    assert decode_jpeg(b"\xff\xd8\xff\xc2" + b"\x00" * 20) is None  # progressive
    assert decode_jpeg(b"not a jpeg") is None
    px = _gradient(8, 8)
    raw = encode_jpeg(px)
    assert decode_jpeg(raw[:40]) is None or isinstance(decode_jpeg(raw[:40]), np.ndarray)


def test_decode_images_jpeg_pixels(spark):
    """Through the Spark stage: JPEG payloads now get real pixel features."""
    from mcpvectordb_spark.sources.multimodal import MEDIA_SCHEMA, decode_images

    px = np.zeros((8, 8, 3), np.uint8)
    px[:, :, 2] = 255  # pure blue
    media = spark.createDataFrame(
        [("b1", "image", "image/jpeg", bytearray(encode_jpeg(px)), "{}")], MEDIA_SCHEMA
    )
    row = decode_images(media, fake=False).first()
    assert (row["width"], row["height"], row["format"]) == (8, 8, "jpeg")
    f = row["features"]
    assert f[2] > 0.97 and f[0] < 0.03 and f[1] < 0.03  # mean_b ≈ 1
