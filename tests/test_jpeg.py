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


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder: spectral selection + successive approximation,
# emitting the same scan structure libjpeg's simple progressive script uses.
# The invariant under unit quantization: progressive and baseline streams
# carry IDENTICAL coefficients, so decoded pixels must match EXACTLY.

def _trunc_shift(v, al):
    return -((-v) >> al) if v < 0 else v >> al


def _coef_blocks_444(px):
    """Per-component [by][bx] zig-zag coefficient lists (quant = 1)."""
    gray = px.ndim == 2
    if gray:
        planes = [px.astype(np.float64)]
    else:
        x = px.astype(np.float64)
        planes = [
            0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2],
            -0.168736 * x[:, :, 0] - 0.331264 * x[:, :, 1] + 0.5 * x[:, :, 2] + 128,
            0.5 * x[:, :, 0] - 0.418688 * x[:, :, 1] - 0.081312 * x[:, :, 2] + 128,
        ]
    h, w = px.shape[:2]
    bh, bw = -(-h // 8), -(-w // 8)
    out = []
    for p in planes:
        padded = _plane_blocks(p, bh, bw)
        comp = []
        for by in range(bh):
            row = []
            for bx in range(bw):
                blk = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                qc = np.round(T @ (blk - 128.0) @ T.T).astype(int)
                row.append([int(qc.reshape(-1)[_ZIGZAG[k]]) for k in range(64)])
            comp.append(row)
        out.append(comp)
    return out, bh, bw


def _dc_first_ops(comps_blocks, al):
    ops, preds = [], [0] * len(comps_blocks)
    bh, bw = len(comps_blocks[0]), len(comps_blocks[0][0])
    for by in range(bh):
        for bx in range(bw):
            for ci, blocks in enumerate(comps_blocks):
                v = blocks[by][bx][0] >> al  # arithmetic shift (libjpeg)
                diff = v - preds[ci]
                preds[ci] = v
                s = _category(diff)
                ops.append(("h", s))
                if s:
                    ops.append(("b", _extra_bits(diff, s), s))
    return ops


def _dc_refine_ops(comps_blocks, al):
    ops = []
    bh, bw = len(comps_blocks[0]), len(comps_blocks[0][0])
    for by in range(bh):
        for bx in range(bw):
            for blocks in comps_blocks:
                ops.append(("b", (blocks[by][bx][0] >> al) & 1, 1))
    return ops


def _ac_first_ops(blocks, ss, se, al):
    ops, eobrun = [], 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            ops.append(("h", r << 4))
            if r:
                ops.append(("b", eobrun - (1 << r), r))
            eobrun = 0

    for row in blocks:
        for zz in row:
            vals = [_trunc_shift(zz[k], al) for k in range(ss, se + 1)]
            nz = [i for i, v in enumerate(vals) if v]
            if not nz:
                eobrun += 1
                continue
            flush()
            r, last = 0, nz[-1]
            for i, v in enumerate(vals[:last + 1]):
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    ops.append(("h", 0xF0))
                    r -= 16
                s = abs(v).bit_length()
                ops.append(("h", (r << 4) | s))
                ops.append(("b", _extra_bits(v, s), s))
                r = 0
            if last < len(vals) - 1:
                eobrun += 1
    flush()
    return ops


def _ac_refine_ops(blocks, ss, se, al):
    ops, eobrun, pending_br = [], 0, []

    def flush():
        nonlocal eobrun, pending_br
        if eobrun:
            r = eobrun.bit_length() - 1
            ops.append(("h", r << 4))
            if r:
                ops.append(("b", eobrun - (1 << r), r))
            ops.extend(("b", b, 1) for b in pending_br)
            pending_br = []
            eobrun = 0

    for row in blocks:
        for zz in row:
            band = [zz[k] for k in range(ss, se + 1)]
            t = [abs(v) >> al for v in band]
            news = [i for i, ti in enumerate(t) if ti == 1]
            if not news:
                eobrun += 1
                pending_br.extend(ti & 1 for ti in t if ti > 1)
                continue
            flush()
            last = news[-1]
            r, br = 0, []
            for i in range(last + 1):
                if t[i] == 0:
                    r += 1
                    continue
                # libjpeg: ZRLs emit on reaching ANY nonzero (history too),
                # flushing the corrections buffered inside the ZRL window
                while r > 15:
                    ops.append(("h", 0xF0))
                    ops.extend(("b", b, 1) for b in br)
                    br = []
                    r -= 16
                if t[i] > 1:
                    br.append(t[i] & 1)
                else:
                    ops.append(("h", (r << 4) | 1))
                    ops.append(("b", 1 if band[i] > 0 else 0, 1))
                    ops.extend(("b", b, 1) for b in br)
                    br = []
                    r = 0
            tail = [t[i] & 1 for i in range(last + 1, len(t)) if t[i] > 1]
            if last < len(t) - 1:
                eobrun += 1
                pending_br.extend(tail)
    flush()
    return ops


def _emit_scan(ops, cls):
    """(DHT bytes or b'', entropy bytes) for one scan's op stream."""
    syms = sorted({s for kind, s, *rest in [(o[0], o[1], *o[2:]) for o in ops] if kind == "h"})
    dht = b""
    enc = {}
    if syms:
        bits, vals, enc = _huff_table(syms)
        dht = bytes([0xFF, 0xC4]) + struct.pack(">H", 2 + 1 + 16 + len(vals)) \
            + bytes([cls << 4]) + bytes(bits) + vals
    bw = _BitWriter()
    for op in ops:
        if op[0] == "h":
            code, ln = enc[op[1]]
            bw.write(code, ln)
        else:
            bw.write(op[1], op[2])
    bw.flush()
    return dht, bytes(bw.buf)


def encode_jpeg_progressive(px):
    """SOF2 stream: DC-first(Al=1) → per-comp AC-first(1..63, Al=1) →
    DC-refine → per-comp AC-refine — both progressive modes exercised."""
    comps_blocks, bh, bw_ = _coef_blocks_444(px)
    ncomp = len(comps_blocks)
    h, w = px.shape[:2]

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return bytes([0xFF, 0xDA]) + struct.pack(">H", 2 + len(body)) + body

    out = bytearray(b"\xff\xd8")
    q = np.ones((8, 8), np.int32)
    out += bytes([0xFF, 0xDB]) + struct.pack(">H", 2 + 65) + bytes([0x00]) + _quant_zz(q)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += bytes([0xFF, 0xC2]) + struct.pack(">H", 2 + len(sof)) + sof

    all_ids = [ci + 1 for ci in range(ncomp)]
    # 1. DC first (interleaved), Al=1
    dht, ent = _emit_scan(_dc_first_ops(comps_blocks, 1), cls=0)
    out += dht + sos(all_ids, 0, 0, 0, 1) + ent
    # 2. AC first per component, Al=1
    for ci in range(ncomp):
        dht, ent = _emit_scan(_ac_first_ops(comps_blocks[ci], 1, 63, 1), cls=1)
        out += dht + sos([ci + 1], 1, 63, 0, 1) + ent
    # 3. DC refine (raw bits, no table)
    _, ent = _emit_scan(_dc_refine_ops(comps_blocks, 0), cls=0)
    out += sos(all_ids, 0, 0, 1, 0) + ent
    # 4. AC refine per component
    for ci in range(ncomp):
        dht, ent = _emit_scan(_ac_refine_ops(comps_blocks[ci], 1, 63, 0), cls=1)
        out += dht + sos([ci + 1], 1, 63, 1, 0) + ent
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_matches_baseline_exactly():
    """Unit quantization → the progressive scans deliver the SAME
    coefficients as the baseline stream: decoded pixels must be equal."""
    px = _gradient(21, 26)
    base = decode_jpeg(encode_jpeg(px))
    prog = decode_jpeg(encode_jpeg_progressive(px))
    assert prog is not None
    assert np.array_equal(prog, base)


def test_progressive_grayscale_and_flat():
    g = (np.outer(np.arange(14), np.ones(18)) * 9).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(g))
    prog = decode_jpeg(encode_jpeg_progressive(g))
    assert np.array_equal(prog, base)

    flat = np.full((8, 8, 3), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(flat)),
                          decode_jpeg(encode_jpeg(flat)))


def test_progressive_random_rasters():
    rng = np.random.RandomState(23)
    for shape in ((9, 13), (16, 16), (24, 10)):
        px = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(px))
        prog = decode_jpeg(encode_jpeg_progressive(px))
        assert prog is not None and np.array_equal(prog, base), shape


# ---------------------------------------------------------------------------
# EXIF


def test_exif_roundtrip_both_endians():
    from mcpvectordb_spark.sources.multimodal import build_exif_jpeg, parse_exif

    for bo in ("II", "MM"):
        for gps in (False, True):
            for orient in (1, 3, 6, 8):
                j = build_exif_jpeg(bo, orient, "Maker X", "M-200", "2023:12:31 23:59:59", gps)
                m = parse_exif(j)
                assert m == {
                    "byte_order": bo,
                    "orientation": orient,
                    "make": "Maker X",
                    "model": "M-200",
                    "dt_original": "2023:12:31 23:59:59",
                    "has_gps": gps,
                }


def test_exif_malformed_never_raises():
    from mcpvectordb_spark.sources.multimodal import build_exif_jpeg, parse_exif

    good = build_exif_jpeg("MM", 6, with_gps=True)
    # every truncation of a valid fixture must parse to a dict or None
    for cut in range(len(good)):
        parse_exif(good[:cut])
    assert parse_exif(b"") is None
    assert parse_exif(b"\xff\xd8\xff\xd9") is None            # no APP1
    assert parse_exif(b"\xff\xd8\xff\xe1\x00\x08Exif") is None  # truncated
    # bad byte-order mark inside an otherwise plausible APP1
    assert parse_exif(b"\xff\xd8\xff\xe1\x00\x14Exif\x00\x00XX\x00\x2a" + b"\x00" * 8) is None


def test_exif_kernel_null_rows(spark):
    from mcpvectordb_spark.sources.multimodal import (
        MEDIA_SCHEMA, build_exif_jpeg, exif_metadata,
    )

    rows = [
        ("a", "image", "image/jpeg", build_exif_jpeg("II", 5, with_gps=True), None),
        ("b", "image", "image/jpeg", b"\xff\xd8\xff\xd9", None),
        ("c", "image", "image/jpeg", b"garbage", None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in exif_metadata(df).collect()}
    assert out["a"]["orientation"] == 5 and out["a"]["has_gps"]
    for mid in ("b", "c"):
        assert out[mid]["orientation"] is None and out[mid]["has_gps"] is False
