"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
standard large-scale layout (payload stays columnar, decode happens inside
Arrow-batched Python stages near the data).  Three kernels are REAL at the
container level — pure byte parsing, no media library:

- image: PNG/GIF/BMP/JPEG dimensions + format from header bytes
  (:func:`parse_image_header`), and FULL PIXEL DECODE for all four via
  :func:`decode_image_pixels` — PNG (zlib inflate + all five scanline
  filters, sequential AND Adam7-interlaced), BMP (BI_RGB 8/24/32-bit incl. palette), GIF (LZW decode of
  the first frame), and JPEG — baseline AND progressive (Huffman entropy
  decode incl. successive approximation + IDCT + chroma upsampling,
  :mod:`mcpvectordb_spark.sources.jpeg`) — real
  per-channel/luma/gradient features from the actual pixels;
- audio: RIFF/WAVE full decode (:func:`parse_wav`) — PCM 8/16/32-bit and
  IEEE-float; duration from the header, per-window RMS + zero-crossing-rate
  features computed from the actual samples (numpy, no Python sample loop);
- video: MP4/ISO-BMFF box walk (mvhd duration, tkhd dimensions) and AVI
  avih header (:func:`parse_video_header`).

Remaining codec-level work (compressed-audio sample decode, compressed-
video frame extraction) is STUBBED (Pillow/ffmpeg/torchaudio are not in this
container): those stages have the real Spark plumbing — schema, batching,
partitioning, UDF signature — a deterministic fake path for tests, and the
library call site marked NotImplementedError.

Scale notes: media rows are large and skew-prone — ``repartition`` by a
hash of the id before a decode stage to even out batch byte-sizes, and keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small for multi-MB payloads.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON sidecar
    ]
)

IMAGE_FEATURE_SCHEMA = (
    "media_id string, width int, height int, format string, n_bytes long, features array<float>"
)
AUDIO_FEATURE_SCHEMA = "media_id string, duration_s double, n_bytes long, features array<float>"
FRAME_SAMPLE_SCHEMA = "media_id string, frame_index int, frame_ts_s double, frame binary"


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in features: byte histogram folded to `dim`."""
    hist = [0.0] * dim
    for i, byte in enumerate(payload[:4096]):
        hist[(byte + i) % dim] += 1.0
    total = sum(hist) or 1.0
    return [v / total for v in hist]


def parse_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """Real (width, height, format) from the container header bytes — pure
    byte parsing, no imaging library.  PNG (IHDR), GIF (logical screen
    descriptor), BMP (BITMAPINFOHEADER), JPEG (SOF0/1/2 marker scan).
    Returns None for anything unrecognised/truncated."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        if payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return w, h, "png"
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, "gif"
    if payload[:2] == b"BM" and len(payload) >= 26:
        hdr_size = struct.unpack("<I", payload[14:18])[0]
        if hdr_size >= 40:  # BITMAPINFOHEADER: signed width/height
            w, h = struct.unpack("<ii", payload[18:26])
            return abs(w), abs(h), "bmp"
        if hdr_size == 12 and len(payload) >= 22:  # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", payload[18:22])
            return w, h, "bmp"
    if payload[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF marker
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # baseline/extended/progressive SOF
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h, "jpeg"
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
    return None


# ---------------------------------------------------------------------------
# Pixel decode — pure stdlib+numpy codecs: PNG (zlib), BMP (raw), GIF
# (LZW); JPEG's entropy-coded paths live in sources/jpeg.py.


def _png_defilter(raw: bytes, h: int, stride: int, bpp: int):
    """Undo PNG scanline filtering (spec §6: None/Sub/Up/Average/Paeth).
    Sub is a per-residue-class modular cumsum (vectorized); Average/Paeth
    need the left neighbour so they walk the row."""
    import numpy as np

    out = np.zeros((h, stride), dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw[pos + 1:pos + 1 + stride], np.uint8).astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for k in range(bpp):
                cur[k::bpp] = np.cumsum(cur[k::bpp]) % 256
        elif ftype == 2:  # Up
            cur = (row + prev) % 256
        elif ftype == 3:  # Average
            cur = np.empty(stride, np.int32)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (row[i] + (left + prev[i]) // 2) % 256
        elif ftype == 4:  # Paeth
            cur = np.empty(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
    return out.astype("uint8")


# Adam7 pass grid: (xstart, ystart, xstep, ystep) per pass
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _decode_png_pixels(payload: bytes):
    """PNG → HxWx3 uint8 RGB. 8-bit depth, colour types 0/2/3/4/6, both
    sequential and Adam7-interlaced (each of the 7 passes is its own
    filtered sub-image, defiltered then scattered onto the pass grid)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln  # length + tag + crc
    if ihdr is None or not idat:
        return None
    w, h, depth, ctype, _, _, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if depth not in (8, 16) or channels is None or interlace not in (0, 1) \
            or w == 0 or h == 0:
        return None
    if depth == 16 and ctype == 3:
        return None  # palette indices are never 16-bit
    bypc = depth // 8  # bytes per channel; filters operate at byte level
    bpp = channels * bypc
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        stride = w * bpp
        if len(raw) < h * (stride + 1):
            return None
        px = _png_defilter(raw, h, stride, bpp).reshape(h, w, channels * bypc)
    else:  # Adam7: 7 independently-filtered sub-images scattered on a grid
        px = np.zeros((h, w, channels * bypc), np.uint8)
        pos = 0
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (w - xs + xstep - 1) // xstep
            ph = (h - ys + ystep - 1) // ystep
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * bpp
            need = ph * (stride + 1)
            if len(raw) < pos + need:
                return None
            sub = _png_defilter(raw[pos:pos + need], ph, stride, bpp)
            pos += need
            px[ys::ystep, xs::xstep] = sub.reshape(ph, pw, channels * bypc)
    if bypc == 2:  # 16-bit samples are big-endian; keep the high byte
        px = px.reshape(h, w, channels, 2)[:, :, :, 0]
    if ctype == 3:
        if plte is None:
            return None
        px = plte[px[:, :, 0]]
    elif ctype == 0:
        px = np.repeat(px, 3, axis=2)
    elif ctype == 4:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif ctype == 6:
        px = px[:, :, :3]
    return px


def _decode_bmp_pixels(payload: bytes):
    """BMP → HxWx3 uint8 RGB. BITMAPINFOHEADER, BI_RGB (uncompressed),
    8-bit palette / 24-bit / 32-bit; bottom-up or top-down rows."""
    import struct

    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    (data_off,) = struct.unpack("<I", payload[10:14])
    hdr_size, = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        return None
    w, h_signed = struct.unpack("<ii", payload[18:26])
    bpp, = struct.unpack("<H", payload[28:30])
    comp, = struct.unpack("<I", payload[30:34])
    if comp != 0 or bpp not in (8, 24, 32) or w <= 0 or h_signed == 0:
        return None
    h = abs(h_signed)
    row_size = (w * bpp // 8 + 3) & ~3
    need = data_off + row_size * h
    if len(payload) < need:
        return None
    rows = np.frombuffer(
        payload[data_off:need], np.uint8
    ).reshape(h, row_size)
    if bpp == 8:
        (clr_used,) = struct.unpack("<I", payload[46:50])
        n_pal = clr_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(payload[pal_off:pal_off + 4 * n_pal], np.uint8)
        if len(pal) < 4 * n_pal:
            return None
        pal = pal.reshape(-1, 4)[:, 2::-1]  # BGRX → RGB
        px = pal[rows[:, :w]]
    else:
        bypp = bpp // 8
        px = rows[:, :w * bypp].reshape(h, w, bypp)[:, :, 2::-1]  # BGR(A) → RGB
    if h_signed > 0:  # bottom-up storage
        px = px[::-1]
    return np.ascontiguousarray(px)


def _gif_lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """GIF variable-width LZW (LSB-first bit packing)."""
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            if len(out) >= max_pixels:
                return out
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def _decode_gif_pixels(payload: bytes):
    """GIF → HxWx3 uint8 RGB of the FIRST frame (training features need one
    representative frame, not animation)."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    flags = payload[10]
    gct = None
    pos = 13
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _, _, iw, ih = struct.unpack("<HHHH", payload[pos + 1:pos + 9])
            lflags = payload[pos + 9]
            pos += 10
            table = gct
            if lflags & 0x80:
                n = 2 << (lflags & 0x07)
                table = np.frombuffer(payload[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
                pos += 3 * n
            if table is None or iw == 0 or ih == 0:
                return None  # missing palette: out of scope
            min_code = payload[pos]
            pos += 1
            chunks = []
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            idx = np.frombuffer(
                bytes(_gif_lzw_decode(min_code, b"".join(chunks), iw * ih)), np.uint8
            )
            if len(idx) < iw * ih or idx.max(initial=0) >= len(table):
                return None
            raster = idx[:iw * ih].reshape(ih, iw)
            if lflags & 0x40:  # GIF 4-pass interlace: reorder rows
                order = [r for step, start in ((8, 0), (8, 4), (4, 2), (2, 1))
                         for r in range(start, ih, step)]
                out = np.empty_like(raster)
                out[order] = raster[:len(order)]
                raster = out
            return table[raster]
        else:  # trailer (0x3B) or junk
            return None
    return None


def decode_image_pixels(payload: bytes):
    """Full pixel decode → HxWx3 uint8 RGB, or None when the payload is
    malformed or out of codec scope (arithmetic/12-bit JPEG, ...)."""
    from mcpvectordb_spark.sources.jpeg import decode_jpeg

    try:
        for dec in (_decode_png_pixels, _decode_bmp_pixels, _decode_gif_pixels,
                    decode_jpeg):
            px = dec(payload)
            if px is not None:
                return px
    except Exception:
        return None  # malformed pixel data degrades to the header/fake path
    return None


def _pixel_features(px, dim: int) -> list[float]:
    """Real image features from decoded pixels: channel means, luma std,
    mean |horizontal gradient| (edge energy), then a luma histogram filling
    the remaining dims.  Deterministic, numpy-vectorized."""
    import numpy as np

    x = px.astype(np.float64) / 255.0
    luma = 0.2126 * x[:, :, 0] + 0.7152 * x[:, :, 1] + 0.0722 * x[:, :, 2]
    grad = float(np.mean(np.abs(np.diff(luma, axis=1)))) if luma.shape[1] > 1 else 0.0
    head = [float(x[:, :, 0].mean()), float(x[:, :, 1].mean()),
            float(x[:, :, 2].mean()), float(luma.std()), grad]
    bins = max(dim - len(head), 1)
    hist = np.histogram(luma, bins=bins, range=(0.0, 1.0))[0] / luma.size
    return [round(v, 9) for v in head + hist.tolist()]


def decode_images(df: "DataFrame", dim: int = 16, fake: bool = True) -> "DataFrame":
    """image binary → (width, height, format, features).

    ``fake=False`` is a REAL kernel: PNG/BMP/GIF/baseline-JPEG payloads are
    pixel-decoded (:func:`decode_image_pixels`) — JPEG in both baseline and
    progressive modes — and the feature vector is computed from the actual
    pixels (channel means, luma std, edge energy, luma histogram);
    arithmetic-coded/12-bit JPEG keeps real header dimensions with a
    byte-histogram feature fallback.  Payloads in an unrecognised container
    raise NotImplementedError.

    ``fake=True`` keeps the round-1 deterministic stand-in (dims derived
    from payload length) for tests that use synthetic payloads, but
    upgrades to real pixels / real header dims whenever the payload
    parses."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec["payload"] or b"")
                parsed = parse_image_header(payload)
                if parsed is None:
                    if not fake:
                        raise NotImplementedError(
                            "unrecognised image container; full pixel decode requires "
                            "an imaging library — not in this container"
                        )
                    parsed = (64 + len(payload) % 512, 64 + len(payload) % 384, "fake")
                w, h, fmt = parsed
                px = decode_image_pixels(payload) if fmt != "fake" else None
                feats = _pixel_features(px, dim) if px is not None else _fake_features(payload, dim)
                if px is not None:  # decoded geometry is the ground truth
                    h, w = px.shape[0], px.shape[1]
                rows.append((rec["media_id"], w, h, fmt, len(payload), feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "format", "n_bytes", "features"]
            )

    return df.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def parse_wav(payload: bytes) -> dict | None:
    """Real RIFF/WAVE parse — pure byte walking, no audio library.

    Returns {channels, sample_rate, bits, n_frames, duration_s, pcm_offset,
    pcm_size} for PCM (format 1) and IEEE-float (format 3) WAVE files;
    None for anything that is not a well-formed WAVE container."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            audio_fmt, ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            fmt = (audio_fmt, ch, rate, bits)
        elif cid == b"data":
            data = (pos + 8, min(size, len(payload) - pos - 8))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_fmt, ch, rate, bits = fmt
    if audio_fmt not in (1, 3) or ch == 0 or rate == 0 or bits not in (8, 16, 32):
        return None
    bytes_per_frame = ch * bits // 8
    n_frames = data[1] // bytes_per_frame if bytes_per_frame else 0
    return {
        "channels": ch,
        "sample_rate": rate,
        "bits": bits,
        "audio_fmt": audio_fmt,
        "n_frames": n_frames,
        "duration_s": n_frames / rate,
        "pcm_offset": data[0],
        "pcm_size": data[1],
    }


def _wav_features(payload: bytes, info: dict, dim: int) -> list[float]:
    """Real DSP features from the PCM samples: ``dim/2`` per-window RMS
    levels + ``dim/2`` per-window zero-crossing rates (mono mixdown).
    Deterministic; numpy-vectorized (no Python loop over samples)."""
    import numpy as np

    raw = payload[info["pcm_offset"] : info["pcm_offset"] + info["pcm_size"]]
    if info["audio_fmt"] == 3:
        x = np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<f4").astype(np.float64)
    elif info["bits"] == 16:
        x = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2").astype(np.float64) / 32768.0
    elif info["bits"] == 32:
        x = np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<i4").astype(np.float64) / 2147483648.0
    else:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    ch = info["channels"]
    if ch > 1:
        x = x[: len(x) // ch * ch].reshape(-1, ch).mean(axis=1)
    return _window_features(x, dim)


def _window_features(x, dim: int) -> list[float]:
    """dim/2 per-window RMS + dim/2 per-window ZCR over normalized mono
    samples — shared by the WAV and FLAC feature paths."""
    import numpy as np

    half = max(1, dim // 2)
    if len(x) == 0:
        return [0.0] * (2 * half)
    windows = np.array_split(x, half)
    rms = [float(np.sqrt(np.mean(w * w))) if len(w) else 0.0 for w in windows]
    zcr = [
        float(np.mean(np.signbit(w[1:]) != np.signbit(w[:-1]))) if len(w) > 1 else 0.0
        for w in windows
    ]
    return [round(v, 9) for v in rms + zcr]


def extract_audio_features(df: "DataFrame", dim: int = 16, fake: bool = True) -> "DataFrame":
    """audio binary → (duration_s, features).

    ``fake=False`` is a REAL kernel for RIFF/WAVE payloads (PCM 8/16/32-bit
    and IEEE-float) AND for FLAC (full pure-Python decode —
    mcpvectordb_spark/flac.py: Rice residuals, fixed/LPC prediction, stereo
    decorrelation): duration comes from the parsed container and the
    feature vector is per-window RMS + zero-crossing rate computed from
    the actual samples.  Remaining compressed containers (mp3/ogg/m4a)
    raise NotImplementedError — those codecs need an audio library, and
    that seam stays clearly marked.  ``fake=True`` upgrades to the real
    kernel whenever the payload decodes, else keeps the deterministic
    stand-in."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec["payload"] or b"")
                info = parse_wav(payload)
                if info is not None:
                    feats = _wav_features(payload, info, dim)
                    rows.append((rec["media_id"], info["duration_s"], len(payload), feats))
                    continue
                if payload[:4] == b"fLaC":
                    from mcpvectordb_spark.flac import decode_flac

                    try:
                        dec = decode_flac(payload)
                    except ValueError:
                        dec = None
                    if dec is not None and dec["sample_rate"]:
                        x = np.mean(
                            [np.asarray(c, dtype=np.float64) for c in dec["channels_pcm"]],
                            axis=0,
                        )
                        peak = float(1 << (dec["bits_per_sample"] - 1))
                        feats = _window_features(x / peak, dim)
                        dur = len(x) / dec["sample_rate"]
                        rows.append((rec["media_id"], dur, len(payload), feats))
                        continue
                if not fake:
                    raise NotImplementedError(
                        "compressed-audio decode requires ffmpeg/torchaudio — not in this container"
                    )
                rows.append((rec["media_id"], len(payload) / 16000.0, len(payload), _fake_features(payload, dim)))
            yield pd.DataFrame(rows, columns=["media_id", "duration_s", "n_bytes", "features"])

    return df.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


AUDIO_META_SCHEMA = (
    "media_id string, container string, duration_s double, sample_rate int, "
    "channels int, n_bytes long"
)


def parse_audio_metadata(payload: bytes) -> dict | None:
    """Container-level audio metadata — pure byte parsing, no codec:

    - WAVE: full :func:`parse_wav`;
    - OGG (Vorbis or Opus): identification header gives rate/channels,
      duration = the LAST page's granule position / rate (Opus granules
      are always 48 kHz per RFC 7845);
    - M4A / ISO-BMFF: the same ``moov``→``mvhd`` box walk as MP4;
    - MP3 (CBR): first MPEG frame header after any ID3v2 tag → bitrate /
      sample rate; duration estimated as audio_bytes·8/bitrate (exact for
      CBR; VBR needs a Xing walk — out of scope, returns the CBR estimate).

    Sample-level DECODE of the compressed formats stays stubbed; this
    probe is the metadata layer a curation pipeline filters on (duration
    caps, sample-rate gates) before paying for decode."""
    import struct

    info = parse_wav(payload)
    if info is not None:
        return {
            "container": "wav",
            "duration_s": info["duration_s"],
            "sample_rate": info["sample_rate"],
            "channels": info["channels"],
        }

    if payload[:4] == b"fLaC":
        from mcpvectordb_spark.flac import parse_streaminfo

        si = parse_streaminfo(payload)
        if si is not None and si["sample_rate"]:
            return {
                "container": "flac",
                "duration_s": si["total_samples"] / si["sample_rate"],
                "sample_rate": si["sample_rate"],
                "channels": si["channels"],
            }

    if payload[:4] == b"OggS":
        rate = channels = None
        vi = payload.find(b"\x01vorbis", 0, 4096)
        if vi >= 0 and vi + 16 <= len(payload):
            channels = payload[vi + 11]
            (rate,) = struct.unpack("<I", payload[vi + 12:vi + 16])
        else:
            oi = payload.find(b"OpusHead", 0, 4096)
            if oi >= 0 and oi + 10 <= len(payload):
                channels = payload[oi + 9]
                rate = 48000  # Opus granule clock (RFC 7845 §4)
        if not rate:
            return None
        last = payload.rfind(b"OggS")
        if last < 0 or last + 14 > len(payload):
            return None
        (granule,) = struct.unpack("<q", payload[last + 6:last + 14])
        return {
            "container": "ogg",
            "duration_s": max(granule, 0) / rate,
            "sample_rate": int(rate),
            "channels": int(channels or 0),
        }

    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        meta = parse_video_header(payload)
        if meta is not None and "duration_s" in meta:
            return {
                "container": "m4a",
                "duration_s": meta["duration_s"],
                "sample_rate": 0,  # sample rate lives in stsd; not walked
                "channels": 0,
            }
        return None

    # MP3: skip ID3v2 (10-byte header + synchsafe size), find frame sync
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = ((payload[6] & 0x7F) << 21) | ((payload[7] & 0x7F) << 14) \
             | ((payload[8] & 0x7F) << 7) | (payload[9] & 0x7F)
        pos = 10 + size
    if pos + 4 <= len(payload) and payload[pos] == 0xFF and (payload[pos + 1] & 0xE0) == 0xE0:
        hdr = payload[pos:pos + 4]
        version = (hdr[1] >> 3) & 0x03      # 3 = MPEG1
        layer = (hdr[1] >> 1) & 0x03        # 1 = Layer III
        if version == 3 and layer == 1:
            _BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                         160, 192, 224, 256, 320, 0]
            _RATES = [44100, 48000, 32000, 0]
            bitrate = _BITRATES[(hdr[2] >> 4) & 0x0F] * 1000
            rate = _RATES[(hdr[2] >> 2) & 0x03]
            mode = (hdr[3] >> 6) & 0x03
            if bitrate and rate:
                duration = (len(payload) - pos) * 8 / bitrate  # exact for CBR
                # VBR: a Xing/Info tag in the first frame carries the exact
                # frame count (MPEG1 L3: 1152 samples per frame)
                xing = payload.find(b"Xing", pos, pos + 200)
                if xing < 0:
                    xing = payload.find(b"Info", pos, pos + 200)
                if xing >= 0 and xing + 12 <= len(payload):
                    (flags,) = struct.unpack(">I", payload[xing + 4:xing + 8])
                    if flags & 0x01:
                        (frames,) = struct.unpack(">I", payload[xing + 8:xing + 12])
                        duration = frames * 1152 / rate
                return {
                    "container": "mp3",
                    "duration_s": duration,
                    "sample_rate": rate,
                    "channels": 1 if mode == 3 else 2,
                }
    return None


def probe_audio_metadata(df: "DataFrame", fake: bool = True) -> "DataFrame":
    """audio binary → (container, duration_s, sample_rate, channels) — REAL
    for WAVE/OGG/M4A/MP3-CBR containers; unknown bytes degrade to the fake
    row (or raise when ``fake=False``), mirroring probe_video_metadata."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec["payload"] or b"")
                try:
                    meta = parse_audio_metadata(payload)
                except Exception:
                    meta = None  # malformed container: degrade, never kill the job
                if meta is None:
                    if not fake:
                        raise NotImplementedError(
                            "unrecognised audio container; decode requires a codec library"
                        )
                    meta = {"container": "fake", "duration_s": len(payload) / 16000.0,
                            "sample_rate": 0, "channels": 0}
                rows.append((rec["media_id"], meta["container"], meta["duration_s"],
                             meta["sample_rate"], meta["channels"], len(payload)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "container", "duration_s", "sample_rate",
                         "channels", "n_bytes"],
            )

    return df.mapInPandas(run, schema=AUDIO_META_SCHEMA)


VIDEO_META_SCHEMA = (
    "media_id string, container string, duration_s double, n_frames long, "
    "width int, height int, n_bytes long"
)


def parse_video_header(payload: bytes) -> dict | None:
    """Real video container metadata — pure byte parsing, no ffmpeg.

    MP4/ISO-BMFF: walks top-level boxes to ``moov``, then child boxes to
    ``mvhd`` (timescale + duration) and ``tkhd`` (width/height, 16.16 fixed
    point).  AVI: RIFF ``AVI `` with the ``avih`` main header
    (µs-per-frame, total frames, dimensions).  Returns None for anything
    else — codec-level frame decode stays behind the stub."""
    import struct

    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        idx = payload.find(b"avih")
        if idx >= 0 and idx + 44 <= len(payload):
            body = payload[idx + 8 :]
            us_per_frame, _, _, _, total_frames = struct.unpack("<IIIII", body[:20])
            w, h = struct.unpack("<II", body[32:40])
            fps = 1e6 / us_per_frame if us_per_frame else 0.0
            return {
                "container": "avi",
                "duration_s": total_frames / fps if fps else 0.0,
                "n_frames": total_frames,
                "width": w,
                "height": h,
            }
        return None

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            btype = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 1 and pos + 16 <= end:  # 64-bit largesize
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                hdr = 16
            if size < hdr or pos + size > end:
                return
            yield btype, pos + hdr, pos + size
            pos += size

    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        out: dict = {"container": "mp4", "width": 0, "height": 0}
        for btype, bs, be in walk(payload, 0, len(payload)):
            if btype != b"moov":
                continue
            for ctype, cs, ce in walk(payload, bs, be):
                if ctype == b"mvhd" and ce - cs >= 20:
                    version = payload[cs]
                    # v1 widens creation/modification/duration to 64-bit, so the
                    # fields we unpack sit at cs+20..cs+32 — guard per version.
                    if version == 1 and ce - cs >= 32:
                        timescale, duration = struct.unpack(">IQ", payload[cs + 20 : cs + 32])
                    elif version == 0:
                        timescale, duration = struct.unpack(">II", payload[cs + 12 : cs + 20])
                    else:
                        continue  # truncated v1 (or unknown version): skip box
                    out["duration_s"] = duration / timescale if timescale else 0.0
                elif ctype == b"trak":
                    for ttype, ts_, te in walk(payload, cs, ce):
                        if ttype == b"tkhd" and te - ts_ >= 84:
                            version = payload[ts_]
                            if version == 1 and te - ts_ < 96:
                                continue  # truncated v1 box: width/height absent
                            off = ts_ + (96 if version == 1 else 84) - 8
                            w16, h16 = struct.unpack(">II", payload[off : off + 8])
                            out["width"] = max(out["width"], w16 >> 16)
                            out["height"] = max(out["height"], h16 >> 16)
            if "duration_s" in out:
                out["n_frames"] = 0  # frame count needs stbl parse; 0 = unknown
                return out
        return None
    return None


def probe_video_metadata(df: "DataFrame", fake: bool = True) -> "DataFrame":
    """video binary → (container, duration_s, n_frames, width, height).

    REAL for MP4/ISO-BMFF and AVI containers (header byte parse).  Unknown
    containers: deterministic stand-in when ``fake=True``, else
    NotImplementedError (full probe of e.g. MKV needs an EBML parser)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec["payload"] or b"")
                try:
                    meta = parse_video_header(payload)
                except Exception:
                    # malformed container bytes must degrade to the fake/error
                    # path, never kill the job (same policy as the WARC source)
                    meta = None
                if meta is None:
                    if not fake:
                        raise NotImplementedError(
                            "unrecognised video container; full probe requires ffmpeg"
                        )
                    meta = {
                        "container": "fake",
                        "duration_s": len(payload) / 4096.0,
                        "n_frames": max(1, len(payload) // 1024),
                        "width": 0,
                        "height": 0,
                    }
                rows.append(
                    (rec["media_id"], meta["container"], meta["duration_s"],
                     meta["n_frames"], meta["width"], meta["height"], len(payload))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "container", "duration_s", "n_frames", "width", "height", "n_bytes"],
            )

    return df.mapInPandas(run, schema=VIDEO_META_SCHEMA)


def parse_avi_frames(payload: bytes):
    """Yield (frame_index, HxWx3 uint8 RGB) for an AVI whose video stream is
    UNCOMPRESSED DIB ('00db' chunks are raw bottom-up BGR rows, 4-byte
    aligned — the same layout as BMP pixel data).  Compressed streams
    ('00dc': cinepak/h264/...) yield nothing — codec decode stays stubbed.
    Pure byte walking + numpy; dimensions come from the avih header."""
    import struct

    import numpy as np

    meta = parse_video_header(payload)
    if not meta or meta.get("container") != "avi":
        return
    w, h = meta["width"], meta["height"]
    if not w or not h:
        return
    movi = payload.find(b"movi")
    if movi < 0:
        return
    row_size = (w * 3 + 3) & ~3
    need = row_size * h
    pos = movi + 4
    idx = 0
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if cid == b"idx1":
            break
        if cid[2:4] != b"db" or len(body) < need:
            continue  # compressed ('dc'), audio ('wb'), or truncated
        rows = np.frombuffer(body[:need], np.uint8).reshape(h, row_size)
        px = rows[:, :w * 3].reshape(h, w, 3)[::-1, :, ::-1]  # bottom-up BGR → RGB
        yield idx, np.ascontiguousarray(px)
        idx += 1


def sample_video_frames(df: "DataFrame", every_s: float = 1.0, fake: bool = True) -> "DataFrame":
    """video binary → N frame rows (flatMap shape, like the chunker).

    REAL for AVI files with uncompressed DIB video ('00db'): frames decode
    to raw RGB24 via :func:`parse_avi_frames` and are sampled on the
    container's frame clock (every ``every_s`` seconds); ``frame`` holds
    the h×w×3 RGB bytes.  Compressed codecs raise in real mode (ffmpeg
    seam) and fall back to the deterministic stand-in when ``fake=True``."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec["payload"] or b"")
                try:
                    meta = parse_video_header(payload)
                    frames = list(parse_avi_frames(payload))
                except Exception:
                    meta, frames = None, []
                if frames:
                    fps = (meta["n_frames"] / meta["duration_s"]
                           if meta.get("duration_s") else 1.0)
                    step = max(1, round(every_s * fps))
                    for i, px in frames:
                        if i % step == 0:
                            rows.append((rec["media_id"], i, i / fps, px.tobytes()))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "compressed video decode requires ffmpeg — not in this container"
                    )
                n_frames = max(1, len(payload) // 1024)
                for i in range(min(n_frames, 8)):
                    rows.append((rec["media_id"], i, i * every_s, payload[i * 128 : i * 128 + 128]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "frame_ts_s", "frame"])

    return df.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def dhash64(px) -> int:
    """64-bit difference hash (dHash) from decoded RGB pixels: luma → 8×9
    block-mean grid → adjacent-column comparisons, row-major bit pack.
    Returned as a SIGNED 64-bit value (two's-complement wrap) so it stores
    in a Spark long; XOR/popcount downstream are bit-identical either way.
    Deterministic, numpy-vectorized, no imaging library."""
    import numpy as np

    x = px.astype(np.float64)
    luma = 0.2126 * x[:, :, 0] + 0.7152 * x[:, :, 1] + 0.0722 * x[:, :, 2]
    cells = np.empty((8, 9), dtype=np.float64)
    for r, rows in enumerate(np.array_split(luma, 8, axis=0)):
        for c, block in enumerate(np.array_split(rows, 9, axis=1)):
            cells[r, c] = block.mean()
    v = 0
    for r in range(8):
        for c in range(8):
            if cells[r, c] > cells[r, c + 1]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash_stage(df: "DataFrame") -> "DataFrame":
    """image binary → (media_id, width, height, dhash) via the REAL pixel
    decoders; undecodable payloads yield a NULL dhash (filtered by the
    near-dup join, never a task failure).  Per-row Arrow kernel — the only
    shuffle downstream is the 8-byte hash."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec["payload"] or b"")
                px = decode_image_pixels(payload)
                if px is None:
                    rows.append((rec["media_id"], None, None, None))
                else:
                    rows.append(
                        (rec["media_id"], int(px.shape[1]), int(px.shape[0]), dhash64(px))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "dhash"])

    return df.mapInPandas(run, schema=schema)


def video_frame_dhash_stage(df: "DataFrame", every_s: float = 1.0) -> "DataFrame":
    """video binary → one row per SAMPLED frame with its 64-bit dHash:
    (media_id, frame_index, frame_ts_s, dhash).  Real for uncompressed-DIB
    AVI (parse_avi_frames); compressed codecs yield no rows (the ffmpeg
    seam).  The frame pixels never leave the kernel — only 8-byte hashes
    reach the plan, so cross-video scene dedup shuffles hashes, not video."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame_ts_s", T.DoubleType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec["payload"] or b"")
                try:
                    meta = parse_video_header(payload)
                    frames = list(parse_avi_frames(payload))
                except Exception:
                    meta, frames = None, []
                if not frames:
                    continue
                fps = (meta["n_frames"] / meta["duration_s"]
                       if meta.get("duration_s") else 1.0)
                step = max(1, round(every_s * fps))
                for i, px in frames:
                    if i % step == 0:
                        rows.append((rec["media_id"], i, i / fps, dhash64(px)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "frame_ts_s", "dhash"])

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# EXIF metadata (JPEG APP1 / TIFF IFD walk)

EXIF_SCHEMA = (
    "media_id string, byte_order string, orientation int, make string, "
    "model string, dt_original string, has_gps boolean"
)

_EXIF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def parse_exif(payload: bytes) -> dict | None:
    """Real EXIF parse: walk the JPEG marker stream to the APP1
    ``Exif\\x00\\x00`` segment, then the TIFF structure inside it — byte
    order (II/MM), 0x002A magic, IFD0 entries (Make 0x010F, Model 0x0110,
    Orientation 0x0112, DateTime 0x0132), the EXIF sub-IFD pointer
    (0x8769 → DateTimeOriginal 0x9003) and the GPS IFD pointer (0x8825 →
    presence flag).  Pure byte walking, both endiannesses, honouring the
    value-inline-vs-offset rule (>4 bytes → offset into the TIFF block).

    Returns None for non-JPEG payloads, JPEGs without EXIF, or malformed
    EXIF — malformed input never kills the job (the WARC-source policy;
    corrupt camera metadata is endemic in web crawls)."""
    try:
        if len(payload) < 4 or payload[:2] != b"\xff\xd8":
            return None
        pos, app1 = 2, None
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no EXIF ahead
                break
            seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            seg = payload[pos + 4 : pos + 2 + seg_len]
            if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
                app1 = seg[6:]
                break
            pos += 2 + seg_len
        if app1 is None:
            return None

        order = app1[:2]
        if order == b"II":
            bo = "little"
        elif order == b"MM":
            bo = "big"
        else:
            return None
        rd = lambda off, n: int.from_bytes(app1[off : off + n], bo)
        if rd(2, 2) != 42:
            return None

        def read_ifd(off: int) -> dict[int, tuple[int, int, bytes]]:
            n = rd(off, 2)
            out = {}
            for i in range(n):
                e = off + 2 + 12 * i
                tag, typ, cnt = rd(e, 2), rd(e + 2, 2), rd(e + 4, 4)
                size = _EXIF_TYPE_SIZES.get(typ, 1) * cnt
                if size > 4:
                    voff = rd(e + 8, 4)
                    raw = app1[voff : voff + size]
                else:
                    raw = app1[e + 8 : e + 8 + size]
                out[tag] = (typ, cnt, raw)
            return out

        def ascii_val(ent) -> str | None:
            if ent is None:
                return None
            return ent[2].split(b"\x00", 1)[0].decode("ascii", "replace").strip() or None

        def short_val(ent) -> int | None:
            if ent is None or ent[0] != 3:
                return None
            return int.from_bytes(ent[2][:2], bo)

        ifd0 = read_ifd(rd(4, 4))
        out = {
            "byte_order": "II" if bo == "little" else "MM",
            "orientation": short_val(ifd0.get(0x0112)),
            "make": ascii_val(ifd0.get(0x010F)),
            "model": ascii_val(ifd0.get(0x0110)),
            "dt_original": None,
            "has_gps": 0x8825 in ifd0,
        }
        exif_ptr = ifd0.get(0x8769)
        if exif_ptr is not None:
            sub = read_ifd(int.from_bytes(exif_ptr[2][:4], bo))
            out["dt_original"] = ascii_val(sub.get(0x9003))
        if out["dt_original"] is None:
            out["dt_original"] = ascii_val(ifd0.get(0x0132))
        return out
    except Exception:
        return None  # malformed EXIF: a row of NULLs, never a task failure


def exif_metadata(df: "DataFrame") -> "DataFrame":
    """image binary → EXIF columns (media_id, byte_order, orientation,
    make, model, dt_original, has_gps).  Map-only Arrow kernel over the
    MEDIA_SCHEMA payload column; payloads without parseable EXIF yield a
    row of NULLs (has_gps false) so corpus-level joins keep every image."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                meta = parse_exif(bytes(rec["payload"] or b""))
                if meta is None:
                    rows.append((rec["media_id"], None, None, None, None, None, False))
                else:
                    rows.append(
                        (
                            rec["media_id"],
                            meta["byte_order"],
                            meta["orientation"],
                            meta["make"],
                            meta["model"],
                            meta["dt_original"],
                            bool(meta["has_gps"]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "byte_order", "orientation", "make",
                    "model", "dt_original", "has_gps",
                ],
            )

    return df.mapInPandas(run, schema=EXIF_SCHEMA)


def build_exif_jpeg(
    byte_order: str = "II",
    orientation: int = 1,
    make: str = "Acme",
    model: str = "Cam-1",
    dt_original: str = "2024:01:01 12:00:00",
    with_gps: bool = False,
) -> bytes:
    """Synthesize a minimal JPEG (SOI + EXIF APP1 + EOI) with a real TIFF
    block in either byte order — the deterministic fixture generator for
    the EXIF kernel (tests + digest-gated catalog query).  Layout: IFD0
    (Make, Model, Orientation, DateTime=dt, ExifIFD ptr, optional GPS
    ptr) → EXIF sub-IFD (DateTimeOriginal) → value area."""
    bo = "little" if byte_order == "II" else "big"
    wr = lambda v, n: int(v).to_bytes(n, bo)

    make_b = make.encode() + b"\x00"
    model_b = model.encode() + b"\x00"
    dt_b = dt_original.encode() + b"\x00"

    n0 = 5 + (1 if with_gps else 0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    exif_ifd_off = ifd0_off + ifd0_size
    exif_ifd_size = 2 + 12 * 1 + 4
    val_off = exif_ifd_off + exif_ifd_size
    gps_off = val_off + len(make_b) + len(model_b) + len(dt_b)

    def entry(tag, typ, cnt, val, inline_size):
        e = wr(tag, 2) + wr(typ, 2) + wr(cnt, 4)
        if inline_size <= 4:
            if typ == 3:  # SHORT packs into the first 2 of 4 bytes
                return e + wr(val, 2) + b"\x00\x00"
            return e + wr(val, 4)
        return e + wr(val, 4)  # offset form

    entries = [
        entry(0x010F, 2, len(make_b), val_off, len(make_b)),
        entry(0x0110, 2, len(model_b), val_off + len(make_b), len(model_b)),
        entry(0x0112, 3, 1, orientation, 2),
        entry(0x0132, 2, len(dt_b), val_off + len(make_b) + len(model_b), len(dt_b)),
        entry(0x8769, 4, 1, exif_ifd_off, 4),
    ]
    if with_gps:
        entries.append(entry(0x8825, 4, 1, gps_off, 4))
    entries.sort(key=lambda e: int.from_bytes(e[:2], bo))  # spec: ascending tags
    ifd0 = wr(n0, 2) + b"".join(entries) + wr(0, 4)
    sub = (
        wr(1, 2)
        + entry(0x9003, 2, len(dt_b), val_off + len(make_b) + len(model_b), len(dt_b))
        + wr(0, 4)
    )
    vals = make_b + model_b + dt_b
    gps = (wr(0, 2) + wr(0, 4)) if with_gps else b""
    tiff = (b"II" if bo == "little" else b"MM") + wr(42, 2) + wr(ifd0_off, 4) + ifd0 + sub + vals + gps
    app1_body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(app1_body) + 2).to_bytes(2, "big") + app1_body
    return b"\xff\xd8" + app1 + b"\xff\xd9"
