"""Machine-generated-audio ASR: a real tone-decoding kernel for the
converter's audio path (SURVEY §2.1 S4 — the reference routes audio through
MarkItDown's transcription, /root/reference/src/mcpvectordb/converter.py:13-39).

Scope stated honestly, mirroring the OCR kernel (mcpvectordb_spark/ocr.py):
this transcribes MACHINE-GENERATED TONE ENCODINGS — the DTMF problem class,
one pure tone per symbol on a fixed frequency grid — using classic DSP
(silence-gated segmentation + zero-crossing frequency estimation; a pure
tone of frequency f crosses zero 2f times per second).  Natural speech
needs a learned acoustic model and still produces the converter's
documented error row; off-grid frequencies, ragged segment lengths, or
non-tonal energy all fail the decode gate, so real recordings can never
silently transcribe to garbage.

Pure stdlib + numpy over the repo's own RIFF/WAVE parser — per-payload
Arrow-kernel work, no Spark shuffle introduced.
"""

from __future__ import annotations

# Symbol grid: ~40 chars, 60 Hz spacing starting at 420 Hz (all well under
# the 4 kHz Nyquist of the 8 kHz render rate, far enough apart that a ZCR
# estimate lands within ±half-spacing of exactly one symbol).
CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,-"
BASE_HZ = 420.0
STEP_HZ = 60.0
RATE = 8000
TONE_S = 0.040  # 40 ms per symbol
GAP_S = 0.010  # 10 ms silence between symbols
AMP = 12000


def renderable(text: str) -> str:
    """Uppercase + project onto the tone charset (unknown chars → space)."""
    return "".join(ch if ch in CHARSET else " " for ch in text.upper())


def render_text_wav(text: str) -> bytes:
    """Encode text as a tone sequence in a 16-bit mono PCM WAVE file —
    the fixture generator for the ASR path (deterministic synthesis, the
    audio twin of ocr.render_text_bmp)."""
    import math
    import struct

    samples: list[int] = []
    n_tone, n_gap = int(RATE * TONE_S), int(RATE * GAP_S)
    for ch in renderable(text):
        f = BASE_HZ + CHARSET.index(ch) * STEP_HZ
        for i in range(n_tone):
            samples.append(int(AMP * math.sin(2 * math.pi * f * i / RATE)))
        samples.extend([0] * n_gap)
    pcm = struct.pack("<%dh" % len(samples), *samples)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, RATE, RATE * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def asr_tones_pcm(samples, rate: int, min_confidence: float = 0.85) -> str | None:
    """Decode a tone sequence from raw PCM samples (any container that
    yields int16-range samples — WAV via :func:`asr_tones`, FLAC via the
    converter's flac path).  See :func:`asr_tones` for the gate
    semantics."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.size < int(rate * TONE_S) // 2:
        return None
    peak = np.abs(x).max()
    if peak < 1.0:
        return None
    blk = max(1, rate // 1000)
    n_blk = x.size // blk
    if n_blk == 0:
        return None
    rms = np.sqrt((x[: n_blk * blk].reshape(n_blk, blk) ** 2).mean(axis=1))
    active = rms > 0.05 * peak
    edges = np.flatnonzero(np.diff(active.astype(np.int8)))
    bounds = np.concatenate([[0], edges + 1, [n_blk]])
    segs = [
        (a * blk, b * blk)
        for a, b in zip(bounds[:-1], bounds[1:])
        if active[a] and (b - a) * blk >= int(rate * TONE_S * 0.5)
    ]
    if not segs:
        return None
    n_tone = rate * TONE_S
    out, good = [], 0
    for a, b in segs:
        if (b - a) > n_tone * 1.5:
            return None  # one long blob: continuous audio, not a tone code
        seg = x[a:b]
        crossings = np.count_nonzero(np.diff(seg >= 0))
        f = crossings * rate / (2.0 * seg.size)
        idx = (f - BASE_HZ) / STEP_HZ
        near = round(idx)
        if 0 <= near < len(CHARSET) and abs(idx - near) <= 0.4:
            out.append(CHARSET[near])
            good += 1
        else:
            out.append("?")
    if good / len(segs) < min_confidence:
        return None
    return "".join(out).rstrip()


def asr_tones(payload: bytes, min_confidence: float = 0.85) -> str | None:
    """Decode a tone-encoded WAVE back to text.

    Segment on silence (block-RMS below 5% of peak), require segment
    lengths in a sane band around the nominal tone length, estimate each
    segment's frequency from its zero-crossing count, and snap to the
    symbol grid — rejecting estimates further than 40% of the grid
    spacing from any symbol.  Returns None when the payload is not
    WAVE/PCM16 mono, has no tonal structure, or fewer than
    ``min_confidence`` of segments decode — the not-machine-generated
    signal the converter turns into its documented error row."""
    import numpy as np

    from mcpvectordb_spark.sources.multimodal import parse_wav

    meta = parse_wav(payload)
    if meta is None or meta["bits"] != 16 or meta["channels"] != 1 or meta["audio_fmt"] != 1:
        return None
    pcm = payload[meta["pcm_offset"] : meta["pcm_offset"] + meta["pcm_size"]]
    x = np.frombuffer(pcm[: (len(pcm) // 2) * 2], dtype="<i2")
    return asr_tones_pcm(x, meta["sample_rate"], min_confidence)
