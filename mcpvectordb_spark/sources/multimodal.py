"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
standard large-scale layout (payload stays columnar, decode happens inside
Arrow-batched Python stages near the data).  Image decode is REAL at the
container level — PNG/GIF/BMP/JPEG dimensions + format parsed from header
bytes, deterministic byte-histogram features (:func:`parse_image_header`).
Full pixel decode and the audio/video kernels remain STUBBED
(Pillow/ffmpeg/torchaudio are not in this container): those stages have the
real Spark plumbing — schema, batching, partitioning, UDF signature — a
deterministic fake path for tests, and the library call site marked
NotImplementedError.

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


def decode_images(df: "DataFrame", dim: int = 16, fake: bool = True) -> "DataFrame":
    """image binary → (width, height, format, features).

    ``fake=False`` is a REAL kernel for PNG/GIF/BMP/JPEG: dimensions and
    format are parsed from the payload's header bytes and the feature
    vector is the (deterministic) normalised byte histogram of the payload.
    Payloads in an unrecognised container raise NotImplementedError —
    full pixel decode of arbitrary formats still needs an imaging library,
    and that seam stays clearly marked.

    ``fake=True`` keeps the round-1 deterministic stand-in (dims derived
    from payload length) for tests that use synthetic payloads, but
    upgrades to real header dims whenever the header parses."""

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
                rows.append(
                    (rec["media_id"], w, h, fmt, len(payload), _fake_features(payload, dim))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "format", "n_bytes", "features"]
            )

    return df.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def extract_audio_features(df: "DataFrame", dim: int = 16, fake: bool = True) -> "DataFrame":
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec["payload"] or b"")
                if not fake:
                    raise NotImplementedError("audio decode requires ffmpeg/torchaudio — not in this container")
                rows.append((rec["media_id"], len(payload) / 16000.0, len(payload), _fake_features(payload, dim)))
            yield pd.DataFrame(rows, columns=["media_id", "duration_s", "n_bytes", "features"])

    return df.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def sample_video_frames(df: "DataFrame", every_s: float = 1.0, fake: bool = True) -> "DataFrame":
    """video binary → N frame rows (flatMap shape, like the chunker)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec["payload"] or b"")
                if not fake:
                    raise NotImplementedError("video decode requires ffmpeg — not in this container")
                n_frames = max(1, len(payload) // 1024)
                for i in range(min(n_frames, 8)):
                    rows.append((rec["media_id"], i, i * every_s, payload[i * 128 : i * 128 + 128]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "frame_ts_s", "frame"])

    return df.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
