"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
standard large-scale layout (payload stays columnar, decode happens inside
Arrow-batched Python stages near the data).  The decode kernels themselves
are STUBBED (Pillow/ffmpeg/torchaudio are not in this container): each stage
has the real Spark plumbing — schema, batching, partitioning, UDF signature —
and a deterministic fake feature path for tests, with the library call site
marked NotImplementedError.

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

IMAGE_FEATURE_SCHEMA = "media_id string, width int, height int, n_bytes long, features array<float>"
AUDIO_FEATURE_SCHEMA = "media_id string, duration_s double, n_bytes long, features array<float>"
FRAME_SAMPLE_SCHEMA = "media_id string, frame_index int, frame_ts_s double, frame binary"


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in features: byte histogram folded to `dim`."""
    hist = [0.0] * dim
    for i, byte in enumerate(payload[:4096]):
        hist[(byte + i) % dim] += 1.0
    total = sum(hist) or 1.0
    return [v / total for v in hist]


def decode_images(df: "DataFrame", dim: int = 16, fake: bool = True) -> "DataFrame":
    """image binary → (width, height, features). Real path: Pillow decode +
    model features — NotImplementedError here; fake path is deterministic."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec["payload"] or b"")
                if not fake:
                    raise NotImplementedError("image decode requires Pillow — not in this container")
                # deterministic fake: dims derived from payload length
                rows.append(
                    (rec["media_id"], 64 + len(payload) % 512, 64 + len(payload) % 384,
                     len(payload), _fake_features(payload, dim))
                )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "n_bytes", "features"])

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
