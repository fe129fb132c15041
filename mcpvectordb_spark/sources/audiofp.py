"""Audio fingerprinting: spectral-peak constellation hashing (the
Shazam/Chromaprint landmark family — Wang, ISMIR 2003 "An Industrial-
Strength Audio Search Algorithm").  Pure numpy + Spark: no audio stack.

Pipeline:
1. **landmarks** (Arrow kernel, per clip): frame the PCM, magnitude rFFT
   per frame, keep the strongest spectral peaks per frame, pair each peak
   with the next few peaks in a forward target zone, hash each pair as
   (f1, f2, dt) packed into one int.  Pixels^H^H samples never leave the
   kernel — only (clip_id, landmark_hash, t_frame) triples, 20 bytes a
   row, reach Spark.
2. **matching** (pure DataFrame): self-join clips on landmark_hash (an
   inverted index — same sub-quadratic shape as the shingle indexes),
   group by (clip_a, clip_b, dt = t_b - t_a) and count votes.  A true
   copy — even TIME-SHIFTED — concentrates its votes on one dt bin; noise
   spreads uniformly.  ``min_votes`` is the decision threshold.

Scale shape: the landmark hash space is ~2^26, so at corpus scale each
hash bucket is tiny (the max_df cutoff guards the degenerate ones);
matching is one equi-join + one keyed agg.  Robust to time shift by
construction (dt voting) and to amplitude by normalization (peaks are
per-frame argmaxes).

Reference anchor: the reference converts audio via MarkItDown's learned
ASR (converter.py:13-39) and has no fingerprinting; this is the
beyond-reference multimodal-dedup path for audio, the twin of image
dHash (sources/multimodal.py) and video scene dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LANDMARK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("lhash", T.LongType()),
        T.StructField("t", T.IntegerType()),
    ]
)


def landmarks_pcm(
    samples,
    frame: int = 256,
    hop: int = 128,
    peaks_per_frame: int = 3,
    fan_out: int = 3,
    max_dt: int = 32,
):
    """Constellation landmarks of one PCM clip: list[(lhash, t_frame)].
    lhash packs (f1, f2, dt) as f1·2^16 + f2·2^8 + dt with f in frequency
    bins (< 2^8 for frame=256) and dt < max_dt.  Deterministic."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if len(x) < frame:
        return []
    n_frames = 1 + (len(x) - frame) // hop
    window = np.hanning(frame)
    peaks = []  # (t, fbin) strongest peaks per frame
    for t in range(n_frames):
        seg = x[t * hop : t * hop + frame] * window
        mag = np.abs(np.fft.rfft(seg))
        mag[0] = 0.0  # kill DC
        if mag.max() <= 0:
            continue
        top = np.argsort(-mag)[:peaks_per_frame]
        for f in sorted(int(b) for b in top):
            peaks.append((t, f))
    out = []
    for i, (t1, f1) in enumerate(peaks):
        paired = 0
        for t2, f2 in peaks[i + 1 :]:
            if t2 == t1:
                continue
            dt = t2 - t1
            if dt >= max_dt:
                break
            out.append((int(f1) * (1 << 16) + int(f2) * (1 << 8) + int(dt), int(t1)))
            paired += 1
            if paired >= fan_out:
                break
    return out


def audio_landmarks(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(media_id, lhash, t) landmarks for every RIFF/WAVE payload in a
    MEDIA_SCHEMA-shaped frame; non-WAV payloads yield no rows (the
    error-row contract belongs to the converter, not the fingerprinter)."""

    def run(batches):
        import numpy as np
        import pandas as pd

        from mcpvectordb_spark.sources.multimodal import parse_wav

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = bytes(rec[payload_col])
                meta = parse_wav(payload)
                if (
                    meta is None
                    or meta["bits"] != 16
                    or meta["channels"] != 1
                    or meta["audio_fmt"] != 1
                ):
                    continue
                pcm = payload[meta["pcm_offset"] : meta["pcm_offset"] + meta["pcm_size"]]
                samples = np.frombuffer(pcm[: (len(pcm) // 2) * 2], dtype="<i2")
                for lhash, t in landmarks_pcm(samples):
                    rows.append((rec["media_id"], lhash, t))
            yield pd.DataFrame(rows, columns=["media_id", "lhash", "t"])

    return df.select("media_id", payload_col).mapInPandas(run, schema=LANDMARK_SCHEMA)


def match_clips(
    landmarks: DataFrame,
    min_votes: int = 5,
    max_df: int = 200,
    min_score: float = 0.0,
) -> DataFrame:
    """(id_a < id_b, dt, votes, score) clip pairs whose landmark votes
    concentrate on one time offset.  ``max_df`` drops degenerate landmarks
    shared by more than that many clips (the stop-shingle cutoff);
    ``score`` = votes / min(landmarks of either clip) — a true copy scores
    ~1.0 in its dt bin while merely-similar audio (shared motifs) spreads
    and tops out well below, so ``min_score`` is the copy-detection
    threshold that raw vote counts cannot provide when clips share
    vocabulary."""
    n_by_clip = landmarks.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_lm"))
    sel = landmarks.join(
        landmarks.groupBy("lhash")
        .agg(F.countDistinct("media_id").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("lhash"),
        "lhash",
    )
    a = sel.select(F.col("media_id").alias("id_a"), "lhash", F.col("t").alias("ta"))
    b = sel.select(F.col("media_id").alias("id_b"), "lhash", F.col("t").alias("tb"))
    votes = (
        a.join(b, "lhash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", (F.col("tb") - F.col("ta")).alias("dt"))
        .agg(F.count(F.lit(1)).cast("long").alias("votes"))
        .filter(F.col("votes") >= min_votes)
    )
    # one row per clip — small relative to landmarks but unbounded at
    # corpus scale, so no broadcast hint: AQE picks the strategy
    scored = (
        votes.join(
            n_by_clip.select(F.col("media_id").alias("id_a"), F.col("n_lm").alias("_na")),
            "id_a",
        )
        .join(
            n_by_clip.select(F.col("media_id").alias("id_b"), F.col("n_lm").alias("_nb")),
            "id_b",
        )
        .withColumn("score", F.col("votes") / F.least("_na", "_nb"))
        .drop("_na", "_nb")
    )
    return scored.filter(F.col("score") >= min_score)
