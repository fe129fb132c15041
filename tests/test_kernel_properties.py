"""Property-based tests (hypothesis) for the pure-Python kernels: WAV
parsing, Morton interleave, WARC record parse — invariants that must hold
for arbitrary inputs, driver-side (no Spark needed)."""

import gzip
import io
import struct
import wave

from hypothesis import given, settings
from hypothesis import strategies as st

from mcpvectordb_spark.sources.multimodal import parse_wav
from mcpvectordb_spark.sources.warc import parse_warc_records


@settings(max_examples=40, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 2),
    n_frames=st.integers(0, 2000),
)
def test_wav_roundtrip_header_exact(rate, channels, n_frames):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x01\x02" * channels * n_frames)
    info = parse_wav(buf.getvalue())
    assert info is not None
    assert info["sample_rate"] == rate and info["channels"] == channels
    assert info["n_frames"] == n_frames
    assert abs(info["duration_s"] - n_frames / rate) < 1e-12


@settings(max_examples=60, deadline=None)
@given(blob=st.binary(max_size=200))
def test_wav_parser_never_crashes_on_garbage(blob):
    # arbitrary bytes: either None or a well-formed dict — never an exception
    out = parse_wav(blob)
    assert out is None or out["sample_rate"] > 0


def _interleave_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=30, deadline=None)
@given(
    pairs=st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)), min_size=1, max_size=20, unique=True)
)
def test_morton_key_matches_reference_bit_interleave(spark, pairs):
    from pyspark.sql import functions as F

    from mcpvectordb_spark.operators.zorder import zorder_key

    df = spark.createDataFrame(pairs, "a int, b int")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b"), (0, 255), (0, 255), bits=8).alias("z")
        ).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == _interleave_py(a, b, 8), (a, b)


@settings(max_examples=40, deadline=None)
@given(
    bodies=st.lists(st.binary(max_size=300), min_size=1, max_size=5),
    compress=st.booleans(),
)
def test_warc_parse_recovers_every_record(bodies, compress):
    recs = []
    for i, body in enumerate(bodies):
        hdr = (
            f"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: <urn:x:{i}>\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        recs.append(hdr + body + b"\r\n\r\n")
    blob = b"".join(gzip.compress(r) for r in recs) if compress else b"".join(recs)
    parsed = [p for p in parse_warc_records(blob) if "error" not in p]
    assert [p["payload"] for p in parsed] == bodies
