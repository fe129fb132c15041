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


# ---------------------------------------------------------------------------
# Image codec kernels (round-3): PNG defilter, GIF LZW, JPEG, CFB


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_arbitrary_rasters(h, w, seed):
    """Random pixels through the test encoder (cycling all 5 filters) must
    decode to EXACTLY the input — PNG is lossless."""
    import numpy as np

    from mcpvectordb_spark.sources.multimodal import decode_image_pixels
    from tests.test_sources import _png_pixels_fixture

    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    got = decode_image_pixels(_png_pixels_fixture(px))
    assert got is not None and np.array_equal(got, px)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_lzw_roundtrip_arbitrary_rasters(h, w, seed):
    import numpy as np

    from mcpvectordb_spark.sources.multimodal import decode_image_pixels
    from tests.test_sources import _gif_pixels_fixture

    palette = [(i, (i * 3) % 256, 255 - i) for i in range(128)]
    idx = np.random.RandomState(seed).randint(0, 128, (h, w)).astype(np.uint8)
    got = decode_image_pixels(_gif_pixels_fixture(idx, palette))
    expect = np.array([[palette[v] for v in row] for row in idx], np.uint8)
    assert got is not None and np.array_equal(got, expect)


@settings(max_examples=20, deadline=None)
@given(blob=st.binary(min_size=0, max_size=400))
def test_image_decoders_never_crash_on_garbage(blob):
    """Arbitrary bytes (incl. ones that start like real containers) must
    yield None or a valid array — never an exception."""
    import numpy as np

    from mcpvectordb_spark.sources.multimodal import decode_image_pixels

    for prefix in (b"", b"\x89PNG\r\n\x1a\n", b"BM", b"GIF89a", b"\xff\xd8\xff"):
        out = decode_image_pixels(prefix + blob)
        assert out is None or isinstance(out, np.ndarray)


@settings(max_examples=20, deadline=None)
@given(blob=st.binary(min_size=0, max_size=300))
def test_jpeg_decoder_never_crashes_on_garbage(blob):
    from mcpvectordb_spark.sources.jpeg import decode_jpeg

    try:
        out = decode_jpeg(b"\xff\xd8" + blob)
    except Exception as exc:  # decode_jpeg's contract: None, not raise...
        raise AssertionError(f"decode_jpeg raised {exc!r}") from exc
    assert out is None or out.ndim == 3


@settings(max_examples=20, deadline=None)
@given(
    texts=st.lists(st.text(alphabet="abint ", min_size=0, max_size=30), min_size=1, max_size=4),
    seed=st.integers(0, 1000),
)
def test_cfb_roundtrip_arbitrary_streams(texts, seed):
    """Arbitrary small+large stream mixes survive the CFB writer→reader
    round trip (mini-stream and FAT paths chosen per size)."""
    import random

    from mcpvectordb_spark.extractors import _Cfb
    from tests.test_sources import _cfb_fixture

    rng = random.Random(seed)
    streams = {}
    for i, t in enumerate(texts):
        data = t.encode() * rng.choice([1, 50, 300])  # spans the 4096 cutoff
        streams[f"S{i}"] = data
    cfb = _Cfb(_cfb_fixture(streams))
    for name, data in streams.items():
        assert cfb.stream(name) == data


@settings(max_examples=40, deadline=None)
@given(blob=st.binary(min_size=0, max_size=6000))
def test_cdc_lossless_and_bounded_on_arbitrary_bytes(blob):
    from mcpvectordb_spark.operators.dedup import cdc_boundaries

    chunks = cdc_boundaries(blob, min_size=32, avg_size=128, max_size=512)
    assert b"".join(chunks) == blob
    if chunks:
        assert all(len(c) <= 512 for c in chunks)
        assert all(len(c) >= 32 for c in chunks[:-1])
    # determinism
    assert chunks == cdc_boundaries(blob, min_size=32, avg_size=128, max_size=512)


@settings(max_examples=25, deadline=None)
@given(
    prefix=st.binary(min_size=1, max_size=64),
    seed=st.integers(0, 2**31 - 1),
)
def test_cdc_boundaries_resync_after_prefix_edit(prefix, seed):
    """After an arbitrary prefix insertion, the suffix boundary stream must
    realign: the LAST chunk of both versions is identical (content-defined
    cuts depend only on trailing bytes once past the edit)."""
    import numpy as np

    from mcpvectordb_spark.operators.dedup import cdc_boundaries

    base = np.random.RandomState(seed).randint(0, 256, 8000).astype("uint8").tobytes()
    a = cdc_boundaries(base, 32, 128, 512)
    b = cdc_boundaries(prefix + base, 32, 128, 512)
    assert a[-1] == b[-1]


# ---------------------------------------------------------------------------
# OCR / ASR / URL kernels (session 4)

_OCR_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,-:"


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=_OCR_ALPHABET, min_size=1, max_size=40))
def test_ocr_roundtrip_any_charset_string(txt):
    from mcpvectordb_spark.ocr import ocr_bitmap, render_text_bmp

    got = ocr_bitmap(render_text_bmp(txt))
    expected = txt.rstrip()
    assert got == expected or (expected == "" and got in ("", None))


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_ocr_never_raises_on_arbitrary_bytes(payload):
    from mcpvectordb_spark.ocr import ocr_bitmap

    ocr_bitmap(payload)  # dict-or-None contract; must not throw


_ASR_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,-"


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=_ASR_ALPHABET, min_size=1, max_size=24))
def test_asr_roundtrip_any_charset_string(txt):
    from mcpvectordb_spark.asr import asr_tones, render_text_wav

    got = asr_tones(render_text_wav(txt))
    expected = txt.rstrip()
    assert got == expected or (expected == "" and got is None)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_asr_never_raises_on_arbitrary_bytes(payload):
    from mcpvectordb_spark.asr import asr_tones

    asr_tones(payload)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_exif_never_raises_on_arbitrary_bytes(payload):
    from mcpvectordb_spark.sources.multimodal import parse_exif

    parse_exif(payload)
    parse_exif(b"\xff\xd8\xff\xe1" + len(payload).to_bytes(2, "big") + b"Exif\x00\x00" + payload)


def _luhn_py(card: str) -> bool:
    s = 0
    for i, ch in enumerate(card, start=1):
        d = int(ch)
        if (len(card) - i) % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        s += d
    return s % 10 == 0


@settings(max_examples=60, deadline=None)
@given(payload=st.lists(st.integers(0, 9), min_size=15, max_size=15))
def test_luhn_check_digit_property(payload):
    """For any 15-digit payload there is exactly ONE check digit that makes
    the 16-digit card Luhn-valid — and the python reference agrees with the
    doubling-parity convention the Spark kernel uses."""
    valid = [c for c in range(10) if _luhn_py("".join(map(str, payload)) + str(c))]
    assert len(valid) == 1
    # transposing two adjacent unequal digits breaks validity when their
    # doubled-halved images differ (the property Luhn was designed for)
    card = "".join(map(str, payload)) + str(valid[0])
    for i in range(15):
        a, b = int(card[i]), int(card[i + 1])
        if a == b:
            continue
        swapped = card[:i] + card[i + 1] + card[i] + card[i + 2:]
        img = lambda d: d * 2 - 9 if d * 2 > 9 else d * 2
        if (img(a) - a) != (img(b) - b):
            assert not _luhn_py(swapped)


@settings(max_examples=25, deadline=None)
@given(
    pre=st.text(alphabet="abcdefgh ", min_size=0, max_size=30),
    shared=st.text(alphabet="mnopqrst ", min_size=20, max_size=40),
    post=st.text(alphabet="uvwxyz ", min_size=0, max_size=30),
)
def test_winnowing_guarantee_reference_impl(pre, shared, post):
    """Pure-python reference of the winnowing selection: two texts sharing
    a substring of length >= k+w-1 MUST share a selected hash (the paper's
    core guarantee), verified over hypothesis-generated strings.  Guards
    the Spark implementation's parameters/selection semantics, whose
    equality with this reference is pinned by the catalog oracle."""
    import hashlib
    import re

    k, w = 5, 3

    def norm(s):
        return re.sub(r"\s+", " ", s.lower()).strip()

    def select(text):
        t = norm(text)[:500]
        if len(t) < k:
            return set()
        hs = []
        for i in range(len(t) - k + 1):
            h = int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:12], 16) % (1 << 40)
            hs.append((h, i))
        out = set()
        for end in range(w - 1, len(hs)):
            window = hs[end - w + 1 : end + 1]
            # min hash, rightmost on ties == min of (h, -pos)
            out.add(min((h, -i) for h, i in window))
        return {h for h, _ in out}

    sh = norm(shared)
    if len(sh) < k + w - 1:
        return
    a = select(pre + " " + shared + " junkpadding")
    b = select("other lead " + shared + " " + post)
    # both contain norm(shared) as a substring; guarantee applies
    if norm(pre + " " + shared + " junkpadding").find(sh) >= 0 and norm(
        "other lead " + shared + " " + post
    ).find(sh) >= 0:
        assert a & b


def test_audio_landmarks_shift_property():
    """Prepending exact-silence hops shifts every landmark's time index by
    the hop count and changes nothing else (zero frames emit no peaks)."""
    import math

    from mcpvectordb_spark.sources.audiofp import landmarks_pcm

    x = [int(9000 * math.sin(2 * math.pi * 700 * i / 8000)) for i in range(4000)]
    base = landmarks_pcm(x)
    for s in (1, 4, 9):
        shifted = set(landmarks_pcm([0] * (128 * s) + x))
        expect = {(h, t + s) for h, t in base}
        # every original landmark survives, shifted by exactly s hops
        assert expect <= shifted
        # the only extras anchor at the one frame straddling the
        # silence/signal boundary (128·s zeros end inside frame s-1)
        assert all(t == s - 1 for (h, t) in shifted - expect)
