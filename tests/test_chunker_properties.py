"""Property-based chunker tests (hypothesis): invariants that must hold for
ANY input text — the reference's behavioral guarantees (chunker.py:107-141)
as universally-quantified properties."""

from hypothesis import given, settings
from hypothesis import strategies as st

from mcpvectordb_spark.chunker import chunk_text
from mcpvectordb_spark.config import EngineConfig

CFG = EngineConfig(chunk_size_tokens=16, chunk_overlap_tokens=4, chunk_min_tokens=3)

words = st.text(alphabet="abcdefghij", min_size=1, max_size=8)
texts = st.lists(words, min_size=0, max_size=120).map(" ".join)
texts_with_paras = st.lists(
    st.lists(words, min_size=1, max_size=30).map(" ".join), min_size=1, max_size=6
).map("\n\n".join)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_chunks_respect_bounds(text):
    out = chunk_text(text, CFG)
    if not text.strip():
        assert out == []
        return
    assert out, "non-empty text never vanishes"
    if len(out) == 1:
        # single chunk may be the whole-doc fallback (below min floor)
        assert len(out[0].split()) <= max(CFG.chunk_size_tokens, len(text.split()))
    else:
        for c in out:
            assert CFG.chunk_min_tokens <= len(c.split()) <= CFG.chunk_size_tokens


@settings(max_examples=200, deadline=None)
@given(texts_with_paras)
def test_vocabulary_lost_only_to_min_floor(text):
    """Chunking never invents words, and vocabulary can only be lost to the
    min-token floor (the reference deliberately drops sub-minimum tail
    chunks when other chunks survive, chunker.py:122-125 — found by an
    earlier, too-strong version of this property).  With the floor at 1,
    coverage must be complete."""
    out = chunk_text(text, CFG)
    original = set(text.split())
    for c in out:
        for w in c.split():
            assert w in original, f"invented word {w!r}"
    no_floor = EngineConfig(
        chunk_size_tokens=CFG.chunk_size_tokens,
        chunk_overlap_tokens=CFG.chunk_overlap_tokens,
        chunk_min_tokens=1,
    )
    covered = {w for c in chunk_text(text, no_floor) for w in c.split()}
    if text.strip():
        assert covered == original


@settings(max_examples=100, deadline=None)
@given(texts)
def test_deterministic(text):
    assert chunk_text(text, CFG) == chunk_text(text, CFG)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab \n", min_size=0, max_size=300))
def test_never_crashes_on_whitespace_soup(text):
    out = chunk_text(text, CFG)
    assert isinstance(out, list)
    assert all(c.strip() for c in out), "no whitespace-only chunks"
