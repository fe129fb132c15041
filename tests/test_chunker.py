"""Chunker parity tests (behavior spec: reference chunker.py:55-141;
matrix: FIXTURES.md / reference test_chunker.py:48-67)."""

from mcpvectordb_spark.chunker import chunk_documents, chunk_text
from mcpvectordb_spark.config import EngineConfig
from mcpvectordb_spark.tokenizer import bpe_ish_token_count, ws_token_count

CFG = EngineConfig(chunk_size_tokens=32, chunk_overlap_tokens=8, chunk_min_tokens=4)


def toks(s):
    return len(s.split())


def test_empty_and_whitespace():
    assert chunk_text("", CFG) == []
    assert chunk_text("   \n\n  ", CFG) == []


def test_short_doc_single_chunk_fallback():
    # below the min floor → whole doc as one chunk, not dropped
    out = chunk_text("one two", CFG)
    assert out == ["one two"]


def test_size_ceiling_respected():
    text = " ".join(f"w{i}" for i in range(200))
    out = chunk_text(text, CFG)
    assert len(out) > 1
    assert all(toks(c) <= CFG.chunk_size_tokens for c in out)


def test_min_floor_filters_small_chunks():
    # two paragraphs: one big, one tiny — tiny one merged or dropped, never
    # emitted below the floor (unless it is the whole doc)
    text = " ".join(f"w{i}" for i in range(40)) + "\n\ntiny bit"
    out = chunk_text(text, CFG)
    assert all(toks(c) >= CFG.chunk_min_tokens for c in out)


def test_overlap_carries_tokens():
    text = " ".join(f"w{i}" for i in range(100))
    out = chunk_text(text, CFG)
    # consecutive chunks share the overlap suffix/prefix words
    for a, b in zip(out, out[1:]):
        shared = set(a.split()) & set(b.split())
        assert shared, "expected overlap words between consecutive chunks"


def test_paragraph_separator_preferred():
    paras = ["para one has several words inside it"] * 3
    text = "\n\n".join(paras)
    out = chunk_text(text, EngineConfig(chunk_size_tokens=10, chunk_overlap_tokens=0, chunk_min_tokens=1))
    # splitting happened at paragraph boundaries, not mid-paragraph
    assert all("\n\n" not in c or toks(c) <= 10 for c in out)


def test_oversized_single_word_char_split():
    # one giant "word" exceeds the size at every separator level → char split
    out = chunk_text("x" * 500, EngineConfig(chunk_size_tokens=5, chunk_overlap_tokens=0, chunk_min_tokens=1),
                     token_counter=lambda s: len(s))
    assert out and all(len(c) <= 5 for c in out)


def test_unicode_safe():
    out = chunk_text("héllo wörld " * 30, CFG)
    assert out and all(isinstance(c, str) for c in out)


def test_deterministic():
    text = " ".join(f"w{i % 17}" for i in range(300))
    assert chunk_text(text, CFG) == chunk_text(text, CFG)


def test_bpe_ish_counter_changes_boundaries():
    text = " ".join("supercalifragilistic" for _ in range(50))
    ws_chunks = chunk_text(text, CFG, ws_token_count)
    bpe_chunks = chunk_text(text, CFG, bpe_ish_token_count)
    # subword counting inflates token counts → more, smaller chunks
    assert len(bpe_chunks) >= len(ws_chunks)


def test_distributed_matches_local(spark, mini_docs):
    local = {
        r["source"]: chunk_text(r["content"], CFG)
        for r in mini_docs.collect()
    }
    dist = chunk_documents(mini_docs, "content", CFG).collect()
    got: dict[str, list[str]] = {}
    for row in sorted(dist, key=lambda r: (r["source"], r["chunk_index"])):
        got.setdefault(row["source"], []).append(row["content"])
    assert got == {k: v for k, v in local.items() if v}
