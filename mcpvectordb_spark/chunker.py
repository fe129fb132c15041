"""Token-aware recursive text chunker.

Behavioral parity target: /root/reference/src/mcpvectordb/chunker.py:55-141
(separator hierarchy "\\n\\n" → "\\n" → " " → chars; recursive descent into
oversized pieces; greedy merge with token overlap carry-over; min-token floor
with whole-document fallback).  The implementation below is written fresh for
Spark: the token counter is injected (FIXTURES.md rule 2 — the reference's HF
tokenizer is one choice of counter, tests use deterministic counters), token
counts are memoized per call, and the distributed form is an Arrow-batched
``mapInPandas`` flatMap stage (SURVEY.md §2.9 D1: one doc row → N chunk rows).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from mcpvectordb_spark.config import DEFAULT, EngineConfig
from mcpvectordb_spark.tokenizer import ws_token_count

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame

SEPARATOR_HIERARCHY = ("\n\n", "\n", " ", "")

TokenCounter = Callable[[str], int]


class _Chunker:
    """Single-call chunking context: memoizes token counts across the
    recursion (the reference re-tokenizes the same piece repeatedly in its
    merge loop; memoization changes cost, not output)."""

    def __init__(self, size: int, overlap: int, minimum: int, count: TokenCounter):
        self.size = size
        self.overlap = overlap
        self.minimum = minimum
        self._count = count
        self._memo: dict[str, int] = {}

    def tokens(self, piece: str) -> int:
        n = self._memo.get(piece)
        if n is None:
            n = self._count(piece)
            self._memo[piece] = n
        return n

    # cross-document memo cap: shared vocabulary makes word-level token
    # counts highly reusable across docs, but an unbounded partition-lived
    # memo would grow with the task's total text (OOM hazard) — reset when
    # it exceeds the cap
    MEMO_CAP = 200_000

    def run(self, text: str) -> list[str]:
        if len(self._memo) > self.MEMO_CAP:
            self._memo.clear()
        if not text.strip():
            return []
        raw = self._descend(text, 0)
        kept = [c for c in raw if self.tokens(c) >= self.minimum]
        if not kept and raw:
            # Shorter than the floor → index the whole doc as one chunk
            # rather than dropping it (reference chunker.py:127-134).
            kept = [text.strip()]
        return kept

    def _descend(self, text: str, level: int) -> list[str]:
        if level >= len(SEPARATOR_HIERARCHY):
            return [text]  # out of separators; caller's floor filter decides
        sep = SEPARATOR_HIERARCHY[level]
        pieces = list(text) if sep == "" else text.split(sep)
        fitted: list[str] = []
        for p in pieces:
            if not p:
                continue
            if self.tokens(p) > self.size:
                fitted.extend(self._descend(p, level + 1))
            else:
                fitted.append(p)
        return self._pack(fitted, sep)

    def _pack(self, pieces: list[str], sep: str) -> list[str]:
        """Greedy merge of pieces into ≤size chunks, carrying `overlap`
        tokens of trailing pieces into the next chunk."""
        out: list[str] = []
        window: list[str] = []
        budget = 0
        for p in pieces:
            n = self.tokens(p)
            if window and budget + n > self.size:
                out.append(sep.join(window))
                while window and budget > self.overlap:
                    budget -= self.tokens(window[0])
                    del window[0]
            window.append(p)
            budget += n
        if window:
            out.append(sep.join(window))
        return out


def chunk_text(
    text: str,
    config: EngineConfig = DEFAULT,
    token_counter: TokenCounter = ws_token_count,
) -> list[str]:
    """Pure-Python entry point (unit-testable; also used inside the UDF)."""
    return _Chunker(
        config.chunk_size_tokens,
        config.chunk_overlap_tokens,
        config.chunk_min_tokens,
        token_counter,
    ).run(text)


def chunk_documents(
    docs: "DataFrame",
    content_col: str = "content",
    config: EngineConfig = DEFAULT,
    token_counter: TokenCounter = ws_token_count,
) -> "DataFrame":
    """Distributed flatMap: one document row → N chunk rows.

    Keeps every input column, replaces ``content_col`` with the chunk text and
    appends ``chunk_index`` (0-based position within the doc, reference
    ingestor.py:253).  Runs as ``mapInPandas`` so the (potentially expensive)
    tokenizer loads once per executor process, not per row — the Spark
    equivalent of the reference's tokenizer singleton (chunker.py:24-46).
    """
    import pandas as pd  # noqa: F401 — executor-side import

    passthrough = [c for c in docs.columns if c != content_col]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema if f.name in passthrough]
        + [f"`{content_col}` string", "`chunk_index` int"]
    )

    size, overlap, minimum = (
        config.chunk_size_tokens,
        config.chunk_overlap_tokens,
        config.chunk_min_tokens,
    )

    def explode_chunks(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        chunker = _Chunker(size, overlap, minimum, token_counter)
        for pdf in batches:
            rows: list[dict] = []
            for rec in pdf.to_dict(orient="records"):
                text = rec.get(content_col) or ""
                for i, piece in enumerate(chunker.run(text)):
                    row = {k: rec[k] for k in passthrough}
                    row[content_col] = piece
                    row["chunk_index"] = i
                    rows.append(row)
            yield pd.DataFrame(rows, columns=passthrough + [content_col, "chunk_index"])

    return docs.mapInPandas(explode_chunks, schema=out_schema)
