"""Byte-pair-encoding training + application, Spark-first.

The reference counts tokens with a pretrained tokenizer (chunker.py /
embedder.py); a training-data pipeline also needs to TRAIN the tokenizer
on its own corpus.  The classic BPE trainer (Sennrich et al. 2016) is
map-reduce shaped, and this module keeps that shape honest:

- the corpus-scale work is ONE distributed aggregation — the word
  histogram (:func:`word_histogram`: explode → groupBy → count).  At
  100 TB that agg is the only shuffle, with map-side combine collapsing
  repeats before they move;
- merges are then learned on the distinct-word histogram
  (:func:`train_bpe`) whose size is vocabulary-bounded (a deterministic
  top-``max_vocab`` cap) regardless of corpus bytes — kilobytes on the
  driver, the same scale as IVF centroids or Bloom bitsets;
- applying the learned merges back over the corpus
  (:func:`bpe_encode`) is an Arrow-batched kernel with per-batch word
  memoization — embarrassingly parallel, no shuffle.

Determinism (needed for the golden-digest gate): the histogram cap orders
by (count DESC, word ASC); merge selection is max count with the
lexicographically-smallest pair winning ties; application is the standard
lowest-rank-first greedy loop.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

EOW = "</w>"


def word_histogram(
    df: DataFrame,
    text_col: str,
    lowercase: bool = True,
    max_vocab: int = 65536,
) -> DataFrame:
    """(word, count) over the corpus — the single corpus-scale pass.

    ``max_vocab`` caps the histogram deterministically (count DESC, word
    ASC) so the driver-side merge loop is bounded; rare tail words
    contribute ~nothing to pair statistics (the standard trainer
    truncation)."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = df.select(
        F.explode(F.split(F.trim(t), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(max_vocab)
    )


def train_bpe(hist, n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a word histogram (DataFrame or
    [(word, count)]).  Pure driver loop over vocabulary-sized state,
    INCREMENTAL in the standard trainer way: each merge re-counts only the
    words that contain the merged pair (tracked via a pair→words index),
    not the whole vocabulary — O(touched) per merge instead of O(vocab)."""
    from collections import defaultdict

    if isinstance(hist, DataFrame):
        hist = [(r["word"], int(r["count"])) for r in hist.collect()]
    seqs: dict[str, tuple[str, ...]] = {w: tuple(w) + (EOW,) for w, _ in hist}
    counts = dict(hist)
    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set] = defaultdict(set)
    for w, seq in seqs.items():
        c = counts[w]
        for pair in zip(seq, seq[1:]):
            pair_counts[pair] += c
            where[pair].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        live = [(p, c) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        best = min(live, key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for w in list(where[best]):
            seq = seqs[w]
            c = counts[w]
            for pair in zip(seq, seq[1:]):
                pair_counts[pair] -= c
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
                where[pair].discard(w)
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = new_seq = tuple(out)
            for pair in zip(new_seq, new_seq[1:]):
                pair_counts[pair] += c
                where[pair].add(w)
    return merges


def apply_bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard greedy application: repeatedly merge the LOWEST-rank
    adjacent pair (ties impossible — ranks are unique)."""
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """text → array<string> of BPE tokens.  Arrow-batched; the merge table
    (vocabulary-scale) rides the closure, and per-batch word memoization
    makes the common case a dict hit (Zipf: a few thousand distinct words
    dominate any batch)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    passthrough = list(df.columns)
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema]
        + [f"`{out_col}` array<string>"]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        memo: dict[str, list[str]] = {}

        def encode(text) -> list[str]:
            toks: list[str] = []
            norm = (text or "").strip()
            if lowercase:
                norm = norm.lower()
            for w in norm.split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = apply_bpe_word(w, ranks)
                toks.extend(got)
            return toks

        for pdf in batches:
            out = pdf[passthrough].copy()
            out[out_col] = [encode(t) for t in pdf[text_col]]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def save_merges(spark, merges: list, path: str) -> None:
    """Persist a trained merge list as rank-ordered parquet — the trained
    artifact of :func:`train_bpe`, so encode-only runs load the tokenizer
    instead of re-running the corpus histogram (the same persisted-state
    seam as the IVF index, the decontamination bloom, and the eval shingle
    index)."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    spark.createDataFrame(rows, "rank int, left string, right string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list:
    """Load a persisted merge list in training order.  The rank column IS
    the merge priority; corruption of it would silently change every
    tokenization, so the contiguity of ranks is validated."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    ranks = [int(r["rank"]) for r in rows]
    if ranks != list(range(len(rows))):
        raise ValueError(f"merge table at {path} has non-contiguous ranks")
    return [(r["left"], r["right"]) for r in rows]
