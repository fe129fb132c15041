"""Interpolated n-gram language-model scoring of a corpus against itself.

The KenLM-perplexity filter of CCNet/RefinedWeb (Wenzek et al. 2020) has
two halves: train an n-gram LM, score every document.  The reference
delegates quality filtering to its embedding pipeline; here both halves
are Spark-native aggregations — a strict upgrade over the unigram
`textstats.unigram_logprob` (which stays as the cheap first gate): the
trigram model penalizes scrambled/word-salad text even when its unigram
distribution is corpus-typical, exactly the failure mode a unigram filter
cannot see.

Model: Jelinek–Mercer interpolation over orders 3→1,

    p(w3 | w1 w2) = λ3·c(w1w2w3)/c(w1w2) + λ2·c(w2w3)/c(w2) + λ1·c(w3)/N

scored at every trigram position; doc score = mean ln p, perplexity =
exp(−score).  Scoring the corpus against itself keeps every count ≥ 1,
so no discounting is needed and every join below is an inner join.

Scale shape (100 TB): counting is one explode + one keyed agg per order
(map-side combined; the shuffle carries (gram, partial-count) pairs, not
text); scoring is hash equi-joins of trigram OCCURRENCES against
vocabulary-bounded count tables.  At web scale you prune the count
tables with a min-count threshold before the join (the classic stupid-
backoff trick) — the join shape is unchanged.  Nothing here is quadratic
and nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.dedup import hexint48, normalize_text


def _grams(base: DataFrame, n: int, names: list[str]) -> DataFrame:
    """All order-n gram occurrences as flat columns (one row per position).
    Docs shorter than n words are filtered BEFORE the sequence so Spark's
    descending-sequence pitfall (sequence(0, -1)) never fabricates grams."""
    g = F.transform(
        F.sequence(F.lit(0), F.size("w") - n),
        lambda i: F.struct(
            *[F.element_at("w", i + j + 1).alias(names[j]) for j in range(n)]
        ),
    )
    out = base.filter(F.size("w") >= n).select("id", F.explode(g).alias("g"))
    return out.select("id", *[F.col(f"g.{c}").alias(c) for c in names])


def ngram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lambdas: tuple[float, float, float] = (0.5, 0.3, 0.2),
) -> DataFrame:
    """Per-document trigram-LM quality: (id, n_trigrams, avg_logp, ppl)
    for every doc with ≥3 tokens.  Counts come from ALL docs (including
    the short ones), scores exist for trigram-bearing docs only."""
    l3, l2, l1 = (float(x) for x in lambdas)
    toks = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda t: t != "")
    # base feeds THREE gram explodes (uni/bi/tri) and tri_occ feeds both
    # its own count table and the scoring join — without pins each
    # reference re-tokenizes/re-explodes the corpus (a DataFrame used N
    # times recomputes N times; the textrank/BFS lesson)
    base = df.select(F.col(id_col).alias("id"), toks.alias("w")).localCheckpoint(
        eager=False
    )

    # Grams shuffle and join as 48-bit hashes, never strings (the
    # windows-as-hashes convention): every count table is keyed by one
    # long, and a trigram occurrence carries its five probe keys as five
    # longs computed in the same projection that exploded it.  Hash
    # collisions merge counts identically in Spark and the oracle (same
    # md5 fold), so the gate stays exact.
    uni_occ = base.select("id", F.explode("w").alias("t"))
    n_total = uni_occ.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    uni_c = (
        uni_occ.select(hexint48(F.col("t")).alias("ku"))
        .groupBy("ku")
        .agg(F.count(F.lit(1)).cast("long").alias("cu"))
    )
    big_c = (
        _grams(base, 2, ["b1", "b2"])
        .select(hexint48(F.concat_ws(" ", "b1", "b2")).alias("kb"))
        .groupBy("kb")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    tri_occ = _grams(base, 3, ["w1", "w2", "w3"]).select(
        "id",
        hexint48(F.concat_ws(" ", "w1", "w2", "w3")).alias("k3"),
        hexint48(F.concat_ws(" ", "w1", "w2")).alias("k12"),
        hexint48(F.concat_ws(" ", "w2", "w3")).alias("k23"),
        hexint48(F.col("w2")).alias("ku2"),
        hexint48(F.col("w3")).alias("ku3"),
    ).localCheckpoint(eager=False)
    tri_c = tri_occ.groupBy("k3").agg(F.count(F.lit(1)).cast("long").alias("c3"))

    p = (
        F.lit(l3) * F.col("c3") / F.col("c12")
        + F.lit(l2) * F.col("c23") / F.col("cu2")
        + F.lit(l1) * F.col("cu3") / F.col("n_total")
    )
    scored = (
        tri_occ.join(tri_c, "k3")
        .join(big_c.select(F.col("kb").alias("k12"), F.col("cb").alias("c12")), "k12")
        .join(big_c.select(F.col("kb").alias("k23"), F.col("cb").alias("c23")), "k23")
        .join(uni_c.select(F.col("ku").alias("ku2"), F.col("cu").alias("cu2")), "ku2")
        .join(uni_c.select(F.col("ku").alias("ku3"), F.col("cu").alias("cu3")), "ku3")
        .crossJoin(F.broadcast(n_total))
        .withColumn("__lp", F.log(p))
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.round(F.avg("__lp"), 6).alias("avg_logp"),
        F.round(F.exp(-F.avg("__lp")), 4).alias("ppl"),
    )
