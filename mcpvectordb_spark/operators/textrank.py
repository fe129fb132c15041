"""TextRank extractive summarization (Mihalcea & Tarau, EMNLP 2004).

Per-document sentence graphs ranked with damped power iteration — the
summarization stage of a training-data pipeline (pick the k most central
sentences of each document as its summary / preview snippet).  The
reference has no summarizer; its closest surface is the chunk preview
(/root/reference/src/mcpvectordb/store.py:245-262), which truncates
instead of ranking.

Semantics (mirrored 1:1 by the DuckDB oracle):

    sentences(d)  = trim segments of text split on /\\.\\s+/, empties out,
                    DISTINCT per doc
    tokens(s)     = DISTINCT lowercase whitespace tokens (bm25 tokenizer)
    w(a,b)        = |tokens(a) ∩ tokens(b)| / (ln(|a|+1) + ln(|b|+1))
    r⁰(s)         = 1.0
    rᵏ(s)         = (1-d) + d · Σ_{j→s} (w_js / Σ_out w_j) · rᵏ⁻¹(j)
    output        = top-k sentences per doc by (rank desc, sent asc)

ALL documents' graphs run in ONE set of DataFrames keyed by doc — there
is no per-document loop; a corpus of 10^9 docs is the same 5-iteration
plan.  Shuffles per iteration: one join (ranks × normalized edges, keyed
by src) and one keyed agg; the sentence-pair build is a self-join keyed
by (doc, term), bounded per doc by sentence-count².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.bm25 import tokens_col


def sentences(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, sent) — distinct trimmed sentences per document."""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), r"\.\s+")).alias("raw"),
        )
        .select("doc", F.trim("raw").alias("sent"))
        .filter(F.col("sent") != "")
        .distinct()
    )


def textrank_sentences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 2,
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(doc, sent, rank) — top_k TextRank-ranked sentences per document."""
    sents = sentences(df, id_col, text_col)
    stoks = (
        sents.select("doc", "sent", F.explode(tokens_col(F.col("sent"))).alias("term"))
        .distinct()
    )
    sizes = stoks.groupBy("doc", "sent").agg(F.count(F.lit(1)).alias("nt"))

    a, b = stoks.alias("a"), stoks.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.doc") == F.col("b.doc"))
            & (F.col("a.term") == F.col("b.term"))
            & (F.col("a.sent") < F.col("b.sent")),
        )
        .groupBy(F.col("a.doc").alias("doc"), F.col("a.sent").alias("sa"), F.col("b.sent").alias("sb"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col("doc"), F.col("sent").alias("sa"), F.col("nt").alias("na"))
    nb = sizes.select(F.col("doc"), F.col("sent").alias("sb"), F.col("nt").alias("nb"))
    sim = (
        common.join(na, ["doc", "sa"])
        .join(nb, ["doc", "sb"])
        .select(
            "doc", "sa", "sb",
            (F.col("c") / (F.log(F.col("na") + 1) + F.log(F.col("nb") + 1))).alias("w"),
        )
        # r9 optimization: the symmetrization union below consumes sim
        # twice — without this pin the tokenize + sentence-pair join +
        # size joins re-ran once per direction.
        .localCheckpoint(eager=False)
    )
    edges = sim.select("doc", F.col("sa").alias("src"), F.col("sb").alias("dst"), "w").unionByName(
        sim.select("doc", F.col("sb").alias("src"), F.col("sa").alias("dst"), "w")
    )
    wout = edges.groupBy("doc", "src").agg(F.sum("w").alias("wt"))
    # pin the graph and the node set: both are referenced every iteration,
    # and without the pin each iteration replays tokenize + pair build
    ne = (
        edges.join(wout, ["doc", "src"])
        .select("doc", "src", "dst", (F.col("w") / F.col("wt")).alias("nw"))
        .localCheckpoint(eager=False)
    )
    sents = sents.localCheckpoint(eager=False)

    ranks = sents.select("doc", "sent", F.lit(1.0).alias("r"))
    for _ in range(iters):
        contrib = (
            ne.join(
                ranks.select("doc", F.col("sent").alias("src"), "r"), ["doc", "src"]
            )
            .groupBy("doc", F.col("dst").alias("sent"))
            .agg(F.sum(F.col("nw") * F.col("r")).alias("inflow"))
        )
        ranks = (
            sents.join(contrib, ["doc", "sent"], "left")
            .select(
                "doc", "sent",
                (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias("r"),
            )
        )
        ranks = ranks.localCheckpoint(eager=False)

    # 6dp-rounded rank key — power-iteration scores are cross-row float
    # sums (round-7 ranked-cut discipline)
    top = F.row_number().over(
        Window.partitionBy("doc").orderBy(
            F.round(F.col("r"), 6).desc(), F.col("sent").asc()
        )
    )
    return (
        ranks.withColumn("rn", top)
        .filter(F.col("rn") <= top_k)
        .select("doc", "sent", F.col("r").alias("rank"))
    )
