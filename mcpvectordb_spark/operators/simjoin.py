"""TF-IDF cosine similarity self-join over an inverted index.

The lexical-sparse-vector sibling of the embedding near-dup families in
operators/dedup.py — the representation used by classic near-duplicate /
plagiarism detectors (Broder-era) and by Elasticsearch's more-like-this.
The reference has no corpus-pairs operator at all (its only similarity is
the per-query KNN scan, /root/reference/src/mcpvectordb/store.py:313-320);
this is a scale-path extension for training-data curation.

Semantics (declared spec, mirrored 1:1 by the DuckDB oracle):

    tf(d,t)   = term count (lowercase whitespace tokens, bm25.tokens_col)
    keep t iff df(t) <= max_df            -- stop-term cutoff
    w(d,t)    = tf · ln(N / df)
    cos(a,b)  = Σ_t w(a,t)·w(b,t) / (|w(a)|·|w(b)|)   over kept terms
    emit (a < b) with cos >= threshold

Exactness under the cutoff: dropped stop terms are removed from the
VECTORIZATION (weights and norms alike), so the score is the true cosine
of the filtered representation — not a lower bound of an unfiltered one.
Terms with df = 1 stay in the norms but are pruned from the pair join
(they cannot co-occur), which is a pure optimization.

Scale: candidate generation is the inverted-index join — per-term fanout
is bounded by max_df² (the knob that keeps a 100 TB corpus from going
all-pairs; lower it or add prefix filtering à la Bayardo et al. 2007 for
web-scale).  Two shuffles: (doc,term) aggregation and the pair-sum; the
df table is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.bm25 import doc_terms


def ssjoin_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """The threshold-INDEPENDENT AllPairs/PPJoin index: (doc, term, s, pos)
    where term is the xxhash64'd shingle, s the doc's set size, and pos the
    token's rarest-first rank within its doc (global (df, term) order).

    Split out of :func:`jaccard_ssjoin` so the index can be built once and
    frozen (catalog/_common.py session cache; at 100 TB, a persisted
    table): every threshold's join is then prefix-filter + candidate join +
    verify over the same postings.  ``shingles``: optional precomputed
    (id, shingle) index — skips the corpus explode too.
    """
    from pyspark.sql import Window

    from mcpvectordb_spark.operators.dedup import fan_out, word_shingles

    if shingles is not None:
        exploded = shingles.select(F.col("id").alias("doc"), F.col("shingle").alias("sh"))
    else:
        exploded = fan_out(df).select(
            F.col(id_col).alias("doc"),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
        )
    toks = (
        exploded
        # shingles shuffle as 64-bit hashes end to end: candidate and
        # verify rows are 16 bytes, not strings (collision probability
        # ~ n_shingles²/2^64 — nil at any real corpus size, and a
        # collision can only ever MERGE two shingles, biasing J up by
        # <= 1/|set|)
        .select("doc", F.xxhash64(F.col("sh")).alias("term"))
        # referenced by the rank build AND both verify sides — pin one
        # materialization of the shingle explode
        .localCheckpoint(eager=False)
    )
    sizes = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("s"))
    dfreq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ordered = toks.join(dfreq, "term").join(sizes, "doc")
    pos = F.row_number().over(
        Window.partitionBy("doc").orderBy(F.col("df").asc(), F.col("term").asc())
    )
    return ordered.withColumn("pos", pos).select("doc", "term", "s", "pos")


def jaccard_ssjoin(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard self-join via AllPairs prefix filtering
    (Bayardo, Ma, Srikant, WWW 2007).

    The EXACT counterpart to the probabilistic MinHash-LSH family in
    operators/dedup.py: every pair with ``J(a,b) = |a∩b|/|a∪b| >=
    threshold`` over distinct word n-gram shingles is emitted, none
    missed.  Candidate generation joins only the PREFIX of each set —
    shingles ordered globally rarest-first (df asc, shingle asc), prefix
    length ``|s| - ceil(t·|s|) + 1`` — which is sound because J >= t
    forces an overlap of at least ``ceil(t·|s|)`` elements on each side,
    so two qualifying sets must share a prefix element under any
    consistent total order.

    Scale: prefix elements are the RARE ones, so the per-element fanout
    of the candidate join is tiny compared to a full inverted-index join
    (frequent shingles never enter candidate generation — the df-ordering
    trick that lets AllPairs run web-scale).  Shuffles: shingle
    aggregation, candidate join keyed by shingle, verification join keyed
    by pair.  The verify step rejoins full postings only for surviving
    candidate pairs.
    """
    ranked = (
        postings
        if postings is not None
        else ssjoin_postings(df, id_col, text_col, shingle_n, shingles=shingles)
    )
    toks = ranked.select("doc", "term")

    # prefix filter: |s| − ceil(t·|s|) + 1 rarest-first elements; 1e-9
    # guards ceil against binary-float excess in t·|s|
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("s") - F.ceil(F.lit(threshold) * F.col("s") - F.lit(1e-9)) + 1
    )

    # candidate aggregation with the PPJoin positional filter (Xiao et al.
    # 2008), both EXACT: a qualifying pair needs overlap α =
    # ceil(t·(sa+sb)/(1+t)), and its FIRST shared element (global order ⇒
    # simultaneously min-position on both sides) bounds the achievable
    # overlap by 1 + min(sa−amin, sb−bmin).  The groupBy replaces a bare
    # distinct: map-side combinable, and it collects the positions the
    # filter needs — on shared-vocabulary corpora this drops the dense
    # one-common-shingle candidate mass before the expensive verify join.
    a, b = prefix.alias("a"), prefix.alias("b")
    alpha = F.ceil(
        F.lit(threshold) / (1.0 + threshold) * (F.col("sa") + F.col("sb")) - F.lit(1e-9)
    )
    cand = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.doc") < F.col("b.doc")))
        # length filter: min(|a|,|b|) >= t * max(|a|,|b|)
        .filter(
            F.least("a.s", "b.s").cast("double")
            >= F.lit(threshold) * F.greatest("a.s", "b.s") - F.lit(1e-9)
        )
        .groupBy(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.s").alias("sa"),
            F.col("b.s").alias("sb"),
        )
        .agg(F.min("a.pos").alias("amin"), F.min("b.pos").alias("bmin"))
        .filter(
            1 + F.least(F.col("sa") - F.col("amin"), F.col("sb") - F.col("bmin"))
            >= alpha
        )
        .select("id_a", "id_b", "sa", "sb")
    )

    # verify: re-join candidate pairs against the full (hashed) postings
    # and COUNT matches — a streaming |cand|·|set| row shuffle of 16-byte
    # rows.  (An array-intersect verify — whole shingle arrays attached to
    # every candidate row — looks cheaper but materializes |cand|·|set|
    # BYTES in memory at once and OOMs when replicated corpora make
    # candidates dense; measured at the 200k-doc stress scale.)
    ta = toks.select(F.col("doc").alias("id_a"), "term")
    tb = toks.select(F.col("doc").alias("id_b"), "term")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "term"])
        .groupBy("id_a", "id_b", "sa", "sb")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return inter.select(
        "id_a",
        "id_b",
        (F.col("i") / (F.col("sa") + F.col("sb") - F.col("i"))).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    max_df: int = 100,
) -> DataFrame:
    """All pairs (id_a < id_b) with filtered-TF-IDF cosine >= threshold."""
    # posting feeds dfreq AND the weight table; w feeds the norms AND both
    # self-join sides — pin each once or every reference re-tokenizes the
    # corpus (a DataFrame used N times recomputes N times)
    posting = doc_terms(df, id_col, text_col).localCheckpoint(eager=False)
    n_docs = F.broadcast(df.agg(F.count(F.lit(1)).cast("double").alias("__n")))
    dfreq = posting.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    w = (
        posting.join(dfreq.filter(F.col("df") <= max_df), "term")
        .crossJoin(n_docs)
        .select(
            "doc", "term", "df",
            (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    norms = w.groupBy("doc").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    wj = w.filter(F.col("df") >= 2).select("doc", "term", "w")

    pairs = (
        wj.alias("a")
        .join(wj.alias("b"), (F.col("a.term") == F.col("b.term")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    return (
        pairs.join(norms.select(F.col("doc").alias("id_a"), F.col("norm").alias("na")), "id_a")
        .join(norms.select(F.col("doc").alias("id_b"), F.col("norm").alias("nb")), "id_b")
        .select("id_a", "id_b", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine"))
        # threshold on the 9dp-ROUNDED cosine: dot and the norms are
        # cross-term float sums (aggregation-order ulp noise) over
        # ln()-bearing tf-idf weights, so a pair within an ulp of the
        # threshold could pass one engine and fail the other (round-7
        # ranked-cut discipline applied to float-threshold filters)
        .filter(F.round(F.col("cosine"), 9) >= threshold)
    )
