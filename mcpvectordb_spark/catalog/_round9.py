"""Round-9 catalog additions — four dedup-adjacent curation readouts a
100 TB training-data team reads between the dedup pass and the training
cut, each SQL-expressible and built from keyed aggregations over
existing corpus signals:

- ``dup_cluster_sizes``: the exact-duplicate cluster-size profile
  (how much of the corpus sits in 2-copy vs N-copy clusters, and how
  many bytes exact dedup would reclaim per size class) — the first
  chart in any dedup report.
- ``dedup_survivors``: per-source keep-one-per-cluster accounting
  (lowest doc_id wins, the deterministic canonicalization rule): docs
  kept/removed, bytes removed, and how many removals lost to a COPY IN
  A DIFFERENT SOURCE — the number that says "dedup will quietly shift
  my source mix".
- ``ngram_coverage``: corpus concentration — the share of all distinct
  (doc, 3-gram) incidences covered by the top-100 shingles, with the
  cumulative curve; high coverage means boilerplate/template mass.
- ``near_dup_rate_by_source``: per-source share of documents involved
  in at least one cross-corpus near-dup pair (Jaccard >= 0.02) — the
  per-source exposure view of the pair table whose source-pair view is
  ``source_leakage``.

Ranked-cut discipline (tools/rankkey_report.py): every cut key is exact
— BIGINT document frequencies with a shingle-string tiebreak
(ngram_coverage's top-100), strings and integers everywhere else; all
ratios are single divisions of exact BIGINTs (engine-exact before the
6dp display rounding).  No libm anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcpvectordb_spark.catalog._common import (
    _shared_neardup_pairs,
    _shared_shingles,
    _sql_shingles,
    _sql_words,
)
from mcpvectordb_spark.io import load_table


def _digest_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, dig, nb): the exact-dup working set — content
    digest over NULL-coalesced text (the repo convention) plus the byte
    weight used for savings accounting."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        "doc_id",
        "source",
        F.md5(t).alias("dig"),
        F.octet_length(t).cast("long").alias("nb"),
    )


def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size histogram: for each cluster size s,
    the number of digest clusters, total docs, excess docs (s−1 per
    cluster — what keep-one dedup removes) and excess bytes reclaimed.
    Docs in one cluster share their text byte-for-byte, so the byte
    weight is exact, not an estimate.

    Scale shape: one scan → digest-keyed count agg (the dedup shuffle
    the suite already pays) → size-keyed histogram agg over |clusters|
    rows.  All BIGINT; output bounded by the largest cluster size."""
    clusters = (
        _digest_base(spark, sf_dir)
        .groupBy("dig")
        .agg(
            F.count(F.lit(1)).cast("long").alias("size"),
            # identical text within a cluster -> identical byte count
            F.max("nb").alias("nb"),
        )
    )
    return (
        clusters.groupBy(F.col("size").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("size").cast("long").alias("n_docs"),
            F.sum(F.col("size") - 1).cast("long").alias("n_excess_docs"),
            F.sum((F.col("size") - 1) * F.col("nb")).cast("long").alias("excess_bytes"),
        )
        .orderBy("cluster_size")
    )


SQL_DUP_CLUSTER_SIZES = """
WITH base AS (
  SELECT doc_id, md5(coalesce(text, '')) AS dig,
         CAST(strlen(coalesce(text, '')) AS BIGINT) AS nb
  FROM documents),
clusters AS (
  SELECT dig, CAST(count(*) AS BIGINT) AS size, max(nb) AS nb
  FROM base GROUP BY 1)
SELECT size AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(size) AS BIGINT) AS n_docs,
       CAST(sum(size - 1) AS BIGINT) AS n_excess_docs,
       CAST(sum((size - 1) * nb) AS BIGINT) AS excess_bytes
FROM clusters GROUP BY 1 ORDER BY 1
"""


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-dedup accounting under the deterministic
    keep-one rule (lowest doc_id in each digest cluster survives): docs
    kept/removed, bytes removed, and — the mix-shift warning —
    ``n_lost_cross_source``, removals whose surviving copy lives in a
    DIFFERENT source (global dedup silently reallocates that content's
    representation to the other source).

    Scale shape: digest-keyed min-struct agg (one shuffle) → equi-join
    of the |clusters|-row winner table back on the digest (the second
    dedup-sized shuffle; no broadcast assumption) → |sources|-row agg.
    The winner is min(struct(doc_id, source)): doc_id is unique, so the
    struct min IS the min-doc_id row and carries its source for free."""
    base = _digest_base(spark, sf_dir)
    winners = base.groupBy("dig").agg(F.min(F.struct("doc_id", "source")).alias("w"))
    tagged = base.join(
        winners.select(
            "dig", F.col("w.doc_id").alias("keep_id"), F.col("w.source").alias("keep_src")
        ),
        "dig",
    )
    removed = F.col("doc_id") != F.col("keep_id")
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((~removed).cast("long")).cast("long").alias("n_kept"),
            F.sum(removed.cast("long")).cast("long").alias("n_removed"),
            F.sum(F.when(removed, F.col("nb")).otherwise(0)).cast("long")
            .alias("bytes_removed"),
            F.sum((removed & (F.col("source") != F.col("keep_src"))).cast("long"))
            .cast("long")
            .alias("n_lost_cross_source"),
        )
        .withColumn(
            "removed_rate",
            F.round(F.col("n_removed") / F.col("n_docs"), 6),
        )
        .orderBy("source")
    )


SQL_DEDUP_SURVIVORS = """
WITH base AS (
  SELECT doc_id, source, md5(coalesce(text, '')) AS dig,
         CAST(strlen(coalesce(text, '')) AS BIGINT) AS nb
  FROM documents),
winners AS (SELECT dig, min(doc_id) AS keep_id FROM base GROUP BY 1),
tagged AS (
  SELECT b.doc_id, b.source, b.nb, w.keep_id, k.source AS keep_src
  FROM base b
  JOIN winners w ON b.dig = w.dig
  JOIN base k ON k.doc_id = w.keep_id)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN doc_id <> keep_id THEN nb ELSE 0 END) AS BIGINT) AS bytes_removed,
       CAST(sum(CASE WHEN doc_id <> keep_id AND source <> keep_src THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lost_cross_source,
       round(CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS removed_rate
FROM tagged GROUP BY 1 ORDER BY 1
"""


def q_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-concentration curve: the top-100 3-gram shingles by
    document frequency, each with its share of ALL distinct
    (doc, shingle) incidences and the cumulative share — the
    boilerplate detector (a steep curve means template mass a dedup or
    line-filter pass should take first).

    Scale shape: runs on the session-shared shingle inverted index; one
    shingle-keyed count agg, a TakeOrderedAndProject top-100 on the
    exact (df DESC, shingle ASC) key, then rank/cumsum windows over the
    100 surviving rows (k-bounded in-plan — the curation-suite pre-cut
    discipline).  share and cum_share are single divisions of exact
    BIGINTs by the broadcast 1-row total."""
    sh = _shared_shingles(spark, sf_dir, "raw")
    tot = F.broadcast(sh.agg(F.count(F.lit(1)).cast("long").alias("__tot")))
    df_t = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("long").alias("df"))
    top = df_t.orderBy(F.desc("df"), F.asc("shingle")).limit(100)
    w = Window.orderBy(F.desc("df"), F.asc("shingle"))
    cum = F.sum("df").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # rank/cumsum run DIRECTLY on the 100-row TakeOrdered cut, and the
    # 1-row total joins after — keeping the window's child chain
    # k-bounded in-plan (plan_report's child_chain_is_limited walk stops
    # at joins, so the scalar broadcast must not sit inside the chain)
    ranked = top.select(
        F.row_number().over(w).alias("rank"),
        "shingle",
        "df",
        cum.alias("__cum"),
    )
    return (
        ranked.crossJoin(tot)
        .select(
            "rank",
            "shingle",
            "df",
            F.round(F.col("df") / F.col("__tot"), 6).alias("share"),
            F.round(F.col("__cum") / F.col("__tot"), 6).alias("cum_share"),
        )
        .orderBy("rank")
    )


SQL_NGRAM_COVERAGE = f"""
WITH sh AS (
  SELECT doc_id AS id, unnest({_sql_shingles(_sql_words('text'), 3)}) AS shingle
  FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sh),
df_t AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1),
top AS (SELECT shingle, df FROM df_t ORDER BY df DESC, shingle LIMIT 100),
ranked AS (
  SELECT row_number() OVER (ORDER BY df DESC, shingle) AS rank, shingle, df,
         CAST(sum(df) OVER (ORDER BY df DESC, shingle ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM top)
SELECT rank, shingle, df,
       round(CAST(df AS DOUBLE) / n, 6) AS share,
       round(CAST(cum AS DOUBLE) / n, 6) AS cum_share
FROM ranked, tot ORDER BY rank
"""


def q_near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source near-duplicate EXPOSURE: the share of each source's
    documents that participate in at least one near-dup pair (3-gram
    Jaccard >= 0.02, the leakage-audit threshold) anywhere in the
    corpus.  source_leakage answers "which source pairs bleed into each
    other"; this answers "how much of MY source is implicated at all"
    — the number that decides whether a source enters the mix before
    or after fuzzy dedup.

    Scale shape: reads the session-shared (raw, 3, 0.02) pair table —
    the THIRD consumer of the artifact minhash_calibration and
    source_leakage already share — takes the distinct union of its two
    id columns (bounded by true duplication, not corpus size), one
    equi-join onto the |docs|-row (id, source) projection, and two
    |sources|-row aggs."""
    pairs = _shared_neardup_pairs(spark, sf_dir, n=3, threshold=0.02, corpus="raw")
    src = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "source"
    )
    flagged_ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    flagged = (
        flagged_ids.join(src, "id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_neardup"))
    )
    totals = src.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        totals.join(flagged, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_neardup"), F.lit(0)).cast("long").alias("n_neardup"),
            F.round(
                F.coalesce(F.col("n_neardup"), F.lit(0)) / F.col("n_docs"), 6
            ).alias("neardup_rate"),
        )
        .orderBy("source")
    )


SQL_NEAR_DUP_RATE_BY_SOURCE = f"""
WITH corpus AS (SELECT doc_id AS id, text FROM documents),
sizes AS (SELECT id, count(DISTINCT shingle) AS set_size
          FROM (SELECT id, unnest({_sql_shingles(_sql_words('text'), 3)}) AS shingle
                FROM corpus) GROUP BY 1),
shg AS (SELECT id, unnest({_sql_shingles(_sql_words('text'), 3)}) AS shingle FROM corpus),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
  FROM shg a JOIN shg b ON b.shingle = a.shingle AND a.id < b.id
  GROUP BY 1, 2),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM common c
  JOIN sizes sa ON sa.id = c.id_a
  JOIN sizes sb ON sb.id = c.id_b
  WHERE CAST(c.common AS DOUBLE) / (sa.set_size + sb.set_size - c.common) >= 0.02),
flagged_ids AS (
  SELECT DISTINCT id FROM (
    SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
flagged AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_neardup
  FROM flagged_ids f JOIN documents d ON d.doc_id = f.id GROUP BY 1),
totals AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1)
SELECT t.source, t.n_docs,
       CAST(coalesce(f.n_neardup, 0) AS BIGINT) AS n_neardup,
       round(CAST(coalesce(f.n_neardup, 0) AS DOUBLE) / t.n_docs, 6) AS neardup_rate
FROM totals t LEFT JOIN flagged f ON t.source = f.source
ORDER BY t.source
"""


# ---------------------------------------------------------------------------
# second batch: contamination rollup, label-noise audit, length profile,
# pair-similarity histogram
# ---------------------------------------------------------------------------


def q_contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source eval-set contamination rate: the decontaminate gate
    (same planted eval/train construction as q_decontaminate — eval =
    docs 0-49, train = the rest plus mutated eval copies at +10M ids)
    rolled up to the readout a mix owner acts on: of MY source's
    training docs, how many would the ≥50%-shingle-overlap gate
    subtract?  The planted mutants inherit their eval doc's source, so
    every source with low ids shows a non-zero rate by construction.

    Scale shape: the eval shingle index is broadcast (benchmarks are
    tiny relative to training corpora), overlap is a map-side join —
    the decontaminate operator's stress-proven shape — and the rollup
    adds one |sources|-row agg over a left semi-style flag join."""
    from mcpvectordb_spark.catalog._common import _NEARDUP_SUFFIX, _PLANT_OFFSET
    from mcpvectordb_spark.operators import curation as cu

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("id"), "text"
    )
    train = docs.filter(F.col("doc_id") >= 50).select(
        F.col("doc_id").alias("id"), "text", "source"
    ).unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + _PLANT_OFFSET).alias("id"),
            F.concat(F.col("text"), F.lit(_NEARDUP_SUFFIX)).alias("text"),
            "source",
        )
    )
    flagged = cu.decontaminate(
        train.select("id", "text"), eval_df, "id", "text", n=3, threshold=0.5
    ).select("id", F.lit(1).alias("__hit"))
    return (
        train.join(flagged, "id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_docs"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination_rate",
            F.round(F.col("n_contaminated") / F.col("n_train_docs"), 6),
        )
        .orderBy("source")
    )


def _sql_contamination_by_source() -> str:
    from mcpvectordb_spark.catalog._common import (
        _NEARDUP_SUFFIX,
        _PLANT_OFFSET,
        _sql_hex48,
    )

    shingles = _sql_shingles(_sql_words("text"), 3)
    h48 = _sql_hex48("shingle")
    return rf"""
WITH eval_set AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 50),
train AS (
  SELECT doc_id AS id, text, source FROM documents WHERE doc_id >= 50
  UNION ALL
  SELECT doc_id+{_PLANT_OFFSET} AS id, text || '{_NEARDUP_SUFFIX}' AS text, source
  FROM documents WHERE doc_id < 50),
tsh AS (SELECT id, {h48} AS h FROM (SELECT id, unnest({shingles}) AS shingle FROM train)),
esh AS (SELECT DISTINCT {h48} AS h, id AS eval_id
        FROM (SELECT id, unnest({shingles}) AS shingle FROM eval_set)),
sizes AS (SELECT id, count(*) AS set_size FROM tsh GROUP BY id),
common AS (
  SELECT t.id, e.eval_id, count(*) AS common
  FROM tsh t JOIN esh e ON t.h = e.h
  GROUP BY 1, 2),
per_doc AS (SELECT id, max(common) AS max_common FROM common GROUP BY id),
flagged AS (
  SELECT p.id FROM per_doc p JOIN sizes s ON p.id = s.id
  WHERE p.max_common / s.set_size >= 0.5)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS n_train_docs,
       CAST(sum(CASE WHEN f.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       round(CAST(sum(CASE WHEN f.id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS contamination_rate
FROM train t LEFT JOIN flagged f ON t.id = f.id
GROUP BY 1 ORDER BY 1
"""


SQL_CONTAMINATION_BY_SOURCE = _sql_contamination_by_source()


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: the (labeled lang × NB-predicted lang)
    confusion matrix with per-label shares — the table that finds
    mislabeled language metadata before a per-language mixture decision
    trusts it.  Self-training on the corpus (the nb_lang_classify
    model) makes the diagonal the self-consistency score; off-diagonal
    mass at high share = a label the classifier cannot reproduce from
    the text itself.

    Scale shape: NB training is a (label, term) groupBy, scoring a
    broadcast-model join + per-(doc, class) sum (classify.py's
    stress-proven shape); the confusion rollup adds one
    |langs|²-bounded agg, and the per-label share comes from a
    lang-PARTITIONED window over that tiny relation — a share join
    against a re-aggregation would re-execute the whole NB pipeline
    (observed: 5.4s vs 2.8s; the conf relation would appear twice in
    the plan)."""
    from mcpvectordb_spark.operators.classify import nb_classify, nb_train

    docs = load_table(spark, sf_dir, "documents")
    model = nb_train(docs, "lang", "text")
    pred = nb_classify(docs, "doc_id", "text", model).select(
        F.col("id").alias("doc_id"), "predicted"
    )
    conf = (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    n_lang = F.sum("n_docs").over(Window.partitionBy("lang"))
    return conf.select(
        "lang",
        "predicted",
        "n_docs",
        F.round(F.col("n_docs") / n_lang, 6).alias("share"),
    ).orderBy("lang", "predicted")


def _sql_lang_confusion() -> str:
    from mcpvectordb_spark.catalog._corpus import SQL_NB_LANG_CLASSIFY

    return f"""
WITH pred AS ({SQL_NB_LANG_CLASSIFY}),
conf AS (
  SELECT d.lang, p.predicted, CAST(count(*) AS BIGINT) AS n_docs
  FROM pred p JOIN documents d USING (doc_id) GROUP BY 1, 2)
SELECT lang, predicted, n_docs,
       round(CAST(n_docs AS DOUBLE)
             / CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT), 6) AS share
FROM conf ORDER BY lang, predicted
"""


SQL_LANG_CONFUSION = _sql_lang_confusion()


def q_length_profile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length profile: p10/p50/p90 of n_chars plus
    the short-doc share (< 200 chars — the C4-style length-gate
    candidates) — the datasheet adjunct that catches a source whose
    'documents' are actually snippets before they flood a mixture.

    Scale shape: one scan, one source-keyed agg; exact percentiles at
    driver scale swap for the mergeable histogram sketch at 100 TB
    (the events_psi / MAD / WOE caveat, documented there).  Both
    engines interpolate percentiles with the same (1−g)·a + g·b rule
    (Spark percentile == DuckDB quantile_cont, the proven events_psi
    edge parity)."""
    docs = load_table(spark, sf_dir, "documents")
    nc = F.col("n_chars").cast("double")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.percentile(nc, F.lit(0.1)), 6).alias("p10_chars"),
            F.round(F.percentile(nc, F.lit(0.5)), 6).alias("p50_chars"),
            F.round(F.percentile(nc, F.lit(0.9)), 6).alias("p90_chars"),
            F.sum((F.col("n_chars") < 200).cast("long")).cast("long")
            .alias("n_short"),
        )
        .withColumn("short_share", F.round(F.col("n_short") / F.col("n_docs"), 6))
        .orderBy("source")
    )


SQL_LENGTH_PROFILE_BY_SOURCE = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(CAST(n_chars AS DOUBLE), 0.1), 6) AS p10_chars,
       round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS p50_chars,
       round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 6) AS p90_chars,
       CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       round(CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS short_share
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_pair_jaccard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile histogram of near-dup pair similarities: how much of the
    pair table sits at borderline (0.0x) vs verbatim (0.9-1.0) overlap
    — the chart that picks the fuzzy-dedup threshold (a mass near the
    current cut means the threshold choice is load-bearing; a bimodal
    split means it is safe).

    Scale shape: FIFTH consumer of the session-shared (raw, 3, 0.02)
    pair table; one |bins|-bounded agg.  The bin key derives from the
    1e9-quantized integer Jaccard by INTEGER division (qj // 1e8,
    capped at 9), so the cut is exact on both engines; mean per bin
    uses the exact-integer BIGINT-sum readout."""
    pairs = _shared_neardup_pairs(spark, sf_dir, n=3, threshold=0.02, corpus="raw")
    qj = F.round(F.col("jaccard") * 1e9).cast("long")
    binned = pairs.select(
        F.least(F.expr("CAST(round(jaccard * 1e9) AS BIGINT) div 100000000"),
                F.lit(9)).cast("long").alias("bin"),
        qj.alias("qj"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.sum("qj") / (F.count(F.lit(1)) * F.lit(1e9)), 6)
            .alias("mean_jaccard"),
        )
        .withColumn("bin_lo", F.round(F.col("bin") / F.lit(10.0), 1))
        .select("bin", "bin_lo", "n_pairs", "mean_jaccard")
        .orderBy("bin")
    )


SQL_PAIR_JACCARD_HISTOGRAM = f"""
WITH corpus AS (SELECT doc_id AS id, text FROM documents),
sizes AS (SELECT id, count(DISTINCT shingle) AS set_size
          FROM (SELECT id, unnest({_sql_shingles(_sql_words('text'), 3)}) AS shingle
                FROM corpus) GROUP BY 1),
shg AS (SELECT id, unnest({_sql_shingles(_sql_words('text'), 3)}) AS shingle FROM corpus),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
  FROM shg a JOIN shg b ON b.shingle = a.shingle AND a.id < b.id
  GROUP BY 1, 2),
pairs AS (
  SELECT CAST(c.common AS DOUBLE) / (sa.set_size + sb.set_size - c.common) AS jaccard
  FROM common c
  JOIN sizes sa ON sa.id = c.id_a
  JOIN sizes sb ON sb.id = c.id_b
  WHERE CAST(c.common AS DOUBLE) / (sa.set_size + sb.set_size - c.common) >= 0.02),
binned AS (
  SELECT least(CAST(round(jaccard * 1e9) AS BIGINT) // 100000000, 9) AS bin,
         CAST(round(jaccard * 1e9) AS BIGINT) AS qj
  FROM pairs)
SELECT bin, round(bin / 10.0, 1) AS bin_lo,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(qj) AS DOUBLE) / (count(*) * 1e9), 6) AS mean_jaccard
FROM binned GROUP BY 1 ORDER BY 1
"""


__all__ = [n for n in dir() if not n.startswith("__")]
