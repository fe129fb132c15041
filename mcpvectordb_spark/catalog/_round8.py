"""Round-8 catalog additions — three training-data-pipeline readouts a
100 TB curation team runs before a training cut, each SQL-expressible and
built entirely from keyed aggregations over existing corpus signals:

- ``tokenizer_fertility``: per-language subword fertility + bytes/token —
  the multilingual tokenizer-budget audit (how many subwords a language
  pays per whitespace word, and how many bytes ride per subword).
- ``doc_novelty``: per-document share of corpus-unique 3-gram shingles —
  the memorization/boilerplate proxy (novelty 1.0 = nothing shared with
  any other document; low novelty = template/near-dup material), on the
  session-shared shingle index.
- ``dataset_datasheet``: the per-source datasheet row (docs, language
  mix + entropy, chars, tokens, exact-duplicate rate) — the one-scan
  "datasheets for datasets" rollup that fronts a training-mix decision.

Ranked-cut discipline (tools/rankkey_report.py): every output sorts on
exact keys (lang / doc_id / source strings and integers); the only float
outputs are single divisions of exact BIGINTs (fertility, novelty,
dup_rate — engine-exact, rounded only for display) and the language
entropy, whose ln() terms are quantized to integer nano-units and summed
as BIGINT (the silhouette/inertia exact-readout idiom — r8 ADVICE #2),
so the readout is bit-guaranteed, not summation-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcpvectordb_spark.catalog._common import _shared_shingles, _sql_shingles, _sql_words
from mcpvectordb_spark.io import load_table
from mcpvectordb_spark.operators import textstats as ts


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer-budget audit: whitespace words, BPE-ish
    subword tokens (operators/textstats.py::bpe_ish_token_count — the
    ceil(len/4) piece estimate over [A-Za-z]+|[0-9]+|punct runs), bytes,
    and the two ratios tokenizer teams track — fertility (subwords per
    word; >1.3 means the language pays a steep subword tax) and bytes
    per subword (UTF-8 weight per token).

    Scale shape: ONE corpus scan → one lang-keyed agg (map-side
    combinable BIGINT sums); ratios are per-row single divisions of
    exact integers, so both engines emit identical values before the
    display rounding.  At 100 TB this is the cheapest query in the
    curation suite — no join, no window, no shuffle beyond |langs| rows.

    NULL-text convention (r8 ADVICE #1): NULL text counts as the empty
    string on BOTH engines — the repo-wide _sql_quality_cte rule.  The
    Spark side previously fed raw ``text`` to the counters, so a lang
    whose docs were ALL NULL read ws/bpe = NULL here vs 0 on the oracle
    (invisible at the driver scale because testdata has no NULL texts;
    pinned by tests/test_round8_ops.py::test_fertility_null_text_parity).
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    per = docs.select(
        "lang",
        ts.ws_token_count(t).cast("long").alias("ws"),
        ts.bpe_ish_token_count(t).alias("bpe"),
        F.octet_length(t).cast("long").alias("nbytes"),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.sum("bpe").cast("long").alias("bpe_tokens"),
        F.sum("nbytes").cast("long").alias("n_bytes"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        F.round(F.col("bpe_tokens") / F.greatest(F.col("ws_tokens"), F.lit(1)), 6)
        .alias("fertility"),
        F.round(F.col("n_bytes") / F.greatest(F.col("bpe_tokens"), F.lit(1)), 6)
        .alias("bytes_per_token"),
    ).orderBy("lang")


_SQL_BPE_COUNT = r"""CAST(list_sum(list_transform(
        regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'),
        t -> CASE WHEN regexp_full_match(t, '[A-Za-z]+') AND len(t) > 4
                  THEN CAST(ceil(len(t)/4.0) AS BIGINT) ELSE 1 END)) AS BIGINT)"""

SQL_TOKENIZER_FERTILITY = rf"""
WITH per AS (
  SELECT lang,
    CAST(len(list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\s+'), t -> t <> '')) AS BIGINT) AS ws,
    coalesce({_SQL_BPE_COUNT}, 0) AS bpe,
    CAST(strlen(coalesce(text, '')) AS BIGINT) AS nbytes
  FROM documents),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ws) AS BIGINT) AS ws_tokens,
         CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
         CAST(sum(nbytes) AS BIGINT) AS n_bytes
  FROM per GROUP BY 1)
SELECT lang, n_docs, ws_tokens, bpe_tokens,
       round(CAST(bpe_tokens AS DOUBLE) / greatest(ws_tokens, 1), 6) AS fertility,
       round(CAST(n_bytes AS DOUBLE) / greatest(bpe_tokens, 1), 6) AS bytes_per_token
FROM agg ORDER BY lang
"""


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of a document's distinct 3-gram
    shingles that NO other document contains — the memorization /
    boilerplate proxy used to spot template text and training-set echo
    before a cut (novelty 1.0 = fully unique content; near 0 = the doc
    is assembled from corpus-common n-grams).

    Scale shape: runs on the session-shared (id, shingle) inverted index
    (_shared_shingles — at 100 TB the dedup suite's persisted artifact):
    one shingle-keyed count agg for document frequencies, one equi-join
    back, one doc-keyed agg.  Novelty is a single division of exact
    BIGINTs, so the value is engine-exact before display rounding; the
    sort key is doc_id.  Documents shorter than 3 words have no shingles
    and are excluded on both engines."""
    shingles = _shared_shingles(spark, sf_dir, "raw")
    df_t = shingles.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    per_doc = (
        shingles.join(df_t, "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).cast("long").alias("n_novel"),
        )
    )
    return per_doc.select(
        F.col("id").alias("doc_id"),
        "n_shingles",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
    ).orderBy("doc_id")


SQL_DOC_NOVELTY = f"""
WITH sh AS (
  SELECT doc_id AS id, unnest({_sql_shingles(_sql_words('text'), 3)}) AS shingle
  FROM documents),
df_t AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1),
per AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM sh JOIN df_t USING (shingle) GROUP BY 1)
SELECT id AS doc_id, n_shingles, n_novel,
       round(CAST(n_novel AS DOUBLE) / n_shingles, 6) AS novelty
FROM per ORDER BY doc_id
"""


def q_dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset datasheet (Gebru et al. 2021 applied to a
    pretraining mix): documents, language count + Shannon entropy of the
    language mix, total chars and whitespace tokens, and the exact-dup
    rate (share of docs whose content digest appears more than once
    WITHIN the source) — the one table a data lead reads before
    adjusting source weights.

    Scale shape: one scan feeding three keyed aggs — (source, digest)
    for dup counts, (source, lang) for the mix, source for totals — all
    map-side combinable, joined on the |sources|-row key.  dup_rate is
    an integer ratio (engine-exact); the entropy's -p·ln(p) terms are
    quantized to integer nano-units and summed as BIGINT (the r8
    silhouette/inertia exact-readout idiom, applied here per r8 ADVICE
    #2), so the readout is BIT-GUARANTEED given the quantized terms —
    not merely summation-order-stable with high probability.  NULL text
    counts as empty for the ws tokens (ADVICE #1; the digest already
    coalesced)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("nc"),
        ts.ws_token_count(F.coalesce(F.col("text"), F.lit("")))
        .cast("long")
        .alias("ws"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("dig"),
    )
    totals = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nc").cast("long").alias("total_chars"),
        F.sum("ws").cast("long").alias("ws_tokens"),
    )
    dups = (
        base.groupBy("source", "dig")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
            .cast("long")
            .alias("dup_docs")
        )
    )
    lang_counts = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("nl")
    )
    lang_tot = lang_counts.groupBy("source").agg(
        F.sum("nl").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    p = F.col("nl") / F.col("nt")
    # exact-integer readout: each -p*ln(p) term is quantized to integer
    # nano-units (one libm rounding point, shared by the oracle), the
    # per-source sum runs in BIGINT, and the division back is a single
    # exact-input float op — bit-identical on any summation order.
    # cast("long") maps the single-language -0.0 edge (p=1 -> -1*ln(1))
    # to 0 identically on both engines.
    qterm = F.round(-p * F.log(p) * F.lit(1e9)).cast("long")
    entropy = (
        lang_counts.join(lang_tot, "source")
        .groupBy("source")
        .agg(
            F.max("n_langs").alias("n_langs"),
            F.round(F.sum(qterm) / F.lit(1e9), 6).alias("lang_entropy"),
        )
    )
    return (
        totals.join(dups, "source")
        .join(entropy, "source")
        .select(
            "source",
            "n_docs",
            "n_langs",
            "lang_entropy",
            "total_chars",
            "ws_tokens",
            F.round(F.col("dup_docs") / F.col("n_docs"), 6).alias("dup_rate"),
        )
        .orderBy("source")
    )


SQL_DATASET_DATASHEET = r"""
WITH base AS (
  SELECT source, lang, CAST(n_chars AS BIGINT) AS nc,
         CAST(len(list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\s+'), t -> t <> '')) AS BIGINT) AS ws,
         md5(coalesce(text, '')) AS dig
  FROM documents),
totals AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nc) AS BIGINT) AS total_chars,
         CAST(sum(ws) AS BIGINT) AS ws_tokens
  FROM base GROUP BY 1),
dups AS (
  SELECT source,
         CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_docs
  FROM (SELECT source, dig, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1, 2)
  GROUP BY 1),
lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS nl FROM base GROUP BY 1, 2),
lt AS (SELECT source, CAST(sum(nl) AS BIGINT) AS nt,
              CAST(count(*) AS BIGINT) AS n_langs
       FROM lc GROUP BY 1),
ent AS (
  SELECT lc.source, max(n_langs) AS n_langs,
         round(CAST(sum(CAST(round(-(CAST(nl AS DOUBLE) / nt) * ln(CAST(nl AS DOUBLE) / nt) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9, 6)
           AS lang_entropy
  FROM lc JOIN lt ON lc.source = lt.source GROUP BY 1)
SELECT t.source, n_docs, n_langs, lang_entropy, total_chars, ws_tokens,
       round(CAST(dup_docs AS DOUBLE) / n_docs, 6) AS dup_rate
FROM totals t JOIN dups d ON t.source = d.source JOIN ent e ON t.source = e.source
ORDER BY t.source
"""


def q_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate leakage matrix: for every (unordered)
    source pair, the number of document pairs sharing 3-gram content at
    Jaccard >= 0.02 and their mean overlap — the audit a curation team
    runs to find one source republishing another (web scrape vs books
    mirror) BEFORE those near-dups leak the same text into two mixture
    buckets.  Complements sources_overlap (aggregate shingle-set overlap)
    with the per-document-pair view: a high mean here means whole
    documents travel between sources, not just shared vocabulary.

    Scale shape: reads the session-shared low-threshold pair table
    (_shared_neardup_pairs (raw, 3, 0.02) — the SAME artifact the
    minhash_calibration audit consumes, so the mining cost is paid once
    per session), joins the |docs|-row (id, source) projection twice,
    and aggregates on the |sources|^2-bounded key.  The 0.02 threshold
    is a per-row exact integer ratio on both engines; mean_jaccard uses
    the exact-integer readout idiom (9dp-quantized BIGINT sums), so
    every output value is bit-guaranteed."""
    from mcpvectordb_spark.catalog._common import _shared_neardup_pairs

    pairs = _shared_neardup_pairs(spark, sf_dir, n=3, threshold=0.02, corpus="raw")
    src = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "source"
    )
    tagged = (
        pairs.join(src.withColumnsRenamed({"id": "id_a", "source": "src_a"}), "id_a")
        .join(src.withColumnsRenamed({"id": "id_b", "source": "src_b"}), "id_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            "jaccard",
        )
    )
    qj = F.round(F.col("jaccard") * 1e9).cast("long")
    return (
        tagged.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.sum(qj) / (F.count(F.lit(1)) * F.lit(1e9)), 6)
            .alias("mean_jaccard"),
            F.round(F.max(qj) / F.lit(1e9), 6).alias("max_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


SQL_SOURCE_LEAKAGE = f"""
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
  SELECT c.id_a, c.id_b,
         CAST(c.common AS DOUBLE) / (sa.set_size + sb.set_size - c.common) AS jaccard
  FROM common c
  JOIN sizes sa ON sa.id = c.id_a
  JOIN sizes sb ON sb.id = c.id_b
  WHERE CAST(c.common AS DOUBLE) / (sa.set_size + sb.set_size - c.common) >= 0.02),
tagged AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b,
         CAST(round(jaccard * 1e9) AS BIGINT) AS qj
  FROM pairs p
  JOIN documents da ON da.doc_id = p.id_a
  JOIN documents db ON db.doc_id = p.id_b)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(qj) AS DOUBLE) / (count(*) * 1e9), 6) AS mean_jaccard,
       round(CAST(max(qj) AS DOUBLE) / 1e9, 6) AS max_jaccard
FROM tagged GROUP BY 1, 2 ORDER BY 1, 2
"""


__all__ = [n for n in dir() if not n.startswith("__")]
