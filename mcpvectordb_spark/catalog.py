"""Query catalog: every implemented operator as a (Spark query, DuckDB
oracle SQL) pair over the driver's testdata tables.

This is the correctness surface consumed by ``__spark_entry__.py``: the
driver runs each Spark query and its oracle side-by-side at sf=0.01 and
compares row counts, schemas and order-insensitive value hashes.

Parity rules (learned empirically, see .claude/skills/verify/SKILL.md):
- embeddings are float32 in parquet; BOTH sides compute in float64
  (Spark casts to array<double>; oracles ``CAST(... AS DOUBLE[])``);
- every float output is ``round(x, k)`` with the same k on both sides;
- every integer aggregate in the oracle is CAST to BIGINT (DuckDB sums
  integers into HUGEINT, which would hash differently);
- timestamps are emitted as formatted strings on both sides;
- portable 48-bit hash: Spark ``conv(substr(md5(x),1,12),16,10)`` ==
  DuckDB hex fold — verified bit-for-bit;
- all rankings carry an explicit id tiebreak so top-k cutoffs are total.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcpvectordb_spark.io import load_table
from mcpvectordb_spark.operators import curation as cu
from mcpvectordb_spark.operators import dedup as dd
from mcpvectordb_spark.operators import textstats as ts
from mcpvectordb_spark.operators import weburl as wu
from mcpvectordb_spark.operators import knn
from mcpvectordb_spark.operators.bm25 import bm25_score, bm25_topk
from mcpvectordb_spark.operators.hybrid import rrf_topk
from mcpvectordb_spark.operators.knn import (
    cosine,
    ivf_assign,
    ivf_topk,
    knn_join,
    knn_topk,
    knn_topk_sq8,
    knn_truncated_topk,
    query_vec_lit,
)
from mcpvectordb_spark.tpch_ext import TPCH_EXT_ORACLES, TPCH_EXT_QUERIES

# ---------------------------------------------------------------------------
# shared constants

SEARCH_QUERY = "window join spark batch"
QUERY_VEC_ID = 0
RRF_K0 = 60

# ---------------------------------------------------------------------------
# DuckDB SQL fragment builders (mirrors of the Spark column expressions)

def _sql_hex48(expr: str) -> str:
    """int(md5(x)[:12], 16) — parity-tested against Spark conv()."""
    return (
        "list_reduce(list_transform(string_split(substr(md5(" + expr + "),1,12),''),"
        " c -> CAST(strpos('0123456789abcdef', c)-1 AS BIGINT)), (a,b) -> a*16+b)"
    )


def _sql_norm(expr: str) -> str:
    return rf"trim(regexp_replace(lower({expr}), '\s+', ' ', 'g'))"


def _sql_words(expr: str) -> str:
    return f"string_split({_sql_norm(expr)}, ' ')"


def _sql_shingles(words: str, n: int) -> str:
    return (
        f"list_distinct(CASE WHEN len({words}) >= {n} THEN "
        f"list_transform(range(1, len({words})-{n}+2), i -> array_to_string({words}[i:i+{n-1}], ' ')) "
        f"ELSE CAST([] AS VARCHAR[]) END)"
    )


def _sql_cos(a: str, b: str) -> str:
    """dot/(|a|·|b|) with the same operation structure as operators.knn."""
    return (
        f"(list_inner_product({a},{b}) / "
        f"(sqrt(list_inner_product({a},{a})) * sqrt(list_inner_product({b},{b}))))"
    )


def _sql_sq8(v: str, s: str) -> str:
    """Quantized code list: sign-split floor(|x|/s + 0.5) — the same IEEE
    operation sequence as operators.knn._half_away, including the scale>0
    zero-vector guard (sq8_quantize emits all-zero codes, never x/0)."""
    return (
        f"CASE WHEN {s} > 0 THEN "
        f"list_transform({v}, x -> CASE WHEN x >= 0 THEN floor(x/{s} + 0.5) "
        f"ELSE -floor(-x/{s} + 0.5) END) "
        f"ELSE list_transform({v}, x -> 0.0) END"
    )


def _sql_lang_fragments() -> tuple[str, str]:
    """(marker-score SELECT list, argmax CASE) — the SQL twin of
    textstats.lang_id, shared by every oracle that classifies language."""
    words = _sql_words("text")
    selects = ", ".join(
        f"len(list_filter({words}, t -> t IN ({', '.join(repr(m) for m in markers)}))) AS s_{lang}"
        for lang, markers in ts.LANG_MARKERS.items()
    )
    cases = []
    for lang in ts.LANG_MARKERS:
        others = " AND ".join(f"s_{lang} > s_{o}" for o in ts.LANG_MARKERS if o != lang)
        cases.append(f"WHEN s_{lang} > 0 AND {others} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return selects, case_sql


def _sql_quality_cte(source: str) -> str:
    """CTEs (f, q) computing the quality features/score of textstats
    .quality_columns over ``source`` — shared by the quality and curation
    oracles so the heuristic's constants live in exactly two places
    (the Column expressions and this one SQL twin)."""
    # COALESCE mirrors textstats.quality_columns: NULL text must score like
    # empty text (without it DuckDB's least() skips the NULL and scores 0.7)
    return rf"""
f AS (
  SELECT *,
    CAST(length(COALESCE(text,'')) AS BIGINT) AS n_chars,
    CAST(len(list_filter(regexp_split_to_array(trim(COALESCE(text,'')), '\s+'), t -> t <> '')) AS BIGINT) AS n_words,
    CAST(length(COALESCE(text,'')) - length(regexp_replace(COALESCE(text,''), '[^\w\s]', '', 'g')) AS BIGINT) AS punct,
    CAST(len(list_filter(list_transform(list_filter(regexp_split_to_array(trim(COALESCE(text,'')), '\s+'), t -> t <> ''), t -> lower(t)),
             t -> t IN ('the','a','of','and','in','to','is'))) AS BIGINT) AS stop
  FROM {source}),
q AS (
  SELECT *,
    round(CASE WHEN n_chars > 0 THEN punct/n_chars ELSE 0.0 END, 6) AS punct_ratio,
    round(CASE WHEN n_words > 0 THEN stop/n_words ELSE 0.0 END, 6) AS stop_ratio,
    round(0.4*least(n_words/200.0, 1.0)
        + 0.3*(1.0 - CASE WHEN n_chars > 0 THEN punct/n_chars ELSE 0.0 END)
        + 0.3*least((CASE WHEN n_words > 0 THEN stop/n_words ELSE 0.0 END)/0.05, 1.0), 6) AS quality_score
  FROM f)
"""


def _q_vec(spark: SparkSession, sf_dir: str, vec_id: int = QUERY_VEC_ID) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    return list(emb.filter(F.col("vec_id") == vec_id).first()["embedding"])


# planted-duplicate corpora (the raw synthetic corpus has no near-dups, so
# dedup demos plant them deterministically — identically in Spark and SQL).
# Plant-id offset is far beyond any scale factor's doc_id range (+10k would
# collide with genuine ids at sf >= 0.2 and silently corrupt the corpus).
_NEARDUP_SUFFIX = " zz9 qq8 extra suffix tokens"
_PLANT_OFFSET = 10_000_000


def _exact_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.col("doc_id").alias("id"), "text").unionByName(
        docs.filter(F.col("doc_id") < 50).select((F.col("doc_id") + _PLANT_OFFSET).alias("id"), "text")
    )


_SQL_EXACT_CORPUS = (
    "SELECT doc_id AS id, text FROM documents "
    f"UNION ALL SELECT doc_id+{_PLANT_OFFSET} AS id, text FROM documents WHERE doc_id < 50"
)


def _near_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.col("doc_id").alias("id"), "text").unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + _PLANT_OFFSET).alias("id"),
            F.concat(F.col("text"), F.lit(_NEARDUP_SUFFIX)).alias("text"),
        )
    )


_SQL_NEAR_CORPUS = (
    "SELECT doc_id AS id, text FROM documents "
    f"UNION ALL SELECT doc_id+{_PLANT_OFFSET} AS id, text || '{_NEARDUP_SUFFIX}' AS text "
    "FROM documents WHERE doc_id < 50"
)

_SQL_JACCARD_ON = """
jsh AS (SELECT id, unnest({shingles}) AS shingle FROM corpus),
sizes AS (SELECT id, count(*) AS set_size FROM jsh GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
  FROM jsh a JOIN jsh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2)
"""


def _sql_jaccard_cte() -> str:
    return _SQL_JACCARD_ON.format(shingles=_sql_shingles(_sql_words("text"), 3))


# ===========================================================================
# 1. Vector search
# ===========================================================================

def q_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine KNN top-10 (SURVEY §2.10 R1 + §2.6 T1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _q_vec(spark, sf_dir)
    hits = knn_topk(emb.filter(F.col("vec_id") != QUERY_VEC_ID), qv, 10, tie_col="vec_id")
    return hits.select("vec_id", F.round("score", 6).alias("score"))


SQL_KNN_TOPK = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> {QUERY_VEC_ID})
SELECT vec_id, round({_sql_cos('v', 'qv')}, 6) AS score
FROM c, q ORDER BY {_sql_cos('v', 'qv')} DESC, vec_id LIMIT 10
"""


def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch KNN: top-3 neighbors for each of 5 query vectors (broadcast
    query set × corpus, per-query window top-k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_join(
        queries, emb, 3, corpus_id="vec_id",
        pair_filter=F.col("vec_id") != F.col("query_id"),
    )
    return out.select("query_id", "vec_id", F.round("score", 6).alias("score"))


SQL_KNN_BATCH = f"""
WITH qs AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT query_id, vec_id, {_sql_cos('v', 'qv')} AS cos_s,
         row_number() OVER (PARTITION BY query_id ORDER BY {_sql_cos('v', 'qv')} DESC, vec_id) AS rn
  FROM c, qs WHERE vec_id <> query_id)
SELECT query_id, vec_id, round(cos_s, 6) AS score FROM scored WHERE rn <= 3
"""


def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-filtered KNN (metadata filter BEFORE ranking — SURVEY §2.2 P3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _q_vec(spark, sf_dir)
    hits = knn_topk(
        emb, qv, 5,
        pre_filter=(F.col("label") == 2) & (F.col("vec_id") != QUERY_VEC_ID),
        tie_col="vec_id",
    )
    return hits.select("vec_id", F.col("label").cast("int").alias("label"), F.round("score", 6).alias("score"))


SQL_KNN_FILTERED = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE label = 2 AND vec_id <> {QUERY_VEC_ID})
SELECT vec_id, CAST(label AS INT) AS label, round({_sql_cos('v', 'qv')}, 6) AS score
FROM c, q ORDER BY {_sql_cos('v', 'qv')} DESC, vec_id LIMIT 5
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic coarse centroids (vectors 0..9), nprobe=3,
    exact re-score within probed cells (reference refine semantics)."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    assigned = ivf_assign(emb, centroids, corpus_id="vec_id")
    qv = _q_vec(spark, sf_dir)
    hits = ivf_topk(assigned, centroids, qv, 5, nprobe=3, corpus_id="vec_id")
    return hits.select("vec_id", F.round("score", 6).alias("score"))


SQL_IVF_TOPK = f"""
WITH cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings WHERE vec_id < 10),
corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY {_sql_cos('v', 'cv')} DESC, cid) AS rn
    FROM corpus, cents) WHERE rn = 1),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
probe AS (SELECT cid FROM cents, q ORDER BY {_sql_cos('cv', 'qv')} DESC, cid LIMIT 3)
SELECT c.vec_id, round({_sql_cos('c.v', 'qv')}, 6) AS score
FROM corpus c JOIN assign a ON a.vec_id = c.vec_id, q
WHERE a.cid IN (SELECT cid FROM probe)
ORDER BY {_sql_cos('c.v', 'qv')} DESC, c.vec_id LIMIT 5
"""


# ===========================================================================
# 2. Full-text + hybrid search
# ===========================================================================

_SQL_BM25_CTES = rf"""
toks AS (
  SELECT doc_id AS doc, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS term
  FROM documents),
posting AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY 1, 2),
-- lens over ALL docs (zero-token docs contribute dl=0 to avgdl), exactly
-- like bm25.py building lens from the corpus rather than the posting list
lens AS (
  SELECT doc_id AS doc,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS BIGINT) AS dl
  FROM documents),
dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT avg(dl) FROM lens) AS avgdl),
qterms AS (SELECT unnest(['batch','join','spark','window']) AS term),
bm AS (
  SELECT doc, sum( ln(1 + (n - df + 0.5)/(df + 0.5))
                   * tf*(1.2+1)/(tf + 1.2*(1-0.75+0.75*dl/avgdl)) ) AS score
  FROM posting JOIN qterms USING(term) JOIN dfreq USING(term) JOIN lens USING(doc), stats
  GROUP BY doc)
"""


def q_search_clarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-performance prediction via the Clarity score
    (operators/prf.py::clarity_score, Cronen-Townsend SIGIR'02): the KL
    divergence between the top-10 feedback set's relevance model and the
    collection LM, computed for the catalog's focused 4-term query AND
    a deliberately vague single-stopword-ish query — the pre-retrieval
    triage that flags queries likely to retrieve noise.  Reuses the BM25
    posting machinery (rm3_topk's first half); the oracle replays both
    query chains over the shared posting CTEs."""
    from mcpvectordb_spark.operators.bm25 import Bm25Index, doc_lens, doc_terms
    from mcpvectordb_spark.operators.prf import clarity_score

    docs = load_table(spark, sf_dir, "documents")
    posting = doc_terms(docs, "doc_id", "text").localCheckpoint(eager=False)
    idx = Bm25Index(posting, doc_lens(docs, "doc_id", "text"), cached=False)
    focused = clarity_score(
        docs, SEARCH_QUERY, "doc_id", "text", index=idx
    ).select(F.lit("focused").alias("query_kind"), "*")
    vague = clarity_score(docs, "data", "doc_id", "text", index=idx).select(
        F.lit("vague").alias("query_kind"), "*"
    )
    return focused.unionByName(vague)


def _sql_clarity_chain(label: str, terms: list[str]) -> str:
    tl = ", ".join(f"'{t}'" for t in sorted(terms))
    return f"""
bm_{label} AS (
  SELECT doc, sum( ln(1 + (n - df + 0.5)/(df + 0.5))
                   * tf*(1.2+1)/(tf + 1.2*(1-0.75+0.75*dl/avgdl)) ) AS score
  FROM posting JOIN (SELECT unnest([{tl}]) AS term) q_{label} USING(term)
  JOIN dfreq USING(term) JOIN lens USING(doc), stats
  GROUP BY doc),
fb_{label} AS (SELECT doc FROM bm_{label} ORDER BY score DESC, doc LIMIT 10),
rm1_{label} AS (
  SELECT term, sum(CAST(tf AS DOUBLE) / dl) / 10.0 AS p_q
  FROM posting JOIN fb_{label} USING(doc) JOIN lens USING(doc)
  GROUP BY term),
cl_{label} AS (
  SELECT '{label}' AS query_kind,
         CAST(10 AS BIGINT) AS n_feedback,
         CAST(count(*) AS BIGINT) AS vocab,
         round(sum(r.p_q * log2(r.p_q / (CAST(c.cf AS DOUBLE) / ct.ct))), 6)
           AS clarity_bits
  FROM rm1_{label} r JOIN coll c USING(term) CROSS JOIN ctot ct)"""


SQL_SEARCH_CLARITY = (
    "WITH "
    + _SQL_BM25_CTES.split("WITH", 1)[-1].rsplit(",\nqterms", 1)[0].lstrip()
    + """,
coll AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM posting GROUP BY 1),
ctot AS (SELECT CAST(sum(cf) AS DOUBLE) AS ct FROM coll),"""
    + _sql_clarity_chain("focused", SEARCH_QUERY.split())
    + ","
    + _sql_clarity_chain("vague", ["data"])
    + """
SELECT * FROM cl_focused UNION ALL SELECT * FROM cl_vague
"""
)


def q_search_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranker agreement via rank-biased overlap (modeleval.py::rbo,
    Webber TOIS'10): RBO@10 (p = 0.9) between the BM25 and Dirichlet-QLM
    top-10 lists for the catalog query — the judgment-free regression
    check run before swapping scorers ("how much did the ranking actually
    move?").  Both runs come from the SAME posting list; the metric is a
    join of two 10-row broadcast lists + one agg.  The oracle replays
    both scorers and the depth-exploded RBO sum."""
    from mcpvectordb_spark.operators.bm25 import (
        Bm25Index,
        bm25_topk,
        doc_lens,
        doc_terms,
    )
    from mcpvectordb_spark.operators.modeleval import rbo
    from mcpvectordb_spark.operators.qlm import qlm_topk

    docs = load_table(spark, sf_dir, "documents")
    posting = doc_terms(docs, "doc_id", "text").localCheckpoint(eager=False)
    idx = Bm25Index(posting, doc_lens(docs, "doc_id", "text"), cached=False)
    wa = Window.orderBy(F.desc("score"), F.asc("doc"))
    run_a = bm25_topk(docs, SEARCH_QUERY, 10, "doc_id", "text", index=idx).select(
        "doc", F.row_number().over(wa).alias("rank")
    )
    run_b = qlm_topk(docs, SEARCH_QUERY, 10, "doc_id", "text", index=idx).select(
        "doc", F.row_number().over(wa).alias("rank")
    )
    return rbo(run_a, run_b, k=10, p=0.9)


SQL_SEARCH_RBO = (
    "WITH "
    + _SQL_BM25_CTES.split("WITH", 1)[-1].lstrip()
    + """,
ranked_a AS (
  SELECT doc, row_number() OVER (ORDER BY score DESC, doc ASC) AS ra
  FROM bm QUALIFY ra <= 10),
cf AS (SELECT term, sum(tf) AS cf FROM posting GROUP BY 1),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM posting),
hits AS (
  SELECT doc, sum(1.0 * ln(1 + tf / (2000.0 * (cf / total)))) AS hit
  FROM posting JOIN qterms USING(term) JOIN cf USING(term), tot
  GROUP BY doc),
qlm AS (
  SELECT doc, coalesce(hit, 0.0) + 4.0 * ln(2000.0 / (dl + 2000.0)) AS score
  FROM lens LEFT JOIN hits USING(doc)),
ranked_b AS (
  SELECT doc, row_number() OVER (ORDER BY score DESC, doc ASC) AS rb
  FROM qlm QUALIFY rb <= 10),
inboth AS (
  SELECT a.doc, greatest(a.ra, b.rb) AS m
  FROM ranked_a a JOIN ranked_b b ON b.doc = a.doc),
contrib AS (
  SELECT power(0.9, CAST(depth AS DOUBLE) - 1) / depth AS t
  FROM inboth, unnest(range(m, 11)) AS dd(depth)),
ov AS (SELECT CAST(count(*) AS BIGINT) AS overlap_at_k FROM inboth)
SELECT CAST(10 AS BIGINT) AS k, CAST(0.9 AS DOUBLE) AS p,
       ov.overlap_at_k,
       COALESCE(round((1.0 - 0.9) * (SELECT sum(t) FROM contrib), 6), 0.0) AS rbo
FROM ov
"""
)


def q_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy panel — the geometry health check run
    before trusting cosine similarity (anisotropic spaces make everything
    look similar; Ethayarajh 2019): mean L2 norm, EXACT average pairwise
    cosine of the normalized vectors via the identity
    sum_{i<>j} x_i.x_j = ||S||^2 - n (no pair join ever), and the
    participation ratio of the covariance spectrum WITHOUT an
    eigendecomposition — PR = trace(C)^2 / ||C||_F^2, since
    sum(lambda)^2 / sum(lambda^2) needs only the trace and the Frobenius
    norm, both plain aggregates of the 64x64 moment matrix.  PR ~ dim
    means isotropic; PR ~ 1 means rank-collapsed.  Plan: one
    posexplode(dim) pass with 64 sum expressions builds the Gram rows
    (n x 64 input rows, never n x 4096), then 64x64 arithmetic on the
    tiny moment table."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    base = dd.fan_out(
        emb.select(v.alias("v"), F.transform(v, lambda x: x / norm).alias("vh"))
    ).localCheckpoint(eager=False)
    nrow = base.count()

    sums = base.select(
        F.posexplode("v").alias("j0", "xj"), F.col("v")
    ).groupBy(F.col("j0").alias("j")).agg(
        F.sum("xj").alias("sx"),
        *[
            F.sum(F.col("xj") * F.element_at("v", k + 1)).alias(f"m{k}")
            for k in range(dim)
        ],
    )
    mu = sums.select("j", (F.col("sx") / F.lit(float(nrow))).alias("mu"))
    cells = sums.select(
        "j",
        F.posexplode(F.array(*[F.col(f"m{k}") for k in range(dim)])).alias(
            "k", "m"
        ),
    ).select("j", "k", (F.col("m") / F.lit(float(nrow))).alias("m"))
    cov = (
        cells.join(mu.select(F.col("j"), F.col("mu").alias("mu_j")), "j")
        .join(
            mu.select(F.col("j").alias("k"), F.col("mu").alias("mu_k")), "k"
        )
        .select(
            "j",
            "k",
            (F.col("m") - F.col("mu_j") * F.col("mu_k")).alias("c"),
        )
    )
    spec = cov.agg(
        F.sum(F.when(F.col("j") == F.col("k"), F.col("c"))).alias("tr"),
        F.sum(F.col("c") * F.col("c")).alias("fro2"),
    )
    normstats = base.select(
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)).alias(
            "nrm"
        ),
        F.col("vh"),
    )
    shat = normstats.select(
        F.posexplode("vh").alias("j", "xh")
    ).groupBy("j").agg(F.sum("xh").alias("s"))
    scos = shat.agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
    mn = normstats.agg(F.avg("nrm").alias("mean_norm"))
    return (
        spec.crossJoin(F.broadcast(scos))
        .crossJoin(F.broadcast(mn))
        .select(
            F.lit(nrow).cast("long").alias("n"),
            F.lit(dim).cast("long").alias("dim"),
            F.round("mean_norm", 6).alias("mean_norm"),
            F.round(
                (F.col("s2") - F.lit(float(nrow)))
                / (F.lit(float(nrow)) * (F.lit(float(nrow)) - 1)),
                6,
            ).alias("avg_pairwise_cos"),
            F.round("tr", 6).alias("cov_trace"),
            F.round(F.sqrt("fro2"), 6).alias("cov_fro"),
            F.round(F.col("tr") * F.col("tr") / F.col("fro2"), 6).alias(
                "participation_ratio"
            ),
        )
    )


SQL_EMBEDDING_ISOTROPY = """
WITH emb AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM emb),
js AS (SELECT unnest(range(1, 65)) AS j),
expl AS (
  SELECT j, v[j] AS xj, v FROM emb CROSS JOIN js),
cells AS (
  SELECT e.j, k.k, sum(e.xj * e.v[k.k]) / (SELECT CAST(n AS DOUBLE) FROM nn) AS m
  FROM expl e CROSS JOIN (SELECT unnest(range(1, 65)) AS k) k
  GROUP BY 1, 2),
mu AS (
  SELECT j, sum(xj) / (SELECT CAST(n AS DOUBLE) FROM nn) AS mu
  FROM expl GROUP BY 1),
cov AS (
  SELECT c.j, c.k, c.m - mj.mu * mk.mu AS c
  FROM cells c JOIN mu mj ON mj.j = c.j JOIN mu mk ON mk.j = c.k),
spec AS (
  SELECT sum(CASE WHEN j = k THEN c END) AS tr, sum(c * c) AS fro2 FROM cov),
normed AS (
  SELECT sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm,
         v
  FROM emb),
shat AS (
  SELECT j, sum(v[j] / nrm) AS s
  FROM normed CROSS JOIN js GROUP BY 1),
scos AS (SELECT sum(s * s) AS s2 FROM shat),
mn AS (SELECT avg(nrm) AS mean_norm FROM normed)
SELECT nn.n, CAST(64 AS BIGINT) AS dim,
       round(mn.mean_norm, 6) AS mean_norm,
       round((scos.s2 - CAST(nn.n AS DOUBLE))
             / (CAST(nn.n AS DOUBLE) * (CAST(nn.n AS DOUBLE) - 1)), 6)
         AS avg_pairwise_cos,
       round(spec.tr, 6) AS cov_trace,
       round(sqrt(spec.fro2), 6) AS cov_fro,
       round(spec.tr * spec.tr / spec.fro2, 6) AS participation_ratio
FROM spec CROSS JOIN scos CROSS JOIN mn CROSS JOIN nn
"""


def q_knn_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncated coarse scan (first 16 of 64 dims, 4x arithmetic
    cut) + exact full-dim refine of 4k candidates — the deterministic
    Matryoshka serving pattern (operators/knn.py::knn_truncated_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _q_vec(spark, sf_dir)
    hits = knn_truncated_topk(
        emb.filter(F.col("vec_id") != QUERY_VEC_ID), qv, k=10, dims_coarse=16, refine=4
    )
    return hits.select("vec_id", F.round("score", 6).alias("score"))


SQL_KNN_MATRYOSHKA = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}),
cand AS (
  SELECT vec_id, v, qv
  FROM c, q
  ORDER BY {_sql_cos('v[1:16]', 'qv[1:16]')} DESC, vec_id LIMIT 40
)
SELECT vec_id, round({_sql_cos('v', 'qv')}, 6) AS score
FROM cand ORDER BY {_sql_cos('v', 'qv')} DESC, vec_id LIMIT 10
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement as a first-class query: recall@10 of every
    approximate method (IVF nprobe=3, Matryoshka 16/64 dims, SQ8 int8
    coarse) against the exact top-10 — 'measure, don't guess' folded into
    the correctness gate itself, since the oracle recomputes each method's
    candidate set in SQL and must land on the same recall numbers."""
    from mcpvectordb_spark.operators.knn import knn_truncated_topk

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") != QUERY_VEC_ID)
    qv = _q_vec(spark, sf_dir)
    exact = {r["vec_id"] for r in knn_topk(corpus, qv, 10, tie_col="vec_id").select("vec_id").collect()}

    centroids = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    assigned = ivf_assign(emb, centroids, corpus_id="vec_id").filter(
        F.col("vec_id") != QUERY_VEC_ID
    )
    methods = {
        "ivf": ivf_topk(assigned, centroids, qv, 10, nprobe=3, corpus_id="vec_id"),
        "matryoshka": knn_truncated_topk(corpus, qv, k=10, dims_coarse=16, refine=4),
        "sq8": knn_topk_sq8(corpus, qv, 10, refine_factor=4, tie_col="vec_id"),
    }
    rows = []
    for name, df in sorted(methods.items()):
        got = {r["vec_id"] for r in df.select("vec_id").collect()}
        hits = len(got & exact)
        rows.append((name, hits, round(hits / 10.0, 2)))
    return spark.createDataFrame(rows, "method string, hits bigint, recall_at_10 double")


_SQL_EXACT10 = f"""
SELECT vec_id FROM (
  WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
  c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> {QUERY_VEC_ID})
  SELECT vec_id FROM c, q ORDER BY {_sql_cos('v', 'qv')} DESC, vec_id LIMIT 10)
"""

_SQL_IVF10 = f"""
SELECT vec_id FROM (
  WITH cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings WHERE vec_id < 10),
  corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
  assign AS (
    SELECT vec_id, cid FROM (
      SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY {_sql_cos('v', 'cv')} DESC, cid) AS rn
      FROM corpus, cents) WHERE rn = 1),
  q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
  probe AS (SELECT cid FROM cents, q ORDER BY {_sql_cos('cv', 'qv')} DESC, cid LIMIT 3)
  SELECT c.vec_id
  FROM corpus c JOIN assign a ON a.vec_id = c.vec_id, q
  WHERE a.cid IN (SELECT cid FROM probe) AND c.vec_id <> {QUERY_VEC_ID}
  ORDER BY {_sql_cos('c.v', 'qv')} DESC, c.vec_id LIMIT 10)
"""

_SQL_MAT10 = f"""
SELECT vec_id FROM (
  WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
  c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}),
  cand AS (
    SELECT vec_id, v, qv FROM c, q
    ORDER BY {_sql_cos('v[1:16]', 'qv[1:16]')} DESC, vec_id LIMIT 40)
  SELECT vec_id FROM cand ORDER BY {_sql_cos('v', 'qv')} DESC, vec_id LIMIT 10)
"""

_SQL_SQ810 = f"""
SELECT vec_id FROM (
  WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
  qs AS (SELECT qv, list_max(list_transform(qv, x -> abs(x)))/127.0 AS qscale FROM q),
  qc AS (SELECT qv, qscale, {_sql_sq8('qv', 'qscale')} AS qcodes FROM qs),
  c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}),
  cs AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x)))/127.0 AS s FROM c),
  cc AS (SELECT vec_id, v, s, {_sql_sq8('v', 's')} AS codes FROM cs),
  cand AS (
    SELECT vec_id, v FROM cc, qc
    ORDER BY s * qscale * list_inner_product(codes, qcodes) DESC, vec_id
    LIMIT 40)
  SELECT vec_id FROM cand, q ORDER BY {_sql_cos('v', 'qv')} DESC, vec_id LIMIT 10)
"""

SQL_ANN_RECALL = f"""
WITH ex AS ({_SQL_EXACT10}),
iv AS ({_SQL_IVF10}), mt AS ({_SQL_MAT10}), sq AS ({_SQL_SQ810})
SELECT * FROM (
  SELECT 'ivf' AS method, CAST(count(*) AS BIGINT) AS hits, round(count(*)/10.0, 2) AS recall_at_10
  FROM iv WHERE vec_id IN (SELECT vec_id FROM ex)
  UNION ALL
  SELECT 'matryoshka', CAST(count(*) AS BIGINT), round(count(*)/10.0, 2)
  FROM mt WHERE vec_id IN (SELECT vec_id FROM ex)
  UNION ALL
  SELECT 'sq8', CAST(count(*) AS BIGINT), round(count(*)/10.0, 2)
  FROM sq WHERE vec_id IN (SELECT vec_id FROM ex)
) ORDER BY method
"""


# PQ at 64-d: m=8 subspaces × 8 dims, ksub=32 codes → 8-byte codes (32×
# compression); coarse ADC scan reads ONLY (id, codes), then k×refine
# exact rescore.  Seed codebooks are the subvectors of the 32 lowest-id
# corpus rows — trained-state-free, so the oracle replays the WHOLE
# pipeline (codebook → argmin encode → ADC → refine) including tie-breaks.
_PQ_M, _PQ_KSUB, _PQ_REFINE = 8, 32, 4


def q_knn_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-10 (operators/pq.py — the PQ half of
    the reference's IVF-PQ scale path, reference store.py:274): seeded
    per-subspace codebooks, map-only codegen encode, literal-LUT ADC
    coarse scan over 8-byte codes, exact inner-product refine of the
    k×refine survivors."""
    import math

    from mcpvectordb_spark.operators import pq as pqm
    from mcpvectordb_spark.operators.knn import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    corpus = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("__n", l2_norm(v))
        .select(
            F.col("vec_id").alias("id"),
            F.transform(v, lambda x: x / F.col("__n")).alias("embedding"),
        )
    )
    q0 = _q_vec(spark, sf_dir)
    qn = math.sqrt(sum(x * x for x in q0))
    q = [x / qn for x in q0]
    cb = pqm.seed_codebooks(corpus, _PQ_M, _PQ_KSUB)
    # Arrow/BLAS encode (impl="pandas"): identical codes to the codegen
    # fold (equality test-pinned in test_pq.py), ~5x faster at sf0.1 —
    # the expression form remains the in-plan audit twin.
    enc = pqm.pq_encode(corpus, cb, impl="pandas")
    out = pqm.pq_topk(enc, cb, q, 10, refine=_PQ_REFINE)
    return out.select(F.col("id").alias("vec_id"), F.round("score", 6).alias("score"))


_PQ_DSUB = 8  # 64 // _PQ_M

SQL_KNN_PQ_TOPK = f"""
WITH raw AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings
  WHERE vec_id <> {QUERY_VEC_ID}),
corpus AS (
  SELECT id, list_transform(v0, x -> x / sqrt(list_inner_product(v0, v0))) AS v FROM raw),
qraw AS (SELECT CAST(embedding AS DOUBLE[]) AS q0 FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
q AS (SELECT list_transform(q0, x -> x / sqrt(list_inner_product(q0, q0))) AS qv FROM qraw),
seeds AS (
  SELECT row_number() OVER (ORDER BY id) - 1 AS code, v
  FROM (SELECT id, v FROM corpus ORDER BY id LIMIT {_PQ_KSUB})),
cb AS (
  SELECT t.j, s.code, s.v[t.j*{_PQ_DSUB}+1 : t.j*{_PQ_DSUB}+{_PQ_DSUB}] AS cent
  FROM seeds s CROSS JOIN (SELECT unnest(range({_PQ_M})) AS j) t),
-- argmin-L2^2 encode; dist via |a|^2+|c|^2-2ac; ties -> lowest code
enc AS (
  SELECT id, j, code FROM (
    SELECT c.id, cb.j, cb.code,
           row_number() OVER (
             PARTITION BY c.id, cb.j
             ORDER BY list_inner_product(c.v[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}],
                                         c.v[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}])
                    + list_inner_product(cb.cent, cb.cent)
                    - 2*list_inner_product(c.v[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}], cb.cent),
                    cb.code) AS rn
    FROM corpus c CROSS JOIN cb) WHERE rn = 1),
lut AS (
  SELECT cb.j, cb.code,
         list_inner_product(cb.cent, q.qv[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}]) AS pd
  FROM cb, q),
adc AS (
  SELECT e.id, sum(l.pd) AS adc
  FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code GROUP BY e.id),
cand AS (SELECT id FROM adc ORDER BY adc DESC, id LIMIT {10 * _PQ_REFINE})
SELECT c.id AS vec_id, round(list_inner_product(c.v, q.qv), 6) AS score
FROM corpus c JOIN cand USING (id), q
ORDER BY list_inner_product(c.v, q.qv) DESC, c.id
LIMIT 10
"""


def q_knn_pq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained-state PQ path: 2 distributed Lloyd iterations refine the
    seeded codebooks (operators/pq.py::pq_refine_codebooks — joint
    joins+aggs across all m subspaces, (subspace, code) triples shuffle,
    never vectors), then the same encode→ADC→refine search.  The iterative
    centroid means are not SQL-expressible → golden-digest gate (centroids
    quantized to 6 decimals for run-stability, like semdedup_refined)."""
    import math

    from mcpvectordb_spark.operators import pq as pqm
    from mcpvectordb_spark.operators.knn import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    corpus = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("__n", l2_norm(v))
        .select(
            F.col("vec_id").alias("id"),
            F.transform(v, lambda x: x / F.col("__n")).alias("embedding"),
        )
    )
    q0 = _q_vec(spark, sf_dir)
    qn = math.sqrt(sum(x * x for x in q0))
    q = [x / qn for x in q0]
    cb = pqm.pq_refine_codebooks(corpus, pqm.seed_codebooks(corpus, _PQ_M, _PQ_KSUB), iters=2)
    cb = [[[round(x, 6) for x in cent] for cent in sub] for sub in cb]
    enc = pqm.pq_encode(corpus, cb, impl="pandas")
    out = pqm.pq_topk(enc, cb, q, 10, refine=_PQ_REFINE)
    return _digest_gate(
        out.select(F.col("id").alias("vec_id"), F.round("score", 6).alias("score"))
    )


def q_knn_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END residual IVF-PQ — the reference's actual index type
    (store.py:274) fully composed: coarse cells (the 9 lowest-id corpus
    vectors as centroids, cosine assignment), PQ over RESIDUALS x−c with
    seed codebooks from the 32 lowest-id rows' residuals, per-probed-cell
    ADC lookup tables folded into one literal (score ≈ <q,c> + Σ lut),
    k×refine exact rescore.  Every stage is trained-state-free, so the
    oracle replays the WHOLE pipeline — assignment, residual encode, ADC,
    refine — including tie-breaks."""
    import math

    from mcpvectordb_spark.operators import pq as pqm
    from mcpvectordb_spark.operators.knn import ivf_assign, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    corpus = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("__n", l2_norm(v))
        .select(
            F.col("vec_id").alias("id"),
            F.transform(v, lambda x: x / F.col("__n")).alias("embedding"),
        )
    )
    cents = corpus.filter(F.col("id") < 10).select(
        F.col("id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    assigned = ivf_assign(corpus, cents, corpus_id="id")
    cb = pqm.seed_residual_codebooks(assigned, cents, _PQ_M, _PQ_KSUB)
    enc = pqm.ivfpq_encode(assigned, cents, cb, impl="pandas")
    q0 = _q_vec(spark, sf_dir)
    qn = math.sqrt(sum(x * x for x in q0))
    q = [x / qn for x in q0]
    out = pqm.ivfpq_topk(enc, cents, cb, q, 10, nprobe=3, refine=_PQ_REFINE)
    return out.select(F.col("id").alias("vec_id"), F.round("score", 6).alias("score"))


SQL_KNN_IVFPQ_TOPK = f"""
WITH raw AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings
  WHERE vec_id <> {QUERY_VEC_ID}),
corpus AS (
  SELECT id, list_transform(v0, x -> x / sqrt(list_inner_product(v0, v0))) AS v FROM raw),
qraw AS (SELECT CAST(embedding AS DOUBLE[]) AS q0 FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
qn AS (SELECT list_transform(q0, x -> x / sqrt(list_inner_product(q0, q0))) AS qv FROM qraw),
cents AS (SELECT id AS cid, v AS cv FROM corpus WHERE id < 10),
assign AS (
  SELECT id, v, cid, cv FROM (
    SELECT c.id, c.v, ct.cid, ct.cv,
           row_number() OVER (PARTITION BY c.id
                              ORDER BY {_sql_cos('c.v', 'ct.cv')} DESC, ct.cid) AS rn
    FROM corpus c CROSS JOIN cents ct) WHERE rn = 1),
resid AS (
  SELECT id, cid, v, list_transform(range(1, len(v)+1), i -> v[i] - cv[i]) AS r
  FROM assign),
seeds AS (
  SELECT row_number() OVER (ORDER BY id) - 1 AS code, r
  FROM (SELECT id, r FROM resid ORDER BY id LIMIT {_PQ_KSUB})),
cb AS (
  SELECT t.j, s.code, s.r[t.j*{_PQ_DSUB}+1 : t.j*{_PQ_DSUB}+{_PQ_DSUB}] AS cent
  FROM seeds s CROSS JOIN (SELECT unnest(range({_PQ_M})) AS j) t),
enc AS (
  SELECT id, j, code FROM (
    SELECT rs.id, cb.j, cb.code,
           row_number() OVER (
             PARTITION BY rs.id, cb.j
             ORDER BY list_inner_product(rs.r[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}],
                                         rs.r[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}])
                    + list_inner_product(cb.cent, cb.cent)
                    - 2*list_inner_product(rs.r[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}], cb.cent),
                    cb.code) AS rn
    FROM resid rs CROSS JOIN cb) WHERE rn = 1),
probe AS (
  SELECT ct.cid, ct.cv, list_inner_product(ct.cv, q.qv) AS off
  FROM cents ct, qn q
  ORDER BY list_inner_product(ct.cv, q.qv) DESC, ct.cid LIMIT 3),
qres AS (
  SELECT p.cid, p.off,
         list_transform(range(1, len(q.qv)+1), i -> q.qv[i] - p.cv[i]) AS qr
  FROM probe p, qn q),
lut AS (
  SELECT qr.cid, cb.j, cb.code,
         list_inner_product(cb.cent, qr.qr[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}]) AS pd
  FROM cb CROSS JOIN qres qr),
adc AS (
  SELECT e.id, max(q2.off) + sum(l.pd) AS adc
  FROM enc e
  JOIN assign a ON a.id = e.id
  JOIN qres q2 ON q2.cid = a.cid
  JOIN lut l ON l.cid = a.cid AND l.j = e.j AND l.code = e.code
  GROUP BY e.id),
cand AS (SELECT id FROM adc ORDER BY adc DESC, id LIMIT {10 * _PQ_REFINE})
SELECT c.id AS vec_id, round(list_inner_product(c.v, q.qv), 6) AS score
FROM corpus c JOIN cand USING (id), qn q
ORDER BY list_inner_product(c.v, q.qv) DESC, c.id
LIMIT 10
"""


def q_knn_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-projected ANN (knn.py::pca_components/knn_topk_pca): top-16
    principal components (distributed Gramian + driver eigh via MLlib,
    sign-fixed, 6-decimal quantized for run-stability), codegen'd
    projection fold for the coarse scan, exact refine of k×4 candidates.
    The learned-projection family member beside Matryoshka (no trained
    state) and PQ (codebooks); eigendecomposition is not SQL-expressible
    → golden-digest gate, with recall and exactness bounds pinned in
    test_pq.py."""
    import math

    from mcpvectordb_spark.operators.knn import knn_topk_pca, l2_norm, pca_components

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    corpus = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("__n", l2_norm(v))
        .select(
            F.col("vec_id").alias("id"),
            F.transform(v, lambda x: x / F.col("__n")).alias("embedding"),
        )
    )
    q0 = _q_vec(spark, sf_dir)
    qn = math.sqrt(sum(x * x for x in q0))
    q = [x / qn for x in q0]
    comps = pca_components(corpus, 16)
    out = knn_topk_pca(corpus, q, comps, k=10, refine=4, id_col="id")
    return _digest_gate(
        out.select(F.col("id").alias("vec_id"), F.round("score", 6).alias("score"))
    )


def q_doc_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk→document embedding mean-pooling (knn.py::
    mean_pool_embeddings): groups of 4 vectors pool to one L2-normalized
    doc vector, then exact top-5 against the query — doc-level retrieval
    over a chunk-level index."""
    from mcpvectordb_spark.operators.knn import mean_pool_embeddings

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
    chunks = emb.withColumn("doc", F.expr("vec_id div 4"))
    pooled = mean_pool_embeddings(chunks, "doc", "embedding", "doc_embedding")
    qv = _q_vec(spark, sf_dir)
    hits = knn_topk(pooled, qv, 5, vec_col="doc_embedding", tie_col="doc")
    return hits.select("doc", F.round("score", 6).alias("score"))


SQL_DOC_EMBEDDINGS = f"""
WITH c AS (
  SELECT vec_id // 4 AS doc, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
),
per_pos AS (
  SELECT doc, t.i AS pos, avg(v[t.i]) AS m
  FROM c, UNNEST(range(1, len(v) + 1)) AS t(i)
  GROUP BY doc, t.i
),
pooled_raw AS (
  SELECT doc, list(m ORDER BY pos) AS dv FROM per_pos GROUP BY doc
),
pooled AS (
  SELECT doc, list_transform(dv, x -> x / sqrt(list_inner_product(dv, dv))) AS dv
  FROM pooled_raw
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT doc, round({_sql_cos('dv', 'qv')}, 6) AS score
FROM pooled, q
ORDER BY {_sql_cos('dv', 'qv')} DESC, doc LIMIT 5
"""


def q_knn_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized KNN (scale path): int8 coarse scan (4x less
    embedding IO than float32) -> exact re-score of k*refine candidates.
    The coarse->refine contract is the reference's deferred IVF-PQ +
    refine_factor (store.py:274,302,317); quantization uses portable
    sign-split floor rounding so codes match the oracle bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _q_vec(spark, sf_dir)
    hits = knn_topk_sq8(
        emb.filter(F.col("vec_id") != QUERY_VEC_ID), qv, 10,
        refine_factor=4, tie_col="vec_id",
    )
    return hits.select("vec_id", F.round("score", 6).alias("score"))


SQL_KNN_SQ8_TOPK = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
qs AS (SELECT qv, list_max(list_transform(qv, x -> abs(x)))/127.0 AS qscale FROM q),
qc AS (SELECT qv, qscale, {_sql_sq8('qv', 'qscale')} AS qcodes FROM qs),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}),
cs AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x)))/127.0 AS s FROM c),
cc AS (SELECT vec_id, v, s, {_sql_sq8('v', 's')} AS codes FROM cs),
cand AS (
  SELECT vec_id, v FROM cc, qc
  ORDER BY s * qscale * list_inner_product(codes, qcodes) DESC, vec_id
  LIMIT 40)
SELECT vec_id, round({_sql_cos('v', 'qv')}, 6) AS score
FROM cand, q ORDER BY {_sql_cos('v', 'qv')} DESC, vec_id LIMIT 10
"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 (the custom FTS leg — SURVEY §2.10 R2 / §4)."""
    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_topk(docs, SEARCH_QUERY, 10, "doc_id", "text")
    return hits.select("doc", F.round("score", 6).alias("score"))


SQL_BM25_TOPK = f"""
WITH {_SQL_BM25_CTES}
SELECT doc, round(score, 6) AS score FROM bm ORDER BY score DESC, doc LIMIT 10
"""


def q_bm25_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant BM25 (operators/bm25.py::bm25_topk_fuzzy): every query
    term is misspelled at edit distance 1, the corpus vocabulary expands
    them back (length pre-filter + Levenshtein ≤ 1), and the expanded set
    scores through standard BM25.  The oracle replays the expansion with
    DuckDB's levenshtein — both engines implement the same plain edit
    distance."""
    from mcpvectordb_spark.operators.bm25 import bm25_topk_fuzzy

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_topk_fuzzy(docs, "batc joins spark windoww", 10, "doc_id", "text")
    return hits.select("doc", F.round("score", 6).alias("score"))


SQL_BM25_FUZZY = f"""
WITH {_SQL_BM25_CTES.replace("qterms AS (SELECT unnest(['batch','join','spark','window']) AS term),",
'''vocab AS (SELECT DISTINCT term FROM posting),
qraw AS (SELECT unnest(['batc','joins','spark','windoww']) AS qterm),
qterms AS (
  SELECT DISTINCT term FROM vocab, qraw
  WHERE abs(length(term) - length(qterm)) <= 1
    AND levenshtein(term, qterm) <= 1),''')}
SELECT doc, round(score, 6) AS score FROM bm ORDER BY score DESC, doc LIMIT 10
"""


def q_search_highlights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 with highlighted snippets (bm25.py::highlight_col):
    ±40-char excerpt centred on the first query-term hit, every in-excerpt
    occurrence wrapped in ** — pure codegen (locate/substr/regexp_replace),
    replayed verbatim by the oracle (strpos/substring + RE2 'g')."""
    from mcpvectordb_spark.operators.bm25 import highlight_col

    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_topk(docs, SEARCH_QUERY, 10, "doc_id", "text")
    joined = hits.join(docs.select(F.col("doc_id").alias("doc"), "text"), "doc")
    return joined.select(
        "doc",
        F.round("score", 6).alias("score"),
        highlight_col(F.col("text"), SEARCH_QUERY.split()).alias("snippet"),
    )


_HL_TERMS = SEARCH_QUERY.split()
_HL_FIRST = "least(" + ", ".join(
    f"CASE WHEN strpos(lower(text), '{t}') > 0 THEN strpos(lower(text), '{t}') "
    "ELSE 2000000000 END" for t in _HL_TERMS
) + ")"

SQL_SEARCH_HIGHLIGHTS = f"""
WITH {_SQL_BM25_CTES},
top AS (SELECT doc, round(score, 6) AS score FROM bm ORDER BY score DESC, doc LIMIT 10),
src AS (SELECT t.doc, t.score, d.text FROM top t JOIN documents d ON d.doc_id = t.doc),
pos AS (SELECT doc, score, text, {_HL_FIRST} AS first FROM src),
snip AS (
  SELECT doc, score,
         CASE WHEN first < 2000000000
              THEN substring(text, greatest(first - 40, 1), 80)
              ELSE substring(text, 1, 80) END AS raw
  FROM pos)
SELECT doc, score,
       regexp_replace(raw, '(?i)({"|".join(_HL_TERMS)})', '**\\1**', 'g') AS snippet
FROM snip
"""


def q_lm_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood LM retrieval with Dirichlet smoothing (μ=2000) —
    the second standard lexical scorer beside BM25 (operators/qlm.py;
    Zhai & Lafferty 2001).  Every document scores (zero-hit docs rank by
    the length normalizer), so the oracle replays the full decomposition
    over the same posting list."""
    from mcpvectordb_spark.operators.qlm import qlm_topk

    docs = load_table(spark, sf_dir, "documents")
    hits = qlm_topk(docs, SEARCH_QUERY, 10, "doc_id", "text")
    return hits.select("doc", F.round("score", 6).alias("score"))


SQL_LM_DIRICHLET = rf"""
WITH toks AS (
  SELECT doc_id AS doc, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS term
  FROM documents),
posting AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY 1, 2),
lens AS (
  SELECT doc_id AS doc,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS BIGINT) AS dl
  FROM documents),
cf AS (SELECT term, sum(tf) AS cf FROM posting GROUP BY 1),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM posting),
qterms AS (SELECT unnest(['batch','join','spark','window']) AS term, 1.0 AS qc),
hits AS (
  SELECT doc, sum(qc * ln(1 + tf / (2000.0 * (cf / total)))) AS hit
  FROM posting JOIN qterms USING(term) JOIN cf USING(term), tot
  GROUP BY doc),
scored AS (
  SELECT doc, coalesce(hit, 0.0) + 4.0 * ln(2000.0 / (dl + 2000.0)) AS score
  FROM lens LEFT JOIN hits USING(doc))
SELECT doc, round(score, 6) AS score FROM scored ORDER BY score DESC, doc LIMIT 10
"""


def q_tfidf_simjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine near-dup pairs ≥ 0.6 over the planted near-dup corpus
    (operators/simjoin.py — inverted-index candidate join, max_df=100
    stop-term cutoff)."""
    from mcpvectordb_spark.operators.simjoin import tfidf_cosine_pairs

    corpus = _near_corpus(spark, sf_dir)
    pairs = tfidf_cosine_pairs(corpus, "id", "text", threshold=0.6, max_df=100)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


SQL_TFIDF_SIMJOIN = rf"""
WITH corpus AS ({_SQL_NEAR_CORPUS}),
toks AS (
  SELECT id AS doc, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS term
  FROM corpus),
posting AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY 1, 2),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM corpus),
dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY 1 HAVING count(*) <= 100),
w AS (
  SELECT doc, term, df, tf * ln(n_docs / df) AS w
  FROM posting JOIN dfreq USING(term), n),
norms AS (SELECT doc, sqrt(sum(w * w)) AS norm FROM w GROUP BY doc),
pairs AS (
  SELECT a.doc AS id_a, b.doc AS id_b, sum(a.w * b.w) AS dot
  FROM (SELECT * FROM w WHERE df >= 2) a
  JOIN (SELECT * FROM w WHERE df >= 2) b ON a.term = b.term AND a.doc < b.doc
  GROUP BY 1, 2)
SELECT id_a, id_b, round(dot / (na.norm * nb.norm), 6) AS cosine
FROM pairs JOIN norms na ON na.doc = id_a JOIN norms nb ON nb.doc = id_b
WHERE dot / (na.norm * nb.norm) >= 0.6
"""


def q_ssjoin_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard self-join >= 0.5 via AllPairs prefix
    filtering (operators/simjoin.py::jaccard_ssjoin — rarest-first global
    shingle order, prefix length |s|-ceil(t|s|)+1, length filter, exact
    verify).  The oracle is the NAIVE all-pairs Jaccard over the same
    shingle sets (the dedup_ngram_jaccard spec), so green parity proves
    the prefix filter loses no pair.  Exact sibling of the probabilistic
    dedup_minhash_lsh gate at the same (n=3, t=0.5) operating point."""
    from mcpvectordb_spark.operators.simjoin import jaccard_ssjoin

    corpus = _near_corpus(spark, sf_dir)
    pairs = jaccard_ssjoin(corpus, "id", "text", threshold=0.5, shingle_n=3)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


SQL_SSJOIN_JACCARD = f"""
WITH corpus AS ({_SQL_NEAR_CORPUS}),
toks AS (
  SELECT id AS doc, unnest({_sql_shingles(_sql_words("text"), 3)}) AS term
  FROM corpus),
sizes AS (SELECT doc, count(*) AS s FROM toks GROUP BY 1),
common AS (
  SELECT a.doc AS id_a, b.doc AS id_b, count(*) AS i
  FROM toks a JOIN toks b ON a.term = b.term AND a.doc < b.doc
  GROUP BY 1, 2)
SELECT id_a, id_b, round(CAST(i AS DOUBLE) / (sa.s + sb.s - i), 6) AS jaccard
FROM common JOIN sizes sa ON sa.doc = id_a JOIN sizes sb ON sb.doc = id_b
WHERE CAST(i AS DOUBLE) / (sa.s + sb.s - i) >= 0.5
"""


def q_textrank_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank extractive summarization (operators/textrank.py): top-2
    central sentences per document for doc_id < 100, 5 damped power
    iterations over per-doc sentence-overlap graphs — all docs ranked in
    ONE plan, no per-document loop.  The oracle unrolls the identical 5
    iterations as chained CTEs."""
    from mcpvectordb_spark.operators.textrank import textrank_sentences

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    out = textrank_sentences(docs, "doc_id", "text", top_k=2, iters=5)
    return out.select("doc", "sent", F.round("rank", 6).alias("rank"))


def _sql_textrank() -> str:
    iters = "".join(
        f""",
r{i} AS (
  SELECT s.doc, s.sent, 0.15 + 0.85 * coalesce(sum(ne.nw * p.r), 0.0) AS r
  FROM sents s
  LEFT JOIN ne ON ne.doc = s.doc AND ne.dst = s.sent
  LEFT JOIN r{i - 1} p ON p.doc = ne.doc AND p.sent = ne.src
  GROUP BY 1, 2)"""
        for i in range(1, 6)
    )
    return rf"""
WITH docs AS (SELECT doc_id AS doc, text FROM documents WHERE doc_id < 100),
raw AS (SELECT doc, unnest(regexp_split_to_array(text, '\.\s+')) AS rs FROM docs),
sents AS (SELECT DISTINCT doc, trim(rs) AS sent FROM raw WHERE trim(rs) <> ''),
stoks AS (
  SELECT DISTINCT doc, sent,
         unnest(list_filter(regexp_split_to_array(lower(trim(sent)), '\s+'), t -> t <> '')) AS term
  FROM sents),
sizes AS (SELECT doc, sent, count(*) AS nt FROM stoks GROUP BY 1, 2),
common AS (
  SELECT a.doc AS doc, a.sent AS sa, b.sent AS sb, count(*) AS c
  FROM stoks a JOIN stoks b ON a.doc = b.doc AND a.term = b.term AND a.sent < b.sent
  GROUP BY 1, 2, 3),
sim AS (
  SELECT c.doc, sa, sb, c.c / (ln(na.nt + 1) + ln(nb.nt + 1)) AS w
  FROM common c JOIN sizes na ON na.doc = c.doc AND na.sent = c.sa
                JOIN sizes nb ON nb.doc = c.doc AND nb.sent = c.sb),
edges AS (SELECT doc, sa AS src, sb AS dst, w FROM sim
          UNION ALL SELECT doc, sb AS src, sa AS dst, w FROM sim),
wout AS (SELECT doc, src, sum(w) AS wt FROM edges GROUP BY 1, 2),
ne AS (SELECT e.doc, e.src, e.dst, e.w / wo.wt AS nw
       FROM edges e JOIN wout wo ON wo.doc = e.doc AND wo.src = e.src),
r0 AS (SELECT doc, sent, 1.0 AS r FROM sents){iters}
SELECT doc, sent, round(r, 6) AS rank FROM r5
QUALIFY row_number() OVER (PARTITION BY doc ORDER BY r DESC, sent ASC) <= 2
"""


SQL_TEXTRANK_SUMMARY = _sql_textrank()


def q_item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item collaborative filtering (operators/analytics.py::
    item_item_cosine — within-basket pair mining, max_basket fanout bound,
    cooc/sqrt(na·nb) cosine): top-5 recommendations for the 10 most-
    ordered parts.  The oracle mines the same pairs naively."""
    from mcpvectordb_spark.operators.analytics import item_item_cosine

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = item_item_cosine(li, "l_orderkey", "l_partkey", min_cooc=2, max_basket=50)
    sym = pairs.select(
        F.col("item_a").alias("seed"), F.col("item_b").alias("rec"), "cooc", "cos"
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("seed"), F.col("item_a").alias("rec"), "cooc", "cos"
        )
    )
    seeds = (
        li.distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_ord"))
        .orderBy(F.col("n_ord").desc(), F.col("l_partkey").asc())
        .limit(10)
        .select(F.col("l_partkey").alias("seed"))
    )
    rn = F.row_number().over(
        Window.partitionBy("seed").orderBy(F.col("cos").desc(), F.col("rec").asc())
    )
    return (
        sym.join(F.broadcast(seeds), "seed")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= 5)
        .select("seed", "rec", "cooc", F.round("cos", 6).alias("cos"))
    )


SQL_ITEM_RECS = """
WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
ok AS (SELECT bk FROM b GROUP BY bk HAVING count(*) <= 50),
bf AS (SELECT b.* FROM b JOIN ok USING(bk)),
n AS (SELECT it, count(*) AS n FROM bf GROUP BY it),
pairs AS (
  SELECT a.it AS item_a, bb.it AS item_b, CAST(count(*) AS BIGINT) AS cooc
  FROM bf a JOIN bf bb ON a.bk = bb.bk AND a.it < bb.it
  GROUP BY 1, 2 HAVING count(*) >= 2),
cosed AS (
  SELECT item_a, item_b, cooc, cooc / sqrt(na.n * nb.n) AS cos
  FROM pairs JOIN n na ON na.it = item_a JOIN n nb ON nb.it = item_b),
sym AS (SELECT item_a AS seed, item_b AS rec, cooc, cos FROM cosed
        UNION ALL SELECT item_b AS seed, item_a AS rec, cooc, cos FROM cosed),
seeds AS (
  SELECT it AS seed FROM b GROUP BY it
  ORDER BY count(*) DESC, it ASC LIMIT 10)
SELECT seed, rec, cooc, round(cos, 6) AS cos
FROM sym JOIN seeds USING(seed)
QUALIFY row_number() OVER (PARTITION BY seed ORDER BY cos DESC, rec ASC) <= 5
"""


def q_part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier of part (minimize retail price, maximize size)
    via the sort-scan skyline (operators/skyline.py — one sort + two
    RANGE-frame window maxima, no join).  The oracle is the naive
    NOT-EXISTS dominance test, proving the window formulation exact."""
    from mcpvectordb_spark.operators.skyline import skyline2d

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    return skyline2d(p, "price_c", "p_size").select("p_partkey", "price_c", "p_size")


SQL_PART_SKYLINE = """
WITH p AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_c,
         CAST(p_size AS BIGINT) AS p_size
  FROM part)
SELECT p_partkey, price_c, p_size FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
    AND (b.price_c < a.price_c OR b.p_size > a.p_size))
"""


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distances (operators/graph.py::bfs_distances
    — level-synchronous frontier expansion, anti-join dedup, checkpointed
    frontiers) over the co-purchase graph (parts co-ordered >= 2), seeds =
    parts with p_partkey < 25, depth 3.  The oracle unrolls the identical
    3 level expansions as chained CTEs."""
    from mcpvectordb_spark.operators.graph import bfs_distances

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    seeds = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 25).select(
        F.col("p_partkey").alias("node")
    )
    out = bfs_distances(edges, seeds, max_depth=3)
    return out.select("node", F.col("d").cast("long").alias("d"))


def _sql_graph_bfs() -> str:
    levels = "".join(
        f""",
n{i} AS (
  SELECT DISTINCT e.t AS node FROM e JOIN f{i - 1} fr ON e.s = fr.node),
d{i} AS (
  SELECT node, d FROM d{i - 1}
  UNION ALL
  SELECT node, {i} AS d FROM n{i}
  WHERE node NOT IN (SELECT node FROM d{i - 1})),
f{i} AS (SELECT node FROM d{i} WHERE d = {i})"""
        for i in range(1, 4)
    )
    return f"""
WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
raw AS (
  SELECT a.p AS src, b.p AS dst
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2),
e AS (SELECT src AS s, dst AS t FROM raw UNION SELECT dst AS s, src AS t FROM raw),
d0 AS (SELECT p_partkey AS node, 0 AS d FROM part WHERE p_partkey < 25),
f0 AS (SELECT node FROM d0){levels}
SELECT node, CAST(d AS BIGINT) AS d FROM d3
"""


SQL_GRAPH_BFS = _sql_graph_bfs()


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-window EWMA smoothing of per-type hourly event counts
    (operators/timeseries.py::ewma_trailing — block-bucketed trailing
    window join, per-row fanout 2).  The oracle replays the identical
    weighted sum with a bare range self-join."""
    from mcpvectordb_spark.operators.timeseries import ewma_trailing

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    out = ewma_trailing(hourly, "event_type", "h", "n", alpha=0.3, window=24)
    return out.select(
        "event_type", "h",
        F.col("n").cast("long").alias("n"),
        F.round("ewma", 6).alias("ewma"),
        F.round("dev", 6).alias("dev"),
    )


SQL_EVENTS_EWMA = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2),
j AS (
  SELECT a.event_type, a.h, a.n,
         sum(power(0.7, a.h - b.h) * b.n) AS num,
         sum(power(0.7, a.h - b.h)) AS den
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND b.h <= a.h AND b.h > a.h - 24
  GROUP BY 1, 2, 3)
SELECT event_type, h, CAST(n AS BIGINT) AS n,
       round(num / den, 6) AS ewma, round(n - num / den, 6) AS dev
FROM j
"""


def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type transition
    chain: row-normalized transition matrix from lead() pairs (the
    events_paths transitions), then 6 in-plan power iterations from the
    uniform vector — no driver loop state, the matrix stays a DataFrame.
    The oracle unrolls the same 6 iterations as chained CTEs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    cnt = trans.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("src").agg(F.sum("c").alias("t"))
    pmat = cnt.join(tot, "src").select("src", "dst", (F.col("c") / F.col("t")).alias("p"))
    pmat = pmat.localCheckpoint(eager=False)

    states = ev.select(F.col("event_type").alias("s")).distinct()
    ns = states.agg(F.count(F.lit(1)).cast("double").alias("n_states"))
    pi = states.crossJoin(F.broadcast(ns)).select(
        F.col("s").alias("ps"), (F.lit(1.0) / F.col("n_states")).alias("pi")
    )
    for _ in range(6):
        inflow = (
            pmat.join(pi, pmat["src"] == pi["ps"])
            .groupBy(F.col("dst").alias("s2"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("inflow"))
        )
        pi = (
            states.join(inflow, states["s"] == inflow["s2"], "left")
            .select(F.col("s").alias("ps"), F.coalesce("inflow", F.lit(0.0)).alias("pi"))
            .localCheckpoint(eager=False)
        )
    return pi.select(F.col("ps").alias("event_type"), F.round("pi", 6).alias("pi"))


def _sql_events_markov() -> str:
    iters = "".join(
        f""",
p{i} AS (
  SELECT st.s, coalesce(sum(pm.p * prev.pi), 0.0) AS pi
  FROM states st
  LEFT JOIN pmat pm ON pm.dst = st.s
  LEFT JOIN p{i - 1} prev ON prev.s = pm.src
  GROUP BY st.s)"""
        for i in range(1, 7)
    )
    return f"""
WITH trans AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events),
cnt AS (SELECT src, dst, count(*) AS c FROM trans WHERE dst IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT src, sum(c) AS t FROM cnt GROUP BY 1),
pmat AS (SELECT cnt.src, cnt.dst, cnt.c * 1.0 / tot.t AS p FROM cnt JOIN tot USING (src)),
states AS (SELECT DISTINCT event_type AS s FROM events),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS n_states FROM states),
p0 AS (SELECT s, 1.0 / n_states AS pi FROM states, ns){iters}
SELECT s AS event_type, round(pi, 6) AS pi FROM p6
"""


SQL_EVENTS_MARKOV = _sql_events_markov()


def q_events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-journey next-event process: conditional
    entropy H(next | current) of the empirical transition chain, the
    marginal next-event entropy H(next), their difference (the mutual
    information between consecutive events = how much knowing the
    current event helps prediction), and conditional perplexity — the
    information-theoretic ceiling for ANY next-event recommender on
    this corpus (a model cannot beat 2^H_cond average branching).  Pure
    count arithmetic over the (src, dst) transition table (the
    events_markov lead() pairs) — exact BIGINT counts, per-cell log2
    terms, no iteration.  The oracle replays the same cells."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    cells = trans.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    rowt = cells.groupBy("src").agg(F.sum("c").alias("t"))
    colt = cells.groupBy("dst").agg(F.sum("c").alias("m"))
    tot = cells.agg(F.sum("c").alias("cc"))
    j = cells.join(F.broadcast(rowt), "src").crossJoin(F.broadcast(tot))
    hcond = j.agg(
        F.first("cc").alias("n_transitions"),
        (
            -F.sum(
                F.col("c").cast("double")
                / F.col("cc")
                * F.log2(F.col("c").cast("double") / F.col("t"))
            )
        ).alias("h_cond"),
    )
    hmarg = colt.crossJoin(F.broadcast(tot)).agg(
        (
            -F.sum(
                F.col("m").cast("double")
                / F.col("cc")
                * F.log2(F.col("m").cast("double") / F.col("cc"))
            )
        ).alias("h_marg")
    )
    return hcond.crossJoin(F.broadcast(hmarg)).select(
        "n_transitions",
        F.round("h_cond", 6).alias("h_cond_bits"),
        F.round("h_marg", 6).alias("h_marg_bits"),
        F.round(F.col("h_marg") - F.col("h_cond"), 6).alias("mi_bits"),
        F.round(F.pow(F.lit(2.0), F.col("h_cond")), 6).alias("perplexity"),
    )


SQL_EVENTS_ENTROPY_RATE = """
WITH trans AS (
  SELECT src, dst FROM (
    SELECT event_type AS src,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events)
  WHERE dst IS NOT NULL),
cells AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM trans GROUP BY 1, 2),
rowt AS (SELECT src, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1),
colt AS (SELECT dst, CAST(sum(c) AS BIGINT) AS m FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS cc FROM cells),
hc AS (
  SELECT any_value(cc) AS n_transitions,
         -sum(CAST(c AS DOUBLE) / cc * log2(CAST(c AS DOUBLE) / t)) AS h_cond
  FROM cells JOIN rowt USING(src) CROSS JOIN tot),
hm AS (
  SELECT -sum(CAST(m AS DOUBLE) / cc * log2(CAST(m AS DOUBLE) / cc)) AS h_marg
  FROM colt CROSS JOIN tot)
SELECT n_transitions,
       round(h_cond, 6) AS h_cond_bits,
       round(h_marg, 6) AS h_marg_bits,
       round(h_marg - h_cond, 6) AS mi_bits,
       round(power(2.0, h_cond), 6) AS perplexity
FROM hc CROSS JOIN hm
"""


def q_vocab_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church-Gale): for the top-50 terms by collection
    frequency, compare observed document frequency with the Poisson
    expectation df_exp = N*(1 - exp(-cf/N)) — content words BURST
    (df_obs << df_exp: occurrences clump in few docs) while function
    words scatter Poisson-like.  The adaptation ratio df_obs/df_exp and
    per-containing-doc mean cf/df are the classic lexical statistics
    for stopword induction and keyword weighting, computed from the
    SAME posting counts BM25 maintains: one groupBy, one broadcast
    scalar, a codegen projection.  Deterministic (cf desc, term asc)
    top-50."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id"),
        F.explode(F.split(dd.normalize_text(F.col("text")), " ")).alias("term"),
    ).filter(F.length("term") > 0)
    posting = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = posting.groupBy("term").agg(
        F.sum("tf").alias("cf"), F.count(F.lit(1)).alias("df")
    )
    nn = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.orderBy(F.col("cf").desc(), F.col("term").asc())
    top = (
        stats.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .crossJoin(F.broadcast(nn))
    )
    nd = F.col("n_docs").cast("double")
    df_exp = nd * (
        F.lit(1.0) - F.exp(-(F.col("cf").cast("double") / nd))
    )
    return top.select(
        "term",
        "cf",
        "df",
        F.col("rk").cast("long").alias("rk"),
        F.round(df_exp, 6).alias("df_expected"),
        F.round(F.col("df").cast("double") / df_exp, 6).alias("adaptation"),
        F.round(F.col("cf").cast("double") / F.col("df"), 6).alias(
            "mean_tf_in_doc"
        ),
    )


SQL_VOCAB_BURSTINESS = f"""
WITH toks AS (
  SELECT doc_id, unnest({_sql_words("text")}) AS term FROM documents),
toks2 AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
posting AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks2 GROUP BY 1, 2),
stats AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS cf, CAST(count(*) AS BIGINT) AS df
  FROM posting GROUP BY 1),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
top AS (
  SELECT term, cf, df,
         row_number() OVER (ORDER BY cf DESC, term ASC) AS rk
  FROM stats QUALIFY rk <= 50)
SELECT term, cf, df, CAST(rk AS BIGINT) AS rk,
       round(CAST(n_docs AS DOUBLE)
             * (1.0 - exp(-(CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE)))), 6)
         AS df_expected,
       round(CAST(df AS DOUBLE)
             / (CAST(n_docs AS DOUBLE)
                * (1.0 - exp(-(CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE))))), 6)
         AS adaptation,
       round(CAST(cf AS DOUBLE) / df, 6) AS mean_tf_in_doc
FROM top CROSS JOIN nn
"""


def q_events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences harness, validated as an A/A placebo:
    users hash-split into two arms (the ab_assign contract), the event
    window split at its epoch midpoint, per-user-period purchase cents
    aggregated, and DiD = (T_post - T_pre) - (C_post - C_pre) estimated
    with the four-cell pooled standard error.  On a hash split with no
    real intervention the estimate MUST sit inside its CI (the placebo
    gate every DiD pipeline should ship with — a significant A/A DiD
    means clustered or time-confounded errors).  Exact cents, exact
    integer midpoint; cell moments are one groupBy over user-periods."""
    from mcpvectordb_spark.operators.dedup import hexint48

    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.unix_timestamp("ts")).alias("t0"),
        F.max(F.unix_timestamp("ts")).alias("t1"),
    )
    base = ev.crossJoin(F.broadcast(span)).select(
        F.pmod(hexint48(F.col("user_id").cast("string")), F.lit(2)).alias("arm"),
        (
            F.unix_timestamp("ts")
            >= ((F.col("t0") + F.col("t1")) / 2).cast("long")
        ).cast("int").alias("post"),
        "user_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100, 0).cast("long"),
        ).otherwise(F.lit(0)).alias("cents"),
    )
    per_user = base.groupBy("arm", "post", "user_id").agg(
        F.sum("cents").alias("y")
    )
    cells = per_user.groupBy("arm", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sy").cast("double") / nd
    var = (nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")) / (
        nd * (nd - 1)
    )
    m = cells.select(
        "arm", "post", "n", mean.alias("m"), (var / nd).alias("vm")
    )
    wide = (
        m.groupBy()
        .pivot("arm", [0, 1])
        .agg(
            F.max(F.when(F.col("post") == 0, F.col("m"))).alias("pre"),
            F.max(F.when(F.col("post") == 1, F.col("m"))).alias("post"),
            F.sum("vm").alias("v"),
        )
    )
    did = (F.col("1_post") - F.col("1_pre")) - (
        F.col("0_post") - F.col("0_pre")
    )
    se = F.sqrt(F.col("0_v") + F.col("1_v"))
    return wide.select(
        F.round(F.col("0_pre") / 100, 4).alias("control_pre"),
        F.round(F.col("0_post") / 100, 4).alias("control_post"),
        F.round(F.col("1_pre") / 100, 4).alias("treat_pre"),
        F.round(F.col("1_post") / 100, 4).alias("treat_post"),
        F.round(did / 100, 4).alias("did"),
        F.round(se / 100, 4).alias("se"),
        F.round(did / se, 6).alias("t_stat"),
        (F.abs(did / se) > 1.96).alias("significant"),
    )


SQL_EVENTS_DID = f"""
WITH span AS (
  SELECT CAST(min(epoch(date_trunc('second', ts))) AS BIGINT) AS t0,
         CAST(max(epoch(date_trunc('second', ts))) AS BIGINT) AS t1
  FROM events),
base AS (
  SELECT {_sql_hex48("CAST(user_id AS VARCHAR)")} % 2 AS arm,
         CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT)
              >= (t0 + t1) // 2 AS INT) AS post,
         user_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS cents
  FROM events CROSS JOIN span),
per_user AS (
  SELECT arm, post, user_id, CAST(sum(cents) AS BIGINT) AS y
  FROM base GROUP BY 1, 2, 3),
cells AS (
  SELECT arm, post, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM per_user GROUP BY 1, 2),
m AS (
  SELECT arm, post, n,
         CAST(sy AS DOUBLE) / n AS m,
         ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / n AS vm
  FROM cells),
wide AS (
  SELECT
    max(CASE WHEN arm = 0 AND post = 0 THEN m END) AS c_pre,
    max(CASE WHEN arm = 0 AND post = 1 THEN m END) AS c_post,
    max(CASE WHEN arm = 1 AND post = 0 THEN m END) AS t_pre,
    max(CASE WHEN arm = 1 AND post = 1 THEN m END) AS t_post,
    sum(CASE WHEN arm = 0 THEN vm ELSE 0 END) AS v0,
    sum(CASE WHEN arm = 1 THEN vm ELSE 0 END) AS v1
  FROM m)
SELECT round(c_pre / 100, 4) AS control_pre,
       round(c_post / 100, 4) AS control_post,
       round(t_pre / 100, 4) AS treat_pre,
       round(t_post / 100, 4) AS treat_post,
       round(((t_post - t_pre) - (c_post - c_pre)) / 100, 4) AS did,
       round(sqrt(v0 + v1) / 100, 4) AS se,
       round(((t_post - t_pre) - (c_post - c_pre)) / sqrt(v0 + v1), 6) AS t_stat,
       abs(((t_post - t_pre) - (c_post - c_pre)) / sqrt(v0 + v1)) > 1.96 AS significant
FROM wide
"""


def q_lineitem_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlations among quantity / discount /
    extendedprice — the robust (monotone-invariant) counterpart to
    lineitem_corr's Pearson matrix, computed EXACTLY: midranks come
    from value blocks (2*midrank = 2*below + count + 1, an INTEGER — the
    Mann-Whitney doubling trick), rows join their value's rank, and
    Pearson-on-ranks reduces to the one-double-expression-over-exact-
    BIGINT-sums contract (sums fit int64 through sf0.1; the docstring
    notes the DOUBLE seam beyond ~1M rows).  No row-level sort anywhere:
    ranking is one block window per column."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("long").alias("quantity"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("discount"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price"),
    ).localCheckpoint(eager=False)

    def ranked(col: str) -> DataFrame:
        blocks = base.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        return blocks.select(
            F.col("v").alias(col),
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + 1
            ).alias(f"r_{col}"),
        )

    j = base
    for c in ("quantity", "discount", "price"):
        j = j.join(ranked(c), c)
    sums = j.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            x
            for c in ("quantity", "discount", "price")
            for x in (
                F.sum(f"r_{c}").alias(f"s_{c}"),
                F.sum(F.col(f"r_{c}") * F.col(f"r_{c}")).alias(f"ss_{c}"),
            )
        ],
        F.sum(F.col("r_quantity") * F.col("r_discount")).alias("sp_qd"),
        F.sum(F.col("r_quantity") * F.col("r_price")).alias("sp_qp"),
        F.sum(F.col("r_discount") * F.col("r_price")).alias("sp_dp"),
    )

    def rho(sp, ca, cb):
        nd = F.col("n").cast("double")
        num = nd * F.col(sp).cast("double") - F.col(f"s_{ca}").cast(
            "double"
        ) * F.col(f"s_{cb}").cast("double")
        da = nd * F.col(f"ss_{ca}").cast("double") - F.col(f"s_{ca}").cast(
            "double"
        ) * F.col(f"s_{ca}").cast("double")
        db = nd * F.col(f"ss_{cb}").cast("double") - F.col(f"s_{cb}").cast(
            "double"
        ) * F.col(f"s_{cb}").cast("double")
        return F.round(num / F.sqrt(da * db), 6)

    out = sums.select(
        "n",
        rho("sp_qd", "quantity", "discount").alias("rho_qty_discount"),
        rho("sp_qp", "quantity", "price").alias("rho_qty_price"),
        rho("sp_dp", "discount", "price").alias("rho_discount_price"),
    )
    return out


SQL_LINEITEM_SPEARMAN = """
WITH base AS (
  SELECT CAST(l_quantity AS BIGINT) AS quantity,
         CAST(round(l_discount * 100) AS BIGINT) AS discount,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price
  FROM lineitem),
rq AS (
  SELECT v AS quantity,
         CAST(2 * COALESCE(sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS BIGINT) AS r_quantity
  FROM (SELECT quantity AS v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1)),
rd AS (
  SELECT v AS discount,
         CAST(2 * COALESCE(sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS BIGINT) AS r_discount
  FROM (SELECT discount AS v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1)),
rp AS (
  SELECT v AS price,
         CAST(2 * COALESCE(sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS BIGINT) AS r_price
  FROM (SELECT price AS v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1)),
j AS (
  SELECT r_quantity, r_discount, r_price
  FROM base JOIN rq USING(quantity) JOIN rd USING(discount) JOIN rp USING(price)),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r_quantity) AS BIGINT) AS s_quantity,
         CAST(sum(r_quantity * r_quantity) AS BIGINT) AS ss_quantity,
         CAST(sum(r_discount) AS BIGINT) AS s_discount,
         CAST(sum(r_discount * r_discount) AS BIGINT) AS ss_discount,
         CAST(sum(r_price) AS BIGINT) AS s_price,
         CAST(sum(r_price * r_price) AS BIGINT) AS ss_price,
         CAST(sum(r_quantity * r_discount) AS BIGINT) AS sp_qd,
         CAST(sum(r_quantity * r_price) AS BIGINT) AS sp_qp,
         CAST(sum(r_discount * r_price) AS BIGINT) AS sp_dp
  FROM j)
SELECT n,
       round((CAST(n AS DOUBLE) * sp_qd - CAST(s_quantity AS DOUBLE) * s_discount)
             / sqrt((CAST(n AS DOUBLE) * ss_quantity - CAST(s_quantity AS DOUBLE) * s_quantity)
                    * (CAST(n AS DOUBLE) * ss_discount - CAST(s_discount AS DOUBLE) * s_discount)), 6)
         AS rho_qty_discount,
       round((CAST(n AS DOUBLE) * sp_qp - CAST(s_quantity AS DOUBLE) * s_price)
             / sqrt((CAST(n AS DOUBLE) * ss_quantity - CAST(s_quantity AS DOUBLE) * s_quantity)
                    * (CAST(n AS DOUBLE) * ss_price - CAST(s_price AS DOUBLE) * s_price)), 6)
         AS rho_qty_price,
       round((CAST(n AS DOUBLE) * sp_dp - CAST(s_discount AS DOUBLE) * s_price)
             / sqrt((CAST(n AS DOUBLE) * ss_discount - CAST(s_discount AS DOUBLE) * s_discount)
                    * (CAST(n AS DOUBLE) * ss_price - CAST(s_price AS DOUBLE) * s_price)), 6)
         AS rho_discount_price
FROM sums
"""


def q_events_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test (Mantel-Cox) comparing time-to-first-purchase
    between two hash-assigned arms — the survival-analysis hypothesis
    test that pairs with events_survival's KM curve, run as an A/A
    placebo (hash arms share one survival law, so the test MUST accept;
    the same gate discipline as events_did): at every distinct event
    time, observed arm-A conversions vs the hypergeometric expectation
    d*n_a/n with variance d*(n_a/n)*(1-n_a/n)*(n-d)/(n-1).  Risk sets
    are descending cumulative INTEGER counts over the duration blocks
    (the KM pattern), censoring at the stream horizon identical to
    events_survival."""
    from mcpvectordb_spark.operators.dedup import hexint48

    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("fd"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("cd"),
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("maxd"))
    users = spans.crossJoin(F.broadcast(horizon)).select(
        F.pmod(hexint48(F.col("user_id").cast("string")), F.lit(2)).alias("arm"),
        F.when(F.col("cd").isNotNull(), F.datediff("cd", "fd"))
        .otherwise(F.datediff("maxd", "fd"))
        .alias("dur"),
        F.col("cd").isNotNull().cast("long").alias("event"),
    )
    per = users.groupBy("dur").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("tot_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("tot_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("event")).otherwise(0)).alias("d_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("event")).otherwise(0)).alias("d_b"),
    )
    w_desc = Window.orderBy(F.col("dur").asc()).rowsBetween(
        0, Window.unboundedFollowing
    )
    risk = per.select(
        "dur",
        "d_a",
        "d_b",
        F.sum("tot_a").over(w_desc).alias("n_a"),
        F.sum("tot_b").over(w_desc).alias("n_b"),
    ).filter((F.col("d_a") + F.col("d_b")) > 0)
    nd = (F.col("n_a") + F.col("n_b")).cast("double")
    dd_ = (F.col("d_a") + F.col("d_b")).cast("double")
    fa = F.col("n_a").cast("double") / nd
    e_a = dd_ * fa
    v = F.when(
        nd > 1,
        dd_ * fa * (F.lit(1.0) - fa) * (nd - dd_) / (nd - 1),
    ).otherwise(F.lit(0.0))
    agg = risk.agg(
        F.sum("d_a").alias("o_a"),
        F.sum(e_a).alias("e_a"),
        F.sum(v).alias("v"),
    )
    z = (F.col("o_a").cast("double") - F.col("e_a")) / F.sqrt("v")
    tot = users.groupBy().pivot("arm", [0, 1]).count()
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("0").alias("n_users_a"),
        F.col("1").alias("n_users_b"),
        F.col("o_a").cast("long").alias("observed_a"),
        F.round("e_a", 6).alias("expected_a"),
        F.round("v", 6).alias("variance"),
        F.round(z, 6).alias("z"),
        F.round(z * z, 6).alias("chi2"),
        (F.abs(z) > 1.96).alias("significant"),
    )


SQL_EVENTS_LOGRANK = f"""
WITH spans AS (
  SELECT user_id,
         min(CAST(ts AS DATE)) AS fd,
         min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END) AS cd
  FROM events GROUP BY 1),
horizon AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events),
users AS (
  SELECT {_sql_hex48("CAST(user_id AS VARCHAR)")} % 2 AS arm,
         CASE WHEN cd IS NOT NULL THEN cd - fd ELSE maxd - fd END AS dur,
         CAST(cd IS NOT NULL AS BIGINT) AS event
  FROM spans CROSS JOIN horizon),
per AS (
  SELECT dur,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tot_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tot_b,
         CAST(sum(CASE WHEN arm = 0 THEN event ELSE 0 END) AS BIGINT) AS d_a,
         CAST(sum(CASE WHEN arm = 1 THEN event ELSE 0 END) AS BIGINT) AS d_b
  FROM users GROUP BY 1),
risk AS (
  SELECT dur, d_a, d_b,
         CAST(sum(tot_a) OVER (ORDER BY dur ASC
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_a,
         CAST(sum(tot_b) OVER (ORDER BY dur ASC
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_b
  FROM per QUALIFY d_a + d_b > 0),
agg AS (
  SELECT CAST(sum(d_a) AS BIGINT) AS o_a,
         sum(CAST(d_a + d_b AS DOUBLE) * (CAST(n_a AS DOUBLE) / (n_a + n_b))) AS e_a,
         sum(CASE WHEN n_a + n_b > 1
             THEN CAST(d_a + d_b AS DOUBLE)
                  * (CAST(n_a AS DOUBLE) / (n_a + n_b))
                  * (1.0 - CAST(n_a AS DOUBLE) / (n_a + n_b))
                  * (CAST(n_a + n_b AS DOUBLE) - (d_a + d_b))
                  / (CAST(n_a + n_b AS DOUBLE) - 1)
             ELSE 0.0 END) AS v
  FROM risk),
tots AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM users)
SELECT t.na AS n_users_a, t.nb AS n_users_b,
       a.o_a AS observed_a,
       round(a.e_a, 6) AS expected_a,
       round(a.v, 6) AS variance,
       round((CAST(a.o_a AS DOUBLE) - a.e_a) / sqrt(a.v), 6) AS z,
       round(((CAST(a.o_a AS DOUBLE) - a.e_a) / sqrt(a.v))
             * ((CAST(a.o_a AS DOUBLE) - a.e_a) / sqrt(a.v)), 6) AS chi2,
       abs((CAST(a.o_a AS DOUBLE) - a.e_a) / sqrt(a.v)) > 1.96 AS significant
FROM agg a CROSS JOIN tots t
"""


def q_events_coxph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox proportional-hazards fit (binary covariate = hash arm,
    Breslow ties) for time-to-first-purchase — the regression upgrade
    over events_logrank's test: 8 Newton steps on the partial
    likelihood, where a BINARY covariate collapses every risk-set sum
    to counts (sum e^(bx) over the risk set = n_b + n_a*e^b), so each
    step is one agg over the ~30-row event-time table joined with the
    1-row beta state:

        U(b) = sum_t [d_a - d * p_t],  I(b) = sum_t d * p_t * (1 - p_t),
        p_t = n_a e^b / (n_b + n_a e^b),  b <- b + U/I

    On the A/A hash split the fitted hazard ratio must sit near 1 and
    z inside +/-1.96 (the placebo-gate discipline).  The oracle unrolls
    all 8 Newton steps as chained CTEs over the same MATERIALIZED risk
    table."""
    from mcpvectordb_spark.operators.dedup import hexint48

    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("fd"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("cd"),
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("maxd"))
    users = spans.crossJoin(F.broadcast(horizon)).select(
        F.pmod(hexint48(F.col("user_id").cast("string")), F.lit(2)).alias("arm"),
        F.when(F.col("cd").isNotNull(), F.datediff("cd", "fd"))
        .otherwise(F.datediff("maxd", "fd"))
        .alias("dur"),
        F.col("cd").isNotNull().cast("long").alias("event"),
    )
    per = users.groupBy("dur").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("tot_b0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("tot_a1"),
        F.sum(F.when(F.col("arm") == 1, F.col("event")).otherwise(0)).alias("d_a"),
        F.sum(F.col("event")).alias("d"),
    )
    w_desc = Window.orderBy(F.col("dur").asc()).rowsBetween(
        0, Window.unboundedFollowing
    )
    risk = per.select(
        "dur",
        "d_a",
        "d",
        F.sum("tot_a1").over(w_desc).alias("n_a"),
        F.sum("tot_b0").over(w_desc).alias("n_b"),
    ).filter(F.col("d") > 0).localCheckpoint(eager=False)

    beta = spark.range(1).select(F.lit(0.0).alias("b"))
    for _ in range(8):
        p = (
            F.col("n_a").cast("double")
            * F.exp(F.col("b"))
            / (F.col("n_b").cast("double") + F.col("n_a").cast("double") * F.exp(F.col("b")))
        )
        step = risk.crossJoin(F.broadcast(beta)).agg(
            F.first("b").alias("b0"),
            F.sum(F.col("d_a").cast("double") - F.col("d").cast("double") * p).alias("u"),
            F.sum(
                F.col("d").cast("double") * p * (F.lit(1.0) - p)
            ).alias("i"),
        )
        beta = step.select((F.col("b0") + F.col("u") / F.col("i")).alias("b"))
    p = (
        F.col("n_a").cast("double")
        * F.exp(F.col("b"))
        / (F.col("n_b").cast("double") + F.col("n_a").cast("double") * F.exp(F.col("b")))
    )
    fin = risk.crossJoin(F.broadcast(beta)).agg(
        F.first("b").alias("beta"),
        F.sum(F.col("d").cast("double") * p * (F.lit(1.0) - p)).alias("i"),
    )
    return fin.select(
        F.round("beta", 6).alias("beta"),
        F.round(F.exp("beta"), 6).alias("hazard_ratio"),
        F.round(F.lit(1.0) / F.sqrt("i"), 6).alias("se"),
        F.round(F.col("beta") / (F.lit(1.0) / F.sqrt("i")), 6).alias("z"),
        (F.abs(F.col("beta") / (F.lit(1.0) / F.sqrt("i"))) > 1.96).alias(
            "significant"
        ),
    )


def _sql_coxph() -> str:
    base = f"""
WITH spans AS (
  SELECT user_id,
         min(CAST(ts AS DATE)) AS fd,
         min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END) AS cd
  FROM events GROUP BY 1),
horizon AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events),
users AS (
  SELECT {_sql_hex48("CAST(user_id AS VARCHAR)")} % 2 AS arm,
         CASE WHEN cd IS NOT NULL THEN cd - fd ELSE maxd - fd END AS dur,
         CAST(cd IS NOT NULL AS BIGINT) AS event
  FROM spans CROSS JOIN horizon),
per AS (
  SELECT dur,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tot_b0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tot_a1,
         CAST(sum(CASE WHEN arm = 1 THEN event ELSE 0 END) AS BIGINT) AS d_a,
         CAST(sum(event) AS BIGINT) AS d
  FROM users GROUP BY 1),
risk AS MATERIALIZED (
  SELECT dur, d_a, d,
         CAST(sum(tot_a1) OVER (ORDER BY dur ASC
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_a,
         CAST(sum(tot_b0) OVER (ORDER BY dur ASC
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_b
  FROM per QUALIFY d > 0),
b0 AS (SELECT CAST(0.0 AS DOUBLE) AS b)"""
    steps = []
    for t in range(1, 9):
        steps.append(f""",
b{t} AS MATERIALIZED (
  SELECT any_value(b) + sum(CAST(d_a AS DOUBLE)
           - CAST(d AS DOUBLE) * (CAST(n_a AS DOUBLE) * exp(b)
             / (CAST(n_b AS DOUBLE) + CAST(n_a AS DOUBLE) * exp(b))))
         / sum(CAST(d AS DOUBLE)
           * (CAST(n_a AS DOUBLE) * exp(b)
              / (CAST(n_b AS DOUBLE) + CAST(n_a AS DOUBLE) * exp(b)))
           * (1.0 - (CAST(n_a AS DOUBLE) * exp(b)
              / (CAST(n_b AS DOUBLE) + CAST(n_a AS DOUBLE) * exp(b))))) AS b
  FROM risk CROSS JOIN b{t-1})""")
    tail = """,
fin AS (
  SELECT any_value(b) AS beta,
         sum(CAST(d AS DOUBLE)
           * (CAST(n_a AS DOUBLE) * exp(b)
              / (CAST(n_b AS DOUBLE) + CAST(n_a AS DOUBLE) * exp(b)))
           * (1.0 - (CAST(n_a AS DOUBLE) * exp(b)
              / (CAST(n_b AS DOUBLE) + CAST(n_a AS DOUBLE) * exp(b))))) AS i
  FROM risk CROSS JOIN b8)
SELECT round(beta, 6) AS beta,
       round(exp(beta), 6) AS hazard_ratio,
       round(1.0 / sqrt(i), 6) AS se,
       round(beta / (1.0 / sqrt(i)), 6) AS z,
       abs(beta / (1.0 / sqrt(i))) > 1.96 AS significant
FROM fin"""
    return base + "".join(steps) + tail


SQL_EVENTS_COXPH = _sql_coxph()


def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness and memory (Goh & Barabasi 2008) per
    event type: B = (sigma - mu)/(sigma + mu) of the inter-event
    intervals (B = -1 periodic, 0 Poisson, -> 1 bursty) and the memory
    coefficient M = corr(delta_i, delta_{i+1}) — TOGETHER they separate
    heavy-tailed gaps from correlated clustering, which the count-based
    Fano factor (events_dispersion) cannot distinguish.  Intervals are
    exact integer seconds from one ordered lead() per type; both
    statistics are moment algebra over (delta, next_delta) pairs."""
    ev = load_table(spark, sf_dir, "events")
    d2 = ev.select(
        "event_type",
        F.unix_timestamp("ts").alias("t"),
        "event_id",
    ).withColumn(
        "dt", F.lead("t").over(Window.partitionBy("event_type").orderBy("t", "event_id")) - F.col("t")
    ).withColumn(
        "dt2",
        F.lead("dt").over(Window.partitionBy("event_type").orderBy("t", "event_id")),
    ).filter(F.col("dt").isNotNull())
    mom = d2.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dt").alias("s"),
        F.sum(F.col("dt") * F.col("dt")).alias("ss"),
        F.count("dt2").alias("np"),
        F.sum(F.when(F.col("dt2").isNotNull(), F.col("dt"))).alias("sa"),
        F.sum(F.when(F.col("dt2").isNotNull(), F.col("dt") * F.col("dt"))).alias("saa"),
        F.sum("dt2").alias("sb"),
        F.sum(F.col("dt2") * F.col("dt2")).alias("sbb"),
        F.sum(F.col("dt") * F.col("dt2")).alias("sab"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s").cast("double") / nd
    sig = F.sqrt(
        (nd * F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s"))
        / (nd * (nd - 1))
    )
    b = (sig - mu) / (sig + mu)
    npd = F.col("np").cast("double")
    mnum = npd * F.col("sab").cast("double") - F.col("sa").cast("double") * F.col("sb")
    mden = F.sqrt(
        (npd * F.col("saa").cast("double") - F.col("sa").cast("double") * F.col("sa"))
        * (npd * F.col("sbb").cast("double") - F.col("sb").cast("double") * F.col("sb"))
    )
    return mom.select(
        "event_type",
        "n",
        F.round(mu, 6).alias("mean_gap_s"),
        F.round(sig, 6).alias("sd_gap_s"),
        F.round(b, 6).alias("burstiness"),
        F.round(mnum / mden, 6).alias("memory"),
    )


SQL_EVENTS_INTERARRIVAL = """
WITH seq AS (
  SELECT event_type,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
         event_id
  FROM events),
d AS (
  SELECT event_type,
         lead(t) OVER w - t AS dt,
         lead(t, 2) OVER w - lead(t) OVER w AS dt2
  FROM seq
  WINDOW w AS (PARTITION BY event_type ORDER BY t, event_id)),
d2 AS (SELECT * FROM d WHERE dt IS NOT NULL),
mom AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dt) AS BIGINT) AS s,
         CAST(sum(dt * dt) AS BIGINT) AS ss,
         CAST(count(dt2) AS BIGINT) AS np,
         CAST(sum(CASE WHEN dt2 IS NOT NULL THEN dt END) AS BIGINT) AS sa,
         CAST(sum(CASE WHEN dt2 IS NOT NULL THEN dt * dt END) AS BIGINT) AS saa,
         CAST(sum(dt2) AS BIGINT) AS sb,
         CAST(sum(dt2 * dt2) AS BIGINT) AS sbb,
         CAST(sum(dt * dt2) AS BIGINT) AS sab
  FROM d2 GROUP BY 1)
SELECT event_type, n,
       round(CAST(s AS DOUBLE) / n, 6) AS mean_gap_s,
       round(sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) AS sd_gap_s,
       round((sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
              - CAST(s AS DOUBLE) / n)
             / (sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                + CAST(s AS DOUBLE) / n), 6) AS burstiness,
       round((CAST(np AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
             / sqrt((CAST(np AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
                    * (CAST(np AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)), 6)
         AS memory
FROM mom
"""


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostics (operators/skew.py::skew_report):
    top-10 heaviest l_suppkey values in lineitem with share / cumulative
    share plus the Gini coefficient of the full key distribution — the
    measurement that decides between AQE skew-split and explicit salting.
    The oracle replays the count + window arithmetic verbatim."""
    from mcpvectordb_spark.operators.skew import skew_report

    li = load_table(spark, sf_dir, "lineitem")
    out = skew_report(li, "l_suppkey", top_k=10)
    return out.select(
        F.col("key").cast("long").alias("key"),
        F.col("n").cast("long").alias("n"),
        F.col("rank").cast("long").alias("rank"),
        F.round("share", 6).alias("share"),
        F.round("cum_share", 6).alias("cum_share"),
        F.round("gini", 6).alias("gini"),
    )


SQL_KEY_SKEW_REPORT = """
WITH counts AS (SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS n_keys FROM counts),
ranked AS (
  SELECT key, n,
         row_number() OVER (ORDER BY n ASC, key ASC) AS arank,
         row_number() OVER (ORDER BY n DESC, key ASC) AS rank
  FROM counts),
gini AS (
  SELECT (2 * sum(arank * n) - (max(n_keys) + 1) * sum(n))
         / (max(n_keys) * sum(n)) AS gini
  FROM ranked, tot)
SELECT CAST(key AS BIGINT) AS key, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank,
       round(n / total, 6) AS share,
       round(sum(n) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / total, 6) AS cum_share,
       round(gini, 6) AS gini
FROM ranked, tot, gini
WHERE rank <= 10
"""


def q_parts_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-order clustering keys (operators/zorder.py::zorder_key —
    pure column-expression bit interleave, the layout step behind
    OPTIMIZE ZORDER) over (p_retailprice, p_size), 8 bits/dim.  The
    oracle unrolls the identical bucketize + interleave arithmetic, so
    the codegen'd F.aggregate fold is value-gated bit for bit."""
    from mcpvectordb_spark.operators.zorder import zorder_key

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    z = zorder_key(
        F.col("p_retailprice"), F.col("p_size"), (900.0, 1000.0), (1.0, 50.0), bits=8
    )
    return p.select("p_partkey", z.alias("zkey"))


def _sql_parts_zorder() -> str:
    ba = "least(greatest(CAST(round((p_retailprice - 900.0) / 100.0 * 255) AS BIGINT), 0), 255)"
    bb = "least(greatest(CAST(round((p_size - 1.0) / 49.0 * 255) AS BIGINT), 0), 255)"
    terms = " + ".join(
        f"((ba >> {i}) & 1) * {1 << (2 * i)} + ((bb >> {i}) & 1) * {1 << (2 * i + 1)}"
        for i in range(8)
    )
    return f"""
WITH b AS (SELECT p_partkey, {ba} AS ba, {bb} AS bb FROM part WHERE p_partkey < 200)
SELECT p_partkey, CAST({terms} AS BIGINT) AS zkey FROM b
"""


SQL_PARTS_ZORDER = _sql_parts_zorder()


def q_parts_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS authorities (operators/graph.py::hits_scores — mutual hub/
    authority reinforcement, L1-normalized, 4 iterations) on the directed
    supplier→part shipment graph: which parts are the strongest
    authorities given that good hubs (diversified suppliers) ship them.
    Edges = RECURRING relationships (>= 2 shipments — one-off pairs are
    noise and 66x the edge count); top-20 by (auth desc, node).  The
    oracle unrolls all 4 iterations."""
    from mcpvectordb_spark.operators.graph import hits_scores

    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    out = hits_scores(li, iters=4, loop_partitions=8)
    return (
        out.orderBy(F.col("auth").desc(), F.col("node").asc())
        .limit(20)
        .select("node", F.round("auth", 9).alias("auth"))
    )


def _sql_parts_hits() -> str:
    iters = "".join(
        f""",
a{i}r AS (SELECT t, sum(h) AS a_raw FROM e JOIN h{i - 1} USING (s) GROUP BY t),
a{i} AS (SELECT t, a_raw / (SELECT sum(a_raw) FROM a{i}r) AS a FROM a{i}r),
h{i}r AS (SELECT s, sum(a) AS h_raw FROM e JOIN a{i} USING (t) GROUP BY s),
h{i} AS (SELECT s, h_raw / (SELECT sum(h_raw) FROM h{i}r) AS h FROM h{i}r)"""
        for i in range(1, 5)
    )
    return f"""
WITH e AS (SELECT l_suppkey AS s, l_partkey AS t FROM lineitem
           GROUP BY 1, 2 HAVING count(*) >= 2),
h0 AS (SELECT DISTINCT s, 1.0 AS h FROM e){iters}
SELECT t AS node, round(a, 9) AS auth FROM a4
ORDER BY a DESC, t ASC LIMIT 20
"""


SQL_PARTS_HITS = _sql_parts_hits()


def q_parts_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label-propagation communities
    (operators/graph.py::label_propagation — most-frequent neighbor
    label, min-label ties, 4 rounds) on the co-purchase graph; output is
    the community-size histogram (communities with >= 3 members).  The
    oracle unrolls the 4 argmax rounds."""
    from mcpvectordb_spark.operators.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    labels = label_propagation(edges, rounds=4)
    return (
        labels.groupBy("lbl")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .filter(F.col("n_members") >= 3)
        .select(F.col("lbl").alias("community"), "n_members")
    )


def _sql_parts_communities() -> str:
    rounds = "".join(
        f""",
c{i} AS (
  SELECT e.t AS v, prev.lbl, count(*) AS c,
         row_number() OVER (PARTITION BY e.t ORDER BY count(*) DESC, prev.lbl ASC) AS rn
  FROM e JOIN l{i - 1} prev ON prev.v = e.s
  GROUP BY e.t, prev.lbl),
l{i} AS (SELECT v, lbl FROM c{i} WHERE rn = 1)"""
        for i in range(1, 5)
    )
    return f"""
WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
raw AS (
  SELECT a.p AS src, b.p AS dst
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2),
e AS (SELECT src AS s, dst AS t FROM raw UNION SELECT dst AS s, src AS t FROM raw),
l0 AS (SELECT DISTINCT s AS v, s AS lbl FROM e){rounds}
SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members
FROM l4 GROUP BY lbl HAVING count(*) >= 3
"""


SQL_PARTS_COMMUNITIES = _sql_parts_communities()


def q_events_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: median pairwise slope over
    hourly counts + median-residual intercept (breakdown point 29%, vs 0%
    for OLS — one corrupted hour cannot move it).  Pairs build as an
    equi-join on event_type with an in-key h<h' filter — bounded by
    hours² per type; the documented web-scale variant windows the pair
    set (repeated-median on a bounded lookback).  The oracle replays the
    same pairs and quantile_cont medians."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    hourly = hourly.localCheckpoint(eager=False)

    a = hourly.select("event_type", F.col("h").alias("h1"), F.col("n").alias("n1"))
    b = hourly.select("event_type", F.col("h").alias("h2"), F.col("n").alias("n2"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("h1") < F.col("h2"))
        .select(
            "event_type",
            ((F.col("n2") - F.col("n1")) / (F.col("h2") - F.col("h1"))).alias("slope"),
        )
    )
    med = slopes.groupBy("event_type").agg(
        F.percentile("slope", F.lit(0.5)).alias("slope")
    )
    resid = hourly.join(med, "event_type").groupBy("event_type").agg(
        F.percentile(F.col("n") - F.col("slope") * F.col("h"), F.lit(0.5)).alias("intercept"),
        F.first("slope").alias("slope"),
    )
    return resid.select(
        "event_type", F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
    )


SQL_EVENTS_THEILSEN = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2),
slopes AS (
  SELECT a.event_type, (b.n - a.n) / (b.h - a.h) AS slope
  FROM hourly a JOIN hourly b ON a.event_type = b.event_type AND a.h < b.h),
med AS (SELECT event_type, quantile_cont(slope, 0.5) AS slope FROM slopes GROUP BY 1),
resid AS (
  SELECT h.event_type, quantile_cont(h.n - m.slope * h.h, 0.5) AS intercept,
         max(m.slope) AS slope
  FROM hourly h JOIN med m USING (event_type) GROUP BY 1)
SELECT event_type, round(slope, 6) AS slope, round(intercept, 6) AS intercept
FROM resid
"""


def q_orders_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the orders⋈customer join view
    (operators/ivm.py::incremental_join_delta — counting-free delta
    algebra, four delta-vs-base joins, NEVER recomputes the view) under a
    CDC batch: orders with o_orderkey%97=0 get repriced ×1.1, customers
    with c_custkey%89=0 get a segment change.  The oracle computes the
    ground-truth delta the expensive way — (A'⋈B') EXCEPT (A⋈B) both
    directions — so green parity proves the delta algebra exact."""
    from mcpvectordb_spark.operators.ivm import incremental_join_delta

    a = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    da = a.filter(F.col("o_orderkey") % 97 == 0)
    ia = da.withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
    b = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    db = b.filter(F.col("c_custkey") % 89 == 0)
    ib = db.withColumn("c_mktsegment", F.concat("c_mktsegment", F.lit("*")))

    delta = incremental_join_delta(
        a, ia, da, b, ib, db, "o_custkey", "c_custkey", "o_orderkey", "c_custkey"
    )
    return delta.select(
        "op", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"),
        "c_custkey", "c_mktsegment",
    )


SQL_ORDERS_IVM = """
WITH a AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
da AS (SELECT * FROM a WHERE o_orderkey % 97 = 0),
ia AS (SELECT o_orderkey, o_custkey, o_totalprice * 1.1 AS o_totalprice FROM da),
a2 AS (SELECT * FROM a WHERE o_orderkey % 97 <> 0 UNION ALL SELECT * FROM ia),
b AS (SELECT c_custkey, c_mktsegment FROM customer),
db AS (SELECT * FROM b WHERE c_custkey % 89 = 0),
ib AS (SELECT c_custkey, c_mktsegment || '*' AS c_mktsegment FROM db),
b2 AS (SELECT * FROM b WHERE c_custkey % 89 <> 0 UNION ALL SELECT * FROM ib),
v  AS (SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_mktsegment
       FROM a JOIN b ON o_custkey = c_custkey),
v2 AS (SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_mktsegment
       FROM a2 JOIN b2 ON o_custkey = c_custkey),
ins AS (SELECT * FROM v2 EXCEPT SELECT * FROM v),
del AS (SELECT * FROM v EXCEPT SELECT * FROM v2)
SELECT 'ins' AS op, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
       c_custkey, c_mktsegment FROM ins
UNION ALL
SELECT 'del' AS op, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
       c_custkey, c_mktsegment FROM del
"""


def q_events_ewma_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE infinite-horizon EWMA (s_t = α·x_t + (1-α)·s_{t-1},
    s_1 = x_1) per event type — a scan-with-carried-state computation SQL
    cannot window directly.  Spark runs it as an O(L) higher-order
    F.aggregate fold over the per-key sorted series (collect_list +
    array_sort; per-key state bounded by series length, the same contract
    as sessionization).  The oracle replays the O(L²) closed form
    s_t = α·Σ_{i=2..t}(1-α)^{t-i}·x_i + (1-α)^{t-1}·x_1 with a rank
    self-join, so the fold is value-proven against the definition."""
    alpha = 0.3
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))

    arr = hourly.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("h", "n"))).alias("xs")
    )
    fold = F.aggregate(
        F.col("xs"),
        F.array().cast("array<double>"),
        lambda acc, e: F.when(F.size(acc) == 0, F.array(e["n"])).otherwise(
            F.concat(
                acc,
                F.array(
                    F.lit(alpha) * e["n"]
                    + F.lit(1.0 - alpha) * F.element_at(acc, -1)
                ),
            )
        ),
    )
    return (
        arr.withColumn("sm", fold)
        .select("event_type", F.posexplode(F.arrays_zip("xs", "sm")))
        .select(
            "event_type",
            F.col("col.xs.h").alias("h"),
            F.col("col.xs.n").cast("long").alias("n"),
            F.round(F.col("col.sm"), 6).alias("ewma"),
        )
    )


SQL_EVENTS_EWMA_RECURSIVE = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, h, n,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM hourly)
SELECT a.event_type, a.h, CAST(a.n AS BIGINT) AS n,
       round(sum(CASE WHEN b.rk = 1 THEN power(0.7, a.rk - 1) * b.n
                      ELSE 0.3 * power(0.7, a.rk - b.rk) * b.n END), 6) AS ewma
FROM ranked a JOIN ranked b
  ON a.event_type = b.event_type AND b.rk <= a.rk
GROUP BY a.event_type, a.h, a.n
"""


def q_parts_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank / random walk with restart (Haveliwala 2002;
    operators/graph.py::pagerank(teleport=)) on the symmetrized recurring
    supplier→part graph: teleport mass restarts at suppliers 1-4
    (namespaced negative so supplier and part keys cannot collide), and
    the top-15 PART nodes are the parts most proximate to those
    suppliers — graph-proximity recommendations, complementing the
    co-occurrence cosine of item_recs.  The oracle unrolls all 6
    iterations with the same seed-concentrated teleport vector."""
    from mcpvectordb_spark.operators.graph import pagerank

    sp = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            (-F.col("l_suppkey")).alias("s"), F.col("l_partkey").alias("t")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= 2)
    )
    edges = sp.select(F.col("s").alias("src"), F.col("t").alias("dst"), "n").unionByName(
        sp.select(F.col("t").alias("src"), F.col("s").alias("dst"), "n")
    )
    seeds = spark.range(1, 5).select((-F.col("id")).alias("node"))
    pr = pagerank(
        edges, iterations=6, damping=0.85, weight_col="n",
        loop_partitions=8, teleport=seeds,
    )
    return (
        pr.filter(F.col("node") > 0)
        .select("node", F.round("rank", 9).alias("ppr"))
        .orderBy(F.col("ppr").desc(), F.col("node").asc())
        .limit(15)
    )


def _sql_parts_ppr() -> str:
    steps = []
    prev = "pr0"
    for i in range(1, 7):
        steps.append(f""",
pr{i} AS (
  SELECT tp.node, 0.15 * tp.tp + 0.85 * coalesce(agg{i}.im, 0.0) AS pr
  FROM tp LEFT JOIN (
    SELECT dst AS node, sum(pr * p) AS im
    FROM trans JOIN {prev} ON {prev}.node = trans.src GROUP BY dst
  ) agg{i} USING (node))""")
        prev = f"pr{i}"
    return f"""
WITH sp AS (
  SELECT -l_suppkey AS s, l_partkey AS t, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2 HAVING count(*) >= 2),
e AS (SELECT s AS src, t AS dst, n FROM sp
      UNION ALL SELECT t AS src, s AS dst, n FROM sp),
nodes AS (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst AS node FROM e),
seeds AS (SELECT node FROM nodes WHERE node IN (-1, -2, -3, -4)),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS n_seeds FROM seeds),
tp AS (
  SELECT nodes.node,
         CASE WHEN seeds.node IS NOT NULL THEN 1.0 / n_seeds ELSE 0.0 END AS tp
  FROM nodes LEFT JOIN seeds USING (node), ns),
outw AS (SELECT src, sum(n) AS ow FROM e GROUP BY src),
trans AS (SELECT e.src, e.dst, e.n * 1.0 / outw.ow AS p FROM e JOIN outw USING (src)),
pr0 AS (SELECT node, tp AS pr FROM tp){"".join(steps)}
SELECT node, round(pr, 9) AS ppr FROM {prev}
WHERE node > 0 ORDER BY ppr DESC, node ASC LIMIT 15
"""


SQL_PARTS_PPR = _sql_parts_ppr()


def q_orders_agg_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the per-customer (count, sum) aggregate
    view under the orders CDC batch (operators/ivm.py::
    incremental_agg_delta — signed-delta aggregation over the DELTA only
    + a keyed join into the old view; the base table is never rescanned
    on refresh).  Emits the post-update rows for touched customers; the
    oracle recomputes those rows from the full post-state the expensive
    way.  Sums round at 4dp: the ×1.1 reprice makes 3-decimal values, so
    4dp is exact and immune to half-boundary double drift between the
    incremental and recomputed sums."""
    from mcpvectordb_spark.operators.ivm import base_agg_view, incremental_agg_delta

    a = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    da = a.filter(F.col("o_orderkey") % 97 == 0)
    ia = da.withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
    view = base_agg_view(a, ["o_custkey"], ["o_totalprice"])
    out = incremental_agg_delta(view, ia, da, ["o_custkey"], ["o_totalprice"])
    return out.select(
        "o_custkey",
        F.col("__cnt").cast("long").alias("cnt"),
        F.round("sum_o_totalprice", 4).alias("sum_price"),
    )


SQL_ORDERS_AGG_IVM = """
WITH a AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
da AS (SELECT * FROM a WHERE o_orderkey % 97 = 0),
ia AS (SELECT o_orderkey, o_custkey, o_totalprice * 1.1 AS o_totalprice FROM da),
a2 AS (SELECT * FROM a WHERE o_orderkey % 97 <> 0 UNION ALL SELECT * FROM ia),
touched AS (SELECT DISTINCT o_custkey FROM da)
SELECT a2.o_custkey, CAST(count(*) AS BIGINT) AS cnt,
       round(sum(o_totalprice), 4) AS sum_price
FROM a2 JOIN touched USING (o_custkey)
GROUP BY a2.o_custkey
"""


def q_parts_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the recurring supplier↔part graph (operators/graph.py::
    kcore — 4 synchronous peeling rounds, deterministic): the maximal
    subgraph where every node keeps >= 3 recurring trading partners.
    Output = surviving PART nodes with their in-core degree.  The oracle
    unrolls the identical 4 peel rounds."""
    from mcpvectordb_spark.operators.graph import kcore

    sp = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy((-F.col("l_suppkey")).alias("src"), F.col("l_partkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
    )
    out = kcore(sp, k=3, rounds=4)
    return out.filter(F.col("node") > 0).select(
        "node", F.col("deg").cast("long").alias("deg")
    )


def _sql_parts_kcore() -> str:
    rounds = "".join(
        f""",
k{i} AS (SELECT s FROM e{i - 1} GROUP BY s HAVING count(*) >= 3),
e{i} AS (
  SELECT e.s, e.t FROM e{i - 1} e
  JOIN k{i} a ON a.s = e.s JOIN k{i} b ON b.s = e.t)"""
        for i in range(1, 5)
    )
    return f"""
WITH sp AS (
  SELECT -l_suppkey AS src, l_partkey AS dst
  FROM lineitem GROUP BY 1, 2 HAVING count(*) >= 2),
e0 AS (SELECT src AS s, dst AS t FROM sp UNION SELECT dst AS s, src AS t FROM sp){rounds}
SELECT s AS node, CAST(count(*) AS BIGINT) AS deg
FROM e4 WHERE s > 0 GROUP BY s
"""


SQL_PARTS_KCORE = _sql_parts_kcore()


def q_events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorization + robust scaling of event values: clamp to
    the exact [p05, p95] band, then scale by (median, IQR) — the standard
    outlier-immune feature-engineering normalizer.  Two keyed exact
    percentile aggregations + one broadcast join; at 100 TB swap the
    exact percentiles for the mergeable histogram sketch
    (sketches.histogram_quantiles), same as the MAD/WOE operators.
    Output: per type, the clamp band and the scaled mean/min/max of the
    transformed values (aggregate gate keeps the row count bounded)."""
    ev = load_table(spark, sf_dir, "events")
    bands = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("p05"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
        F.percentile("value", F.lit(0.5)).alias("med"),
        (
            F.percentile("value", F.lit(0.75)) - F.percentile("value", F.lit(0.25))
        ).alias("iqr"),
    )
    w = ev.join(F.broadcast(bands), "event_type").select(
        "event_type", "p05", "p95", "med", "iqr",
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")).alias("wv"),
    )
    return (
        w.groupBy("event_type")
        .agg(
            F.round(F.first("p05"), 6).alias("p05"),
            F.round(F.first("p95"), 6).alias("p95"),
            F.round(F.avg((F.col("wv") - F.col("med")) / F.col("iqr")), 6).alias("scaled_mean"),
            F.round(F.min((F.col("wv") - F.col("med")) / F.col("iqr")), 6).alias("scaled_min"),
            F.round(F.max((F.col("wv") - F.col("med")) / F.col("iqr")), 6).alias("scaled_max"),
        )
    )


SQL_EVENTS_WINSORIZE = """
WITH bands AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p05,
         quantile_cont(value, 0.95) AS p95,
         quantile_cont(value, 0.5) AS med,
         quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
  FROM events GROUP BY 1),
w AS (
  SELECT e.event_type, b.p05, b.p95, b.med, b.iqr,
         least(greatest(e.value, b.p05), b.p95) AS wv
  FROM events e JOIN bands b USING (event_type))
SELECT event_type, round(max(p05), 6) AS p05, round(max(p95), 6) AS p95,
       round(avg((wv - med) / iqr), 6) AS scaled_mean,
       round(min((wv - med) / iqr), 6) AS scaled_min,
       round(max((wv - med) / iqr), 6) AS scaled_max
FROM w GROUP BY event_type
"""


def q_events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-event curve (Kaplan & Meier 1958) for
    time-to-first-purchase: duration = days from a user's first event to
    their first 'purchase'; users who never purchase are CENSORED at the
    stream horizon (their conversion time is only known to exceed the
    observation — dropping them would bias conversion times short, the
    whole point of the product-limit estimator over naive averages).
    S(t) = Π_{tᵢ<=t} (1 − dᵢ/nᵢ) runs as exp(Σ ln·) over a cumulative
    window — one pass over the per-duration risk table, no iteration.
    Steps are the durations with 0 < d < n (declared spec; a d = n step
    would drive S to exactly 0)."""
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("fd"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("cd"),
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("maxd"))
    users = spans.crossJoin(F.broadcast(horizon)).select(
        F.when(F.col("cd").isNotNull(), F.datediff("cd", "fd"))
        .otherwise(F.datediff("maxd", "fd"))
        .alias("dur"),
        F.col("cd").isNotNull().alias("converted"),
    )
    per_dur = users.groupBy("dur").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("converted").cast("long")).alias("d"),
    )
    w_desc = Window.orderBy(F.col("dur").asc()).rowsBetween(0, Window.unboundedFollowing)
    risk = per_dur.withColumn("n", F.sum("total").over(w_desc)).filter(
        (F.col("d") > 0) & (F.col("d") < F.col("n"))
    )
    w_cum = Window.orderBy(F.col("dur").asc()).rowsBetween(Window.unboundedPreceding, 0)
    return risk.select(
        F.col("dur").cast("long").alias("dur"),
        F.col("d").cast("long").alias("d"),
        F.col("n").cast("long").alias("n"),
        F.round(
            F.exp(F.sum(F.log(1.0 - F.col("d") / F.col("n"))).over(w_cum)), 6
        ).alias("survival"),
    )


SQL_EVENTS_SURVIVAL = """
WITH spans AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS fd,
         min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END) AS cd
  FROM events GROUP BY 1),
horizon AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events),
users AS (
  SELECT CASE WHEN cd IS NOT NULL THEN datediff('day', fd, cd)
              ELSE datediff('day', fd, maxd) END AS dur,
         (cd IS NOT NULL) AS converted
  FROM spans, horizon),
per_dur AS (
  SELECT dur, count(*) AS total,
         CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM users GROUP BY 1),
risk AS (
  SELECT dur, d,
         sum(total) OVER (ORDER BY dur ASC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
  FROM per_dur)
SELECT CAST(dur AS BIGINT) AS dur, d, CAST(n AS BIGINT) AS n,
       round(exp(sum(ln(1.0 - d * 1.0 / n))
                 OVER (ORDER BY dur ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
         AS survival
FROM risk WHERE d > 0 AND d < n
"""


def q_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance feedback (operators/prf.py): BM25 top-10
    feedback docs → RM1 relevance model → λ=0.5 interpolation with the
    query MLE → weighted-BM25 second pass.  The oracle replays all four
    stages over the same posting list."""
    from mcpvectordb_spark.operators.prf import rm3_topk

    docs = load_table(spark, sf_dir, "documents")
    hits = rm3_topk(docs, SEARCH_QUERY, 10, "doc_id", "text")
    return hits.select("doc", F.round("score", 6).alias("score"))


SQL_RM3_EXPANSION = f"""
WITH {_SQL_BM25_CTES},
feedback AS (SELECT doc FROM bm ORDER BY score DESC, doc LIMIT 10),
rm1 AS (
  SELECT term, sum(tf * 1.0 / dl) / 10.0 AS p_rm1
  FROM posting JOIN feedback USING(doc) JOIN lens USING(doc)
  GROUP BY term),
top_e AS (SELECT term, p_rm1 FROM rm1 ORDER BY p_rm1 DESC, term LIMIT 10),
qdist AS (SELECT unnest(['batch','join','spark','window']) AS term, 0.25 AS p_q),
weights AS (
  SELECT coalesce(q.term, e.term) AS term,
         0.5 * coalesce(p_q, 0.0) + 0.5 * coalesce(p_rm1, 0.0) AS wt
  FROM qdist q FULL OUTER JOIN top_e e ON q.term = e.term),
scored AS (
  SELECT doc, sum( wt * ln(1 + (n - df + 0.5)/(df + 0.5))
                   * tf*(1.2+1)/(tf + 1.2*(1-0.75+0.75*dl/avgdl)) ) AS score
  FROM posting JOIN weights USING(term) JOIN dfreq USING(term) JOIN lens USING(doc), stats
  GROUP BY doc)
SELECT doc, round(score, 6) AS score FROM scored ORDER BY score DESC, doc LIMIT 10
"""


def q_knn_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-10 (operators/mmr.py): exact-KNN top-100
    candidate pool, then the λ=0.7 greedy unrolled in-plan — the oracle
    replays each selection step as a chained CTE."""
    from mcpvectordb_spark.operators.mmr import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _q_vec(spark, sf_dir)
    pool = knn_topk(
        emb.filter(F.col("vec_id") != QUERY_VEC_ID), qv, 100,
        tie_col="vec_id", impl="expr",
    )
    out = mmr_rerank(pool, 10, lam=0.7, id_col="vec_id", vec_col="embedding", rel_col="score")
    return out.select("step", F.col("id").alias("vec_id"), F.round("mmr", 6).alias("mmr"))


def _sql_mmr_steps(k: int = 10, lam: float = 0.7) -> tuple[str, str]:
    steps = []
    prev = "s1"
    for i in range(2, k + 1):
        steps.append(
            f"""p{i} AS (
  SELECT {i} AS step, c.id, c.v,
         {lam}*c.rel - {1.0 - lam:.1f}*max({_sql_cos('c.v', 's.v')}) AS mmr
  FROM cands c, {prev} s
  WHERE c.id NOT IN (SELECT id FROM {prev})
  GROUP BY c.id, c.v, c.rel
  ORDER BY mmr DESC, c.id LIMIT 1),
s{i} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL SELECT * FROM p{i})"""
        )
        prev = f"s{i}"
    return ",\n".join(steps), prev


_MMR_STEPS, _MMR_LAST = _sql_mmr_steps()

SQL_KNN_MMR = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
cands AS MATERIALIZED (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v, {_sql_cos('CAST(embedding AS DOUBLE[])', 'qv')} AS rel
  FROM embeddings, q WHERE vec_id <> {QUERY_VEC_ID}
  ORDER BY rel DESC, vec_id LIMIT 100),
s1 AS (
  SELECT 1 AS step, id, v, 0.7*rel AS mmr
  FROM cands ORDER BY rel DESC, id LIMIT 1),
{_MMR_STEPS}
SELECT step, id AS vec_id, round(mmr, 6) AS mmr FROM {_MMR_LAST} ORDER BY step
"""


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 leg + vector leg fused with RRF (k0=60) —
    the reference's hybrid query (SURVEY §2.10 R2), fully re-expressed.

    The vector leg is restricted to embeddings whose vec_id has a matching
    document (semi-join): doc_id and vec_id are one id space only when the
    tables are row-aligned — at sf0.1 there are 5000 docs but 2000
    embeddings, so fusing unrestricted would mix id domains."""
    docs = load_table(spark, sf_dir, "documents")
    # reuse the SAME documents scan for the BM25 leg and the id-domain
    # semi-join (r03 verdict item 5): one cached relation, not two reads
    emb = load_table(spark, sf_dir, "embeddings").join(
        docs.select(F.col("doc_id").alias("vec_id")),
        "vec_id",
        "left_semi",
    )
    qv = _q_vec(spark, sf_dir)
    bm_leg = bm25_topk(docs, SEARCH_QUERY, 50, "doc_id", "text")
    vec_leg = knn_topk(emb, qv, 50, tie_col="vec_id").select(
        F.col("vec_id").alias("doc"), "score"
    )
    fused = rrf_topk([(bm_leg, "doc", "score"), (vec_leg, "doc", "score")], 10, k0=RRF_K0)
    return fused.select("doc", F.round("rrf_score", 6).alias("rrf_score"))


SQL_HYBRID_RRF = f"""
WITH {_SQL_BM25_CTES},
bmtop AS (SELECT doc, score FROM bm ORDER BY score DESC, doc LIMIT 50),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
vstop AS (
  SELECT vec_id AS doc, {_sql_cos('CAST(embedding AS DOUBLE[])', 'qv')} AS score
  FROM embeddings, q
  WHERE vec_id IN (SELECT doc_id FROM documents)
  ORDER BY score DESC, doc LIMIT 50),
br AS (SELECT doc, row_number() OVER (ORDER BY score DESC, doc) AS r FROM bmtop),
vr AS (SELECT doc, row_number() OVER (ORDER BY score DESC, doc) AS r FROM vstop)
SELECT COALESCE(br.doc, vr.doc) AS doc,
       round(COALESCE(1.0/({RRF_K0}+br.r), 0) + COALESCE(1.0/({RRF_K0}+vr.r), 0), 6) AS rrf_score
FROM br FULL OUTER JOIN vr ON br.doc = vr.doc
ORDER BY COALESCE(1.0/({RRF_K0}+br.r), 0) + COALESCE(1.0/({RRF_K0}+vr.r), 0) DESC,
         COALESCE(br.doc, vr.doc) LIMIT 10
"""


def q_hybrid_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search via convex score blending (α=0.6) over min-max
    normalized legs — the linear-combination reranker beside RRF
    (operators/hybrid.py::weighted_fuse_topk); same legs as hybrid_rrf."""
    from mcpvectordb_spark.operators.hybrid import weighted_fuse_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    qv = _q_vec(spark, sf_dir)
    bm_leg = bm25_topk(docs, SEARCH_QUERY, 50, "doc_id", "text")
    vec_leg = knn_topk(emb, qv, 50, tie_col="vec_id").select(
        F.col("vec_id").alias("doc"), "score"
    )
    fused = weighted_fuse_topk(
        vec_leg, bm_leg, k=10, alpha=0.6,
        id_cols=("doc", "doc"), score_cols=("score", "score"),
    )
    return fused.select("doc", F.round("blend_score", 6).alias("blend_score"))


SQL_HYBRID_WEIGHTED = f"""
WITH {_SQL_BM25_CTES},
bmtop AS (SELECT doc, score FROM bm ORDER BY score DESC, doc LIMIT 50),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
vstop AS (
  SELECT vec_id AS doc, {_sql_cos('CAST(embedding AS DOUBLE[])', 'qv')} AS score
  FROM embeddings, q
  WHERE vec_id IN (SELECT doc_id FROM documents)
  ORDER BY score DESC, doc LIMIT 50),
bn AS (SELECT doc, CASE WHEN max(score) OVER () = min(score) OVER () THEN 1.0
                        ELSE (score - min(score) OVER ()) / (max(score) OVER () - min(score) OVER ()) END AS ns
       FROM bmtop),
vn AS (SELECT doc, CASE WHEN max(score) OVER () = min(score) OVER () THEN 1.0
                        ELSE (score - min(score) OVER ()) / (max(score) OVER () - min(score) OVER ()) END AS ns
       FROM vstop)
SELECT COALESCE(vn.doc, bn.doc) AS doc,
       round(0.6 * COALESCE(vn.ns, 0) + 0.4 * COALESCE(bn.ns, 0), 6) AS blend_score
FROM vn FULL OUTER JOIN bn ON vn.doc = bn.doc
ORDER BY 0.6 * COALESCE(vn.ns, 0) + 0.4 * COALESCE(bn.ns, 0) DESC, COALESCE(vn.doc, bn.doc)
LIMIT 10
"""


# ===========================================================================
# 3. Store / metadata operators (documents table as the corpus)
# ===========================================================================

def q_orders_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the 25 part pairs most often ordered
    together.  Same sub-quadratic shape as the dedup inverted indexes —
    pairs explode per order (bounded by items-per-order², ~tens), never
    across the catalog; one keyed agg + distributed top-n.  Canonical
    (a < b) ordering halves the pair space and makes output total-ordered."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    pairs = a.join(b, "o").filter(F.col("pa") < F.col("pb"))
    return (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("pa").asc(), F.col("pb").asc())
        .limit(25)
    )


SQL_ORDERS_COPURCHASE = """
WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)
SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS n_orders
FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
GROUP BY a.p, b.p
ORDER BY n_orders DESC, pa ASC, pb ASC LIMIT 25
"""


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets (analytics.py::assoc_rules):
    support / confidence / lift for directed 2-itemset rules, top-50 by
    lift with a confidence-then-ids total-order tiebreak."""
    from mcpvectordb_spark.operators.analytics import assoc_rules

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    rules = assoc_rules(li, "l_orderkey", "l_partkey", min_pair_count=2, top_n=50)
    return rules.select(
        "antecedent", "consequent", "n_pair",
        F.round("support", 6).alias("support"),
        F.round("confidence", 6).alias("confidence"),
        F.round("lift", 6).alias("lift"),
    )


SQL_ASSOC_RULES = """
WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n_baskets FROM items),
item_n AS (SELECT p, CAST(count(*) AS BIGINT) AS n_item FROM items GROUP BY p),
pair_n AS (
  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS n_pair
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2),
directed AS (
  SELECT pa AS antecedent, pb AS consequent, n_pair FROM pair_n
  UNION ALL
  SELECT pb AS antecedent, pa AS consequent, n_pair FROM pair_n),
rules AS (
  SELECT antecedent, consequent, n_pair,
         n_pair / n_baskets AS support,
         n_pair * 1.0 / na.n_item AS confidence,
         n_pair * n_baskets / (na.n_item * nb.n_item) AS lift
  FROM directed
  JOIN item_n na ON na.p = antecedent
  JOIN item_n nb ON nb.p = consequent, n)
SELECT antecedent, consequent, n_pair,
       round(support, 6) AS support,
       round(confidence, 6) AS confidence,
       round(lift, 6) AS lift
FROM rules
ORDER BY lift DESC, confidence DESC, antecedent ASC, consequent ASC LIMIT 50
"""


def q_parts_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (10 fixed iterations, d=0.85) over the symmetric
    co-purchase graph of parts ordered together ≥2 times
    (operators/graph.py) — the oracle unrolls the identical power
    iteration as 10 chained CTEs."""
    from mcpvectordb_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    pair_n = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
    )
    edges = pair_n.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"), F.col("n_pair").alias("w")
    ).unionByName(
        pair_n.select(
            F.col("pb").alias("src"), F.col("pa").alias("dst"), F.col("n_pair").alias("w")
        )
    )
    # loop_partitions=8: the co-purchase graph's rank vector is tiny, so
    # the iteration pins a small fixed parallelism with AQE off (see
    # graph.pagerank — 2.1x on this query; leave None at web scale)
    pr = pagerank(edges, iterations=10, damping=0.85, weight_col="w", loop_partitions=8)
    return (
        pr.select("node", F.round("rank", 6).alias("pr"))
        .orderBy(F.desc("pr"), F.asc("node"))
        .limit(20)
    )


def _sql_pagerank_unrolled(iters: int = 10, d: float = 0.85) -> tuple[str, str]:
    steps = []
    prev = "pr0"
    for i in range(1, iters + 1):
        steps.append(
            f"""pr{i} AS (
  SELECT nodes.node, (1-{d})/n_nodes + {d}*coalesce(im, 0.0) AS pr
  FROM nodes LEFT JOIN (
    SELECT dst AS node, sum(pr * p) AS im
    FROM trans JOIN {prev} ON {prev}.node = trans.src GROUP BY dst
  ) agg{i} USING(node), n)"""
        )
        prev = f"pr{i}"
    return ",\n".join(steps), prev


_PR_STEPS, _PR_LAST = _sql_pagerank_unrolled()

SQL_PARTS_PAGERANK = f"""
WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pair_n AS (
  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS n_pair
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2),
edges AS (
  SELECT pa AS src, pb AS dst, CAST(n_pair AS DOUBLE) AS w FROM pair_n
  UNION ALL
  SELECT pb AS src, pa AS dst, CAST(n_pair AS DOUBLE) AS w FROM pair_n),
nodes AS (SELECT DISTINCT src AS node FROM edges),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM nodes),
outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
trans AS (SELECT src, dst, w / out_w AS p FROM edges JOIN outw USING(src)),
pr0 AS (SELECT node, 1.0 / n_nodes AS pr FROM nodes, n),
{_PR_STEPS}
SELECT node, round(pr, 6) AS pr FROM {_PR_LAST}
ORDER BY round(pr, 6) DESC, node LIMIT 20
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (analytics.py::rfm_segments): quartile
    scores from broadcast percentile_disc thresholds — no global ntile
    window — rolled up per (r, f, m) segment."""
    from mcpvectordb_spark.operators.analytics import rfm_segments

    orders = load_table(spark, sf_dir, "orders")
    seg = rfm_segments(orders)
    return seg.select(
        "r_score", "f_score", "m_score", "n_customers",
        F.round("avg_monetary", 4).alias("avg_monetary"),
    ).orderBy("r_score", "f_score", "m_score")


SQL_RFM_SEGMENTS = """
WITH anchor AS (SELECT max(o_orderdate) AS a FROM orders),
per_cust AS (
  SELECT o_custkey AS cust,
         min(datediff('day', o_orderdate, a)) AS rec_days,
         CAST(count(*) AS BIGINT) AS freq,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders, anchor GROUP BY 1, a),
th AS (
  SELECT quantile_disc(rec_days, 0.25) AS r0, quantile_disc(rec_days, 0.5) AS r1, quantile_disc(rec_days, 0.75) AS r2,
         quantile_disc(freq, 0.25) AS f0, quantile_disc(freq, 0.5) AS f1, quantile_disc(freq, 0.75) AS f2,
         quantile_disc(monetary, 0.25) AS m0, quantile_disc(monetary, 0.5) AS m1, quantile_disc(monetary, 0.75) AS m2
  FROM per_cust),
scored AS (
  SELECT cust, monetary,
         5 - (1 + (rec_days > r0)::INT + (rec_days > r1)::INT + (rec_days > r2)::INT) AS r_score,
         1 + (freq > f0)::INT + (freq > f1)::INT + (freq > f2)::INT AS f_score,
         1 + (monetary > m0)::INT + (monetary > m1)::INT + (monetary > m2)::INT AS m_score
  FROM per_cust, th)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(avg(monetary), 4) AS avg_monetary
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_orders_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit set-operation shapes (SURVEY §2.7): customers active in
    1995 INTERSECT 1996, 1995 EXCEPT 1996, and the symmetric difference —
    Spark's intersect/exceptAll-style plans vs plain SQL set ops."""
    orders = load_table(spark, sf_dir, "orders")
    year = F.year(F.col("o_orderdate"))
    y95 = orders.filter(year == 1995).select("o_custkey").distinct()
    y96 = orders.filter(year == 1996).select("o_custkey").distinct()
    both = y95.intersect(y96)
    only95 = y95.exceptAll(y96)
    only96 = y96.exceptAll(y95)
    rows = [
        ("both_years", both), ("only_1995", only95), ("only_1996", only96),
    ]
    out = None
    for name, df in rows:
        r = df.agg(F.lit(name).alias("cohort"), F.count(F.lit(1)).cast("long").alias("n_customers"))
        out = r if out is None else out.unionByName(r)
    return out.orderBy("cohort")


SQL_ORDERS_SETOPS = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT * FROM (
  SELECT 'both_years' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
  FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
  UNION ALL
  SELECT 'only_1995', CAST(count(*) AS BIGINT)
  FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
  UNION ALL
  SELECT 'only_1996', CAST(count(*) AS BIGINT)
  FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
) ORDER BY cohort
"""


def q_list_libraries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-library rollup (reference list_libraries, SURVEY §2.4 A2)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.col("lang").alias("library")).agg(
        F.countDistinct("source").alias("document_count"),
        F.count(F.lit(1)).alias("chunk_count"),
    )


SQL_LIST_LIBRARIES = """
SELECT lang AS library,
       CAST(count(DISTINCT source) AS BIGINT) AS document_count,
       CAST(count(*) AS BIGINT) AS chunk_count
FROM documents GROUP BY lang
"""


def q_list_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped listing + window pagination (reference list_documents,
    SURVEY §2.4 A1 + §2.6 T2): rows 6..15 ordered by size desc."""
    docs = load_table(spark, sf_dir, "documents")
    grouped = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum("n_chars").alias("total_chars"),
    )
    w = Window.orderBy(F.desc("total_chars"), F.asc("source"))
    return (
        grouped.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") > 5) & (F.col("rank") <= 15))
        .select("source", "doc_count", "total_chars", "rank")
    )


SQL_LIST_DOCUMENTS = """
SELECT source, doc_count, total_chars, rank FROM (
  SELECT source,
         CAST(count(*) AS BIGINT) AS doc_count,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(row_number() OVER (ORDER BY sum(n_chars) DESC, source) AS INT) AS rank
  FROM documents GROUP BY source)
WHERE rank > 5 AND rank <= 15
"""


def q_get_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document reconstruction: ordered concat of chunk texts (reference
    get_document, SURVEY §2.4 A5)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source") == "src3")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
                "\n\n",
            ).alias("content"),
        )
    )


SQL_GET_DOCUMENT = """
SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
       string_agg(text, chr(10)||chr(10) ORDER BY doc_id) AS content
FROM documents WHERE source = 'src3' GROUP BY source
"""


def q_semi_join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch find_existing: broadcast left-semi join of a probe set against
    the corpus on (source, library) (reference store.py:206-235 → J1)."""
    docs = load_table(spark, sf_dir, "documents")
    probe = spark.createDataFrame(
        [("src1", "en"), ("src5", "en"), ("src7", "en")], "source string, lang string"
    )
    return (
        docs.join(F.broadcast(probe), ["source", "lang"], "left_semi")
        .groupBy("source", F.col("lang").alias("library"))
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )


SQL_SEMI_JOIN_LOOKUP = """
SELECT source, lang AS library, CAST(count(*) AS BIGINT) AS n_chunks
FROM documents d
WHERE EXISTS (SELECT 1 FROM (VALUES ('src1','en'),('src5','en'),('src7','en')) p(s, l)
              WHERE p.s = d.source AND p.l = d.lang)
GROUP BY source, lang
"""


def q_delete_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete as anti-join (reference delete_document → K2/J2): remaining
    per-library counts after removing all docs with source='src3'."""
    docs = load_table(spark, sf_dir, "documents")
    victims = docs.filter(F.col("source") == "src3").select("doc_id")
    return (
        docs.join(victims, "doc_id", "left_anti")
        .groupBy(F.col("lang").alias("library"))
        .agg(F.count(F.lit(1)).alias("n_remaining"))
    )


SQL_DELETE_ANTIJOIN = """
SELECT lang AS library, CAST(count(*) AS BIGINT) AS n_remaining
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM documents x WHERE x.source = 'src3' AND x.doc_id = d.doc_id)
GROUP BY lang
"""


# ===========================================================================
# 4. Deduplication family
# ===========================================================================

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a corpus with 50 planted duplicates."""
    corpus = _exact_corpus(spark, sf_dir)
    groups = dd.exact_duplicates(corpus, "id", "text")
    return groups.select(
        "content_hash",
        "dup_count",
        F.element_at("ids", 1).alias("min_id"),
        F.element_at("ids", -1).alias("max_id"),
    )


SQL_DEDUP_EXACT = f"""
WITH corpus AS ({_SQL_EXACT_CORPUS})
SELECT md5({_sql_norm('text')}) AS content_hash,
       CAST(count(*) AS BIGINT) AS dup_count,
       min(id) AS min_id, max(id) AS max_id
FROM corpus GROUP BY 1 HAVING count(*) >= 2
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-dup pairs ≥ 0.5 via shingle inverted index."""
    corpus = _near_corpus(spark, sf_dir)
    pairs = dd.ngram_jaccard_pairs(corpus, "id", "text", n=3, threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH corpus AS ({_SQL_NEAR_CORPUS}),
{_sql_jaccard_cte()}
SELECT id_a, id_b, round(common/(sa.set_size + sb.set_size - common), 6) AS jaccard
FROM common JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
WHERE common/(sa.set_size + sb.set_size - common) >= 0.5
"""


def _sql_minhash_sig(corpus_sql: str, num_hashes: int) -> str:
    """Kirsch–Mitzenmacher double hashing, mirroring operators.dedup:
    h1/h2 = independent md5 hex slices, mh_i = min(h1 + i·h2)."""
    hex_fold = (
        "list_reduce(list_transform(string_split({sl},''),"
        " c -> CAST(strpos('0123456789abcdef', c)-1 AS BIGINT)), (a,b) -> a*16+b)"
    )
    h1 = hex_fold.format(sl="substr(md5(shingle),1,12)")
    h2 = hex_fold.format(sl="substr(md5(shingle),13,12)")
    rng = 1 << 48
    mins = [f"min((h1 + {i}*h2) % {rng}) AS mh{i}" for i in range(num_hashes)]
    return f"""
corpus AS ({corpus_sql}),
sh AS (SELECT id, {h1} AS h1, {h2} AS h2
       FROM (SELECT id, unnest({_sql_shingles(_sql_words('text'), 3)}) AS shingle FROM corpus)),
sigs AS (SELECT id, {", ".join(mins)} FROM sh GROUP BY id)
"""


def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration audit: for every shingle-sharing
    document pair (the organic sliding-window near-dups), compare the
    16-hash signature agreement fraction with the EXACT 3-gram Jaccard,
    bucketed by agreeing components k — E[agreement] = J is the MinHash
    theorem, so mean exact Jaccard per bucket must track k/16.  This is
    the on-corpus proof that the dedup estimator is unbiased HERE (the
    repo's gate-approximations-in-plan philosophy applied to its own
    MinHash), and the bias column quantifies the small-k deviation.
    Cost: the existing inverted-index candidate join + one 16-column
    signature join — both machinery the LSH dedup already runs."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    pairs = dd.ngram_jaccard_pairs(docs, "id", "text", n=3, threshold=0.02)
    sigs = dd.minhash_signatures(docs, "id", "text", num_hashes=16, shingle_n=3)
    sa = sigs.select(
        F.col("id").alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)]
    )
    sb = sigs.select(
        F.col("id").alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)]
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(16)
    )
    j = pairs.join(sa, "id_a").join(sb, "id_b").select(
        "jaccard", agree.alias("k")
    )
    return (
        j.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("mean_jaccard"),
            F.round(
                F.avg("jaccard") - F.col("k").cast("double") / 16, 6
            ).alias("bias"),
        )
        .select(F.col("k").cast("long").alias("k_agree"), "n_pairs", "mean_jaccard", "bias")
    )


SQL_MINHASH_CALIBRATION = f"""
WITH {_sql_minhash_sig("SELECT doc_id AS id, text FROM documents", 16)},
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
joined AS (
  SELECT p.jaccard,
         ({" + ".join(f"CASE WHEN x.mh{i} = y.mh{i} THEN 1 ELSE 0 END" for i in range(16))}) AS k
  FROM pairs p JOIN sigs x ON x.id = p.id_a JOIN sigs y ON y.id = p.id_b)
SELECT CAST(k AS BIGINT) AS k_agree,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(jaccard), 6) AS mean_jaccard,
       round(avg(jaccard) - CAST(k AS DOUBLE) / 16, 6) AS bias
FROM joined GROUP BY k
"""


def q_dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable 8-hash MinHash signatures over the documents table."""
    docs = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"), "text")
    return dd.minhash_signatures(docs, "id", "text", num_hashes=8, shingle_n=3)


SQL_DEDUP_MINHASH_SIG = f"""
WITH {_sql_minhash_sig("SELECT doc_id AS id, text FROM documents", 8)}
SELECT * FROM sigs
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash→LSH banding→verify pipeline (8 hashes, 4 bands of 2 —
    P(candidate) = 1−(1−J²)⁴ ≈ 0.999 at J 0.9)."""
    corpus = _near_corpus(spark, sf_dir)
    pairs = dd.minhash_lsh_pairs(corpus, "id", "text", num_hashes=8, bands=4, shingle_n=3, threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


SQL_DEDUP_MINHASH_LSH = f"""
WITH {_sql_minhash_sig(_SQL_NEAR_CORPUS, 8)},
banded AS (
  SELECT id, 0 AS band, concat_ws('_', mh0, mh1) AS bucket FROM sigs
  UNION ALL SELECT id, 1 AS band, concat_ws('_', mh2, mh3) AS bucket FROM sigs
  UNION ALL SELECT id, 2 AS band, concat_ws('_', mh4, mh5) AS bucket FROM sigs
  UNION ALL SELECT id, 3 AS band, concat_ws('_', mh6, mh7) AS bucket FROM sigs),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
{_sql_jaccard_cte()}
SELECT c.id_a, c.id_b, round(common/(sa.set_size + sb.set_size - common), 6) AS jaccard
FROM cand c
JOIN common ON common.id_a = c.id_a AND common.id_b = c.id_b
JOIN sizes sa ON sa.id = c.id_a JOIN sizes sb ON sb.id = c.id_b
WHERE common/(sa.set_size + sb.set_size - common) >= 0.5
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the Jaccard≥0.5 pair
    graph of the planted corpus — every doc mapped to its canonical
    representative (min reachable id).  Spark: iterative min-label
    propagation; oracle: recursive CTE."""
    corpus = _near_corpus(spark, sf_dir)
    pairs = dd.ngram_jaccard_pairs(corpus, "id", "text", n=3, threshold=0.5)
    clusters = dd.dedup_clusters(corpus.select("id"), pairs, "id")
    return clusters


def q_dedup_clusters_twostar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering through the web-scale path: alternating large-star /
    small-star contraction (dedup.py::dedup_clusters_twostar, O(log²n)
    rounds vs propagation's O(diameter)).  Oracle = the SAME recursive CTE
    as dedup_clusters — the driver gate itself proves the two algorithms
    agree on real pair graphs."""
    corpus = _near_corpus(spark, sf_dir)
    pairs = dd.ngram_jaccard_pairs(corpus, "id", "text", n=3, threshold=0.5)
    # loop_partitions=8: the planted pair graph is tiny — scoped small-graph
    # fast path (see dedup.dedup_clusters_twostar; None at corpus scale)
    return dd.dedup_clusters_twostar(corpus.select("id"), pairs, "id", loop_partitions=8)


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE corpus AS ({_SQL_NEAR_CORPUS}),
{_sql_jaccard_cte()}
, jpairs AS (
  SELECT id_a, id_b
  FROM common JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
  WHERE common/(sa.set_size + sb.set_size - common) >= 0.5),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM jpairs
  UNION SELECT id_b, id_a FROM jpairs),
reach(id, label) AS (
  SELECT id, id FROM corpus
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id)
SELECT id, CAST(min(label) AS BIGINT) AS cluster_id FROM reach GROUP BY id
"""


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment ≥0.9 (dedup.py::ngram_containment_pairs):
    the planted suffix-extended copies CONTAIN their originals fully
    (containment 1.0 in the original→copy direction) even where symmetric
    Jaccard would dilute — the fragment/quotation detector."""
    corpus = _near_corpus(spark, sf_dir)
    pairs = dd.ngram_containment_pairs(corpus, "id", "text", n=3, threshold=0.9)
    return pairs.select("id_a", "id_b", F.round("containment", 6).alias("containment"))


SQL_DEDUP_CONTAINMENT = f"""
WITH corpus AS ({_SQL_NEAR_CORPUS}),
{_sql_jaccard_cte()}
, directed AS (
  SELECT id_a, id_b, common FROM common
  UNION ALL
  SELECT id_b AS id_a, id_a AS id_b, common FROM common)
SELECT id_a, id_b, round(common * 1.0 / s.set_size, 6) AS containment
FROM directed JOIN sizes s ON s.id = id_a
WHERE common * 1.0 / s.set_size >= 0.9
"""


def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus canonicalization: per multi-member near-dup cluster keep the
    smallest id, report members dropped — the action step that turns the
    cluster map into an actual deduped corpus."""
    corpus = _near_corpus(spark, sf_dir)
    pairs = dd.ngram_jaccard_pairs(corpus, "id", "text", n=3, threshold=0.5)
    clusters = dd.dedup_clusters(corpus.select("id"), pairs, "id")
    return (
        clusters.groupBy("cluster_id")
        .agg(
            F.min("id").alias("keeper"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
        .filter(F.col("n_members") > 1)
        .select("cluster_id", "keeper", "n_members")
        .orderBy("cluster_id")
    )


SQL_DEDUP_KEEP_CANONICAL = f"""
SELECT cluster_id, CAST(min(id) AS BIGINT) AS keeper, CAST(count(*) AS BIGINT) AS n_members
FROM ({SQL_DEDUP_CLUSTERS}) clusters
GROUP BY cluster_id HAVING count(*) > 1 ORDER BY cluster_id
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit tf-weighted SimHash fingerprint per document."""
    docs = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"), "text")
    return dd.simhash(docs, "id", "text", bits=32)


def _sql_simhash(bits: int = 32) -> str:
    sums = ", ".join(f"sum(tf * (((hh >> {b}) & 1)*2 - 1)) AS s{b}" for b in range(bits))
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)" for b in range(bits))
    return f"""
WITH terms AS (
  SELECT id, term, count(*) AS tf FROM (
    SELECT doc_id AS id, unnest({_sql_words('text')}) AS term FROM documents)
  GROUP BY 1, 2),
h AS (SELECT id, tf, {_sql_hex48('term')} AS hh FROM terms),
sums AS (SELECT id, {sums} FROM h GROUP BY id)
SELECT id, {fp} AS simhash FROM sums
"""


SQL_DEDUP_SIMHASH = _sql_simhash(32)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute-force exact baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dd.embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.35)
    return pairs.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


SQL_DEDUP_EMBEDDING_COSINE = f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({_sql_cos('a.v', 'b.v')}, 6) AS cos_sim
FROM c a JOIN c b ON a.vec_id < b.vec_id
WHERE {_sql_cos('a.v', 'b.v')} >= 0.35
"""


# k sizes the candidate cells: Σ|cell|² pair work needs |cell| ≈ n/k small,
# so k scales with the corpus (64 keeps cells ≈300 rows at sf0.1's 20k
# vectors; at 100 TB you'd set k ≈ n/1000 and refine with kmeans_refine).
_SEMDEDUP_K, _SEMDEDUP_THR = 64, 0.8


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): k-means cells as
    candidate buckets, within-cell cosine verification, drop-keeping-the-
    lowest-id.  Planted exact copies of vec_id<40 are the ground truth —
    every plant must be dropped against its original (sim 1.0), and at
    threshold 0.8 the raw corpus contributes no pairs (max genuine cosine
    is ≈0.4, see dedup_embedding_cosine).  Centroids are the 8 lowest-id
    corpus vectors: trained-state-free and SQL-reproducible, so the oracle
    re-runs the WHOLE pipeline including assignment tie-breaks."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding").unionByName(
        emb.filter(F.col("vec_id") < 40).select(
            (F.col("vec_id") + _PLANT_OFFSET).alias("id"), "embedding"
        )
    )
    dropped = dd.semdedup(corpus, "id", "embedding", k=_SEMDEDUP_K, threshold=_SEMDEDUP_THR)
    return dropped.select("id", "cluster_id", F.round("max_sim", 6).alias("max_sim"))


SQL_SEMDEDUP = f"""
WITH raw AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + {_PLANT_OFFSET} AS id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < 40),
-- L2-normalize once (zero vectors out), same op structure as the operator
corpus AS (
  SELECT id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS v
  FROM raw WHERE sqrt(list_inner_product(v, v)) > 0),
cents AS (SELECT id AS cid, v AS cv FROM corpus ORDER BY id LIMIT {_SEMDEDUP_K}),
assign AS (
  SELECT id, v, cid,
         row_number() OVER (PARTITION BY id
                            ORDER BY list_inner_product(v, cv) DESC, cid) AS rn
  FROM corpus CROSS JOIN cents),
clustered AS (SELECT id, v, cid AS cluster_id FROM assign WHERE rn = 1),
pairs AS (
  SELECT b.id AS id, b.cluster_id, list_inner_product(a.v, b.v) AS sim
  FROM clustered a JOIN clustered b
    ON a.cluster_id = b.cluster_id AND a.id < b.id
  WHERE list_inner_product(a.v, b.v) >= {_SEMDEDUP_THR})
SELECT id, cluster_id, round(max(sim), 6) AS max_sim
FROM pairs GROUP BY id, cluster_id
"""


# ===========================================================================
# 5. Text analysis
# ===========================================================================

def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BPE training (Sennrich et al. 2016), Spark-first: the ONE
    corpus-scale pass is the distributed word histogram; the 40-merge loop
    runs on the vocabulary-bounded histogram driver-side (operators/bpe.py).
    Deterministic end-to-end (capped histogram ordered (count DESC, word
    ASC); ties to the lexicographically smallest pair) → digest-gated.
    The iterative merge loop is not SQL-expressible."""
    from mcpvectordb_spark.operators.bpe import train_bpe, word_histogram

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(word_histogram(docs, "text"), 40)
    out = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    )
    return _digest_gate(out)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the trained tokenizer: 40 merges learned from the corpus
    histogram, then the corpus ENCODED with them (operators/bpe.py::
    bpe_encode — Arrow kernel, per-batch word memoization).  Per-doc token
    counts + token-stream md5, digest-gated (the greedy merge application
    is not SQL-expressible)."""
    from mcpvectordb_spark.operators.bpe import bpe_encode, train_bpe, word_histogram

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(word_histogram(docs, "text"), 40)
    enc = bpe_encode(docs.select("doc_id", "text"), "text", merges)
    per_doc = enc.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "bpe_tokens")).alias("tok_md5"),
    )
    return _digest_gate(per_doc)


def q_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-level byte dedup via content-defined chunking (dedup.py::
    cdc_chunk_stage — Gear rolling hash, FastCDC-style bounds).  Plants
    PREFIX-SHIFTED copies of doc_id<50: fixed-size blocking would share
    zero blocks with the originals, CDC boundaries resync after the edit
    so most chunk digests dedup away — the summary's dedup_ratio is the
    proof, gated by golden digest (rolling hash is not SQL-expressible)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(F.col("doc_id").alias("id"), "text").unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + _PLANT_OFFSET).alias("id"),
            F.concat(F.lit("EDITED-PREFIX: "), F.col("text")).alias("text"),
        )
    )
    chunks = dd.cdc_chunk_stage(corpus, "id", "text", min_size=32, avg_size=128, max_size=512)
    return _digest_gate(dd.cdc_dedup_stats(chunks))


def q_semdedup_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with Lloyd-REFINED centroids (dedup.py::kmeans_refine, two
    spherical iterations from the lowest-id seed) — exercises the trained-
    state path end-to-end on the same planted corpus as `semdedup`.
    Iterative (per-round driver re-broadcast) → digest gate; centroids are
    quantized to 6 decimals after renorm so the golden is stable against
    float partial-sum ordering.  Same ground truth: every planted copy
    shares its twin's cell (identical vectors), so all 40 must drop."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("id"), "embedding").unionByName(
        emb.filter(F.col("vec_id") < 40).select(
            (F.col("vec_id") + _PLANT_OFFSET).alias("id"), "embedding"
        )
    )
    from mcpvectordb_spark.operators.knn import dot

    nrm = F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    unit = corpus.filter(nrm > 0).select(
        "id", F.transform("embedding", lambda x: x / nrm).alias("embedding")
    )
    seed = dd.lowest_id_centroids(unit, "id", "embedding", _SEMDEDUP_K)
    cents = dd.kmeans_refine(unit, seed, "id", "embedding", iters=2, quantize_digits=6)
    dropped = dd.semdedup(
        corpus, "id", "embedding", k=_SEMDEDUP_K, threshold=_SEMDEDUP_THR,
        centroids=cents,
    )
    return _digest_gate(
        dropped.select("id", "cluster_id", F.round("max_sim", 6).alias("max_sim"))
    )


def q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FFD no-split sequence packing (curation.py::pack_bins_ffd): per-shard
    first-fit-decreasing of whole documents into 512-token bins; summary =
    per-shard bin count / token total / oversize count / padding fraction.
    The greedy placement is sequential per shard → not SQL-expressible;
    fully deterministic (sorted placement, hash shards) → digest gate."""
    docs = load_table(spark, sf_dir, "documents")
    packed = cu.pack_bins_ffd(
        docs, "doc_id", ts.ws_token_count(F.col("text")), budget=512, num_shards=4
    )
    summary = packed.groupBy("shard").agg(
        F.countDistinct("bin_id").cast("long").alias("n_bins"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.col("oversize").cast("long")).cast("long").alias("n_oversize"),
    ).withColumn(
        "padding_frac",
        F.round(F.lit(1.0) - F.col("total_tokens") / (F.col("n_bins") * F.lit(512)), 6),
    )
    return _digest_gate(summary)


def q_nb_lang_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classification, trained AND scored
    on the corpus itself (operators/classify.py) — distributed ML as pure
    aggregation: training is a (label, term) groupBy, scoring is a join +
    per-(doc, class) sum, argmax over rounded log-posteriors.  The oracle
    replays the entire train+classify pipeline in SQL."""
    from mcpvectordb_spark.operators.classify import nb_classify, nb_train

    docs = load_table(spark, sf_dir, "documents")
    model = nb_train(docs, "lang", "text")
    out = nb_classify(docs, "doc_id", "text", model)
    return out.select(F.col("id").alias("doc_id"), "predicted", "score")


_SQL_NB_WORDS = f"list_filter({_sql_words('text')}, t -> t <> '')"

SQL_NB_LANG_CLASSIFY = f"""
WITH tok AS (
  SELECT lang AS label, unnest({_SQL_NB_WORDS}) AS term FROM documents),
cwc AS (SELECT label, term, CAST(count(*) AS BIGINT) AS ct FROM tok GROUP BY 1, 2),
nc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_c FROM tok GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM tok),
dcnt AS (SELECT lang AS label, CAST(count(*) AS BIGINT) AS d_c FROM documents GROUP BY 1),
dtot AS (SELECT CAST(count(*) AS BIGINT) AS d_t FROM documents),
priors AS (SELECT label, ln(d_c / CAST(d_t AS DOUBLE)) AS log_prior FROM dcnt, dtot),
liks AS (SELECT label, term, ln((ct + 1) / CAST(n_c + v AS DOUBLE)) AS log_lik
         FROM cwc JOIN nc USING (label), v),
unseen AS (SELECT label, ln(1.0 / CAST(n_c + v AS DOUBLE)) AS log_unseen FROM nc, v),
vocab AS (SELECT DISTINCT term FROM tok),
doc_tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_SQL_NB_WORDS}) AS term FROM documents)
  GROUP BY 1, 2),
scored AS (
  SELECT d.doc_id, u.label, sum(d.tf * COALESCE(l.log_lik, u.log_unseen)) AS s
  FROM doc_tf d
  JOIN vocab USING (term)
  CROSS JOIN unseen u
  LEFT JOIN liks l ON l.label = u.label AND l.term = d.term
  GROUP BY 1, 2),
final AS (
  SELECT s.doc_id, s.label, round(s.s + p.log_prior, 4) AS score
  FROM scored s JOIN priors p ON p.label = s.label),
ranked AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn
  FROM final)
SELECT doc_id, label AS predicted, score FROM ranked WHERE rn = 1
"""


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex subword estimate."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        ts.ws_token_count(t).cast("long").alias("ws_tokens"),
        ts.bpe_ish_token_count(t).alias("bpe_tokens"),
    )


SQL_TEXT_TOKENS = r"""
SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) AS BIGINT) AS ws_tokens,
  CAST(list_sum(list_transform(
        regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'),
        t -> CASE WHEN regexp_full_match(t, '[A-Za-z]+') AND len(t) > 4
                  THEN CAST(ceil(len(t)/4.0) AS BIGINT) ELSE 1 END)) AS BIGINT) AS bpe_tokens
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + composite score per document."""
    docs = load_table(spark, sf_dir, "documents")
    return ts.quality_features(docs, "doc_id", "text").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_words").cast("long").alias("n_words"),
        "punct_ratio", "stopword_ratio", "quality_score",
    )


SQL_TEXT_QUALITY = f"""
WITH {_sql_quality_cte('documents')}
SELECT doc_id, n_chars, n_words,
       punct_ratio, stop_ratio AS stopword_ratio, quality_score
FROM q
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language-ID, tallied against the true label."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("lang_pred", ts.lang_id(F.col("text")))
        .groupBy(F.col("lang").alias("lang_true"), "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _sql_langid() -> str:
    selects, case_sql = _sql_lang_fragments()
    return f"""
WITH scored AS (SELECT lang, {selects} FROM documents)
SELECT lang AS lang_true, {case_sql} AS lang_pred, CAST(count(*) AS BIGINT) AS n_docs
FROM scored GROUP BY 1, 2
"""


SQL_TEXT_LANGID = _sql_langid()


def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF keywords per document (corpus-wide document
    frequencies, smooth-idf).  operators/textstats.py::keywords_tfidf."""
    docs = load_table(spark, sf_dir, "documents")
    return ts.keywords_tfidf(docs, "doc_id", "text", k=5, min_len=3)


_KW_STOPS = ", ".join(f"'{w}'" for w in ts.KEYWORD_STOPWORDS)

SQL_TEXT_KEYWORDS = f"""
WITH terms AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')) AS t(term)
  WHERE len(t.term) >= 3 AND t.term NOT IN ({_KW_STOPS})
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM terms GROUP BY doc_id, term
),
df_t AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df_t.df,
         tf.tf * (ln((n.n_docs + 1) / (df_t.df + 1.0)) + 1.0) AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * (ln((n.n_docs + 1) / (df_t.df + 1.0)) + 1.0) DESC,
                                     tf.term ASC) AS rank
  FROM tf JOIN df_t USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, round(score, 6) AS score, CAST(rank AS INT) AS rank
FROM scored WHERE rank <= 5
"""


def q_text_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity proxy: mean unigram log-probability of each
    doc under the corpus's own unigram distribution, with one planted
    word-salad doc that must land far below the real docs
    (textstats.py::unigram_logprob)."""
    docs = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"), "text")
    salad = spark.range(1).select(
        F.lit(_PLANT_OFFSET).cast("long").alias("id"),
        F.lit("zxqv kjwp qmfg ybdn xxzz vvkk ppqq rrss").alias("text"),
    )
    return ts.unigram_logprob(docs.unionByName(salad), "id", "text").orderBy("id")


SQL_TEXT_LOGPROB = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL SELECT {_PLANT_OFFSET} AS id, 'zxqv kjwp qmfg ybdn xxzz vvkk ppqq rrss' AS text
),
toks AS (
  SELECT id, t.term
  FROM (SELECT id, {_sql_words('text')} AS ws FROM corpus), UNNEST(ws) AS t(term)
  WHERE t.term <> ''
),
freq AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks)
SELECT id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(ln(c * 1.0 / n_total)), 6) AS avg_logprob
FROM toks JOIN freq USING (term) CROSS JOIN n
GROUP BY id ORDER BY id
"""


def q_text_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib-deflate compression-ratio quality signal per document
    (textstats.py::deflate_ratio — whole-document repetitiveness that
    n-gram fractions miss), with one planted template-spam doc that must
    flag ``repetitive``.  Byte-level compression is not SQL-expressible →
    golden-digest gate (deterministic: pinned zlib level, fixed plant)."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    spam = spark.range(1).select(
        F.lit(_PLANT_OFFSET).cast("long").alias("id"),
        F.lit(("buy cheap meds now " * 60).strip()).alias("text"),
    )
    out = ts.deflate_ratio(docs.unionByName(spam), "id", "text")
    return _digest_gate(out.withColumn("repetitive", F.col("deflate_ratio") < 0.3))


_BLOCKLIST = ["casino", "lottery", "jackpot", "warez", "xxx"]


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style word-blocklist page gate (curation.py::blocklist_flags):
    per-doc blocked-token count + page verdict over the corpus plus one
    planted offender that must flag.  Map-only codegen array
    intersection; the blocklist is a plan literal."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    plant = spark.range(1).select(
        F.lit(_PLANT_OFFSET).cast("long").alias("id"),
        F.lit("win the big lottery jackpot at our casino tonight").alias("text"),
    )
    return cu.blocklist_flags(
        docs.unionByName(plant), "id", "text", _BLOCKLIST
    ).orderBy("id")


_SQL_BL = ", ".join(f"'{w}'" for w in sorted(set(_BLOCKLIST)))

SQL_BLOCKLIST_FILTER = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL SELECT {_PLANT_OFFSET} AS id, 'win the big lottery jackpot at our casino tonight' AS text
),
scored AS (
  SELECT id,
         CAST(len(list_filter(list_filter({_sql_words('text')}, w -> w <> ''),
                              w -> w IN ({_SQL_BL}))) AS BIGINT) AS n_blocked
  FROM corpus
)
SELECT id, n_blocked, n_blocked > 0 AS blocked FROM scored ORDER BY id
"""


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (textstats.py::
    logprob_buckets): unigram log-prob scores split at discrete tercile
    thresholds; the planted word-salad doc must land in ``tail``.  The
    thresholds are a 1-row broadcast, assignment map-side."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    salad = spark.range(1).select(
        F.lit(_PLANT_OFFSET).cast("long").alias("id"),
        F.lit("zxqv kjwp qmfg ybdn xxzz vvkk ppqq rrss").alias("text"),
    )
    return ts.logprob_buckets(docs.unionByName(salad), "id", "text").orderBy("id")


SQL_CCNET_BUCKETS = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL SELECT {_PLANT_OFFSET} AS id, 'zxqv kjwp qmfg ybdn xxzz vvkk ppqq rrss' AS text
),
toks AS (
  SELECT id, t.term
  FROM (SELECT id, {_sql_words('text')} AS ws FROM corpus), UNNEST(ws) AS t(term)
  WHERE t.term <> ''
),
freq AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
scored AS (
  SELECT id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         round(avg(ln(c * 1.0 / n_total)), 6) AS avg_logprob
  FROM toks JOIN freq USING (term) CROSS JOIN n
  GROUP BY id
),
th AS (
  SELECT quantile_disc(avg_logprob, 0.3333333333333333) AS t1,
         quantile_disc(avg_logprob, 0.6666666666666666) AS t2
  FROM scored
)
SELECT id, n_tokens, avg_logprob,
       CASE WHEN avg_logprob > t2 THEN 'head'
            WHEN avg_logprob > t1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored CROSS JOIN th ORDER BY id
"""


_WEB_DOMAIN_BLOCKLIST = ["example.org"]


def q_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style web-filtering funnel: URL registered-domain blocklist
    → language-ID gate → heuristic quality gate → word-blocklist gate,
    reported as surviving-doc counts per stage.  Every gate reuses a
    first-class operator (weburl.registered_domain, textstats.lang_id /
    quality_columns, the C4 blocklist intersection) and all gates fuse
    into ONE conditional aggregation over a single corpus scan — the
    pipeline costs one pass regardless of stage count, then a 5-row
    stack.  The oracle replays every gate from the shared SQL fragments."""
    docs = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    url = (
        F.when(m == 0, F.concat(F.lit("HTTPS://WWW."), F.col("source"), F.lit(".Example.CO.UK:443/art/"), sid, F.lit("?utm_source=feed&b=2&a=1#frag")))
        .when(m == 1, F.concat(F.lit("http://sub."), F.col("source"), F.lit(".example.com:8080/p/"), sid, F.lit("?gclid=x&z=9")))
        .when(m == 2, F.concat(F.lit("https://"), F.col("source"), F.lit(".example.org")))
        .otherwise(F.concat(F.lit("http://"), F.col("source"), F.lit(".github.io:80/?ref=rss&q="), sid))
    )
    dom = wu.registered_domain(wu.url_parts(url)["host"])
    qcols = ts.quality_columns("text")
    bl = F.array(*[F.lit(w) for w in sorted(set(_BLOCKLIST))])
    toks = F.filter(F.split(dd.normalize_text(F.col("text")), " "), lambda t: t != "")
    blocked = F.size(F.filter(toks, lambda t: F.array_contains(bl, t))) > 0
    f1 = ~dom.isin(*_WEB_DOMAIN_BLOCKLIST)
    f2 = f1 & (ts.lang_id(F.col("text")) == "en")
    f3 = f2 & (qcols["quality_score"] >= 0.5)
    f4 = f3 & ~blocked
    one = F.lit(1).cast("long")
    agg = docs.agg(
        F.count(one).alias("n0"),
        F.sum(F.when(f1, one).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(f2, one).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(f3, one).otherwise(0)).cast("long").alias("n3"),
        F.sum(F.when(f4, one).otherwise(0)).cast("long").alias("n4"),
    )
    return agg.selectExpr(
        "stack(5, 0, 'all', n0, 1, 'url_domain', n1, 2, 'langid', n2, "
        "3, 'quality', n3, 4, 'blocklist', n4) AS (stage_idx, stage, n_docs)"
    ).orderBy("stage_idx")


def _sql_web_pipeline() -> str:
    selects, case_sql = _sql_lang_fragments()
    doms = ", ".join(f"'{d}'" for d in _WEB_DOMAIN_BLOCKLIST)
    return f"""
WITH u AS (
  SELECT doc_id, text,
    CASE doc_id % 4
      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.CO.UK:443/art/' || CAST(doc_id AS VARCHAR) || '?utm_source=feed&b=2&a=1#frag'
      WHEN 1 THEN 'http://sub.' || source || '.example.com:8080/p/' || CAST(doc_id AS VARCHAR) || '?gclid=x&z=9'
      WHEN 2 THEN 'https://' || source || '.example.org'
      ELSE 'http://' || source || '.github.io:80/?ref=rss&q=' || CAST(doc_id AS VARCHAR)
    END AS url
  FROM documents
),
hosted AS (
  SELECT *, lower(regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^([^:]*)', 1)) AS host
  FROM u
),
dommed AS (
  SELECT *, string_split(host, '.') AS labels FROM hosted
),
{_sql_quality_cte('''(
  SELECT *, CASE WHEN len(labels) <= 2 THEN host
       WHEN array_to_string(labels[-2:], '.') IN ({sfx}) AND len(labels) >= 3
         THEN array_to_string(labels[-3:], '.')
       ELSE array_to_string(labels[-2:], '.') END AS url_domain
  FROM dommed)'''.format(sfx=_SQL_URL_SUFFIXES))},
scored AS (
  SELECT *, {selects},
    CAST(len(list_filter(list_filter({_sql_words('text')}, w -> w <> ''),
                         w -> w IN ({_SQL_BL}))) AS BIGINT) AS n_blocked
  FROM q
),
flagged AS (
  SELECT *,
    url_domain NOT IN ({doms}) AS f1,
    url_domain NOT IN ({doms}) AND ({case_sql}) = 'en' AS f2,
    url_domain NOT IN ({doms}) AND ({case_sql}) = 'en' AND quality_score >= 0.5 AS f3,
    url_domain NOT IN ({doms}) AND ({case_sql}) = 'en' AND quality_score >= 0.5 AND n_blocked = 0 AS f4
  FROM scored
),
funnel AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
  FROM flagged
)
SELECT 0 AS stage_idx, 'all' AS stage, n0 AS n_docs FROM funnel
UNION ALL SELECT 1, 'url_domain', n1 FROM funnel
UNION ALL SELECT 2, 'langid', n2 FROM funnel
UNION ALL SELECT 3, 'quality', n3 FROM funnel
UNION ALL SELECT 4, 'blocklist', n4 FROM funnel
ORDER BY stage_idx
"""


def q_text_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake / encoding-damage scan (textstats.py::encoding_artifacts)
    over the corpus plus three planted casualties: a double-encoded
    UTF-8-as-Latin-1 doc, a control-character doc, and a U+FFFD
    replacement-character doc — each must flag ``damaged``."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    plants = spark.range(3).select(
        (F.lit(_PLANT_OFFSET) + F.col("id")).alias("id"),
        F.when(F.col("id") == 0, F.lit("the cafÃ© menu shows â€œspecialsâ€ and Ã¼ber prices Â every day"))
        .when(F.col("id") == 1, F.concat(F.lit("bad"), F.expr("chr(1)"), F.lit("text"), F.expr("chr(2)"), F.lit("here")))
        .otherwise(F.lit("lossy � decode � output"))
        .alias("text"),
    )
    return ts.encoding_artifacts(docs.unionByName(plants), "id", "text").orderBy("id")


SQL_TEXT_ENCODING = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL SELECT {_PLANT_OFFSET}, 'the cafÃ© menu shows â€œspecialsâ€ and Ã¼ber prices Â every day'
  UNION ALL SELECT {_PLANT_OFFSET} + 1, 'bad' || chr(1) || 'text' || chr(2) || 'here'
  UNION ALL SELECT {_PLANT_OFFSET} + 2, 'lossy � decode � output'
),
scored AS (
  SELECT id,
    CAST(len(regexp_extract_all(COALESCE(text, ''), 'Ã|â€|Â ')) AS BIGINT) AS n_mojibake,
    CAST(len(regexp_extract_all(COALESCE(text, ''), '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS BIGINT) AS n_control,
    CAST(len(regexp_extract_all(COALESCE(text, ''), '�')) AS BIGINT) AS n_replacement
  FROM corpus
)
SELECT id, n_mojibake, n_control, n_replacement,
       (n_mojibake >= 3 OR n_replacement > 0 OR n_control > 0) AS damaged
FROM scored ORDER BY id
"""


_EQ_63 = ", ".join(["0.1"] * 63)
_EQ_64Z = ", ".join(["0.0"] * 64)
_EQ_32 = ", ".join(["0.2"] * 32)


def q_embedding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column validation gate (operators/knn.py::
    embedding_quality): dim / non-finite / norm-band checks over the
    corpus plus four planted offenders (NaN-poisoned, +Inf-poisoned,
    all-zero, wrong-dim) that must each fail a distinct check.  Map-only
    codegen; NaN norms propagate and fail, never hide."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tenth = [F.lit(0.1)] * 63
    plants = [
        (F.lit(_PLANT_OFFSET), F.array(*tenth, F.lit(float("nan")))),
        (F.lit(_PLANT_OFFSET + 1), F.array(*tenth, F.lit(float("inf")))),
        (F.lit(_PLANT_OFFSET + 2), F.array(*[F.lit(0.0)] * 64)),
        (F.lit(_PLANT_OFFSET + 3), F.array(*[F.lit(0.2)] * 32)),
    ]
    planted = None
    for vid, vec in plants:
        row = spark.range(1).select(vid.cast("long").alias("vec_id"), vec.alias("embedding"))
        planted = row if planted is None else planted.unionByName(row)
    out = knn.embedding_quality(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).unionByName(planted),
        "vec_id",
        "embedding",
        expect_dim=64,
    )
    # non-finite norms (NaN/Inf) become NULL in the REPORT: the check
    # verdict lives in finite_ok/norm_ok, and NULL round-trips through any
    # comparator where NaN != NaN would false-fail the driver gate
    return out.withColumn(
        "norm", F.when(F.col("finite_ok"), F.col("norm"))
    ).orderBy("vec_id")


SQL_EMBEDDING_QUALITY = f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL SELECT {_PLANT_OFFSET}, CAST([{_EQ_63}, 'NaN'::DOUBLE] AS DOUBLE[])
  UNION ALL SELECT {_PLANT_OFFSET} + 1, CAST([{_EQ_63}, 'Infinity'::DOUBLE] AS DOUBLE[])
  UNION ALL SELECT {_PLANT_OFFSET} + 2, CAST([{_EQ_64Z}] AS DOUBLE[])
  UNION ALL SELECT {_PLANT_OFFSET} + 3, CAST([{_EQ_32}] AS DOUBLE[])
),
scored AS (
  SELECT vec_id,
    CAST(len(v) AS INT) AS dim,
    CAST(len(list_filter(v, x -> isnan(x) OR abs(x) = 'Infinity'::DOUBLE)) AS INT) AS n_nonfinite,
    CASE WHEN len(list_filter(v, x -> isnan(x) OR abs(x) = 'Infinity'::DOUBLE)) = 0
         THEN round(sqrt(list_inner_product(v, v)), 6) END AS norm
  FROM corpus
)
SELECT vec_id, dim, n_nonfinite, norm,
       dim = 64 AS dim_ok,
       n_nonfinite = 0 AS finite_ok,
       (n_nonfinite = 0 AND norm >= 0.5 AND norm <= 2.0) AS norm_ok,
       (dim = 64 AND n_nonfinite = 0 AND norm >= 0.5 AND norm <= 2.0) AS ok
FROM scored ORDER BY vec_id
"""


def q_chat_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT conversation prep (operators/chat.py::chat_stats): JSON
    messages built deterministically from each doc's content hashes, with
    six variant shapes — valid 2-turn, system-led 3-turn, unknown role,
    broken alternation, malformed JSON, empty content — so every
    validation branch is exercised and oracle-checked.  Parse/validate/
    flatten are pure from_json + array codegen; no UDF, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    a = F.md5(F.coalesce(F.col("text"), F.lit("")))
    b = F.md5(F.concat(F.lit("b:"), F.coalesce(F.col("text"), F.lit(""))))
    m = F.col("doc_id") % 6
    turn = lambda role, c: F.concat(
        F.lit('{"role":"' + role + '","content":"'), c, F.lit('"}')
    )
    j = (
        F.when(m == 0, F.concat(F.lit("["), turn("user", a), F.lit(","), turn("assistant", b), F.lit("]")))
        .when(m == 1, F.concat(F.lit("["), turn("system", a), F.lit(","), turn("user", b), F.lit(","), turn("assistant", a), F.lit("]")))
        .when(m == 2, F.concat(F.lit("["), turn("bot", a), F.lit(","), turn("assistant", b), F.lit("]")))
        .when(m == 3, F.concat(F.lit("["), turn("user", a), F.lit(","), turn("user", b), F.lit("]")))
        .when(m == 4, F.concat(F.lit("["), turn("user", a)))  # truncated: malformed
        .otherwise(F.concat(F.lit("["), turn("user", a), F.lit(',{"role":"assistant","content":""}]')))
    )
    from mcpvectordb_spark.operators.chat import chat_stats

    return chat_stats(
        docs.select(F.col("doc_id").alias("id"), j.alias("messages")), "id", "messages"
    ).orderBy("id")


SQL_CHAT_STATS = """
WITH conv AS (
  SELECT doc_id AS id,
    CASE doc_id % 6
      WHEN 0 THEN '[{"role":"user","content":"' || md5(COALESCE(text,'')) || '"},{"role":"assistant","content":"' || md5('b:' || COALESCE(text,'')) || '"}]'
      WHEN 1 THEN '[{"role":"system","content":"' || md5(COALESCE(text,'')) || '"},{"role":"user","content":"' || md5('b:' || COALESCE(text,'')) || '"},{"role":"assistant","content":"' || md5(COALESCE(text,'')) || '"}]'
      WHEN 2 THEN '[{"role":"bot","content":"' || md5(COALESCE(text,'')) || '"},{"role":"assistant","content":"' || md5('b:' || COALESCE(text,'')) || '"}]'
      WHEN 3 THEN '[{"role":"user","content":"' || md5(COALESCE(text,'')) || '"},{"role":"user","content":"' || md5('b:' || COALESCE(text,'')) || '"}]'
      WHEN 4 THEN '[{"role":"user","content":"' || md5(COALESCE(text,'')) || '"}'
      ELSE '[{"role":"user","content":"' || md5(COALESCE(text,'')) || '"},{"role":"assistant","content":""}]'
    END AS j
  FROM documents
),
parsed AS (
  SELECT id,
    CASE WHEN json_valid(j) THEN
      json_transform(j, '[{"role":"VARCHAR","content":"VARCHAR"}]')
    END AS m
  FROM conv
),
feat AS (
  SELECT id, m,
    m IS NOT NULL AS parsed_ok,
    CASE WHEN m IS NOT NULL THEN list_transform(m, x -> x.role) END AS roles,
    CASE WHEN m IS NOT NULL THEN list_transform(m, x -> x.content) END AS contents
  FROM parsed
),
body AS (
  SELECT *,
    CASE WHEN parsed_ok AND len(roles) > 0 AND roles[1] = 'system'
         THEN roles[2:] ELSE roles END AS br
  FROM feat
),
checks AS (
  SELECT id, m, parsed_ok, roles, contents, br,
    COALESCE(parsed_ok AND len(list_filter(roles, r -> r IS NULL OR r NOT IN ('system','user','assistant'))) = 0, FALSE) AS roles_ok,
    COALESCE(parsed_ok AND len(list_filter(contents, c -> c IS NULL OR length(trim(c)) = 0)) = 0, FALSE) AS contents_ok,
    COALESCE(parsed_ok
      AND len(br) > 0 AND br[1] = 'user' AND br[-1] = 'assistant'
      AND br = list_transform(range(1, len(br) + 1),
                              i -> CASE WHEN i % 2 = 1 THEN 'user' ELSE 'assistant' END),
      FALSE) AS alternation_ok
  FROM body
)
SELECT id,
  CAST(COALESCE(len(m), -1) AS INT) AS n_turns,
  roles_ok,
  alternation_ok,
  (parsed_ok AND roles_ok AND contents_ok AND alternation_ok) AS valid,
  CAST(COALESCE(list_sum(list_transform(list_filter(m, x -> x.role = 'user'),
                                        x -> COALESCE(length(x.content), 0))), 0) AS BIGINT) AS user_chars,
  CAST(COALESCE(list_sum(list_transform(list_filter(m, x -> x.role = 'assistant'),
                                        x -> COALESCE(length(x.content), 0))), 0) AS BIGINT) AS assistant_chars,
  CASE WHEN parsed_ok AND roles_ok AND contents_ok AND alternation_ok THEN
    array_to_string(list_transform(m, x -> '<|' || x.role || '|>' || x.content), '')
  END AS flat_text
FROM checks ORDER BY id
"""


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (curation.py::assign_split),
    keyed on ``source`` so every document of a domain lands in one split
    — reported as per-split doc/domain counts with a coherence column
    (domains spanning >1 split — must be 0 by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    out = cu.assign_split(docs, "source", val_bp=1500, test_bp=1500)
    per_split = out.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_domains"),
    )
    straddlers = (
        out.select("source", "split").distinct()
        .groupBy("source").agg(F.count(F.lit(1)).alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_straddling"))
    )
    return per_split.crossJoin(F.broadcast(straddlers)).orderBy("split")


def _sql_train_split() -> str:
    h = _sql_hex48("'split:' || source")
    return f"""
WITH assigned AS (
  SELECT *, CASE WHEN ({h}) % 10000 < 1500 THEN 'val'
                 WHEN ({h}) % 10000 < 3000 THEN 'test'
                 ELSE 'train' END AS split
  FROM documents
),
per_split AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_domains
  FROM assigned GROUP BY split
),
straddle AS (
  SELECT CAST(count(*) AS BIGINT) AS n_straddling FROM (
    SELECT source FROM (SELECT DISTINCT source, split FROM assigned)
    GROUP BY source HAVING count(*) > 1
  )
)
SELECT split, n_docs, n_domains, n_straddling
FROM per_split CROSS JOIN straddle ORDER BY split
"""


def q_text_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated trigram-LM scoring of the corpus against itself
    (operators/ngram_lm.py — the full KenLM-style quality filter of
    CCNet/RefinedWeb; the unigram `text_logprob` is the cheap first
    gate).  Plants REVERSED-token copies of doc_id<20: their unigram
    distribution is identical to the originals — invisible to the unigram
    filter — while every trigram statistic shifts, and the full score
    table is oracle-checked.  (The rank-the-reversal-worse property needs
    a corpus with real sequential structure; it is asserted on one in
    test_textstats.py::test_ngram_lm_reversed_docs_rank_worse.)"""
    from mcpvectordb_spark.operators.ngram_lm import ngram_lm_score

    docs = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"), "text")
    rev = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + _PLANT_OFFSET).alias("id"),
            F.array_join(
                F.reverse(
                    F.filter(
                        F.split(dd.normalize_text(F.col("text")), " "),
                        lambda t: t != "",
                    )
                ),
                " ",
            ).alias("text"),
        )
    )
    return ngram_lm_score(docs.unionByName(rev), "id", "text").orderBy("id")


SQL_TEXT_NGRAM_LM = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET} AS id,
         array_to_string(list_reverse(list_filter({_sql_words('text')}, t -> t <> '')), ' ') AS text
  FROM documents WHERE doc_id < 20),
toks AS (SELECT id, list_filter({_sql_words('text')}, t -> t <> '') AS w FROM corpus),
uni AS (SELECT id, unnest(w) AS t FROM toks),
n_total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
-- grams join as 48-bit hashes, mirroring the operator
uni_c AS (SELECT {_sql_hex48('t')} AS ku, CAST(count(*) AS BIGINT) AS cu FROM uni GROUP BY 1),
big_c AS (
  SELECT {_sql_hex48("b1 || ' ' || b2")} AS kb, CAST(count(*) AS BIGINT) AS cb FROM (
    SELECT w[r.i] AS b1, w[r.i+1] AS b2
    FROM toks, UNNEST(range(1, len(w))) AS r(i) WHERE len(w) >= 2)
  GROUP BY 1),
occ AS (
  SELECT id,
         {_sql_hex48("w[r.i] || ' ' || w[r.i+1] || ' ' || w[r.i+2]")} AS k3,
         {_sql_hex48("w[r.i] || ' ' || w[r.i+1]")} AS k12,
         {_sql_hex48("w[r.i+1] || ' ' || w[r.i+2]")} AS k23,
         {_sql_hex48('w[r.i+1]')} AS ku2,
         {_sql_hex48('w[r.i+2]')} AS ku3
  FROM toks, UNNEST(range(1, len(w)-1)) AS r(i) WHERE len(w) >= 3),
tri_c AS (SELECT k3, CAST(count(*) AS BIGINT) AS c3 FROM occ GROUP BY 1),
scored AS (
  SELECT o.id, ln(0.5*t.c3/b12.cb + 0.3*b23.cb/u2.cu + 0.2*u3.cu/n.n) AS lp
  FROM occ o
  JOIN tri_c t ON t.k3 = o.k3
  JOIN big_c b12 ON b12.kb = o.k12
  JOIN big_c b23 ON b23.kb = o.k23
  JOIN uni_c u2 ON u2.ku = o.ku2
  JOIN uni_c u3 ON u3.ku = o.ku3
  CROSS JOIN n_total n)
SELECT id, CAST(count(*) AS BIGINT) AS n_trigrams,
       round(avg(lp), 6) AS avg_logp,
       round(exp(-avg(lp)), 4) AS ppl
FROM scored GROUP BY id ORDER BY id
"""


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 adjacent-character pair frequencies — one BPE training
    iteration's merge statistic (textstats.py::bpe_pair_counts)."""
    docs = load_table(spark, sf_dir, "documents")
    return ts.bpe_pair_counts(docs.select("text"), "text", top_n=40)


SQL_BPE_PAIRS = f"""
WITH words AS (
  SELECT w FROM (SELECT {_sql_words('text')} AS ws FROM documents), UNNEST(ws) AS t(w)
  WHERE len(t.w) >= 2
),
pairs AS (
  SELECT substr(w, i, 1) || ' ' || substr(w, i + 1, 1) AS pair
  FROM words, UNNEST(range(1, len(w))) AS r(i)
)
SELECT pair, CAST(count(*) AS BIGINT) AS cnt
FROM pairs GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 40
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: canonical md5 + polynomial rolling hash."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        ts.md5_fingerprint(t).alias("md5_fp"),
        ts.rolling_fingerprint(t).alias("rolling_fp"),
    )


SQL_TEXT_FINGERPRINT = f"""
SELECT doc_id,
  md5({_sql_norm('text')}) AS md5_fp,
  CASE WHEN text IS NULL THEN NULL ELSE
    list_reduce(
      list_concat([CAST(0 AS BIGINT)],
                  list_transform(string_split({_sql_norm('text')}, ''), c -> CAST(ascii(c) AS BIGINT))),
      (a, b) -> (a*31 + b) % 2147483647)
  END AS rolling_fp
FROM documents
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (dup-line fraction, top-bigram
    fraction, gated flag) per document; two planted degenerate docs
    exercise the flag=true paths deterministically."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            (_PLANT_OFFSET + 1, "spam line\nspam line\nspam line\none real line"),
            (_PLANT_OFFSET + 2, " ".join(["buy now"] * 20)),
        ],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(planted)
    cols = ts.repetition_columns("text")
    return corpus.select("doc_id", *[c.alias(n) for n, c in cols.items()])


SQL_TEXT_REPETITION = rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    ({_PLANT_OFFSET + 1}, 'spam line' || chr(10) || 'spam line' || chr(10) || 'spam line' || chr(10) || 'one real line'),
    ({_PLANT_OFFSET + 2}, repeat('buy now ', 19) || 'buy now')) v(doc_id, text)),
feat AS (
  SELECT doc_id,
    list_filter(string_split(COALESCE(text,''), chr(10)), l -> trim(l) <> '') AS lines,
    list_filter(regexp_split_to_array(trim(lower(COALESCE(text,''))), '\s+'), t -> t <> '') AS words
  FROM corpus),
bg AS (
  SELECT doc_id, lines,
    CASE WHEN len(words) >= 2
         THEN list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])
         ELSE CAST([] AS VARCHAR[]) END AS bigrams
  FROM feat),
m AS (
  SELECT doc_id, len(lines) AS nl, len(bigrams) AS nb,
    CASE WHEN len(lines) > 0 THEN 1.0 - len(list_distinct(lines))/len(lines) ELSE 0.0 END AS dlf,
    CASE WHEN len(bigrams) > 0
         THEN list_max(list_transform(list_distinct(bigrams), b -> len(list_filter(bigrams, x -> x = b))))/len(bigrams)
         ELSE 0.0 END AS tbf
  FROM bg)
SELECT doc_id, round(dlf, 6) AS dup_line_frac, round(tbf, 6) AS top_bigram_frac,
       ((nl >= 3 AND dlf > 0.30) OR (nb >= 10 AND tbf > 0.20)) AS repetitive_flag
FROM m
"""


def q_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-2 signal composition: repetition (Gopher), unigram log-prob
    (CCNet proxy, corpus-5th-percentile gate), and span-level cross-doc
    duplication fused into one auditable verdict per document.  Three
    planted offenders (looped banner, word salad, verbatim span copy) must
    each draw their own reason; gates apply in fixed order so every doc
    gets exactly one verdict."""
    from mcpvectordb_spark.operators.dedup import dup_span_fraction
    from mcpvectordb_spark.operators.textstats import repetition_features, unigram_logprob

    docs = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"), "text")
    first_text = docs.orderBy("id").limit(1).select(F.col("text").alias("t0"))
    plants = spark.range(1).crossJoin(F.broadcast(first_text)).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(_PLANT_OFFSET + 1).cast("long").alias("id"),
                    F.lit("spam line\nspam line\nspam line\none real line").alias("text"),
                ),
                F.struct(
                    F.lit(_PLANT_OFFSET + 2).cast("long").alias("id"),
                    F.lit("zxqv kjwp qmfg ybdn xxzz vvkk ppqq rrss").alias("text"),
                ),
                F.struct(F.lit(_PLANT_OFFSET + 3).cast("long").alias("id"), F.col("t0").alias("text")),
            )
        ).alias("s")
    ).select("s.id", "s.text")
    corpus = docs.unionByName(plants)

    rep = repetition_features(corpus, "id", "text").select("id", "repetitive_flag")
    lp = unigram_logprob(corpus, "id", "text").select("id", "avg_logprob")
    spans = dup_span_fraction(corpus, "id", "text", k=8).select("id", "dup_frac")
    p05 = lp.agg(F.expr("percentile(avg_logprob, 0.05)").alias("p05"))

    joined = (
        corpus.select("id")
        .join(rep, "id", "left")
        .join(lp, "id", "left")
        .join(spans, "id", "left")
        .crossJoin(F.broadcast(p05))
    )
    verdict = (
        F.when(F.col("repetitive_flag"), F.lit("repetitive"))
        .when(F.col("avg_logprob") < F.col("p05"), F.lit("low_logprob"))
        .when(F.coalesce(F.col("dup_frac"), F.lit(0.0)) >= 0.5, F.lit("span_dup"))
        .otherwise(F.lit("kept"))
    )
    return joined.select("id", verdict.alias("verdict")).orderBy("id")


_SQL_V2_CORPUS = f"""corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL SELECT {_PLANT_OFFSET + 1}, 'spam line' || chr(10) || 'spam line' || chr(10) || 'spam line' || chr(10) || 'one real line'
  UNION ALL SELECT {_PLANT_OFFSET + 2}, 'zxqv kjwp qmfg ybdn xxzz vvkk ppqq rrss'
  UNION ALL SELECT {_PLANT_OFFSET + 3}, (SELECT text FROM documents ORDER BY doc_id LIMIT 1)
)"""

SQL_CURATION_PIPELINE_V2 = rf"""
WITH {_SQL_V2_CORPUS},
feat AS (
  SELECT id,
    list_filter(string_split(COALESCE(text,''), chr(10)), l -> trim(l) <> '') AS lines,
    list_filter(regexp_split_to_array(trim(lower(COALESCE(text,''))), '\s+'), t -> t <> '') AS words
  FROM corpus),
bg AS (
  SELECT id, lines,
    CASE WHEN len(words) >= 2
         THEN list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])
         ELSE CAST([] AS VARCHAR[]) END AS bigrams
  FROM feat),
rep AS (
  SELECT id,
    ((len(lines) >= 3 AND 1.0 - len(list_distinct(lines))/len(lines) > 0.30)
     OR (len(bigrams) >= 10 AND
         list_max(list_transform(list_distinct(bigrams), b -> len(list_filter(bigrams, x -> x = b))))/len(bigrams) > 0.20))
    AS repetitive_flag
  FROM bg),
toks AS (
  SELECT id, t.term FROM (SELECT id, {_sql_words('text')} AS ws FROM corpus),
  UNNEST(ws) AS t(term) WHERE t.term <> ''),
freq AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
lp AS (
  SELECT id, avg(ln(c * 1.0 / n_total)) AS avg_logprob
  FROM toks JOIN freq USING (term) CROSS JOIN n GROUP BY id),
p05 AS (SELECT quantile_cont(avg_logprob, 0.05) AS p05 FROM lp),
wins AS (
  SELECT id, {_sql_hex48('t.win')} AS w48
  FROM (SELECT id, CASE WHEN len(ws) >= 8 THEN
          list_transform(range(1, len(ws)-8+2), i -> array_to_string(ws[i:i+7], ' '))
          ELSE CAST([] AS VARCHAR[]) END AS winlist
        FROM (SELECT id, {_sql_words('text')} AS ws FROM corpus)),
       UNNEST(winlist) AS t(win)),
per_win AS (SELECT w48, count(DISTINCT id) AS nd FROM wins GROUP BY w48),
spans AS (
  SELECT id, sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*) AS dup_frac
  FROM wins JOIN per_win USING (w48) GROUP BY id)
SELECT c.id,
  CASE WHEN rep.repetitive_flag THEN 'repetitive'
       WHEN lp.avg_logprob < p05.p05 THEN 'low_logprob'
       WHEN COALESCE(spans.dup_frac, 0.0) >= 0.5 THEN 'span_dup'
       ELSE 'kept' END AS verdict
FROM corpus c
LEFT JOIN rep ON c.id = rep.id
LEFT JOIN lp ON c.id = lp.id
LEFT JOIN spans ON c.id = spans.id
CROSS JOIN p05
ORDER BY c.id
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation verdicts over the exact-dup-planted corpus:
    quality + length + dedup gates with per-doc drop reasons (pipeline.py —
    the composition query for the training-data use case)."""
    from mcpvectordb_spark.pipeline import curate_corpus

    corpus = _exact_corpus(spark, sf_dir)
    out = curate_corpus(corpus, "id", "text", min_quality=0.5, min_words=10)
    return out.select("id", "n_words", "quality_score", "lang_pred", "drop_reason")


def _sql_curation() -> str:
    """Oracle twin of pipeline.curate_corpus over the exact-dup corpus:
    empty gate first, then length/quality, then survivors-first duplicate
    ranking (passing copies rank before failing ones within a group)."""
    selects, case_sql = _sql_lang_fragments()
    return rf"""
WITH corpus AS ({_SQL_EXACT_CORPUS}),
{_sql_quality_cte('corpus')},
l AS (SELECT id, {case_sql} AS lang_pred FROM (SELECT id, {selects} FROM corpus)),
g AS (
  SELECT q.id, q.text, q.n_words, q.quality_score,
         (text IS NULL OR regexp_replace(text, '\s+', '', 'g') = '') AS is_empty,
         (text IS NOT NULL AND regexp_replace(text, '\s+', '', 'g') <> ''
          AND n_words >= 10 AND quality_score >= 0.5) AS pass
  FROM q),
d AS (
  SELECT id, row_number() OVER (
           PARTITION BY CASE WHEN is_empty THEN NULL ELSE md5({_sql_norm('text')}) END
           ORDER BY (CASE WHEN pass THEN 0 ELSE 1 END), id) AS dup_rank
  FROM g)
SELECT g.id, g.n_words, g.quality_score, l.lang_pred,
       CASE WHEN g.is_empty THEN 'empty'
            WHEN g.n_words < 10 THEN 'too_short'
            WHEN g.quality_score < 0.5 THEN 'low_quality'
            WHEN d.dup_rank > 1 THEN 'duplicate'
            ELSE NULL END AS drop_reason
FROM g JOIN l ON l.id = g.id JOIN d ON d.id = g.id
"""


def q_corpus_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting per language (training-data planning numbers)."""
    from mcpvectordb_spark.pipeline import corpus_token_stats

    docs = load_table(spark, sf_dir, "documents")
    out = corpus_token_stats(docs, "text", "lang")
    return out.select(
        F.col("lang").alias("library"),
        "n_docs",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        "avg_tokens",
        F.col("max_tokens").cast("long").alias("max_tokens"),
    )


SQL_CORPUS_TOKEN_STATS = r"""
WITH t AS (
  SELECT lang, CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n
  FROM documents)
SELECT lang AS library,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       round(avg(n), 4) AS avg_tokens,
       CAST(max(n) AS BIGINT) AS max_tokens
FROM t GROUP BY lang
"""


# ===========================================================================
# 5b. Corpus curation at training-pipeline scale (operators/curation.py)
# ===========================================================================

def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: training docs sharing ≥50% of their
    3-gram shingles with a benchmark doc.  Eval = docs 0-49; train = the
    rest plus planted mutated copies of the eval docs (which the operator
    must flag).  Broadcast eval index → map-side overlap join."""
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") < 50).select(F.col("doc_id").alias("id"), "text")
    train = docs.filter(F.col("doc_id") >= 50).select(
        F.col("doc_id").alias("id"), "text"
    ).unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + _PLANT_OFFSET).alias("id"),
            F.concat(F.col("text"), F.lit(_NEARDUP_SUFFIX)).alias("text"),
        )
    )
    out = cu.decontaminate(train, eval_df, "id", "text", n=3, threshold=0.5)
    return out.select(
        "id",
        F.col("matched_evals").cast("long").alias("matched_evals"),
        F.round("overlap_frac", 6).alias("overlap_frac"),
    )


def _sql_decontaminate() -> str:
    shingles = _sql_shingles(_sql_words("text"), 3)
    h48 = _sql_hex48("shingle")
    return rf"""
WITH eval_set AS (SELECT doc_id AS id, text FROM documents WHERE doc_id < 50),
train AS (
  SELECT doc_id AS id, text FROM documents WHERE doc_id >= 50
  UNION ALL
  SELECT doc_id+{_PLANT_OFFSET} AS id, text || '{_NEARDUP_SUFFIX}' AS text
  FROM documents WHERE doc_id < 50),
-- shingles join as 48-bit hashes, mirroring the operator (raw text never
-- shuffles; identical hashing on both engines keeps the gate exact)
tsh AS (SELECT id, {h48} AS h FROM (SELECT id, unnest({shingles}) AS shingle FROM train)),
esh AS (SELECT DISTINCT {h48} AS h, id AS eval_id
        FROM (SELECT id, unnest({shingles}) AS shingle FROM eval_set)),
sizes AS (SELECT id, count(*) AS set_size FROM tsh GROUP BY id),
common AS (
  SELECT t.id, e.eval_id, count(*) AS common
  FROM tsh t JOIN esh e ON t.h = e.h
  GROUP BY 1, 2),
per_doc AS (
  SELECT id, max(common) AS max_common, CAST(count(*) AS BIGINT) AS matched_evals
  FROM common GROUP BY id)
SELECT p.id, p.matched_evals, round(p.max_common / s.set_size, 6) AS overlap_frac
FROM per_doc p JOIN sizes s ON p.id = s.id
WHERE p.max_common / s.set_size >= 0.5
"""


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same decontamination report, computed through the broadcast-Bloom
    map-side pre-prune (curation.py::bloom_prune).  The Bloom has no false
    negatives, so the oracle is the IDENTICAL exact SQL — the driver gate
    itself proves output equivalence of the scale path."""
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") < 50).select(F.col("doc_id").alias("id"), "text")
    train = docs.filter(F.col("doc_id") >= 50).select(
        F.col("doc_id").alias("id"), "text"
    ).unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + _PLANT_OFFSET).alias("id"),
            F.concat(F.col("text"), F.lit(_NEARDUP_SUFFIX)).alias("text"),
        )
    )
    out = cu.decontaminate(
        train, eval_df, "id", "text", n=3, threshold=0.5, bloom_bits=1 << 18, bloom_k=3
    )
    return out.select(
        "id",
        F.col("matched_evals").cast("long").alias("matched_evals"),
        F.round("overlap_frac", 6).alias("overlap_frac"),
    )


def q_decontaminate_bloom_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination probing a PERSISTED eval bloom AND a persisted exact
    eval index (curation.py::save_bloom/load_bloom + save_eval_index/
    load_eval_index): both tables are built once per (sf_dir, params) and
    written to parquet; subsequent runs never touch the eval TEXT — the
    bloom probe and the exact join both read persisted hashes, so the only
    per-run cost is the train-side scan.  In bench.py's warm/timed
    protocol the warm call pays the builds, so the timed number is the
    probe-only steady state of a real pipeline.  Oracle = the same exact
    SQL (bloom has no false negatives; the index is the exact join input),
    so the driver gate proves the persisted path's equivalence too."""
    import hashlib
    import os
    import tempfile

    n_bits, k, n_sh = 1 << 18, 3, 3
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") < 50).select(F.col("doc_id").alias("id"), "text")
    train = docs.filter(F.col("doc_id") >= 50).select(
        F.col("doc_id").alias("id"), "text"
    ).unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + _PLANT_OFFSET).alias("id"),
            F.concat(F.col("text"), F.lit(_NEARDUP_SUFFIX)).alias("text"),
        )
    )
    tag = hashlib.md5(f"{os.path.abspath(sf_dir)}:{n_bits}:{k}:{n_sh}".encode()).hexdigest()[:12]
    bpath = os.path.join(tempfile.gettempdir(), f"evalbloom_{tag}")
    ipath = os.path.join(tempfile.gettempdir(), f"evalidx_{tag}")
    def _build_bloom():
        e_sh = eval_df.select(F.explode(cu.word_shingles(F.col("text"), n_sh)).alias("shingle"))
        cu.save_bloom(
            cu.build_shingle_bloom(e_sh, "shingle", n_bits, k), bpath, n_bits, k
        )

    if not os.path.exists(os.path.join(bpath, "_SUCCESS")):
        _build_bloom()
    if not os.path.exists(os.path.join(ipath, "_SUCCESS")):
        cu.save_eval_index(cu.build_eval_index(eval_df, "id", "text", n_sh), ipath, n_sh)
    try:
        bloom = cu.load_bloom(spark, bpath, n_bits, k)
    except ValueError:
        # stale artifact from an older probe-hash scheme — rebuild once
        _build_bloom()
        bloom = cu.load_bloom(spark, bpath, n_bits, k)
    e_idx = cu.load_eval_index(spark, ipath, n_sh)
    out = cu.decontaminate(
        train, eval_df, "id", "text", n=n_sh, threshold=0.5,
        bloom_bits=n_bits, bloom_k=k, prebuilt_bloom=bloom, prebuilt_index=e_idx,
    )
    return out.select(
        "id",
        F.col("matched_evals").cast("long").alias("matched_evals"),
        F.round("overlap_frac", 6).alias("overlap_frac"),
    )


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution caps (source balancing): keep the 20 longest
    docs per pseudo-domain, explicit doc_id tiebreak.  Runs the skew-safe
    ``presalt`` pre-prune path — the oracle is the plain global window, so
    the gate proves the mega-domain mitigation is lossless."""
    docs = load_table(spark, sf_dir, "documents")
    out = cu.domain_quota(
        docs, "doc_id", cu.domain_of(F.col("source"), 8), 20,
        [F.desc("n_chars"), F.asc("doc_id")], presalt=4,
    )
    return out.select("doc_id", "domain", F.col("rk").cast("long").alias("rk"))


def _sql_domain_quota() -> str:
    return rf"""
WITH d AS (
  SELECT doc_id, n_chars,
         'd' || CAST({_sql_hex48('source')} % 8 AS VARCHAR) AS domain
  FROM documents),
r AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rk
  FROM d)
SELECT doc_id, domain, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 20
"""


# per-language sampling rates in basis points (10000 = keep all)
_SAMPLE_RATES_BP = {"en": 5000, "es": 2500, "zh": 1000}
_SAMPLE_DEFAULT_BP = 500


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES over a portable hash uniform) — longer documents are
    proportionally likelier; byte-identical on any cluster or engine."""
    docs = load_table(spark, sf_dir, "documents")
    out = cu.weighted_sample(docs, "doc_id", "n_chars", n=120)
    return out.select("doc_id", F.col("n_chars").alias("weight"), "sample_key").orderBy("doc_id")


def _sql_weighted_sample() -> str:
    u = f"({_sql_hex48(chr(39) + 'wsample:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} + 0.5) / 281474976710656.0"
    return f"""
WITH keyed AS (
  SELECT doc_id, n_chars AS weight, pow({u}, 1.0 / n_chars) AS k
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, weight, round(k, 9) AS sample_key
FROM keyed ORDER BY k DESC, doc_id ASC LIMIT 120
"""


def q_length_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile length-bucketing for curriculum ordering (curation.py::
    length_buckets): quartile thresholds computed once (scalar broadcast),
    assignment a pure projection — no global ntile window."""
    docs = load_table(spark, sf_dir, "documents")
    out = cu.length_buckets(docs.select("doc_id", "n_chars"), "doc_id", "n_chars", n_buckets=4)
    return (
        out.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_len"),
            F.max("n_chars").cast("long").alias("max_len"),
        )
        .orderBy("bucket")
    )


SQL_LENGTH_CURRICULUM = """
WITH t AS (
  SELECT quantile_disc(n_chars, 0.25) AS t0,
         quantile_disc(n_chars, 0.5)  AS t1,
         quantile_disc(n_chars, 0.75) AS t2
  FROM documents
),
b AS (
  SELECT doc_id, n_chars,
         1 + CASE WHEN n_chars > t0 THEN 1 ELSE 0 END
           + CASE WHEN n_chars > t1 THEN 1 ELSE 0 END
           + CASE WHEN n_chars > t2 THEN 1 ELSE 0 END AS bucket
  FROM documents CROSS JOIN t
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_len,
       CAST(max(n_chars) AS BIGINT) AS max_len
FROM b GROUP BY bucket ORDER BY bucket
"""


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): hashed unigram+bigram
    importance weights of every raw doc against a target split (sources
    src13/src8 stand in for the clean reference corpus), then Gumbel-top-k
    importance resampling — curation.py::dsir_select.  The m-row log-ratio
    table broadcasts; the corpus shuffles once (bucket agg) and aggregates
    once (per-doc sum); the Gumbel draw is hash-derived so the selected
    set is bit-reproducible, with a full DuckDB oracle twin."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.dsir_select(
        docs, "doc_id", "text", F.col("source").isin("src13", "src8"), k=100
    ).orderBy("rank")


_DSIR_U = (
    f"({_sql_hex48(chr(39) + 'dsir:' + chr(39) + ' || CAST(id AS VARCHAR)')}"
    " + 0.5) / 281474976710656.0"
)

SQL_DSIR_SELECT = f"""
WITH ws AS (
  SELECT doc_id AS id, source IN ('src13','src8') AS t,
         list_filter({_sql_words('text')}, w -> w <> '') AS w
  FROM documents
),
feats AS (
  SELECT id, t, u.f
  FROM (
    SELECT id, t,
           list_concat(w, CASE WHEN len(w) >= 2
             THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
             ELSE CAST([] AS VARCHAR[]) END) AS fs
    FROM ws
  ), UNNEST(fs) AS u(f)
),
bf AS (SELECT id, t, {_sql_hex48('f')} % 256 AS b FROM feats),
counts AS (
  SELECT b,
         CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS cr
  FROM bf GROUP BY b
),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr FROM counts),
ratio AS (
  SELECT b, ln((ct + 1.0) / (nt + 256.0)) - ln((cr + 1.0) / (nr + 256.0)) AS logr
  FROM counts CROSS JOIN tot
),
w AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_feats, round(sum(logr), 6) AS logw
  FROM bf JOIN ratio USING (b) WHERE NOT t GROUP BY id
),
keyed AS (
  SELECT id, n_feats, logw,
         round(logw - ln(-ln({_DSIR_U})), 6) AS key
  FROM w
),
ranked AS (
  SELECT id, n_feats, logw, key,
         CAST(row_number() OVER (ORDER BY key DESC, id ASC) AS INT) AS rank
  FROM keyed
)
SELECT id, n_feats, logw, key, rank FROM ranked WHERE rank <= 100 ORDER BY rank
"""


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL curation (operators/weburl.py): canonical URL
    (case/port/tracking-param/fragment normalization), registered-domain
    extraction (public-suffix aware), and the stripped-tracking-param
    audit count.  URLs are constructed deterministically from (source,
    doc_id) with four variant shapes — uppercase host + default https
    port + utm/gclid params + fragment; non-default port; bare host with
    no path; default http port with a tracking ``ref`` — so every
    normalization branch is exercised and oracle-checked.  Pure
    projection: no UDF, no shuffle beyond the output sort."""
    docs = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    url = (
        F.when(m == 0, F.concat(F.lit("HTTPS://WWW."), F.col("source"), F.lit(".Example.CO.UK:443/art/"), sid, F.lit("?utm_source=feed&b=2&a=1#frag")))
        .when(m == 1, F.concat(F.lit("http://sub."), F.col("source"), F.lit(".example.com:8080/p/"), sid, F.lit("?gclid=x&z=9")))
        .when(m == 2, F.concat(F.lit("https://"), F.col("source"), F.lit(".example.org")))
        .otherwise(F.concat(F.lit("http://"), F.col("source"), F.lit(".github.io:80/?ref=rss&q="), sid))
    )
    return (
        wu.url_features(docs.withColumn("url", url), "url")
        .select("doc_id", "url_host", "url_domain", "url_norm", "n_tracking_params")
        .orderBy("doc_id")
    )


_SQL_URL_TRACK = " OR ".join(
    f"starts_with(regexp_extract(x, '^([^=]*)', 1), '{t}')"
    for t in ("utm_", "gclid", "fbclid", "msclkid", "mc_eid", "ref")
)
_SQL_URL_SUFFIXES = ",".join(
    f"'{s}'"
    for s in (
        "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
        "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "com.ar",
        "com.tr", "co.in", "co.kr", "co.za", "co.nz",
    )
)

SQL_URL_NORMALIZE = f"""
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.CO.UK:443/art/' || CAST(doc_id AS VARCHAR) || '?utm_source=feed&b=2&a=1#frag'
      WHEN 1 THEN 'http://sub.' || source || '.example.com:8080/p/' || CAST(doc_id AS VARCHAR) || '?gclid=x&z=9'
      WHEN 2 THEN 'https://' || source || '.example.org'
      ELSE 'http://' || source || '.github.io:80/?ref=rss&q=' || CAST(doc_id AS VARCHAR)
    END AS url
  FROM documents
),
p AS (
  SELECT doc_id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS authority,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
    regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM u
),
h AS (
  SELECT *, lower(regexp_extract(authority, '^([^:]*)', 1)) AS host,
         regexp_extract(authority, ':([0-9]+)$', 1) AS port
  FROM p
),
d AS (
  SELECT *, string_split(host, '.') AS labels,
    list_filter(string_split(query, '&'), x -> x <> '') AS all_params,
    list_sort(list_filter(string_split(query, '&'),
                          x -> x <> '' AND NOT ({_SQL_URL_TRACK}))) AS kept
  FROM h
)
SELECT doc_id, host AS url_host,
  CASE WHEN len(labels) <= 2 THEN host
       WHEN array_to_string(labels[-2:], '.') IN ({_SQL_URL_SUFFIXES}) AND len(labels) >= 3
         THEN array_to_string(labels[-3:], '.')
       ELSE array_to_string(labels[-2:], '.') END AS url_domain,
  scheme || '://' || host ||
    CASE WHEN port <> '' AND NOT ((scheme='http' AND port='80') OR (scheme='https' AND port='443'))
         THEN ':' || port ELSE '' END ||
    CASE WHEN path = '' THEN '/' ELSE path END ||
    CASE WHEN array_to_string(kept, '&') <> '' THEN '?' || array_to_string(kept, '&') ELSE '' END AS url_norm,
  CAST(len(all_params) - len(kept) AS INT) AS n_tracking_params
FROM d ORDER BY doc_id
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: hash-gated Bernoulli with
    per-language rates — a pure filter (no RNG, no shuffle), identical
    verdicts on any cluster layout or engine."""
    docs = load_table(spark, sf_dir, "documents")
    out = cu.stratified_sample(
        docs, "doc_id", "lang", _SAMPLE_RATES_BP, default_bp=_SAMPLE_DEFAULT_BP
    )
    return out.select("doc_id", "lang")


def _sql_sample_stratified() -> str:
    gate = _sql_hex48("'sample:' || CAST(doc_id AS VARCHAR)")
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(_SAMPLE_RATES_BP.items())
    )
    return (
        f"SELECT doc_id, lang FROM documents "
        f"WHERE {gate} % 10000 < (CASE {cases} ELSE {_SAMPLE_DEFAULT_BP} END)"
    )


def q_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards; per-shard stats
    plus an order-sensitive checksum proving the in-shard positions match."""
    docs = load_table(spark, sf_dir, "documents")
    out = cu.assign_shards(docs, "doc_id", 8)
    return out.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.col("shard_pos") * (F.col("shard_ord") % 100003)).alias("order_checksum"),
    )


def _sql_train_shards() -> str:
    shard = _sql_hex48("'shard:' || CAST(doc_id AS VARCHAR)")
    ordh = _sql_hex48("'shard-ord:' || CAST(doc_id AS VARCHAR)")
    return rf"""
WITH s AS (
  SELECT doc_id, n_chars, {shard} % 8 AS shard, {ordh} AS shard_ord
  FROM documents),
r AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY shard_ord, doc_id) AS shard_pos
  FROM s)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(shard_pos * (shard_ord % 100003)) AS BIGINT) AS order_checksum
FROM r GROUP BY shard
"""


_PACK_BUDGET = 1024


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing over the 8 training shards
    (budget {_PACK_BUDGET} whitespace tokens): per packed sequence, how many
    docs start in it, their token mass, and how many straddle into the next
    sequence — the stats a dataloader manifest carries."""
    docs = load_table(spark, sf_dir, "documents")
    out = cu.pack_sequences(
        docs, "doc_id", ts.ws_token_count(F.col("text")), _PACK_BUDGET, 8
    )
    return (
        out.groupBy(
            F.col("shard").cast("long").alias("shard"),
            F.col("seq_first").cast("long").alias("seq"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(
                (F.col("seq_last") > F.col("seq_first")).cast("long")
            ).alias("n_straddle"),
        )
        .orderBy("shard", "seq")
    )


def _sql_pack_sequences() -> str:
    shard = _sql_hex48("'shard:' || CAST(doc_id AS VARCHAR)")
    ordh = _sql_hex48("'shard-ord:' || CAST(doc_id AS VARCHAR)")
    ntok = f"CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS BIGINT)"
    b = _PACK_BUDGET
    return rf"""
WITH s AS (
  SELECT doc_id, {ntok} AS n_tokens, {shard} % 8 AS shard, {ordh} AS shard_ord
  FROM documents),
o AS (
  SELECT *, sum(n_tokens) OVER (
      PARTITION BY shard ORDER BY shard_ord, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS tok_off
  FROM s),
p AS (
  SELECT shard, n_tokens, tok_off // {b} AS seq_first,
         greatest(tok_off // {b}, (tok_off + n_tokens - 1) // {b}) AS seq_last
  FROM o)
SELECT CAST(shard AS BIGINT) AS shard, CAST(seq_first AS BIGINT) AS seq,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN seq_last > seq_first THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
FROM p GROUP BY shard, seq_first
ORDER BY shard, seq
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a corpus with planted emails/phone numbers in
    docs 0-49 (the raw synthetic corpus contains none): per-doc audit
    counters + md5 of the scrubbed text.  Pure JVM regex — codegen'd,
    no Python in the loop."""
    docs = load_table(spark, sf_dir, "documents")
    idc = F.col("doc_id").cast("string")
    planted = F.when(
        F.col("doc_id") < 50,
        F.concat(
            F.col("text"), F.lit(" contact user"), idc, F.lit("@example.com or call 555-0"),
            idc, F.lit("00 now"),
        ),
    ).otherwise(F.col("text"))
    out = cu.scrub_pii(docs.withColumn("text", planted), "text")
    return out.select("doc_id", "n_emails", "n_phones", F.md5("clean_text").alias("clean_md5"))


def _sql_pii_scrub() -> str:
    email, phone = cu.EMAIL_RE, cu.PHONE_RE
    return rf"""
WITH planted AS (
  SELECT doc_id,
    CASE WHEN doc_id < 50 THEN
      text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-0'
           || CAST(doc_id AS VARCHAR) || '00 now'
    ELSE text END AS text
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phones,
  md5(regexp_replace(regexp_replace(text, '{email}', '{cu.EMAIL_TOKEN}', 'g'),
                     '{phone}', '{cu.PHONE_TOKEN}', 'g')) AS clean_md5
FROM planted
"""


# ===========================================================================
# 6. Event analytics (batch forms of the streaming operators)
# ===========================================================================

def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type (streaming twin exists in
    streaming.events.windowed_counts_stream)."""
    from mcpvectordb_spark.streaming.events import windowed_counts_batch

    ev = load_table(spark, sf_dir, "events")
    out = windowed_counts_batch(ev, "hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n_events", "sum_value", "n_users",
    )


SQL_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
"""


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 30 min) via lag + cumulative-sum windows."""
    from mcpvectordb_spark.streaming.events import sessionize_batch

    ev = load_table(spark, sf_dir, "events")
    s = sessionize_batch(ev, gap_minutes=30)
    return s.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events", "sum_value",
    )


SQL_EVENTS_SESSIONS = """
WITH l AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM l)
SELECT user_id, session_seq,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, session_seq
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation (metadata-in-a-string,
    reference store.py:31 pattern — SURVEY §2.8 F6)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_EVENTS_JSON = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event enriched with the user's latest
    prior click (operators/asof.py — union + carry-forward window; the
    DuckDB oracle uses its native ASOF JOIN)."""
    from mcpvectordb_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(purchases, clicks, ["user_id"], right_value_cols=["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round("value", 4).alias("purchase_value"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.round("asof_value", 4).alias("click_value"),
        # second granularity: DuckDB ROUNDS the file's nanosecond timestamps
        # to micros while Spark truncates — µs-level gaps differ by ±1
        (F.unix_seconds(F.date_trunc("second", F.col("ts")))
         - F.unix_seconds(F.date_trunc("second", F.col("asof_ts")))).alias("gap_s"),
    )


SQL_EVENTS_ASOF_JOIN = """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       round(p.value, 4) AS purchase_value,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       round(c.value, 4) AS click_value,
       CAST(epoch(date_trunc('second', p.ts)) - epoch(date_trunc('second', c.ts)) AS BIGINT) AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


def q_events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each signup enriched with the user's
    FIRST view within the following hour (direction='forward',
    tolerance_s=3600 — the full merge_asof surface).  Oracle mirrors it
    with a window-min over following views + the tolerance predicate."""
    from mcpvectordb_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    joined = asof_join(
        signups, views, ["user_id"], right_value_cols=["value"],
        direction="forward", tolerance_s=3600,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.round("asof_value", 4).alias("view_value"),
    )


SQL_EVENTS_ASOF_FORWARD = """
WITH s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
ranked AS (
  SELECT s.event_id, s.user_id, s.ts, v.ts AS m_ts, v.value AS m_value,
         row_number() OVER (PARTITION BY s.event_id
                            ORDER BY v.ts ASC, v.value ASC) AS rn
  FROM s LEFT JOIN v
    ON s.user_id = v.user_id AND v.ts >= s.ts
       AND epoch(v.ts) - epoch(s.ts) <= 3600
),
matched AS (SELECT * FROM ranked WHERE rn = 1)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
       strftime(m_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       round(m_value, 4) AS view_value
FROM matched
"""


def q_events_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join: per-user 30-minute view windows
    overlapping 30-minute purchase windows (operators/rangejoin.py::
    overlap_join — bin-bucketed with report-once canonicalisation; the
    oracle is the plain non-equi overlap join)."""
    from mcpvectordb_spark.operators.rangejoin import overlap_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("v_start"),
        F.expr("ts + INTERVAL 30 MINUTES").alias("v_end"),
        F.col("event_id").alias("v_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_start"),
        F.expr("ts + INTERVAL 30 MINUTES").alias("p_end"),
        F.col("event_id").alias("p_id"),
    )
    pairs = overlap_join(
        views, purchases, "v_start", "v_end", "p_start", "p_end",
        key_cols=["user_id"], bin_seconds=1800, broadcast_right=True,
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("v_id").alias("n_views"),
        F.countDistinct("p_id").alias("n_purchases"),
    )


SQL_EVENTS_OVERLAP_JOIN = """
WITH v AS (
  SELECT user_id, ts AS v_start, ts + INTERVAL 30 MINUTE AS v_end,
         event_id AS v_id
  FROM events WHERE event_type = 'view'),
p AS (
  SELECT user_id, ts AS p_start, ts + INTERVAL 30 MINUTE AS p_end,
         event_id AS p_id
  FROM events WHERE event_type = 'purchase')
SELECT v.user_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT v_id) AS BIGINT) AS n_views,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases
FROM v JOIN p ON v.user_id = p.user_id
             AND v.v_start < p.p_end AND p.p_start < v.v_end
GROUP BY v.user_id
"""


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: purchases landing inside any 2-hour
    error window of the same user (operators/rangejoin.py — bin-bucketed
    equi-join; the DuckDB oracle is the plain non-equi range join)."""
    from mcpvectordb_spark.operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("w_start"),
        F.expr("ts + INTERVAL 2 HOURS").alias("w_end"),
        F.col("event_id").alias("err_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id"), "value"
    )
    pairs = interval_join(
        purchases, errors, "ts", "w_start", "w_end",
        key_cols=["user_id"], bin_seconds=7200, broadcast_intervals=True,
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("p_id").alias("n_purchases"),
        F.countDistinct("err_id").alias("n_windows"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


SQL_EVENTS_INTERVAL_JOIN = """
WITH e AS (
  SELECT user_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end,
         event_id AS err_id
  FROM events WHERE event_type = 'error'),
p AS (
  SELECT user_id, ts, event_id AS p_id, value
  FROM events WHERE event_type = 'purchase')
SELECT p.user_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases,
       CAST(count(DISTINCT err_id) AS BIGINT) AS n_windows,
       round(sum(value), 4) AS sum_value
FROM p JOIN e ON p.user_id = e.user_id
             AND p.ts >= e.w_start AND p.ts < e.w_end
GROUP BY p.user_id
"""


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (grouping-sets class): order counts and value by
    (priority, status) with subtotals and a grand total."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
    )


SQL_ORDERS_ROLLUP = """
SELECT o_orderpriority, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_value
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def q_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation with GROUPING() disambiguation: every subtotal
    combination of (priority, status) plus grouping flags so NULL group
    keys and NULL subtotal markers can't collide."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_value"),
    )


SQL_ORDERS_CUBE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(o_totalprice), 4) AS avg_value
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def q_text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-30 word pairs by document-level PMI
    (textstats.py::doc_pmi_pairs) inside the df band [1%, 10%] of docs —
    the band prunes the pair explode before it happens."""
    import mcpvectordb_spark.operators.textstats as ts

    docs = load_table(spark, sf_dir, "documents")
    out = ts.doc_pmi_pairs(docs, "doc_id", "text")
    return out.select("term_a", "term_b", "n_pair", F.round("pmi", 6).alias("pmi"))


SQL_TEXT_PMI = rf"""
WITH words AS (
  SELECT DISTINCT doc_id AS doc,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS term
  FROM documents),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM words GROUP BY term),
band AS (
  SELECT term, df FROM dfreq, n
  WHERE df >= ceil(n_docs * 0.01) AND df <= floor(n_docs * 0.10)),
wb AS (SELECT doc, term, df FROM words JOIN band USING(term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, a.df AS df_a, b.df AS df_b,
         CAST(count(*) AS BIGINT) AS n_pair
  FROM wb a JOIN wb b ON a.doc = b.doc AND a.term < b.term
  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5),
scored AS (
  SELECT term_a, term_b, n_pair, ln(n_pair * n_docs / (df_a * df_b)) AS pmi
  FROM pairs, n)
SELECT term_a, term_b, n_pair, round(pmi, 6) AS pmi
FROM scored ORDER BY pmi DESC, term_a, term_b LIMIT 30
"""


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid-style readability as pure codegen expressions
    (textstats family): sentences by terminator runs, words by whitespace,
    syllables by vowel-group counting — the three classic proxies, with
    the deterministic integer-arithmetic declared as the spec and
    replayed by the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != "")
    n_words = F.size(words)
    n_sents = F.greatest(
        F.lit(1), F.size(F.filter(F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s) != ""))
    )
    # vowel-group syllable proxy: total count of [aeiouy]+ runs across words
    n_syll = F.greatest(
        F.lit(1),
        F.size(F.split(F.regexp_replace(F.lower(F.col("text")), r"[aeiouy]+", "\x01"), "\x01")) - 1,
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / F.greatest(F.lit(1), n_words).cast("double"))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.cast("int").alias("n_sents"),
        n_syll.cast("int").alias("n_syll"),
        F.round(flesch, 4).alias("flesch"),
    ).orderBy("doc_id")


SQL_TEXT_READABILITY = r"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS n_words,
       CAST(greatest(1, len(list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) <> ''))) AS INT) AS n_sents,
       CAST(greatest(1, len(regexp_split_to_array(regexp_replace(lower(text), '[aeiouy]+', chr(1), 'g'), chr(1))) - 1) AS INT) AS n_syll,
       round(206.835
             - 1.015 * (n_words * 1.0 / n_sents)
             - 84.6 * (n_syll * 1.0 / greatest(1, n_words)), 4) AS flesch
FROM documents ORDER BY doc_id
"""


def q_orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority, one column per order status."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


SQL_ORDERS_PIVOT = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_filled,
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_partial
FROM orders GROUP BY o_orderpriority
"""


def q_events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per event type (the approx variant —
    percentile_approx / t-digest — is the 100TB path; exact is used here
    so the oracle can hash-match)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    )


SQL_EVENTS_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(quantile_cont(value, 0.99), 4) AS p99,
       round(avg(value), 4) AS mean_value
FROM events GROUP BY event_type
"""


def q_events_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: per-user running total and 5-row moving average
    over the event stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias("running_total"),
        F.round(F.avg("value").over(w.rowsBetween(-4, 0)), 4).alias("moving_avg_5"),
    )


SQL_EVENTS_RUNNING = """
SELECT event_id, user_id,
       round(sum(value) OVER w_run, 4) AS running_total,
       round(avg(value) OVER w_avg, 4) AS moving_avg_5
FROM events
WINDOW w_run AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING),
       w_avg AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


# ===========================================================================
# 7. Relational analytics (TPC-H-shaped: agg / join / window / top-k)
# ===========================================================================

def q_events_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval RANGE frame: per-user trailing-10-minute sum/count over
    event time — the value-based frame shape (RANGE BETWEEN n PRECEDING)
    that rows-frames cannot express.  Keyed on epoch seconds so frame
    membership is tie-insensitive and engine-identical.

    Sub-second parity note: when events.parquet ships as TIMESTAMP(NANOS)
    both engines TRUNCATE to µs on read — Spark via the explicit
    ``ts div 1000`` in ``io.load_table``, DuckDB inside its parquet
    scanner (verified empirically on remainders ≥500 ns, incl. ``…999``);
    current driver testdata ships µs-native (TIMESTAMP_NTZ), where no
    conversion happens at all.  Either way the derived second key is the
    same floor() on both sides and frame membership cannot diverge.
    ``tests/test_entry.py::test_range_frame_key_parity`` pins this against
    the real file, full table, and would catch a DuckDB upgrade that
    switches the ns scanner to round-half-up."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("__tsec", F.unix_timestamp("ts"))
    w = Window.partitionBy("user_id").orderBy("__tsec").rangeBetween(-600, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("trail_sum_10m"),
        F.count(F.lit(1)).over(w).alias("trail_n_10m"),
    )


SQL_EVENTS_RANGE_FRAME = """
SELECT event_id, user_id,
       round(sum(value) OVER w, 4) AS trail_sum_10m,
       CAST(count(*) OVER w AS BIGINT) AS trail_n_10m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch(date_trunc('second', ts))
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
"""


def q_orders_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function family over a total order: ntile quartiles,
    percent_rank, cume_dist, and a lead() gap — the id tiebreak makes all
    four deterministic (ntile depends on row order, not just rank)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        F.round(F.col("o_totalprice") - F.lead("o_totalprice").over(w), 2).alias("gap_to_next"),
    )


SQL_ORDERS_ANALYTICS = """
SELECT o_orderkey, o_orderpriority,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume_dist,
       round(o_totalprice - lead(o_totalprice) OVER w, 2) AS gap_to_next
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): wide hash aggregate with
    map-side partial aggregation — the canonical scan-heavy scaling query."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): selective dimension broadcast
    join → fact join → agg → top-10."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            F.round("_rev", 2).alias("revenue"),
        )
    )


SQL_TPCH_Q3 = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY sum(l_extendedprice*(1-l_discount)) DESC, o_orderkey
LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape): 6-table join with small
    dimensions broadcast; revenue per nation in one region/year."""
    sf = lambda n: load_table(spark, sf_dir, n)  # noqa: E731
    region = sf("region").filter(F.col("r_name") == "ASIA")
    nation, cust, supp = sf("nation"), sf("customer"), sf("supplier")
    orders = sf("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = sf("lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )


SQL_TPCH_Q5 = """
SELECT n_name, round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): EXISTS decorrelated by
    Catalyst into a left-semi join on the fact table."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    # the synthetic schema has no commitdate; shipped-after-orderdate is
    # the equivalent correlated EXISTS predicate
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    probe = orders.join(li, (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate), "left_semi")
    return probe.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


SQL_TPCH_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change (TPC-H Q6 shape): pure filter + agg —
    everything pushes into the scan, no shuffle beyond the 1-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


SQL_TPCH_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): correlated scalar
    aggregate subquery — re-expressed as an aggregate + self-join, which
    is exactly Catalyst's decorrelation."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.8).alias("__thr"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("__thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


SQL_TPCH_Q17 = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.8 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    join with a join-side predicate, then a two-level aggregation —
    customers with zero orders must survive as c_count = 0."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


SQL_TPCH_Q13 = """
WITH co AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier diversity per part group (TPC-H Q16 shape): NOT IN
    subquery decorrelated as a broadcast left-anti join + distinct
    aggregation.  (The synthetic schema has no partsupp; lineitem is the
    part↔supplier bridge.)"""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#45")
        .select("p_partkey", "p_brand", "p_type")
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): IN over a grouped-HAVING
    subquery — decorrelated as an aggregate + semi join on the fact
    table, then the enrichment joins."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 180)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


SQL_TPCH_Q18 = """
SELECT c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 180)
GROUP BY c_name, o_orderkey, o_totalprice
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): EXISTS +
    NOT EXISTS double correlation over a self-joined fact table,
    decorrelated as a semi join plus an anti join.  (No commitdate in the
    synthetic schema; "late" = shipped > 60 days after the order date.)"""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    waiting = (
        # EXISTS: some other supplier contributed to the same order
        l1.join(l2, (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2), "left_semi")
        # NOT EXISTS: no other supplier was ALSO late on that order
        .join(l3, (l1.l_orderkey == l3.o3) & (l1.l_suppkey != l3.s3), "left_anti")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


SQL_TPCH_Q21 = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders o
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape): uncorrelated scalar
    aggregate subquery (kept in-plan as a broadcast 1-row cross join, not
    a driver collect) + NOT EXISTS anti join.  (No phone column; nation
    key is the grouping, 'no urgent orders' the anti predicate.)"""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, F.col("c_custkey") == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


SQL_TPCH_Q22 = """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def q_top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each priority (window top-k per group)."""
    from mcpvectordb_spark.operators.topk import top_k_per_group

    orders = load_table(spark, sf_dir, "orders")
    out = top_k_per_group(orders, ["o_orderpriority"], "o_totalprice", 3, tie_cols=["o_orderkey"])
    return out.select(
        "o_orderpriority", "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.col("rank").cast("int").alias("rank"),
    )


SQL_TOP_ORDERS_PER_PRIORITY = """
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS o_totalprice, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
"""


# ===========================================================================
# 8. Non-SQL-expressible operators (rows-only driver check)
# ===========================================================================

def _digest_gate(df: DataFrame) -> DataFrame:
    """Collapse a fully-deterministic result to one (n_rows, digest) row,
    computed in-plan: every row is rendered to a string (columns joined with
    0x1f, NULL → 0x00), the row-strings are canonically sorted, and the md5
    of their 0x1e-join is taken.  The matching oracle is a constant SELECT
    of the golden (n_rows, digest) captured at sf0.01 — turning a
    rows-only driver row into a real pass/fail value check for queries
    whose computation (chunker/embedder/byte kernels) DuckDB cannot run.
    Regenerate goldens with tools/regen_digests.py after any intended
    behavior change."""
    rowstr = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
    )
    return df.select(rowstr.alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.md5(F.concat_ws("\x1e", F.array_sort(F.collect_list("r")))).alias("digest"),
    )


def _sql_digest_gold(n_rows: int, digest: str) -> str:
    return f"SELECT CAST({n_rows} AS BIGINT) AS n_rows, '{digest}' AS digest"


def q_ingest_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ingest pipeline (convert→chunk→embed→store) over the documents
    table; returns per-library doc/chunk counts.  The recursive chunker is
    not SQL-expressible, but the output is deterministic (hash embedder,
    content-hash doc ids) → golden-digest gate."""
    import tempfile

    from mcpvectordb_spark.config import TEST
    from mcpvectordb_spark.ingest import ingest_batch
    from mcpvectordb_spark.store import ChunkStore

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias("source"),
        F.col("lang").alias("library"),
        F.col("text").alias("content"),
        F.lit(None).cast("string").alias("metadata"),
    )
    store = ChunkStore(spark, tempfile.mkdtemp(prefix="chunks_"), TEST)
    ingest_batch(raw, store, TEST, created_at="2026-01-01T00:00:00+00:00")
    counts = store.read().groupBy("library").agg(
        F.countDistinct("doc_id").alias("document_count"),
        F.count(F.lit(1)).alias("chunk_count"),
    )
    return _digest_gate(counts)


def q_search_ingested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end search over freshly-ingested chunks with the deterministic
    hash embedder (the reference's §3.1 hot path)."""
    import tempfile

    from mcpvectordb_spark.config import TEST
    from mcpvectordb_spark.embedder import HashEmbedder
    from mcpvectordb_spark.ingest import ingest_batch
    from mcpvectordb_spark.store import ChunkStore

    docs = load_table(spark, sf_dir, "documents").limit(200)
    raw = docs.select(
        F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias("source"),
        F.col("lang").alias("library"),
        F.col("text").alias("content"),
        F.lit(None).cast("string").alias("metadata"),
    )
    store = ChunkStore(spark, tempfile.mkdtemp(prefix="chunks_"), TEST)
    ingest_batch(raw, store, TEST, created_at="2026-01-01T00:00:00+00:00")
    qv = HashEmbedder(dim=TEST.embedding_dim, config=TEST).embed_query(SEARCH_QUERY)
    hits = knn_topk(store.read(), list(map(float, qv)), 10, tie_col="id")
    return _digest_gate(hits.select("id", "library", F.round("score", 6).alias("score")))


def q_neardup_lsh_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed cosine near-dup (scale path; hyperplanes are
    seeded literals — verified against the brute-force oracle in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # moderate-similarity regime → shallow planes + more tables for recall
    pairs = dd.embedding_neardup_pairs_lsh(
        emb, "vec_id", "embedding", threshold=0.35, num_planes=4, num_tables=8
    )
    return _digest_gate(pairs.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode over synthesized media payloads: WAV audio bytes
    are GENERATED deterministically per document (sine wave whose frequency/
    length derive from doc_id), then decoded by the REAL RIFF/WAVE kernel
    (header duration + per-window RMS/zero-crossing features from the
    actual samples — sources/multimodal.py).  Byte synthesis and DSP are
    not SQL-expressible → rows-only check."""
    from mcpvectordb_spark.sources.multimodal import MEDIA_SCHEMA, extract_audio_features

    docs = load_table(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(200)

    def synth(batches):
        import io
        import math
        import struct
        import wave

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                rate, freq = 4000, 100 + int(doc_id) % 300
                n = rate // 8 + int(doc_id) % 64
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(
                        b"".join(
                            struct.pack("<h", int(9000 * math.sin(2 * math.pi * freq * i / rate)))
                            for i in range(n)
                        )
                    )
                rows.append(
                    (f"m{doc_id}", "audio", "audio/wav", buf.getvalue(), None)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "modality", "mime_type", "payload", "meta"]
            )

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    feats = extract_audio_features(media, dim=8, fake=False)
    return _digest_gate(
        feats.select(
            "media_id",
            F.round("duration_s", 6).alias("duration_s"),
            "n_bytes",
            F.round(F.element_at("features", 1), 6).alias("rms_w1"),
            F.round(F.element_at("features", 5), 6).alias("zcr_w1"),
        )
    )


def q_multimodal_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup (sources/multimodal.py::dhash64/
    image_dhash_stage + dedup.py::hamming_neardup_pairs): 60 smooth-
    gradient PNGs are synthesized — ids 30..59 repeat the gradient of
    id−30 with a small patch perturbation — pixel-decoded by the REAL
    codec kernels, dHashed, and paired by the pigeonhole Hamming-block
    join (complete to dist ≤ 6).  Every (i, i+30) plant must meet at tiny
    distance; the codec/hash kernels are not SQL-expressible → digest
    gate (the pigeonhole join's completeness is brute-force-verified in
    test_dedup.py)."""
    from pyspark.sql import types as T

    from mcpvectordb_spark.sources.multimodal import image_dhash_stage

    docs = load_table(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(60)

    def synth(batches):
        import struct
        import zlib

        import pandas as pd

        def png_bytes(rows_px):
            raw = b""
            for row in rows_px:
                raw += b"\x00" + bytes(row)

            def chunk(tag, data):
                return (struct.pack(">I", len(data)) + tag + data
                        + struct.pack(">I", zlib.crc32(tag + data)))

            h, w = len(rows_px), len(rows_px[0]) // 3
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

        W = H = 48
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                seed = did % 30
                # `or` guard: a zero slope would flatten the gradient (an
                # all-equal-columns dHash collides across seeds)
                ax, by = ((seed * 7) % 11 - 5) or 3, ((seed * 13) % 9 - 4) or 2
                perturb = did >= 30
                img = []
                for y in range(H):
                    row = []
                    for x in range(W):
                        v = (ax * x + by * y + seed * 29) % 256
                        if perturb and 8 <= x < 12 and 8 <= y < 12:
                            v = (v + 24) % 256
                        row += [v, (v + seed) % 256, (v + 2 * seed) % 256]
                    img.append(row)
                rows.append((did, png_bytes(img)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(
        synth,
        schema=T.StructType(
            [T.StructField("media_id", T.LongType()), T.StructField("payload", T.BinaryType())]
        ),
    )
    hashed = image_dhash_stage(media)
    pairs = dd.hamming_neardup_pairs(hashed, "media_id", "dhash", bits=64, max_dist=6)
    return _digest_gate(pairs.orderBy("id_a", "id_b"))


def q_multimodal_video_framedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video SCENE dedup (sources/multimodal.py::
    video_frame_dhash_stage + dedup.hamming_neardup_pairs): 8 synthesized
    uncompressed-DIB AVIs — videos 4..7 replay the first three scenes of
    video v−4 with a small patch perturbation — are frame-sampled on the
    container clock by the REAL AVI decoder, each frame dHashed in the
    kernel (only 8-byte hashes reach the plan), and near-identical frames
    paired across videos; the per-video-pair rollup must find exactly the
    3 shared scenes per planted pair.  Codec/hash kernels are not
    SQL-expressible → digest gate."""
    from pyspark.sql import types as T

    from mcpvectordb_spark.sources.multimodal import video_frame_dhash_stage

    vids = load_table(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(8)

    def synth(batches):
        import struct

        import pandas as pd

        W = H = 24

        def frame_rows(scene, perturb):
            # md5-mixed block content (3×3-px blocks): gradients and
            # affine block formulas are DEGENERATE for dHash (adjacent-
            # cell DIFFERENCES cancel the scene term, every scene pair
            # collides); proper mixing gives each scene ~random 64 bits
            # while a small patch edit still flips only a few
            import hashlib

            def bv(bx, by_):
                return hashlib.md5(f"{bx},{by_},{scene}".encode()).digest()[0]

            rows = []
            for y in range(H - 1, -1, -1):  # bottom-up
                row = bytearray()
                for x in range(W):
                    v = bv(x // 3, y // 3)
                    if perturb and 4 <= x < 7 and 4 <= y < 7:
                        v = (v + 40) % 256
                    row += bytes(((v + 2) % 256, (v + 1) % 256, v))  # BGR
                rows.append(bytes(row))  # w*3 == 72, already 4-byte aligned
            return b"".join(rows)

        def avi(media_id):
            scenes = (
                [(media_id - 4) * 10 + i for i in range(3)]
                + [media_id * 10 + i for i in range(3, 6)]
                if media_id >= 4
                else [media_id * 10 + i for i in range(6)]
            )
            chunks = b""
            for s in scenes:
                data = frame_rows(s, perturb=media_id >= 4)
                chunks += b"00db" + struct.pack("<I", len(data)) + data
            avih = (struct.pack("<IIIII", 1_000_000, 0, 0, 0, len(scenes))
                    + bytes(12) + struct.pack("<II", W, H) + bytes(16))
            hdrl = (b"LIST" + struct.pack("<I", 4 + 8 + len(avih))
                    + b"hdrlavih" + struct.pack("<I", len(avih)) + avih)
            movi = b"LIST" + struct.pack("<I", 4 + len(chunks)) + b"movi" + chunks
            body = b"AVI " + hdrl + movi
            return b"RIFF" + struct.pack("<I", len(body)) + body

        for pdf in batches:
            yield pd.DataFrame(
                [(int(d), avi(int(d))) for d in pdf["doc_id"]],
                columns=["media_id", "payload"],
            )

    media = vids.mapInPandas(
        synth,
        schema=T.StructType(
            [T.StructField("media_id", T.LongType()), T.StructField("payload", T.BinaryType())]
        ),
    )
    hashed = video_frame_dhash_stage(media, every_s=1.0).select(
        (F.col("media_id") * 100 + F.col("frame_index")).alias("fid"), "dhash"
    )
    pairs = dd.hamming_neardup_pairs(hashed, "fid", "dhash", bits=64, max_dist=6)
    cross = pairs.filter((F.col("id_a") / 100).cast("long") != (F.col("id_b") / 100).cast("long"))
    rollup = (
        cross.groupBy(
            (F.col("id_a") / 100).cast("long").alias("video_a"),
            (F.col("id_b") / 100).cast("long").alias("video_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_frames"),
            F.max("dist").cast("int").alias("max_dist"),
        )
        .orderBy("video_a", "video_b")
    )
    return _digest_gate(rollup)


def q_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IMAGE codec path under the driver gate: PNG (filter-0 RGB) and
    24-bit BMP payloads are synthesized deterministically per doc_id, then
    decoded by the REAL pixel kernels (sources/multimodal.py::
    decode_image_pixels) — dimensions and features come from actual
    pixels.  Byte synthesis/decode is not SQL-expressible → digest gate
    (the audio twin is `multimodal_features`)."""
    from mcpvectordb_spark.sources.multimodal import MEDIA_SCHEMA, decode_images

    docs = load_table(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(200)

    def synth(batches):
        import struct
        import zlib

        import pandas as pd

        def png(w, h, seed):
            rows = b""
            for y in range(h):
                rows += b"\x00" + bytes(
                    (seed * 31 + y * 17 + x * 7 + c * 3) % 256
                    for x in range(w) for c in range(3)
                )

            def chunk(tag, data):
                return (struct.pack(">I", len(data)) + tag + data
                        + struct.pack(">I", zlib.crc32(tag + data)))

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))

        def bmp(w, h, seed):
            row_size = (w * 3 + 3) & ~3
            data = b""
            for y in range(h - 1, -1, -1):
                data += bytes(
                    (seed * 13 + y * 11 + x * 5 + c * 2) % 256
                    for x in range(w) for c in (2, 1, 0)
                ) + b"\x00" * (row_size - w * 3)
            info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
            return b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54) + info + data

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 9, 6 + d % 7
                if d % 2 == 0:
                    rows.append((f"i{d}", "image", "image/png", png(w, h, d), None))
                else:
                    rows.append((f"i{d}", "image", "image/bmp", bmp(w, h, d), None))
            yield pd.DataFrame(
                rows, columns=["media_id", "modality", "mime_type", "payload", "meta"]
            )

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    feats = decode_images(media, dim=8, fake=False)
    return _digest_gate(
        feats.select(
            "media_id", "width", "height", "format", "n_bytes",
            F.round(F.element_at("features", 1), 6).alias("mean_r"),
            F.round(F.element_at("features", 4), 6).alias("luma_std"),
        )
    )


def q_multimodal_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction over synthesized camera JPEGs
    (sources/multimodal.py::parse_exif — real APP1/TIFF IFD walk, both
    byte orders): per doc_id the fixture varies endianness, orientation,
    camera model, capture timestamp, and GPS presence; every 10th payload
    is an EXIF-less JPEG and every 13th is corrupt bytes — both must
    yield NULL rows, not task failures.  Byte parsing is not
    SQL-expressible → golden-digest gate."""
    from mcpvectordb_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        build_exif_jpeg,
        exif_metadata,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(200)

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 10 == 0:
                    payload = b"\xff\xd8\xff\xd9"  # JPEG, no EXIF
                elif d % 13 == 0:
                    payload = b"\xff\xd8\xff\xe1\x00\x08Exif"  # truncated APP1
                else:
                    payload = build_exif_jpeg(
                        byte_order="II" if d % 2 == 0 else "MM",
                        orientation=1 + d % 8,
                        make=f"Maker{d % 5}",
                        model=f"Cam-{d % 7}",
                        dt_original=f"2024:0{1 + d % 9}:15 10:2{d % 10}:00",
                        with_gps=d % 3 == 0,
                    )
                rows.append((f"x{d}", "image", "image/jpeg", payload, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "modality", "mime_type", "payload", "meta"]
            )

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    return _digest_gate(exif_metadata(media))


def q_ocr_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image→text conversion through the REAL OCR path: each document's
    head is rendered to a bitmap (a machine-generated 'screenshot of
    text'), pushed through converter.convert_bytes('bmp', ...) — which
    routes to the template-matching OCR kernel (mcpvectordb_spark/ocr.py)
    — and compared against the expected charset projection.  Every 9th
    payload is random noise that must take the error-row path, proving
    the confidence gate separates rendered text from photographs.  Byte
    render/decode is not SQL-expressible → golden-digest gate."""
    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").orderBy("doc_id").limit(100)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("roundtrip_ok", T.BooleanType()),
            T.StructField("text_md5", T.StringType()),
        ]
    )

    def run(batches):
        import hashlib
        import random
        import struct

        import pandas as pd

        from mcpvectordb_spark.converter import convert_bytes
        from mcpvectordb_spark.ocr import render_text_bmp, renderable

        def noise_bmp(seed, w=40, h=40):
            rng = random.Random(seed)
            row_size = (w * 3 + 3) & ~3
            data = b""
            for _ in range(h):
                data += bytes(rng.randrange(256) for _ in range(w * 3))
                data += b"\x00" * (row_size - w * 3)
            info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
            return b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54) + info + data

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                d = int(rec["doc_id"])
                if d % 9 == 0:
                    payload = noise_bmp(d)
                    expected = None
                else:
                    head = (rec["text"] or "")[:32]
                    payload = render_text_bmp(head)
                    lines = [l.rstrip() for l in renderable(head).split("\n")]
                    while lines and not lines[-1]:
                        lines.pop()
                    # whitespace-only heads render to no glyphs → the converter
                    # takes the error-row path; expect None like asr/flac_ingest
                    expected = "\n".join(lines).rstrip() or None
                try:
                    got = convert_bytes(payload, "bmp")
                    status = "converted"
                except NotImplementedError:
                    got, status = None, "error_row"
                ok = (got == expected) if expected is not None else (got is None)
                md5 = hashlib.md5((got or "").encode()).hexdigest()
                rows.append((d, status, bool(ok), md5))
            yield pd.DataFrame(rows, columns=["doc_id", "status", "roundtrip_ok", "text_md5"])

    return _digest_gate(docs.mapInPandas(run, schema=schema))


def q_asr_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio→text conversion through the REAL tone-ASR path (the audio
    twin of `ocr_ingest`): each document's head is encoded as a tone
    sequence, pushed through converter.convert_bytes('wav', ...) — which
    routes to the zero-crossing decoder (mcpvectordb_spark/asr.py) — and
    compared against the charset projection.  Every 9th payload is white
    noise that must take the error-row path.  Byte synthesis/decode is
    not SQL-expressible → golden-digest gate."""
    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").orderBy("doc_id").limit(60)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("roundtrip_ok", T.BooleanType()),
            T.StructField("text_md5", T.StringType()),
        ]
    )

    def run(batches):
        import hashlib
        import random
        import struct

        import pandas as pd

        from mcpvectordb_spark.asr import render_text_wav, renderable
        from mcpvectordb_spark.converter import convert_bytes

        def noise_wav(seed, n=8000):
            rng = random.Random(seed)
            samples = [rng.randint(-12000, 12000) for _ in range(n)]
            pcm = struct.pack("<%dh" % n, *samples)
            return (
                b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE" + b"fmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                + b"data" + struct.pack("<I", len(pcm)) + pcm
            )

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                d = int(rec["doc_id"])
                if d % 9 == 0:
                    payload, expected = noise_wav(d), None
                else:
                    head = (rec["text"] or "")[:24]
                    payload = render_text_wav(head)
                    expected = renderable(head).rstrip() or None
                try:
                    got = convert_bytes(payload, "wav")
                    status = "converted"
                except NotImplementedError:
                    got, status = None, "error_row"
                ok = (got == expected) if expected is not None else (got is None)
                md5 = hashlib.md5((got or "").encode()).hexdigest()
                rows.append((d, status, bool(ok), md5))
            yield pd.DataFrame(rows, columns=["doc_id", "status", "roundtrip_ok", "text_md5"])

    return _digest_gate(docs.mapInPandas(run, schema=schema))


def q_flac_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-audio→text conversion through the REAL FLAC codec
    (mcpvectordb_spark/flac.py) + tone-ASR: each document's head is tone-
    encoded, FLAC-compressed with a per-doc subframe mode (fixed0/1/2,
    lpc2, verbatim — every decoder path), pushed through
    converter.convert_bytes('flac', ...) and compared.  Every 9th payload
    is a non-tonal FLAC (pure 440 Hz) that must take the error-row path.
    Byte codec work is not SQL-expressible → golden-digest gate."""
    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").orderBy("doc_id").limit(40)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("mode", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("roundtrip_ok", T.BooleanType()),
            T.StructField("text_md5", T.StringType()),
        ]
    )
    modes = ["fixed0", "fixed1", "fixed2", "lpc2", "verbatim"]

    def run(batches):
        import hashlib
        import math

        import pandas as pd

        from mcpvectordb_spark.asr import BASE_HZ, CHARSET, GAP_S, RATE, STEP_HZ, TONE_S, renderable
        from mcpvectordb_spark.converter import convert_bytes
        from mcpvectordb_spark.flac import encode_flac

        def tone_pcm(text):
            samples = []
            for ch in renderable(text):
                f = BASE_HZ + CHARSET.index(ch) * STEP_HZ
                samples += [
                    int(12000 * math.sin(2 * math.pi * f * i / RATE))
                    for i in range(int(RATE * TONE_S))
                ]
                samples += [0] * int(RATE * GAP_S)
            return samples

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                d = int(rec["doc_id"])
                mode = modes[d % len(modes)]
                if d % 9 == 0:
                    pcm = [int(9000 * math.sin(2 * math.pi * 440 * i / RATE)) for i in range(RATE)]
                    expected = None
                else:
                    head = (rec["text"] or "")[:12]
                    pcm = tone_pcm(head)
                    expected = renderable(head).rstrip() or None
                payload = encode_flac([pcm], RATE, mode=mode) if pcm else b""
                try:
                    got = convert_bytes(payload, "flac")
                    status = "converted"
                except NotImplementedError:
                    got, status = None, "error_row"
                ok = (got == expected) if expected is not None else (got is None)
                md5 = hashlib.md5((got or "").encode()).hexdigest()
                rows.append((d, mode, status, bool(ok), md5))
            yield pd.DataFrame(rows, columns=["doc_id", "mode", "status", "roundtrip_ok", "text_md5"])

    return _digest_gate(docs.mapInPandas(run, schema=schema))


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-shaped ingestion: documents are packed into synthetic
    multi-member-gzip WARC archives (64 docs per archive), then parsed back
    by the real WARC source (sources/warc.py) and converted from HTML.
    Byte synthesis/parse is not SQL-expressible → rows-only check."""
    from mcpvectordb_spark.sources.warc import parse_warc_stage

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").orderBy("doc_id").limit(256)
    packed = docs.withColumn("archive_id", (F.col("doc_id") / 64).cast("long"))

    def pack(key, pdf):
        import gzip

        import pandas as pd

        members = []
        for _, row in pdf.sort_values("doc_id").iterrows():
            body = f"<html><body><p>{row['text']}</p></body></html>".encode()
            http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            hdr = (
                "WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Record-ID: <urn:doc:{row['doc_id']}>\r\n"
                f"WARC-Target-URI: http://corpus.test/{row['doc_id']}\r\n"
                "WARC-Date: 2026-01-01T00:00:00Z\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode()
            members.append(gzip.compress(hdr + http + b"\r\n\r\n", compresslevel=1, mtime=0))
        return pd.DataFrame(
            {"archive": [f"synth-{key[0]:05d}.warc.gz"], "content": [b"".join(members)]}
        )

    archives = packed.groupBy("archive_id").applyInPandas(
        pack, schema="archive string, content binary"
    )
    records = parse_warc_stage(archives)
    per_archive = records.groupBy("archive").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.sum("n_bytes").cast("long").alias("payload_bytes"),
        F.count(F.when(F.col("http_status") == 200, 1)).cast("long").alias("n_ok"),
    )
    return _digest_gate(per_archive)


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level cross-document duplication signal (Lee et al. 2022
    style): fraction of each doc's 8-token sliding windows appearing in
    >=2 distinct docs (dedup.py::dup_span_fraction).  Planted near-dup
    pairs share their source windows -> both members flag high; the clean
    corpus has no cross-doc spans."""
    corpus = _near_corpus(spark, sf_dir)
    out = dd.dup_span_fraction(corpus, "id", "text", k=8)
    return out.filter(F.col("dup_windows") > 0).select(
        "id", "n_windows", "dup_windows", "dup_frac"
    )


_SQL_WINDOWS8 = (
    "CASE WHEN len(w) >= 8 THEN "
    "list_transform(range(1, len(w)-8+2), i -> array_to_string(w[i:i+7], ' ')) "
    "ELSE CAST([] AS VARCHAR[]) END"
)

SQL_DEDUP_SPANS = f"""
WITH corpus AS ({_SQL_NEAR_CORPUS}),
wins AS (
  SELECT id, {_sql_hex48('t.win')} AS w48
  FROM (SELECT id, {_SQL_WINDOWS8.replace('w', '__W__').replace('__W__', 'ws')} AS winlist
        FROM (SELECT id, {_sql_words('text')} AS ws FROM corpus)),
       UNNEST(winlist) AS t(win)
),
per_win AS (SELECT w48, count(DISTINCT id) AS nd FROM wins GROUP BY w48)
SELECT id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows,
       round(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_frac
FROM wins JOIN per_win USING (w48)
GROUP BY id
HAVING sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) > 0
"""


def q_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DESTRUCTIVE half of Lee et al. 2022 beside the `dedup_spans`
    signal (dedup.py::remove_dup_spans): tokens covered by any 8-token
    window occurring in ≥2 distinct docs are removed, survivors
    reassemble in order.  Planted near-dup pairs lose their shared spans
    from BOTH members (the plant's unique suffix survives); the clean
    corpus is untouched.  The oracle replays the rewrite exactly —
    cleaned text compared by md5."""
    corpus = _near_corpus(spark, sf_dir)
    out = dd.remove_dup_spans(corpus, "id", "text", k=8)
    return out.select(
        "id", "n_tokens", "n_removed", F.md5("cleaned_text").alias("cleaned_md5")
    ).orderBy("id")


SQL_DEDUP_SPAN_REMOVAL = f"""
WITH corpus AS ({_SQL_NEAR_CORPUS}),
base AS (SELECT id, {_sql_words('text')} AS w FROM corpus),
wins AS (
  SELECT id, r.i AS start,
         {_sql_hex48("array_to_string(w[r.i:r.i+7], ' ')")} AS w48
  FROM base, UNNEST(range(1, len(w)-8+2)) AS r(i) WHERE len(w) >= 8),
dup48 AS (
  SELECT w48 FROM (SELECT w48, count(DISTINCT id) AS nd FROM wins GROUP BY 1)
  WHERE nd >= 2),
covered AS (
  SELECT DISTINCT wn.id, p.pos
  FROM wins wn JOIN dup48 USING (w48), UNNEST(range(wn.start, wn.start+8)) AS p(pos)),
kept AS (
  SELECT b.id, t.pos, b.w[t.pos] AS tok
  FROM base b, UNNEST(range(1, len(b.w)+1)) AS t(pos)
  WHERE NOT EXISTS (SELECT 1 FROM covered c WHERE c.id = b.id AND c.pos = t.pos)),
agg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS h
  FROM kept GROUP BY id)
SELECT b.id, CAST(len(b.w) AS BIGINT) AS n_tokens,
       CAST(len(b.w) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(a.h, md5('')) AS cleaned_md5
FROM base b LEFT JOIN agg a USING (id)
ORDER BY b.id
"""


def q_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window aggregation driven to completion
    over the events file (real readStream → memory sink)."""
    import tempfile

    from pyspark.sql import types as T

    from mcpvectordb_spark.streaming.events import run_stream_to_memory

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stream_in_")
    ev.write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(ev.schema).parquet(d)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    name = "stream_hourly_out"
    out = run_stream_to_memory(stream, name, spark)
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n_events", "sum_value",
    )


def q_stream_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming Holt smoothing (streaming/stateful.py::
    holt_stream) driven to completion over the daily event-volume
    series: per-key (level, trend) group state via
    applyInPandasWithState, the live twin of events_holt's batch fold
    (binary-exact 0.5/0.25 constants, identical op order) — the oracle
    is the SAME recursive CTE as events_holt minus the forecast rows,
    so this is a full-SQL-gated streaming query, not a rows-only one."""
    import tempfile

    from mcpvectordb_spark.streaming.events import run_stream_to_memory
    from mcpvectordb_spark.streaming.stateful import holt_stream

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("k"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("t"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    d = tempfile.mkdtemp(prefix="stream_holt_")
    daily.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(daily.schema).parquet(d)
    out = run_stream_to_memory(
        holt_stream(stream), "stream_holt_out", spark
    )
    return out.select(
        F.col("k").alias("event_type"),
        "t",
        F.col("x").cast("long").alias("n"),
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("fitted", 6).alias("fitted"),
    )


SQL_STREAM_HOLT = """
WITH RECURSIVE daily AS (
  SELECT event_type AS k,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT k, t, x, row_number() OVER (PARTITION BY k ORDER BY t) AS rk
  FROM daily),
holt AS (
  SELECT k, rk, t, x, x AS l, CAST(0.0 AS DOUBLE) AS b, x AS fitted
  FROM ranked WHERE rk = 1
  UNION ALL
  SELECT r.k, r.rk, r.t, r.x,
         0.5 * r.x + 0.5 * (h.l + h.b) AS l,
         0.25 * (0.5 * r.x + 0.5 * (h.l + h.b) - h.l) + 0.75 * h.b AS b,
         h.l + h.b AS fitted
  FROM holt h JOIN ranked r ON r.k = h.k AND r.rk = h.rk + 1)
SELECT k AS event_type, t, CAST(x AS BIGINT) AS n,
       round(l, 6) AS level, round(b, 6) AS trend, round(fitted, 6) AS fitted
FROM holt
"""


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming sessionization via the built-in session_window
    (streaming/events.py::sessionize_stream) driven to completion — the
    streaming twin of events_sessions."""
    import tempfile

    from mcpvectordb_spark.streaming.events import run_stream_to_memory, sessionize_stream

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stream_sess_")
    ev.write.mode("overwrite").parquet(d)
    out = run_stream_to_memory(
        sessionize_stream(spark, d, ev.schema, gap="30 minutes", watermark="4 hours"),
        "stream_sessions_out",
        spark,
    )
    return out.select(
        "user_id",
        F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.col("n_events"),
    ).orderBy("user_id", "session_start")


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    cross-micro-batch exact dedup over a planted-duplicate document stream
    (streaming/stateful.py::dedup_stream).  Each document is streamed
    twice across separate files (= separate micro-batches in file order);
    exactly one survivor per content hash must emerge."""
    import tempfile

    from mcpvectordb_spark.streaming.stateful import dedup_stream

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id"), F.md5(F.col("text")).alias("content_hash"))
        .orderBy("doc_id")
        .limit(500)
    )
    d = tempfile.mkdtemp(prefix="stream_dedup_")
    docs.write.mode("overwrite").parquet(f"{d}/b0")
    docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).write.mode("overwrite").parquet(f"{d}/b1")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{d}/b*")
    )
    survivors = dedup_stream(stream, "content_hash", order_cols=["doc_id"])
    q = (
        survivors.writeStream.format("memory")
        .queryName("stream_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return (
        spark.table("stream_dedup_out")
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_survivors"),
            F.countDistinct("content_hash").cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("doc_id") < 1_000_000, 1).otherwise(0)).cast("long").alias("n_first_batch"),
        )
    )


def q_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming last-touch attribution (streaming/stateful.py::
    attribution_stream): events split into two time-ordered micro-batches,
    per-user touch state carried across them, conversions credited to the
    stored touch within 7 days.  Rolled up per channel IDENTICALLY to
    events_attribution, so this stream query carries that query's full
    SQL oracle — the strongest gate any stream here has."""
    import tempfile

    from mcpvectordb_spark.streaming.stateful import attribution_stream

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("user_id").alias("user"),
        F.col("event_id").alias("eid"),
        F.unix_timestamp("ts").alias("t"),
        F.col("event_type").alias("etype"),
        F.col("value").alias("v"),
    )
    split_t = base.agg(F.expr("percentile(t, 0.5)")).first()[0]
    d = tempfile.mkdtemp(prefix="stream_attr_")
    # one file per half: maxFilesPerTrigger=1 makes each file ONE
    # micro-batch, and a user's rows must not straddle same-batch files
    # (within-batch order is only restored per micro-batch)
    base.filter(F.col("t") < split_t).coalesce(1).write.mode("overwrite").parquet(f"{d}/b0")
    base.filter(F.col("t") >= split_t).coalesce(1).write.mode("overwrite").parquet(f"{d}/b1")
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{d}/b*")
    )
    conv = attribution_stream(stream, "purchase")
    q = (
        conv.writeStream.format("memory")
        .queryName("stream_attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return (
        spark.table("stream_attr_out")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.round(F.sum("v"), 2).alias("attributed_value"),
        )
    )


def q_events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pattern (operators/sketches.py::rollup_partials/
    rollup_merge): daily partial moments merged to per-type totals with
    derived avg/variance — the merge touches only partial rows, so a
    refresh appends one day of partials instead of rescanning history.
    The oracle computes the same totals directly from the base table,
    proving the partial/merge decomposition exact."""
    from mcpvectordb_spark.operators.sketches import rollup_merge, rollup_partials

    ev = load_table(spark, sf_dir, "events")
    daily = rollup_partials(
        ev, [F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")], "value"
    )
    merged = rollup_merge(daily, ["event_type"])
    return merged.select(
        "event_type",
        "n_rows",
        F.round("sum_v", 4).alias("sum_v"),
        F.round("min_v", 6).alias("min_v"),
        F.round("max_v", 6).alias("max_v"),
        F.round("avg_v", 6).alias("avg_v"),
        F.round("var_pop", 4).alias("var_pop"),
    ).orderBy("event_type")


SQL_EVENTS_INCREMENTAL_ROLLUP = """
SELECT event_type,
       CAST(count(value) AS BIGINT) AS n_rows,
       round(sum(value), 4) AS sum_v,
       round(min(value), 6) AS min_v,
       round(max(value), 6) AS max_v,
       round(avg(value), 6) AS avg_v,
       round(var_pop(value), 4) AS var_pop
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_orders_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction (operators/bloomjoin.py): orders (fact)
    pre-pruned by a kilobyte bitset over the SELECTIVE customer key set
    (one market segment, low balance) before the exact join — the
    deterministic form of AQE's runtime bloom join.  The oracle is the
    PLAIN join with no bloom anywhere, so the gate proves the prune is
    lossless (no false negatives), not merely plausible."""
    from mcpvectordb_spark.operators.bloomjoin import bloom_reduce_join

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") < 1000))
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    joined = bloom_reduce_join(orders, cust, "o_custkey", "c_custkey")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__rev"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.round("__rev", 2).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


SQL_ORDERS_BLOOM_JOIN = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal < 1000
GROUP BY 1 ORDER BY 1
"""


def q_events_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point-frequency estimates (sketches.py::cms_sketch/
    cms_estimate): a (4 × 256) mergeable counter table over user_id, probed
    for the 20 lowest users, each estimate emitted beside its exact count
    with the CMS contract as in-plan booleans — est ≥ true (always) and
    est ≤ true + ⌈e·N/width⌉ (the ε-bound).  Hashing is the portable
    48-bit md5 fold, so the oracle replays the sketch EXACTLY — estimates,
    not just bounds, must match."""
    from mcpvectordb_spark.operators.sketches import cms_estimate, cms_sketch

    DEPTH, WIDTH = 4, 256
    ev = load_table(spark, sf_dir, "events")
    sk = cms_sketch(ev, "user_id", depth=DEPTH, width=WIDTH)
    items = ev.select("user_id").filter(F.col("user_id") < 20).distinct()
    est = cms_estimate(sk, items, "user_id", depth=DEPTH, width=WIDTH)
    true_c = (
        ev.filter(F.col("user_id") < 20)
        .groupBy(F.col("user_id").cast("string").alias("item"))
        .agg(F.count(F.lit(1)).cast("long").alias("true_c"))
    )
    n = ev.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        est.join(true_c, "item")
        .crossJoin(F.broadcast(n))
        .select(
            "item",
            "true_c",
            "est",
            (F.col("est") >= F.col("true_c")).alias("over_ok"),
            (
                F.col("est")
                <= F.col("true_c")
                + F.ceil(F.lit(2.718281828459045) * F.col("n") / WIDTH).cast("long")
            ).alias("within_eps"),
        )
        .orderBy("item")
    )


_SQL_CMS_H = _sql_hex48("p.item || chr(31) || CAST(p.d AS VARCHAR)")

SQL_EVENTS_CMS = f"""
WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS item FROM events),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
sk AS (
  SELECT p.d, {_SQL_CMS_H} % 256 AS bucket, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT item, r.d FROM ev, UNNEST(range(0, 4)) AS r(d)) p
  GROUP BY 1, 2),
items AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS item FROM events WHERE user_id < 20),
probes AS (
  SELECT p.item, p.d, {_SQL_CMS_H} % 256 AS bucket
  FROM (SELECT item, r.d FROM items, UNNEST(range(0, 4)) AS r(d)) p),
est AS (
  SELECT p.item, CAST(min(coalesce(s.c, 0)) AS BIGINT) AS est
  FROM probes p LEFT JOIN sk s ON s.d = p.d AND s.bucket = p.bucket
  GROUP BY 1),
truec AS (
  SELECT CAST(user_id AS VARCHAR) AS item, CAST(count(*) AS BIGINT) AS true_c
  FROM events WHERE user_id < 20 GROUP BY 1)
SELECT e.item, t.true_c, e.est,
       e.est >= t.true_c AS over_ok,
       e.est <= t.true_c + CAST(ceil(2.718281828459045 * n.n / 256) AS BIGINT) AS within_eps
FROM est e JOIN truec t USING (item) CROSS JOIN n
ORDER BY e.item
"""


def q_events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantiles (sketches.py::
    histogram_partials/histogram_quantile): daily (type, bin) partials
    merged to per-type p50/p95 estimates.  Like the HLL rollup, the
    approximation quality is oracle-gated IN-PLAN: the emitted booleans
    compare the estimate to the exact DISCRETE percentile within one bin
    width; the oracle emits exact percentiles and literal TRUE, so
    estimator drift fails the hash gate.

    Why percentile_disc, not percentile_cont: the rank-q order statistic
    always lies inside the bin the cumulative walk lands on, so
    |est − disc| ≤ bin width is a THEOREM.  The interpolated cont
    quantile sits between two order statistics that can straddle distant
    bins in a sparse tail — at sf0.001 that gap exceeded any fixed
    tolerance (caught by the cross-scale sweep)."""
    from mcpvectordb_spark.operators.sketches import histogram_partials, histogram_quantile

    LO, HI, BINS = 0.0, 640.0, 1280  # bin width 0.5
    ev = load_table(spark, sf_dir, "events")
    partials = histogram_partials(
        ev, [F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")],
        "value", LO, HI, BINS,
    )
    est = histogram_quantile(partials, ["event_type"], [0.5, 0.95], LO, HI, BINS)
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("x50"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("x95"),
    )
    tol = (HI - LO) / BINS
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            F.round("x50", 4).alias("p50"),
            F.round("x95", 4).alias("p95"),
            (F.abs(F.col("q_50") - F.col("x50")) <= tol).alias("p50_within_tol"),
            (F.abs(F.col("q_95") - F.col("x95")) <= tol).alias("p95_within_tol"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_QUANTILE_SKETCH = """
SELECT event_type,
       round(quantile_disc(value, 0.5), 4) AS p50,
       round(quantile_disc(value, 0.95), 4) AS p95,
       TRUE AS p50_within_tol,
       TRUE AS p95_within_tol
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed anomaly detection: hourly event counts per type scored as
    z-scores against the trailing 24-hour window (current hour excluded —
    a point must not normalize itself); |z| >= 3 flags.  Pure window
    algebra over the pre-aggregated hourly table, so the expensive input
    is one keyed agg and the scan never re-reads raw events per window."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_seconds(F.col("hour")))
        .rangeBetween(-24 * 3600, -3600)
    )
    scored = (
        hourly.withColumn("mu", F.avg("n").over(w))
        .withColumn("sd", F.stddev_pop("n").over(w))
        .withColumn("nw", F.count("n").over(w))
        # need a full day of history and nonzero spread to score
        .filter((F.col("nw") >= 24) & (F.col("sd") > 0))
        .withColumn("z", (F.col("n") - F.col("mu")) / F.col("sd"))
    )
    return scored.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n",
        F.round("z", 4).alias("z"),
        (F.abs(F.col("z")) >= 3.0).alias("anomaly"),
    ).orderBy("hour", "event_type")


SQL_EVENTS_ANOMALIES = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT hour, event_type, n,
         avg(n) OVER w AS mu,
         stddev_pop(n) OVER w AS sd,
         count(n) OVER w AS nw
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch(hour)
               RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING)
)
SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, event_type, n,
       round((n - mu) / sd, 4) AS z,
       (abs((n - mu) / sd) >= 3.0) AS anomaly
FROM scored WHERE nw >= 24 AND sd > 0
ORDER BY hour, event_type
"""


def q_events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-path transition mining: the top-25 (event_type →
    next_event_type) transitions with counts and the share of each source
    type's outgoing traffic — the path-analysis primitive behind sankey /
    next-action dashboards.  One lead() window per user (events already
    cluster by user after the shuffle) + one keyed agg; ties broken by
    transition name so top-25 is total-ordered."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    by_src = trans.groupBy("src").agg(F.count(F.lit(1)).alias("src_total"))
    return (
        trans.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .join(F.broadcast(by_src), "src")
        .select("src", "dst", "n", F.round(F.col("n") / F.col("src_total"), 6).alias("share"))
        .orderBy(F.desc("n"), "src", "dst")
        .limit(25)
    )


SQL_EVENTS_PATHS = """
WITH trans AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events),
t2 AS (SELECT src, dst FROM trans WHERE dst IS NOT NULL),
by_src AS (SELECT src, count(*) AS src_total FROM t2 GROUP BY src)
SELECT t.src, t.dst, CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0 / max(b.src_total), 6) AS share
FROM t2 t JOIN by_src b USING (src)
GROUP BY t.src, t.dst
ORDER BY n DESC, t.src, t.dst
LIMIT 25
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered view→click→purchase funnel (operators/analytics.py
    ::funnel_counts): step i counts users converting with an event
    strictly after their step i-1 conversion time."""
    from mcpvectordb_spark.operators.analytics import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"]).orderBy("step")


SQL_EVENTS_FUNNEL = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.u
  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS step, 'view' AS step_name, CAST(count(*) AS BIGINT) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
) ORDER BY step
"""


def q_events_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: each transition must convert within 1 hour of
    the previous step (funnel_counts(within_s=3600)) — the 'converted
    within the session' marketing variant of `events_funnel`."""
    from mcpvectordb_spark.operators.analytics import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(
        ev, ["view", "click", "purchase"], within_s=3600
    ).orderBy("step")


SQL_EVENTS_FUNNEL_WINDOW = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'click' AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL 3600 SECOND
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.u
  WHERE e.event_type = 'purchase' AND e.ts > s2.t AND e.ts <= s2.t + INTERVAL 3600 SECOND
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS step, 'view' AS step_name, CAST(count(*) AS BIGINT) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
) ORDER BY step
"""


def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transition conversion latency distribution (analytics.py::
    funnel_latency): converting users' step-to-step delay in floored epoch
    seconds, p50/p90 per transition."""
    from mcpvectordb_spark.operators.analytics import funnel_latency

    ev = load_table(spark, sf_dir, "events")
    return funnel_latency(ev, ["view", "click", "purchase"]).orderBy("step")


SQL_EVENTS_FUNNEL_LATENCY = """
WITH ev AS (
  SELECT user_id AS u, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts FROM events),
s1 AS (SELECT u, min(ts) AS t FROM ev WHERE event_type = 'view' GROUP BY u),
s2 AS (
  SELECT e.u, min(e.ts) AS t2, min(s1.t) AS tp
  FROM ev e JOIN s1 ON e.u = s1.u
  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.u),
s3 AS (
  SELECT e.u, min(e.ts) AS t2, min(s2.t2) AS tp
  FROM ev e JOIN s2 ON e.u = s2.u
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.u)
SELECT * FROM (
  SELECT 2 AS step, 'click' AS step_name, CAST(count(*) AS BIGINT) AS n_users,
         round(quantile_cont(t2 - tp, 0.5), 4) AS p50_s,
         round(quantile_cont(t2 - tp, 0.9), 4) AS p90_s
  FROM s2
  UNION ALL
  SELECT 3, 'purchase', CAST(count(*) AS BIGINT),
         round(quantile_cont(t2 - tp, 0.5), 4),
         round(quantile_cont(t2 - tp, 0.9), 4)
  FROM s3
) ORDER BY step
"""


def q_events_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention at d1/d7 (operators/analytics.py::
    cohort_retention): users cohort on first active day; retained = any
    activity exactly d days later."""
    from mcpvectordb_spark.operators.analytics import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    out = cohort_retention(ev, [1, 7])
    return out.select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "n_new", "retained_d1", "retained_d7",
    ).orderBy("cohort_day")


SQL_EVENTS_COHORTS = """
WITH activity AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS day FROM events
),
cohorts AS (SELECT u, min(day) AS cohort_day FROM activity GROUP BY u),
aged AS (
  SELECT a.u, c.cohort_day, date_diff('day', c.cohort_day, a.day) AS age_days
  FROM activity a JOIN cohorts c ON a.u = c.u
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(count(DISTINCT CASE WHEN age_days = 0 THEN u END) AS BIGINT) AS n_new,
       CAST(count(DISTINCT CASE WHEN age_days = 1 THEN u END) AS BIGINT) AS retained_d1,
       CAST(count(DISTINCT CASE WHEN age_days = 7 THEN u END) AS BIGINT) AS retained_d7
FROM aged GROUP BY cohort_day ORDER BY cohort_day
"""


def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 users by event count via Misra–Gries candidates +
    exact recount (operators/sketches.py::heavy_hitters) — the full-data
    shuffle is replaced by a per-partition sketch whose output is bounded
    by the sketch capacity, then a candidates-only keyed agg."""
    from mcpvectordb_spark.operators.sketches import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    hh = heavy_hitters(ev, "user_id", k=20, capacity=2048)
    return hh.select(F.col("key").cast("long").alias("user_id"), F.col("cnt").alias("n_events"), "rank")


SQL_EVENTS_HEAVY_HITTERS = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(row_number() OVER (ORDER BY count(*) DESC, CAST(user_id AS VARCHAR) ASC) AS INT) AS rank
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
ORDER BY n_events DESC, CAST(user_id AS VARCHAR) ASC
LIMIT 20
"""


def q_events_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketch rollup (operators/sketches.py): daily per-type
    distinct-user sketches unioned to per-type totals, validated IN-PLAN
    against the exact distinct count.  The oracle emits the exact count and
    a literal TRUE — if the sketch union ever drifts past tolerance the
    boolean flips and the value-hash gate fails, so the approximation
    quality itself is oracle-checked."""
    from mcpvectordb_spark.operators.sketches import merge_estimates, sketch_rollup

    ev = load_table(spark, sf_dir, "events")
    daily = sketch_rollup(
        ev, [F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")],
        "user_id",
    )
    merged = merge_estimates(daily, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        F.col("n_rows").cast("long").alias("n_events"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * 0.02 + 1
        ).alias("sketch_within_2pct"),
    )


SQL_EVENTS_DISTINCT_ROLLUP = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS sketch_within_2pct
FROM events GROUP BY event_type
"""


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join (purchase↔click within 1 hour per
    user) driven to completion; per-user pair counts.  Streaming execution
    is not ANSI-SQL-expressible → rows-only check (the batch twin's
    equality with the stream is asserted in test_streaming.py)."""
    import tempfile

    from mcpvectordb_spark.streaming.events import (
        purchase_click_pairs_stream,
        run_stream_to_memory,
    )

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stream_join_in_")
    ev.write.mode("overwrite").parquet(d)
    stream = purchase_click_pairs_stream(spark, d, ev.schema, within_minutes=60)
    out = run_stream_to_memory(stream, "stream_join_out", spark)
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("p_id").alias("n_purchases"),
        F.round(F.sum("p_value"), 4).alias("sum_value"),
    )


# ===========================================================================
# 8b. Round-2 curation additions: C4 line-level dedup, mixture sampling
# ===========================================================================

def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level corpus dedup (Raffel et al. 2020 §2.2): lines
    occurring ≥3 times corpus-wide are boilerplate, stripped from every doc.
    Ten planted docs share two boilerplate lines (a cookie banner and a
    rights notice) around a unique middle line — the removable paths; the
    real docs are single-line word salad, all kept."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.range(10).select(
        (F.col("id") + _PLANT_OFFSET).alias("doc_id"),
        F.concat(
            F.lit("COOKIE NOTICE: we use cookies\nunique line "),
            F.col("id").cast("string"),
            F.lit("\n(c) ALL RIGHTS RESERVED"),
        ).alias("text"),
    )
    corpus = docs.unionByName(planted)
    return dd.dedup_lines(corpus, "doc_id", "text", min_count=3)


SQL_DEDUP_LINES = rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT {_PLANT_OFFSET} + i,
         'COOKIE NOTICE: we use cookies' || chr(10) ||
         'unique line ' || CAST(i AS VARCHAR) || chr(10) ||
         '(c) ALL RIGHTS RESERVED'
  FROM range(10) t(i)),
arrs AS (
  SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS arr FROM corpus),
l AS (
  -- two same-length unnests zip positionally in DuckDB (no WITH ORDINALITY)
  SELECT doc_id, unnest(range(len(arr))) AS pos, unnest(arr) AS line,
         trim(unnest(arr)) AS t
  FROM arrs),
boiler AS (
  SELECT t FROM l WHERE t <> '' GROUP BY t HAVING count(*) >= 3),
j AS (
  SELECT l.doc_id, l.pos, l.line,
         (l.t <> '' AND boiler.t IS NOT NULL) AS removable
  FROM l LEFT JOIN boiler ON l.t = boiler.t)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (removable) AS BIGINT) AS n_removed,
       md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE NOT removable), '')) AS clean_md5
FROM j GROUP BY doc_id
"""


_MIX_WEIGHTS_BP = {"d0": 3000, "d1": 2500, "d2": 1500, "d3": 1000}
_MIX_BUDGET = 120_000


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing under a token budget: per-domain keep-rates derived from
    target weights (DoReMi/Pile-style mixture) with exact integer math,
    realised as a deterministic hash-gate filter.  Output: the achieved
    mixture (docs, tokens, rate) per surviving domain."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "dom", cu.domain_of(F.col("source"))
    )
    out = cu.mixture_sample(
        docs, "doc_id", "dom", "n_chars", _MIX_WEIGHTS_BP, _MIX_BUDGET
    )
    return out.groupBy(F.col("dom").alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("kept_tokens"),
        F.max("rate_bp").cast("long").alias("rate_bp"),
    )


def _sql_mixture_sample() -> str:
    dom = f"'d' || CAST({_sql_hex48('source')} % 8 AS VARCHAR)"
    gate = _sql_hex48("'mix:' || CAST(doc_id AS VARCHAR)")
    weights = ", ".join(f"('{k}', {v})" for k, v in sorted(_MIX_WEIGHTS_BP.items()))
    return rf"""
WITH d AS (
  SELECT doc_id, n_chars, {dom} AS dom FROM documents),
avail AS (
  SELECT dom, CAST(sum(n_chars) AS BIGINT) AS avail_tokens FROM d GROUP BY dom),
w AS (SELECT * FROM (VALUES {weights}) w(dom, weight_bp)),
r AS (
  SELECT avail.dom, avail_tokens,
         CAST(coalesce(weight_bp, 0) AS BIGINT) * {_MIX_BUDGET} // 10000 AS target_tokens
  FROM avail LEFT JOIN w USING (dom)),
r2 AS (
  SELECT dom,
         CASE WHEN avail_tokens > 0
              THEN least(10000, target_tokens * 10000 // avail_tokens)
              ELSE 0 END AS rate_bp
  FROM r),
s AS (
  SELECT d.doc_id, d.n_chars, d.dom, r2.rate_bp
  FROM d JOIN r2 USING (dom)
  WHERE {gate} % 10000 < rate_bp)
SELECT dom AS domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS kept_tokens,
       CAST(max(rate_bp) AS BIGINT) AS rate_bp
FROM s GROUP BY dom
"""


# ===========================================================================
# 9. Round-4 additions: time-series shaping, SCD2, winnowing, attribution,
#    triangle counting, distributed-GD quality classifier
# ===========================================================================


def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with linear interpolation
    (operators/timeseries.py::resample_interpolate): events bucketed to an
    hourly grid per synthetic sensor (user_id % 50), interior holes
    linearly interpolated, edges nearest-neighbour filled.  The standard
    observability/IoT "resample and fill" — one keyed agg, a per-key
    sequence explode, one window."""
    from mcpvectordb_spark.operators.timeseries import resample_interpolate

    ev = load_table(spark, sf_dir, "events")
    out = resample_interpolate(
        ev, F.pmod(F.col("user_id"), F.lit(50)), "ts", "value", step_s=3600
    )
    # The raw values are exact centesimals, so interpolated points land
    # EXACTLY on round() boundaries (e.g. 3/8 between two cents = x.xx625)
    # and ±1ulp engine drift flips the rounded digit.  Quantize with an
    # epsilon bias instead: the 1e-4 nudge dwarfs float drift (~1e-10) but
    # is far below the ~0.01 spacing of distinct scaled rationals, so both
    # engines land on the same integer deterministically.
    return out.select(
        F.col("k").cast("long").alias("k"),
        "bucket",
        "observed",
        F.floor(F.col("v_filled") * 10000 + 0.5001).cast("long").alias("v_fill_e4"),
    )


SQL_EVENTS_GAPFILL = """
WITH obs AS (
  SELECT user_id % 50 AS k,
         (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600) * 3600 AS bucket,
         avg(value) AS v
  FROM events GROUP BY 1, 2),
rng AS (SELECT k, min(bucket) AS b0, max(bucket) AS b1 FROM obs GROUP BY k),
grid AS (SELECT k, unnest(generate_series(b0, b1, 3600)) AS bucket FROM rng),
j AS (SELECT g.k, g.bucket, o.v FROM grid g LEFT JOIN obs o USING (k, bucket)),
w AS (
  SELECT k, bucket, v,
    last_value(v IGNORE NULLS) OVER past AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER past AS pb,
    first_value(v IGNORE NULLS) OVER fut AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER fut AS nb
  FROM j
  WINDOW past AS (PARTITION BY k ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fut  AS (PARTITION BY k ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT CAST(k AS BIGINT) AS k, bucket, (v IS NOT NULL) AS observed,
       CAST(floor((CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * (bucket - pb) / (nb - pb) END) * 10000 + 0.5001) AS BIGINT) AS v_fill_e4
FROM w
"""


def q_customers_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build (operators/timeseries.py::scd2_history):
    each customer's order-priority observation stream collapsed into
    validity intervals — the warehouse "track attribute history" shape.
    Same-timestamp observations are made deterministic by the o_orderkey
    tiebreak."""
    from mcpvectordb_spark.operators.timeseries import scd2_history

    orders = load_table(spark, sf_dir, "orders")
    out = scd2_history(orders, "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    return out.select(
        F.col("key").alias("custkey"),
        F.col("attr").alias("priority"),
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )


SQL_CUSTOMERS_SCD2 = """
WITH seq AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders),
changes AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
  FROM seq WHERE prev IS NULL OR prev <> o_orderpriority)
SELECT o_custkey AS custkey, o_orderpriority AS priority,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       strftime(lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d') AS valid_to,
       (lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL) AS is_current
FROM changes
"""


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (textstats.py::winnowing_fingerprints,
    Schleimer et al. 2003): rightmost-min-per-window k-gram selection via
    the combined-key argmin trick — one window pass, no self-join.  Rolled
    up per doc (count + checksums) so the oracle compare stays compact;
    the operator itself returns the granular fingerprint set."""
    from mcpvectordb_spark.operators.textstats import winnowing_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    fp = winnowing_fingerprints(docs, "doc_id", "text", k=8, w=4, max_chars=500)
    return fp.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.sum("h40").alias("sum_h40"),
        F.sum("fp_pos").cast("long").alias("sum_pos"),
        F.min("fp_pos").cast("long").alias("first_pos"),
    )


SQL_WINNOWING = f"""
WITH base AS (
  SELECT doc_id, substr({_sql_norm('text')}, 1, 500) AS t FROM documents),
grams AS (
  SELECT doc_id, i AS pos,
         ({_sql_hex48("substr(t, CAST(i AS INT), 8)")}) % {1 << 40} AS h40
  FROM base, unnest(range(1, len(t) - 6)) AS u(i)
  WHERE len(t) >= 8),
keyed AS (
  SELECT doc_id, pos, h40 * {1 << 16} + ({(1 << 16) - 1} - pos) AS ck FROM grams),
sel AS (
  SELECT DISTINCT doc_id,
         min(ck) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS s
  FROM keyed QUALIFY pos >= 4),
fp AS (
  SELECT doc_id, {(1 << 16) - 1} - (s % {1 << 16}) AS fp_pos, s // {1 << 16} AS h40 FROM sel)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp, CAST(sum(h40) AS BIGINT) AS sum_h40,
       CAST(sum(fp_pos) AS BIGINT) AS sum_pos, CAST(min(fp_pos) AS BIGINT) AS first_pos
FROM fp GROUP BY doc_id
"""


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution (analytics.py::last_touch_attribution):
    purchase value credited to the user's most recent prior non-purchase
    event within 7 days, 'direct' otherwise; rolled up per channel.  One
    user-keyed window — no per-conversion join."""
    from mcpvectordb_spark.operators.analytics import last_touch_attribution

    ev = load_table(spark, sf_dir, "events")
    conv = last_touch_attribution(ev, "purchase")
    return conv.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.round(F.sum("v"), 2).alias("attributed_value"),
    )


SQL_EVENTS_ATTRIBUTION = """
WITH base AS (
  SELECT user_id AS u, event_id AS eid,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
         event_type AS etype, value AS v
  FROM events),
touched AS (
  SELECT u, eid, t, etype, v,
    last_value(CASE WHEN etype <> 'purchase' THEN etype END IGNORE NULLS)
      OVER prior AS touch_type,
    last_value(CASE WHEN etype <> 'purchase' THEN t END IGNORE NULLS)
      OVER prior AS touch_t
  FROM base
  WINDOW prior AS (PARTITION BY u ORDER BY t, eid ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT CASE WHEN touch_type IS NOT NULL AND t - touch_t <= 604800
            THEN touch_type ELSE 'direct' END AS channel,
       CAST(count(*) AS BIGINT) AS n_conversions,
       round(sum(v), 2) AS attributed_value
FROM touched WHERE etype = 'purchase'
GROUP BY 1
"""


def q_events_attribution_ushaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based 40-20-40 attribution (analytics.py::
    ushaped_attribution): purchase value split 40% first touch / 40%
    last touch / 20% across the middle of the 7-day journey, rolled up
    per channel — the multi-touch middle ground between last-touch
    (events_attribution) and Markov removal effects
    (events_attribution_markov), completing the attribution family.
    One user-keyed join with the window predicate inside it (touchless
    conversions keep their NULL row -> 'direct') and one per-conversion
    rank window; credits are a codegen CASE.  The oracle replays the
    join, ranks and weights."""
    from mcpvectordb_spark.operators.analytics import ushaped_attribution

    ev = load_table(spark, sf_dir, "events")
    credits = ushaped_attribution(ev, "purchase", window_days=7)
    return credits.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        F.countDistinct("ceid").alias("n_conversions"),
        F.round(F.sum("credit"), 4).alias("total_credit"),
        F.round(F.sum("credited_value"), 2).alias("attributed_value"),
    )


SQL_EVENTS_ATTRIBUTION_USHAPED = """
WITH base AS (
  SELECT user_id AS u, event_id AS eid,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
         event_type AS etype, value AS v
  FROM events),
conv AS (
  SELECT u, eid AS ceid, t AS ct, v FROM base WHERE etype = 'purchase'),
touch AS (
  SELECT u, eid AS teid, t AS tt, etype AS channel
  FROM base WHERE etype <> 'purchase'),
j AS (
  SELECT c.u, c.ceid, c.v,
         t.teid, t.tt, t.channel
  FROM conv c LEFT JOIN touch t
    ON t.u = c.u AND t.tt < c.ct AND c.ct - t.tt <= 604800),
ranked AS (
  SELECT u, ceid, v,
         COALESCE(channel, 'direct') AS channel,
         CASE WHEN teid IS NOT NULL THEN
           row_number() OVER (PARTITION BY u, ceid ORDER BY tt ASC, teid ASC)
         END AS rk,
         CASE WHEN teid IS NOT NULL THEN
           count(*) OVER (PARTITION BY u, ceid)
         END AS nt
  FROM j),
credited AS (
  SELECT u, ceid, channel,
         CAST(COALESCE(nt, 0) AS BIGINT) AS n_touches,
         CASE WHEN rk IS NULL THEN 1.0
              WHEN nt = 1 THEN 1.0
              WHEN nt = 2 THEN 0.5
              WHEN rk = 1 OR rk = nt THEN 0.4
              ELSE 0.2 / (CAST(nt AS DOUBLE) - 2) END AS credit,
         CASE WHEN rk IS NULL THEN 1.0
              WHEN nt = 1 THEN 1.0
              WHEN nt = 2 THEN 0.5
              WHEN rk = 1 OR rk = nt THEN 0.4
              ELSE 0.2 / (CAST(nt AS DOUBLE) - 2) END * v AS credited_value
  FROM ranked)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_credits,
       CAST(count(DISTINCT ceid) AS BIGINT) AS n_conversions,
       round(sum(credit), 4) AS total_credit,
       round(sum(credited_value), 2) AS attributed_value
FROM credited GROUP BY 1
"""


def q_events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted periodogram: spectral power of the hourly volume series
    at candidate periods (6h, 12h, 24h, 168h) per event type — the
    frequency-domain twin of events_acf, computed as the DIRECT DFT
    projection (A = sum y~ cos(wt), B = sum y~ sin(wt), power =
    (A^2+B^2)/n) rather than an FFT: candidate periods are known, the
    projections are MAP-ONLY trig products + one agg per (type, period),
    and there is no sequential dependency at all — embarrassingly
    parallel at any scale.  Mean-centering uses the exact integer sums
    (A = sum y cos - ybar sum cos).  Flags each type's dominant period
    by power (deterministic (power desc, period asc) tie-break)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).alias("y"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("t0", "t1")).alias("t")
    )
    dense = grid.join(hourly, ["event_type", "t"], "left").select(
        "event_type", "t", F.coalesce("y", F.lit(0)).alias("y")
    )
    per = dense.select(
        "event_type",
        "t",
        "y",
        F.explode(F.array(F.lit(6), F.lit(12), F.lit(24), F.lit(168))).alias(
            "period"
        ),
    ).select(
        "event_type",
        "period",
        "y",
        (
            F.lit(2.0) * F.lit(math.pi) * F.col("t").cast("double")
            / F.col("period")
        ).alias("w"),
    )
    agg = per.groupBy("event_type", "period").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.cos("w")).alias("syc"),
        F.sum(F.col("y") * F.sin("w")).alias("sys"),
        F.sum(F.cos("w")).alias("sc"),
        F.sum(F.sin("w")).alias("ss"),
    )
    nd = F.col("n").cast("double")
    ybar = F.col("sy").cast("double") / nd
    a = F.col("syc") - ybar * F.col("sc")
    b = F.col("sys") - ybar * F.col("ss")
    power = (a * a + b * b) / nd
    scored = agg.select(
        "event_type", "period", "n", power.alias("p_raw")
    )
    wd = Window.partitionBy("event_type").orderBy(
        F.col("p_raw").desc(), F.col("period").asc()
    )
    return scored.select(
        "event_type",
        "period",
        "n",
        F.round("p_raw", 6).alias("power"),
        (F.row_number().over(wd) == 1).alias("dominant"),
    )


SQL_EVENTS_PERIODOGRAM = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(t) AS t0, max(t) AS t1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(range(t0, t1 + 1)) AS t FROM bounds),
dense AS (
  SELECT g.event_type, g.t, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.t = g.t),
per AS (
  SELECT event_type, period, y,
         2.0 * pi() * CAST(t AS DOUBLE) / period AS w
  FROM dense CROSS JOIN (SELECT unnest([6, 12, 24, 168]) AS period) p),
agg AS (
  SELECT event_type, CAST(period AS INTEGER) AS period,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(y * cos(w)) AS syc, sum(y * sin(w)) AS sys,
         sum(cos(w)) AS sc, sum(sin(w)) AS ss
  FROM per GROUP BY 1, 2),
scored AS (
  SELECT event_type, period, n,
         ((syc - (CAST(sy AS DOUBLE) / n) * sc)
            * (syc - (CAST(sy AS DOUBLE) / n) * sc)
          + (sys - (CAST(sy AS DOUBLE) / n) * ss)
            * (sys - (CAST(sy AS DOUBLE) / n) * ss)) / CAST(n AS DOUBLE)
           AS p_raw
  FROM agg)
SELECT event_type, period, n, round(p_raw, 6) AS power,
       row_number() OVER (PARTITION BY event_type
                          ORDER BY p_raw DESC, period ASC) = 1 AS dominant
FROM scored
"""


def q_events_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov test (stats.py::
    ks_two_sample) of purchase vs view VALUE distributions in cents —
    the shape-sensitive nonparametric twin of events_mannwhitney
    (location): KS catches variance/shape drift a rank-sum test cannot.
    D is a max over value-block CDF gaps — exact integer ratios, one
    window over distinct cents, no raw-row sort — with the Smirnov 5%
    bound on lambda = D*sqrt(nm/(n+m)).  The oracle replays the block
    CDFs and the (diff desc, value asc) argmax."""
    from mcpvectordb_spark.operators.stats import ks_two_sample

    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return ks_two_sample(obs, "event_type", "cents", "purchase", "view")


SQL_EVENTS_KS = """
WITH obs AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE event_type IN ('purchase', 'view')),
blocks AS (
  SELECT v,
         CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM obs GROUP BY 1),
cum AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
  FROM blocks),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM blocks),
d AS (
  SELECT v, na, nb,
         abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb) AS diff
  FROM cum CROSS JOIN tot),
best AS (
  SELECT *, row_number() OVER (ORDER BY diff DESC, v ASC) AS rk FROM d
  QUALIFY rk = 1)
SELECT na AS n_a, nb AS n_b,
       round(diff, 6) AS d,
       v AS d_at_value,
       round(diff * sqrt(CAST(na AS DOUBLE) * nb / CAST(na + nb AS DOUBLE)), 6) AS lam,
       diff * sqrt(CAST(na AS DOUBLE) * nb / CAST(na + nb AS DOUBLE)) > 1.358 AS reject_95
FROM best
"""


def q_customers_eb_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage (stats.py::eb_shrink_rates) of
    per-customer fulfilled-order ('F') rates under a beta-binomial
    prior — the batting-average fix for "this customer is 100% because
    they ordered once": a method-of-moments Beta prior fits on
    customers with >= 5 orders (binomial noise would otherwise inflate
    the ensemble variance and collapse the prior) and every customer's
    rate pulls toward the prior mean in proportion to evidence.  Output
    pins the 20 most-shrunk customers (|raw - eb| desc, key asc) so the
    gate checks exactly the rows shrinkage exists for.  One moment agg,
    one broadcast prior row, codegen shrinkage."""
    from mcpvectordb_spark.operators.stats import eb_shrink_rates

    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("k"),
    )
    out = eb_shrink_rates(counts, "cust", "n", "k", min_n=5)
    w = Window.orderBy(
        F.abs(F.col("raw_rate") - F.col("eb_rate")).desc(), F.col("cust").asc()
    )
    return (
        out.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select(
            F.col("cust").alias("o_custkey"),
            "n",
            "k",
            "raw_rate",
            "alpha",
            "beta",
            "eb_rate",
            F.col("rk").cast("long").alias("rk"),
        )
    )


SQL_CUSTOMERS_EB_RATES = """
WITH counts AS (
  SELECT o_custkey AS cust, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM orders GROUP BY 1),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS c,
         sum(CAST(k AS DOUBLE) / n) AS sp,
         sum((CAST(k AS DOUBLE) / n) * (CAST(k AS DOUBLE) / n)) AS spp
  FROM counts WHERE n >= 5),
prior AS (
  SELECT CASE WHEN v > 0 AND scale > 0 THEN m * scale END AS alpha,
         CASE WHEN v > 0 AND scale > 0 THEN (1.0 - m) * scale END AS beta
  FROM (
    SELECT m, v, m * (1.0 - m) / v - 1.0 AS scale
    FROM (
      SELECT sp / CAST(c AS DOUBLE) AS m,
             spp / CAST(c AS DOUBLE)
               - (sp / CAST(c AS DOUBLE)) * (sp / CAST(c AS DOUBLE)) AS v
      FROM mom))),
shrunk AS (
  SELECT cust, n, k,
         round(CAST(k AS DOUBLE) / n, 6) AS raw_rate,
         round(alpha, 6) AS alpha, round(beta, 6) AS beta,
         round((k + alpha) / (n + alpha + beta), 6) AS eb_rate
  FROM counts CROSS JOIN prior)
SELECT cust AS o_custkey, n, k, raw_rate, alpha, beta, eb_rate,
       CAST(row_number() OVER (ORDER BY abs(raw_rate - eb_rate) DESC, cust ASC)
            AS BIGINT) AS rk
FROM shrunk
QUALIFY rk <= 20
"""


def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census of the co-purchase graph (graph.py::
    triangle_count — degree-ordered orientation, O(m^1.5) wedge fanout):
    edges = part pairs co-ordered in >= 2 orders.  The oracle counts the
    same triangles with the naive a<b<c 3-way join, so the gate proves the
    oriented algorithm exact."""
    from mcpvectordb_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    return triangle_count(edges)


SQL_COPURCHASE_TRIANGLES = """
WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT a.p AS a, b.p AS b
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) GROUP BY node)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
       (SELECT CAST(count(*) AS BIGINT)
        FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles
"""


_W2V_CACHE: dict = {}


def q_w2v_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED word embeddings end-to-end (operators/w2v.py — SGNS as
    SPPMI-matrix factorization, Levy & Goldberg 2014): distributed vocab +
    co-occurrence counts, vocab-bounded driver SVD, distributed mean-pool
    doc embedding, then cosine top-10 for a fixed probe doc.  The learned
    vectors carry real distributional semantics (unlike the seeded
    MiniTransformer).  SVD is not SQL-expressible -> golden-digest gate;
    word vectors are quantized to 6 dp before embedding so sub-ulp LAPACK
    drift cannot reach the digest."""
    from mcpvectordb_spark.operators.w2v import embed_documents_df, train_word_vectors

    dim = 32
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # train once per (session, sf_dir): the trained table is the persisted
    # artifact of a real pipeline (same steady-state pattern as the IVF
    # index and the decontamination bloom) — repeat queries only pay the
    # embed + search
    wq = _W2V_CACHE.get(sf_dir)
    if wq is None:
        wv = train_word_vectors(docs, "doc_id", "text", dim=dim, vocab_size=300, window=2)
        wq = wv.select(
            "term", "tid", F.transform("vector", lambda x: F.round(x, 6)).alias("vector")
        ).localCheckpoint(eager=True)
        _W2V_CACHE[sf_dir] = wq
    emb = embed_documents_df(docs, "doc_id", "text", wq, dim)
    probe = emb.filter(F.col("id") == 0).first()
    qv = [float(x) for x in probe["embedding"]]
    hits = knn_topk(emb.filter(F.col("id") != 0), qv, 10, tie_col="id")
    return _digest_gate(
        hits.select(F.col("id").cast("long"), F.round("score", 3).alias("score"))
    )


def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-recording audio dedup via spectral-peak constellation
    fingerprints (sources/audiofp.py — the Shazam landmark family): 30
    tone clips synthesized from doc heads, every 3rd clip also planted as
    a TIME-SHIFTED (9 frames of leading silence) HALF-AMPLITUDE copy.
    Landmarks are hashed (f1,f2,dt) peak pairs; matching is an inverted-
    index self-join with offset voting, so the planted copies must match
    their originals at dt=9 despite shift and gain.  FFT kernels are not
    SQL-expressible -> golden-digest gate."""
    from pyspark.sql import types as T

    from mcpvectordb_spark.sources.audiofp import audio_landmarks, match_clips

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").orderBy("doc_id").limit(30)
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches):
        import math
        import struct

        import pandas as pd

        from mcpvectordb_spark.asr import BASE_HZ, CHARSET, GAP_S, RATE, STEP_HZ, TONE_S, renderable

        def tone_pcm(text):
            samples = []
            for ch in renderable(text):
                if ch not in CHARSET:
                    continue
                f = BASE_HZ + CHARSET.index(ch) * STEP_HZ
                samples += [
                    int(12000 * math.sin(2 * math.pi * f * i / RATE))
                    for i in range(int(RATE * TONE_S))
                ]
                samples += [0] * int(RATE * GAP_S)
            return samples

        def wav(samples):
            pcm = struct.pack("<%dh" % len(samples), *samples)
            return (
                b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE" + b"fmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, RATE, RATE * 2, 2, 16)
                + b"data" + struct.pack("<I", len(pcm)) + pcm
            )

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                d = int(rec["doc_id"])
                pcm = tone_pcm((rec["text"] or "")[:12])
                if not pcm:
                    continue
                rows.append((f"clip{d}", wav(pcm)))
                if d % 3 == 0:
                    # 9 hop-lengths (128) of silence + half amplitude
                    shifted = [0] * (9 * 128) + [s // 2 for s in pcm]
                    rows.append((f"copy{d}", wav(shifted)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(synth, schema=schema)
    lm = audio_landmarks(media)
    # score >= 0.8: true copies concentrate ~100% of their landmarks in one
    # dt bin; merely-similar tone clips (shared words) top out ~0.65
    matches = match_clips(lm, min_votes=5, min_score=0.8)
    # best offset per pair (votes desc, dt tiebreak), originals vs copies only
    from pyspark.sql import Window as W

    best = (
        matches.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("id_a", "id_b").orderBy(F.col("votes").desc(), F.col("dt").asc())
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return _digest_gate(
        best.select("id_a", "id_b", "dt", "votes", F.round("score", 4).alias("score"))
    )


def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over hash-assigned variants (operators/
    stats.py::ab_test_ztest): converts = users with >= 3 purchases (the
    synthetic stream gives nearly every user one purchase, which would
    degenerate the pooled variance); the portable-md5 assignment lets the
    oracle replay the split exactly.  Two keyed aggs, one-row output."""
    from mcpvectordb_spark.operators.stats import ab_test_ztest

    ev = load_table(spark, sf_dir, "events")
    out = ab_test_ztest(ev, "purchase", min_conversions=3)
    return out.select(
        "n_a", "x_a", "n_b", "x_b",
        F.round("rate_a", 6).alias("rate_a"),
        F.round("rate_b", 6).alias("rate_b"),
        F.round("z", 6).alias("z"),
    )


SQL_EVENTS_AB_TEST = f"""
WITH users AS (
  SELECT user_id AS u,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 3 AS INT) AS converted
  FROM events GROUP BY user_id),
assigned AS (
  SELECT u, converted, ({_sql_hex48("'ab:' || CAST(u AS VARCHAR)")}) % 2 AS variant FROM users),
per AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n, CAST(sum(converted) AS BIGINT) AS x
  FROM assigned GROUP BY variant),
a AS (SELECT n AS n_a, x AS x_a FROM per WHERE variant = 0),
b AS (SELECT n AS n_b, x AS x_b FROM per WHERE variant = 1)
SELECT n_a, x_a, n_b, x_b,
       round(CAST(x_a AS DOUBLE)/n_a, 6) AS rate_a,
       round(CAST(x_b AS DOUBLE)/n_b, 6) AS rate_b,
       round(CASE WHEN x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN 0.0
             ELSE (CAST(x_a AS DOUBLE)/n_a - CAST(x_b AS DOUBLE)/n_b)
             / sqrt((CAST(x_a + x_b AS DOUBLE)/(n_a + n_b)) * (1 - CAST(x_a + x_b AS DOUBLE)/(n_a + n_b))
                    * (1.0/n_a + 1.0/n_b)) END, 6) AS z
FROM a, b
"""


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers by modified z-score (median/MAD, Iglewicz-Hoaglin;
    operators/stats.py::mad_outliers) per event_type.  The score is
    epsilon-quantized (same rationale as events_gapfill: exact-centesimal
    inputs make rational scores that land on round() boundaries)."""
    from mcpvectordb_spark.operators.stats import mad_outliers

    ev = load_table(spark, sf_dir, "events")
    out = mad_outliers(ev, "event_type", "value", threshold=3.5)
    return out.select(
        "event_id", "event_type", "value",
        F.floor(F.col("score") * 10000 + 0.5001).cast("long").alias("score_e4"),
    )


SQL_EVENTS_MAD_OUTLIERS = """
WITH med AS (
  SELECT event_type AS k, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1),
ad AS (
  SELECT e.event_id, e.event_type, e.value, m.med, abs(e.value - m.med) AS _ad
  FROM events e JOIN med m ON e.event_type = m.k),
mad AS (
  SELECT event_type AS k2, quantile_cont(_ad, 0.5) AS mad FROM ad GROUP BY 1),
scored AS (
  SELECT a.event_id, a.event_type, a.value,
         CASE WHEN m.mad > 0 THEN 0.6745 * a._ad / m.mad ELSE 0.0 END AS score
  FROM ad a JOIN mad m ON a.event_type = m.k2)
SELECT event_id, event_type, value,
       CAST(floor(score * 10000 + 0.5001) AS BIGINT) AS score_e4
FROM scored WHERE score >= 3.5
"""


def q_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning (operators/encoding.py::woe_binning):
    n_chars deciled by ntile (doc_id tiebreak), per-bin WOE + IV vs the
    is-English label — the credit-scoring feature prep, oracle-replayed
    bin edges and all."""
    from mcpvectordb_spark.operators.encoding import woe_binning

    docs = load_table(spark, sf_dir, "documents")
    out = woe_binning(
        docs, F.col("n_chars"), F.col("lang") == "en", n_bins=10, tiebreak=F.col("doc_id")
    )
    return out.select(
        "bin", "n", "n_pos", F.round("woe", 6).alias("woe"), F.round("iv", 6).alias("iv")
    )


SQL_WOE_BINNING = """
WITH binned AS (
  SELECT CAST(lang = 'en' AS INT) AS y,
         ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin
  FROM documents),
per AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos
  FROM binned GROUP BY bin),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS _N, CAST(sum(n_pos) AS DOUBLE) AS _P FROM per)
SELECT bin, n, n_pos,
       round(ln(((n_pos + 0.5) / _P) / ((n - n_pos + 0.5) / (_N - _P))), 6) AS woe,
       round((((n_pos + 0.5) / _P) - ((n - n_pos + 0.5) / (_N - _P)))
             * ln(((n_pos + 0.5) / _P) / ((n - n_pos + 0.5) / (_N - _P))), 6) AS iv
FROM per, tot
"""


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding with smoothing (operators/encoding.py
    ::target_encode_loo): source category -> is-English rate, the row's
    own label excluded (the target-leakage guard a training pipeline
    needs).  One category-keyed window."""
    from mcpvectordb_spark.operators.encoding import target_encode_loo

    docs = load_table(spark, sf_dir, "documents")
    out = target_encode_loo(docs, F.col("source"), F.col("lang") == "en", smoothing=10.0)
    return out.select("doc_id", "source", F.round("target_enc", 6).alias("target_enc"))


SQL_TARGET_ENCODING = """
WITH prior AS (SELECT avg(CAST(lang = 'en' AS DOUBLE)) AS _prior FROM documents)
SELECT doc_id, source,
       round((sum(CAST(lang = 'en' AS DOUBLE)) OVER (PARTITION BY source)
              - CAST(lang = 'en' AS DOUBLE) + 10.0 * _prior)
             / (count(*) OVER (PARTITION BY source) - 1 + 10.0), 6) AS target_enc
FROM documents, prior
"""


def q_pii_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn-validated card-number scrubbing (operators/curation.py::
    scrub_cards): each doc gets a planted VALID card (payload digits from
    md5, check digit computed in-plan) and an INVALID twin (check+1); the
    scrubber must flag 2 candidates, validate exactly 1, and replace only
    the valid one.  The oracle replays the same digit arithmetic, regex
    and replacement in DuckDB — proving the Luhn kernel engine-portable."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 60)
    h = F.md5(F.concat(F.lit("card:"), F.col("doc_id").cast("string")))
    payload = F.transform(
        F.sequence(F.lit(1), F.lit(15)),
        lambda i: F.conv(h.substr(i, F.lit(1)), 16, 10).cast("int") % 10,
    )
    contrib = F.aggregate(
        F.zip_with(
            payload,
            F.sequence(F.lit(1), F.lit(15)),
            lambda d, i: F.when(
                i % 2 == 1, F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
            ).otherwise(d),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    check = (10 - contrib % 10) % 10
    digits = F.concat_ws("", F.transform(payload, lambda d: d.cast("string")))
    valid_card = F.concat(digits, check.cast("string"))
    bad_card = F.concat(digits, ((check + 1) % 10).cast("string"))
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("pay "), valid_card, F.lit(" ref "), bad_card, F.lit(" end")
        ).alias("text"),
    )
    out = cu.scrub_cards(planted, "text")
    return out.select(
        "doc_id", "n_card_candidates", "n_cards_valid",
        F.md5("card_clean_text").alias("clean_md5"),
    )


SQL_PII_LUHN = f"""
WITH base AS (
  SELECT doc_id, md5('card:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents WHERE doc_id < 60),
built AS (
  SELECT doc_id,
         list_transform(range(1, 16),
                        i -> (strpos('0123456789abcdef', substr(h, CAST(i AS INT), 1)) - 1) % 10) AS p
  FROM base),
cards AS (
  SELECT doc_id,
         array_to_string(list_transform(p, d -> CAST(d AS VARCHAR)), '') AS digits,
         (10 - list_sum(list_transform(range(1, 16), i ->
            CASE WHEN i % 2 = 1
                 THEN CASE WHEN p[CAST(i AS INT)]*2 > 9 THEN p[CAST(i AS INT)]*2 - 9 ELSE p[CAST(i AS INT)]*2 END
                 ELSE p[CAST(i AS INT)] END)) % 10) % 10 AS chk
  FROM built),
texts AS (
  SELECT doc_id,
         'pay ' || digits || CAST(chk AS VARCHAR) || ' ref ' || digits || CAST((chk + 1) % 10 AS VARCHAR) || ' end' AS text
  FROM cards),
scanned AS (
  SELECT doc_id, text, regexp_extract_all(text, '\\b[0-9]{{16}}\\b') AS cands FROM texts),
validated AS (
  SELECT doc_id, text, cands,
         list_filter(cands, c ->
           list_sum(list_transform(range(1, 17), i ->
             CASE WHEN (16 - i) % 2 = 1
                  THEN CASE WHEN (strpos('0123456789', substr(c, CAST(i AS INT), 1)) - 1)*2 > 9
                            THEN (strpos('0123456789', substr(c, CAST(i AS INT), 1)) - 1)*2 - 9
                            ELSE (strpos('0123456789', substr(c, CAST(i AS INT), 1)) - 1)*2 END
                  ELSE strpos('0123456789', substr(c, CAST(i AS INT), 1)) - 1 END)) % 10 = 0) AS valid
  FROM scanned)
SELECT doc_id,
       CAST(len(cands) AS BIGINT) AS n_card_candidates,
       CAST(len(valid) AS BIGINT) AS n_cards_valid,
       md5(list_reduce(list_prepend(text, valid), (acc, c) -> replace(acc, c, '<CARD>'))) AS clean_md5
FROM validated
"""


def q_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution (operators/entity.py): customers
    get portable-md5 pseudo-names (the raw c_name values are sequential
    'Customer#...' strings one digit apart — everything would fuzzy-match
    everything); every 10th customer is planted again with one character
    edited PAST the blocking prefix.  Match = same (nation, 4-char
    prefix) block + Levenshtein <= 1.  The oracle replays name synthesis,
    blocking and edit distance in DuckDB."""
    from mcpvectordb_spark.operators.entity import entity_match_blocked

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    h = F.md5(F.concat(F.lit("name:"), F.col("c_custkey").cast("string")))
    syl = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda j: F.concat(
                F.substring(F.lit("bdklmnrs"), (F.conv(h.substr(j * 2 + 1, F.lit(1)), 16, 10).cast("int") % 8) + 1, 1),
                F.substring(F.lit("aeio"), (F.conv(h.substr(j * 2 + 2, F.lit(1)), 16, 10).cast("int") % 4) + 1, 1),
            ),
        ),
    )
    base = cust.select(F.col("c_custkey").alias("id"), "c_nationkey", syl.alias("name"))
    planted = base.filter(F.col("id") % 10 == 0).select(
        (F.col("id") + 1000000).alias("id"),
        "c_nationkey",
        F.concat(F.substring("name", 1, 5), F.lit("x"), F.substring("name", 7, 10)).alias("name"),
    )
    ents = base.unionByName(planted)
    out = entity_match_blocked(ents, "id", "name", ["c_nationkey"], prefix_len=4, max_edit=1)
    return out


SQL_ENTITY_MATCH = """
WITH base AS (
  SELECT c_custkey AS id, c_nationkey,
         array_to_string(list_transform(range(0, 5), j ->
           substr('bdklmnrs', ((strpos('0123456789abcdef', substr(md5('name:' || CAST(c_custkey AS VARCHAR)), CAST(j*2+1 AS INT), 1)) - 1) % 8) + 1, 1) ||
           substr('aeio', ((strpos('0123456789abcdef', substr(md5('name:' || CAST(c_custkey AS VARCHAR)), CAST(j*2+2 AS INT), 1)) - 1) % 4) + 1, 1)), '') AS name
  FROM customer),
planted AS (
  SELECT id + 1000000 AS id, c_nationkey,
         substr(name, 1, 5) || 'x' || substr(name, 7, 10) AS name
  FROM base WHERE id % 10 = 0),
ents AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
keyed AS (
  SELECT id, name,
         CAST(c_nationkey AS VARCHAR) || chr(31) || substr(name, 1, 4) AS _blk
  FROM ents)
SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit
FROM keyed a JOIN keyed b ON a._blk = b._blk AND a.id < b.id
WHERE levenshtein(a.name, b.name) <= 1
"""


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (curation.py::
    temperature_weights_bp, alpha=0.5 — the mT5 rare-domain upsampler)
    over per-source whitespace token mass, then integer keep-rates under
    a 100k-token budget (the mixture_rates arithmetic)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", ts.ws_token_count(F.col("text")).alias("n_tok"))
    w = cu.temperature_weights_bp(toks, "source", "n_tok", alpha=0.5)
    budget = 100_000
    return (
        w.withColumn(
            "target_tokens", F.expr(f"weight_bp * CAST({budget} AS BIGINT) div 10000")
        )
        .withColumn(
            "rate_bp",
            F.when(
                F.col("avail_tokens") > 0,
                F.least(
                    F.lit(10000).cast("long"),
                    F.expr("target_tokens * 10000 div avail_tokens"),
                ),
            ).otherwise(F.lit(0).cast("long")),
        )
        .select("domain", "avail_tokens", "weight_bp", "target_tokens", "rate_bp")
    )


SQL_MIXTURE_TEMPERATURE = f"""
WITH toks AS (
  SELECT source AS domain,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS BIGINT) AS n_tok
  FROM documents),
avail AS (SELECT domain, CAST(sum(n_tok) AS BIGINT) AS avail_tokens FROM toks GROUP BY domain),
tot AS (SELECT CAST(sum(avail_tokens) AS DOUBLE) AS _T FROM avail),
powed AS (SELECT domain, avail_tokens, pow(avail_tokens / _T, 0.5) AS _p FROM avail, tot),
z AS (SELECT sum(_p) AS _Z FROM powed),
w AS (SELECT domain, avail_tokens,
             CAST(floor(10000.0 * _p / _Z + 1e-9) AS BIGINT) AS weight_bp FROM powed, z)
SELECT domain, avail_tokens, weight_bp,
       weight_bp * CAST(100000 AS BIGINT) // 10000 AS target_tokens,
       CASE WHEN avail_tokens > 0
            THEN least(CAST(10000 AS BIGINT), (weight_bp * CAST(100000 AS BIGINT) // 10000) * 10000 // avail_tokens)
            ELSE CAST(0 AS BIGINT) END AS rate_bp
FROM w
"""


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style one-scan data-quality report (operators/dataquality.py)
    over lineitem — completeness, uniqueness, ranges, membership — plus a
    referential check against orders.  All single-table rules fuse into
    ONE aggregation; the oracle replays every rule."""
    from mcpvectordb_spark.operators.dataquality import dq_referential, dq_report

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rep = dq_report(
        li,
        completeness=["l_orderkey", "l_partkey", "l_quantity", "l_shipdate"],
        unique=["l_rowkey"] if "l_rowkey" in li.columns else [],
        ranges={"l_quantity": (1, 50), "l_discount": (0.0, 0.1), "l_tax": (0.0, 0.08)},
        memberships={"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]},
    )
    ref = dq_referential(li, "l_orderkey", orders, "o_orderkey")
    return rep.unionByName(ref)


SQL_DQ_AUDIT = """
WITH agg AS (
  SELECT
    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ok,
    CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pk,
    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_q,
    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_sd,
    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS rng_q,
    CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS rng_d,
    CAST(sum(CASE WHEN l_tax < 0.0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS rng_t,
    CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS mem_rf,
    CAST(sum(CASE WHEN l_linestatus NOT IN ('F','O') THEN 1 ELSE 0 END) AS BIGINT) AS mem_ls
  FROM lineitem),
refr AS (
  SELECT CAST(count(*) AS BIGINT) AS orphans
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NULL)
SELECT * FROM (
  SELECT 'completeness' AS constraint, 'l_orderkey' AS "column", null_ok AS value, null_ok = 0 AS ok FROM agg
  UNION ALL SELECT 'completeness', 'l_partkey', null_pk, null_pk = 0 FROM agg
  UNION ALL SELECT 'completeness', 'l_quantity', null_q, null_q = 0 FROM agg
  UNION ALL SELECT 'completeness', 'l_shipdate', null_sd, null_sd = 0 FROM agg
  UNION ALL SELECT 'range', 'l_quantity', rng_q, rng_q = 0 FROM agg
  UNION ALL SELECT 'range', 'l_discount', rng_d, rng_d = 0 FROM agg
  UNION ALL SELECT 'range', 'l_tax', rng_t, rng_t = 0 FROM agg
  UNION ALL SELECT 'membership', 'l_returnflag', mem_rf, mem_rf = 0 FROM agg
  UNION ALL SELECT 'membership', 'l_linestatus', mem_ls, mem_ls = 0 FROM agg
  UNION ALL SELECT 'referential', 'l_orderkey', orphans, orphans = 0 FROM refr)
"""


def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over hourly event volume per type:
    one-sided cumulative sums of standardized deviations from the global
    per-type mean, flagging hours where the statistic exceeds the decision
    interval h=5 with slack k=0.5 (the textbook Page 1954 chart).  CUSUM's
    recursion S_t = max(0, S_{t-1} + z_t - k) is realized exactly with the
    running-max identity S_t = R_t - min_{i<=t} R_i over the UNCLAMPED sum
    R_t = sum(z_i - k) — pure window functions, no recursion, same shape
    in Spark and the oracle."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            ((F.unix_timestamp("ts") / 3600).cast("bigint") * 3600).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    stats = hourly.groupBy(F.col("event_type").alias("et")).agg(
        F.avg("n").alias("mu"),
        F.sqrt(F.greatest(F.avg(F.col("n") * F.col("n")) - F.avg("n") * F.avg("n"), F.lit(0.0))).alias("sd"),
    )
    z = hourly.join(
        F.broadcast(stats), F.col("event_type") == F.col("et")
    ).withColumn("zk", (F.col("n") - F.col("mu")) / F.greatest(F.col("sd"), F.lit(1e-12)) - 0.5)
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = z.withColumn("rsum", F.sum("zk").over(w))
    cus = r.withColumn(
        "cusum", F.col("rsum") - F.least(F.min("rsum").over(w), F.lit(0.0))
    )
    return cus.filter(F.col("cusum") >= 5.0).select(
        "event_type",
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("cusum") * 10000 + 0.5001).cast("long").alias("cusum_e4"),
    )


SQL_EVENTS_CUSUM = """
WITH hourly AS (
  SELECT event_type,
         (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600) * 3600 AS bucket,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type AS et, avg(n) AS mu,
         sqrt(greatest(avg(n*n) - avg(n)*avg(n), 0)) AS sd
  FROM hourly GROUP BY 1),
z AS (
  SELECT h.event_type, h.bucket, h.n,
         (h.n - s.mu) / greatest(s.sd, 1e-12) - 0.5 AS zk
  FROM hourly h JOIN stats s ON h.event_type = s.et),
r AS (
  SELECT event_type, bucket, n, sum(zk) OVER w AS rsum
  FROM z
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
c AS (
  SELECT event_type, bucket, n, rsum,
         least(min(rsum) OVER w2, 0.0) AS minr
  FROM r
  WINDOW w2 AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_type, bucket, CAST(n AS BIGINT) AS n,
       CAST(floor((rsum - minr) * 10000 + 0.5001) AS BIGINT) AS cusum_e4
FROM c WHERE rsum - minr >= 5.0
"""


def q_orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals (the classic fraud/data-
    quality screen): observed share per leading digit vs log10(1+1/d)
    expectation, plus the chi-square statistic replicated per row.  One
    keyed agg."""
    orders = load_table(spark, sf_dir, "orders")
    d1 = F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast("int")
    per = (
        orders.filter(F.col("o_totalprice") >= 1)
        .groupBy(d1.alias("digit"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = per.agg(F.sum("n").cast("double").alias("_N"))
    j = per.crossJoin(F.broadcast(tot))
    expected = F.log10(1 + 1 / F.col("digit"))
    share = F.col("n") / F.col("_N")
    chi = (share - expected) * (share - expected) / expected * F.col("_N")
    return j.select(
        "digit",
        "n",
        F.round(share, 6).alias("share"),
        F.round(expected, 6).alias("benford"),
        F.round(chi, 4).alias("chi2_term"),
    )


SQL_ORDERS_BENFORD = """
WITH per AS (
  SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS _N FROM per)
SELECT digit, n,
       round(n / _N, 6) AS share,
       round(log10(1 + 1.0/digit), 6) AS benford,
       round((n/_N - log10(1 + 1.0/digit)) * (n/_N - log10(1 + 1.0/digit))
             / log10(1 + 1.0/digit) * _N, 4) AS chi2_term
FROM per, tot
"""


def q_events_seqmine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gapped sequential-pattern mining (PrefixSpan's length-2 stage):
    support of ordered event-type pairs a -> b where b happens ANY time
    after a in the same user's stream (not just adjacently — that is
    events_paths).  Per-user candidate fanout is bounded by (events per
    user)², the per-basket bound of the assoc-rules family; support
    counts distinct users."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.col("event_type").alias("t"),
        F.unix_timestamp("ts").alias("sec"),
        "event_id",
    )
    a = base.select("user_id", F.col("t").alias("ta"), F.col("sec").alias("sa"), F.col("event_id").alias("ea"))
    b = base.select("user_id", F.col("t").alias("tb"), F.col("sec").alias("sb"), F.col("event_id").alias("eb"))
    pairs = a.join(b, "user_id").filter(
        (F.col("sb") > F.col("sa")) | ((F.col("sb") == F.col("sa")) & (F.col("eb") > F.col("ea")))
    )
    return (
        pairs.groupBy("ta", "tb")
        .agg(F.countDistinct("user_id").cast("long").alias("support"))
        .filter(F.col("support") >= 5)
    )


SQL_EVENTS_SEQMINE = """
WITH base AS (
  SELECT user_id, event_type AS t,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec, event_id
  FROM events)
SELECT a.t AS ta, b.t AS tb, CAST(count(DISTINCT a.user_id) AS BIGINT) AS support
FROM base a JOIN base b ON a.user_id = b.user_id
 AND (b.sec > a.sec OR (b.sec = a.sec AND b.event_id > a.event_id))
GROUP BY 1, 2 HAVING count(DISTINCT a.user_id) >= 5
"""


def q_lineitem_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over lineitem's numeric measures in ONE
    aggregation (six F.corr pairs fused into a single pass — the same
    one-scan discipline as dq_audit), long-form (col_a, col_b, corr)."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    row = li.agg(
        *[F.corr(a, b).alias(f"c__{a}__{b}") for a, b in pairs]
    )
    out = None
    for a, b in pairs:
        piece = row.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.round(F.col(f"c__{a}__{b}"), 6).alias("corr"),
        )
        out = piece if out is None else out.unionByName(piece)
    return out


SQL_LINEITEM_CORR = """
WITH agg AS (
  SELECT corr(l_quantity, l_extendedprice) AS c1,
         corr(l_quantity, l_discount) AS c2,
         corr(l_quantity, l_tax) AS c3,
         corr(l_extendedprice, l_discount) AS c4,
         corr(l_extendedprice, l_tax) AS c5,
         corr(l_discount, l_tax) AS c6
  FROM lineitem)
SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, round(c1, 6) AS corr FROM agg
UNION ALL SELECT 'l_quantity', 'l_discount', round(c2, 6) FROM agg
UNION ALL SELECT 'l_quantity', 'l_tax', round(c3, 6) FROM agg
UNION ALL SELECT 'l_extendedprice', 'l_discount', round(c4, 6) FROM agg
UNION ALL SELECT 'l_extendedprice', 'l_tax', round(c5, 6) FROM agg
UNION ALL SELECT 'l_discount', 'l_tax', round(c6, 6) FROM agg
"""


def q_rag_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly — the vectordb's actual downstream use: vector
    top-20 for the standard probe, joined to document text, greedily
    packed into a 600-token context budget in rank order (a doc ships
    only if the RUNNING token total through it stays within budget —
    cumulative-sum window, no loop).  Returns the shipped context rows
    (rank, doc, n_tokens, cum_tokens).  One window over a 20-row frame."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qv = _q_vec(spark, sf_dir)
    hits = knn_topk(
        emb.filter(F.col("vec_id") != QUERY_VEC_ID), qv, 20, tie_col="vec_id"
    ).select(F.col("vec_id").alias("doc"), "score")
    ranked = hits.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("score").desc(), F.col("doc").asc())),
    )
    with_text = ranked.join(
        docs.select(F.col("doc_id").alias("doc"), ts.ws_token_count(F.col("text")).alias("n_tokens")),
        "doc",
    )
    cum = with_text.withColumn(
        "cum_tokens",
        F.sum("n_tokens").over(
            Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        cum.filter(F.col("cum_tokens") <= 600)
        .select("rank", "doc", F.col("n_tokens").cast("long"), F.col("cum_tokens").cast("long"))
    )


SQL_RAG_CONTEXT = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}),
hits AS (
  SELECT vec_id AS doc, {_sql_cos('v', 'qv')} AS score
  FROM c, q ORDER BY score DESC, doc LIMIT 20),
ranked AS (
  SELECT doc, row_number() OVER (ORDER BY score DESC, doc) AS rank FROM hits),
with_text AS (
  SELECT r.rank, r.doc,
         CAST(len(list_filter(regexp_split_to_array(trim(d.text), '\\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
  FROM ranked r JOIN documents d ON r.doc = d.doc_id),
cum AS (
  SELECT rank, doc, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM with_text)
SELECT rank, doc, n_tokens, cum_tokens FROM cum WHERE cum_tokens <= 600
"""


_EVAL_QUERIES = {
    0: "window join",
    1: "spark batch",
    2: "data model system",
    3: "result analysis",
    4: "window spark",
}


def q_search_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR evaluation harness over the batch BM25 scorer (operators/
    bm25.py::bm25_multi_topk — posting/df/stats build once, every query
    joins via a broadcast (qid, term) table): binary relevance = the doc
    contains ALL the query's terms; per query reports hits@10, the first
    relevant rank, and reciprocal rank.  The oracle replays scoring,
    ranking, relevance and the metrics from the same query table."""
    from mcpvectordb_spark.operators.bm25 import Bm25Index, bm25_multi_topk, doc_lens, doc_terms

    docs = load_table(spark, sf_dir, "documents")
    # ONE posting build feeds both the scorer and the relevance judge
    posting = doc_terms(docs, "doc_id", "text").localCheckpoint(eager=False)
    idx = Bm25Index(posting, doc_lens(docs, "doc_id", "text"), cached=False)
    ranked = bm25_multi_topk(docs, _EVAL_QUERIES, 10, "doc_id", "text", index=idx)
    rows = []
    for qid, q in sorted(_EVAL_QUERIES.items()):
        for t in sorted({t for t in q.lower().split() if t}):
            rows.append((qid, t))
    qterms = spark.createDataFrame(rows, "qid int, term string")
    nt = qterms.groupBy("qid").agg(F.count(F.lit(1)).alias("nt"))
    matches = (
        posting
        .join(F.broadcast(qterms), "term")
        .groupBy("qid", "doc")
        .agg(F.countDistinct("term").alias("m"))
    )
    rel = matches.join(F.broadcast(nt), "qid").filter(F.col("m") == F.col("nt")).select(
        "qid", "doc", F.lit(True).alias("relevant")
    )
    judged = ranked.join(rel, ["qid", "doc"], "left").withColumn(
        "relevant", F.coalesce("relevant", F.lit(False))
    )
    # graded nDCG@10: gain = matched-term count m (0 for unjudged docs);
    # ideal DCG from the top-10 gains of the FULL judged corpus per query
    gains = ranked.join(matches, ["qid", "doc"], "left").withColumn(
        "g", F.coalesce(F.col("m"), F.lit(0)).cast("double")
    )
    dcg = gains.groupBy("qid").agg(
        F.sum(F.col("g") / F.log2(F.col("rank") + 1)).alias("dcg")
    )
    ideal_ranked = matches.withColumn(
        "irank",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.col("m").desc(), F.col("doc").asc())
        ),
    ).filter(F.col("irank") <= 10)
    idcg = ideal_ranked.groupBy("qid").agg(
        F.sum(F.col("m").cast("double") / F.log2(F.col("irank") + 1)).alias("idcg")
    )
    base = judged.groupBy("qid").agg(
        F.sum(F.col("relevant").cast("long")).alias("n_rel_top10"),
        F.min(F.when(F.col("relevant"), F.col("rank"))).cast("long").alias("first_rel_rank"),
        F.round(
            F.coalesce(1.0 / F.min(F.when(F.col("relevant"), F.col("rank"))), F.lit(0.0)), 6
        ).alias("rr"),
    )
    return (
        base.join(dcg, "qid")
        .join(idcg, "qid")
        .withColumn("ndcg10", F.round(F.col("dcg") / F.col("idcg"), 6))
        .drop("dcg", "idcg")
    )


def _sql_search_eval() -> str:
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in sorted(_EVAL_QUERIES.items())
        for t in sorted({t for t in q.lower().split() if t})
    )
    return rf"""
WITH toks AS (
  SELECT doc_id AS doc, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS term
  FROM documents),
posting AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY 1, 2),
lens AS (
  SELECT doc_id AS doc,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS BIGINT) AS dl
  FROM documents),
dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT avg(dl) FROM lens) AS avgdl),
qterms AS (SELECT * FROM (VALUES {qvals}) AS t(qid, term)),
bm AS (
  SELECT qid, doc, sum( ln(1 + (n - df + 0.5)/(df + 0.5))
                        * tf*(1.2+1)/(tf + 1.2*(1-0.75+0.75*dl/avgdl)) ) AS score
  FROM posting JOIN qterms USING(term) JOIN dfreq USING(term) JOIN lens USING(doc), stats
  GROUP BY qid, doc),
ranked AS (
  SELECT qid, doc, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc) AS rank
  FROM bm QUALIFY rank <= 10),
nt AS (SELECT qid, count(*) AS n_terms FROM qterms GROUP BY qid),
m AS (SELECT qid, doc, count(DISTINCT term) AS mm FROM posting JOIN qterms USING(term) GROUP BY 1, 2),
rel AS (SELECT m.qid, m.doc FROM m JOIN nt USING(qid) WHERE m.mm = nt.n_terms),
judged AS (
  SELECT r.qid, r.rank, (rel.doc IS NOT NULL) AS relevant
  FROM ranked r LEFT JOIN rel ON r.qid = rel.qid AND r.doc = rel.doc),
dcg AS (
  SELECT r.qid, sum(CAST(coalesce(m.mm, 0) AS DOUBLE) / log2(r.rank + 1)) AS dcg
  FROM ranked r LEFT JOIN m ON r.qid = m.qid AND r.doc = m.doc GROUP BY r.qid),
ideal AS (
  SELECT qid, mm, row_number() OVER (PARTITION BY qid ORDER BY mm DESC, doc ASC) AS irank
  FROM m QUALIFY irank <= 10),
idcg AS (SELECT qid, sum(CAST(mm AS DOUBLE) / log2(irank + 1)) AS idcg FROM ideal GROUP BY qid),
base AS (
  SELECT qid, CAST(sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_top10,
         CAST(min(CASE WHEN relevant THEN rank END) AS BIGINT) AS first_rel_rank,
         round(coalesce(1.0 / min(CASE WHEN relevant THEN rank END), 0.0), 6) AS rr
  FROM judged GROUP BY qid)
SELECT b.qid, b.n_rel_top10, b.first_rel_rank, b.rr,
       round(d.dcg / i.idcg, 6) AS ndcg10
FROM base b JOIN dcg d USING(qid) JOIN idcg i USING(qid)
"""


SQL_SEARCH_EVAL = _sql_search_eval()


_LR_ITER, _LR_RATE = 10, 0.5


def _lr_scored(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, list[float]]:
    """Shared LR pipeline for lr_quality / lr_eval / lr_reliability:
    standardized features -> trained weights -> per-row (y, p, pred)."""
    from mcpvectordb_spark.operators.mlr import (
        score_logistic,
        standardized_features,
        train_logistic_gd,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = dd.normalize_text(F.col("text"))
    words = F.split(t, " ")
    nt = F.greatest(F.length(t), F.lit(1)).cast("double")
    nw = F.greatest(F.size(words), F.lit(1)).cast("double")
    feats = standardized_features(
        docs,
        [
            F.log(F.lit(1.0) + F.length(t)),
            F.length(t) / nw,
            F.size(F.array_distinct(words)) / nw,
            F.length(F.regexp_replace(t, "[^aeiou]", "")) / nt,
        ],
        F.col("lang") == "en",
    )
    w = train_logistic_gd(feats, 4, iterations=_LR_ITER, lr=_LR_RATE)
    return score_logistic(feats, w), w


def q_lr_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression quality classifier (operators/
    mlr.py): 4 z-standardized text features -> is-English label, 10
    full-batch GD iterations where each step is ONE map-side-combinable
    aggregation and the only driver state is the 5-double weight vector
    (the bounded-driver-state pattern of the BPE merge loop).  The oracle
    replays the ENTIRE optimization as chained CTEs, so the gate proves
    the distributed trainer equals a single-node replay bit-close."""
    scored, w = _lr_scored(spark, sf_dir)
    return scored.agg(
        *[F.round(F.lit(w[j]), 4).alias(f"w{j}") for j in range(5)],
        F.sum((F.col("pred") == F.col("y")).cast("long")).alias("n_correct"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def _sql_lr_ctes() -> tuple[list[str], str]:
    """The shared LR replay: CTE list ending at trained weights w{_LR_ITER},
    plus the logit expression over (feats, w{_LR_ITER}).  Reused by
    lr_quality, lr_eval and lr_reliability so all three gates replay ONE
    optimization definition."""
    xs = ["x1", "x2", "x3", "x4"]
    feats0 = f"""
  SELECT CAST(lang = 'en' AS DOUBLE) AS y,
         ln(1 + len(t)) AS x1,
         CAST(len(t) AS DOUBLE) / greatest(len(w), 1) AS x2,
         CAST(len(list_distinct(w)) AS DOUBLE) / greatest(len(w), 1) AS x3,
         CAST(len(regexp_replace(t, '[^aeiou]', '', 'g')) AS DOUBLE) / greatest(len(t), 1) AS x4
  FROM (SELECT lang, {_sql_norm('text')} AS t, {_sql_words('text')} AS w FROM documents)"""
    stats = ", ".join(
        f"avg({x}) AS m{i}, sqrt(greatest(avg({x}*{x}) - avg({x})*avg({x}), 0)) AS s{i}"
        for i, x in enumerate(xs, 1)
    )
    std = ", ".join(f"({x} - m{i}) / greatest(s{i}, 1e-12) AS {x}" for i, x in enumerate(xs, 1))
    ctes = [
        f"feats0 AS ({feats0})",
        f"stats AS (SELECT {stats} FROM feats0)",
        f"feats AS (SELECT y, {std} FROM feats0, stats)",
        "w0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2, 0.0 AS b3, 0.0 AS b4)",
    ]
    z = "b0 + b1*x1 + b2*x2 + b3*x3 + b4*x4"
    for it in range(1, _LR_ITER + 1):
        upd = ", ".join(
            [f"max(b0) - {_LR_RATE}*avg(e) AS b0"]
            + [f"max(b{j}) - {_LR_RATE}*avg(e*x{j}) AS b{j}" for j in range(1, 5)]
        )
        ctes.append(
            f"w{it} AS (SELECT {upd} FROM "
            f"(SELECT b0, b1, b2, b3, b4, 1.0/(1.0+exp(-({z}))) - y AS e, x1, x2, x3, x4 "
            f"FROM feats, w{it - 1}))"
        )
    return ctes, z


def _sql_lr() -> str:
    ctes, z = _sql_lr_ctes()
    final_w = ", ".join(f"round(b{j}, 4) AS w{j}" for j in range(5))
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT {final_w},
       CAST(sum(CASE WHEN (CASE WHEN 1.0/(1.0+exp(-({z}))) > 0.5 THEN 1.0 ELSE 0.0 END) = y
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(count(*) AS BIGINT) AS n
FROM feats, w{_LR_ITER}
GROUP BY b0, b1, b2, b3, b4"""
    )


SQL_LR_QUALITY = _sql_lr()


def q_lr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-classifier evaluation (operators/modeleval.py) of the
    lr_quality model: midrank ROC-AUC, Brier score, clamped log-loss and
    10-bin ECE in one row.  Probabilities are snapped to a 1e-6 integer
    grid before ranking/binning so tie blocks and bin edges are bit-exact
    across engines (the integral-metric trick of events_mannwhitney); the
    rank pass is a window over <= 1e6 probability BLOCKS, never corpus
    rows.  The oracle replays the full GD training chain (_sql_lr_ctes)
    and then the same block/midrank/bin arithmetic."""
    from mcpvectordb_spark.operators.modeleval import binary_eval

    scored, _ = _lr_scored(spark, sf_dir)
    out = binary_eval(scored, "y", "p", n_bins=10)
    return out.select(
        "n",
        "n_pos",
        F.round("auc", 6).alias("auc"),
        F.round("brier", 6).alias("brier"),
        F.round("logloss", 6).alias("logloss"),
        F.round("ece", 6).alias("ece"),
    )


def q_lr_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram table (operators/modeleval.py) for the
    lr_quality model: per equal-width confidence bin, document count,
    mean predicted probability and empirical positive rate.  Bin edges
    are integer arithmetic on the quantized grid (pq*10 div 1e6)."""
    from mcpvectordb_spark.operators.modeleval import reliability_table

    scored, _ = _lr_scored(spark, sf_dir)
    out = reliability_table(scored, "y", "p", n_bins=10)
    return out.select(
        "bin",
        "n_docs",
        F.round("avg_conf", 6).alias("avg_conf"),
        F.round("frac_pos", 6).alias("frac_pos"),
    )


def _sql_lr_blocks() -> str:
    """CTE suffix shared by lr_eval / lr_reliability: quantize the replayed
    sigmoid to the 1e-6 grid and collapse to per-value blocks."""
    ctes, z = _sql_lr_ctes()
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
scored AS (
  SELECT y, CAST(round((1.0/(1.0+exp(-({z})))) * 1000000) AS BIGINT) AS pq
  FROM feats, w{_LR_ITER}),
blocks AS (
  SELECT pq, CAST(count(*) AS BIGINT) AS cnt, sum(y) AS pos
  FROM scored GROUP BY 1)"""
    )


SQL_LR_EVAL = (
    _sql_lr_blocks()
    + """,
ranked AS (
  SELECT pq, cnt, pos, sum(cnt) OVER (ORDER BY pq) AS cum,
         CAST(pq AS DOUBLE) / 1000000 AS pd,
         CAST(least(greatest(pq, 1), 999999) AS DOUBLE) / 1000000 AS pc
  FROM blocks),
mstats AS (
  SELECT sum(cnt) AS n, sum(pos) AS n_pos,
         sum(pos * (cum - cnt + (CAST(cnt AS DOUBLE) + 1) / 2)) AS r_pos,
         sum(pos * (pd - 1) * (pd - 1) + (cnt - pos) * pd * pd) AS brier_sum,
         sum(-(pos * ln(pc) + (cnt - pos) * ln(1 - pc))) AS ll_sum
  FROM ranked),
bins AS (
  SELECT least(pq * 10 // 1000000, 9) AS bin, sum(cnt) AS nb,
         sum(cnt * (CAST(pq AS DOUBLE) / 1000000)) AS conf_sum, sum(pos) AS pos_sum
  FROM blocks GROUP BY 1),
ece AS (
  SELECT sum(nb * abs(pos_sum / nb - conf_sum / nb)) / sum(nb) AS ece FROM bins)
SELECT CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       round(CASE WHEN n_pos * (n - n_pos) > 0
                  THEN (r_pos - n_pos * (n_pos + 1.0) / 2) / (n_pos * (n - n_pos)) END, 6) AS auc,
       round(brier_sum / n, 6) AS brier,
       round(ll_sum / n, 6) AS logloss,
       round(ece, 6) AS ece
FROM mstats, ece
"""
)


SQL_LR_RELIABILITY = (
    _sql_lr_blocks()
    + """
SELECT least(pq * 10 // 1000000, 9) AS bin,
       CAST(sum(cnt) AS BIGINT) AS n_docs,
       round(sum(cnt * (CAST(pq AS DOUBLE) / 1000000)) / sum(cnt), 6) AS avg_conf,
       round(sum(pos) / sum(cnt), 6) AS frac_pos
FROM blocks GROUP BY 1
"""
)


def q_lr_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration map (modeleval.py::isotonic_calibration)
    for the lr_quality model — the monotone recalibration table that
    turns raw classifier scores into calibrated probabilities
    (Zadrozny-Elkan), completing the eval family (lr_eval measures
    miscalibration, this FIXES it).  PAVA's sequential stack is
    replaced by the minimax identity max_j<=i min_k>=i avg(j..k) over
    <= 1000 calibration blocks: a rank-inequality pair join + one
    suffix-min window + one max agg, all on the block table, so corpus
    size never enters after the first groupBy.  Every average divides
    exact BIGINT prefix sums and min/max are order-independent, so the
    oracle (which replays the GD chain, the blocks, and the same
    windows) matches bit-for-bit."""
    from mcpvectordb_spark.operators.modeleval import isotonic_calibration

    scored, _ = _lr_scored(spark, sf_dir)
    return isotonic_calibration(scored, "y", "p", n_blocks=1000)


SQL_LR_ISOTONIC = (
    _sql_lr_blocks()
    + """,
cal AS (
  SELECT least(pq * 1000 // 1000000, 999) AS qb,
         CAST(sum(cnt) AS BIGINT) AS cnt,
         CAST(sum(pos) AS BIGINT) AS pos
  FROM blocks GROUP BY 1),
b AS (
  SELECT qb, cnt, pos,
         row_number() OVER (ORDER BY qb) AS i,
         CAST(sum(cnt) OVER (ORDER BY qb) AS BIGINT) AS cumw,
         CAST(sum(pos) OVER (ORDER BY qb) AS BIGINT) AS cump
  FROM cal),
pairs AS (
  SELECT l.i AS j, r.i AS k,
         CAST(r.cump - (l.cump - l.pos) AS DOUBLE)
           / CAST(r.cumw - (l.cumw - l.cnt) AS DOUBLE) AS a
  FROM b l JOIN b r ON r.i >= l.i),
suf AS (
  SELECT j, k,
         min(a) OVER (PARTITION BY j ORDER BY k DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM pairs),
iso AS (SELECT k, max(s) AS iso FROM suf GROUP BY 1)
SELECT b.qb AS block, b.cnt AS n, b.pos AS n_pos,
       round(CAST(b.pos AS DOUBLE) / CAST(b.cnt AS DOUBLE), 6) AS raw_rate,
       round(iso.iso, 6) AS iso_rate
FROM b JOIN iso ON iso.k = b.i
"""
)


def q_parts_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (graph.py::adamic_adar_linkpred) on the
    recurring supplier↔part graph: the 20 part pairs with the strongest
    shared-supplier evidence that do NOT yet trade through a common
    recurring link — "these two parts will co-occur next".  Wedge join on
    the shared neighbor + broadcast degree table + one keyed agg; the
    oracle replays the same wedge/degree/anti-join pipeline."""
    from mcpvectordb_spark.operators.graph import adamic_adar_linkpred

    sp = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy((-F.col("l_suppkey")).alias("src"), F.col("l_partkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
    )
    out = adamic_adar_linkpred(sp)
    return (
        out.filter(F.col("a") > 0)
        .select("a", "b", "common_neighbors", F.round("adamic_adar", 6).alias("adamic_adar"))
        .orderBy(F.col("adamic_adar").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(20)
    )


SQL_PARTS_LINKPRED = """
WITH sp AS (
  SELECT -l_suppkey AS src, l_partkey AS dst
  FROM lineitem GROUP BY 1, 2 HAVING count(*) >= 2),
und AS (SELECT src AS s, dst AS t FROM sp UNION SELECT dst AS s, src AS t FROM sp),
deg AS (SELECT s AS z, CAST(count(*) AS BIGINT) AS deg_z FROM und GROUP BY 1),
wedge AS (
  SELECT u1.t AS a, u2.t AS b, d.deg_z
  FROM und u1 JOIN und u2 ON u1.s = u2.s AND u1.t < u2.t
  JOIN deg d ON d.z = u1.s),
scored AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS common_neighbors,
         sum(1.0 / ln(deg_z)) AS aa
  FROM wedge GROUP BY 1, 2),
cand AS (
  SELECT sc.* FROM scored sc
  LEFT JOIN und e ON e.s = sc.a AND e.t = sc.b
  WHERE e.s IS NULL)
SELECT a, b, common_neighbors, round(aa, 6) AS adamic_adar
FROM cand WHERE a > 0
ORDER BY round(aa, 6) DESC, a ASC, b ASC LIMIT 20
"""


def q_events_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (stats.py::mann_whitney_u) between the
    same hash-assigned arms as events_ab_test, on per-user purchase
    revenue in CENTS (integral metric → tied blocks agree bit-exactly
    across engines; the same quantization bounds the rank window's
    distinct domain at scale).  The oracle replays assignment, midranks,
    tie-corrected variance and the rank-biserial effect size."""
    from mcpvectordb_spark.operators.stats import ab_assign, mann_whitney_u

    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("metric"))
    )
    samples = users.select(
        ab_assign(F.col("user_id")).alias("variant"), "metric"
    )
    out = mann_whitney_u(samples)
    return out.select(
        "n_a", "n_b",
        F.round("u_a", 1).alias("u_a"),
        F.round("z", 6).alias("z"),
        F.round("rank_biserial", 6).alias("rank_biserial"),
    )


SQL_EVENTS_MANNWHITNEY = f"""
WITH users AS (
  SELECT user_id AS u,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS metric
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
assigned AS (
  SELECT metric, ({_sql_hex48("'ab:' || CAST(u AS VARCHAR)")}) % 2 AS variant
  FROM users),
pv AS (
  SELECT metric AS v,
         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
  FROM assigned GROUP BY 1),
ranked AS (
  SELECT cnt_a, cnt_b, cnt_a + cnt_b AS cnt,
         sum(cnt_a + cnt_b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (cnt_a + cnt_b) + (cnt_a + cnt_b + 1) / 2.0 AS midrank
  FROM pv),
agg AS (
  SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a, CAST(sum(cnt_b) AS BIGINT) AS n_b,
         CAST(sum(cnt_a * midrank) AS DOUBLE) AS r_a,
         CAST(sum(cnt * cnt * cnt - cnt) AS DOUBLE) AS ties_t
  FROM ranked),
fin AS (
  SELECT n_a, n_b,
         r_a - n_a * (n_a + 1) / 2.0 AS u_a,
         n_a * CAST(n_b AS DOUBLE) / 2.0 AS mu,
         n_a * CAST(n_b AS DOUBLE) / 12.0
           * ((n_a + n_b + 1) - ties_t / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))) AS var
  FROM agg)
SELECT n_a, n_b, round(u_a, 1) AS u_a,
       round(CASE WHEN var > 0 THEN (u_a - mu) / sqrt(var) ELSE 0.0 END, 6) AS z,
       round(1.0 - 2.0 * u_a / (n_a * CAST(n_b AS DOUBLE)), 6) AS rank_biserial
FROM fin
"""


_KMV_K = 256


def q_orders_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (theta-style) sketch set algebra (sketches.py::kmv_sketch /
    kmv_set_stats): distinct-customer cardinality, union, INTERSECTION and
    Jaccard estimates for the 1995-vs-1996 buyer sets from two 256-long
    sketches — the mergeable structure that answers audience-overlap
    questions at 100 TB without ever co-shuffling the raw key sets (HLL
    unions can't intersect; KMV can).  Each sketch is a
    TakeOrderedAndProject (per-partition top-k, no full shuffle); all the
    set algebra below runs on k-row frames.  The oracle replays the exact
    k-min hash construction and every estimator formula."""
    from mcpvectordb_spark.operators.sketches import kmv_set_stats, kmv_sketch

    o = load_table(spark, sf_dir, "orders")
    key = F.concat(F.lit("cust:"), F.col("o_custkey").cast("string"))
    ka = kmv_sketch(o.filter(F.year("o_orderdate") == 1995), key, k=_KMV_K)
    kb = kmv_sketch(o.filter(F.year("o_orderdate") == 1996), key, k=_KMV_K)
    out = kmv_set_stats(ka, kb, k=_KMV_K)
    return out.select(
        F.round("est_a", 4).alias("est_a"),
        F.round("est_b", 4).alias("est_b"),
        F.round("est_union", 4).alias("est_union"),
        F.round("est_intersection", 4).alias("est_intersection"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def _sql_orders_kmv() -> str:
    h = _sql_hex48("'cust:' || CAST(o_custkey AS VARCHAR)")
    k = _KMV_K
    card = (
        "SELECT CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE) "
        "ELSE 281474976710656.0 * {km1} / max(h) END AS {name} FROM {src}"
    )
    return f"""
WITH ha AS (SELECT DISTINCT {h} AS h FROM orders WHERE year(o_orderdate) = 1995),
hb AS (SELECT DISTINCT {h} AS h FROM orders WHERE year(o_orderdate) = 1996),
ka AS (SELECT h FROM ha ORDER BY h LIMIT {k}),
kb AS (SELECT h FROM hb ORDER BY h LIMIT {k}),
ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb) ORDER BY h LIMIT {k}),
m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM ku),
c AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM ku
      WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
ca AS ({card.format(k=k, km1=k - 1, name="est_a", src="ka")}),
cb AS ({card.format(k=k, km1=k - 1, name="est_b", src="kb")}),
cu AS ({card.format(k=k, km1=k - 1, name="est_union", src="ku")})
SELECT round(est_a, 4) AS est_a, round(est_b, 4) AS est_b,
       round(est_union, 4) AS est_union,
       round(c / m * est_union, 4) AS est_intersection,
       round(c / m, 6) AS jaccard
FROM ca, cb, cu, c, m
"""


SQL_ORDERS_KMV = _sql_orders_kmv()


def q_events_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive STL-lite seasonal decomposition of the daily event count:
    trend = centered 7-day moving average (full windows only), seasonal =
    mean detrended value per ISO weekday, residual z-score against the
    residual sigma — the classical decomposition behind seasonal anomaly
    detection.  One daily pre-aggregation shrinks the stream to |days|
    rows; every window after that runs on the tiny daily series (at 100 TB
    the windows still see only |days| rows — the scan does all the work).
    Output: one row per day with full trend coverage."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    t = daily.withColumn("n7", F.count(F.lit(1)).over(w7)).withColumn(
        "trend", F.avg("y").over(w7)
    )
    valid = t.filter(F.col("n7") == 7).withColumn("det", F.col("y") - F.col("trend"))
    seas = valid.withColumn("dow", F.weekday("d") + F.lit(1)).withColumn(
        "seasonal", F.avg("det").over(Window.partitionBy("dow"))
    )
    resid = seas.withColumn("resid", F.col("det") - F.col("seasonal"))
    sigma = resid.agg(F.stddev_pop("resid").alias("sigma"))
    return (
        resid.crossJoin(F.broadcast(sigma))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "y",
            F.round("trend", 4).alias("trend"),
            F.round("seasonal", 4).alias("seasonal"),
            F.round("resid", 4).alias("resid"),
            F.round(F.col("resid") / F.col("sigma"), 4).alias("z"),
        )
        .orderBy("d")
    )


SQL_EVENTS_STL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1),
t AS (
  SELECT d, y,
         count(*) OVER w7 AS n7, avg(y) OVER w7 AS trend
  FROM daily WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
valid AS (SELECT d, y, trend, y - trend AS det FROM t WHERE n7 = 7),
seas AS (
  SELECT d, y, trend, det, isodow(d) AS dow,
         avg(det) OVER (PARTITION BY isodow(d)) AS seasonal
  FROM valid),
resid AS (SELECT d, y, trend, seasonal, det - seasonal AS resid FROM seas),
sig AS (SELECT stddev_pop(resid) AS sigma FROM resid)
SELECT strftime(d, '%Y-%m-%d') AS d, y,
       round(trend, 4) AS trend, round(seasonal, 4) AS seasonal,
       round(resid, 4) AS resid, round(resid / sigma, 4) AS z
FROM resid, sig ORDER BY d
"""


def q_events_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (timeseries.py::holt_linear) of
    the daily event count per type, plus a 3-day linear-trend forecast —
    the coupled (level, trend) recursion runs as one O(L) F.aggregate
    fold per key (same contract as events_ewma_recursive); the oracle
    replays it step-by-step with a recursive CTE, so the fold is
    value-proven against the definition.  Forecast rows carry n = -1.
    α=0.5 / β=0.25 are binary-exact so 1-α / 1-β computed Python-side
    equal the SQL literals bit-for-bit (0.3/0.7 diverge by 1 ulp and a
    round-boundary row flips — observed, not hypothetical)."""
    from mcpvectordb_spark.operators.timeseries import holt_linear

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("k"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    out = holt_linear(daily, "k", "t", "x", alpha=0.5, beta=0.25, horizon=3)
    return out.select(
        F.col("k").alias("event_type"),
        "t",
        F.coalesce(F.col("x"), F.lit(-1.0)).cast("long").alias("n"),
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("fitted", 6).alias("fitted"),
    )


SQL_EVENTS_HOLT = """
WITH RECURSIVE daily AS (
  SELECT event_type AS k,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT k, t, x, row_number() OVER (PARTITION BY k ORDER BY t) AS rk
  FROM daily),
holt AS (
  SELECT k, rk, t, x, x AS l, CAST(0.0 AS DOUBLE) AS b, x AS fitted
  FROM ranked WHERE rk = 1
  UNION ALL
  SELECT r.k, r.rk, r.t, r.x,
         0.5 * r.x + 0.5 * (h.l + h.b) AS l,
         0.25 * (0.5 * r.x + 0.5 * (h.l + h.b) - h.l) + 0.75 * h.b AS b,
         h.l + h.b AS fitted
  FROM holt h JOIN ranked r ON r.k = h.k AND r.rk = h.rk + 1),
last AS (SELECT k, max(rk) AS mrk FROM holt GROUP BY 1),
lastrow AS (
  SELECT h.k, h.t, h.l, h.b FROM holt h JOIN last l ON h.k = l.k AND h.rk = l.mrk),
fut AS (
  SELECT lr.k, lr.t + gs.h AS t, CAST(-1.0 AS DOUBLE) AS x,
         lr.l AS l, lr.b AS b, lr.l + gs.h * lr.b AS fitted
  FROM lastrow lr, (SELECT unnest(range(1, 4)) AS h) gs)
SELECT k AS event_type, t, CAST(x AS BIGINT) AS n,
       round(l, 6) AS level, round(b, 6) AS trend, round(fitted, 6) AS fitted
FROM (SELECT k, t, x, l, b, fitted FROM holt
      UNION ALL SELECT k, t, x, l, b, fitted FROM fut)
"""


def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation change-point detection (the single-split step
    of Scott & Knott / PELT-style segmentation) over hourly event volume
    per type (timeseries.py::best_split): the split k that minimizes
    within-segment SSE, solved in CLOSED FORM from cumulative (n, Σy,
    Σy²) prefix windows — no iteration, no candidate explosion; each
    key's argmin is one row_number over its own hourly series.  It
    complements events_cusum
    (online drift) with the offline optimal-split view.  Hourly counts
    are integers, so the prefix sums are exact and both engines compute
    bit-identical costs.  Output per type: split bucket, segment means,
    and the SSE reduction achieved by splitting."""
    from mcpvectordb_spark.operators.timeseries import best_split

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        ((F.unix_timestamp("ts") / 3600).cast("bigint") * 3600).alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    out = best_split(hourly, "event_type", "bucket", "y")
    return out.select(
        "event_type",
        F.col("split_idx").alias("split_bucket"),
        "n_left",
        F.round("mean_left", 6).alias("mean_left"),
        F.round("mean_right", 6).alias("mean_right"),
        F.round("sse_reduction", 6).alias("sse_reduction"),
    ).orderBy("event_type")


SQL_EVENTS_CHANGEPOINT = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2),
cum AS (
  SELECT event_type, bucket, y,
         CAST(count(*) OVER w AS DOUBLE) AS i,
         sum(y) OVER w AS cs,
         sum(y * y) OVER w AS css
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
tot AS (
  SELECT event_type AS et, CAST(count(*) AS DOUBLE) AS tn,
         sum(y) AS ts_, sum(y * y) AS tss
  FROM hourly GROUP BY 1),
costs AS (
  SELECT c.event_type, c.bucket, c.i, c.cs, t.tn, t.ts_, t.tss,
         c.css - c.cs * c.cs / c.i
           + (t.tss - c.css) - (t.ts_ - c.cs) * (t.ts_ - c.cs) / (t.tn - c.i) AS cost
  FROM cum c JOIN tot t ON c.event_type = t.et
  WHERE c.i < t.tn),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cost ASC, bucket ASC) AS rk
  FROM costs)
SELECT event_type, bucket AS split_bucket, CAST(i AS BIGINT) AS n_left,
       round(cs / i, 6) AS mean_left,
       round((ts_ - cs) / (tn - i), 6) AS mean_right,
       round((tss - ts_ * ts_ / tn) - cost, 6) AS sse_reduction
FROM ranked WHERE rk = 1 ORDER BY event_type
"""


def q_events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation function (timeseries.py::acf) of the
    HOURLY event-count series per type, lags 1..36 — the diagnostic that
    exposes the daily cycle (r_24 spike) and distinguishes trending from
    white-noise volume before fitting Holt/STL models.  Missing hours
    densify to zero counts; every sum (n, S, Q, lag products, head/tail
    window sums) is an exact BIGINT aggregate, so the mean-centered
    Box-Jenkins r_k reduces to ONE double expression over integer
    scalars that both engines evaluate bit-identically:

        r_k = (n^2*Syy_k - n*S*(H_k+T_k) + (n-k)*S^2) / (n^2*Q - n*S^2)

    Plan: densify grid join, explode(36 lags) + equi-join on
    (type, t+lag) shuffling only (string, long, long) rows, two keyed
    aggs, broadcast of the per-type scalar row.  Bartlett significance
    bound at 1.96/sqrt(n).  Reference ships no ACF (query surface is
    vector search, mcpvectordb/store.py); this extends the time-series
    family (events_stl / events_holt / events_changepoint) with the
    model-identification step."""
    from mcpvectordb_spark.operators.timeseries import acf

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return acf(hourly, "event_type", "t", "y", max_lag=36).select(
        "event_type",
        "lag",
        "n",
        "r",
        "significant",
    )


SQL_EVENTS_ACF = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(t) AS t0, max(t) AS t1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(range(t0, t1 + 1)) AS t FROM bounds),
dense AS (
  SELECT g.event_type, g.t, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.t = g.t),
scal AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
  FROM dense GROUP BY 1),
lags AS (SELECT unnest(range(1, 37)) AS lag),
per_lag AS (
  SELECT l.event_type, lg.lag,
         CAST(sum(l.y * r.y) AS BIGINT) AS syy,
         CAST(sum(l.y) AS BIGINT) AS h,
         CAST(sum(r.y) AS BIGINT) AS tt
  FROM dense l CROSS JOIN lags lg
  JOIN dense r ON r.event_type = l.event_type AND r.t = l.t + lg.lag
  GROUP BY 1, 2)
SELECT p.event_type, p.lag, s.n,
       CASE WHEN CAST(s.n AS DOUBLE) * s.n * s.q - CAST(s.n AS DOUBLE) * s.s * s.s > 0
            THEN round((CAST(s.n AS DOUBLE) * s.n * p.syy
                        - CAST(s.n AS DOUBLE) * s.s * CAST(p.h + p.tt AS DOUBLE)
                        + (CAST(s.n AS DOUBLE) - p.lag) * s.s * s.s)
                       / (CAST(s.n AS DOUBLE) * s.n * s.q
                          - CAST(s.n AS DOUBLE) * s.s * s.s), 6)
       END AS r,
       CASE WHEN CAST(s.n AS DOUBLE) * s.n * s.q - CAST(s.n AS DOUBLE) * s.s * s.s > 0
            THEN abs((CAST(s.n AS DOUBLE) * s.n * p.syy
                      - CAST(s.n AS DOUBLE) * s.s * CAST(p.h + p.tt AS DOUBLE)
                      + (CAST(s.n AS DOUBLE) - p.lag) * s.s * s.s)
                     / (CAST(s.n AS DOUBLE) * s.n * s.q
                        - CAST(s.n AS DOUBLE) * s.s * s.s))
                 > 1.96 / sqrt(CAST(s.n AS DOUBLE))
       END AS significant
FROM per_lag p JOIN scal s ON s.event_type = p.event_type
"""


def q_parts_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand two-feature least squares (stats.py::ols2_fit) —
    retail price regressed on size and name length, the canonical
    ONE-PASS distributed regression: a single map-side-combinable
    groupBy accumulates the 3x3 Gram matrix + moment vector per brand
    and the normal equations solve in closed form (Cramer) as a codegen
    projection.  No iteration (contrast lr_quality's gradient chain), no
    collect, one shuffle.  Exactness: price has one decimal so y =
    round(price*10) makes every sufficient statistic an exact BIGINT —
    the double algebra then agrees bit-for-bit with the oracle.
    Coefficients rescale /10 back to price units; R^2 = 1 - SSE/SST
    falls out of the same scalar row (SSE = Syy - b'X'y)."""
    from mcpvectordb_spark.operators.stats import ols2_fit

    part = load_table(spark, sf_dir, "part")
    obs = part.select(
        "p_brand",
        F.round(F.col("p_retailprice") * 10, 0).cast("long").alias("y10"),
        F.col("p_size").cast("long").alias("x1"),
        F.length("p_name").cast("long").alias("x2"),
    )
    fit = ols2_fit(obs, "p_brand", "y10", "x1", "x2")
    return fit.select(
        "p_brand",
        "n",
        F.round(F.col("b0") / 10, 4).alias("intercept"),
        F.round(F.col("b1") / 10, 4).alias("beta_size"),
        F.round(F.col("b2") / 10, 4).alias("beta_namelen"),
        F.round("r2", 6).alias("r2"),
    )


SQL_PARTS_OLS = """
WITH obs AS (
  SELECT p_brand,
         CAST(round(p_retailprice * 10) AS BIGINT) AS y,
         CAST(p_size AS BIGINT) AS x1,
         CAST(length(p_name) AS BIGINT) AS x2
  FROM part),
g AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM obs GROUP BY 1),
d AS (
  SELECT p_brand, n, sy, s1y, s2y, syy,
         CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2)
           + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2) AS det,
         CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2y)
           + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2y) AS det0,
         CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2y)
           - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2)
           + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s2) AS det1,
         CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s2)
           + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2) AS det2
  FROM g)
SELECT p_brand, n,
       CASE WHEN det <> 0 THEN round(det0 / det / 10, 4) END AS intercept,
       CASE WHEN det <> 0 THEN round(det1 / det / 10, 4) END AS beta_size,
       CASE WHEN det <> 0 THEN round(det2 / det / 10, 4) END AS beta_namelen,
       CASE WHEN det <> 0
             AND CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n > 0
            THEN round(1.0 - (CAST(syy AS DOUBLE)
                              - ((det0 / det) * sy + (det1 / det) * s1y
                                 + (det2 / det) * s2y))
                           / (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n), 6)
       END AS r2
FROM d
"""


def q_events_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation (timeseries.py::xcf) between every
    ordered pair of event types' HOURLY volume series, lags 0..12 —
    answers "does view traffic at hour t predict purchase traffic at
    t+k?", the causal-ordering diagnostic that funnels and attribution
    assume.  Lag 0 is the plain Pearson correlation of the two series.
    All series share one zero-densified global hourly grid; every sum
    is an exact BIGINT aggregate and the mean-centered normalization is
    one double expression over integer scalars (same contract as
    events_acf), so both engines agree bit-for-bit.  Plan: densify
    join, explode(13 lags) + pair equi-join on (t+lag) shuffling only
    (type, t, y) longs, keyed agg per (pair, lag), two broadcast scalar
    joins.  K event types fan out K*(K-1) pairs — series count, not row
    count, bounds the output."""
    from mcpvectordb_spark.operators.timeseries import xcf

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return xcf(hourly, "event_type", "t", "y", max_lag=12).select(
        F.col("key_x").alias("type_lead"),
        F.col("key_y").alias("type_follow"),
        "lag",
        "n",
        "r",
    )


SQL_EVENTS_XCORR = """
WITH hourly AS (
  SELECT event_type AS k,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
bounds AS (SELECT min(t) AS t0, max(t) AS t1 FROM hourly),
grid AS (
  SELECT k, unnest(range(t0, t1 + 1)) AS t
  FROM (SELECT DISTINCT k FROM hourly) CROSS JOIN bounds),
dense AS (
  SELECT g.k, g.t, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN hourly h ON h.k = g.k AND h.t = g.t),
scal AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
  FROM dense GROUP BY 1),
lags AS (SELECT unnest(range(0, 13)) AS lag),
per_lag AS (
  SELECT l.k AS ka, r.k AS kb, lg.lag,
         CAST(sum(l.y * r.y) AS BIGINT) AS sxy,
         CAST(sum(l.y) AS BIGINT) AS hx,
         CAST(sum(r.y) AS BIGINT) AS ty
  FROM dense l CROSS JOIN lags lg
  JOIN dense r ON r.t = l.t + lg.lag AND r.k <> l.k
  GROUP BY 1, 2, 3)
SELECT p.ka AS type_lead, p.kb AS type_follow, p.lag, sa.n,
       CASE WHEN CAST(sa.n AS DOUBLE) * sa.q - CAST(sa.s AS DOUBLE) * sa.s > 0
             AND CAST(sa.n AS DOUBLE) * sb.q - CAST(sb.s AS DOUBLE) * sb.s > 0
            THEN round(
              (CAST(sa.n AS DOUBLE) * sa.n * p.sxy
               - CAST(sa.n AS DOUBLE) * sa.s * CAST(p.ty AS DOUBLE)
               - CAST(sa.n AS DOUBLE) * sb.s * CAST(p.hx AS DOUBLE)
               + (CAST(sa.n AS DOUBLE) - p.lag) * sa.s * CAST(sb.s AS DOUBLE))
              / (CAST(sa.n AS DOUBLE)
                 * sqrt((CAST(sa.n AS DOUBLE) * sa.q - CAST(sa.s AS DOUBLE) * sa.s)
                        * (CAST(sa.n AS DOUBLE) * sb.q - CAST(sb.s AS DOUBLE) * sb.s))), 6)
       END AS r
FROM per_lag p
JOIN scal sa ON sa.k = p.ka
JOIN scal sb ON sb.k = p.kb
"""


def q_events_catassoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical association (stats.py::cat_association) between
    event type and hour-of-day: chi-square independence statistic, dof,
    mutual information and Cramer's V from ONE contingency groupBy —
    the screening step before trusting hour-of-day as a feature or
    assuming type-stationary traffic.  Marginals re-aggregate the CELLS
    (|types| x 24), never the raw events, and broadcast back; hour is
    integer arithmetic on epoch seconds (the proven-parity path, same
    as events_acf) so the counts agree exactly and the double per-cell
    terms agree to the 6-dp contract."""
    from mcpvectordb_spark.operators.stats import cat_association

    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) % 24).cast("long").alias("hod"),
    )
    return cat_association(obs, "event_type", "hod")


SQL_EVENTS_CATASSOC = """
WITH obs AS (
  SELECT event_type AS a,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS b
  FROM events),
cells AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS nij FROM obs GROUP BY 1, 2),
rmarg AS (SELECT a, CAST(sum(nij) AS BIGINT) AS ri FROM cells GROUP BY 1),
cmarg AS (SELECT b, CAST(sum(nij) AS BIGINT) AS cj FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(sum(nij) AS BIGINT) AS n_total,
         CAST(count(DISTINCT a) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT b) AS BIGINT) AS n_cols
  FROM cells),
terms AS (
  SELECT t.n_total, t.n_rows, t.n_cols,
         (CAST(c.nij AS DOUBLE) - CAST(r.ri AS DOUBLE) * cm.cj / t.n_total)
           * (CAST(c.nij AS DOUBLE) - CAST(r.ri AS DOUBLE) * cm.cj / t.n_total)
           / (CAST(r.ri AS DOUBLE) * cm.cj / t.n_total) AS chi_term,
         CAST(c.nij AS DOUBLE) / t.n_total
           * ln(CAST(t.n_total AS DOUBLE) * c.nij
                / (CAST(r.ri AS DOUBLE) * cm.cj)) AS mi_term
  FROM cells c
  JOIN rmarg r ON r.a = c.a
  JOIN cmarg cm ON cm.b = c.b
  CROSS JOIN tot t),
agg AS (
  SELECT any_value(n_total) AS n,
         any_value(n_rows) AS n_rows,
         any_value(n_cols) AS n_cols,
         (any_value(n_rows) - 1) * (any_value(n_cols) - 1) AS dof,
         round(sum(chi_term), 6) AS chi2,
         round(sum(mi_term), 6) AS mi
  FROM terms)
SELECT n, n_rows, n_cols, dof, chi2, mi,
       CASE WHEN least(n_rows, n_cols) > 1
            THEN round(sqrt(chi2 / (CAST(n AS DOUBLE)
                                    * (CAST(least(n_rows, n_cols) AS DOUBLE) - 1.0))), 6)
       END AS cramers_v
FROM agg
"""


def q_customers_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration audit (stats.py::gini_concentration):
    Gini coefficient + top-1% / top-10% spend shares over per-customer
    lifetime spend — "are 1% of customers half the revenue?".  Spend
    quantizes to exact cents (round(price*100) BIGINT) so every
    statistic is an exact integer; the Gini rank sum never sorts rows —
    customers collapse to VALUE BLOCKS and the tie-invariant block
    formula v*(c*below + c(c+1)/2) runs under a window over the block
    table only (the lr_eval quantized-block pattern).  Top-k shares
    clamp per-block takes from descending cumulative counts — no
    row_number anywhere."""
    from mcpvectordb_spark.operators.stats import gini_concentration

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    return gini_concentration(spend, "cents").select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"),
        "gini",
        "top1_share",
        "top10_share",
    )


SQL_CUSTOMERS_GINI = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1),
blocks AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM spend GROUP BY 1),
b AS (
  SELECT v, c,
         CAST(COALESCE(sum(c) OVER (ORDER BY v ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below,
         CAST(COALESCE(sum(c) OVER (ORDER BY v DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS above
  FROM blocks),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(v * c) AS BIGINT) AS s,
         CAST(sum(v * (c * below + (c * (c + 1)) // 2)) AS BIGINT) AS t
  FROM b),
tops AS (
  SELECT CAST(sum(v * greatest(0, least(c, greatest(1, n // 100) - above))) AS BIGINT) AS top1,
         CAST(sum(v * greatest(0, least(c, greatest(1, n // 10) - above))) AS BIGINT) AS top10
  FROM b CROSS JOIN tot)
SELECT n AS n_customers, s AS total_cents,
       CASE WHEN s > 0 THEN round((2.0 * t - (CAST(n AS DOUBLE) + 1) * s)
                                  / (CAST(n AS DOUBLE) * s), 6) END AS gini,
       CASE WHEN s > 0 THEN round(CAST(top1 AS DOUBLE) / s, 6) END AS top1_share,
       CASE WHEN s > 0 THEN round(CAST(top10 AS DOUBLE) / s, 6) END AS top10_share
FROM tot CROSS JOIN tops
"""


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query (operators/phrase.py::phrase_search) over the
    documents corpus: find every document containing the token sequence
    "stream table hash" IN ORDER, with overlapping-occurrence counts
    and the first anchor position — the positional-index capability
    BM25's bag-of-words cannot express (reference retrieval is
    vector+BM25 only, mcpvectordb/store.py:233).  Plan: map-only
    posexplode postings, broadcast join against the 3 phrase offsets,
    one (doc, anchor) agg counting distinct matched offsets — cost
    tracks the phrase terms' df like a conjunctive Boolean query, never
    the corpus token count.  The oracle replays the same positional
    algebra (anchors, not string matching) so overlapping occurrences
    count identically."""
    from mcpvectordb_spark.operators.phrase import phrase_search

    docs = load_table(spark, sf_dir, "documents")
    return (
        phrase_search(docs, "doc_id", "text", "stream table hash")
        .select(F.col("doc").alias("doc_id"), "n_occurrences", "first_pos")
    )


SQL_PHRASE_SEARCH = """
WITH toks AS (
  SELECT doc_id, pos,
         list_extract(string_split(text, ' '), pos) AS token
  FROM documents
  CROSS JOIN (SELECT unnest(range(1, 301)) AS pos) p
  WHERE pos <= len(string_split(text, ' '))),
offs AS (
  SELECT * FROM (VALUES ('stream', 0), ('table', 1), ('hash', 2)) AS v(token, off)),
hits AS (
  SELECT t.doc_id, t.pos - o.off AS anchor, o.off
  FROM toks t JOIN offs o ON o.token = t.token),
anchors AS (
  SELECT doc_id, anchor, count(DISTINCT off) AS nmatch
  FROM hits GROUP BY 1, 2
  HAVING count(DISTINCT off) = 3 AND anchor >= 1)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(min(anchor) AS BIGINT) AS first_pos
FROM anchors GROUP BY 1
"""


def q_supplier_bt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths (stats.py::bradley_terry) over suppliers
    from head-to-head outcomes: within each order, the supplier shipping
    the larger total quantity "beats" the other — 111k derived games at
    sf0.01 — and 10 MM iterations (Hunter 2004) fit the latent strength
    that preference/reward aggregation needs (the same estimator used on
    pairwise human-preference data).  The games collapse once to a
    <= K^2 pair table; every iteration is that table joined against the
    K-row strength vector, so corpus size only touches the first two
    aggs.  The oracle unrolls all 10 updates as chained CTEs (the
    LP-rounds / matrix-squaring replay pattern)."""
    from mcpvectordb_spark.operators.stats import bradley_terry

    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("q")
    )
    a = per.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("sa"), F.col("q").alias("qa")
    )
    b = per.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("sb"), F.col("q").alias("qb")
    )
    games = a.join(b, "o").filter(F.col("qa") > F.col("qb")).select(
        F.col("sa").alias("winner"), F.col("sb").alias("loser")
    )
    # loop_partitions=8: 100 suppliers and a <=10k pair table — the scoped
    # small-table fast path (pagerank contract); the games derivation above
    # still runs at full parallelism
    out = bradley_terry(games, "winner", "loser", iterations=10, loop_partitions=8)
    return out.select(
        F.col("entity").alias("s_suppkey"), "games", "wins", "strength"
    )


def _sql_bt() -> str:
    base = """
WITH li AS (
  SELECT l_orderkey, l_suppkey, sum(l_quantity) AS q
  FROM lineitem GROUP BY 1, 2),
g AS MATERIALIZED (
  SELECT a.l_suppkey AS win, b.l_suppkey AS lose
  FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey AND a.q > b.q),
sym AS (
  SELECT win AS i, lose AS j, 1 AS w FROM g
  UNION ALL SELECT lose AS i, win AS j, 0 AS w FROM g),
pairs AS MATERIALIZED (
  SELECT i, j, CAST(count(*) AS BIGINT) AS nij, CAST(sum(w) AS BIGINT) AS wij
  FROM sym GROUP BY 1, 2),
tot AS MATERIALIZED (
  SELECT i, CAST(sum(nij) AS BIGINT) AS games_i, CAST(sum(wij) AS BIGINT) AS wins_i
  FROM pairs GROUP BY 1),
p0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS pi FROM tot)"""
    steps = []
    for t in range(1, 11):
        steps.append(f""",
p{t} AS MATERIALIZED (
  SELECT t.i,
         CASE WHEN t.wins_i > 0 THEN CAST(t.wins_i AS DOUBLE) / d.den
              ELSE 0.0 END AS pi
  FROM tot t JOIN (
    SELECT p.i, sum(CAST(p.nij AS DOUBLE) / (a.pi + b.pi)) AS den
    FROM pairs p
    JOIN p{t-1} a ON a.i = p.i
    JOIN p{t-1} b ON b.i = p.j
    GROUP BY 1) d ON d.i = t.i)""")
    tail = """,
z AS (SELECT sum(pi) AS z FROM p10)
SELECT t.i AS s_suppkey, t.games_i AS games, t.wins_i AS wins,
       round(p.pi / z.z, 6) AS strength
FROM p10 p JOIN tot t ON t.i = p.i CROSS JOIN z"""
    return base + "".join(steps) + tail


SQL_SUPPLIER_BT = _sql_bt()


def q_events_hw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive seasonal smoothing (timeseries.py::
    holt_winters_additive) of daily event volume per type, weekly
    period m=7, with a 7-day forecast — the seasonal completion of the
    EWMA -> Holt forecasting ladder (events_ewma_recursive,
    events_holt).  The coupled (level, trend, 7-slot seasonal queue)
    recursion folds O(L) per key; constants 0.5/0.25/0.75 are
    binary-exact and the init (first-week mean on exact integer counts)
    is one double division, so the oracle's recursive CTE — carrying
    the queue as SEVEN explicit columns shifted each step — replays the
    evolution bit-for-bit.  Forecast rows carry n = -1."""
    from mcpvectordb_spark.operators.timeseries import holt_winters_additive

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("k"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("t"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    out = holt_winters_additive(
        daily, "k", "t", "x", alpha=0.5, beta=0.25, gamma=0.25, period=7, horizon=7
    )
    return out.select(
        F.col("k").alias("event_type"),
        "t",
        F.coalesce(F.col("x"), F.lit(-1.0)).cast("long").alias("n"),
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("seasonal_used", 6).alias("seasonal_used"),
        F.round("fitted", 6).alias("fitted"),
    )


SQL_EVENTS_HW = """
WITH RECURSIVE daily AS (
  SELECT event_type AS k,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT k, t, x, row_number() OVER (PARTITION BY k ORDER BY t) AS rk
  FROM daily),
initv AS (
  SELECT k,
         max(CASE WHEN rk = 1 THEN x END) AS x1,
         max(CASE WHEN rk = 2 THEN x END) AS x2,
         max(CASE WHEN rk = 3 THEN x END) AS x3,
         max(CASE WHEN rk = 4 THEN x END) AS x4,
         max(CASE WHEN rk = 5 THEN x END) AS x5,
         max(CASE WHEN rk = 6 THEN x END) AS x6,
         max(CASE WHEN rk = 7 THEN x END) AS x7,
         max(CASE WHEN rk = 7 THEN t END) AS t7
  FROM ranked WHERE rk <= 7 GROUP BY 1
  HAVING count(*) = 7),
hw AS (
  SELECT i.k, CAST(7 AS BIGINT) AS rk, i.t7 AS t,
         CAST(NULL AS DOUBLE) AS x,
         (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS l,
         CAST(0.0 AS DOUBLE) AS b,
         i.x1 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s1,
         i.x2 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s2,
         i.x3 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s3,
         i.x4 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s4,
         i.x5 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s5,
         i.x6 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s6,
         i.x7 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s7,
         CAST(NULL AS DOUBLE) AS su,
         CAST(NULL AS DOUBLE) AS f
  FROM initv i
  UNION ALL
  SELECT r.k, r.rk, r.t, r.x,
         0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b) AS l,
         0.25 * ((0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b AS b,
         h.s2 AS s1, h.s3 AS s2, h.s4 AS s3, h.s5 AS s4, h.s6 AS s5, h.s7 AS s6,
         0.25 * (r.x - (0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b))) + 0.75 * h.s1 AS s7,
         h.s1 AS su,
         h.l + h.b + h.s1 AS f
  FROM hw h JOIN ranked r ON r.k = h.k AND r.rk = h.rk + 1),
last AS (SELECT k, max(rk) AS mrk FROM hw GROUP BY 1),
fin AS (
  SELECT h.* FROM hw h JOIN last l ON h.k = l.k AND h.rk = l.mrk
  WHERE l.mrk >= 8),
fut AS (
  SELECT fin.k, fin.t + gs.h AS t, CAST(-1.0 AS DOUBLE) AS x,
         fin.l AS level, fin.b AS trend,
         CASE gs.h WHEN 1 THEN fin.s1 WHEN 2 THEN fin.s2 WHEN 3 THEN fin.s3
                   WHEN 4 THEN fin.s4 WHEN 5 THEN fin.s5 WHEN 6 THEN fin.s6
                   ELSE fin.s7 END AS seasonal_used,
         fin.l + gs.h * fin.b
           + CASE gs.h WHEN 1 THEN fin.s1 WHEN 2 THEN fin.s2 WHEN 3 THEN fin.s3
                       WHEN 4 THEN fin.s4 WHEN 5 THEN fin.s5 WHEN 6 THEN fin.s6
                       ELSE fin.s7 END AS fitted
  FROM fin, (SELECT unnest(range(1, 8)) AS h) gs)
SELECT k AS event_type, t, CAST(x AS BIGINT) AS n,
       round(l, 6) AS level, round(b, 6) AS trend,
       round(su, 6) AS seasonal_used, round(f, 6) AS fitted
FROM hw WHERE rk >= 8
UNION ALL
SELECT k AS event_type, t, CAST(x AS BIGINT) AS n,
       round(level, 6) AS level, round(trend, 6) AS trend,
       round(seasonal_used, 6) AS seasonal_used, round(fitted, 6) AS fitted
FROM fut
"""


def q_events_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation (timeseries.py::pacf) of hourly event
    volume per type, lags 1..24 — the Durbin-Levinson companion to
    events_acf that identifies AR order (PACF cuts off where ACF only
    decays).  The D-L recursion consumes the 6-dp-ROUNDED ACF values —
    already bit-identical across engines by events_acf's integer-sum
    contract — so every left-associated dot product and division
    replays exactly; the oracle carries the phi vector as a LIST column
    through a recursive CTE (list_transform/list_reduce mirroring
    zip_with/aggregate).  The fold is O(K^2) per key with K = 24, a
    constant — corpus scale only enters through the ACF pipeline."""
    from mcpvectordb_spark.operators.timeseries import pacf

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return pacf(hourly, "event_type", "t", "y", max_lag=24).select(
        "event_type", "lag", "r", "pacf"
    )


SQL_EVENTS_PACF = """
WITH RECURSIVE hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(t) AS t0, max(t) AS t1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(range(t0, t1 + 1)) AS t FROM bounds),
dense AS MATERIALIZED (
  SELECT g.event_type, g.t, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.t = g.t),
scal AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
  FROM dense GROUP BY 1),
lags AS (SELECT unnest(range(1, 25)) AS lag),
per_lag AS (
  SELECT l.event_type, lg.lag,
         CAST(sum(l.y * r.y) AS BIGINT) AS syy,
         CAST(sum(l.y) AS BIGINT) AS h,
         CAST(sum(r.y) AS BIGINT) AS tt
  FROM dense l CROSS JOIN lags lg
  JOIN dense r ON r.event_type = l.event_type AND r.t = l.t + lg.lag
  GROUP BY 1, 2),
acf AS MATERIALIZED (
  SELECT p.event_type AS k, p.lag,
         round((CAST(s.n AS DOUBLE) * s.n * p.syy
                - CAST(s.n AS DOUBLE) * s.s * CAST(p.h + p.tt AS DOUBLE)
                + (CAST(s.n AS DOUBLE) - p.lag) * s.s * s.s)
               / (CAST(s.n AS DOUBLE) * s.n * s.q
                  - CAST(s.n AS DOUBLE) * s.s * s.s), 6) AS rv
  FROM per_lag p JOIN scal s ON s.event_type = p.event_type
  WHERE CAST(s.n AS DOUBLE) * s.n * s.q - CAST(s.n AS DOUBLE) * s.s * s.s > 0),
dl AS (
  SELECT k, 1 AS lag, rv, [rv] AS rs, [rv] AS phi, rv AS pacf
  FROM acf WHERE lag = 1
  UNION ALL
  SELECT a.k, a.lag, a.rv,
         list_append(d.rs, a.rv) AS rs,
         list_append(
           list_transform(range(1, len(d.phi) + 1),
             j -> d.phi[j]
                  - ((a.rv - list_reduce(list_transform(range(1, len(d.phi) + 1),
                                           i -> d.phi[i] * list_reverse(d.rs)[i]),
                                         (x, y) -> x + y))
                     / (1.0 - list_reduce(list_transform(range(1, len(d.phi) + 1),
                                            i -> d.phi[i] * d.rs[i]),
                                          (x, y) -> x + y)))
                    * list_reverse(d.phi)[j]),
           (a.rv - list_reduce(list_transform(range(1, len(d.phi) + 1),
                                 i -> d.phi[i] * list_reverse(d.rs)[i]),
                               (x, y) -> x + y))
           / (1.0 - list_reduce(list_transform(range(1, len(d.phi) + 1),
                                  i -> d.phi[i] * d.rs[i]),
                                (x, y) -> x + y))) AS phi,
         (a.rv - list_reduce(list_transform(range(1, len(d.phi) + 1),
                               i -> d.phi[i] * list_reverse(d.rs)[i]),
                             (x, y) -> x + y))
         / (1.0 - list_reduce(list_transform(range(1, len(d.phi) + 1),
                                i -> d.phi[i] * d.rs[i]),
                              (x, y) -> x + y)) AS pacf
  FROM dl d JOIN acf a ON a.k = d.k AND a.lag = d.lag + 1)
SELECT k AS event_type, CAST(lag AS BIGINT) AS lag, rv AS r,
       round(pacf, 6) AS pacf
FROM dl
"""


def q_near_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval (operators/phrase.py::near_search):
    documents where "stream" and "hash" occur within 4 tokens of each
    other in either order — the NEAR/k middle ground between
    phrase_search's exact adjacency and BM25's bag-of-words.  Postings
    filter to the two terms via a broadcast join, then one per-document
    position-pair join whose fan-out is tf_a*tf_b — df-bounded like a
    conjunctive query.  The oracle replays the identical positional
    algebra."""
    from mcpvectordb_spark.operators.phrase import near_search

    docs = load_table(spark, sf_dir, "documents")
    return near_search(docs, "doc_id", "text", "stream", "hash", window=4).select(
        F.col("doc").alias("doc_id"), "min_dist", "pairs_within"
    )


SQL_NEAR_SEARCH = """
WITH toks AS (
  SELECT doc_id, pos,
         list_extract(string_split(text, ' '), pos) AS token
  FROM documents
  CROSS JOIN (SELECT unnest(range(1, 301)) AS pos) p
  WHERE pos <= len(string_split(text, ' '))),
pa AS (SELECT doc_id, pos AS pa FROM toks WHERE token = 'stream'),
pb AS (SELECT doc_id, pos AS pb FROM toks WHERE token = 'hash'),
pairs AS (
  SELECT pa.doc_id, abs(pa.pa - pb.pb) AS dist
  FROM pa JOIN pb ON pb.doc_id = pa.doc_id)
SELECT doc_id,
       CAST(min(dist) AS BIGINT) AS min_dist,
       CAST(sum(CASE WHEN dist <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS pairs_within
FROM pairs GROUP BY 1
HAVING min(dist) <= 4
"""


def q_parts_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Vovk; Lei et al.) on the
    parts price model: OLS (stats.py::ols2_fit) trains on the hash-even
    half, absolute residuals on the hash-odd calibration half yield the
    finite-sample 90% radius q_hat = k-th smallest score with
    k = ceil(0.9*(n_cal+1)) — the distribution-free guarantee that
    |y - y_hat| <= q_hat with probability >= 0.9 on exchangeable data.
    The k-th smallest never sorts rows: scores collapse to VALUE BLOCKS
    (identical doubles from identical integer-sum algebra) and k is
    picked off the block cumsum (the customers_gini pattern); k itself
    is exact integer arithmetic (9*(n+1)+9)//10.  Output also reports
    train-half coverage at q_hat as a sanity diagnostic."""
    from mcpvectordb_spark.operators.dedup import hexint48
    from mcpvectordb_spark.operators.stats import ols2_fit

    part = load_table(spark, sf_dir, "part")
    obs = part.select(
        F.round(F.col("p_retailprice") * 10, 0).cast("long").alias("y10"),
        F.col("p_size").cast("long").alias("x1"),
        F.length("p_name").cast("long").alias("x2"),
        F.pmod(hexint48(F.col("p_partkey").cast("string")), F.lit(2)).alias("h"),
    ).localCheckpoint(eager=False)
    train = obs.filter(F.col("h") == 0).withColumn("g", F.lit("g"))
    fit = ols2_fit(train, "g", "y10", "x1", "x2").select("b0", "b1", "b2")
    score = F.abs(
        F.col("y10").cast("double")
        - (
            F.col("b0")
            + F.col("b1") * F.col("x1").cast("double")
            + F.col("b2") * F.col("x2").cast("double")
        )
    )
    cal = obs.filter(F.col("h") == 1).crossJoin(F.broadcast(fit)).select(
        score.alias("s")
    )
    blocks = cal.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    wq = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = blocks.select("s", F.sum("c").over(wq).alias("cum"))
    ncal = cal.agg(F.count(F.lit(1)).alias("n_cal"))
    qhat = (
        ranked.crossJoin(F.broadcast(ncal))
        .filter(
            F.col("cum")
            >= ((F.lit(9) * (F.col("n_cal") + 1) + 9) / 10).cast("long")
        )
        .agg(F.min("s").alias("qhat"), F.first("n_cal").alias("n_cal"))
    )
    tr_scored = train.crossJoin(F.broadcast(fit)).select(score.alias("s"))
    cov = tr_scored.crossJoin(F.broadcast(qhat)).agg(
        F.count(F.lit(1)).alias("n_train"),
        F.first("n_cal").alias("n_cal"),
        F.round(F.first("qhat") / 10, 4).alias("qhat_price"),
        F.round(
            F.sum(F.when(F.col("s") <= F.col("qhat"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("coverage_train"),
    )
    return cov


SQL_PARTS_CONFORMAL = f"""
WITH obs AS (
  SELECT CAST(round(p_retailprice * 10) AS BIGINT) AS y,
         CAST(p_size AS BIGINT) AS x1,
         CAST(length(p_name) AS BIGINT) AS x2,
         {_sql_hex48("CAST(p_partkey AS VARCHAR)")} % 2 AS h
  FROM part),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y
  FROM obs WHERE h = 0),
d AS (
  SELECT CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2)
           + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2) AS det,
         CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2y)
           + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2y) AS det0,
         CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2y)
           - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2)
           + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s2) AS det1,
         CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s2)
           + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2) AS det2
  FROM g),
fit AS (SELECT det0 / det AS b0, det1 / det AS b1, det2 / det AS b2 FROM d),
cal AS (
  SELECT abs(CAST(o.y AS DOUBLE) - (f.b0 + f.b1 * CAST(o.x1 AS DOUBLE)
                                     + f.b2 * CAST(o.x2 AS DOUBLE))) AS s
  FROM obs o CROSS JOIN fit f WHERE o.h = 1),
blocks AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY 1),
ranked AS (
  SELECT s, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum FROM blocks),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
qh AS (
  SELECT min(s) AS qhat, any_value(n_cal) AS n_cal
  FROM ranked CROSS JOIN nc
  WHERE cum >= (9 * (n_cal + 1) + 9) // 10),
tr AS (
  SELECT abs(CAST(o.y AS DOUBLE) - (f.b0 + f.b1 * CAST(o.x1 AS DOUBLE)
                                     + f.b2 * CAST(o.x2 AS DOUBLE))) AS s
  FROM obs o CROSS JOIN fit f WHERE o.h = 0)
SELECT CAST(count(*) AS BIGINT) AS n_train,
       any_value(q.n_cal) AS n_cal,
       round(any_value(q.qhat) / 10, 4) AS qhat_price,
       round(CAST(sum(CASE WHEN tr.s <= q.qhat THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS coverage_train
FROM tr CROSS JOIN qh q
"""


def q_vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus vocabulary: regress ln(frequency) on
    ln(rank) over the top-1000 terms — the corpus-health diagnostic
    (natural language runs slope ~ -1; synthetic/templated corpora, like
    this one's ~40-word vocabulary, deviate measurably, which is exactly
    what the check is for).  Ranks come from a deterministic
    (freq DESC, term ASC) row_number over the VOCABULARY (bounded by
    distinct terms, never corpus rows); the simple-regression closed
    form runs on one agg of the <=1000 (ln rank, ln freq) points.
    Frequencies are exact integer counts; the ln/sum arithmetic is the
    6-dp double contract (log parity proven by PMI/logloss/AA
    queries)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(dd.normalize_text(F.col("text")), " ")).alias("term")
    ).filter(F.length("term") > 0)
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.col("f").desc(), F.col("term").asc())
    ranked = (
        freq.select("term", "f", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 1000)
    )
    pts = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / nd
    corr_num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    corr_den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    tot = toks.agg(F.count(F.lit(1)).alias("total_tokens"))
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("vocab_ranked"),
        "total_tokens",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
        F.round(corr_num / corr_den, 6).alias("loglog_corr"),
    )


SQL_VOCAB_ZIPF = f"""
WITH toks AS (
  SELECT unnest({_sql_words("text")}) AS term FROM documents),
toks2 AS (SELECT term FROM toks WHERE length(term) > 0),
freq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS f FROM toks2 GROUP BY 1),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, term ASC) AS rank
  FROM freq QUALIFY rank <= 1000),
pts AS (
  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y FROM ranked),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM pts),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM toks2)
SELECT n AS vocab_ranked, total_tokens,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
             / CAST(n AS DOUBLE), 6) AS zipf_intercept,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS loglog_corr
FROM agg CROSS JOIN tot
"""


def q_orders_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (dataquality.py::fd_discovery)
    over seven canonical orders attributes (price quantized to exact
    cents, date formatted, plus a derived order-month column) — the
    TANE-lite profiling pass that surfaces keys (o_orderkey -> every
    column) and derived columns (o_orderdate -> order_month) and
    measures how badly every other candidate FD fails (g3-style
    violation counts).  Fan-out is |cols|^2 per row — schema-sized —
    followed by two map-side-combinable aggs; the oracle replays the
    same pair explosion with UNION-free list algebra."""
    from mcpvectordb_spark.operators.dataquality import fd_discovery

    orders = load_table(spark, sf_dir, "orders")
    cols = {
        "orderkey": F.col("o_orderkey"),
        "custkey": F.col("o_custkey"),
        "status": F.col("o_orderstatus"),
        "price_cents": F.round(F.col("o_totalprice") * 100, 0).cast("long"),
        "orderdate": F.date_format("o_orderdate", "yyyy-MM-dd"),
        "priority": F.col("o_orderpriority"),
        "order_month": F.date_format("o_orderdate", "yyyy-MM"),
    }
    return fd_discovery(orders, cols).select(
        "lhs", "rhs", "n_lhs_values", "n_violating_lhs", "extra_rhs_values", "holds"
    )


SQL_ORDERS_FD = """
WITH canon AS (
  SELECT [
    struct_pack(attr := 'orderkey',    val := CAST(o_orderkey AS VARCHAR)),
    struct_pack(attr := 'custkey',     val := CAST(o_custkey AS VARCHAR)),
    struct_pack(attr := 'status',      val := o_orderstatus),
    struct_pack(attr := 'price_cents', val := CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)),
    struct_pack(attr := 'orderdate',   val := strftime(o_orderdate, '%Y-%m-%d')),
    struct_pack(attr := 'priority',    val := o_orderpriority),
    struct_pack(attr := 'order_month', val := strftime(o_orderdate, '%Y-%m'))
  ] AS vals
  FROM orders),
pairs AS (
  SELECT a.attr AS lhs, a.val AS aval, b.attr AS rhs, b.val AS bval
  FROM canon, unnest(vals) AS ta(a), unnest(vals) AS tb(b)
  WHERE a.attr <> b.attr),
per_lhs AS (
  SELECT lhs, rhs, aval, CAST(count(DISTINCT bval) AS BIGINT) AS nb
  FROM pairs GROUP BY 1, 2, 3)
SELECT lhs, rhs,
       CAST(count(*) AS BIGINT) AS n_lhs_values,
       CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_lhs,
       CAST(sum(nb - 1) AS BIGINT) AS extra_rhs_values,
       max(nb) = 1 AS holds
FROM per_lhs GROUP BY 1, 2
"""


def q_events_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (stats.py::quantile_normalize) of event
    values across event types: each type's value distribution maps onto
    the pooled distribution by exact integer rank — the batch-effect
    correction that makes per-source feature scales comparable before
    mixing (values quantized to whole units, ~400 blocks at sf0.1).
    Windows run over VALUE BLOCKS per type and pooled, never rows; the
    target rank (c*N + n_k - 1) div n_k is exact BIGINT arithmetic and
    the pooled lookup is a broadcast inequality join.  Output is the
    per-(type, value) normalization MAP, top 50 most frequent blocks
    per type pinned by deterministic order."""
    from mcpvectordb_spark.operators.stats import quantile_normalize

    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type", F.round("value", 0).cast("long").alias("vu")
    )
    out = quantile_normalize(obs, "event_type", "vu")
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("v").asc()
    )
    return (
        out.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .select(
            "event_type", "v", "n", "norm", F.col("rk").cast("long").alias("rk")
        )
    )


SQL_EVENTS_QUANTILE_NORM = """
WITH obs AS (
  SELECT event_type AS k, CAST(round(value) AS BIGINT) AS v FROM events),
blocks AS (
  SELECT k, v, CAST(count(*) AS BIGINT) AS c FROM obs GROUP BY 1, 2),
kb AS (
  SELECT k, v, c,
         CAST(sum(c) OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS cumk
  FROM blocks),
nk AS (SELECT k, CAST(sum(c) AS BIGINT) AS n_k FROM blocks GROUP BY 1),
pooled AS (
  SELECT v AS pv, CAST(count(*) AS BIGINT) AS pc FROM obs GROUP BY 1),
pb AS (
  SELECT pv, CAST(sum(pc) OVER (ORDER BY pv) AS BIGINT) AS cump FROM pooled),
ntot AS (SELECT CAST(sum(pc) AS BIGINT) AS n_tot FROM pooled),
ranked AS (
  SELECT kb.k, kb.v, kb.c,
         (kb.cumk * n_tot + nk.n_k - 1) // nk.n_k AS r
  FROM kb JOIN nk ON nk.k = kb.k CROSS JOIN ntot),
hit AS (
  SELECT r2.k, r2.v, r2.c AS n, min(pb.pv) AS norm
  FROM ranked r2 JOIN pb ON pb.cump >= r2.r
  GROUP BY 1, 2, 3),
ord AS (
  SELECT k AS event_type, v, n, norm,
         row_number() OVER (PARTITION BY k ORDER BY n DESC, v ASC) AS rk
  FROM hit)
SELECT event_type, v, n, norm, CAST(rk AS BIGINT) AS rk
FROM ord WHERE rk <= 50
"""


def q_mix_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix raking (curation.py::ipf_rake): iterative
    proportional fitting of the documents (lang x source) contingency
    toward UNIFORM language and source marginals — the survey-weighting
    answer to "what per-cell sampling factor balances language AND
    source simultaneously?", the 2-marginal upgrade over
    mixture_temperature's single-axis reweighting.  8 IPF rounds run as
    16 chained window scalings over the ~100-cell table in ONE linear
    plan (no per-round joins or checkpoints); targets are exact-count
    divisions N/|langs|, N/|sources|.  The oracle unrolls all 16 window
    steps as chained CTEs."""
    from mcpvectordb_spark.operators.curation import ipf_rake

    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(
        F.sum("n").alias("nn"),
        F.countDistinct("lang").alias("nl"),
        F.countDistinct("source").alias("ns"),
    )
    rt = (
        cells.select("lang").distinct().crossJoin(F.broadcast(tot))
        .select("lang", (F.col("nn") / F.col("nl")).alias("t"))
    )
    ct = (
        cells.select("source").distinct().crossJoin(F.broadcast(tot))
        .select("source", (F.col("nn") / F.col("ns")).alias("t"))
    )
    out = ipf_rake(cells, "lang", "source", "n", rt, ct, iterations=8)
    return out.select(
        "lang",
        "source",
        "n",
        F.round("weight", 6).alias("weight"),
        F.round("factor", 6).alias("factor"),
    )


def _sql_mix_raking() -> str:
    base = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         CAST(count(DISTINCT lang) AS BIGINT) AS nl,
         CAST(count(DISTINCT source) AS BIGINT) AS ns
  FROM cells),
w0 AS (
  SELECT c.lang, c.source, c.n,
         CAST(c.n AS DOUBLE) AS w,
         CAST(t.nn AS DOUBLE) / t.nl AS tr,
         CAST(t.nn AS DOUBLE) / t.ns AS tc
  FROM cells c CROSS JOIN tot t)"""
    steps = []
    k = 0
    for _ in range(8):
        steps.append(f""",
w{k + 1} AS (
  SELECT lang, source, n, tr, tc,
         w * tr / sum(w) OVER (PARTITION BY lang) AS w
  FROM w{k})""")
        steps.append(f""",
w{k + 2} AS (
  SELECT lang, source, n, tr, tc,
         w * tc / sum(w) OVER (PARTITION BY source) AS w
  FROM w{k + 1})""")
        k += 2
    tail = f"""
SELECT lang, source, n, round(w, 6) AS weight,
       round(w / CAST(n AS DOUBLE), 6) AS factor
FROM w{k}"""
    return base + "".join(steps) + tail


SQL_MIX_RAKING = _sql_mix_raking()


def q_events_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness audit per event type: Fano factor
    (variance-to-mean ratio of hourly counts — 1 under a Poisson
    process), squared coefficient of variation, and the z-scored
    dispersion test (Fisher's (n-1)*F ~ chi2_{n-1}, normal-approximated
    via sqrt(2*chi2) - sqrt(2*dof - 1)) — the diagnostic that separates
    Poisson-like traffic from bursty/clumped arrivals before trusting
    rate-based alerts.  Hourly counts densify to zero on the per-type
    grid and every moment is an exact BIGINT sum (the events_acf
    contract); the chi2 normal approximation is one sqrt expression
    over those scalars."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).alias("y"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("t0", "t1")).alias("t")
    )
    dense = grid.join(hourly, ["event_type", "t"], "left").select(
        "event_type", F.coalesce("y", F.lit(0)).alias("y")
    )
    s = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    syd = F.col("sy").cast("double")
    syyd = F.col("syy").cast("double")
    mean = syd / nd
    var = (nd * syyd - syd * syd) / (nd * (nd - 1))
    fano = var / mean
    chi2 = (nd - 1) * fano
    zdisp = F.sqrt(F.lit(2.0) * chi2) - F.sqrt(F.lit(2.0) * (nd - 1) - 1)
    return s.select(
        "event_type",
        "n",
        F.col("sy").alias("total"),
        F.round(mean, 6).alias("mean_per_hour"),
        F.round(fano, 6).alias("fano"),
        F.round(var / (mean * mean), 6).alias("cv2"),
        F.round(zdisp, 6).alias("z_dispersion"),
        (zdisp > 1.6449).alias("overdispersed"),
    )


SQL_EVENTS_DISPERSION = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(t) AS t0, max(t) AS t1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(range(t0, t1 + 1)) AS t FROM bounds),
dense AS (
  SELECT g.event_type, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.t = g.t),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM dense GROUP BY 1)
SELECT event_type, n, sy AS total,
       round(CAST(sy AS DOUBLE) / n, 6) AS mean_per_hour,
       round(((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
             / (CAST(sy AS DOUBLE) / n), 6) AS fano,
       round(((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
             / ((CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)), 6) AS cv2,
       round(sqrt(2.0 * ((CAST(n AS DOUBLE) - 1)
                         * (((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                            / (CAST(sy AS DOUBLE) / n))))
             - sqrt(2.0 * (CAST(n AS DOUBLE) - 1) - 1), 6) AS z_dispersion,
       (sqrt(2.0 * ((CAST(n AS DOUBLE) - 1)
                    * (((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                       / (CAST(sy AS DOUBLE) / n))))
        - sqrt(2.0 * (CAST(n AS DOUBLE) - 1) - 1)) > 1.6449 AS overdispersed
FROM s
"""


def q_events_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test over the live event
    stream: is the error-event share elevated (H1: p = 0.3) or at
    baseline (H0: p = 0.2)?  alpha = beta = 0.05, so the log-likelihood
    walk S_n = k_n ln(p1/p0) + (n - k_n) ln((1-p1)/(1-p0)) stops at the
    FIRST crossing of +/- ln(19) — the early-stopping monitor that
    answers with ~half the samples a fixed-horizon test needs.  k_n is
    an exact integer cumulative count (one ordered window), S_n is two
    constants times integers, and the stop index is a min over crossing
    rows.  Scale note: a sequential test is inherently ordered — at
    100 TB you process ts-bucketed chunks only UNTIL the decision, which
    is exactly the point of SPRT; the window here runs over the ordered
    event stream once.  Output: one decision row (+ the walk's final
    state for the no-decision case)."""
    ev = load_table(spark, sf_dir, "events")
    c1 = F.log(F.lit(0.3) / F.lit(0.2))
    c0 = F.log(F.lit(0.7) / F.lit(0.8))
    a_bound = F.log(F.lit(19.0))
    w = Window.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    walk = ev.select(
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("x"),
    ).select(
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("k"),
    ).select(
        "n",
        "k",
        (F.col("k") * c1 + (F.col("n") - F.col("k")) * c0).alias("s"),
    )
    crossed = walk.filter(
        (F.col("s") >= a_bound) | (F.col("s") <= -a_bound)
    ).agg(F.min("n").alias("n_dec"))
    dec = walk.crossJoin(F.broadcast(crossed)).filter(
        F.col("n") == F.col("n_dec")
    )
    tot = walk.agg(F.max("n").alias("n_total"))
    return dec.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("s") >= a_bound, F.lit("elevated"))
        .otherwise(F.lit("baseline"))
        .alias("decision"),
        F.col("n").alias("n_at_decision"),
        F.col("k").alias("k_errors"),
        F.round("s", 6).alias("llr"),
        "n_total",
        F.round(F.lit(1.0) - F.col("n") / F.col("n_total").cast("double"), 6).alias(
            "frac_saved"
        ),
    )


SQL_EVENTS_SPRT = """
WITH walk AS (
  SELECT count(*) OVER w AS n,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w AS k
  FROM events
  WINDOW w AS (ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
scored AS (
  SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
         k * ln(0.3 / 0.2) + (n - k) * ln(0.7 / 0.8) AS s
  FROM walk),
crossed AS (
  SELECT min(n) AS n_dec FROM scored
  WHERE s >= ln(19.0) OR s <= -ln(19.0)),
tot AS (SELECT max(n) AS n_total FROM scored)
SELECT CASE WHEN sc.s >= ln(19.0) THEN 'elevated' ELSE 'baseline' END AS decision,
       sc.n AS n_at_decision, sc.k AS k_errors,
       round(sc.s, 6) AS llr,
       t.n_total,
       round(1.0 - CAST(sc.n AS DOUBLE) / t.n_total, 6) AS frac_saved
FROM scored sc CROSS JOIN crossed c CROSS JOIN tot t
WHERE sc.n = c.n_dec
"""


def q_events_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch relative-error quantiles (sketches.py::dd_sketch /
    dd_quantile, Masson et al. VLDB'19): per-type p50/p90/p99 of event
    value from log-bucket counts (gamma = 1.02 -> <= 0.99% relative
    error BY THEOREM, unlike the equi-width histogram's absolute bin
    error in events_quantile_sketch).  The sketch is one map-side-
    combinable (type, bucket) count table — mergeable like HLL/CMS; the
    accuracy gate is IN-PLAN: the exact discrete quantile comes from
    value blocks (the customers_gini rank trick) and the emitted
    within_bound boolean compares |est-exact|/exact to the guarantee, so
    estimator drift fails the hash gate in both engines."""
    from mcpvectordb_spark.operators.sketches import dd_quantile, dd_sketch

    ev = load_table(spark, sf_dir, "events")
    pos = ev.select("event_type", "value").filter(F.col("value") > 0)
    sk = dd_sketch(pos, "event_type", "value", gamma=1.02)
    est = dd_quantile(sk, [0.5, 0.9, 0.99], gamma=1.02)
    blocks = pos.groupBy(
        F.col("event_type").alias("k2"), F.col("value").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    wv = Window.partitionBy("k2").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = blocks.select("k2", "v", F.sum("c").over(wv).alias("cumv"))
    exact = est.select(
        "k",
        "q",
        "n",
        "bucket",
        "est",
        ((F.round(F.col("q") * 10000).cast("long") * F.col("n") + 9999) / 10000)
        .cast("long")
        .alias("r"),
    )
    hit = (
        exact.join(cum, exact["k"] == cum["k2"])
        .filter(F.col("cumv") >= F.col("r"))
        .groupBy("k", "q", "n", "bucket", "est")
        .agg(F.min("v").alias("exact"))
    )
    tol = (1.02 - 1.0) / (1.02 + 1.0)
    return hit.select(
        F.col("k").alias("event_type"),
        "q",
        "n",
        "bucket",
        F.round("est", 6).alias("est"),
        F.round("exact", 6).alias("exact"),
        (
            F.abs(F.col("est") - F.col("exact")) / F.col("exact") <= F.lit(tol)
        ).alias("within_bound"),
    )


SQL_EVENTS_DDSKETCH = """
WITH pos AS (
  SELECT event_type AS k, value AS v FROM events WHERE value > 0),
sk AS (
  SELECT k, CAST(ceil(ln(v) / 0.01980262729617973) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM pos GROUP BY 1, 2),
cumb AS (
  SELECT k, bucket,
         CAST(sum(c) OVER (PARTITION BY k ORDER BY bucket) AS BIGINT) AS cum
  FROM sk),
tot AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM sk GROUP BY 1),
qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q),
ranks AS (
  SELECT t.k, qs.q, t.n,
         (CAST(round(qs.q * 10000) AS BIGINT) * t.n + 9999) // 10000 AS r
  FROM tot t CROSS JOIN qs),
hitb AS (
  SELECT rk.k, rk.q, rk.n, rk.r, min(cb.bucket) AS bucket
  FROM ranks rk JOIN cumb cb ON cb.k = rk.k AND cb.cum >= rk.r
  GROUP BY 1, 2, 3, 4),
blocks AS (
  SELECT k, v, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY 1, 2),
cumv AS (
  SELECT k, v,
         CAST(sum(c) OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS cum
  FROM blocks),
ex AS (
  SELECT h.k, h.q, h.n, h.bucket,
         2.0 * power(1.02, CAST(h.bucket AS DOUBLE)) / 2.02 AS est,
         min(cv.v) AS exact
  FROM hitb h JOIN cumv cv ON cv.k = h.k AND cv.cum >= h.r
  GROUP BY 1, 2, 3, 4, 5)
SELECT k AS event_type, q, n, bucket,
       round(est, 6) AS est, round(exact, 6) AS exact,
       abs(est - exact) / exact <= 0.00990099009900991 AS within_bound
FROM ex
"""


def q_events_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-skill evaluation: MASE (mean absolute scaled error,
    Hyndman & Koehler 2006 — the M-competition standard) of the
    Holt-Winters one-step forecasts against the SEASONAL-NAIVE
    benchmark x_hat_t = x_{t-7}, per event type.  MASE < 1 means the
    model beats the naive seasonal repeat, the bar every forecaster
    must clear; both error sums run over the same post-first-season
    rows.  The naive lag is exact integer arithmetic; the model errors
    reuse the bit-exact HW fold, so the oracle (HW recursion + lag
    window + one agg) hash-matches."""
    from mcpvectordb_spark.operators.timeseries import holt_winters_additive

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("k"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("t"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x")).localCheckpoint(
        eager=False
    )
    hw = holt_winters_additive(
        daily, "k", "t", "x", alpha=0.5, beta=0.25, gamma=0.25, period=7
    )
    wlag = Window.partitionBy("k").orderBy("t")
    naive = daily.select(
        "k", "t", F.lag("x", 7).over(wlag).alias("xn")
    ).filter(F.col("xn").isNotNull())
    j = hw.join(naive, ["k", "t"]).select(
        "k",
        F.abs(F.col("x") - F.col("fitted")).alias("e_model"),
        F.abs(F.col("x") - F.col("xn").cast("double")).alias("e_naive"),
    )
    return (
        j.groupBy(F.col("k").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.round(F.avg("e_model"), 6).alias("mae_model"),
            F.round(F.avg("e_naive"), 6).alias("mae_naive"),
            F.round(F.sum("e_model") / F.sum("e_naive"), 6).alias("mase"),
            (F.sum("e_model") < F.sum("e_naive")).alias("beats_naive"),
        )
    )


SQL_EVENTS_MASE = """
WITH RECURSIVE daily AS (
  SELECT event_type AS k,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT k, t, x, row_number() OVER (PARTITION BY k ORDER BY t) AS rk
  FROM daily),
initv AS (
  SELECT k,
         max(CASE WHEN rk = 1 THEN x END) AS x1,
         max(CASE WHEN rk = 2 THEN x END) AS x2,
         max(CASE WHEN rk = 3 THEN x END) AS x3,
         max(CASE WHEN rk = 4 THEN x END) AS x4,
         max(CASE WHEN rk = 5 THEN x END) AS x5,
         max(CASE WHEN rk = 6 THEN x END) AS x6,
         max(CASE WHEN rk = 7 THEN x END) AS x7
  FROM ranked WHERE rk <= 7 GROUP BY 1
  HAVING count(*) = 7),
hw AS (
  SELECT i.k, CAST(7 AS BIGINT) AS rk,
         (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS l,
         CAST(0.0 AS DOUBLE) AS b,
         i.x1 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s1,
         i.x2 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s2,
         i.x3 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s3,
         i.x4 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s4,
         i.x5 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s5,
         i.x6 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s6,
         i.x7 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s7,
         CAST(NULL AS DOUBLE) AS x, CAST(NULL AS BIGINT) AS t,
         CAST(NULL AS DOUBLE) AS f
  FROM initv i
  UNION ALL
  SELECT r.k, r.rk,
         0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b) AS l,
         0.25 * ((0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b AS b,
         h.s2, h.s3, h.s4, h.s5, h.s6, h.s7,
         0.25 * (r.x - (0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b))) + 0.75 * h.s1 AS s7,
         r.x, r.t,
         h.l + h.b + h.s1 AS f
  FROM hw h JOIN ranked r ON r.k = h.k AND r.rk = h.rk + 1),
naive AS (
  SELECT k, t, x,
         lag(x, 7) OVER (PARTITION BY k ORDER BY t) AS xn
  FROM daily QUALIFY xn IS NOT NULL),
j AS (
  SELECT h.k, abs(h.x - h.f) AS e_model, abs(n.x - n.xn) AS e_naive
  FROM hw h JOIN naive n ON n.k = h.k AND n.t = h.t
  WHERE h.rk >= 8)
SELECT k AS event_type,
       CAST(count(*) AS BIGINT) AS n_eval,
       round(avg(e_model), 6) AS mae_model,
       round(avg(e_naive), 6) AS mae_naive,
       round(sum(e_model) / sum(e_naive), 6) AS mase,
       sum(e_model) < sum(e_naive) AS beats_naive
FROM j GROUP BY 1
"""


def q_events_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval (the large-scale bootstrap:
    per-replica weights drawn as Poisson(1), so each replica is one
    weighted aggregation and the corpus is scanned ONCE for all B
    replicas — no per-replica resampling pass) for the A/B uplift in
    mean per-user purchase revenue.  Weights are the inverse-CDF of
    Poisson(1) at u = portable-hash/2^48 per (user, replica), so the
    oracle replays every draw exactly; B = 100 replicas explode from a
    sequence, the uplift distribution is 100 rows, and the CI is its
    exact [2.5, 97.5] percentile band.  Output: point uplift, CI bounds,
    and the replica-distribution spread."""
    from mcpvectordb_spark.operators.dedup import hexint48
    from mcpvectordb_spark.operators.stats import ab_assign, poisson1_weight

    n_reps = 100
    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("rev"))
        .select(
            "user_id", "rev", ab_assign(F.col("user_id")).alias("variant")
        )
    )
    point = users.groupBy().agg(
        (
            F.avg(F.when(F.col("variant") == 1, F.col("rev")))
            - F.avg(F.when(F.col("variant") == 0, F.col("rev")))
        ).alias("uplift")
    )
    u = hexint48(
        F.concat(F.lit("boot:"), F.col("user_id").cast("string"), F.lit(":"), F.col("rep").cast("string"))
    ) / F.lit(281474976710656.0)
    w = poisson1_weight(u)
    reps = (
        users.select(
            "user_id", "rev", "variant",
            F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("rep"),
        )
        .withColumn("w", w)
        .groupBy("rep")
        .agg(
            (
                F.sum(F.when(F.col("variant") == 1, F.col("w") * F.col("rev")).otherwise(0.0))
                / F.sum(F.when(F.col("variant") == 1, F.col("w")).otherwise(0.0))
                - F.sum(F.when(F.col("variant") == 0, F.col("w") * F.col("rev")).otherwise(0.0))
                / F.sum(F.when(F.col("variant") == 0, F.col("w")).otherwise(0.0))
            ).alias("uplift_r")
        )
    )
    ci = reps.agg(
        F.percentile("uplift_r", F.lit(0.025)).alias("lo"),
        F.percentile("uplift_r", F.lit(0.975)).alias("hi"),
        F.stddev_pop("uplift_r").alias("spread"),
        F.count(F.lit(1)).cast("long").alias("n_reps"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        F.round("uplift", 6).alias("uplift"),
        F.round("lo", 6).alias("ci_lo"),
        F.round("hi", 6).alias("ci_hi"),
        F.round("spread", 6).alias("spread"),
        "n_reps",
    )


SQL_EVENTS_BOOTSTRAP = f"""
WITH users AS (
  SELECT user_id, sum(value) AS rev,
         ({_sql_hex48("'ab:' || CAST(user_id AS VARCHAR)")}) % 2 AS variant
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
point AS (
  SELECT avg(CASE WHEN variant = 1 THEN rev END)
           - avg(CASE WHEN variant = 0 THEN rev END) AS uplift
  FROM users),
reps AS (
  SELECT u.user_id, u.rev, u.variant, gs.rep,
         ({_sql_hex48("'boot:' || CAST(u.user_id AS VARCHAR) || ':' || CAST(gs.rep AS VARCHAR)")})
           / 281474976710656.0 AS uu
  FROM users u, (SELECT unnest(range(0, 100)) AS rep) gs),
weighted AS (
  SELECT rep, variant, rev,
         CASE WHEN uu < 0.36787944117144233 THEN 0
              WHEN uu < 0.7357588823428846 THEN 1
              WHEN uu < 0.9196986029286058 THEN 2
              WHEN uu < 0.9810118431238462 THEN 3
              WHEN uu < 0.9963401531726563 THEN 4
              ELSE 5 END AS w
  FROM reps),
per_rep AS (
  SELECT rep,
         sum(CASE WHEN variant = 1 THEN w * rev ELSE 0.0 END)
           / sum(CASE WHEN variant = 1 THEN w ELSE 0.0 END)
           - sum(CASE WHEN variant = 0 THEN w * rev ELSE 0.0 END)
           / sum(CASE WHEN variant = 0 THEN w ELSE 0.0 END) AS uplift_r
  FROM weighted GROUP BY rep),
ci AS (
  SELECT quantile_cont(uplift_r, 0.025) AS lo,
         quantile_cont(uplift_r, 0.975) AS hi,
         stddev_pop(uplift_r) AS spread,
         CAST(count(*) AS BIGINT) AS n_reps
  FROM per_rep)
SELECT round(p.uplift, 6) AS uplift, round(c.lo, 6) AS ci_lo,
       round(c.hi, 6) AS ci_hi, round(c.spread, 6) AS spread, c.n_reps
FROM point p, ci c
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval training (the DPR / contrastive
    fine-tuning recipe: negatives that the CURRENT ranker scores highly
    but that are not relevant are worth far more than random negatives):
    top-10 BM25 per eval query, relevance judged as all-terms-containment
    (the search_eval judge), the top-3 non-relevant survivors per query
    emitted as (query, doc, neg_rank).  One posting build feeds scorer
    and judge; at 100 TB negatives mine per query-shard with the same
    broadcast (qid, term) table.  The oracle replays scoring, judging
    and the negative re-ranking."""
    from mcpvectordb_spark.operators.bm25 import (
        Bm25Index, bm25_multi_topk, doc_lens, doc_terms,
    )

    docs = load_table(spark, sf_dir, "documents")
    posting = doc_terms(docs, "doc_id", "text").localCheckpoint(eager=False)
    idx = Bm25Index(posting, doc_lens(docs, "doc_id", "text"), cached=False)
    ranked = bm25_multi_topk(docs, _EVAL_QUERIES, 10, "doc_id", "text", index=idx)
    rows = []
    for qid, q in sorted(_EVAL_QUERIES.items()):
        for t in sorted({t for t in q.lower().split() if t}):
            rows.append((qid, t))
    qterms = spark.createDataFrame(rows, "qid int, term string")
    nt = qterms.groupBy("qid").agg(F.count(F.lit(1)).alias("nt"))
    m = (
        posting.join(F.broadcast(qterms), "term")
        .groupBy("qid", "doc")
        .agg(F.countDistinct("term").alias("mm"))
    )
    rel = m.join(F.broadcast(nt), "qid").filter(F.col("mm") == F.col("nt")).select(
        "qid", "doc"
    )
    negs = ranked.join(rel, ["qid", "doc"], "left_anti").withColumn(
        "neg_rank",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc").asc())
        ),
    ).filter(F.col("neg_rank") <= 3)
    return negs.join(m, ["qid", "doc"], "left").select(
        "qid",
        "doc",
        F.col("rank").cast("long").alias("rank"),
        F.col("neg_rank").cast("long").alias("neg_rank"),
        F.round("score", 6).alias("score"),
        F.coalesce(F.col("mm"), F.lit(0)).cast("long").alias("n_matched"),
    )


def _sql_hard_negatives() -> str:
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in sorted(_EVAL_QUERIES.items())
        for t in sorted({t for t in q.lower().split() if t})
    )
    return rf"""
WITH toks AS (
  SELECT doc_id AS doc, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS term
  FROM documents),
posting AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY 1, 2),
lens AS (
  SELECT doc_id AS doc,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS BIGINT) AS dl
  FROM documents),
dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT avg(dl) FROM lens) AS avgdl),
qterms AS (SELECT * FROM (VALUES {qvals}) AS t(qid, term)),
bm AS (
  SELECT qid, doc, sum( ln(1 + (n - df + 0.5)/(df + 0.5))
                        * tf*(1.2+1)/(tf + 1.2*(1-0.75+0.75*dl/avgdl)) ) AS score
  FROM posting JOIN qterms USING(term) JOIN dfreq USING(term) JOIN lens USING(doc), stats
  GROUP BY qid, doc),
ranked AS (
  SELECT qid, doc, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc) AS rank
  FROM bm QUALIFY rank <= 10),
nt AS (SELECT qid, count(*) AS n_terms FROM qterms GROUP BY qid),
m AS (SELECT qid, doc, count(DISTINCT term) AS mm FROM posting JOIN qterms USING(term) GROUP BY 1, 2),
rel AS (SELECT m.qid, m.doc FROM m JOIN nt USING(qid) WHERE m.mm = nt.n_terms),
negs AS (
  SELECT r.qid, r.doc, r.rank, r.score,
         row_number() OVER (PARTITION BY r.qid ORDER BY r.score DESC, r.doc ASC) AS neg_rank
  FROM ranked r LEFT JOIN rel ON r.qid = rel.qid AND r.doc = rel.doc
  WHERE rel.doc IS NULL
  QUALIFY neg_rank <= 3)
SELECT n.qid, n.doc, CAST(n.rank AS BIGINT) AS rank,
       CAST(n.neg_rank AS BIGINT) AS neg_rank, round(n.score, 6) AS score,
       CAST(coalesce(m.mm, 0) AS BIGINT) AS n_matched
FROM negs n LEFT JOIN m ON n.qid = m.qid AND n.doc = m.doc
"""


SQL_HARD_NEGATIVES = _sql_hard_negatives()


def q_events_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index — the standard ML-monitoring drift
    score — of the per-type event-value distribution between the first
    and second half of the stream: reference deciles from the exact
    first-half percentiles, PSI = Σ (p_i − q_i)·ln(p_i/q_i) with the
    usual 1e-6 floor on empty cells.  Two keyed aggregations (decile
    edges, then binned counts via one broadcast range join); at 100 TB
    the exact percentiles swap for the mergeable histogram sketch, as
    with MAD/WOE.  Output per type: PSI and the drifted-cell count
    (|p−q| contribution > 0.01)."""
    ev = load_table(spark, sf_dir, "events")
    mid = ev.agg(
        F.timestamp_seconds(
            ((F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2).cast("long")
        ).alias("m")
    )
    lab = ev.crossJoin(F.broadcast(mid)).select(
        "event_type", "value", (F.col("ts") >= F.col("m")).cast("int").alias("half")
    )
    edges = (
        lab.filter(F.col("half") == 0)
        .groupBy(F.col("event_type").alias("et"))
        .agg(*[
            F.percentile("value", F.lit(i / 10.0)).alias(f"e{i}") for i in range(1, 10)
        ])
    )
    binned = lab.join(F.broadcast(edges), F.col("event_type") == F.col("et")).select(
        "event_type", "half",
        sum(
            (F.col("value") >= F.col(f"e{i}")).cast("int") for i in range(1, 10)
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("nb"),
    )
    tot = counts.groupBy(F.col("event_type").alias("et2")).agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    pq = counts.join(F.broadcast(tot), F.col("event_type") == F.col("et2")).select(
        "event_type",
        F.greatest(F.col("na") / F.col("ta"), F.lit(1e-6)).alias("p"),
        F.greatest(F.col("nb") / F.col("tb"), F.lit(1e-6)).alias("q"),
    )
    contrib = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    return (
        pq.groupBy("event_type")
        .agg(
            F.round(F.sum(contrib), 6).alias("psi"),
            F.sum((contrib > 0.01).cast("int")).cast("long").alias("n_drifted_bins"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_PSI = """
WITH mid AS (
  SELECT to_timestamp(CAST((epoch(min(ts)) + epoch(max(ts))) / 2 AS BIGINT)) AS m
  FROM events),
lab AS (
  SELECT event_type, value, CAST(ts >= m AS INT) AS half FROM events, mid),
edges AS (
  SELECT event_type AS et,
         quantile_cont(value, 0.1) AS e1, quantile_cont(value, 0.2) AS e2,
         quantile_cont(value, 0.3) AS e3, quantile_cont(value, 0.4) AS e4,
         quantile_cont(value, 0.5) AS e5, quantile_cont(value, 0.6) AS e6,
         quantile_cont(value, 0.7) AS e7, quantile_cont(value, 0.8) AS e8,
         quantile_cont(value, 0.9) AS e9
  FROM lab WHERE half = 0 GROUP BY 1),
binned AS (
  SELECT event_type, half,
         CAST(value >= e1 AS INT) + CAST(value >= e2 AS INT) + CAST(value >= e3 AS INT)
         + CAST(value >= e4 AS INT) + CAST(value >= e5 AS INT) + CAST(value >= e6 AS INT)
         + CAST(value >= e7 AS INT) + CAST(value >= e8 AS INT) + CAST(value >= e9 AS INT) AS bin
  FROM lab JOIN edges ON event_type = et),
counts AS (
  SELECT event_type, bin,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM binned GROUP BY 1, 2),
tot AS (
  SELECT event_type AS et2, CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
  FROM counts GROUP BY 1),
pq AS (
  SELECT event_type,
         greatest(CAST(na AS DOUBLE) / ta, 1e-6) AS p,
         greatest(CAST(nb AS DOUBLE) / tb, 1e-6) AS q
  FROM counts JOIN tot ON event_type = et2)
SELECT event_type,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       CAST(sum(CASE WHEN (p - q) * ln(p / q) > 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_drifted_bins
FROM pq GROUP BY event_type ORDER BY event_type
"""


def q_parts_graph_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row graph-health summary of the co-purchase graph — the
    numbers a graph-platform team tracks nightly: Newman modularity of
    the LP-4 communities (graph.py::modularity — exact Q for any
    labeling), degree assortativity (Pearson r over endpoint degrees,
    both edge directions), and transitivity 3·triangles/wedges off the
    degree-ordered exact census (graph.py::triangle_count).  Every
    scalar is a 1-row broadcast crossJoin; the edge list is mined once.
    The oracle unrolls the LP rounds and replays all three metrics."""
    from mcpvectordb_spark.operators.graph import (
        label_propagation, modularity, triangle_count,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .localCheckpoint(eager=False)
    )
    labels = label_propagation(edges, rounds=4)
    tri = triangle_count(edges)
    mod = modularity(edges, labels)
    und = edges.select(F.col("src").alias("s"), F.col("dst").alias("t")).unionByName(
        edges.select(F.col("dst").alias("s"), F.col("src").alias("t"))
    )
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    asst = (
        und.join(deg.select(F.col("v").alias("s"), F.col("d").alias("ds")), "s")
        .join(deg.select(F.col("v").alias("t"), F.col("d").alias("dt")), "t")
        .agg(F.corr(F.col("ds").cast("double"), F.col("dt").cast("double")).alias("r"))
    )
    return (
        tri.crossJoin(F.broadcast(mod))
        .crossJoin(F.broadcast(asst))
        .select(
            "n_nodes", "n_edges", "n_communities",
            F.round("modularity", 6).alias("modularity"),
            F.round("r", 6).alias("assortativity"),
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("transitivity"),
        )
    )


def _sql_parts_graph_metrics() -> str:
    rounds = "".join(
        f""",
c{i} AS (
  SELECT e.t AS v, prev.lbl, count(*) AS c,
         row_number() OVER (PARTITION BY e.t ORDER BY count(*) DESC, prev.lbl ASC) AS rn
  FROM e JOIN l{i - 1} prev ON prev.v = e.s
  GROUP BY e.t, prev.lbl),
l{i} AS (SELECT v, lbl FROM c{i} WHERE rn = 1)"""
        for i in range(1, 5)
    )
    return f"""
WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
raw AS (
  SELECT a.p AS src, b.p AS dst
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2),
e AS (SELECT src AS s, dst AS t FROM raw UNION SELECT dst AS s, src AS t FROM raw),
l0 AS (SELECT DISTINCT s AS v, s AS lbl FROM e){rounds},
deg AS (SELECT s AS v, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
m AS (SELECT CAST(count(*) AS DOUBLE) AS m, CAST(count(*) AS BIGINT) AS n_edges FROM raw),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
dl AS (SELECT l.lbl, CAST(sum(d.d) AS BIGINT) AS d_c FROM l4 l JOIN deg d ON l.v = d.v GROUP BY 1),
lc AS (
  SELECT x.lbl, CAST(count(*) AS BIGINT) AS l_c
  FROM raw r JOIN l4 x ON x.v = r.src JOIN l4 y ON y.v = r.dst
  WHERE x.lbl = y.lbl GROUP BY 1),
q AS (
  SELECT CAST(count(*) AS BIGINT) AS n_communities,
         sum(coalesce(lc.l_c, 0) / m.m - (dl.d_c / (2.0 * m.m)) ^ 2) AS modularity
  FROM dl LEFT JOIN lc ON dl.lbl = lc.lbl, m),
asst AS (
  SELECT corr(CAST(d1.d AS DOUBLE), CAST(d2.d AS DOUBLE)) AS r
  FROM e JOIN deg d1 ON e.s = d1.v JOIN deg d2 ON e.t = d2.v),
wed AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM raw e1 JOIN raw e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN raw e3 ON e3.src = e1.dst AND e3.dst = e2.dst)
SELECT nn.n_nodes, m.n_edges, q.n_communities,
       round(q.modularity, 6) AS modularity,
       round(asst.r, 6) AS assortativity,
       round(3.0 * tri.n_triangles / wed.n_wedges, 6) AS transitivity
FROM nn, m, q, asst, wed, tri
"""


SQL_PARTS_GRAPH_METRICS = _sql_parts_graph_metrics()


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor — the vector-side companion of
    events_psi: per label, the centroid of the even-vec_id cohort vs the
    odd cohort (a deterministic stand-in for before/after a model or
    corpus change), reported as centroid cosine, L2 shift, and cohort
    sizes.  Centroids compute as ONE keyed aggregation over
    (label, half, dim) — posexplode fans each vector into 64 rows
    map-side, the shuffle carries |labels|·2·64 partial means, never
    vectors; at 100 TB this is the cheapest possible full-corpus pass
    (and a drifting label with cosine < 0.99 is what triggers reindex /
    retrain).  The oracle replays the fan-out with unnest WITH
    ORDINALITY."""
    e = load_table(spark, sf_dir, "embeddings")
    pe = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    means = pe.groupBy("label", "half", "pos").agg(
        F.avg("x").alias("m"), F.count(F.lit(1)).alias("n")
    )
    j = (
        means.filter(F.col("half") == 0)
        .select("label", "pos", F.col("m").alias("ma"), F.col("n").alias("n_a"))
        .join(
            means.filter(F.col("half") == 1).select(
                "label", "pos", F.col("m").alias("mb"), F.col("n").alias("n_b")
            ),
            ["label", "pos"],
        )
    )
    return (
        j.groupBy("label")
        .agg(
            F.first("n_a").cast("long").alias("n_a"),
            F.first("n_b").cast("long").alias("n_b"),
            F.sum(F.col("ma") * F.col("mb")).alias("dot"),
            F.sqrt(F.sum(F.col("ma") * F.col("ma"))).alias("na"),
            F.sqrt(F.sum(F.col("mb") * F.col("mb"))).alias("nb"),
            F.sqrt(F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")))).alias("shift"),
        )
        .select(
            "label", "n_a", "n_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("centroid_cosine"),
            F.round("shift", 6).alias("centroid_shift"),
        )
        .orderBy("label")
    )


SQL_EMBEDDING_DRIFT = """
WITH dims AS (
  SELECT unnest(range(1, (SELECT max(len(embedding)) FROM embeddings) + 1)) AS pos),
pe AS (
  SELECT label, vec_id % 2 AS half, d.pos,
         CAST(embedding[d.pos] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN dims d
  WHERE d.pos <= len(embedding)),
means AS (
  SELECT label, half, pos, avg(x) AS m, CAST(count(*) AS BIGINT) AS n
  FROM pe GROUP BY 1, 2, 3),
j AS (
  SELECT a.label, a.pos, a.m AS ma, a.n AS n_a, b.m AS mb, b.n AS n_b
  FROM means a JOIN means b ON a.label = b.label AND a.pos = b.pos
  WHERE a.half = 0 AND b.half = 1)
SELECT label, CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
       round(sum(ma * mb) / (sqrt(sum(ma * ma)) * sqrt(sum(mb * mb))), 6) AS centroid_cosine,
       round(sqrt(sum((ma - mb) ^ 2)), 6) AS centroid_shift
FROM j GROUP BY label ORDER BY label
"""


def q_customers_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    2007) of the customer table under the quasi-identifier (nation,
    account-balance century bucket) with the market segment as the
    sensitive attribute: one keyed aggregation produces
    every equivalence class's size and distinct-sensitive count; the
    summary row reports k (the minimum class size — re-identification
    risk is 1/k), the count of classes violating k>=5, and min
    l-diversity.  The governance gate a training-data release runs
    before shipping user-derived tables; at 100 TB it is one groupBy —
    the same shape as list_libraries.  Output: one row."""
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("bal_bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        F.countDistinct("c_mktsegment").cast("long").alias("l_div"),
    )
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("class_size").alias("k_anonymity"),
        F.sum((F.col("class_size") < 5).cast("int")).cast("long").alias("n_violations_k5"),
        F.min("l_div").alias("l_diversity"),
        F.round(F.avg("class_size"), 6).alias("avg_class_size"),
    )


def q_feature_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Univariate feature screening (operators/modeleval.py::feature_auc):
    midrank ROC-AUC of the four RAW lr_quality features against the
    is-English label — the filter-method ranking run before training.
    Features are engine-exact (a length and three integer-ratio
    divisions; AUC is monotone-invariant so the ln/z-standardization of
    the trainer is deliberately skipped), quantized to the 1e-6 grid, and
    ranked by a window PARTITIONED BY feature over value blocks."""
    from mcpvectordb_spark.operators.modeleval import feature_auc

    docs = load_table(spark, sf_dir, "documents")
    t = dd.normalize_text(F.col("text"))
    words = F.split(t, " ")
    nt = F.greatest(F.length(t), F.lit(1)).cast("double")
    nw = F.greatest(F.size(words), F.lit(1)).cast("double")
    feats = [
        ("chars_per_word", F.length(t) / nw),
        ("distinct_ratio", F.size(F.array_distinct(words)) / nw),
        ("n_chars", F.length(t).cast("double")),
        ("vowel_ratio", F.length(F.regexp_replace(t, "[^aeiou]", "")) / nt),
    ]
    out = feature_auc(docs.withColumn("y", F.col("lang") == "en"), feats, "y")
    return out.select("feature", "n", "n_pos", F.round("auc", 6).alias("auc"))


SQL_FEATURE_AUC = f"""
WITH raw AS (
  SELECT CAST(lang = 'en' AS DOUBLE) AS y, {_sql_norm('text')} AS t, {_sql_words('text')} AS w
  FROM documents),
vals AS (
  SELECT y, 'chars_per_word' AS feature,
         CAST(len(t) AS DOUBLE) / greatest(len(w), 1) AS v FROM raw
  UNION ALL
  SELECT y, 'distinct_ratio',
         CAST(len(list_distinct(w)) AS DOUBLE) / greatest(len(w), 1) FROM raw
  UNION ALL
  SELECT y, 'n_chars', CAST(len(t) AS DOUBLE) FROM raw
  UNION ALL
  SELECT y, 'vowel_ratio',
         CAST(len(regexp_replace(t, '[^aeiou]', '', 'g')) AS DOUBLE) / greatest(len(t), 1) FROM raw),
blocks AS (
  SELECT feature, CAST(round(v * 1000000) AS BIGINT) AS vq,
         CAST(count(*) AS BIGINT) AS cnt, sum(y) AS pos
  FROM vals GROUP BY 1, 2),
ranked AS (
  SELECT feature, cnt, pos,
         sum(cnt) OVER (PARTITION BY feature ORDER BY vq) AS cum
  FROM blocks),
per AS (
  SELECT feature, sum(cnt) AS n, sum(pos) AS n_pos,
         sum(pos * (cum - cnt + (CAST(cnt AS DOUBLE) + 1) / 2)) AS r_pos
  FROM ranked GROUP BY 1)
SELECT feature, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       round(CASE WHEN n_pos * (n - n_pos) > 0
                  THEN (r_pos - n_pos * (n_pos + 1.0) / 2) / (n_pos * (n - n_pos)) END, 6) AS auc
FROM per
"""


def q_lr_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall evaluation (operators/modeleval.py::pr_curve) of
    the lr_quality model: tie-aware average precision + the 11-point
    interpolated PR curve (TREC style).  Probabilities ride the same
    1e-6 quantized blocks as lr_eval; the 11 recall levels are
    CAST(i AS DOUBLE)/10 in both engines so the >= joins see identical
    doubles.  The oracle replays the GD chain + the block cumulative
    scan + the same inequality join."""
    from mcpvectordb_spark.operators.modeleval import pr_curve

    scored, _ = _lr_scored(spark, sf_dir)
    out = pr_curve(scored, "y", "p", levels=11)
    return out.select(
        F.round("recall_level", 1).alias("recall_level"),
        F.round("interp_prec", 6).alias("interp_prec"),
        F.round("ap", 6).alias("ap"),
    )


SQL_LR_PR_CURVE = (
    _sql_lr_blocks()
    + """,
cum AS (
  SELECT pq, cnt, pos,
         sum(cnt) OVER (ORDER BY pq DESC) AS cum_n,
         sum(pos) OVER (ORDER BY pq DESC) AS cum_pos
  FROM blocks),
pstats AS (
  SELECT sum(pos) AS n_pos,
         sum(pos * cum_pos / cum_n) AS ap_num
  FROM cum),
levels AS (
  SELECT CAST(unnest(range(0, 11)) AS DOUBLE) / 10 AS recall_level)
SELECT round(l.recall_level, 1) AS recall_level,
       round(max(c.cum_pos / CAST(c.cum_n AS DOUBLE)), 6) AS interp_prec,
       round(min(s.ap_num / s.n_pos), 6) AS ap
FROM levels l, cum c, pstats s
WHERE c.cum_pos / s.n_pos >= l.recall_level
GROUP BY 1
"""
)


def q_events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (operators/analytics.py::
    markov_removal_attribution): per-user journeys up to first purchase
    feed a (src, dst) transition matrix; each channel's removal chain
    maps its inbound transitions to '(null)', and 6 matrix SQUARINGS give
    the exact 64-step absorption probability for all chains in one keyed
    plan (log-depth, localCheckpointed — never 64 chained iterations).
    The oracle replays journeys, the removal mapping and all 6 squarings."""
    from mcpvectordb_spark.operators.analytics import markov_removal_attribution

    ev = load_table(spark, sf_dir, "events")
    out = markov_removal_attribution(ev, conv_value="purchase")
    return out.select(
        "channel",
        F.round("p_conv_full", 6).alias("p_conv_full"),
        F.round("p_conv_removed", 6).alias("p_conv_removed"),
        F.round("removal_effect", 6).alias("removal_effect"),
        F.round("attribution", 6).alias("attribution"),
    )


def _sql_markov_attr(squarings: int = 6) -> str:
    ctes = [
        """ordered AS (
  SELECT user_id AS u, event_type AS t,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events)""",
        """fp AS (
  SELECT u, min(CASE WHEN t = 'purchase' THEN rn END) AS fp
  FROM ordered GROUP BY 1)""",
        """j AS (
  SELECT o.u, o.t, o.rn, f.fp FROM ordered o JOIN fp f USING (u)
  WHERE f.fp IS NULL OR o.rn < f.fp)""",
        """t1 AS (
  SELECT t AS src,
         COALESCE(lead(t) OVER (PARTITION BY u ORDER BY rn),
                  CASE WHEN fp IS NOT NULL THEN '(conv)' ELSE '(null)' END) AS dst
  FROM j)""",
        """firsts AS (
  SELECT u, t AS ft FROM (
    SELECT u, t, row_number() OVER (PARTITION BY u ORDER BY rn) AS rn2 FROM j)
  WHERE rn2 = 1)""",
        """starts AS (
  SELECT '(start)' AS src,
         COALESCE(fi.ft, CASE WHEN f.fp IS NOT NULL THEN '(conv)' ELSE '(null)' END) AS dst
  FROM fp f LEFT JOIN firsts fi USING (u))""",
        """cnt AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT src, dst FROM t1 UNION ALL SELECT src, dst FROM starts)
  GROUP BY 1, 2)""",
        """tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS tt FROM cnt GROUP BY 1)""",
        """base AS (
  SELECT cnt.src, cnt.dst, CAST(c AS DOUBLE) / tt AS p FROM cnt JOIN tot USING (src))""",
        """channels AS (SELECT DISTINCT t AS rm FROM j)""",
        """rms AS (SELECT rm FROM channels UNION ALL SELECT '(none)')""",
        """m0 AS (
  SELECT rm, src, dst, sum(p) AS p FROM (
    SELECT r.rm, b.src,
           CASE WHEN b.dst = r.rm THEN '(null)' ELSE b.dst END AS dst, b.p
    FROM rms r CROSS JOIN base b WHERE b.src <> r.rm)
  GROUP BY 1, 2, 3
  UNION ALL
  SELECT rm, s, s, CAST(1.0 AS DOUBLE)
  FROM rms CROSS JOIN (SELECT unnest(['(conv)', '(null)']) AS s))""",
    ]
    for i in range(1, squarings + 1):
        ctes.append(
            f"""m{i} AS (
  SELECT a.rm, a.src, b.dst, sum(a.p * b.p) AS p
  FROM m{i - 1} a JOIN m{i - 1} b ON a.rm = b.rm AND a.dst = b.src
  GROUP BY 1, 2, 3)"""
        )
    ctes.append(
        f"""conv AS (
  SELECT rm, p AS p_conv FROM m{squarings} WHERE src = '(start)' AND dst = '(conv)')"""
    )
    ctes.append(
        """fullc AS (
  SELECT COALESCE(sum(p_conv), CAST(0.0 AS DOUBLE)) AS p_conv_full
  FROM conv WHERE rm = '(none)')"""
    )
    ctes.append(
        """eff AS (
  SELECT ch.rm AS channel, p_conv_full,
         COALESCE(c.p_conv, CAST(0.0 AS DOUBLE)) AS p_conv_removed,
         CASE WHEN p_conv_full > 0
              THEN 1.0 - COALESCE(c.p_conv, CAST(0.0 AS DOUBLE)) / p_conv_full END AS removal_effect
  FROM channels ch LEFT JOIN conv c ON c.rm = ch.rm CROSS JOIN fullc)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT channel,
       round(p_conv_full, 6) AS p_conv_full,
       round(p_conv_removed, 6) AS p_conv_removed,
       round(removal_effect, 6) AS removal_effect,
       round(CASE WHEN sum(removal_effect) OVER () > 0
                  THEN removal_effect / sum(removal_effect) OVER () END, 6) AS attribution
FROM eff
"""
    )


SQL_EVENTS_ATTRIBUTION_MARKOV = _sql_markov_attr()


SQL_CUSTOMERS_KANON = """
WITH classes AS (
  SELECT c_nationkey, CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_div
  FROM customer GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       min(class_size) AS k_anonymity,
       CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations_k5,
       min(l_div) AS l_diversity,
       round(avg(class_size), 6) AS avg_class_size
FROM classes
"""


# ===========================================================================
# registry
# ===========================================================================

# Registry order matters: the driver's CORRECTNESS gate checks only the
# FIRST 50 entries.  Contract for every round: (a) queries with no prior
# driver row, red rows, and queries new this round go FIRST; (b) greens most
# at risk from this round's code churn fill the window; (c) stable greens
# (already driver-verified in an earlier round) rotate to the tail, where
# tools/check_parity.py still covers them locally.
#
# The ordering is MECHANICAL (round-3 verdict item 2): ``_rotate_stalest_
# first`` below re-sorts this dict at import time by each query's most
# recent CORRECTNESS_r*.json row, never-driver-checked first, ties broken
# by the hand-written order here.  Hand placement is only a tiebreak;
# the rotation-policy test (tests/test_entry.py) can no longer go stale
# between rounds.
QUERIES = {
    # -- round-4 additions (the mechanical rotation puts never-checked
    # -- queries first regardless of position here) --
    "lr_eval": q_lr_eval,
    "lr_reliability": q_lr_reliability,
    "events_attribution_markov": q_events_attribution_markov,
    "feature_auc": q_feature_auc,
    "lr_pr_curve": q_lr_pr_curve,
    "parts_linkpred": q_parts_linkpred,
    "events_holt": q_events_holt,
    "events_changepoint": q_events_changepoint,
    "events_acf": q_events_acf,
    "parts_ols": q_parts_ols,
    "events_xcorr": q_events_xcorr,
    "events_catassoc": q_events_catassoc,
    "customers_gini": q_customers_gini,
    "phrase_search": q_phrase_search,
    "lr_isotonic": q_lr_isotonic,
    "supplier_bt": q_supplier_bt,
    "events_hw": q_events_hw,
    "events_pacf": q_events_pacf,
    "near_search": q_near_search,
    "parts_conformal": q_parts_conformal,
    "vocab_zipf": q_vocab_zipf,
    "orders_fd": q_orders_fd,
    "events_quantile_norm": q_events_quantile_norm,
    "mix_raking": q_mix_raking,
    "events_dispersion": q_events_dispersion,
    "events_sprt": q_events_sprt,
    "events_ddsketch": q_events_ddsketch,
    "search_clarity": q_search_clarity,
    "search_rbo": q_search_rbo,
    "embedding_isotropy": q_embedding_isotropy,
    "events_mase": q_events_mase,
    "events_attribution_ushaped": q_events_attribution_ushaped,
    "events_periodogram": q_events_periodogram,
    "events_ks": q_events_ks,
    "customers_eb_rates": q_customers_eb_rates,
    "events_entropy_rate": q_events_entropy_rate,
    "vocab_burstiness": q_vocab_burstiness,
    "events_did": q_events_did,
    "minhash_calibration": q_minhash_calibration,
    "lineitem_spearman": q_lineitem_spearman,
    "events_logrank": q_events_logrank,
    "events_coxph": q_events_coxph,
    "events_interarrival": q_events_interarrival,
    "hard_negatives": q_hard_negatives,
    "events_psi": q_events_psi,
    "parts_graph_metrics": q_parts_graph_metrics,
    "embedding_drift": q_embedding_drift,
    "customers_kanon": q_customers_kanon,
    "events_bootstrap": q_events_bootstrap,
    "events_mannwhitney": q_events_mannwhitney,
    "orders_kmv": q_orders_kmv,
    "events_stl": q_events_stl,
    "events_gapfill": q_events_gapfill,
    "customers_scd2": q_customers_scd2,
    "winnowing_fp": q_winnowing,
    "events_attribution": q_events_attribution,
    "copurchase_triangles": q_copurchase_triangles,
    "lr_quality": q_lr_quality,
    "w2v_search": q_w2v_search,
    "audio_fingerprint": q_audio_fingerprint,
    "events_ab_test": q_events_ab_test,
    "events_mad_outliers": q_events_mad_outliers,
    "woe_binning": q_woe_binning,
    "target_encoding": q_target_encoding,
    "pii_luhn": q_pii_luhn,
    "entity_match": q_entity_match,
    "mixture_temperature": q_mixture_temperature,
    "stream_attribution": q_stream_attribution,
    "dq_audit": q_dq_audit,
    "events_cusum": q_events_cusum,
    "orders_benford": q_orders_benford,
    "events_seqmine": q_events_seqmine,
    "lineitem_corr": q_lineitem_corr,
    "rag_context": q_rag_context,
    "search_eval": q_search_eval,
    # -- new round-3 queries go here (never driver-checked) --
    "knn_pq_topk": q_knn_pq_topk,
    "knn_pq_refined": q_knn_pq_refined,
    "text_ngram_lm": q_text_ngram_lm,
    "knn_ivfpq_topk": q_knn_ivfpq_topk,
    "events_cms": q_events_cms,
    "orders_bloom_join": q_orders_bloom_join,
    "dedup_span_removal": q_dedup_span_removal,
    "knn_pca": q_knn_pca,
    "multimodal_image_neardup": q_multimodal_image_neardup,
    "multimodal_video_framedup": q_multimodal_video_framedup,
    "events_paths": q_events_paths,
    "dsir_select": q_dsir_select,
    "url_normalize": q_url_normalize,
    "text_compression": q_text_compression,
    "blocklist_filter": q_blocklist_filter,
    "ccnet_buckets": q_ccnet_buckets,
    "web_pipeline": q_web_pipeline,
    "multimodal_exif": q_multimodal_exif,
    "text_encoding": q_text_encoding,
    "embedding_quality": q_embedding_quality,
    "ocr_ingest": q_ocr_ingest,
    "asr_ingest": q_asr_ingest,
    "chat_stats": q_chat_stats,
    "train_split": q_train_split,
    "flac_ingest": q_flac_ingest,
    # -- r01 cohort: the session-4 additions above displaced the last of the
    # -- round-1-verified queries to the tail (never-driver-checked queries
    # -- outrank re-verification for window slots; local check_parity covers
    # -- the whole catalog each session) --
    "bm25_fuzzy": q_bm25_fuzzy,
    "search_highlights": q_search_highlights,
    "dedup_clusters_twostar": q_dedup_clusters_twostar,
    "semdedup": q_semdedup,
    "events_overlap_join": q_events_overlap_join,
    # -- session-3 additions (never driver-checked -> must sit in the window;
    # -- three r01-cohort queries rotate to the tail to make room) --
    "lm_dirichlet": q_lm_dirichlet,
    "rm3_expansion": q_rm3_expansion,
    "tfidf_simjoin": q_tfidf_simjoin,
    "ssjoin_jaccard": q_ssjoin_jaccard,
    "textrank_summary": q_textrank_summary,
    "item_recs": q_item_recs,
    "part_skyline": q_part_skyline,
    "graph_bfs": q_graph_bfs,
    "events_ewma": q_events_ewma,
    "events_markov": q_events_markov,
    "key_skew_report": q_key_skew_report,
    "parts_zorder": q_parts_zorder,
    "parts_hits": q_parts_hits,
    "parts_communities": q_parts_communities,
    "events_theilsen": q_events_theilsen,
    "orders_ivm": q_orders_ivm,
    "events_ewma_recursive": q_events_ewma_recursive,
    "parts_ppr": q_parts_ppr,
    "orders_agg_ivm": q_orders_agg_ivm,
    "parts_kcore": q_parts_kcore,
    "events_winsorize": q_events_winsorize,
    "events_survival": q_events_survival,
    "assoc_rules": q_assoc_rules,
    "parts_pagerank": q_parts_pagerank,
    "rfm_segments": q_rfm_segments,
    "knn_mmr": q_knn_mmr,
    "bpe_encode": q_bpe_encode,
    "orders_cube": q_orders_cube,
    "text_readability": q_text_readability,
    "events_funnel_window": q_events_funnel_window,
    "dedup_keep_canonical": q_dedup_keep_canonical,
    "dedup_containment": q_dedup_containment,
    "events_funnel_latency": q_events_funnel_latency,
    "text_pmi": q_text_pmi,
    # -- new round-3 queries (never driver-checked → must sit in the window;
    # -- orders_pivot/rollup/analytics + events_percentiles rotate to the
    # -- tail to make room, re-verified in a later rotation) --
    "decontaminate_bloom_persisted": q_decontaminate_bloom_persisted,
    "bpe_train": q_bpe_train,
    "nb_lang_classify": q_nb_lang_classify,
    "pack_bins": q_pack_bins,
    "semdedup_refined": q_semdedup_refined,
    "cdc_dedup": q_cdc_dedup,
    "multimodal_image_features": q_multimodal_image_features,
    # -- deterministic, golden-digest gated (round 3): sit at the window edge
    # -- so the first of them gets a driver pass/fail row this round --
    "ingest_chunks": q_ingest_chunks,
    "search_ingested": q_search_ingested,
    "neardup_lsh_embeddings": q_neardup_lsh_embeddings,
    "multimodal_features": q_multimodal_features,
    "warc_ingest": q_warc_ingest,
    # -- streams: rows-only by design (COVERAGE.md) --
    "stream_hourly": q_stream_hourly,
    "stream_holt": q_stream_holt,
    "stream_join": q_stream_join,
    "stream_sessions": q_stream_sessions,
    "stream_dedup": q_stream_dedup,
    # ---------------- tail: stable r01/r02 greens (driver-verified) ------------
    # (tpch_q5/q6 demoted from the window to make room for round-3 additions:
    # plain SQL shapes, driver-green r01 AND parity-verified ×3 scales locally)
    "train_shards": q_train_shards,
    "text_tokens": q_text_tokens,
    "text_quality": q_text_quality,
    "events_hourly": q_events_hourly,
    "events_sessions": q_events_sessions,
    "events_asof_join": q_events_asof_join,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q13": q_tpch_q13,
    "orders_pivot": q_orders_pivot,
    "orders_rollup": q_orders_rollup,
    "orders_analytics": q_orders_analytics,
    "events_percentiles": q_events_percentiles,
    "events_running": q_events_running,
    "events_range_frame": q_events_range_frame,
    "corpus_token_stats": q_corpus_token_stats,
    "events_json": q_events_json,
    "text_fingerprint": q_text_fingerprint,
    "text_langid": q_text_langid,
    **TPCH_EXT_QUERIES,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
    "top_orders_per_priority": q_top_orders_per_priority,
    "pack_sequences": q_pack_sequences,
    "dedup_lines": q_dedup_lines,
    "dedup_spans": q_dedup_spans,
    "events_heavy_hitters": q_events_heavy_hitters,
    "knn_matryoshka": q_knn_matryoshka,
    "events_incremental_rollup": q_events_incremental_rollup,
    "events_quantile_sketch": q_events_quantile_sketch,
    "events_funnel": q_events_funnel,
    "events_cohorts": q_events_cohorts,
    "events_asof_forward": q_events_asof_forward,
    "orders_copurchase": q_orders_copurchase,
    "orders_setops": q_orders_setops,
    "length_curriculum": q_length_curriculum,
    "curation_pipeline_v2": q_curation_pipeline_v2,
    "events_anomalies": q_events_anomalies,
    "ann_recall": q_ann_recall,
    "weighted_sample": q_weighted_sample,
    "hybrid_weighted": q_hybrid_weighted,
    "mixture_sample": q_mixture_sample,
    "text_keywords": q_text_keywords,
    "text_logprob": q_text_logprob,
    "bpe_pairs": q_bpe_pairs,
    "doc_embeddings": q_doc_embeddings,
    "decontaminate_bloom": q_decontaminate_bloom,
    "knn_batch": q_knn_batch,
    "list_libraries": q_list_libraries,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_minhash_sig": q_dedup_minhash_sig,
    "dedup_simhash": q_dedup_simhash,
    "decontaminate": q_decontaminate,
    "curation_pipeline": q_curation_pipeline,
    "domain_quota": q_domain_quota,
    "pii_scrub": q_pii_scrub,
    "sample_stratified": q_sample_stratified,
    "text_repetition": q_text_repetition,
    "events_interval_join": q_events_interval_join,
    "knn_sq8_topk": q_knn_sq8_topk,
    "delete_antijoin": q_delete_antijoin,
    "semi_join_lookup": q_semi_join_lookup,
    "list_documents": q_list_documents,
    "get_document": q_get_document,
    "dedup_exact": q_dedup_exact,
    "ivf_topk": q_ivf_topk,
    "knn_filtered": q_knn_filtered,
    "hybrid_rrf": q_hybrid_rrf,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "bm25_topk": q_bm25_topk,
    "knn_topk": q_knn_topk,
    "events_distinct_rollup": q_events_distinct_rollup,
}


def _rotate_stalest_first(queries: dict) -> dict:
    """Re-sort the registry so the driver's 50-slot CORRECTNESS window always
    holds the stalest queries: never-driver-checked first (round -1), then
    ascending by the most recent round that produced a CORRECTNESS row.
    ``sorted`` is stable, so the hand-written dict order above breaks ties
    within a staleness class.  Reads CORRECTNESS_r*.json from the repo root;
    with no history files (fresh clone) the hand order is returned as-is."""
    import json as _json
    import re as _re
    from pathlib import Path as _Path

    root = _Path(__file__).resolve().parent.parent
    last_round: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        rnum = int(_re.search(r"r(\d+)", path.name).group(1))
        try:
            rows = _json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name in rows:
            last_round[name] = max(last_round.get(name, 0), rnum)
    order = sorted(queries, key=lambda n: last_round.get(n, -1))
    return {n: queries[n] for n in order}


QUERIES = _rotate_stalest_first(QUERIES)

ORACLES = {
    # -- round-4 --
    "parts_linkpred": SQL_PARTS_LINKPRED,
    "events_holt": SQL_EVENTS_HOLT,
    "events_changepoint": SQL_EVENTS_CHANGEPOINT,
    "events_acf": SQL_EVENTS_ACF,
    "parts_ols": SQL_PARTS_OLS,
    "events_xcorr": SQL_EVENTS_XCORR,
    "events_catassoc": SQL_EVENTS_CATASSOC,
    "customers_gini": SQL_CUSTOMERS_GINI,
    "phrase_search": SQL_PHRASE_SEARCH,
    "lr_isotonic": SQL_LR_ISOTONIC,
    "supplier_bt": SQL_SUPPLIER_BT,
    "events_hw": SQL_EVENTS_HW,
    "events_pacf": SQL_EVENTS_PACF,
    "near_search": SQL_NEAR_SEARCH,
    "parts_conformal": SQL_PARTS_CONFORMAL,
    "vocab_zipf": SQL_VOCAB_ZIPF,
    "orders_fd": SQL_ORDERS_FD,
    "events_quantile_norm": SQL_EVENTS_QUANTILE_NORM,
    "mix_raking": SQL_MIX_RAKING,
    "events_dispersion": SQL_EVENTS_DISPERSION,
    "events_sprt": SQL_EVENTS_SPRT,
    "events_ddsketch": SQL_EVENTS_DDSKETCH,
    "search_clarity": SQL_SEARCH_CLARITY,
    "search_rbo": SQL_SEARCH_RBO,
    "embedding_isotropy": SQL_EMBEDDING_ISOTROPY,
    "events_mase": SQL_EVENTS_MASE,
    "events_attribution_ushaped": SQL_EVENTS_ATTRIBUTION_USHAPED,
    "events_periodogram": SQL_EVENTS_PERIODOGRAM,
    "events_ks": SQL_EVENTS_KS,
    "customers_eb_rates": SQL_CUSTOMERS_EB_RATES,
    "events_entropy_rate": SQL_EVENTS_ENTROPY_RATE,
    "vocab_burstiness": SQL_VOCAB_BURSTINESS,
    "events_did": SQL_EVENTS_DID,
    "minhash_calibration": SQL_MINHASH_CALIBRATION,
    "lineitem_spearman": SQL_LINEITEM_SPEARMAN,
    "events_logrank": SQL_EVENTS_LOGRANK,
    "events_coxph": SQL_EVENTS_COXPH,
    "events_interarrival": SQL_EVENTS_INTERARRIVAL,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "events_psi": SQL_EVENTS_PSI,
    "parts_graph_metrics": SQL_PARTS_GRAPH_METRICS,
    "embedding_drift": SQL_EMBEDDING_DRIFT,
    "customers_kanon": SQL_CUSTOMERS_KANON,
    "events_bootstrap": SQL_EVENTS_BOOTSTRAP,
    "events_mannwhitney": SQL_EVENTS_MANNWHITNEY,
    "orders_kmv": SQL_ORDERS_KMV,
    "events_stl": SQL_EVENTS_STL,
    "events_gapfill": SQL_EVENTS_GAPFILL,
    "customers_scd2": SQL_CUSTOMERS_SCD2,
    "winnowing_fp": SQL_WINNOWING,
    "events_attribution": SQL_EVENTS_ATTRIBUTION,
    "copurchase_triangles": SQL_COPURCHASE_TRIANGLES,
    "lr_quality": SQL_LR_QUALITY,
    "lr_eval": SQL_LR_EVAL,
    "lr_reliability": SQL_LR_RELIABILITY,
    "events_attribution_markov": SQL_EVENTS_ATTRIBUTION_MARKOV,
    "feature_auc": SQL_FEATURE_AUC,
    "lr_pr_curve": SQL_LR_PR_CURVE,
    "w2v_search": _sql_digest_gold(10, "3385114c7156bb6d8282a5d5d56e2dfa"),
    "audio_fingerprint": _sql_digest_gold(12, "364eddec6871c8d438c4712018a593e8"),
    "events_ab_test": SQL_EVENTS_AB_TEST,
    "events_mad_outliers": SQL_EVENTS_MAD_OUTLIERS,
    "woe_binning": SQL_WOE_BINNING,
    "target_encoding": SQL_TARGET_ENCODING,
    "pii_luhn": SQL_PII_LUHN,
    "entity_match": SQL_ENTITY_MATCH,
    "mixture_temperature": SQL_MIXTURE_TEMPERATURE,
    # the stream rolls up identically to events_attribution, so the batch
    # oracle applies verbatim — the only stream query with a value gate
    "stream_attribution": SQL_EVENTS_ATTRIBUTION,
    "stream_holt": SQL_STREAM_HOLT,
    "dq_audit": SQL_DQ_AUDIT,
    "events_cusum": SQL_EVENTS_CUSUM,
    "orders_benford": SQL_ORDERS_BENFORD,
    "events_seqmine": SQL_EVENTS_SEQMINE,
    "lineitem_corr": SQL_LINEITEM_CORR,
    "rag_context": SQL_RAG_CONTEXT,
    "search_eval": SQL_SEARCH_EVAL,
    # -- golden-digest gates (deterministic non-SQL queries; constants from
    # -- tools/regen_digests.py at sf0.01 — double-run verified) --
    "knn_pq_refined": _sql_digest_gold(10, "3bbfe9627423b7e0ac2ba9142a8ee08f"),
    "knn_pca": _sql_digest_gold(10, "5e8b0e9fe60785a627b6e260a1f4d266"),
    "multimodal_image_neardup": _sql_digest_gold(92, "d2a7303360acf327f6881a1e36f96fa7"),
    "multimodal_video_framedup": _sql_digest_gold(4, "19d96a8ad5482e70ace954e54c1a5847"),
    "bpe_encode": _sql_digest_gold(500, "9766df65c21bd6124eecd54a3d629b60"),
    "ingest_chunks": _sql_digest_gold(5, "e5e2c8732cadb9460796d38f249b6336"),
    "search_ingested": _sql_digest_gold(10, "8fe65a60b1876bec1897acd65e84ac2a"),
    "neardup_lsh_embeddings": _sql_digest_gold(194, "6f58a0fe80114093f7a418159120bc34"),
    "multimodal_features": _sql_digest_gold(200, "1cefe1a043fec9d1071b428ea152f000"),
    "warc_ingest": _sql_digest_gold(4, "0f4b56356626108a612ccc6b91b59750"),
    "bpe_train": _sql_digest_gold(40, "4a934b5f1cb957f5efe8e38d2602acb7"),
    "pack_bins": _sql_digest_gold(4, "d708144bdfc7337e3fa08090abdf75ec"),
    "semdedup_refined": _sql_digest_gold(40, "aaf749a73d044527cad60508c4bb0127"),
    "cdc_dedup": _sql_digest_gold(1, "7e5555177d39bd68bbd2a70ef07c16bd"),
    "multimodal_image_features": _sql_digest_gold(200, "8568d2c87a49963eeb510ac4f2f56660"),
    "text_compression": _sql_digest_gold(501, "411f2b609cb05003f77646208f17e6b6"),
    "multimodal_exif": _sql_digest_gold(200, "95d0a267865c3abe85ed93f8470cc504"),
    "ocr_ingest": _sql_digest_gold(100, "0f9e9ac25f00e1e0ac5bf22c4953e706"),
    "asr_ingest": _sql_digest_gold(60, "e45a53c521300feef88de17b9aff4f8a"),
    "flac_ingest": _sql_digest_gold(40, "c3eb7ce7fa41187ffcb90b6c39c0ba9b"),
    "knn_topk": SQL_KNN_TOPK,
    "knn_pq_topk": SQL_KNN_PQ_TOPK,
    "knn_ivfpq_topk": SQL_KNN_IVFPQ_TOPK,
    "knn_batch": SQL_KNN_BATCH,
    "knn_filtered": SQL_KNN_FILTERED,
    "ivf_topk": SQL_IVF_TOPK,
    "knn_sq8_topk": SQL_KNN_SQ8_TOPK,
    "knn_matryoshka": SQL_KNN_MATRYOSHKA,
    "bm25_topk": SQL_BM25_TOPK,
    "bm25_fuzzy": SQL_BM25_FUZZY,
    "search_highlights": SQL_SEARCH_HIGHLIGHTS,
    "lm_dirichlet": SQL_LM_DIRICHLET,
    "rm3_expansion": SQL_RM3_EXPANSION,
    "tfidf_simjoin": SQL_TFIDF_SIMJOIN,
    "ssjoin_jaccard": SQL_SSJOIN_JACCARD,
    "textrank_summary": SQL_TEXTRANK_SUMMARY,
    "item_recs": SQL_ITEM_RECS,
    "part_skyline": SQL_PART_SKYLINE,
    "graph_bfs": SQL_GRAPH_BFS,
    "events_ewma": SQL_EVENTS_EWMA,
    "events_markov": SQL_EVENTS_MARKOV,
    "key_skew_report": SQL_KEY_SKEW_REPORT,
    "parts_zorder": SQL_PARTS_ZORDER,
    "parts_hits": SQL_PARTS_HITS,
    "parts_communities": SQL_PARTS_COMMUNITIES,
    "events_theilsen": SQL_EVENTS_THEILSEN,
    "orders_ivm": SQL_ORDERS_IVM,
    "events_ewma_recursive": SQL_EVENTS_EWMA_RECURSIVE,
    "parts_ppr": SQL_PARTS_PPR,
    "orders_agg_ivm": SQL_ORDERS_AGG_IVM,
    "parts_kcore": SQL_PARTS_KCORE,
    "events_winsorize": SQL_EVENTS_WINSORIZE,
    "events_survival": SQL_EVENTS_SURVIVAL,
    "assoc_rules": SQL_ASSOC_RULES,
    "parts_pagerank": SQL_PARTS_PAGERANK,
    "rfm_segments": SQL_RFM_SEGMENTS,
    "knn_mmr": SQL_KNN_MMR,
    "orders_cube": SQL_ORDERS_CUBE,
    "text_readability": SQL_TEXT_READABILITY,
    "events_funnel_window": SQL_EVENTS_FUNNEL_WINDOW,
    "dedup_keep_canonical": SQL_DEDUP_KEEP_CANONICAL,
    "dedup_containment": SQL_DEDUP_CONTAINMENT,
    "events_funnel_latency": SQL_EVENTS_FUNNEL_LATENCY,
    "text_pmi": SQL_TEXT_PMI,
    "hybrid_rrf": SQL_HYBRID_RRF,
    "list_libraries": SQL_LIST_LIBRARIES,
    "list_documents": SQL_LIST_DOCUMENTS,
    "get_document": SQL_GET_DOCUMENT,
    "semi_join_lookup": SQL_SEMI_JOIN_LOOKUP,
    "delete_antijoin": SQL_DELETE_ANTIJOIN,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "dedup_minhash_sig": SQL_DEDUP_MINHASH_SIG,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_clusters_twostar": SQL_DEDUP_CLUSTERS,
    "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING_COSINE,
    "semdedup": SQL_SEMDEDUP,
    "nb_lang_classify": SQL_NB_LANG_CLASSIFY,
    "text_tokens": SQL_TEXT_TOKENS,
    "text_quality": SQL_TEXT_QUALITY,
    "text_langid": SQL_TEXT_LANGID,
    "text_fingerprint": SQL_TEXT_FINGERPRINT,
    "text_keywords": SQL_TEXT_KEYWORDS,
    "text_logprob": SQL_TEXT_LOGPROB,
    "text_ngram_lm": SQL_TEXT_NGRAM_LM,
    "bpe_pairs": SQL_BPE_PAIRS,
    "doc_embeddings": SQL_DOC_EMBEDDINGS,
    "text_repetition": SQL_TEXT_REPETITION,
    "curation_pipeline": _sql_curation(),
    "corpus_token_stats": SQL_CORPUS_TOKEN_STATS,
    "decontaminate": _sql_decontaminate(),
    "decontaminate_bloom": _sql_decontaminate(),
    "decontaminate_bloom_persisted": _sql_decontaminate(),
    "domain_quota": _sql_domain_quota(),
    "sample_stratified": _sql_sample_stratified(),
    "dsir_select": SQL_DSIR_SELECT,
    "url_normalize": SQL_URL_NORMALIZE,
    "blocklist_filter": SQL_BLOCKLIST_FILTER,
    "ccnet_buckets": SQL_CCNET_BUCKETS,
    "chat_stats": SQL_CHAT_STATS,
    "train_split": _sql_train_split(),
    "web_pipeline": _sql_web_pipeline(),
    "text_encoding": SQL_TEXT_ENCODING,
    "embedding_quality": SQL_EMBEDDING_QUALITY,
    "weighted_sample": _sql_weighted_sample(),
    "train_shards": _sql_train_shards(),
    "pack_sequences": _sql_pack_sequences(),
    "pii_scrub": _sql_pii_scrub(),
    "dedup_lines": SQL_DEDUP_LINES,
    "dedup_spans": SQL_DEDUP_SPANS,
    "dedup_span_removal": SQL_DEDUP_SPAN_REMOVAL,
    "mixture_sample": _sql_mixture_sample(),
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "events_json": SQL_EVENTS_JSON,
    "events_asof_join": SQL_EVENTS_ASOF_JOIN,
    "events_asof_forward": SQL_EVENTS_ASOF_FORWARD,
    "orders_copurchase": SQL_ORDERS_COPURCHASE,
    "orders_setops": SQL_ORDERS_SETOPS,
    "length_curriculum": SQL_LENGTH_CURRICULUM,
    "curation_pipeline_v2": SQL_CURATION_PIPELINE_V2,
    "events_anomalies": SQL_EVENTS_ANOMALIES,
    "ann_recall": SQL_ANN_RECALL,
    "events_interval_join": SQL_EVENTS_INTERVAL_JOIN,
    "events_overlap_join": SQL_EVENTS_OVERLAP_JOIN,
    "events_distinct_rollup": SQL_EVENTS_DISTINCT_ROLLUP,
    "events_heavy_hitters": SQL_EVENTS_HEAVY_HITTERS,
    "events_incremental_rollup": SQL_EVENTS_INCREMENTAL_ROLLUP,
    "events_quantile_sketch": SQL_EVENTS_QUANTILE_SKETCH,
    "events_cms": SQL_EVENTS_CMS,
    "orders_bloom_join": SQL_ORDERS_BLOOM_JOIN,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "events_paths": SQL_EVENTS_PATHS,
    "events_cohorts": SQL_EVENTS_COHORTS,
    "hybrid_weighted": SQL_HYBRID_WEIGHTED,
    "events_percentiles": SQL_EVENTS_PERCENTILES,
    "events_running": SQL_EVENTS_RUNNING,
    "events_range_frame": SQL_EVENTS_RANGE_FRAME,
    "orders_analytics": SQL_ORDERS_ANALYTICS,
    "orders_rollup": SQL_ORDERS_ROLLUP,
    "orders_pivot": SQL_ORDERS_PIVOT,
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q4": SQL_TPCH_Q4,
    "tpch_q5": SQL_TPCH_Q5,
    "tpch_q6": SQL_TPCH_Q6,
    "tpch_q13": SQL_TPCH_Q13,
    "tpch_q16": SQL_TPCH_Q16,
    "tpch_q17": SQL_TPCH_Q17,
    "tpch_q18": SQL_TPCH_Q18,
    "tpch_q21": SQL_TPCH_Q21,
    "tpch_q22": SQL_TPCH_Q22,
    **TPCH_EXT_ORACLES,
    "top_orders_per_priority": SQL_TOP_ORDERS_PER_PRIORITY,
    # ingest_chunks / search_ingested / neardup_lsh_embeddings / stream_hourly /
    # stream_join:
    # intentionally no oracle (chunker recursion, seeded hyperplanes and
    # streaming execution are not ANSI-SQL-expressible) → rows-only check.
}
