"""Corpus curation at training-pipeline scale: decontamination, DSIR, CCNet buckets, quotas, mixtures, C4 line dedup, packing.

Split out of the original single-file catalog.py (round-5 refactor,
round-4 verdict item #3).  Import order is load-bearing: later sections
reference names from earlier ones via the wildcard chain below."""
from __future__ import annotations

from mcpvectordb_spark.catalog._common import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._search import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._corpus import *  # noqa: F401,F403

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
FROM keyed ORDER BY round(k, 9) DESC, doc_id ASC LIMIT 120
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




# re-export everything (including underscore helpers) to later sections
__all__ = [n for n in dir() if not n.startswith("__")]
