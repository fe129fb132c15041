"""Event analytics (batch forms of the streaming operators) and relational TPC-H-shaped analytics.

Split out of the original single-file catalog.py (round-5 refactor,
round-4 verdict item #3).  Import order is load-bearing: later sections
reference names from earlier ones via the wildcard chain below."""
from __future__ import annotations

from mcpvectordb_spark.catalog._common import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._search import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._corpus import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._curation import *  # noqa: F401,F403

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
    # revenue in EXACT decimal arithmetic (the tpch_ext.py::_rev_dec
    # discipline, back-ported round 7): the money columns are 2dp
    # quantized, so the decimal sum is partitioning-order independent and
    # the top-10 cut key is bit-identical to the oracle's decimal sum —
    # double sums over enough rows can straddle a boundary between engines
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
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
            F.round("_rev", 2).cast("double").alias("revenue"),
        )
    )


SQL_TPCH_Q3 = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) DESC, o_orderkey
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




# re-export everything (including underscore helpers) to later sections
__all__ = [n for n in dir() if not n.startswith("__")]
