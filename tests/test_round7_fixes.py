"""Round-7 ADVICE fixes: stump oracle argmax on the unrounded gain,
gini_stump NULL-feature filtering (Spark NULLS-FIRST vs DuckDB NULLS-LAST
windows), _lloyd_train corpus-size validation, and the silhouette readout
rounding caveat being documented rather than claimed exact."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_stump_oracle_orders_by_unrounded_gain():
    """ADVICE r7 #1: DuckDB binds ORDER BY gain to the rounded output
    alias; the oracle must sort on the raw scored gain so both engines
    share the argmax key when two candidates round to the same 6dp."""
    from mcpvectordb_spark.catalog._round6 import SQL_DOCUMENTS_STUMP

    assert "ORDER BY gain_raw DESC" in SQL_DOCUMENTS_STUMP
    assert "round(gain_raw, 6) AS gain" in SQL_DOCUMENTS_STUMP


def test_stump_oracle_argmax_survives_6dp_tie():
    """Two candidates whose unrounded gains differ only past the 6th
    decimal must yield the truly-higher one, not the alphabetical-tiebreak
    winner.  'zgood' splits 4M rows perfectly; 'abad' misplaces one row
    (gain lower by ~2/n = 5e-7, so both round to the same 6dp).  The old
    'ORDER BY gain' (DuckDB binds it to the rounded alias) fell through
    to the feature tiebreak and picked 'abad'; ordering by gain_raw picks
    'zgood'."""
    con = duckdb.connect()
    n = 4_000_000
    con.execute(
        f"""
        CREATE TABLE t AS
        SELECT CAST(i < {n // 2} AS INT) AS y,
               CASE WHEN i < {n // 2} THEN 0 ELSE 1 END AS zgood,
               CASE WHEN i < {n // 2 + 1} THEN 0 ELSE 1 END AS abad
        FROM range({n}) r(i)
        """
    )
    q = """
    WITH feats AS (
      SELECT 'zgood' AS feature, CAST(zgood AS BIGINT) AS x, y FROM t
      UNION ALL
      SELECT 'abad' AS feature, CAST(abad AS BIGINT) AS x, y FROM t),
    blocks AS (
      SELECT feature, x, CAST(count(*) AS BIGINT) AS bn,
             CAST(sum(y) AS BIGINT) AS bpos
      FROM feats WHERE x IS NOT NULL GROUP BY 1, 2),
    cum AS (
      SELECT feature, x,
             CAST(sum(bn) OVER (PARTITION BY feature ORDER BY x) AS BIGINT) AS nl,
             CAST(sum(bpos) OVER (PARTITION BY feature ORDER BY x) AS BIGINT) AS pl
      FROM blocks),
    tot AS (
      SELECT feature, CAST(sum(bn) AS BIGINT) AS n_total,
             CAST(sum(bpos) AS BIGINT) AS p_total
      FROM blocks GROUP BY 1),
    scored AS (
      SELECT feature, x, nl, pl,
             (CAST(n_total AS DOUBLE)
               - (CAST(p_total AS DOUBLE) * p_total
                  + CAST(n_total - p_total AS DOUBLE) * (n_total - p_total))
                 / n_total) / n_total
             - ((CAST(nl AS DOUBLE)
                  - (CAST(pl AS DOUBLE) * pl
                     + CAST(nl - pl AS DOUBLE) * (nl - pl)) / nl)
                + (CAST(n_total - nl AS DOUBLE)
                  - (CAST(p_total - pl AS DOUBLE) * (p_total - pl)
                     + CAST((n_total - nl) - (p_total - pl) AS DOUBLE)
                       * ((n_total - nl) - (p_total - pl)))
                    / (n_total - nl))) / n_total AS gain_raw
      FROM cum JOIN tot USING (feature) WHERE nl < n_total)
    SELECT feature, round(gain_raw, 6) AS gain
    FROM scored ORDER BY {key} DESC, feature, x LIMIT 1
    """
    # Precondition: the two best gains really do round to the same 6dp
    both = con.execute(
        q.replace(
            "SELECT feature, round(gain_raw, 6) AS gain",
            "SELECT feature, max(gain_raw) AS g",
        ).replace("ORDER BY {key} DESC, feature, x LIMIT 1", "GROUP BY 1")
    ).fetchall()
    raws = dict(both)
    assert round(raws["zgood"], 6) == round(raws["abad"], 6)
    assert raws["zgood"] > raws["abad"]
    # Old sort key (rounded alias): alphabetical tiebreak picks the worse
    old_winner = con.execute(q.replace("{key}", "gain")).fetchone()[0]
    assert old_winner == "abad"
    # Fixed sort key: raw gain picks the strictly-better feature
    new_winner = con.execute(q.replace("{key}", "gain_raw")).fetchone()[0]
    assert new_winner == "zgood"


def test_gini_stump_null_features_filtered(spark):
    """ADVICE r7 #2: NULL feature values are dropped per feature with
    per-feature totals, so a nullable feature cannot shift the cumulative
    counts (Spark would sort the NULL block FIRST, DuckDB LAST)."""
    from mcpvectordb_spark.operators.classify import gini_stump

    rows = [Row(x=i, z=(None if i % 3 == 0 else i), y=(i <= 10)) for i in range(1, 21)]
    df = spark.createDataFrame(rows)
    out = gini_stump(df, {"x": F.col("x"), "z": F.col("z")}, F.col("y")).collect()[0]
    # x splits perfectly over all 20 rows; z (with NULLs dropped) covers
    # only 13 rows and cannot beat a perfect split
    assert out["feature"] == "x"
    assert out["split_x"] == 10
    assert out["n"] == 20
    assert out["n_correct"] == 20


def test_gini_stump_all_null_feature_still_returns_winner(spark):
    from mcpvectordb_spark.operators.classify import gini_stump

    rows = [Row(x=i, z=None, y=(i < 3)) for i in range(6)]
    df = spark.createDataFrame(rows, "x long, z long, y boolean")
    out = gini_stump(df, {"x": F.col("x"), "z": F.col("z")}, F.col("y")).collect()
    assert len(out) == 1
    assert out[0]["feature"] == "x"


def test_gini_stump_null_totals_are_per_feature(spark):
    """A feature with NULLs gets ITS OWN non-null total, not the global
    corpus count — otherwise nr/pr go negative for the null-bearing
    feature's last block."""
    from mcpvectordb_spark.operators.classify import gini_stump

    # Only feature z exists; half its values are NULL.  n must equal the
    # non-null count (5), not the corpus count (10).
    rows = [Row(z=(i if i % 2 == 0 else None), y=(i < 4)) for i in range(10)]
    df = spark.createDataFrame(rows, "z long, y boolean")
    out = gini_stump(df, {"z": F.col("z")}, F.col("y")).collect()[0]
    assert out["n"] == 5
    assert out["n_left"] + out["n_right"] == 5


def test_lloyd_train_corpus_smaller_than_k_raises(spark):
    """ADVICE r7 #3: fewer than k corpus vectors must be a clear
    ValueError from both entry points, not an IndexError from the
    empty-cluster fallback."""
    from mcpvectordb_spark.operators.knn import (
        lloyd_kmeans_replayable,
        silhouette_simplified,
    )

    df = spark.createDataFrame(
        [Row(id=i, v=[float(i), 0.0]) for i in range(3)]
    )
    with pytest.raises(ValueError, match="at least k=8"):
        lloyd_kmeans_replayable(df, "id", "v", k=8, iters=1, dim=2)
    with pytest.raises(ValueError, match="at least k=8"):
        silhouette_simplified(df, "id", "v", k=8, iters=1, dim=2)


def test_silhouette_docstring_documents_exact_readout():
    """ADVICE r7 #4 CLOSED in r8: the readout is now the exact-integer
    quantized mean (9dp units summed as BIGINT), so the docstring must
    document the bit-guarantee that replaced the old probabilistic
    caveat — and the caveat itself must be gone."""
    from mcpvectordb_spark.operators.knn import silhouette_simplified

    doc = " ".join(silhouette_simplified.__doc__.split())
    assert "bit-guaranteed" in doc
    assert "BIGINT" in doc
    assert "probabilistically safe" not in doc


# ---------------------------------------------------------------------------
# round-7 ranked-cut discipline: every row-selecting cut keyed on a float
# aggregate (ln()-bearing or summation-order-dependent) sorts the ROUNDED
# value on BOTH engines; IEEE-exact keys sort the raw value on both.
# ---------------------------------------------------------------------------


def test_bm25_topk_ranks_on_rounded_score(spark):
    """The physical top-k must key on round(score, 6) — raw BM25 sums
    differ from a sequential engine in the last ulp."""
    from mcpvectordb_spark.operators.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"spark batch join window filler{i}") for i in range(20)]
    )
    q = bm25_topk(docs, "spark batch", 5, "doc_id", "text")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "round(score" in plan, "top-k cut lost its rounded sort key"


def test_rank_by_score_uses_rounded_key(spark):
    from mcpvectordb_spark.operators.hybrid import rank_by_score

    df = spark.createDataFrame([Row(doc=1, s=1.0000001), Row(doc=2, s=1.0000004)])
    ranked = {r["doc"]: r["r"] for r in rank_by_score(df, "doc", "s", "r").collect()}
    # 6dp-equal scores tie; the id tiebreak (not the raw ulp difference)
    # decides — matching what the oracle's rounded window key does
    assert ranked == {1: 1, 2: 2}


def test_oracle_cut_keys_are_rounded():
    """String-pin the oracle CTE sort keys fixed this round: a bare alias
    reference in DuckDB binds the ROUNDED output column, so every ranked
    cut must either round its key explicitly or qualify the raw column."""
    from mcpvectordb_spark.catalog import ORACLES

    sql = ORACLES["rm3_expansion"]
    assert "ORDER BY round(score, 6) DESC, doc LIMIT 10" in sql  # feedback
    assert "ORDER BY round(p_rm1, 9) DESC, term LIMIT 10" in sql  # top_e
    sql = ORACLES["hybrid_rrf"]
    assert sql.count("ORDER BY round(score, 6) DESC, doc") >= 3  # cut + 2 ranks
    sql = ORACLES["search_clarity"]
    assert sql.count("ORDER BY round(score, 6) DESC, doc LIMIT 10") == 2
    sql = ORACLES["hard_negatives"]
    assert sql.count("ORDER BY round(score, 6) DESC, doc") == 1
    assert sql.count("ORDER BY round(r.score, 6) DESC, r.doc") == 1
    sql = ORACLES["search_eval"]
    assert "ORDER BY round(score, 6) DESC, doc" in sql
    sql = ORACLES["search_rbo"]
    assert sql.count("ORDER BY round(score, 6) DESC, doc ASC") == 2
    sql = ORACLES["events_bh_fdr"]
    assert "ORDER BY round(p, 12), g" in sql
    sql = ORACLES["events_periodogram"]
    assert "ORDER BY round(p_raw, 6) DESC, period ASC" in sql
    assert "ORDER BY round(a, 9) DESC, t ASC LIMIT 20" in ORACLES["parts_hits"]
    assert "ORDER BY round(r, 6) DESC, sent ASC" in ORACLES["textrank_summary"]
    assert "ORDER BY round(k, 9) DESC, doc_id ASC" in ORACLES["weighted_sample"]
    assert "round(dot / (na.norm * nb.norm), 9) >= 0.6" in ORACLES["tfidf_simjoin"]
    # money cuts ride EXACT decimal sums on both engines (tpch_ext's
    # _rev_dec discipline, back-ported to the core q3 this round)
    assert "ORDER BY sum(CAST(l_extendedprice AS DECIMAL(12,2))" in ORACLES["tpch_q3"]
    # IEEE-exact keys: the oracle must bypass the rounded alias instead
    assert "ORDER BY rules.lift DESC, rules.confidence DESC" in ORACLES["assoc_rules"]
    assert "ORDER BY sym.cos DESC, rec ASC" in ORACLES["item_recs"]


def test_duckdb_alias_binding_assumption():
    """The premise of the discipline: DuckDB binds a bare ORDER BY name to
    the output alias (rounded), while a qualified name reaches the raw
    source column.  If an engine upgrade changes this, every oracle sort
    key needs re-auditing."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE, id INT)")
    con.execute("INSERT INTO t VALUES (1.0000001, 1), (1.0000004, 2)")
    alias_bound = con.execute(
        "SELECT id FROM t ORDER BY x DESC, id LIMIT 1",
    ).fetchone()[0]  # raw would pick 2; this binds... the source (no alias here)
    assert alias_bound == 2
    shadowed = con.execute(
        "SELECT id, round(x, 6) AS x FROM t ORDER BY x DESC, id LIMIT 1"
    ).fetchone()[0]
    assert shadowed == 1  # rounded tie -> id tiebreak
    qualified = con.execute(
        "WITH s AS (SELECT * FROM t) "
        "SELECT id, round(x,6) AS x FROM s ORDER BY s.x DESC, id LIMIT 1"
    ).fetchone()[0]
    assert qualified == 2  # raw value wins
