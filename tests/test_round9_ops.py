"""Round-9 catalog additions: exact-dup cluster profile, keep-one
survivor accounting, top-k n-gram coverage, per-source near-dup
exposure — planted closed-form assertions (the round-6..8 discipline:
every new operator ships with inputs whose correct answer is known by
construction, not just oracle agreement).  The raw testdata has no
exact dups, so the planted corpora are the ONLY exercise of the
interesting branches (multi-doc clusters, cross-source loss)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"


def _plant(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))


# ---------------------------------------------------------------------------
# dup_cluster_sizes
# ---------------------------------------------------------------------------


def test_dup_cluster_sizes_closed_form(spark, tmp_path):
    """3 copies of A (9 bytes), 2 copies of B (7 bytes), 1 unique C:
    the histogram rows and reclaimed bytes follow exactly."""
    from mcpvectordb_spark.catalog._round9 import q_dup_cluster_sizes

    _plant(
        spark,
        tmp_path,
        [
            (0, "text AAAA", "en", "s", 9),
            (1, "text AAAA", "en", "s", 9),
            (2, "text AAAA", "en", "s", 9),
            (3, "other B", "en", "s", 7),
            (4, "other B", "en", "s", 7),
            (5, "unique C doc", "en", "s", 12),
        ],
    )
    rows = {r["cluster_size"]: r for r in q_dup_cluster_sizes(spark, str(tmp_path)).collect()}
    assert set(rows) == {1, 2, 3}
    assert tuple(rows[1])[1:] == (1, 1, 0, 0)
    assert tuple(rows[2])[1:] == (1, 2, 1, 7)
    assert tuple(rows[3])[1:] == (1, 3, 2, 18)


def test_dup_cluster_sizes_on_testdata(spark):
    """Raw testdata has no exact dups: exactly one histogram row, size 1,
    zero excess — and its doc count is the corpus size."""
    from mcpvectordb_spark.catalog._round9 import q_dup_cluster_sizes
    from mcpvectordb_spark.io import load_table

    rows = q_dup_cluster_sizes(spark, SF).collect()
    assert len(rows) == 1 and rows[0]["cluster_size"] == 1
    assert rows[0]["n_excess_docs"] == 0 and rows[0]["excess_bytes"] == 0
    assert rows[0]["n_docs"] == load_table(spark, SF, "documents").count()


# ---------------------------------------------------------------------------
# dedup_survivors
# ---------------------------------------------------------------------------


def test_dedup_survivors_closed_form(spark, tmp_path):
    """Keep-one by lowest doc_id: source a's doc 0 wins the shared
    cluster, so source b loses doc 1 TO ANOTHER SOURCE (the mix-shift
    counter) while keeping its unique doc 2."""
    from mcpvectordb_spark.catalog._round9 import q_dedup_survivors

    shared = "identical shared text"
    _plant(
        spark,
        tmp_path,
        [
            (0, shared, "en", "a", 21),
            (1, shared, "en", "b", 21),
            (2, "unique in b", "en", "b", 11),
        ],
    )
    rows = {r["source"]: r for r in q_dedup_survivors(spark, str(tmp_path)).collect()}
    a, b = rows["a"], rows["b"]
    assert (a["n_docs"], a["n_kept"], a["n_removed"]) == (1, 1, 0)
    assert a["bytes_removed"] == 0 and a["n_lost_cross_source"] == 0
    assert (b["n_docs"], b["n_kept"], b["n_removed"]) == (2, 1, 1)
    assert b["bytes_removed"] == len(shared)
    assert b["n_lost_cross_source"] == 1, "the surviving copy lives in source a"
    assert b["removed_rate"] == 0.5


def test_dedup_survivors_conservation_on_testdata(spark):
    from mcpvectordb_spark.catalog._round9 import q_dedup_survivors

    rows = q_dedup_survivors(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] + r["n_removed"] == r["n_docs"]
        assert r["n_lost_cross_source"] <= r["n_removed"]
        # no exact dups in raw testdata -> keep-one removes nothing
        assert r["n_removed"] == 0 and r["bytes_removed"] == 0


# ---------------------------------------------------------------------------
# ngram_coverage
# ---------------------------------------------------------------------------


def test_ngram_coverage_closed_form(spark, tmp_path):
    """'a b c d' contributes shingles {a b c, b c d}; a second doc 'a b c'
    contributes {a b c}: 3 incidences total, so the curve is exactly
    (2/3, 2/3) then (1/3, 1.0) with the df-then-shingle tiebreak."""
    from mcpvectordb_spark.catalog._round9 import q_ngram_coverage

    _plant(
        spark,
        tmp_path,
        [(0, "a b c d", "en", "s", 7), (1, "a b c", "en", "s", 5)],
    )
    rows = q_ngram_coverage(spark, str(tmp_path)).collect()
    assert [(r["rank"], r["shingle"], r["df"]) for r in rows] == [
        (1, "a b c", 2),
        (2, "b c d", 1),
    ]
    assert rows[0]["share"] == round(2 / 3, 6)
    assert rows[0]["cum_share"] == round(2 / 3, 6)
    assert rows[1]["cum_share"] == 1.0


def test_ngram_coverage_curve_on_testdata(spark):
    from mcpvectordb_spark.catalog._round9 import q_ngram_coverage

    rows = q_ngram_coverage(spark, SF).collect()
    assert len(rows) == 100
    assert [r["rank"] for r in rows] == list(range(1, 101))
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True), "df must be non-increasing"
    cums = [r["cum_share"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:]))
    assert cums[-1] <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# near_dup_rate_by_source
# ---------------------------------------------------------------------------


def test_near_dup_rate_closed_form(spark, tmp_path):
    """Doc 0 (source a) is a verbatim copy of doc 2 (source b): both are
    flagged, a's second doc is clean -> a rate 0.5, b rate 1.0."""
    from mcpvectordb_spark.catalog._round9 import q_near_dup_rate_by_source

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    _plant(
        spark,
        tmp_path,
        [
            (0, shared, "en", "a", 10),
            (1, "iota kappa lambda mu nu xi omicron pi", "en", "a", 10),
            (2, shared, "en", "b", 10),
        ],
    )
    rows = {r["source"]: r for r in q_near_dup_rate_by_source(spark, str(tmp_path)).collect()}
    assert (rows["a"]["n_docs"], rows["a"]["n_neardup"]) == (2, 1)
    assert rows["a"]["neardup_rate"] == 0.5
    assert (rows["b"]["n_docs"], rows["b"]["n_neardup"]) == (1, 1)
    assert rows["b"]["neardup_rate"] == 1.0


def test_near_dup_rate_bounds_on_testdata(spark):
    """Every source appears (left join keeps clean sources with rate 0),
    and the flagged count can never exceed the source size."""
    from mcpvectordb_spark.catalog._round9 import q_near_dup_rate_by_source
    from mcpvectordb_spark.io import load_table

    rows = q_near_dup_rate_by_source(spark, SF).collect()
    n_sources = (
        load_table(spark, SF, "documents").select("source").distinct().count()
    )
    assert len(rows) == n_sources
    for r in rows:
        assert 0 <= r["n_neardup"] <= r["n_docs"]
        assert 0.0 <= r["neardup_rate"] <= 1.0
