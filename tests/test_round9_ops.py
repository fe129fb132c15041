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


# ---------------------------------------------------------------------------
# contamination_by_source
# ---------------------------------------------------------------------------


def test_contamination_by_source_closed_form(spark, tmp_path):
    """Eval docs 0/1 (sources a/b) are planted back as +10M mutants that
    keep 10 of their 15 shingles (12-word text + 5-word suffix ->
    10/15 = 0.667 >= 0.5, flagged); doc 50 is clean train in source a.
    So a: 2 train docs, 1 contaminated; b: 1 train doc, 1 contaminated."""
    from mcpvectordb_spark.catalog._round9 import q_contamination_by_source

    w12_a = " ".join(f"ea{i}" for i in range(12))
    w12_b = " ".join(f"eb{i}" for i in range(12))
    _plant(
        spark,
        tmp_path,
        [
            (0, w12_a, "en", "a", 60),
            (1, w12_b, "en", "b", 60),
            (50, "totally clean unrelated training words here", "en", "a", 44),
        ],
    )
    rows = {r["source"]: r for r in
            q_contamination_by_source(spark, str(tmp_path)).collect()}
    a, b = rows["a"], rows["b"]
    assert (a["n_train_docs"], a["n_contaminated"]) == (2, 1)
    assert a["contamination_rate"] == 0.5
    assert (b["n_train_docs"], b["n_contaminated"]) == (1, 1)
    assert b["contamination_rate"] == 1.0


def test_contamination_by_source_on_testdata(spark):
    """Every planted mutant is contaminated by construction, so overall
    contamination count >= 50; rates bounded."""
    from mcpvectordb_spark.catalog._round9 import q_contamination_by_source

    rows = q_contamination_by_source(spark, SF).collect()
    assert sum(r["n_contaminated"] for r in rows) >= 50
    for r in rows:
        assert 0 <= r["n_contaminated"] <= r["n_train_docs"]
        assert 0.0 <= r["contamination_rate"] <= 1.0


# ---------------------------------------------------------------------------
# lang_confusion
# ---------------------------------------------------------------------------


def test_lang_confusion_closed_form(spark, tmp_path):
    """Disjoint vocab per language except one mislabeled doc: fr doc 4
    carries en tokens, and its own contribution to the fr class is not
    enough to win (hand-computed NB posteriors: en -6.80 vs fr -8.03),
    so it lands in the (fr, en) cell with share exactly 1/3."""
    from mcpvectordb_spark.catalog._round9 import q_lang_confusion

    _plant(
        spark,
        tmp_path,
        [
            (0, "aaa bbb", "en", "s", 7),
            (1, "aaa bbb", "en", "s", 7),
            (2, "ccc ddd", "fr", "s", 7),
            (3, "ccc ddd", "fr", "s", 7),
            (4, "aaa bbb aaa bbb aaa bbb", "fr", "s", 23),
        ],
    )
    cells = {(r["lang"], r["predicted"]): r for r in
             q_lang_confusion(spark, str(tmp_path)).collect()}
    assert cells[("en", "en")]["n_docs"] == 2
    assert cells[("en", "en")]["share"] == 1.0
    assert cells[("fr", "en")]["n_docs"] == 1
    assert cells[("fr", "en")]["share"] == round(1 / 3, 6)
    assert cells[("fr", "fr")]["n_docs"] == 2
    assert cells[("fr", "fr")]["share"] == round(2 / 3, 6)
    assert ("en", "fr") not in cells


def test_lang_confusion_shares_sum_on_testdata(spark):
    from collections import defaultdict

    from mcpvectordb_spark.catalog._round9 import q_lang_confusion

    rows = q_lang_confusion(spark, SF).collect()
    per_lang = defaultdict(float)
    for r in rows:
        per_lang[r["lang"]] += r["share"]
    for lang, s in per_lang.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


# ---------------------------------------------------------------------------
# length_profile_by_source
# ---------------------------------------------------------------------------


def test_length_profile_closed_form(spark, tmp_path):
    """Three docs of 100/200/300 chars: p10 = 120, p50 = 200, p90 = 280
    under the shared (1-g)*a + g*b interpolation; exactly one short doc."""
    from mcpvectordb_spark.catalog._round9 import q_length_profile_by_source

    _plant(
        spark,
        tmp_path,
        [
            (0, "x" * 100, "en", "s", 100),
            (1, "y" * 200, "en", "s", 200),
            (2, "z" * 300, "en", "s", 300),
        ],
    )
    r = q_length_profile_by_source(spark, str(tmp_path)).collect()[0]
    assert (r["p10_chars"], r["p50_chars"], r["p90_chars"]) == (120.0, 200.0, 280.0)
    assert r["n_short"] == 1 and r["short_share"] == round(1 / 3, 6)


def test_length_profile_monotone_on_testdata(spark):
    from mcpvectordb_spark.catalog._round9 import q_length_profile_by_source

    for r in q_length_profile_by_source(spark, SF).collect():
        assert r["p10_chars"] <= r["p50_chars"] <= r["p90_chars"]
        assert 0.0 <= r["short_share"] <= 1.0


# ---------------------------------------------------------------------------
# pair_jaccard_histogram
# ---------------------------------------------------------------------------


def test_pair_jaccard_histogram_closed_form(spark, tmp_path):
    """One verbatim pair (J = 1.0 -> capped bin 9) and one engineered
    J = 0.5 pair (5 shared words -> 3 shared shingles of B's 6 ->
    3/(3+6-3)) -> exactly two cells with exact means."""
    from mcpvectordb_spark.catalog._round9 import q_pair_jaccard_histogram

    verbatim = "alpha beta gamma delta epsilon zeta"
    five = "one two three four five"
    _plant(
        spark,
        tmp_path,
        [
            (0, verbatim, "en", "s", 10),
            (1, verbatim, "en", "s", 10),
            (2, five, "en", "s", 10),
            (3, five + " six seven eight", "en", "s", 10),
        ],
    )
    rows = {r["bin"]: r for r in q_pair_jaccard_histogram(spark, str(tmp_path)).collect()}
    assert set(rows) == {5, 9}
    assert rows[9]["n_pairs"] == 1 and rows[9]["mean_jaccard"] == 1.0
    assert rows[9]["bin_lo"] == 0.9
    assert rows[5]["n_pairs"] == 1 and rows[5]["mean_jaccard"] == 0.5


def test_pair_jaccard_histogram_bounds_on_testdata(spark):
    from mcpvectordb_spark.catalog._round9 import q_pair_jaccard_histogram

    rows = q_pair_jaccard_histogram(spark, SF).collect()
    for r in rows:
        assert 0 <= r["bin"] <= 9
        lo = r["bin"] / 10.0
        hi = 1.0 if r["bin"] == 9 else lo + 0.1
        assert lo - 1e-9 <= r["mean_jaccard"] <= hi + 1e-9
