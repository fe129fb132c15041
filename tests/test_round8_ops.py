"""Round-8 catalog additions: tokenizer fertility, document novelty, and
the per-source dataset datasheet — planted closed-form assertions (the
round-6/7 discipline: every new operator ships with inputs whose correct
answer is known by construction, not just oracle agreement)."""

import math
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------


def test_fertility_closed_form(spark, tmp_path):
    """Planted corpus with hand-countable tokens: 'extraordinary' (13
    letters) costs ceil(13/4)=4 BPE-ish pieces, short words cost 1, punct
    runs cost 1 per mark — fertility and bytes/token follow exactly."""
    from mcpvectordb_spark.catalog._round8 import q_tokenizer_fertility

    rows = [
        # lang en: "extraordinary cat" -> ws=2, bpe=4+1=5, bytes=17
        (0, "extraordinary cat", "en", "s", 17),
        # lang fr: "le chat!" -> ws=2 words; bpe: 'le'(1)+'chat'(1)+'!'(1)=3
        (1, "le chat!", "fr", "s", 8),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "documents.parquet")
    df.write.parquet(d)
    out = {
        r["lang"]: r
        for r in q_tokenizer_fertility(spark, str(tmp_path)).collect()
    }
    en, fr = out["en"], out["fr"]
    assert (en["ws_tokens"], en["bpe_tokens"]) == (2, 5)
    assert en["fertility"] == round(5 / 2, 6)
    assert en["bytes_per_token"] == round(17 / 5, 6)
    assert (fr["ws_tokens"], fr["bpe_tokens"]) == (2, 3)
    assert fr["fertility"] == 1.5


def test_fertility_runs_on_testdata(spark):
    from mcpvectordb_spark.catalog._round8 import q_tokenizer_fertility

    rows = q_tokenizer_fertility(spark, SF).collect()
    assert rows and all(r["fertility"] >= 1.0 for r in rows), (
        "a word costs at least one subword"
    )
    assert all(r["bytes_per_token"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# doc_novelty
# ---------------------------------------------------------------------------


def test_novelty_closed_form(spark, tmp_path):
    """A doc duplicated verbatim shares EVERY shingle -> novelty 0 for
    both copies; a doc with fully unique text -> novelty 1; a 2-word doc
    has no 3-gram shingles and is excluded."""
    from mcpvectordb_spark.catalog._round8 import q_doc_novelty

    dup = "alpha beta gamma delta epsilon"
    rows = [
        (0, dup, "en", "s", 1),
        (1, dup, "en", "s", 1),
        (2, "zeta eta theta iota kappa", "en", "s", 1),
        (3, "too short", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in q_doc_novelty(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2}, "2-word doc has no shingles on either engine"
    assert out[0]["novelty"] == 0.0 and out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0
    # 5 words -> 3 distinct 3-gram shingles
    assert out[2]["n_shingles"] == 3 and out[2]["n_novel"] == 3


def test_novelty_bounds_on_testdata(spark):
    from mcpvectordb_spark.catalog._round8 import q_doc_novelty

    rows = q_doc_novelty(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert 0 <= r["n_novel"] <= r["n_shingles"]


# ---------------------------------------------------------------------------
# dataset_datasheet
# ---------------------------------------------------------------------------


def test_datasheet_closed_form(spark, tmp_path):
    """Planted two-source corpus: source a = 4 docs, one exact dup pair
    (dup_rate 2/4), an even en/fr split (entropy ln 2); source b = one
    single-language doc (entropy exactly 0.0, never -0.0)."""
    from mcpvectordb_spark.catalog._round8 import q_dataset_datasheet

    rows = [
        (0, "same text here", "en", "a", 14),
        (1, "same text here", "en", "a", 14),
        (2, "other text one", "fr", "a", 14),
        (3, "other text two", "fr", "a", 14),
        (4, "lonely document", "en", "b", 15),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in q_dataset_datasheet(spark, str(tmp_path)).collect()}
    a, b = out["a"], out["b"]
    assert a["n_docs"] == 4 and a["n_langs"] == 2
    assert a["dup_rate"] == 0.5
    assert a["lang_entropy"] == round(math.log(2), 6)
    assert a["ws_tokens"] == 12 and a["total_chars"] == 56
    assert b["n_docs"] == 1 and b["n_langs"] == 1
    assert b["dup_rate"] == 0.0
    assert b["lang_entropy"] == 0.0 and not str(b["lang_entropy"]).startswith("-")


# ---------------------------------------------------------------------------
# source_leakage
# ---------------------------------------------------------------------------


def test_source_leakage_closed_form(spark, tmp_path):
    """Planted three-source corpus: source a's doc 0 reappears verbatim
    in source b (Jaccard exactly 1.0, unordered pair (a,b)); source c
    shares nothing above the 0.02 floor -> it appears in NO pair row."""
    from mcpvectordb_spark.catalog._round8 import q_source_leakage

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, shared, "en", "a", 10),
        (1, shared, "en", "b", 10),
        (2, "iota kappa lambda mu nu xi omicron pi", "en", "c", 10),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = q_source_leakage(spark, str(tmp_path)).collect()
    assert [(r["source_a"], r["source_b"]) for r in out] == [("a", "b")]
    r = out[0]
    assert r["n_pairs"] == 1
    assert r["mean_jaccard"] == 1.0 and r["max_jaccard"] == 1.0


def test_source_leakage_unordered_pairs_on_testdata(spark):
    from mcpvectordb_spark.catalog._round8 import q_source_leakage

    rows = q_source_leakage(spark, SF).collect()
    for r in rows:
        assert r["source_a"] <= r["source_b"], "pairs must be unordered-normalized"
        assert 0.02 <= r["mean_jaccard"] <= 1.0 + 1e-9
        assert r["max_jaccard"] >= r["mean_jaccard"] - 1e-9


def test_datasheet_runs_on_testdata(spark):
    from mcpvectordb_spark.catalog._round8 import q_dataset_datasheet

    rows = q_dataset_datasheet(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert r["lang_entropy"] >= 0.0
        assert r["n_langs"] >= 1
