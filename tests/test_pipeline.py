"""Curation pipeline: gate ordering, deterministic dedup survivor,
auditable drop reasons, summary rollup."""

from pyspark.sql import functions as F

from mcpvectordb_spark.pipeline import curate_corpus, curation_summary, corpus_token_stats


def test_curation_gates_and_reasons(spark):
    rows = [
        (1, "the quick brown fox is in the yard and it is happy to be here today " * 5),
        (2, "tiny"),                                             # too_short
        (3, "!!! ??? " * 30),                                    # low_quality (punct)
        (4, "the quick brown fox is in the yard and it is happy to be here today " * 5),  # dup of 1
        (5, "le chat et la porte est belle les amis vraiment tres bien aujourdhui " * 5),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    # min_quality 0.4: the stopword leg of the score is English-biased, so
    # the French doc sits just under 0.5 (known C4-style heuristic bias)
    out = {r["id"]: r for r in curate_corpus(df, "id", "text", min_quality=0.4, min_words=10).collect()}
    assert out[1]["drop_reason"] is None
    assert out[2]["drop_reason"] == "too_short"
    assert out[3]["drop_reason"] == "low_quality"
    assert out[4]["drop_reason"] == "duplicate"   # id 1 is the canonical survivor
    assert out[5]["drop_reason"] is None
    assert out[5]["lang_pred"] == "fr"
    summary = {r["outcome"]: r["n_docs"] for r in
               curation_summary(curate_corpus(df, "id", "text", min_quality=0.4, min_words=10)).collect()}
    assert summary == {"kept": 2, "too_short": 1, "low_quality": 1, "duplicate": 1}


def test_curation_lang_filter(spark):
    df = spark.createDataFrame(
        [(1, "the cat is on a mat and the dog is here with all of us " * 3),
         (2, "le chat et la porte est belle les amis et le chien aussi " * 3)],
        "id long, text string",
    )
    out = {r["id"]: r["drop_reason"] for r in
           curate_corpus(df, "id", "text", min_quality=0.0, min_words=1, keep_langs=("en",)).collect()}
    assert out[1] is None and out[2] == "wrong_lang"


def test_corpus_token_stats(spark):
    df = spark.createDataFrame([("a", "one two three"), ("a", "four five"), ("b", "six")],
                               "g string, text string")
    out = {r["g"]: r for r in corpus_token_stats(df, "text", "g").collect()}
    assert out["a"]["n_docs"] == 2 and out["a"]["total_tokens"] == 5 and out["a"]["max_tokens"] == 3
    assert out["b"]["total_tokens"] == 1


def test_duplicate_group_survivor_is_a_passing_copy(spark):
    """A dup group whose smallest id fails a gate must still keep one
    passing copy (found by code review: survivors-first ranking)."""
    # id 1 and 2 normalize to the same content; id 1 has extra punctuation
    # noise pushing punct_ratio up → lower quality than id 2
    base = "the quick brown fox is in the yard and it is happy " * 3
    df = spark.createDataFrame(
        [(1, base.upper()),          # same normalized text, passes too
         (2, base)],
        "id long, text string",
    )
    out = {r["id"]: r["drop_reason"] for r in
           curate_corpus(df, "id", "text", min_quality=0.0, min_words=5).collect()}
    # both pass gates → smallest id survives, other is duplicate
    assert out[1] is None and out[2] == "duplicate"

    # now make id 1 fail (too_short) while id 2 passes: the group must
    # still keep id 2
    df2 = spark.createDataFrame(
        [(1, "the fox"), (2, "THE FOX"),
         (3, "completely different text with plenty of words in it here")],
        "id long, text string",
    )
    out2 = {r["id"]: r["drop_reason"] for r in
            curate_corpus(df2, "id", "text", min_quality=0.0, min_words=2).collect()}
    assert out2[3] is None
    # 'the fox' normalizes equal; both pass min_words=2 → 1 kept, 2 dup
    assert out2[1] is None and out2[2] == "duplicate"
    out3 = {r["id"]: r["drop_reason"] for r in
            curate_corpus(df2, "id", "text", min_quality=0.0, min_words=3).collect()}
    # both copies fail too_short → each reports its own reason, no bogus dup
    assert out3[1] == "too_short" and out3[2] == "too_short"


def test_null_and_blank_text_get_empty_reason(spark):
    """NULL/blank text must be 'empty', never silently kept or cross-marked
    as duplicates of each other (found by code review)."""
    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "a real document with enough words to pass the gate easily")],
        "id long, text string",
    )
    out = {r["id"]: r["drop_reason"] for r in
           curate_corpus(df, "id", "text", min_quality=0.0, min_words=3).collect()}
    assert out[1] == "empty" and out[2] == "empty"
    assert out[3] is None
