"""Unit tests for the positional-index phrase search operator."""


def test_phrase_basic_and_position(spark):
    from mcpvectordb_spark.operators.phrase import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "cat sat elsewhere the cat sat down cat sat"),
            (3, "the sat cat on mat"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc"]: (r["n_occurrences"], r["first_pos"])
        for r in phrase_search(docs, "doc_id", "text", "cat sat").collect()
    }
    assert out == {1: (1, 2), 2: (3, 1)}


def test_phrase_overlapping_occurrences(spark):
    """'a a' in 'a a a' matches at anchors 1 AND 2 — positional, not
    non-overlapping string replace."""
    from mcpvectordb_spark.operators.phrase import phrase_search

    docs = spark.createDataFrame([(4, "a a a b")], ["doc_id", "text"])
    r = phrase_search(docs, "doc_id", "text", "a a").collect()[0]
    assert (r["n_occurrences"], r["first_pos"]) == (2, 1)


def test_phrase_order_matters(spark):
    """Both tokens present but out of order -> no match (vs BM25)."""
    from mcpvectordb_spark.operators.phrase import phrase_search

    docs = spark.createDataFrame(
        [(1, "table stream hash join"), (2, "stream table scan")],
        ["doc_id", "text"],
    )
    out = [r["doc"] for r in phrase_search(docs, "doc_id", "text", "stream table").collect()]
    assert out == [2]


def test_phrase_repeated_token_phrase(spark):
    """A phrase with a repeated token only matches full alignment."""
    from mcpvectordb_spark.operators.phrase import phrase_search

    docs = spark.createDataFrame(
        [(1, "go stop go"), (2, "go go stop go"), (3, "stop go stop")],
        ["doc_id", "text"],
    )
    out = {
        r["doc"]: r["n_occurrences"]
        for r in phrase_search(docs, "doc_id", "text", "go stop go").collect()
    }
    assert out == {1: 1, 2: 1}


def test_phrase_single_token(spark):
    from mcpvectordb_spark.operators.phrase import phrase_search

    docs = spark.createDataFrame([(1, "x y x"), (2, "y z")], ["doc_id", "text"])
    out = {
        r["doc"]: r["n_occurrences"]
        for r in phrase_search(docs, "doc_id", "text", "x").collect()
    }
    assert out == {1: 2}


def test_near_either_order_and_window(spark):
    from mcpvectordb_spark.operators.phrase import near_search

    docs = spark.createDataFrame(
        [
            (1, "alpha x y beta"),        # dist 3
            (2, "beta alpha"),            # dist 1, reversed order
            (3, "alpha x y z w v beta"),  # dist 6 > window
            (4, "alpha only here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc"]: (r["min_dist"], r["pairs_within"])
        for r in near_search(docs, "doc_id", "text", "alpha", "beta", 3).collect()
    }
    assert out == {1: (3, 1), 2: (1, 1)}


def test_near_counts_all_pairs_within(spark):
    from mcpvectordb_spark.operators.phrase import near_search

    docs = spark.createDataFrame(
        [(1, "a b a b")], ["doc_id", "text"]
    )  # a at 1,3; b at 2,4: dists 1,3,1,1 -> within 2: three pairs
    r = near_search(docs, "doc_id", "text", "a", "b", 2).collect()[0]
    assert (r["min_dist"], r["pairs_within"]) == (1, 3)
