"""Multinomial Naive Bayes train/classify (operators/classify.py)."""

from pyspark.sql import functions as F

from mcpvectordb_spark.operators.classify import nb_classify, nb_train


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_nb_separable_classes(spark):
    df = _corpus(spark, [
        (1, "en", "the quick brown fox and the lazy dog"),
        (2, "en", "a dog and a fox in the garden"),
        (3, "fr", "le renard brun et le chien paresseux"),
        (4, "fr", "un chien et un renard dans le jardin"),
    ])
    model = nb_train(df, "lang", "text")
    out = {r["id"]: r["predicted"] for r in nb_classify(df, "doc_id", "text", model).collect()}
    assert out == {1: "en", 2: "en", 3: "fr", 4: "fr"}


def test_nb_oov_terms_are_dropped(spark):
    train = _corpus(spark, [
        (1, "a", "apple apple banana"),
        (2, "b", "carrot carrot daikon"),
    ])
    model = nb_train(train, "lang", "text")
    probe = spark.createDataFrame(
        [(10, "apple zzz-unseen-word"), (11, "apple")], "doc_id long, text string"
    )
    rows = {r["id"]: r for r in nb_classify(probe, "doc_id", "text", model).collect()}
    assert rows[10]["predicted"] == "a" and rows[11]["predicted"] == "a"
    # the OOV token contributed nothing: identical scores
    assert rows[10]["score"] == rows[11]["score"]


def test_nb_tie_breaks_to_first_label(spark):
    train = _corpus(spark, [
        (1, "x", "shared word"),
        (2, "y", "shared word"),
    ])
    model = nb_train(train, "lang", "text")
    probe = spark.createDataFrame([(9, "shared")], "doc_id long, text string")
    r = nb_classify(probe, "doc_id", "text", model).first()
    assert r["predicted"] == "x"  # perfectly symmetric → lexicographic tie-break


def test_nb_priors_shift_ambiguous_docs(spark):
    # 'common' appears equally in both classes; class 'big' has 3 docs vs 1
    train = _corpus(spark, [
        (1, "big", "common alpha"),
        (2, "big", "common beta"),
        (3, "big", "common gamma"),
        (4, "sml", "common delta"),
    ])
    model = nb_train(train, "lang", "text")
    probe = spark.createDataFrame([(9, "common")], "doc_id long, text string")
    assert nb_classify(probe, "doc_id", "text", model).first()["predicted"] == "big"


def test_nb_real_corpus_beats_majority_baseline(spark):
    """Self-train/self-classify on the synthetic documents table.  The
    synthetic 'languages' share most vocabulary (markers are sparse), so
    the meaningful bar is the majority-class baseline: the classifier must
    extract signal beyond the prior, and every class must be predicted at
    least once (it hasn't collapsed to the prior)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = nb_train(docs, "lang", "text")
    pred = nb_classify(docs, "doc_id", "text", model)
    joined = pred.join(docs.select(F.col("doc_id").alias("id"), "lang"), "id")
    n = joined.count()
    correct = joined.filter(F.col("predicted") == F.col("lang")).count()
    majority = max(r["count"] for r in docs.groupBy("lang").count().collect())
    assert n > 0 and correct / n > majority / n, (correct, majority, n)
    assert joined.select("predicted").distinct().count() == 5
