"""Bucketed co-located join: same results as the plain join, and the plan
over two same-bucketed tables contains NO shuffle exchange."""

import pytest
from pyspark.sql import functions as F

from mcpvectordb_spark.io import load_table
from mcpvectordb_spark.plans.explain import formatted_plan
from mcpvectordb_spark.sources.bucketed import read_table, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_pair(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "source", "n_chars")
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    write_bucketed(docs, "b_docs", ["doc_id"], 8, sort_cols=["doc_id"])
    write_bucketed(emb, "b_emb", ["doc_id"], 8, sort_cols=["doc_id"])
    yield docs, emb
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_emb")


def test_bucketed_join_is_shuffle_free_and_correct(spark, bucketed_pair):
    docs, emb = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the merge join path (the 100 TB shape, where
        # neither side broadcasts) is what gets planned
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "b_docs").join(read_table(spark, "b_emb"), "doc_id")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan

        want = docs.join(emb, "doc_id").count()
        assert joined.count() == want > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_sorted_join_needs_no_per_task_sort(spark, bucketed_pair):
    """one_file_per_bucket + sortBy + outputOrdering flag ⇒ Spark trusts
    the on-disk order: the merge join plans with neither Exchange nor Sort
    operators (Spark only honors bucket sort order when each bucket is a
    single file, which write_bucketed arranges)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        joined = read_table(spark, "b_docs").join(read_table(spark, "b_emb"), "doc_id")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        assert "Sort (" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
