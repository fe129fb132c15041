"""Round-5 ADVICE fixes: degenerate A/B splits keep the one-row contract,
HITS rejects iters=0, and the densified-bloom literal cache is keyed on
bloom identity (not the path-based semanticHash) so a rebuilt artifact at
the same path cannot serve a stale bitset."""

import pytest

from pyspark.sql import functions as F


def test_ab_test_ztest_degenerate_one_variant(spark):
    """A split where every user hashes to one variant must still return a
    single readout row with n=0 counts for the missing variant (ADVICE r4:
    the old 1-row x 0-row crossJoin silently returned zero rows)."""
    from mcpvectordb_spark.operators.stats import ab_assign, ab_test_ztest

    # find user ids that all land in variant 0 under the default salt
    ids = spark.range(500).select(
        "id", ab_assign(F.col("id")).alias("v")
    ).filter(F.col("v") == 0).limit(20).collect()
    assert ids, "expected some variant-0 users in 500"
    rows = [(r["id"], "purchase") for r in ids]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = ab_test_ztest(df, "purchase").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] == len(rows) and r["x_a"] == len(rows)
    assert r["n_b"] == 0 and r["x_b"] == 0
    assert r["rate_b"] == 0.0 and r["z"] == 0.0


def test_ab_test_ztest_empty_events(spark):
    from mcpvectordb_spark.operators.stats import ab_test_ztest

    df = spark.createDataFrame([], "user_id long, event_type string")
    out = ab_test_ztest(df, "purchase").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (0, 0, 0, 0)
    assert r["z"] == 0.0


def test_hits_rejects_zero_iters(spark):
    from mcpvectordb_spark.operators.graph import hits_scores

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iters >= 1"):
        hits_scores(edges, iters=0)


def test_dense_bloom_cache_not_fooled_by_same_path(spark, tmp_path):
    """Rebuild a bloom with DIFFERENT content at the SAME path: the probe
    must see the new bitset.  semanticHash() is path-based for parquet
    scans, so the old cache key collided here and served the stale
    densified literal — silent false negatives in decontamination."""
    from mcpvectordb_spark.operators.curation import (
        bloom_base_hashes,
        bloom_prune_hashed,
        build_shingle_bloom,
        load_bloom,
        save_bloom,
    )
    import os
    import time

    path = str(tmp_path / "bloom")
    n_bits, k = 4096, 3

    def probe_hits(items, bloom):
        h1, h2 = bloom_base_hashes(F.col("x"))
        df = spark.createDataFrame([(x,) for x in items], "x string").select(
            "x", h1.alias("h1"), h2.alias("h2")
        )
        return {
            r["x"]
            for r in bloom_prune_hashed(df, "h1", "h2", bloom, n_bits, k).collect()
        }

    first = spark.createDataFrame([("alpha",), ("beta",)], "x string")
    save_bloom(build_shingle_bloom(first, "x", n_bits, k), path, n_bits, k)
    b1 = load_bloom(spark, path, n_bits, k)
    assert "alpha" in probe_hits(["alpha", "zzz-not-there"], b1)

    # rebuild at the SAME path with disjoint content; bump mtime so the
    # mtime-keyed load cache re-reads (sub-second rebuilds can tie)
    second = spark.createDataFrame([("gamma",), ("delta",)], "x string")
    save_bloom(build_shingle_bloom(second, "x", n_bits, k), path, n_bits, k)
    os.utime(os.path.join(path, "_SUCCESS"), (time.time() + 5, time.time() + 5))
    b2 = load_bloom(spark, path, n_bits, k)
    hits = probe_hits(["alpha", "beta", "gamma", "delta"], b2)
    assert "gamma" in hits and "delta" in hits, "new bloom content must hit"
    # alpha/beta may incidentally collide into the new bitset, but the old
    # guaranteed-present pair must not BOTH survive a disjoint rebuild
    assert not ({"alpha", "beta"} <= hits), "stale densified bitset served"
