"""Round-5 ADVICE fixes: degenerate A/B splits keep the one-row contract,
HITS rejects iters=0, and the densified-bloom literal cache is keyed on
bloom identity (not the path-based semanticHash) so a rebuilt artifact at
the same path cannot serve a stale bitset."""

import pytest

from pyspark.sql import functions as F


def test_value_blocks_counts_partition_rows(spark):
    """Block counters must partition the input exactly: sum of per-block
    counts == row count, and conditional counters sum to their class
    sizes, for arbitrary integer multisets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mcpvectordb_spark.operators.blocks import value_blocks

    @settings(max_examples=6, deadline=None)
    @given(vals=st.lists(st.tuples(st.integers(-50, 50), st.integers(0, 1)),
                         min_size=1, max_size=80))
    def prop(vals):
        df = spark.createDataFrame(vals, "v long, g int")
        blocks = value_blocks(
            df,
            "v",
            counters={
                "c": F.count(F.lit(1)),
                "c0": F.sum(F.when(F.col("g") == 0, 1).otherwise(0)),
            },
        ).collect()
        assert sum(b["c"] for b in blocks) == len(vals)
        assert sum(b["c0"] for b in blocks) == sum(1 for _, g in vals if g == 0)
        assert len(blocks) == len({v for v, _ in vals})
        assert all(b["c"] == b["c0"] + sum(1 for v, g in vals
                                           if v == b["v"] and g == 1)
                   for b in blocks)

    prop()


def test_value_blocks_scale_quantizes(spark):
    from mcpvectordb_spark.operators.blocks import value_blocks

    df = spark.createDataFrame(
        [(0.1234567,), (0.1234568,), (0.9999999,)], "p double"
    )
    blocks = {
        b["pq"]: b["c"]
        for b in value_blocks(df, "p", scale=1_000_000, val_alias="pq").collect()
    }
    # both 0.1234567 and 0.1234568 round to 123457 on the 1e-6 grid
    assert blocks == {123457: 2, 1000000: 1}


def test_value_blocks_guard_raises_over_bound(spark):
    from mcpvectordb_spark.operators.blocks import value_blocks

    df = spark.range(100).select(F.col("id").alias("v"))
    ok = value_blocks(df, "v", max_blocks=100)
    assert ok.count() == 100  # at the bound: passes
    bad = value_blocks(df, "v", max_blocks=99)
    with pytest.raises(Exception, match="max_blocks"):
        bad.collect()


def test_readme_counts_pinned_to_registry():
    """README catalog counts are a GENERATED artifact (round-4 verdict #4):
    tools/refresh_readme_counts.py --check must find them current, so a
    query landing without a refresh fails the suite instead of shipping a
    stale README."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(root / "tools/refresh_readme_counts.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


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
