"""Bloom semi-join reduction for large ⋈ selective joins.

When a fact table joins a dim whose *filtered* key set is small but the
dim itself is too large (or too late-materialized) to broadcast, the
classic scale move is a Bloom semi-join: hash the dim keys into a
kilobyte bitset, map-side prune the fact BEFORE its shuffle, then run
the exact join on the survivors.  No false negatives → the join result
is bit-identical to the un-pruned plan; the win is that the fact
shuffle carries only rows that can possibly match.

Spark's AQE has a runtime form of this
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator is
the *deterministic, parity-testable* form, built on the same
Kirsch–Mitzenmacher double-hashed bitset as the decontamination bloom
(`curation.build_shingle_bloom` — (word_idx, bits) table, densified into
a plan literal inside one whole-stage-codegen filter, no extra joins or
broadcast exchanges).

100 TB shape: the bitset build scans only the dim's key column (pushdown
prunes the rest); the probe adds zero shuffles — two md5s + k integer
probes inside the fact's scan stage; the exact join afterwards shuffles
the reduced fact.  The catalog gate (`orders_bloom_join`) compares the
bloom path against the PLAIN join oracle — proving losslessness, not
just plausibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.curation import bloom_prune, build_shingle_bloom


def bloom_reduce(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    n_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Prune ``fact`` to rows whose ``fact_key`` MIGHT appear in
    ``dim_keys[dim_key]`` — a superset of true matches (no false
    negatives), so any exact join on the survivors is unchanged.  Keys
    hash via their canonical string form; both sides must cast the same
    way (handled here for both)."""
    keys = dim_keys.select(F.col(dim_key).cast("string").alias("__bk"))
    bloom = build_shingle_bloom(keys, "__bk", n_bits, k)
    pruned = bloom_prune(
        fact.withColumn("__bk", F.col(fact_key).cast("string")), "__bk", bloom, n_bits, k
    )
    return pruned.drop("__bk")


def bloom_reduce_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    n_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Exact join with a Bloom pre-prune of the fact side.  Result ==
    ``fact.join(dim, fact[fact_key] == dim[dim_key], how)`` for inner /
    left_semi joins (the only shapes where dropping non-matching fact
    rows early is sound)."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom pre-prune is only sound for inner/left_semi, got {how!r}")
    pruned = bloom_reduce(fact, fact_key, dim.select(dim_key), dim_key, n_bits, k)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
