"""Incremental view maintenance (IVM) for equi-join views.

Given a materialized inner-join view ``V = A ⋈ B`` and per-table deltas
(insert and delete row sets), compute the view delta WITHOUT recomputing
``A' ⋈ B'`` — the classic counting-free delta algebra (Blakeley, Larson
& Tompa, SIGMOD 1986) for key-unique tables:

    ΔV⁺ = iA ⋈ B'  ∪  (A' − iA) ⋈ iB      -- every new view row touches a
    ΔV⁻ = dA ⋈ B   ∪  (A − dA) ⋈ dB       -- new base row exactly once

The two union legs partition the delta (the second leg excludes the
first leg's rows), so no dedup pass is needed.  Updates are expressed as
delete-old + insert-new, the standard CDC decomposition.

Requirements: each input row set is duplicate-free and ``del ⊆ base``
(key-unique tables satisfy both).  The reference recomputes its stores
wholesale on every replace (/root/reference/src/mcpvectordb/ingest flow);
this is the scale path that makes a 100 TB materialized join refreshable
in O(|delta|) instead of O(|base|).

Scale shape: all four joins pair a DELTA (small, broadcastable) against
a base — at typical CDC rates the whole refresh is four broadcast joins
and never shuffles the big tables.  The ``(A' − iA)`` / ``(A − dA)``
operands are anti-joins on the delta keys, pushed below the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_join_delta(
    base_a: DataFrame,
    ins_a: DataFrame,
    del_a: DataFrame,
    base_b: DataFrame,
    ins_b: DataFrame,
    del_b: DataFrame,
    key_a: str,
    key_b: str,
    pk_a: str,
    pk_b: str,
) -> DataFrame:
    """View delta of ``A ⋈ B on key_a = key_b`` under the given deltas.

    ``pk_a``/``pk_b`` are the tables' ROW identities (delete subtraction
    keys) — distinct from the join keys: subtracting dA on the JOIN key
    would also drop untouched rows that merely share a join partner with
    a deleted row.

    Returns the union of inserted rows tagged ``op='ins'`` and deleted
    rows tagged ``op='del'``, with all columns of both tables (the view's
    natural projection; callers select/rename afterwards).
    """
    a_keep = base_a.join(del_a.select(pk_a), pk_a, "left_anti")
    b_keep = base_b.join(del_b.select(pk_b), pk_b, "left_anti")
    b_new = b_keep.unionByName(ins_b)

    cond_old = F.col(key_a) == F.col(key_b)

    ins1 = ins_a.join(b_new, cond_old)
    ins2 = a_keep.join(ins_b, cond_old)
    del1 = del_a.join(base_b, cond_old)
    del2 = a_keep.join(del_b, cond_old)

    return (
        ins1.unionByName(ins2)
        .withColumn("op", F.lit("ins"))
        .unionByName(del1.unionByName(del2).withColumn("op", F.lit("del")))
    )


def incremental_agg_delta(
    base: DataFrame,
    ins: DataFrame,
    dels: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental maintenance of a ``groupBy(keys).agg(count, sums)``
    view: returns the POST-update view rows for every key touched by the
    delta (`__cnt` plus one ``sum_<c>`` per sum column), with vanished
    keys (count dropped to 0) omitted.

    The classic signed-delta trick: inserts contribute +1/+x, deletes
    −1/−x, one keyed aggregation over the DELTA only, then a join against
    the old view restricted to touched keys.  The base table is scanned
    ZERO times when the caller passes the materialized view — refresh
    cost is O(|delta| + |touched keys|), not O(|base|).

    ``base`` here is the OLD VIEW (key, __cnt, sum_*), matching what a
    maintenance pipeline persists; build it once with
    ``base_agg_view``.
    """
    signed = ins.select(
        *key_cols, F.lit(1).alias("__w"), *[F.col(c).alias(f"__v_{c}") for c in sum_cols]
    ).unionByName(
        dels.select(
            *key_cols, F.lit(-1).alias("__w"),
            *[F.col(c).alias(f"__v_{c}") for c in sum_cols],
        )
    )
    d = signed.groupBy(*key_cols).agg(
        F.sum("__w").alias("__d_cnt"),
        *[
            F.sum(F.col("__w") * F.col(f"__v_{c}")).alias(f"__d_{c}")
            for c in sum_cols
        ],
    )
    joined = d.join(base, key_cols, "left")
    out_cols = [
        (F.coalesce("__cnt", F.lit(0)) + F.col("__d_cnt")).alias("__cnt"),
        *[
            (F.coalesce(f"sum_{c}", F.lit(0.0)) + F.col(f"__d_{c}")).alias(f"sum_{c}")
            for c in sum_cols
        ],
    ]
    return joined.select(*key_cols, *out_cols).filter(F.col("__cnt") > 0)


def base_agg_view(df: DataFrame, key_cols: list[str], sum_cols: list[str]) -> DataFrame:
    """The materialized view shape incremental_agg_delta maintains."""
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
