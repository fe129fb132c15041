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
