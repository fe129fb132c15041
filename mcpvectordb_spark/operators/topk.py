"""Top-k helpers.

The reference's top-k (/root/reference/src/mcpvectordb/store.py:296-320) is
global; at scale the per-group variant (window + row_number) matters too.
Global ``orderBy().limit(k)`` compiles to TakeOrderedAndProject (per-partition
heap of k, single tiny merge — no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: list[str] | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    order += [F.asc(c) for c in (tie_cols or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
