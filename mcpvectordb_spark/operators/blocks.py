"""The VALUE-BLOCK pattern, promoted to a shared helper (round-4 verdict
item #6 — previously hand-rolled in >=8 operators).

Every exact rank/CDF/concentration statistic in this engine avoids
per-row global sorts the same way: collapse the corpus to VALUE BLOCKS
— one row per distinct (group, value) with exact integer counters — and
run the ordered window over the block table only.  The corpus-sized pass
is a single map-side-combinable groupBy; the single-partition WindowExec
everyone warns about runs over <= ``max_blocks`` rows BY CONSTRUCTION,
never corpus rows.  That construction bound is what makes the pattern
safe at 100 TB, so this helper enforces it IN-PLAN: if the block table
exceeds ``max_blocks`` the query RAISES at execution time instead of
silently building a corpus-sized window.

Used by: mann_whitney_u, ks_two_sample, gini_concentration,
quantile_normalize (stats.py); binary_eval / reliability_table /
pr_curve via _prob_blocks, isotonic_calibration (modeleval.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# The documented ceiling for every window-over-blocks operator.  The
# 1e-6 probability grid occupies <= QUANT+1 values and cent-quantized
# currency domains run low-millions — all trivially windowable on one
# partition (a 4M-row block sort is ~tens of MB).  What the guard exists
# to catch is the FAILURE mode: an unquantized double column whose
# distinct count tracks corpus rows (billions at 100 TB).
MAX_BLOCKS = 4_000_000


def value_blocks(
    df: DataFrame,
    val,
    *,
    counters: dict[str, Column] | None = None,
    group_cols: tuple[str, ...] = (),
    scale: float | None = None,
    val_alias: str = "v",
    max_blocks: int | None = MAX_BLOCKS,
) -> DataFrame:
    """Collapse ``df`` to value blocks: one row per distinct
    (``group_cols``..., value) carrying the aggregate ``counters``
    (default: a single exact row count ``c``).

    ``val`` is a column name or Column; ``scale`` quantizes it first
    (``round(val * scale)`` cast to long — the lr_eval probability-grid
    move, which is ALSO what bounds the distinct domain at corpus scale).

    ``max_blocks`` attaches an in-plan guard: the first counter column
    raises at execution time if the block table exceeds the bound, so a
    mis-quantized caller fails loudly instead of feeding a corpus-sized
    table to its single-partition window.  Pass ``None`` to skip (e.g.
    when a caller enforces its own tighter bound).
    """
    v = F.col(val) if isinstance(val, str) else val
    if scale is not None:
        v = F.round(v * F.lit(scale)).cast("long")
    if counters is None:
        counters = {"c": F.count(F.lit(1))}
    aggs = [expr.alias(name) for name, expr in counters.items()]
    blocks = df.groupBy(*group_cols, v.alias(val_alias)).agg(*aggs)
    if max_blocks is None:
        return blocks
    # In-plan bound: count the whole block table with an unbounded window
    # (over blocks — cheap by the same argument as the callers' windows)
    # and thread the check through the FIRST counter column, which every
    # downstream aggregate reads — so column pruning cannot drop it.
    first = next(iter(counters))
    n_blocks = F.count(F.lit(1)).over(Window.partitionBy())
    guarded = F.when(n_blocks <= F.lit(max_blocks), F.col(first)).otherwise(
        F.raise_error(
            F.lit(
                f"value_blocks: block count exceeds max_blocks={max_blocks} "
                "— quantize the value column (scale=...) before windowing"
            )
        ).cast(blocks.schema[first].dataType)
    )
    return blocks.withColumn(first, guarded)
