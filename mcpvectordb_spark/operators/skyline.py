"""2-D skyline (Pareto frontier) via the sort-scan algorithm.

``skyline(df, minimize=A, maximize=B)``: rows not DOMINATED — no other row
with A' <= A and B' >= B and at least one strict.  Börzsönyi et al. (ICDE
2001) call the naive form a nested-loop over all pairs, O(n²); the classic
fix is one sort by A with a running max of B:

    dominated(r)  ⇔  max{B' : A' <  A(r)} >= B(r)      (strictly better A)
                   ∨ max{B' : A' == A(r)} >  B(r)      (same A, better B)

Both maxima are RANGE-frame window aggregates over the A ordering, so the
whole operator is one sort + two window passes — no join at all.  The
catalog oracle is the naive NOT EXISTS dominance test, proving the window
formulation exact.

Scale: a global window means a single-partition sort at the window stage;
for 100 TB inputs pre-aggregate to the candidate set first (any row below
the per-partition running max can be dropped map-side — the standard
skyline pre-filter) or partition by a coarse A-range and stitch.  The
operator applies the per-partition pre-filter automatically: a row
dominated WITHIN its input partition is dominated globally, so the global
sort only sees each partition's local frontier (size O(distinct A) not
O(rows)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Rows on the Pareto frontier: minimize ``min_col``, maximize
    ``max_col``.  Requires an integer-comparable ``min_col`` (RANGE frame
    key); ties kept (all non-dominated rows emitted)."""
    a, b = F.col(min_col), F.col(max_col)

    # map-side pre-filter: local frontier per partition (sort-free — uses
    # a running max over the partition after a local sort)
    local = Window.partitionBy(F.spark_partition_id()).orderBy(a.asc(), b.desc())
    pre = (
        df.withColumn(
            "__lmax", F.max(b).over(local.rowsBetween(Window.unboundedPreceding, -1))
        )
        # conservative: only STRICT local domination (lmax > b) drops a row,
        # so exact (A,B) duplicate frontier rows survive to the global pass
        .filter(F.coalesce(F.col("__lmax") <= b, F.lit(True)))
        .drop("__lmax")
    )

    strict = Window.orderBy(a.asc()).rangeBetween(Window.unboundedPreceding, -1)
    same = Window.orderBy(a.asc()).rangeBetween(Window.unboundedPreceding, 0)
    return (
        pre.withColumn("__mlt", F.max(b).over(strict))
        .withColumn("__mle", F.max(b).over(same))
        .filter(
            F.coalesce(F.col("__mlt") < b, F.lit(True)) & (F.col("__mle") <= b)
        )
        .drop("__mlt", "__mle")
    )
