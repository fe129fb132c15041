"""As-of (most-recent-prior) join — an operator Spark lacks natively.

For each left row, attach the latest right row with ``right_ts <= left_ts``
within the same key — the canonical time-series enrichment (trade↔quote,
event↔last-login).  Implemented as composition of built-in ops (preference
(a) of the custom-operator ladder): tag both sides, union, and carry the
last-seen right values forward with a window — ONE shuffle on the key,
no range explosion, no per-group Python.

Scale: the union shuffles once on (key); the window is a linear pass per
key partition.  Skewed keys behave like any window partition (AQE handles
residual skew); memory is O(carried columns), not O(window frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the nearest right row at-or-before
    it (``direction="backward"``, default) or at-or-after it
    (``"forward"``) — the full pandas ``merge_asof`` surface, one keyed
    shuffle either way.

    ``tolerance_s`` bounds the match distance in seconds: a nearest right
    row farther than the tolerance is discarded (attached columns revert
    to NULL), exactly pandas' ``tolerance`` semantics.

    Right columns arrive as ``{prefix}{col}`` (plus ``{prefix}ts``); rows
    with no qualifying right match keep them NULL (left-join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in key_cols and c != right_ts
    ]

    # The matched right row is carried as ONE struct: carrying columns
    # independently with last(ignorenulls) would stitch together values
    # from DIFFERENT right rows whenever a right column contains NULL
    # (the as-of match must attach the latest row wholesale).
    packed = F.struct(
        F.col(right_ts).alias("ts"),
        *[F.col(c).alias(c) for c in right_value_cols],
    )
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),  # right sorts before left at equal ts → "<="
        packed.alias("__match"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns if c not in key_cols],
    )
    l = left.select(
        *key_cols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(dict(r.dtypes)["__match"]).alias("__match"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in key_cols],
    )
    # __match in the ordering breaks ties among right rows sharing
    # (key, ts) deterministically (struct compare is lexicographic);
    # left rows have NULL __match and need no disambiguation.
    # forward = the same carry in reverse time order ("at-or-after").
    order = (
        [F.col("__t"), F.col("__side"), F.col("__match")]
        if direction == "backward"
        else [F.col("__t").desc(), F.col("__side"), F.col("__match").desc()]
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = r.unionByName(l).withColumn(
        "__match", F.last("__match", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1).drop("__side")
    if tolerance_s is not None:
        gap = (
            F.col("__t").cast("double") - F.col("__match.ts").cast("double")
            if direction == "backward"
            else F.col("__match.ts").cast("double") - F.col("__t").cast("double")
        )
        out = out.withColumn(
            "__match",
            F.when(gap <= F.lit(float(tolerance_s)), F.col("__match")),
        )
    out = out.drop("__t")
    out = out.withColumn(f"{prefix}ts", F.col("__match.ts"))
    for c in right_value_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"__match.{c}"))
    out = out.drop("__match")
    for c in left.columns:
        if c not in key_cols:
            out = out.withColumnRenamed(f"__l_{c}", c)
    return out
