"""Data-quality audit: a Deequ/dbt-tests-style constraint report computed
in ONE scan of the audited table.

Every check is an aggregate expression fused into a single aggregation —
completeness (null counts), uniqueness (exact distinct), domain (range
min/max, set membership), and column statistics — so auditing a 100 TB
table costs one pass with map-side partial aggregation, not one job per
rule.  Referential integrity is the one check that inherently needs a
second relation: an anti-join counted against the dimension (broadcast
when small).

Output is long-form (constraint, column, value, ok) so rule engines can
diff reports across runs and alert on regressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    completeness: list[str],
    unique: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    memberships: dict[str, list[str]] | None = None,
) -> DataFrame:
    """One-scan constraint report: (constraint, column, value, ok).

    - ``completeness``: null count per column (ok when 0);
    - ``unique``: duplicate count = n - countDistinct (ok when 0;
      exact, not approximate — uniqueness is a correctness property);
    - ``ranges``: rows outside [lo, hi] (ok when 0);
    - ``memberships``: rows outside the allowed value set (ok when 0).

    All checks compile into ONE aggregation; the result is |checks| rows
    unpivoted from that single row.
    """
    unique = unique or []
    ranges = ranges or {}
    memberships = memberships or {}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    names: list[tuple[str, str]] = []
    for c in completeness:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"null__{c}"))
        names.append(("completeness", c))
    for c in unique:
        aggs.append(
            (F.count(c) - F.countDistinct(c)).cast("long").alias(f"dup__{c}")
        )
        names.append(("uniqueness", c))
    for c, (lo, hi) in ranges.items():
        aggs.append(
            F.sum(((F.col(c) < lo) | (F.col(c) > hi)).cast("long")).alias(f"range__{c}")
        )
        names.append(("range", c))
    for c, allowed in memberships.items():
        aggs.append(
            F.sum((~F.col(c).isin(allowed)).cast("long")).alias(f"member__{c}")
        )
        names.append(("membership", c))
    row = df.agg(*aggs)
    prefix = {"completeness": "null", "uniqueness": "dup", "range": "range", "membership": "member"}
    # unpivot IN-PLAN via one exploded struct array: unioning one select per
    # rule would re-reference the aggregate subtree per rule and Catalyst
    # would replay the SCAN once per rule (caught by the plan pin) —
    # exactly the |rules|-passes cost this operator exists to avoid
    entries = F.array(
        *[
            F.struct(
                F.lit(kind).alias("constraint"),
                F.lit(c).alias("column"),
                F.col(f"{prefix[kind]}__{c}").alias("value"),
                (F.col(f"{prefix[kind]}__{c}") == 0).alias("ok"),
            )
            for kind, c in names
        ]
    )
    return row.select(F.explode(entries).alias("_e")).select("_e.*")


def dq_referential(
    fact: DataFrame, fk_col: str, dim: DataFrame, pk_col: str
) -> DataFrame:
    """Referential-integrity check: count of fact rows whose foreign key
    has no match in the dimension (anti-join, broadcast-eligible).  One
    row: (constraint, column, value, ok)."""
    orphans = fact.select(F.col(fk_col)).join(
        dim.select(F.col(pk_col).alias(fk_col)), fk_col, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("value")).select(
        F.lit("referential").alias("constraint"),
        F.lit(fk_col).alias("column"),
        "value",
        (F.col("value") == 0).alias("ok"),
    )


def fd_discovery(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Single-attribute functional-dependency discovery (the LHS-size-1
    slice of TANE): for every ordered column pair (A, B), does A -> B
    hold, and if not, how badly is it violated?  The schema-profiling
    step that finds keys, derived columns and denormalized copies
    before a pipeline trusts them.

    `cols` maps attribute name -> a CANONICAL string expression for its
    value (caller quantizes floats / formats dates so the
    representation is engine-portable).  Plan: one select projects the
    canonical values, one explode fans each row into the |cols|^2-|cols|
    ordered pairs (map-only), then TWO keyed aggs: per (pair, a_value)
    count distinct b-values, per pair roll up violations.  g3-style
    error = sum(distinct_b - 1) over LHS groups, normalized by row
    count.  Returns (lhs, rhs, n_lhs_values, n_violating_lhs,
    extra_rhs_values, holds).

    100 TB shape: the fan-out factor is |cols|^2 (schema-sized, not
    data-sized) and both aggs are map-side combinable on (pair, value)
    keys; for wide tables, prune candidate pairs first with HLL
    distinct-count sketches (a column with more distinct values than
    another cannot be determined by it).
    """
    from mcpvectordb_spark.operators.dedup import fan_out

    # hash each canonical value ONCE per (row, attribute) — BEFORE the
    # |cols|^2 explode — and carry attribute IDs as ints: the exploded
    # pair rows shuffle as four fixed-width ints (two 1-digit ids + two
    # 64-bit hashes) instead of four strings, and the hash count drops
    # from 2·|cols|^2 per row to |cols| per row (same groups barring a
    # ~2^-64 collision; the FD verdicts only need group identity, never
    # the value text).  Attribute names rejoin at the very end from a
    # |cols|-element array literal.
    names = list(cols)
    named = [
        F.struct(
            F.lit(i).cast("int").alias("attr"),
            F.xxhash64(expr.cast("string")).alias("val"),
        )
        for i, expr in enumerate(cols.values())
    ]
    # fan_out BEFORE the |cols|^2 explode: a small-file scan yields 1-2
    # partitions and would serialize the whole fan-out on one core
    # (measured 19s -> ~4s at sf0.1)
    rows = fan_out(df.select(F.array(*named).alias("vals")))
    pairs = rows.select(
        F.explode(
            F.flatten(
                F.transform(
                    "vals",
                    lambda a: F.filter(
                        F.transform(
                            "vals",
                            lambda b: F.struct(
                                a["attr"].alias("lhs_i"),
                                a["val"].alias("ah"),
                                b["attr"].alias("rhs_i"),
                                b["val"].alias("bh"),
                            ),
                        ),
                        lambda s: s["lhs_i"] != s["rhs_i"],
                    ),
                )
            )
        ).alias("p")
    ).select("p.lhs_i", "p.ah", "p.rhs_i", "p.bh")
    per_lhs = pairs.groupBy("lhs_i", "rhs_i", "ah").agg(
        F.countDistinct("bh").alias("nb")
    )
    name_arr = F.array(*[F.lit(n) for n in names])
    return (
        per_lhs.groupBy("lhs_i", "rhs_i")
        .agg(
            F.count(F.lit(1)).alias("n_lhs_values"),
            F.sum(F.when(F.col("nb") > 1, 1).otherwise(0)).alias("n_violating_lhs"),
            F.sum(F.col("nb") - 1).alias("extra_rhs_values"),
            (F.max("nb") == 1).alias("holds"),
        )
        .select(
            F.element_at(name_arr, F.col("lhs_i") + 1).alias("lhs"),
            F.element_at(name_arr, F.col("rhs_i") + 1).alias("rhs"),
            "n_lhs_values",
            "n_violating_lhs",
            "extra_rhs_values",
            "holds",
        )
    )
