"""Custom stateful streaming operators via ``applyInPandasWithState``.

Two engine-relevant operators:

- :func:`dedup_stream` — cross-micro-batch exact dedup: state is one flag
  per content hash; only the first occurrence of each hash ever crosses the
  operator.  The streaming twin of the ingest dedup gate (reference
  ingestor.py:181-209), with state sharded by key across executors.
- :func:`user_totals_stream` — per-user cumulative counters (count, sum)
  emitted per micro-batch — the custom-aggregate shape that built-in
  streaming aggs can't express when update logic is imperative.

State scale: both shard by group key over the state store (RocksDB in a
real deployment); nothing accumulates on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout


def dedup_stream(
    stream: DataFrame,
    hash_col: str = "content_hash",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Emit only the first-ever row per ``hash_col`` across ALL micro-batches.

    Within a micro-batch, ``order_cols`` picks the deterministic winner
    (smallest tuple) — post-shuffle group order is NOT arrival order, so
    without it the surviving row of a same-batch collision is arbitrary.
    """
    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def first_only(key, pdfs, state):
        import pandas as pd

        if not state.exists:
            batch = pd.concat(list(pdfs), ignore_index=True)
            if len(batch) > 0:
                if order_cols:
                    batch = batch.sort_values(order_cols, kind="mergesort")
                yield batch.head(1)
        else:
            for _ in pdfs:  # drain the iterator; everything is a known dup
                pass
        state.update((True,))

    return stream.groupBy(hash_col).applyInPandasWithState(
        first_only, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def user_totals_stream(stream: DataFrame, key_col: str = "user_id",
                       value_col: str = "value") -> DataFrame:
    """Per-key running totals across micro-batches: emits one row per key
    per batch with the cumulative (n_events, total_value) so far."""
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])

    def accumulate(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        emitted = False
        for pdf in pdfs:
            if len(pdf) > 0:
                n += len(pdf)
                total += float(pdf[value_col].sum())
                emitted = True
        state.update((n, total))
        if emitted:
            yield pd.DataFrame([{"user_id": key[0], "n_events": n, "total_value": round(total, 4)}])

    return stream.groupBy(key_col).applyInPandasWithState(
        accumulate, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
