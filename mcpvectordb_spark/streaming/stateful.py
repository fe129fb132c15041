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


# ---------------------------------------------------------------------------
# Streaming heavy hitters: per-pseudo-partition Misra–Gries state


def mg_update(counters: dict, keys, capacity: int) -> dict:
    """One sequential Misra–Gries pass.  Shared by the streaming operator
    and its batch twin so stream-vs-batch equality tests the STREAMING
    machinery, not two implementations of the sketch.  Any processing
    order is a valid MG run (the ≤ N/capacity undercount bound holds
    regardless); callers that need determinism sort their keys first."""
    for k in keys:
        if k in counters:
            counters[k] += 1
        elif len(counters) < capacity:
            counters[k] = 1
        else:
            dead = [kk for kk in counters if counters[kk] == 1]
            for kk in counters:
                counters[kk] -= 1
            for kk in dead:
                del counters[kk]
    return counters


def _mg_out_state_schemas():
    out_schema = T.StructType([
        T.StructField("pkey", T.IntegerType()),
        T.StructField("key", T.LongType()),
        T.StructField("mg_count", T.LongType()),
        T.StructField("n_processed", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("keys", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
    ])
    return out_schema, state_schema


def heavy_hitters_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    capacity: int = 64,
    partitions: int = 8,
) -> DataFrame:
    """Cross-batch streaming heavy hitters: the stream shards into
    ``partitions`` pseudo-partitions (hash of the key), each holding ONE
    capacity-bounded Misra–Gries counter table as state — the exact
    mergeable-partials shape of the batch operator's first pass
    (operators/sketches.py), kept alive across micro-batches.

    Emits every partition's current candidate set each batch:
    (pkey, key, mg_count, n_processed).  Guarantees (classic MG): every
    key with true count > n_processed/capacity IS present, and
    mg_count ∈ [true − n_processed/capacity, true].  Unlike batch,
    streaming cannot recount exactly — the bound is the contract.

    State is O(capacity) per partition and shards across the state store;
    keys are processed in sorted order within each (batch, partition) so a
    single-batch stream is bit-equal to the batch twin."""
    from pyspark.sql import functions as F

    out_schema, state_schema = _mg_out_state_schemas()

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            ks, cs, n = state.get
            counters = dict(zip(ks, cs))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            vals = sorted(pdf["key"].tolist())
            n += len(vals)
            mg_update(counters, vals, capacity)
        state.update((list(counters.keys()), list(counters.values()), n))
        yield pd.DataFrame(
            [(key[0], k, c, n) for k, c in sorted(counters.items())],
            columns=["pkey", "key", "mg_count", "n_processed"],
        )

    shard = stream.select(
        F.pmod(F.hash(F.col(key_col)), F.lit(partitions)).cast("int").alias("pkey"),
        F.col(key_col).alias("key"),
    )
    return shard.groupBy("pkey").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def heavy_hitters_batch_twin(
    df: DataFrame,
    key_col: str = "user_id",
    capacity: int = 64,
    partitions: int = 8,
) -> DataFrame:
    """The same sharded-MG pass over a closed DataFrame (shared
    :func:`mg_update` kernel, same sorted order) — what the stream's state
    must equal after processing identical data in one micro-batch."""
    from pyspark.sql import functions as F

    def run(pdf):
        import pandas as pd

        counters = mg_update({}, sorted(pdf["key"].tolist()), capacity)
        pkey = int(pdf["pkey"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            [(pkey, k, c, len(pdf)) for k, c in sorted(counters.items())],
            columns=["pkey", "key", "mg_count", "n_processed"],
        )

    shard = df.select(
        F.pmod(F.hash(F.col(key_col)), F.lit(partitions)).cast("int").alias("pkey"),
        F.col(key_col).alias("key"),
    )
    return shard.groupBy("pkey").applyInPandas(
        run, schema="pkey int, key long, mg_count long, n_processed long"
    )


def attribution_stream(
    stream: DataFrame,
    conversion_type: str,
    lookback_s: int = 7 * 86400,
) -> DataFrame:
    """Streaming last-touch attribution via ``applyInPandasWithState``:
    per-user state = the most recent non-conversion touch (type, epoch
    second); each conversion emits (user, conv_id, channel, v) where
    channel is the stored touch within ``lookback_s``, else 'direct'.

    The input columns are pre-projected (user, eid, t, etype, v) — the
    same shape analytics.last_touch_attribution builds — and micro-batches
    must arrive in time order per user (file-ordered time-split batches,
    as in the other stateful queries); within a batch rows are sorted by
    (t, eid), so the streaming output equals the batch window operator
    exactly (asserted in tests AND by the catalog oracle — this is the
    repo's first stream query with a full SQL oracle).
    """
    out_schema = T.StructType([
        T.StructField("user", T.LongType()),
        T.StructField("conv_id", T.LongType()),
        T.StructField("channel", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("touch_type", T.StringType()),
        T.StructField("touch_t", T.LongType()),
    ])

    def update(key, pdfs, state):
        import pandas as pd

        tt, t_t = state.get if state.exists else ("", -1)
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) > 0:
            batch = batch.sort_values(["t", "eid"], kind="mergesort")
            for r in batch.itertuples():
                if r.etype == conversion_type:
                    ch = tt if (tt and t_t >= 0 and r.t - t_t <= lookback_s) else "direct"
                    rows.append((int(key[0]), int(r.eid), ch, float(r.v)))
                else:
                    tt, t_t = str(r.etype), int(r.t)
        state.update((tt, t_t))
        if rows:
            yield pd.DataFrame(rows, columns=["user", "conv_id", "channel", "v"])

    return stream.groupBy("user").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def ewma_stream(
    stream: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    alpha: float = 0.3,
) -> DataFrame:
    """Streaming recursive EWMA: per key, ``s = α·x + (1-α)·s_prev``
    folded over values in ``order_cols`` order WITHIN each micro-batch,
    with the carried smoothed value as the only cross-batch state — the
    stream twin of the batch F.aggregate fold (catalog
    events_ewma_recursive).  Emits one row per key per batch:
    (key, n_seen, ewma).

    State is one (count, ewma) pair per key — bounded regardless of
    stream length, sharded over the state store.  For in-order sources
    (e.g. file batches) the result is EXACTLY the batch fold over the
    concatenated series; the batch-twin test pins that equality.
    """
    out_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ])
    o1, o2 = order_cols

    def fold(key, pdfs, state):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        emitted = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values([o1, o2], kind="mergesort")
            for x in pdf[value_col].astype(float):
                s = x if n == 0 else alpha * x + (1.0 - alpha) * s
                n += 1
            emitted = True
        state.update((n, s))
        if emitted:
            yield pd.DataFrame([{"key": key[0], "n_seen": n, "ewma": s}])

    return stream.groupBy(key_col).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def holt_stream(
    stream: DataFrame,
    key_col: str = "k",
    t_col: str = "t",
    x_col: str = "x",
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Streaming Holt double exponential smoothing: the (level, trend)
    recursion of ``timeseries.holt_linear`` carried ACROSS micro-batches
    as per-key group state — the live view of the same model the batch
    fold fits offline (same l/b/fitted contract, same binary-exact
    default constants, so stream == batch twin bit-for-bit on ordered
    input).  Within a micro-batch rows fold in t order; across batches
    the caller feeds non-decreasing t per key (the daily-aggregate
    contract — there is no watermark reordering here).

    Emits one row per observation: (k, t, x, level, trend, fitted) where
    fitted is the one-step-ahead forecast made BEFORE seeing x — at
    n = 1 the convention fitted = x of ``holt_linear`` applies.  State
    per key is three scalars, so 100 TB of history costs the same state
    as one day.
    """
    out_schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("t", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("fitted", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("l", T.DoubleType()),
        T.StructField("b", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ])
    a, bb = float(alpha), float(beta)

    def update(key, pdfs, state):
        import pandas as pd

        l, b, n = state.get if state.exists else (0.0, 0.0, 0)
        rows = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(t_col)
            for t, x in zip(pdf[t_col], pdf[x_col]):
                x = float(x)
                if n == 0:
                    l, b, fitted = x, 0.0, x
                else:
                    fitted = l + b
                    l_new = a * x + (1.0 - a) * (l + b)
                    b = bb * (l_new - l) + (1.0 - bb) * b
                    l = l_new
                n += 1
                rows.append(
                    {"k": key[0], "t": int(t), "x": x,
                     "level": l, "trend": b, "fitted": fitted}
                )
        state.update((l, b, n))
        if rows:
            yield pd.DataFrame(rows)

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
