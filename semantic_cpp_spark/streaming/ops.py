"""Structured Streaming surface — the north-star extension
(BASELINE.json: "Structured Streaming with custom stateful operators").

The reference's windows are count-based over a logical index with no
event time (SURVEY §2.8); its concurrency is a thread pool. This module
supplies what a STREAMING version of that library needs on Spark:

- event-time tumbling/sliding windows (``window()``) and session windows
  (``session_window()``) with ``withWatermark`` lateness handling;
- streaming dedup (``dropDuplicates`` / ``dropDuplicatesWithinWatermark``);
- CUSTOM STATEFUL OPERATORS via ``applyInPandasWithState``:
  - per-key running statistics (Welford count/mean/M2 — the streaming
    form of the reference's variance collector, collector.h:688-760);
  - per-key COUNT-BASED tumbling windows over an unbounded stream — the
    reference's ``tumble`` (semantic.h:910-913) lifted to streaming,
    with explicit buffered-remainder state and eviction on emit.

Batch/stream parity: every operator here has identical batch semantics,
which is how the driver's DuckDB oracle checks them — the streaming query
runs to completion on a memory sink and the result must equal the batch
answer (the exactly-once contract).

Fixture adapter: events.ts has been stored as TIMESTAMP(NANOS)
(surfacing as int64 epoch-nanos via nanosAsLong) or TIMESTAMP(MICROS)
(TIMESTAMP_NTZ) across fixture generations; event_time / t_us derive
via the dtype-adaptive session.event_time_col / session.ts_micros.
"""

from __future__ import annotations

import uuid
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a bounded stream (one micro-batch per file).

    readStream requires an explicit schema; take it from a batch read of
    the same file (a footer-only metadata touch) so the stream adapts to
    whichever timestamp encoding the fixture generation used."""
    from semantic_cpp_spark.session import event_time_col, load_table

    batch = load_table(spark, sf_dir, "events")
    # streaming source wants a DIRECTORY; the fixture dir holds all tables,
    # so glob-filter down to the events file.
    raw = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("event_time", event_time_col(raw))


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str,
    skip_no_data_batch: bool = False,
) -> DataFrame:
    """Execute a streaming query to completion against an in-memory sink
    and return the materialised result table.

    ``skip_no_data_batch`` (r16, VERDICT r15 #5): after the data
    batches, a bounded replay pays one ZERO-input micro-batch whose
    only job is advancing the watermark — profiled at 2.65 s of the
    stream_stream_join gate's 8.0 s processAllAvailable (state-store
    commits run for every store × partition even with no input rows).
    A caller whose query emits every result row from DATA batches —
    inner stream-stream joins and dropDuplicates emit eagerly,
    complete-mode re-emits the full result each batch, update-mode
    custom stateful operators emit from their own update logic —
    passes True to skip that batch (results pinned identical by the
    batch==stream parity suite and the driver oracle). Append-mode
    WATERMARKED AGGREGATIONS must keep the default False: their final
    windows only emit when the no-data batch advances the watermark
    past the window end (test_streaming pins one such gate). The
    session's previous conf value is restored either way."""
    import os

    spark = stream_df.sparkSession
    conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    part_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key, None)
    prev_parts = spark.conf.get(part_key, None)
    spark.conf.set(conf_key, "false" if skip_no_data_batch else "true")
    # SPARK_GRAFT_STREAM_STATE_PARTITIONS (r16): a stateful streaming
    # query's STATE partition count is frozen at first start from the
    # session's shuffle partitions, and every micro-batch pays a fixed
    # per-store commit cost (stores x partitions files). Profiled at
    # sf0.1: stream_stream_join's summed state-commit time fell
    # 42 s -> 2.3 s (wall 9.0 -> 7.2 s) at 8 partitions vs 32. The
    # right count is a STATE-VOLUME property (tiny bounded replays
    # want few partitions; 100 TB state wants many), so it is an
    # explicit knob, NOT a changed default — the default stays the
    # session's shuffle partitions so the driver's core-count scaling
    # bench measures the same shapes.
    env_parts = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
    if env_parts:
        spark.conf.set(part_key, env_parts)
    name = f"sem_stream_{uuid.uuid4().hex[:12]}"
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
        if env_parts and prev_parts is not None:
            spark.conf.set(part_key, prev_parts)
    return stream_df.sparkSession.table(name)


def tumbling_counts(events: DataFrame, size: str = "1 hour") -> DataFrame:
    """Event-time tumbling window aggregate with a watermark (late rows
    beyond 10 minutes dropped once the watermark passes)."""
    return (
        events.withWatermark("event_time", "10 minutes")
        .groupBy(F.window("event_time", size).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start_s"),
            "n",
            F.round("sum_value", 2).alias("sum_value"),
        )
    )


def sliding_counts(
    events: DataFrame, size: str = "2 hours", slide: str = "30 minutes"
) -> DataFrame:
    return (
        events.withWatermark("event_time", "10 minutes")
        .groupBy(F.window("event_time", size, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start_s"),
            "n",
        )
    )


def session_counts(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Session windows per user: a session extends while consecutive
    events arrive within `gap`."""
    return (
        events.withWatermark("event_time", "10 minutes")
        .groupBy(
            F.col("user_id"),
            F.session_window("event_time", gap).alias("win"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            (F.unix_micros(F.col("win.start"))).alias("session_start_us"),
            "n",
        )
    )


def streaming_distinct_keys(events: DataFrame) -> DataFrame:
    """Streaming dedup: first occurrence of each (user_id, event_type)
    key survives; emitting only the key makes the result order-independent
    (the streaming form of distinct(), semantic.h:1122-1142)."""
    return events.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )


def purchases_after_signup(events: DataFrame, window_s: int = 3600) -> DataFrame:
    """Stream-stream join: purchases matched to the SAME user's signups
    within the preceding ``window_s`` seconds.

    Both sides carry watermarks so the join state is bounded (Spark evicts
    buffered rows once the watermark passes the range condition — the
    production-correct unbounded-join form). Time comparisons use
    epoch-micros integers (session.ts_micros — dtype-adaptive, exact).
    """
    from semantic_cpp_spark.session import ts_micros

    base = events.withColumn("t_us", ts_micros(events))
    sign = (
        base.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("event_id").alias("signup_id"),
            F.col("t_us").alias("s_us"),
            F.col("event_time").alias("s_time"),
        )
        .withWatermark("s_time", "2 hours")
    )
    buy = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("amount"),
            F.col("t_us").alias("b_us"),
            F.col("event_time").alias("b_time"),
        )
        .withWatermark("b_time", "2 hours")
    )
    cond = (
        (F.col("s_user") == F.col("b_user"))
        & (F.col("b_time") >= F.col("s_time"))
        & (F.col("b_time") <= F.col("s_time") + F.expr(f"INTERVAL {window_s} SECONDS"))
    )
    joined = buy.join(sign, cond)
    return joined.select(
        F.col("b_user").alias("user_id"),
        "signup_id",
        "purchase_id",
        F.round("amount", 2).alias("amount"),
    )


# -- custom stateful operators ---------------------------------------------

_STATS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("sum_squares", T.DoubleType()),
    ]
)
_STATS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s1", T.DoubleType()),
        T.StructField("s2", T.DoubleType()),
    ]
)


def _stats_update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running (count, Σx, Σx²) per key — the reference collector's
    identity/accumulate/combine stages (collector.h:51-153) as streaming
    state. Power sums rather than Welford mean/M2 on purpose: the fixture
    values carry ≤2 decimals, so the true sums are exact 2/4-decimal
    quantities and rounding is boundary-safe when compared against the
    batch oracle (a mean like sum/64 can land EXACTLY on a rounding
    boundary where engines disagree by one ulp)."""
    if state.exists:
        n, s1, s2 = state.get
    else:
        n, s1, s2 = 0, 0.0, 0.0
    rows = pd.concat(list(pdfs))
    for v in rows.sort_values("event_id")["value"]:
        n += 1
        s1 += v
        s2 += v * v
    state.update((n, s1, s2))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [n],
            "sum_value": [s1],
            "sum_squares": [s2],
        }
    )


def running_stats_per_user(events: DataFrame) -> DataFrame:
    """Custom stateful operator #1: per-user running (count, Σx, Σx²) —
    mean/variance derivable — maintained across micro-batches."""
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _stats_update,
            outputStructType=_STATS_OUT,
            stateStructType=_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_TOPK_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("rk", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)
_TOPK_STATE = T.StructType(
    [
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
    ]
)

def _make_topk_update(k: int):
    """Build the per-key top-K update fn with ``k`` CLOSED OVER (captured
    in the pickled closure). A module-global k would silently revert to
    its import-time default on executors — the Python workers re-import
    this module and never see a driver-side mutation — and two concurrent
    queries with different k would race. Closure capture fixes both."""

    def _topk_update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-key top-K with ORDERED state and eviction beyond K — the
        custom-operator shape the reference's count windows hint at (SURVEY
        §7.6). Ties broken by (value desc, event_id asc) for determinism.

        Note: Spark 4's transformWithStateInPandas (ValueState/ListState
        API) is the natural home for this, but its python worker needs
        protobuf, which this container lacks — applyInPandasWithState
        expresses the identical state machine."""
        if state.exists:
            vals, ids = state.get
            pool = list(zip(vals, ids))
        else:
            pool = []
        for pdf in pdfs:
            pool.extend(zip(pdf["value"], pdf["event_id"]))
        pool.sort(key=lambda t: (-t[0], t[1]))
        pool = pool[:k]
        state.update(([float(v) for v, _ in pool], [int(i) for _, i in pool]))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])] * len(pool),
                "rk": list(range(1, len(pool) + 1)),
                "value": [v for v, _ in pool],
            }
        )

    return _topk_update


def topk_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Custom stateful operator #3: per-user running top-k values,
    re-emitted per micro-batch (update mode)."""
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_topk_update(k),
            outputStructType=_TOPK_OUT,
            stateStructType=_TOPK_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_CW_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("win", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)
_CW_STATE = T.StructType(
    [
        T.StructField("seen", T.LongType()),
        T.StructField("buf_sum", T.DoubleType()),
        T.StructField("buf_n", T.LongType()),
    ]
)

COUNT_WINDOW_SIZE = 10


def _make_count_window_update(size: int):
    """Window size closed over (same executor-pickling rationale as
    ``_make_topk_update``)."""

    def _count_window_update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Count-based tumbling windows over an unbounded stream: buffer the
        running remainder in state, emit a row per COMPLETED window, keep the
        partial tail buffered (explicit eviction-on-emit). This is the
        reference's tumble(size) (semantic.h:910-913) with state instead of a
        materialised buffer."""
        if state.exists:
            seen, buf_sum, buf_n = state.get
        else:
            seen, buf_sum, buf_n = 0, 0.0, 0
        out = []
        rows = pd.concat(list(pdfs)).sort_values("event_id")
        for v in rows["value"]:
            buf_sum += v
            buf_n += 1
            if buf_n == size:
                out.append(
                    {
                        "user_id": key[0],
                        "win": seen // size,
                        "n": buf_n,
                        "sum_value": buf_sum,
                    }
                )
                seen += buf_n
                buf_sum, buf_n = 0.0, 0
        state.update((seen, buf_sum, buf_n))
        yield pd.DataFrame(out, columns=["user_id", "win", "n", "sum_value"])

    return _count_window_update


def count_tumble_per_user(events: DataFrame, size: int = COUNT_WINDOW_SIZE) -> DataFrame:
    """Custom stateful operator #2: per-user count-based tumbling windows
    (size ``size``) — emits only completed windows."""
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_count_window_update(size),
            outputStructType=_CW_OUT,
            stateStructType=_CW_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def enrich_with_static(stream_df: DataFrame, profile: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static broadcast enrichment: join each streaming event with
    a batch-computed profile table (the feature-lookup pattern — static
    side is re-read per micro-batch, broadcast when small). Stream-static
    inner joins are append-safe with no watermark requirement."""
    return stream_df.join(F.broadcast(profile), key)


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession) -> None:
    """Switch stateful queries onto the RocksDB state store (bundled with
    Spark ≥3.2; conf is read at QUERY START, so set it before ``.start()``).

    Why this is the 100 TB setting: the default HDFSBackedStateStore keeps
    every key's state as JVM objects on the executor HEAP — at
    high key cardinality (per-user running stats over
    millions of users) that is an OOM, not a slowdown. RocksDB keeps state
    off-heap with spill-to-disk, bounding executor memory at any
    cardinality, plus incremental-checkpoint/changelog support. Batch
    semantics are identical — pinned by the kill-and-resume test running
    the same no-loss/no-dup contract on BOTH providers
    (tests/test_streaming.py::test_checkpoint_restart_no_loss_no_dup).

    Migration note (honest boundary): Spark 4's
    ``transformWithStateInPandas`` (typed ValueState/ListState/MapState +
    timers) is the successor API for the custom stateful trio here; its
    Python worker requires protobuf, which this container does not ship
    (re-verified r14 AND r15: ``import google.protobuf`` →
    ModuleNotFoundError, no grpc wheel either), so these operators stay
    on ``applyInPandasWithState`` — the identical state machine on the
    same state-store providers. The switch is mechanical when protobuf
    is available: groupBy().transformWithStateInPandas(StatefulProcessor
    subclass) with the same state tuples.
    """
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )


_FUNNEL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t_1", T.LongType()),
        T.StructField("t_2", T.LongType()),
        T.StructField("t_3", T.LongType()),
        T.StructField("stage", T.LongType()),
    ]
)
_FUNNEL_STATE = T.StructType(
    [
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("t3", T.LongType()),
    ]
)


def _make_funnel_update(steps: Tuple[str, str, str]):
    s1, s2, s3 = steps

    def _funnel_update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Streaming ordered funnel: per-user slot times for step k
        strictly after step k−1, maintained as three longs of state
        (sentinel −1 = unset). Greedy chronological filling equals the
        batch funnel's earliest-after semantics when events arrive in
        time order (single-pass monotone stream — the same assumption the
        count-window operator makes); out-of-order arrival would need
        watermark buffering, which the batch operator covers instead."""
        if state.exists:
            t1, t2, t3 = state.get
        else:
            t1 = t2 = t3 = -1
        rows = pd.concat(list(pdfs)).sort_values(["tus", "event_id"])
        for et, t in zip(rows["event_type"], rows["tus"]):
            t = int(t)
            if et == s1 and t1 < 0:
                t1 = t
            elif et == s2 and t1 >= 0 and t2 < 0 and t > t1:
                t2 = t
            elif et == s3 and t2 >= 0 and t3 < 0 and t > t2:
                t3 = t
        state.update((t1, t2, t3))
        stage = 3 if t3 >= 0 else 2 if t2 >= 0 else 1 if t1 >= 0 else 0
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "t_1": None if t1 < 0 else t1,
                    "t_2": None if t2 < 0 else t2,
                    "t_3": None if t3 < 0 else t3,
                    "stage": stage,
                }
            ]
        )

    return _funnel_update


def funnel_stages_per_user(
    events: DataFrame, steps: Tuple[str, str, str] = ("signup", "view", "purchase")
) -> DataFrame:
    """Custom stateful operator #4: per-user ordered-funnel progress
    (earliest step-k event strictly after step k−1) across micro-batches.
    State is three longs per user — bounded by key cardinality, never by
    stream length."""
    from semantic_cpp_spark.session import ts_micros

    ev = events.filter(F.col("event_type").isin(*steps)).select(
        "user_id", "event_id", "event_type", ts_micros(events).alias("tus")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_funnel_update(steps),
        outputStructType=_FUNNEL_OUT,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- custom stateful operator #5: streaming last-touch attribution -----------

_ATTR_OUT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("t_conv", T.LongType()),
        T.StructField("t_touch", T.LongType()),
        T.StructField("touch_type", T.StringType()),
        T.StructField("latency_us", T.LongType()),
    ]
)
_ATTR_STATE = T.StructType([T.StructField("lt", T.LongType())])


def _make_attr_update(
    conversion: str, ranked: Tuple[str, ...], lookback_us: int
):
    rank = {ty: i for i, ty in enumerate(ranked)}

    def _attr_update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Streaming last-touch attribution: ONE long of state per user —
        the int64-encoded (t·8 + type rank) latest touch, the exact
        encoding of the batch operator (eventflow.last_touch_attribution),
        so batch/stream parity is bit-level. Rows process in (tus,
        event_id) order; a conversion reads the state BEFORE same-row
        touches update it — the strictly-preceding (ROWS …1 PRECEDING)
        semantics. Same time-ordered-stream assumption as the funnel
        kernel; out-of-order arrival would need watermark buffering."""
        lt = state.get[0] if state.exists else -1
        rows = pd.concat(list(pdfs)).sort_values(["tus", "event_id"])
        out = []
        uid = key[0]
        for eid, et, t in zip(rows["event_id"], rows["event_type"], rows["tus"]):
            t = int(t)
            if et == conversion:
                if lt >= 0 and t - lt // 8 <= lookback_us:
                    out.append(
                        (int(eid), uid, t, lt // 8, ranked[lt % 8], t - lt // 8)
                    )
                else:
                    out.append((int(eid), uid, t, None, None, None))
            r = rank.get(et)
            if r is not None:
                enc = t * 8 + r
                if enc > lt:
                    lt = enc
        state.update((lt,))
        yield pd.DataFrame(
            out,
            columns=[
                "event_id", "user_id", "t_conv",
                "t_touch", "touch_type", "latency_us",
            ],
        )

    return _attr_update


def last_touch_per_user(
    events: DataFrame,
    conversion: str = "purchase",
    touch_types: Tuple[str, ...] = ("view", "click", "signup"),
    lookback_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Custom stateful operator #5: streaming last-touch attribution —
    one attribution row per conversion as it arrives, against a single
    long of per-user state (the batch operator's int64 touch encoding).
    State is bounded by key cardinality, never stream length."""
    from semantic_cpp_spark.session import ts_micros

    ranked = tuple(sorted(touch_types))
    ev = events.filter(
        F.col("event_type").isin(conversion, *touch_types)
    ).select("user_id", "event_id", "event_type", ts_micros(events).alias("tus"))
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_attr_update(conversion, ranked, lookback_us),
        outputStructType=_ATTR_OUT,
        stateStructType=_ATTR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _aligned_win_starts(hr, window_hours: int, step_hours: int):
    """Array of step-ALIGNED sliding-window start hours covering event
    hour ``hr``: candidates floor(hr/step)*step - i*step for
    i in 0..ceil(window/step)-1, filtered to starts whose window
    [s, s+window) still contains hr. Pure Column expression."""
    import math

    if step_hours < 1:
        raise ValueError(f"step_hours must be >= 1, got {step_hours}")
    n_cand = math.ceil(window_hours / step_hours)
    # floor-mod (pmod), not %: Spark's % follows the dividend sign, so a
    # negative epoch hour would round the top candidate UP past the event
    # and assign it to a window that starts after it
    top = hr - F.pmod(hr, F.lit(step_hours))
    seq = F.sequence(
        top - F.lit((n_cand - 1) * step_hours), top, F.lit(step_hours)
    )
    return F.filter(seq, lambda s: s + F.lit(window_hours) > hr)


def sliding_unique_users(
    events: DataFrame, window_hours: int = 6, step_hours: int = 1
) -> DataFrame:
    """Streaming sliding-window distinct users — the replicate-explode
    distinct shape (batch: evt_sliding_uniques) lifted to a stream:
    each event explodes into the ≤window/step hour-windows containing
    it, streaming dropDuplicates removes (user, window) repeats, and a
    running count per window aggregates in complete mode. Streaming
    count(DISTINCT) is unsupported by design — dedup-then-count is the
    standard equivalent. State = one row per distinct (user, window);
    sliding_unique_users_bounded is the watermarked production form that
    EVICTS that state (this complete-mode form exists for exact-parity
    gating on the bounded fixture stream, where every window closes).

    Window starts are step-ALIGNED (multiples of step_hours): each event
    explodes into the candidate starts floor(hr/step)*step - i*step and
    keeps those whose window still covers the event — for step_hours=1
    this is exactly the hr-(w-1)..hr sequence; for coarser steps it emits
    the correct (fewer, aligned) windows instead of per-hour starts."""
    from semantic_cpp_spark.session import ts_micros

    hr = F.expr(f"tus div {3_600_000_000}")
    ev = events.select("user_id", ts_micros(events).alias("tus")).select(
        "user_id",
        F.explode(_aligned_win_starts(hr, window_hours, step_hours)).alias(
            "win_start"
        ),
    )
    return (
        ev.dropDuplicates(["user_id", "win_start"])
        .groupBy("win_start")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.col("win_start").cast("long").alias("win_start"), "n_users")
    )


_SLIDE_UNIQ_OUT = T.StructType(
    [
        T.StructField("win_start", T.LongType()),
        T.StructField("n_users", T.LongType()),
    ]
)

_SLIDE_UNIQ_STATE = T.StructType(
    [T.StructField("users", T.ArrayType(T.LongType()))]
)


def _make_sliding_uniq_update(window_hours: int):
    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        win_start = int(key[0])
        end_ms = (win_start + window_hours) * 3_600_000
        if state.hasTimedOut:
            # watermark passed window end: emit the final count once and
            # EVICT — this is the whole point of the bounded variant
            (users,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"win_start": [win_start], "n_users": [len(users)]}
            )
            return
        if state.getCurrentWatermarkMs() >= end_ms:
            # late rows for an already-closed window: applyInPandasWithState
            # does NOT filter late input itself — ignoring them here keeps
            # closed windows immutable and prevents state resurrection
            for _ in pdfs:
                pass
            return
        users = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            users.update(int(u) for u in pdf["user_id"])
        state.update((sorted(users),))
        state.setTimeoutTimestamp(end_ms)

    return _update


def sliding_unique_users_bounded(
    events: DataFrame,
    window_hours: int = 6,
    step_hours: int = 1,
    lateness: str = "1 hour",
) -> DataFrame:
    """BOUNDED-STATE streaming sliding-window distinct users — the
    watermarked production form of sliding_unique_users (whose
    complete-mode state holds every (user, window) ever seen).

    Custom stateful operator #6: events explode into their step-aligned
    window starts (same _aligned_win_starts expression as the
    complete-mode form), then ONE applyInPandasWithState keyed on
    win_start holds the window's distinct-user set and an EVENT-TIME
    TIMEOUT at window end: when the watermark passes it, the window
    emits its final count exactly once and the state row is REMOVED.
    Late rows behind the watermark are explicitly ignored (closed
    windows stay immutable — applyInPandasWithState does no late
    filtering of its own). A single stateful stage by design: the
    two-chained-aggregations form (sliding window+user, then window)
    miscounts under watermark propagation across the stage boundary —
    measured, not theorized — and a custom operator with explicit
    eviction is this module's established pattern anyway.

    State per key = the window's distinct users (the floor for EXACT
    distinct; at 100 TB cardinalities the approx path is an HLL sketch
    in the same state slot), bounded in TIME by eviction at close —
    never stream-length. Emits win_start as epoch-hours to match the
    complete-mode form and the batch oracle."""
    from semantic_cpp_spark.session import ts_micros

    hr = F.expr(f"tus div {3_600_000_000}")
    ev = (
        events.select(
            "user_id", "event_time", ts_micros(events).alias("tus")
        )
        .withWatermark("event_time", lateness)
        .select(
            "user_id",
            "event_time",
            F.explode(
                _aligned_win_starts(hr, window_hours, step_hours)
            ).alias("win_start"),
        )
    )
    return ev.groupBy("win_start").applyInPandasWithState(
        _make_sliding_uniq_update(window_hours),
        outputStructType=_SLIDE_UNIQ_OUT,
        stateStructType=_SLIDE_UNIQ_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# -- HyperLogLog sketch state for sliding uniques ----------------------------
# The approx path sliding_unique_users_bounded's docstring names for 100 TB
# cardinalities: a window's state becomes m = 2^p fixed registers instead of
# its distinct-user set. Hashing is md5-derived (the hash_u60 convention), so
# registers — and therefore the estimate — are DETERMINISTIC and replayable
# by the DuckDB oracle: idx = low p bits, rho = leading-zero rank of the
# remaining 50 bits (via bit_length, = length(bin(x)) on both engines).

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
# the standard alpha_m bias constant for m >= 128 (Flajolet et al. 2007);
# written as the same arithmetic expression the SQL oracle evaluates
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_h60(key: Any) -> int:
    """60-bit md5 hash of a key, salt 'hll-' (hash_u60 convention)."""
    import hashlib

    return int(hashlib.md5(f"hll-{key}".encode()).hexdigest()[:15], 16)


def hll_rho(rest: int) -> int:
    """Rank of the first 1-bit in the 50-bit post-index remainder
    (1-based from the MSB); 51 when the remainder is all zeros."""
    return 51 - rest.bit_length() if rest else 51


def hll_add(regs: list, key: Any) -> None:
    h = hll_h60(key)
    idx = h % HLL_M
    rho = hll_rho(h >> HLL_P)
    if rho > regs[idx]:
        regs[idx] = rho


def hll_estimate(regs) -> float:
    """Flajolet et al. 2007 estimator with the small-range linear-counting
    correction (E <= 2.5m with empty registers). The register sum runs in
    index order; the oracle's group-sum differs only at ~1e-15, far under
    the 4dp output rounding."""
    import math

    s = 0.0
    v = 0
    for r in regs:
        s += 2.0 ** (-int(r))
        if r == 0:
            v += 1
    e = HLL_ALPHA * HLL_M * HLL_M / s
    if e <= 2.5 * HLL_M and v > 0:
        e = HLL_M * math.log(HLL_M / v)
    return e


_SLIDE_UNIQ_HLL_OUT = T.StructType(
    [
        T.StructField("win_start", T.LongType()),
        T.StructField("hll_users", T.DoubleType()),
    ]
)

_SLIDE_UNIQ_HLL_STATE = T.StructType(
    [T.StructField("regs", T.ArrayType(T.IntegerType()))]
)


def _make_sliding_uniq_hll_update(window_hours: int):
    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        win_start = int(key[0])
        end_ms = (win_start + window_hours) * 3_600_000
        if state.hasTimedOut:
            (regs,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "win_start": [win_start],
                    "hll_users": [round(hll_estimate(regs), 4)],
                }
            )
            return
        if state.getCurrentWatermarkMs() >= end_ms:
            for _ in pdfs:  # late rows for a closed window: ignore
                pass
            return
        regs = list(state.get[0]) if state.exists else [0] * HLL_M
        for pdf in pdfs:
            for u in pdf["user_id"]:
                hll_add(regs, int(u))
        state.update((regs,))
        state.setTimeoutTimestamp(end_ms)

    return _update


def sliding_unique_users_hll(
    events: DataFrame,
    window_hours: int = 6,
    step_hours: int = 1,
    lateness: str = "1 hour",
) -> DataFrame:
    """sliding_unique_users_bounded with HYPERLOGLOG sketch state — the
    100 TB form: state per open window is m = 1024 int registers
    (~4 KB) REGARDLESS of cardinality, where the exact form's
    distinct-user set grows with the window's audience (measured floor:
    37.6 MB at sf1.0, SCALING.md). Same single applyInPandasWithState
    stage, same event-time-timeout eviction, same closed-window
    immutability; only the state payload and the emitted value change
    (estimate, not exact count — error ~1.04/√m ≈ 3.3% theoretical,
    ≤2% measured on the fixture, test-pinned).

    Deterministic by construction (md5-derived registers), so the gate
    holds a HARD value oracle: DuckDB replays register assignment and
    the bias-corrected estimator formula per closed window."""
    from semantic_cpp_spark.session import ts_micros

    hr = F.expr(f"tus div {3_600_000_000}")
    ev = (
        events.select(
            "user_id", "event_time", ts_micros(events).alias("tus")
        )
        .withWatermark("event_time", lateness)
        .select(
            "user_id",
            "event_time",
            F.explode(
                _aligned_win_starts(hr, window_hours, step_hours)
            ).alias("win_start"),
        )
    )
    return ev.groupBy("win_start").applyInPandasWithState(
        _make_sliding_uniq_hll_update(window_hours),
        outputStructType=_SLIDE_UNIQ_HLL_OUT,
        stateStructType=_SLIDE_UNIQ_HLL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# -- sliding Count-Min frequency state ---------------------------------------
# The frequency companion of the HLL register state above: per open window
# the state is a depth x width counter grid (4 x 1024 int64 = 32 KB)
# REGARDLESS of how many distinct users the window sees; at close the
# sketch answers point-frequency queries for a fixed probe set. Hash
# convention matches pipeline.dedup.cms_build (salt 'cms{r}-', md5 60-bit,
# % width), so the counters are deterministic and oracle-replayable.

CMS_D = 4
CMS_W = 1024
CMS_PROBE_USERS = tuple(range(10))


def cms_cell(key: Any, r: int) -> int:
    """Counter column for a key in hash row r (dedup.cms_build convention:
    md5('cms{r}-' || key) 60-bit % width)."""
    import hashlib

    return int(hashlib.md5(f"cms{r}-{key}".encode()).hexdigest()[:15], 16) % CMS_W


_SLIDE_CMS_OUT = T.StructType(
    [
        T.StructField("win_start", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("cms_count", T.LongType()),
    ]
)

_SLIDE_CMS_STATE = T.StructType(
    [T.StructField("cnt", T.ArrayType(T.LongType()))]
)


def _make_sliding_cms_update(window_hours: int):
    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        win_start = int(key[0])
        end_ms = (win_start + window_hours) * 3_600_000
        if state.hasTimedOut:
            (cnt,) = state.get
            state.remove()
            rows = [
                (
                    win_start,
                    u,
                    min(cnt[r * CMS_W + cms_cell(u, r)] for r in range(CMS_D)),
                )
                for u in CMS_PROBE_USERS
            ]
            yield pd.DataFrame(
                rows, columns=["win_start", "user_id", "cms_count"]
            )
            return
        if state.getCurrentWatermarkMs() >= end_ms:
            for _ in pdfs:  # late rows for a closed window: ignore
                pass
            return
        cnt = list(state.get[0]) if state.exists else [0] * (CMS_D * CMS_W)
        for pdf in pdfs:
            for u in pdf["user_id"]:
                for r in range(CMS_D):
                    cnt[r * CMS_W + cms_cell(int(u), r)] += 1
        state.update((cnt,))
        state.setTimeoutTimestamp(end_ms)

    return _update


def sliding_user_freq_cms(
    events: DataFrame,
    window_hours: int = 6,
    step_hours: int = 1,
    lateness: str = "1 hour",
) -> DataFrame:
    """Sliding per-user frequency estimation with COUNT-MIN sketch state
    — the frequency twin of sliding_unique_users_hll: per open window
    the state is the 4×1024 counter grid (32 KB) at ANY user
    cardinality, where an exact per-(window, user) count table grows
    with the audience. Same single applyInPandasWithState stage, same
    event-time-timeout eviction and closed-window immutability; at
    close the sketch is point-queried for the fixed probe set
    CMS_PROBE_USERS and emits (win_start, user_id, cms_count) rows,
    with cms_count ≥ the true in-window frequency by the one-sided CMS
    guarantee (dedup.cms_build is the batch form; identical hash
    convention, so counters are md5-deterministic and the gate holds a
    HARD value oracle — DuckDB rebuilds every closed window's touched
    cells and probes with min(coalesce(cnt, 0)))."""
    from semantic_cpp_spark.session import ts_micros

    hr = F.expr(f"tus div {3_600_000_000}")
    ev = (
        events.select(
            "user_id", "event_time", ts_micros(events).alias("tus")
        )
        .withWatermark("event_time", lateness)
        .select(
            "user_id",
            "event_time",
            F.explode(
                _aligned_win_starts(hr, window_hours, step_hours)
            ).alias("win_start"),
        )
    )
    return ev.groupBy("win_start").applyInPandasWithState(
        _make_sliding_cms_update(window_hours),
        outputStructType=_SLIDE_CMS_OUT,
        stateStructType=_SLIDE_CMS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# -- sliding quantile-sketch state -------------------------------------------
# The quantile member of the constant-state sliding family (exact
# bounded -> HLL distinct -> CMS frequency -> THIS): per open window the
# state is the occupied-bin table of operators.rollup's exact log2
# quantile sketch — (bin, count) pairs, <= ~14.6k bins at B=7 no matter
# how many events the window sees — where exact sliding percentiles
# would buffer every event. Binning is the SAME integer arithmetic as
# rollup._quantize (top QSKETCH_BITS+1 significant bits, sign mirrored),
# so closed windows hold a HARD value oracle: DuckDB re-bins each closed
# window's events with the identical shift expression and replays the
# exact integer rank thresholds.

QSKETCH_B = 7


def qsketch_bin(v: int, b: int = QSKETCH_B) -> int:
    """Python binning for the stateful update — DELEGATES to
    operators.rollup.quantize_py so the batch sketch, the streaming
    sketch, and the rank probe can never drift (pinned equal to the
    Column form in tests)."""
    from semantic_cpp_spark.operators.rollup import quantize_py

    return quantize_py(v, b)


_SLIDE_QS_OUT = T.StructType(
    [
        T.StructField("win_start", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("p50", T.LongType()),
        T.StructField("p95", T.LongType()),
        T.StructField("p99", T.LongType()),
    ]
)

_SLIDE_QS_STATE = T.StructType(
    [
        T.StructField("qvs", T.ArrayType(T.LongType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
    ]
)


def _make_sliding_qsketch_update(window_hours: int):
    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        win_start = int(key[0])
        end_ms = (win_start + window_hours) * 3_600_000
        if state.hasTimedOut:
            qvs, cnts = state.get
            state.remove()
            bins = sorted(zip(qvs, cnts))
            n = sum(cnts)
            row = [win_start, n]
            cum = 0
            idx = 0
            for p in (50, 95, 99):
                thr = (n * p + 99) // 100
                # thresholds are non-decreasing: resume the cumsum walk
                while cum < thr and idx < len(bins):
                    cum += bins[idx][1]
                    idx += 1
                row.append(bins[idx - 1][0])
            yield pd.DataFrame(
                [row], columns=["win_start", "n", "p50", "p95", "p99"]
            )
            return
        if state.getCurrentWatermarkMs() >= end_ms:
            for _ in pdfs:  # late rows for a closed window: ignore
                pass
            return
        if state.exists:
            qvs, cnts = state.get
            sk = dict(zip(qvs, cnts))
        else:
            sk = {}
        for pdf in pdfs:
            for v in pdf["cents"]:
                q = qsketch_bin(int(v))
                sk[q] = sk.get(q, 0) + 1
        state.update((list(sk.keys()), list(sk.values())))
        state.setTimeoutTimestamp(end_ms)

    return _update


def sliding_value_quantiles(
    events: DataFrame,
    window_hours: int = 6,
    step_hours: int = 1,
    lateness: str = "1 hour",
) -> DataFrame:
    """Sliding p50/p95/p99 of the event value (integer cents) with
    QUANTILE-SKETCH state: per open window, (bin, count) pairs under
    the exact log2 binning — bounded by bin occupancy (<= ~14.6k at
    B=7), never by event count, with the DDSketch-grade 2^-7 relative
    error bound — where exact sliding percentiles would hold every
    event in state. Same applyInPandasWithState shape, event-time
    eviction, and closed-window immutability as the HLL/CMS siblings;
    at close the window emits (n, p50, p95, p99) from the exact
    integer rank walk ceil(n*p/100). Deterministic binning means the
    gate holds a HARD value oracle (the batch re-bin + window-cumsum
    SQL restricted to closed windows)."""
    from semantic_cpp_spark.session import ts_micros

    hr = F.expr(f"tus div {3_600_000_000}")
    ev = (
        events.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "event_time",
            ts_micros(events).alias("tus"),
        )
        .withWatermark("event_time", lateness)
        .select(
            "cents",
            "event_time",
            F.explode(
                _aligned_win_starts(hr, window_hours, step_hours)
            ).alias("win_start"),
        )
    )
    return ev.groupBy("win_start").applyInPandasWithState(
        _make_sliding_qsketch_update(window_hours),
        outputStructType=_SLIDE_QS_OUT,
        stateStructType=_SLIDE_QS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
