"""Structured Streaming surface: batch/stream parity and cross-batch
state (semantic_cpp_spark.streaming.ops)."""

import pytest
from pyspark.sql import functions as F

from semantic_cpp_spark.session import event_time_col, ts_micros
from semantic_cpp_spark.streaming import ops

SF = "/root/testdata/sf0.001"


def _batch_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF}/events.parquet")


def _stream(spark, src):
    """File stream over ``src`` with event_time, schema taken from a batch
    read so the test adapts to whichever ts dtype the writer produced
    (int64 epoch-nanos for hand-built frames, TIMESTAMP for fixture
    rewrites)."""
    batch = spark.read.parquet(src)
    raw = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    return raw.withColumn("event_time", event_time_col(raw))


def test_tumbling_counts_equal_batch(spark):
    ev = ops.read_events_stream(spark, SF)
    out = ops.run_to_memory(ops.tumbling_counts(ev, "1 hour"), "complete")
    got = {r["win_start_s"]: r["n"] for r in out.collect()}
    bev = _batch_events(spark)
    batch = (
        bev.groupBy(((ts_micros(bev) / F.lit(3_600_000_000)).cast("long") * 3600).alias("w"))
        .count()
        .collect()
    )
    expect = {r["w"]: r["count"] for r in batch}
    assert got == expect


def test_session_counts_total_preserved(spark):
    ev = ops.read_events_stream(spark, SF)
    out = ops.run_to_memory(ops.session_counts(ev, "5 minutes"), "complete")
    rows = out.collect()
    assert sum(r["n"] for r in rows) == _batch_events(spark).count()
    # session starts unique per user
    keys = [(r["user_id"], r["session_start_us"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_streaming_distinct_keys(spark):
    ev = ops.read_events_stream(spark, SF)
    out = ops.run_to_memory(ops.streaming_distinct_keys(ev), "append")
    got = {(r["user_id"], r["event_type"]) for r in out.collect()}
    expect = {
        (r["user_id"], r["event_type"])
        for r in _batch_events(spark).select("user_id", "event_type").distinct().collect()
    }
    assert got == expect


def test_stateful_ops_across_micro_batches(spark, tmp_path):
    """State must carry across micro-batches: split events into 3 files,
    force one file per trigger, and check the final stateful results
    equal the batch answer."""
    src = str(tmp_path / "events_split")
    _batch_events(spark).repartition(3).write.parquet(src)
    stream = _stream(spark, src)

    # running stats: last update per user must equal batch totals
    out = ops.run_to_memory(ops.running_stats_per_user(stream), "update")
    latest = {}
    for r in out.collect():  # update mode appends one row per user per batch
        cur = latest.get(r["user_id"])
        if cur is None or r["n"] > cur[0]:
            latest[r["user_id"]] = (r["n"], r["sum_value"])
    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in _batch_events(spark)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(latest) == set(batch)
    for u in batch:
        assert latest[u][0] == batch[u][0]
        assert abs(latest[u][1] - batch[u][1]) < 1e-6


def test_count_windows_across_micro_batches(spark, tmp_path):
    """Count-based tumbling windows must stitch across batch boundaries:
    a window spanning two micro-batches still emits exactly once with
    COUNT_WINDOW_SIZE rows."""
    src = str(tmp_path / "events_split2")
    _batch_events(spark).repartition(4).write.parquet(src)
    stream = _stream(spark, src)
    out = ops.run_to_memory(ops.count_tumble_per_user(stream), "append").collect()
    per_user = {}
    for r in out:
        assert r["n"] == ops.COUNT_WINDOW_SIZE
        per_user.setdefault(r["user_id"], set()).add(r["win"])
    batch_counts = {
        r["user_id"]: r["count"]
        for r in _batch_events(spark).groupBy("user_id").count().collect()
    }
    for u, wins in per_user.items():
        expect_full = batch_counts[u] // ops.COUNT_WINDOW_SIZE
        assert wins == set(range(expect_full))


def test_topk_two_different_k_in_one_session(spark):
    """Two top-k queries with DIFFERENT k in one session must each honor
    their own k — k is captured in the pickled closure, not module state
    (a module-global k would revert to its import-time default on
    executors and race between concurrent queries)."""
    ev2 = ops.read_events_stream(spark, SF)
    out2 = ops.run_to_memory(ops.topk_per_user(ev2, 2), "update").collect()
    ev5 = ops.read_events_stream(spark, SF)
    out5 = ops.run_to_memory(ops.topk_per_user(ev5, 5), "update").collect()

    def final_ranks(rows):
        per_user = {}
        for r in rows:  # update mode: later (larger) emissions supersede
            per_user.setdefault(r["user_id"], set()).add(r["rk"])
        return per_user

    batch_counts = {
        r["user_id"]: r["count"]
        for r in _batch_events(spark).groupBy("user_id").count().collect()
    }
    for u, rks in final_ranks(out2).items():
        assert max(rks) == min(2, batch_counts[u])
    for u, rks in final_ranks(out5).items():
        assert max(rks) == min(5, batch_counts[u])
    # cross-check values: k=2 top values must be a prefix of k=5's
    top2 = {}
    for r in out2:
        top2.setdefault(r["user_id"], {})[r["rk"]] = r["value"]
    top5 = {}
    for r in out5:
        top5.setdefault(r["user_id"], {})[r["rk"]] = r["value"]
    for u in top2:
        assert top2[u][1] == top5[u][1]
        if 2 in top2[u]:
            assert top2[u][2] == top5[u][2]


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data policy: with a 10-minute watermark in append mode, a row
    arriving in a later micro-batch with an event time far behind the
    advanced watermark must NOT revive or re-emit its (closed) window."""
    import pandas as pd

    src = str(tmp_path / "late_events")
    base = 1_700_000_000_000_000_000  # epoch ns
    hour = 3_600_000_000_000
    batch1 = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "ts": [base, base + hour, base + 3 * hour],  # watermark → +3h-10m
            "user_id": [1, 1, 1],
            "event_type": ["a", "a", "a"],
            "value": [1.0, 1.0, 1.0],
            "props": ["{}", "{}", "{}"],
        }
    )
    batch2 = pd.DataFrame(
        {
            "event_id": [3, 4],
            "ts": [base + 10_000, base + 3 * hour + 1000],  # late + on-time
            "user_id": [1, 1],
            "event_type": ["a", "a"],
            "value": [100.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    spark.createDataFrame(batch1).write.parquet(f"{src}/f=1")
    spark.createDataFrame(batch2).write.parquet(f"{src}/f=2")
    stream = _stream(spark, src)
    out = ops.run_to_memory(ops.tumbling_counts(stream, "1 hour"), "append")
    rows = {r["win_start_s"]: (r["n"], r["sum_value"]) for r in out.collect()}
    first_win = (base // hour) * hour // 1_000_000_000
    # the late row (value=100) must not appear in the emitted first window
    if first_win in rows:
        assert rows[first_win] == (1, 1.0)


def test_salted_agg_matches_plain(spark):
    """Skew-safe two-stage aggregation equals the direct groupBy."""
    from semantic_cpp_spark.operators.skew import salted_agg

    df = _batch_events(spark)
    got = {
        r["key"]: (r["n"], round(r["total"], 2), r["hi"])
        for r in salted_agg(
            df,
            F.col("user_id"),
            n=("sum", F.count(F.lit(1))),
            total=("sum", F.sum("value")),
            hi=("max", F.max("value")),
        ).collect()
    }
    expect = {
        r["user_id"]: (r["n"], round(r["total"], 2), r["hi"])
        for r in df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    assert got == expect


def test_sliding_uniques_step_alignment(spark):
    """step_hours > 1 must emit step-ALIGNED window starts (multiples of
    step) with the correct per-event window membership — the pre-r7 code
    stepped the start sequence by 1 hour regardless of step_hours
    (ADVICE r6 #1). Checked against a pure-Python reference on a tiny
    batch frame (the op is batch/stream agnostic)."""
    import collections

    import pandas as pd

    hour_ns = 3_600_000_000_000
    base_hr = 472_229  # arbitrary epoch hour, NOT a multiple of 4
    rows = [
        (i, (base_hr + dh) * hour_ns, uid, "a", 1.0, "{}")
        for i, (dh, uid) in enumerate(
            [(0, 1), (1, 1), (2, 2), (5, 1), (6, 3), (9, 2), (10, 1)]
        )
    ]
    # pre-1970 rows: negative epoch hours exercise the floor-mod (pmod)
    # alignment — Spark's sign-following % would start a window AFTER
    # the event. WHOLE hours on purpose: the upstream hour derivation
    # (`tus div 3600000000`) truncates toward zero, so sub-hour negative
    # timestamps are outside the operator's stated domain (the events
    # fixture is post-2024).
    rows += [
        (100 + j, nh * hour_ns, 9, "a", 1.0, "{}")
        for j, nh in enumerate([-5, -1, -8])
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
    )
    for window_hours, step_hours in [(6, 2), (6, 3), (6, 4), (8, 4), (6, 1)]:
        got = {
            r["win_start"]: r["n_users"]
            for r in ops.sliding_unique_users(
                df, window_hours=window_hours, step_hours=step_hours
            ).collect()
        }
        wins = collections.defaultdict(set)
        for _, ts, uid, *_ in rows:
            h = ts // hour_ns
            for s in range(
                (h - window_hours) // step_hours * step_hours,
                h + step_hours + 1,
                step_hours,
            ):
                if s % step_hours == 0 and s <= h < s + window_hours:
                    wins[s].add(uid)
        assert got == {s: len(u) for s, u in wins.items()}, (
            window_hours,
            step_hours,
        )


def test_sliding_uniques_bounded_closed_windows_and_eviction(spark, tmp_path):
    """The watermarked production form (ops.sliding_unique_users_bounded):
    append mode emits exactly the windows the final watermark CLOSED,
    with counts equal to the complete-mode/batch answer over the on-time
    rows, and a row arriving later than the watermark is DROPPED (state
    for its windows was evicted) instead of mutating a closed window."""
    import collections

    import pandas as pd

    src = str(tmp_path / "sliding_bounded")
    hour_ns = 3_600_000_000_000
    base_hr = 1_700_000_000_000_000_000 // hour_ns + 1  # aligned to an hour
    b1_events = [  # (dh, uid)
        (0, 1), (0, 2), (1, 1), (3, 3), (5, 2), (8, 1), (10, 4),
    ]
    b1 = pd.DataFrame(
        {
            "event_id": list(range(len(b1_events))),
            "ts": [(base_hr + dh) * hour_ns for dh, _ in b1_events],
            "user_id": [u for _, u in b1_events],
            "event_type": ["a"] * len(b1_events),
            "value": [1.0] * len(b1_events),
            "props": ["{}"] * len(b1_events),
        }
    )
    b2 = pd.DataFrame(
        {
            # late row 10h behind the b1 watermark (max base+10h − 1h
            # lateness): every window containing hour base+0 closed long
            # ago — MUST be dropped, user 99 must appear nowhere.
            # Plus a far-future pusher that closes every b1 window.
            "event_id": [100, 101],
            "ts": [base_hr * hour_ns, (base_hr + 100) * hour_ns],
            "user_id": [99, 50],
            "event_type": ["a", "a"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    # ONE part-file per logical batch: multi-part dirs + maxFilesPerTrigger=1
    # would split a "batch" across micro-batches and advance the watermark
    # mid-way, making on-time rows late by accident.
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/f=1")
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/f=2")
    stream = _stream(spark, src)
    out = ops.run_to_memory(
        ops.sliding_unique_users_bounded(stream, 6, 1, "1 hour"), "append"
    )
    got = {r["win_start"]: r["n_users"] for r in out.collect()}
    # reference: every window over the ON-TIME rows; final watermark
    # (base+99h) closed all b1 windows; the pusher's own windows are
    # still open, so user 50 appears nowhere.
    wins = collections.defaultdict(set)
    for dh, uid in b1_events:
        h = base_hr + dh
        for s in range(h - 5, h + 1):
            wins[s].add(uid)
    assert got == {s: len(u) for s, u in wins.items()}
    assert all(99 not in u for u in wins.values())  # late row dropped


def test_sliding_uniques_hll_parity_band(spark):
    """The HLL sketch form vs the exact bounded form on the fixture
    stream: identical closed-window key set, every estimate within 2%
    relative (+ a small absolute floor for the tiny-count windows where
    linear counting is exact-ish) of the true distinct count, and state
    payload is the 1024-register constant, not the audience size. Also
    pins the pure-Python estimator against direct cardinalities."""
    from semantic_cpp_spark.streaming.ops import (
        HLL_M,
        hll_add,
        hll_estimate,
        sliding_unique_users_bounded,
        sliding_unique_users_hll,
    )

    # estimator sanity on known cardinalities (deterministic hashes)
    for n in (10, 100, 1000, 5000):
        regs = [0] * HLL_M
        for i in range(n):
            hll_add(regs, i)
        est = hll_estimate(regs)
        assert abs(est - n) / n < 0.05, (n, est)

    ev = ops.read_events_stream(spark, "/root/testdata/sf0.001")
    exact = {
        r["win_start"]: r["n_users"]
        for r in ops.run_to_memory(
            sliding_unique_users_bounded(ev), "append"
        ).collect()
    }
    ev2 = ops.read_events_stream(spark, "/root/testdata/sf0.001")
    approx = {
        r["win_start"]: r["hll_users"]
        for r in ops.run_to_memory(
            sliding_unique_users_hll(ev2), "append"
        ).collect()
    }
    assert set(exact) == set(approx)
    assert exact  # fixture closes windows
    for s, n in exact.items():
        assert abs(approx[s] - n) <= max(0.02 * n, 1.5), (s, n, approx[s])


def test_session_window_closes_in_append_mode(spark, tmp_path):
    """Append-mode session windows emit only once the watermark passes
    session end + gap: a later batch far in the future closes the first
    session."""
    import pandas as pd

    src = str(tmp_path / "session_close")
    base = 1_700_000_000_000_000_000
    minute, hour = 60_000_000_000, 3_600_000_000_000
    b1 = pd.DataFrame(
        {
            "event_id": [0, 1],
            "ts": [base, base + minute],  # one session (gap 5m)
            "user_id": [1, 1],
            "event_type": ["a", "a"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    b2 = pd.DataFrame(
        {
            "event_id": [2],
            "ts": [base + 5 * hour],  # watermark jumps past session 1
            "user_id": [1],
            "event_type": ["a"],
            "value": [1.0],
            "props": ["{}"],
        }
    )
    spark.createDataFrame(b1).write.parquet(f"{src}/f=1")
    spark.createDataFrame(b2).write.parquet(f"{src}/f=2")
    stream = _stream(spark, src)
    out = ops.run_to_memory(ops.session_counts(stream, "5 minutes"), "append")
    rows = {(r["user_id"], r["session_start_us"]): r["n"] for r in out.collect()}
    # first session (2 events starting at base) must have been emitted/closed
    assert rows.get((1, base // 1000)) == 2


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_checkpoint_restart_no_loss_no_dup(spark, tmp_path, provider, request):
    """Kill-and-resume for a CUSTOM STATEFUL operator (r3/r4 verdict task):
    run count-based tumbling windows over file 1, stop the query (the
    query object is discarded — recovery has only the checkpoint), drop
    file 2, restart the SAME sink+checkpoint, and require:

    - no loss: every full window a single batch run would emit is present,
      including windows whose rows SPAN the stop/restart boundary (those
      prove the buffered remainder was restored from the state store, not
      from memory);
    - no duplication: each (user, win) appears exactly once in the durable
      sink (file-sink commit log + checkpointed offsets = exactly-once).

    Runs on BOTH state-store providers (r6): the default HDFS-backed heap
    store and RocksDB (ops.use_rocksdb_state_store — the bounded-memory
    setting for 100 TB key cardinality). State round-trips through an
    actual RocksDB instance in the rocksdb variant, including the restore
    across the simulated kill.
    """
    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
    )
    request.addfinalizer(lambda: spark.conf.set(key, prior))
    if provider == "rocksdb":
        ops.use_rocksdb_state_store(spark)
    ev = _batch_events(spark).orderBy("event_id")
    n_total = ev.count()
    half = n_total // 2
    src = str(tmp_path / "ckpt_src")
    out = str(tmp_path / "ckpt_out")
    ckpt = str(tmp_path / "ckpt_state")
    ev.limit(half).coalesce(1).write.parquet(f"{src}/f=1")

    def run_once():
        stream = _stream(spark, src)
        q = (
            ops.count_tumble_per_user(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()  # first run: file 1 only, then "killed"
    # second half lands while the query is down
    ev.subtract(ev.limit(half)).coalesce(1).write.parquet(f"{src}/f=2")
    run_once()  # restart from checkpoint

    sink = spark.read.parquet(out).collect()
    seen = [(r["user_id"], r["win"]) for r in sink]
    assert len(seen) == len(set(seen)), "duplicated window emissions"
    # batch expectation: per user, ordered by event_id, chunks of SIZE
    import collections

    size = ops.COUNT_WINDOW_SIZE
    per_user = collections.defaultdict(list)
    for r in ev.select("user_id", "event_id", "value").collect():
        per_user[r["user_id"]].append((r["event_id"], r["value"]))
    expect = {}
    for u, rows in per_user.items():
        rows.sort()
        for w in range(len(rows) // size):
            chunk = [v for _, v in rows[w * size : (w + 1) * size]]
            expect[(u, w)] = (len(chunk), round(sum(chunk), 6))
    got = {
        (r["user_id"], r["win"]): (r["n"], round(r["sum_value"], 6))
        for r in sink
    }
    assert got == expect


def test_use_infinite_stream_affine(spark):
    """useInfinite as a genuinely unbounded Structured Streaming source
    (semantic.h:1763-1783): the rate-micro-batch index drives the
    verified affine closed form, so the stream needs no sequential state.
    Non-affine generators raise loudly (inherently sequential)."""
    import time
    import uuid

    import pytest
    from pyspark.sql import functions as F

    from semantic_cpp_spark.sources import use_infinite_stream

    s = use_infinite_stream(spark, 10, lambda c: c + 3, rows_per_batch=50)
    assert s.isStreaming
    name = f"inf_{uuid.uuid4().hex[:8]}"
    q = s.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() >= 100:
                break
            time.sleep(0.3)
        rows = spark.table(name).orderBy("__idx").limit(100).collect()
    finally:
        q.stop()
    assert len(rows) >= 100
    assert all(r["value"] == 10 + 3 * r["__idx"] for r in rows)
    assert [r["__idx"] for r in rows[:5]] == [0, 1, 2, 3, 4]

    with pytest.raises(ValueError, match="not affine"):
        use_infinite_stream(spark, 2, lambda c: c * c, rows_per_batch=10)
    # piecewise fn that fakes affine on the probe prefix is also rejected
    wrap = lambda c: F.when(c < 100, c + 1).otherwise(F.lit(0))  # noqa: E731
    with pytest.raises(ValueError, match="not affine"):
        use_infinite_stream(spark, 0, wrap, rows_per_batch=10)


def test_funnel_stages_across_micro_batches(spark, tmp_path):
    """Funnel state must stitch across micro-batches ON A TIME-ORDERED
    stream (the operator's documented assumption): signup, view, and
    purchase arrive in three separate time-sliced files (written
    sequentially → increasing mtimes → trigger order), and the final
    update per user equals the batch funnel."""
    import os
    import time as _time

    from semantic_cpp_spark.operators import eventflow

    M = 1_000_000
    # user 1 completes across 3 slices; user 2 stalls at view; user 3's
    # purchase precedes its view (never completes stage 3).
    slices = [
        [(0, 1, 10, "signup", 0.0), (1, 2, 11, "signup", 0.0),
         (2, 3, 12, "signup", 0.0), (3, 3, 13, "purchase", 0.0)],
        [(4, 1, 20, "view", 0.0), (5, 2, 21, "view", 0.0)],
        [(6, 1, 30, "purchase", 0.0), (7, 3, 31, "view", 0.0)],
    ]
    src = str(tmp_path / "funnel_slices")
    os.makedirs(src)
    schema = "event_id long, user_id long, ts long, event_type string, value double"
    for i, rows in enumerate(slices):
        scaled = [(e, u, t * M * 1000, et, v) for e, u, t, et, v in rows]  # ns
        spark.createDataFrame(scaled, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic trigger order
    stream = _stream(spark, src)
    out = ops.run_to_memory(ops.funnel_stages_per_user(stream), "update")
    latest = {}
    for r in out.collect():
        cur = latest.get(r["user_id"])
        if cur is None or r["stage"] >= cur["stage"]:
            latest[r["user_id"]] = r
    batch = spark.read.parquet(src).withColumn(
        "tus", ts_micros(spark.read.parquet(src))
    )
    expect = {
        r["user_id"]: r
        for r in eventflow.funnel(
            batch, ["signup", "view", "purchase"]
        ).collect()
    }
    assert set(latest) == set(expect) == {1, 2, 3}
    for u in expect:
        for c in ("t_1", "t_2", "t_3", "stage"):
            assert latest[u][c] == expect[u][c], (u, c)
    assert latest[1]["stage"] == 3 and latest[2]["stage"] == 2
    # user 3's early purchase (before any view) never fills stage 3, but
    # the later view still advances it to stage 2 — batch semantics.
    assert latest[3]["stage"] == 2 and latest[3]["t_3"] is None


def test_last_touch_across_micro_batches(spark, tmp_path):
    """Attribution state must stitch across micro-batches on a
    time-ordered stream: a touch in file 1 credits a conversion in
    file 3, a newer touch in file 2 supersedes the older one, and the
    streamed rows equal the batch operator exactly."""
    import os
    import time as _time

    from semantic_cpp_spark.operators import eventflow

    M = 1_000_000
    slices = [
        [(0, 1, 10, "view", 0.0), (1, 2, 11, "click", 0.0)],
        [(2, 1, 20, "click", 0.0), (3, 2, 21, "purchase", 0.0)],
        [(4, 1, 30, "purchase", 0.0), (5, 3, 31, "purchase", 0.0)],
    ]
    src = str(tmp_path / "attr_slices")
    os.makedirs(src)
    schema = "event_id long, user_id long, ts long, event_type string, value double"
    for rows in slices:
        scaled = [(e, u, t * M * 1000, et, v) for e, u, t, et, v in rows]
        spark.createDataFrame(scaled, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)
    stream = _stream(spark, src)
    out = {r["event_id"]: r for r in ops.run_to_memory(
        ops.last_touch_per_user(stream), "append").collect()}
    batch = spark.read.parquet(src)
    batch = batch.withColumn("tus", ts_micros(batch))
    expect = {r["event_id"]: r for r in eventflow.last_touch_attribution(
        batch, lookback_us=7 * 86_400_000_000).collect()}
    assert set(out) == set(expect) == {3, 4, 5}
    for eid in expect:
        for c in ("user_id", "t_conv", "t_touch", "touch_type", "latency_us"):
            assert out[eid][c] == expect[eid][c], (eid, c)
    # cross-batch: u1's purchase credits the NEWER click from file 2
    assert out[4]["touch_type"] == "click" and out[4]["t_touch"] == 20 * M
    # u3 never touched -> unattributed row still emitted
    assert out[5]["t_touch"] is None


def test_sliding_cms_one_sided_bound_and_fixed_state(spark):
    """The CMS sketch form vs exact in-window frequencies on the fixture
    stream: every closed window emits exactly the 10-user probe set,
    each estimate >= the true frequency (one-sided CMS guarantee, with
    0 exact when the user never hit the window and no cell collided),
    and the error stays inside the textbook e·N/w expectation band.
    State is the 4x1024 counter constant, not the audience size."""
    from semantic_cpp_spark.streaming.ops import (
        CMS_D,
        CMS_PROBE_USERS,
        CMS_W,
        cms_cell,
        sliding_user_freq_cms,
    )

    # deterministic cell derivation parity with the batch sketch
    from semantic_cpp_spark.pipeline import curation

    for r in range(CMS_D):
        for u in (0, 7, 12345):
            import hashlib

            h = int(
                hashlib.md5(f"cms{r}-{u}".encode()).hexdigest()[:15], 16
            )
            assert cms_cell(u, r) == h % CMS_W

    ev = ops.read_events_stream(spark, "/root/testdata/sf0.001")
    est = {}
    for row in ops.run_to_memory(
        sliding_user_freq_cms(ev), "append"
    ).collect():
        est[(row["win_start"], row["user_id"])] = row["cms_count"]
    assert est
    wins = {w for w, _ in est}
    assert all((w, u) in est for w in wins for u in CMS_PROBE_USERS)

    # exact per-(window, user) frequencies for the same closed windows,
    # replayed in batch over the same 6h/1h window explosion
    from semantic_cpp_spark.session import load_table, ts_micros

    raw = load_table(spark, "/root/testdata/sf0.001", "events")
    tus = ts_micros(raw)
    hr = (tus / F.lit(3_600_000_000)).cast("long")
    exploded = raw.select(
        "user_id",
        F.explode(
            F.sequence(hr - F.lit(5), hr)
        ).alias("win_start"),
    )
    exact = {
        (r["win_start"], r["user_id"]): r["n"]
        for r in exploded.groupBy("win_start", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = raw.count()
    # one-sided: estimate never under-counts; expected overshoot ~ N/w
    for (w, u), c in est.items():
        true = exact.get((w, u), 0)
        assert c >= true, (w, u, c, true)
        assert c - true <= max(10, 0.05 * n_total), (w, u, c, true)


def test_sliding_quantiles_error_band_and_binning_parity(spark):
    """The quantile-sketch sliding form: (1) the Python qsketch_bin twin
    must agree with rollup._quantize bin-for-bin (the property that
    makes the SQL oracle valid); (2) every closed window's p50/p95/p99
    is within the 2^-7 relative bound of the EXACT in-window lower
    quantile computed from the raw events."""
    import random

    from semantic_cpp_spark.operators import rollup
    from semantic_cpp_spark.streaming.ops import (
        qsketch_bin,
        sliding_value_quantiles,
    )

    rng = random.Random(11)
    vals = [rng.randint(-(10**7), 10**9) for _ in range(400)] + list(
        range(-260, 261, 37)
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    spark_bins = [
        r["q"]
        for r in df.select(rollup._quantize("v").alias("q"))
        .orderBy("q")
        .collect()
    ]
    assert spark_bins == sorted(qsketch_bin(v) for v in vals)

    out = ops.run_to_memory(
        sliding_value_quantiles(
            ops.read_events_stream(spark, "/root/testdata/sf0.001")
        ),
        "append",
    ).collect()
    assert out, "no closed windows emitted"
    from semantic_cpp_spark.session import load_table, ts_micros

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (ts_micros(ev) / F.lit(3_600_000_000)).cast("long").alias("hr"),
    )
    by_hr = {}
    for r in rows.collect():
        by_hr.setdefault(r["hr"], []).append(r["cents"])
    checked = 0
    for r in out[:40]:
        win = [
            c
            for h in range(r["win_start"], r["win_start"] + 6)
            for c in by_hr.get(h, [])
        ]
        if not win:
            continue
        win.sort()
        assert r["n"] == len(win)
        for p in (50, 95, 99):
            exact = win[(len(win) * p + 99) // 100 - 1]
            got = r[f"p{p}"]
            assert abs(got - exact) <= abs(exact) * 2**-7 + 1, (
                r["win_start"], p, got, exact,
            )
        checked += 1
    assert checked >= 10


def test_tokenizer_kernels_run_on_structured_streaming(spark, tmp_path):
    """The Arrow tokenizer kernels (BPE merge-apply and unigram
    Viterbi) are 1->1 mapInPandas with task-closure state — exactly
    the shape Structured Streaming supports stateless. Pin the claim:
    a file stream of documents segments per micro-batch and matches
    the batch output row for row (so an INCREMENTAL ingestion pipeline
    can tokenize with the SAME call the batch path uses)."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.pipeline import text as T
    from semantic_cpp_spark.pipeline import unigram

    src = str(tmp_path / "docs")
    docs = spark.createDataFrame(
        [(i, txt) for i, txt in enumerate(["hey lo", "lo lo hey", "he he"] * 4)],
        "doc_id long, text string",
    )
    docs.repartition(3).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    rules = [("h", "e"), ("l", "o")]
    pieces = [("h", -1_000_000), ("e", -1_200_000), ("y", -1_400_000),
              ("l", -1_100_000), ("o", -1_050_000), ("lo", -1_500_000)]

    want_bpe = sorted(
        map(tuple, T.bpe_segment(
            batch, F.col("text"), F.col("doc_id"), rules, impl="kernel"
        ).collect())
    )
    got_bpe = sorted(
        map(tuple, ops.run_to_memory(
            T.bpe_segment(
                stream, F.col("text"), F.col("doc_id"), rules, impl="kernel"
            ),
            "append",
        ).collect())
    )
    assert got_bpe == want_bpe

    want_uni = sorted(
        map(tuple, unigram.viterbi_segment(
            batch, F.col("text"), F.col("doc_id"), pieces
        ).collect())
    )
    got_uni = sorted(
        map(tuple, ops.run_to_memory(
            unigram.viterbi_segment(
                stream, F.col("text"), F.col("doc_id"), pieces
            ),
            "append",
        ).collect())
    )
    assert got_uni == want_uni

    # the r13 standalone-eow variant is the same stateless kernel shape —
    # boundary-piece emission must not change streaming eligibility
    want_eow = sorted(
        map(tuple, unigram.viterbi_segment(
            batch, F.col("text"), F.col("doc_id"), pieces, eow="</w>"
        ).collect())
    )
    got_eow = sorted(
        map(tuple, ops.run_to_memory(
            unigram.viterbi_segment(
                stream, F.col("text"), F.col("doc_id"), pieces, eow="</w>"
            ),
            "append",
        ).collect())
    )
    assert got_eow == want_eow and want_eow != want_uni


def test_lm_scoring_runs_on_structured_streaming(spark, tmp_path):
    """CCNet-style perplexity scoring of an INCREMENTAL corpus: the LM
    model tables are static (trained on a reference slice); the
    document stream left-joins them (stream-static joins) and
    aggregates per doc in update mode — the same lm_score_* call the
    batch path uses, batch==stream row for row, for BOTH smoothing
    generations (JM and interpolated KN). A complete-document-per-file
    source keeps every doc's events inside one micro-batch, so the
    per-doc sums are final when emitted (the realistic ingestion
    shape: documents arrive whole)."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.pipeline import retrieval

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat on the mat", "a dog ate the bone",
             "the cat ate a fish", "a dog sat on a log"] * 3
        )],
        "doc_id long, text string",
    )
    src = str(tmp_path / "scoredocs")
    te = spark.createDataFrame(
        [(100, "the cat sat"), (101, "zz qq"), (102, "a dog ate the mat")],
        "doc_id long, text string",
    )
    te.repartition(3).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    for train_fn, score_fn in (
        (retrieval.lm_train_trigram, retrieval.lm_score_trigram),
        (retrieval.lm_train_kn_trigram, retrieval.lm_score_kn_trigram),
    ):
        lm = train_fn(train, F.col("text"))
        want = sorted(
            map(tuple, score_fn(
                batch, F.col("text"), F.col("doc_id"), lm
            ).collect())
        )
        got = sorted(
            map(tuple, ops.run_to_memory(
                score_fn(stream, F.col("text"), F.col("doc_id"), lm),
                "update",
            ).collect())
        )
        assert got == want, train_fn.__name__


def test_dsir_scoring_runs_on_structured_streaming(spark, tmp_path):
    """DSIR importance scoring of an INCREMENTAL corpus: the λ table is
    static (trained once on a reference corpus, exactly B rows,
    broadcast); the document stream joins it (stream-static broadcast
    join) and aggregates per doc in update mode — the same dsir_score
    call the batch path uses, batch==stream row for row. Unseen
    features are covered by the densified λ spine (every bucket
    present), so a NEW document with out-of-corpus vocabulary still
    scores every feature (Laplace floor) instead of dropping events —
    doc 102 below is entirely OOV vocabulary and must emit n_feats=5."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.pipeline import curation

    train = spark.createDataFrame(
        [(i, t, i % 2 == 0) for i, t in enumerate(
            ["the cat sat on the mat", "a dog ate the bone",
             "the cat ate a fish", "a dog sat on a log"] * 3
        )],
        "doc_id long, text string, is_tgt boolean",
    )
    lam = curation.dsir_train(train, F.col("text"), F.col("is_tgt"))
    assert lam.count() == curation.DSIR_BUCKETS  # densified spine
    src = str(tmp_path / "dsirdocs")
    te = spark.createDataFrame(
        [(100, "the cat sat"), (101, "a dog ate a fish"),
         (102, "zz qq xx")],
        "doc_id long, text string",
    )
    te.repartition(3).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    want = sorted(
        map(tuple, curation.dsir_score(
            batch, F.col("text"), F.col("doc_id"), lam
        ).collect())
    )
    assert len(want) == 3
    oov = [r for r in want if r[0] == 102]
    assert oov and oov[0][1] == 5  # 3 unigrams + 2 bigrams, none dropped
    got = sorted(
        map(tuple, ops.run_to_memory(
            curation.dsir_score(stream, F.col("text"), F.col("doc_id"), lam),
            "update",
        ).collect())
    )
    assert got == want
