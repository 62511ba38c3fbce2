"""Structured Streaming surface: batch/stream parity and cross-batch
state (semantic_cpp_spark.streaming.ops)."""

import pytest
from pyspark.sql import functions as F

from semantic_cpp_spark.streaming import ops

SF = "/root/testdata/sf0.001"


def _batch_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF}/events.parquet")


def test_tumbling_counts_equal_batch(spark):
    ev = ops.read_events_stream(spark, SF)
    out = ops.run_to_memory(ops.tumbling_counts(ev, "1 hour"), "complete")
    got = {r["win_start_s"]: r["n"] for r in out.collect()}
    batch = (
        _batch_events(spark)
        .groupBy(
            ((F.expr("ts div 3600000000000")) * 3600).alias("w")
        )
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
    stream = (
        spark.readStream.schema(ops.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    )

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
    stream = (
        spark.readStream.schema(ops.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    )
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
