"""Sinks and physical-layout features: foreachBatch exactly-once pattern,
bucketed co-located joins (shuffle-free join on the bucket key)."""

import os

from pyspark.sql import functions as F

from semantic_cpp_spark.streaming import ops

SF = "/root/testdata/sf0.001"


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    """foreachBatch: the exactly-once sink pattern — write each micro-batch
    keyed by batch_id so retries overwrite instead of duplicating."""
    out_dir = str(tmp_path / "sink")
    seen = []

    def write_batch(df, batch_id):
        seen.append(batch_id)
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch={batch_id}")
        )

    ev = ops.read_events_stream(spark, SF).select("event_id", "value")
    q = ev.writeStream.outputMode("append").foreachBatch(write_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen == [0]
    written = spark.read.parquet(f"{out_dir}/batch=0")
    assert written.count() == 1000  # all sf0.001 events, exactly once


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """bucketBy co-location: both sides bucketed on the join key join with
    ZERO Exchange operators — the pre-shuffled layout big pipelines pay
    for once and reuse (SURVEY 'Partitioning & shuffle')."""
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bktest.orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bktest.lineitem_b")
    )
    # disable broadcast so the planner actually exercises the bucketed
    # sort-merge path (at real scale both sides exceed the threshold anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bktest.lineitem_b").join(
            spark.table("bktest.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located buckets: no shuffle at all
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_write_enables_partition_pruning(spark):
    """Hive-style partitionBy(lang) layout: a lang filter must become a
    PartitionFilter (pruned at planning — unselected partitions never
    open), not a post-scan filter. The write-side layout that makes
    per-language corpus reads O(selected) at 100 TB."""
    import tempfile

    from pyspark.sql import functions as F

    from semantic_cpp_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    with tempfile.TemporaryDirectory(prefix="part_") as tmp:
        dst = f"{tmp}/by_lang"
        docs.write.partitionBy("lang").parquet(dst)
        rd = spark.read.parquet(dst).filter(F.col("lang") == "en")
        plan = rd._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "lang" in plan.split("PartitionFilters")[1][:200]
        # only the en partition's rows come back
        assert rd.count() == docs.filter(F.col("lang") == "en").count()
        # (df.inputFiles() is relation-level and deliberately ignores
        # pruning, so the PartitionFilters plan assertion above is the
        # correct probe for files-skipped.)
