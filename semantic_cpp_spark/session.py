"""SparkSession factory for the engine.

Local-mode defaults match the driver environment (local[32], single JVM);
on a real cluster the same settings are sane starting points — AQE handles
runtime re-planning, Arrow accelerates the few pandas_udf kernels.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "semantic_cpp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults:
    - AQE on (runtime coalesce / skew-join handling — the scale path).
    - shuffle.partitions ~= cores locally; on a cluster leave to AQE.
    - Arrow on for pandas_udf kernels (FFT, gradient, multimodal).
    - UTC session timezone so timestamps hash-match the DuckDB oracle.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.ts is parquet TIMESTAMP(NANOS) — unsupported by Spark's
        # reader; surface it as LongType epoch-nanos instead (converted to
        # TimestampType where event-time semantics are needed, see
        # streaming module).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Load one fixture table (TESTDATA.md) as a DataFrame.

    Sets ``nanosAsLong`` on the CALLER's session too: the driver invokes
    our queries with its own SparkSession, and events.ts is parquet
    TIMESTAMP(NANOS) which Spark rejects otherwise (probe-verified).
    The conf is runtime-settable and only affects nanos columns.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
