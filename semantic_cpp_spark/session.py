"""SparkSession factory for the engine.

Local-mode defaults match the driver environment (local[32], single JVM);
on a real cluster the same settings are sane starting points — AQE handles
runtime re-planning, Arrow accelerates the few pandas_udf kernels.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _default_driver_mem(master: str) -> str:
    """Driver-JVM heap default: 8g, env-overridable via
    SPARK_GRAFT_DRIVER_MEM.

    HISTORY (r15→r16): r15 shipped a RAM/4 [8g,32g] local-mode default
    after one sweep-shaped measurement (a heavy gate at 49.5 s in GC
    thrash at 8g after a pandas-UDF-heavy gate). The r15 driver bench
    then regressed 33% (geomean 0.668) and the r16 A/B on a 128 GiB /
    32-core host reversed the call decisively on bench.py's own
    protocol, SAME session shape, heavy tier included (SCALING.md r16
    table): headline sf0.1 median 14.65 s at 31g vs 8.30 s at 8g;
    heavy tier sf1.0 130.9 s at 31g (txt_lm_perplexity_bands 96.1 s)
    vs 20.9 s at 8g. A huge heap makes young-gen collections sparse
    and tenuring deep, so short-lived per-query garbage from 32
    allocating threads accumulates and late-session queries degrade
    (the 31g baseline's LAST three headline queries ran 3-6× their 8g
    times); a small heap keeps collections frequent and cheap and lets
    the ContextCleaner's weak references actually get processed. A
    session that genuinely needs a bigger heap (huge collected models,
    very large broadcast builds) sets SPARK_GRAFT_DRIVER_MEM
    explicitly — that is a workload property, not a host property, so
    it must not be derived from host RAM."""
    return os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")


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
        .config("spark.driver.memory", _default_driver_mem(master))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Fixture generations have stored events.ts as either parquet
        # TIMESTAMP(NANOS) (Spark can only surface that as LongType
        # epoch-nanos) or TIMESTAMP(MICROS) (read natively as
        # TIMESTAMP_NTZ). Keep the nanos escape hatch on and dispatch on
        # the observed dtype via ts_micros()/event_time_col().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Reference charset semantics (charsequence.h:265-495): invalid
        # bytes decode to U+FFFD, unmappable chars encode to '?'. Spark 4's
        # default is ANSI-strict (MALFORMED_CHARACTER_CODING throw) —
        # hostile-byte fuzzing exposed this (r6); REPLACE restores the
        # reference's policy. Pinned by tests/test_charsets_hypothesis.py.
        .config("spark.sql.legacy.codingErrorAction", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ADVICE r15: builder confs only take effect when THIS call launches
    # the JVM; getOrCreate against a pre-existing session silently keeps
    # its heap. Surface the mismatch so a heap-sensitive run (bench,
    # heavy gates) can't mis-measure silently.
    try:
        requested = _default_driver_mem(master)
        actual = spark.conf.get("spark.driver.memory", None)
        if actual is not None and actual != requested:
            import warnings

            warnings.warn(
                f"get_spark: reused existing SparkSession with "
                f"spark.driver.memory={actual} (requested {requested}); "
                "driver heap is fixed at JVM launch",
                RuntimeWarning,
                stacklevel=2,
            )
    except Exception:
        pass
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Load one fixture table (TESTDATA.md) as a DataFrame.

    SESSION-GLOBAL SIDE EFFECT (deliberate, ADVICE r5): this sets
    ``spark.sql.legacy.parquet.nanosAsLong=true`` and
    ``spark.sql.session.timeZone=UTC`` on the CALLER's session — not just
    for the loaded table but for everything that session runs afterwards.
    Both are engine invariants, not per-table tweaks: the driver invokes
    our queries with its own SparkSession, where (a) a TIMESTAMP(NANOS)
    events.ts is rejected by Spark's reader without the nanos conf
    (probe-verified), and (b) a non-UTC session would silently shift every
    NTZ→TIMESTAMP cast relative to the DuckDB oracle's naive epoch. Every
    query in this engine requires both settings, so the loader — the one
    choke point every registered query passes through — pins them. A
    caller embedding this engine in a session that needs a different
    timezone should run engine queries on a separate SparkSession
    (``get_spark()``), which sets the same confs at construction time.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin UTC on the caller's session too (ADVICE r4): the NTZ branch of
    # ts_micros casts TIMESTAMP_NTZ -> TIMESTAMP, which reads the wall-clock
    # in the SESSION timezone — on a non-UTC driver session every timestamp
    # would silently shift vs the DuckDB oracle's naive epoch.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # U+FFFD replacement on invalid charset input (see get_spark) — the
    # reference's decode policy must hold on the driver's session too.
    spark.conf.set("spark.sql.legacy.codingErrorAction", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def ts_micros(df: DataFrame, col: str = "ts") -> Column:
    """Integer epoch-microseconds from a fixture timestamp column,
    dispatching on the column's observed dtype.

    Fixture generations differ: TIMESTAMP(NANOS) parquet surfaces in
    Spark as LongType epoch-nanos (via nanosAsLong), TIMESTAMP(MICROS)
    as TIMESTAMP_NTZ. Both reduce to the same int64 epoch-micros that the
    DuckDB oracle computes with ``epoch_ns(ts) // 1000``:

    - long nanos: integer ``div 1000`` (NOT float division — epoch nanos
      ~1.7e18 exceed double's 2^53 mantissa, so ``/`` corrupts the low
      microseconds);
    - timestamp / timestamp_ntz: ``unix_micros`` after a cast to
      TIMESTAMP, exact because the session timezone is pinned to UTC so
      the NTZ wall-clock IS the UTC instant (matching DuckDB's naive
      epoch).

    Integer micros (never the raw timestamp) are the engine's event-time
    currency: all window/gap/as-of arithmetic stays in int64, immune to
    calendar/timezone semantics and exact at any scale.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return F.expr(f"{col} div 1000")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(col).cast("timestamp"))
    raise TypeError(f"unsupported fixture time dtype for {col!r}: {dt}")


def event_time_col(df: DataFrame, col: str = "ts") -> Column:
    """TIMESTAMP event-time from a fixture time column (see ts_micros for
    the dtype dispatch). Used where Spark needs a real TimestampType —
    watermarks, window()/session_window() — rather than int64 micros."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.col(col).cast("timestamp")
    raise TypeError(f"unsupported fixture time dtype for {col!r}: {dt}")
