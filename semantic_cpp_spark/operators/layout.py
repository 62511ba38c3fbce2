"""Data-layout operators: Z-order (Morton) clustering — interleave the
bits of two dimension keys so that sorting by the combined value keeps
rows close in BOTH dimensions, then write in that order. Files then
carry tight min/max ranges on every clustered column, and scans
filtering on ANY of them skip files (the lakehouse OPTIMIZE ZORDER
pattern, built from nothing but integer Column math).

All bit math is int64 shifts/masks — engine-portable (the DuckDB oracle
reproduces the interleave exactly), and a pure narrow map: computing z
adds zero shuffles; the clustering itself is the one range exchange of
the final sort-before-write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits kept per dimension → z fits easily in int64


def zvalue(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton code of two non-negative int columns (low ``bits`` of
    each): bit b of x lands at position 2b, bit b of y at 2b+1."""
    z = None
    for b in range(bits):
        xt = F.shiftright(x.cast("long"), b).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * b)
        ).cast("long")
        yt = F.shiftright(y.cast("long"), b).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * b + 1)
        ).cast("long")
        t = xt + yt
        z = t if z is None else z + t
    return z


def zvalue_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """DuckDB expression mirroring zvalue bit-for-bit."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")::BIGINT"


def zorder_bucket_stats(
    df: DataFrame, x: Column, y: Column, n_buckets: int
) -> DataFrame:
    """Locality report for a z-order clustering: rank rows by z-value,
    cut into ``n_buckets`` equal runs (what the writer would turn into
    files), and report each run's bounding box over both dimensions.
    Tight boxes = effective min/max pruning on either column. Output
    (bucket, n, x_min, x_max, y_min, y_max)."""
    from semantic_cpp_spark.indexing import with_ordinal

    # global rank via the engine ordinal (bucket/range zipWithIndex) —
    # NOT a partitionless row_number window (single-task sort).
    ranked = with_ordinal(
        df.select(x.cast("long").alias("__x"), y.cast("long").alias("__y"))
        .withColumn("__z", zvalue(F.col("__x"), F.col("__y"))),
        ["__z", "__x", "__y"],
        name="__r",
    )
    total = ranked.agg(F.count(F.lit(1)).alias("__n"))
    bucket = F.floor(
        F.col("__r") * n_buckets / F.col("__n")
    ).cast("long")
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
    )
