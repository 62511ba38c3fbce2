"""Count-based windows over the logical index (reference semantic.h:1595-1643,
SURVEY §2.8) — batch surface. Event-time/streaming windows live in
``semantic_cpp_spark.streaming``.

The reference's windows are ROW-COUNT windows over normalised indices:
``slide(size, step)`` emits windows [start, start+size) for start = 0,
step, 2·step, …; the last window may be partial; each window is itself a
stream (window-as-element). We represent a window as an ArrayType column
in index order plus its start ordinal — downstream per-window aggregates
use higher-order functions (transform/aggregate/filter) so the whole
pipeline stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_cpp_spark.indexing import IDX


def tumble(df: DataFrame, size: int, idx: str = IDX) -> DataFrame:
    """tumble(size) ≡ slide(size, size) (reference semantic.h:910-913):
    non-overlapping chunks — a plain groupBy on floor(idx/size), one
    shuffle, no window function needed. Output: (win_start long,
    values array) with values in index order."""
    size = max(int(size), 1)
    start = (F.floor(F.col(idx) / F.lit(size)) * size).cast("long")
    packed = F.struct(F.col(idx).alias("i"), F.col("value").alias("v"))
    return (
        df.select(start.alias("win_start"), packed.alias("p"))
        .groupBy("win_start")
        .agg(F.array_sort(F.collect_list("p")).alias("ps"))
        .select("win_start", F.transform("ps", lambda s: s["v"]).alias("values"))
    )


def slide(df: DataFrame, size: int, step: int, idx: str = IDX) -> DataFrame:
    """slide(size, step) with overlap (reference semantic.h:1595-1643).

    Each element at index i belongs to windows starting at
    s ∈ {ceil((i-size+1)/step)·step … floor(i/step)·step} ∩ step·ℕ.
    Rather than a global Window.rowsBetween (single-task over an
    unpartitioned ordering), we REPLICATE each row into its ≤⌈size/step⌉
    windows via a generated start array + explode, then groupBy window
    start — shuffle volume size/step × data, but fully parallel and
    AQE-coalesced; this is the scalable plan for overlapping count windows.
    Output: (win_start long, values array) in index order.
    """
    size = max(int(size), 1)
    step = max(int(step), 1)
    i = F.col(idx)
    lo = F.ceil((i - F.lit(size) + 1) / F.lit(step)).cast("long")
    lo = F.greatest(lo, F.lit(0).cast("long"))
    hi = F.floor(i / F.lit(step)).cast("long")
    # sequence(lo, hi) DESCENDS when lo > hi — guard the "element belongs
    # to no window" case (step > size gaps) with an empty array.
    ks = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
        F.array().cast("array<long>")
    )
    starts = F.transform(ks, lambda k: (k * step).cast("long"))
    packed = F.struct(i.alias("i"), F.col("value").alias("v"))
    return (
        df.select(F.explode(starts).alias("win_start"), packed.alias("p"))
        .groupBy("win_start")
        .agg(F.array_sort(F.collect_list("p")).alias("ps"))
        .select("win_start", F.transform("ps", lambda s: s["v"]).alias("values"))
    )


def window_aggregate(windows: DataFrame, agg: str = "sum") -> DataFrame:
    """Per-window numeric aggregate over the ArrayType window column —
    the reference's map-over-windows pattern (window-as-element feeding
    collectors, SURVEY §3.2). Runs via higher-order `aggregate`, no UDF."""
    vals = F.col("values")
    n = F.size(vals)
    total = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x.cast("double"))
    if agg == "sum":
        out = total
    elif agg == "avg":
        out = F.when(n > 0, total / n).otherwise(F.lit(0.0))
    elif agg == "min":
        out = F.array_min(vals).cast("double")
    elif agg == "max":
        out = F.array_max(vals).cast("double")
    elif agg == "count":
        out = n.cast("double")
    else:
        raise ValueError(f"unknown agg {agg}")
    return windows.select("win_start", out.alias(agg), n.alias("win_len"))
