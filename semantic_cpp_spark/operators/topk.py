"""Skew-proof exact per-group top-k.

`row_number() OVER (PARTITION BY group ORDER BY ...)` routes EVERY row of
the input into one partition per group — when the group column has a
handful of values (market segment, language, source tier), that is a
handful of hot partitions each holding a corpus-scale sort: the worst
skew shape at 100 TB, with parallelism = #groups no matter how many
executors exist.

`grouped_topk` keeps the exact same result through two phases:

1. rows scatter into ``buckets`` sub-groups per group (a hash of any
   per-row expression — the routing affects only WHERE rows are ranked,
   never the result) and each (group, bucket) keeps its local top-k:
   parallelism = #groups × buckets, every sort input ≈ 1/buckets of the
   group;
2. the ≤ #groups·buckets·k survivors — a bounded frame — rank under the
   original total order for the final, exact top-k and rank numbers.

Exactness: a row outside its bucket's top-k is dominated by ≥ k rows of
its own group and can never be in the group's global top-k, so phase 1
discards only non-answers; phase 2 re-ranks survivors under the full
ordering, so ranks are identical to the single-window form (pinned by
equivalence tests). The ordering must be TOTAL within each group
(include a unique tiebreaker) — the same requirement the single window
had for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    k: int,
    bucket_on: Column,
    rank_name: str = "rk",
    buckets: int = 64,
) -> DataFrame:
    """Exact top-``k`` rows per ``part_cols`` group under ``order_cols``
    (must totally order rows within a group), with the rank in
    ``rank_name`` (1-based int). ``bucket_on`` is any per-row expression
    to scatter on (a unique id is ideal; ties in it are harmless);
    ``buckets`` sizes phase-1 parallelism — #groups × buckets tasks."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    w1 = Window.partitionBy(*part_cols, "__tkb").orderBy(*order_cols)
    w2 = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn("__tkb", F.pmod(F.xxhash64(bucket_on), F.lit(buckets)))
        .withColumn("__tkr1", F.row_number().over(w1))
        .filter(F.col("__tkr1") <= k)
        .drop("__tkb", "__tkr1")
        .withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= k)
    )
