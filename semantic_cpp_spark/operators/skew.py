"""Skew-resilient aggregation — the salting pattern for hot keys.

At 100 TB a groupBy on a key with a dominant value funnels that key's
entire volume through one reducer. AQE's skew-join handling covers joins;
for AGGREGATES the classic fix is salting: two-stage aggregation where
stage 1 groups on (key, salt) — spreading a hot key over `salt_buckets`
reducers — and stage 2 merges the partial states per key.

Works for any algebraic aggregate (the reference's Accumulator/Combiner
split, collector.h:51-153, is exactly what makes two-stage legal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: Column,
    salt_buckets: int = 16,
    **aggs: tuple[str, Column],
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name → (merge_fn_name, partial_agg_column)
    where merge_fn_name ∈ {"sum", "min", "max"} re-aggregates the partial
    values (count partials merge with "sum").

    Example::

        salted_agg(df, F.col("user_id"),
                   n=("sum", F.count(F.lit(1))),
                   total=("sum", F.sum("value")),
                   hi=("max", F.max("value")))
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key.alias("key"), F.col("__salt")).agg(
        *[col.alias(f"__p_{name}") for name, (_, col) in aggs.items()]
    )
    mergers = {"sum": F.sum, "min": F.min, "max": F.max}
    final = partial.groupBy("key").agg(
        *[
            mergers[fn](f"__p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
    return final
