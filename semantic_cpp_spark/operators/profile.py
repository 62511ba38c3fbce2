"""Table profiling: per-column stats summary (count / nulls / distinct /
min / max) — the data-engineering health check that runs before any
pipeline touches a new drop of data.

One pass, one aggregation: all columns' stats compute in a single
groupBy-less agg (Catalyst fuses them into one partial+final), then the
wide 1-row result unpivots to (column, metric...) rows via a stack —
no per-column jobs, no collect. Distinct counts are exact here (the
fixture oracle needs determinism); production profiles at 100 TB swap
`count_distinct` for `approx_count_distinct` per column — same plan
shape, sketch-sized state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """Profile ``columns`` of ``df`` in one aggregation pass. Output rows
    (column, n_rows, n_nulls, n_distinct, min_str, max_str) — min/max
    rendered as strings so mixed-type columns share one schema."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS "
            "(column, n_rows, n_nulls, n_distinct, min_str, max_str)"
        )
    )
