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
    """Profile ``columns`` of ``df``. Output rows (column, n_rows,
    n_nulls, n_distinct, min_str, max_str) — min/max rendered as
    strings so mixed-type columns share one schema.

    Plan shape (r15): the count/nulls/min/max stats still fuse into ONE
    keyless aggregation pass, but the distinct counts run as one
    PRUNED-SCAN hash aggregate per column instead of riding the same
    agg — Spark rewrites N count_distincts in one agg as an Expand
    (every row replicated N+1 times) and the string min/max buffers
    force the whole thing into SortAggregate, so the profile paid a
    full sort of rows×(N+1) expanded tuples (measured: the sort
    dominated the gate). Per-column distincts are partial-aggregated
    hash groupBys over a single-column scan; their 1-row counts
    broadcast back onto the wide stats row. Null semantics replicate
    count_distinct exactly (nulls excluded). Production profiles at
    100 TB swap in approx_count_distinct, which folds back into the
    single pass (sketch buffers hash-aggregate fine)."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    for c in columns:
        # count_distinct semantics: distinct over NON-NULL values only
        dc = (
            df.filter(F.col(c).isNotNull())
            .select(c)
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias(f"{c}__distinct"))
        )
        wide = wide.crossJoin(F.broadcast(dc))
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
