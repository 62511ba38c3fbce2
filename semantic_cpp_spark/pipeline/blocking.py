"""Shared blocking utilities for the dedup/similarity self-joins.

The one failure mode every bucket-blocked self-join shares: a HOT bucket.
Blocking keeps total work near-linear on uniform data, but real corpora
cluster (duplicate clusters, boilerplate, embedding clusters), and a
bucket of size m contributes m²/2 candidate pairs that Spark executes as
ONE task — a straggler no matter how many executors exist (measured at
the r6 sf1.0 step-up: one 2-task stage ran ~25 min while 30 cores idled).
AQE's skew-join split cannot help: it splits by data SIZE on one side,
but a self-join bucket must meet itself, and the pair explosion happens
AFTER the join keys match.

The fix is the classic TRIANGLE-DISTRIBUTED self-join: members of a
bucket of size m get one of g = ceil(m / cap) deterministic groups; the
left side replicates each row over t ∈ [0, g) under key
(bucket, gid, t), the right under (bucket, t, gid). A pair (a, b) meets
EXACTLY ONCE — at (bucket, gid_a, gid_b) — so results are bit-identical
to the plain self-join (the DuckDB oracles stay plain self-joins), while
the bucket's m² work fans out into g² independent tasks of ≤ cap² pairs.
Cold buckets (the overwhelming majority) have g = 1: one replica, the
degenerate (bucket, 0, 0) key — i.e. the plain join, zero overhead.

Total work is unchanged — for a duplicate CLIQUE the pair OUTPUT is
itself quadratic in the clique size, which no pair-enumerating operator
can avoid; the scalable representation for monster cliques is the
cluster keep-list (dedup.dedup_keep_list), not the pair set. What this
removes is the straggler: quadratic work now parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_tag(
    df: DataFrame, key_cols: list[str], id_col: str, bucket_cap: int
) -> DataFrame:
    """Append __gid / __t to ``df`` so a self-join on
    ``key_cols + [a.__gid == b.__t, a.__t == b.__gid]`` meets every
    within-bucket pair exactly once while spreading buckets larger than
    ``bucket_cap`` over ceil(m/cap)² tasks. Row count multiplies by g
    (1 for cold buckets). ``id_col`` seeds the deterministic group hash."""
    sizes = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__bn"))
    return (
        df.join(sizes, key_cols)  # co-partitioned on the bucket key
        .withColumn(
            "__g", F.ceil(F.col("__bn") / F.lit(float(bucket_cap))).cast("int")
        )
        .withColumn(
            "__gid", F.pmod(F.xxhash64(id_col), F.col("__g")).cast("int")
        )
        .withColumn("__t", F.explode(F.sequence(F.lit(0), F.col("__g") - 1)))
        .drop("__bn", "__g")
    )


def triangle_cond(a_alias: str = "a", b_alias: str = "b"):
    """The group-matching conjuncts for a triangle-tagged self-join whose
    sides carry the given aliases (string form — df["col"] would be
    ambiguous on a self-join of the same plan)."""
    return (F.col(f"{a_alias}.__gid") == F.col(f"{b_alias}.__t")) & (
        F.col(f"{a_alias}.__t") == F.col(f"{b_alias}.__gid")
    )
