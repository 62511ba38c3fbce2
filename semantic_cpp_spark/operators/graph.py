"""Graph operators over pair/edge lists (complementing
pipeline.dedup.connected_components): PageRank by power iteration —
the canonical "importance over a link graph" primitive, useful on the
near-dup graph (which duplicate is the canonical one?) and on any
reference/citation structure a corpus carries.

Iterative → no SQL oracle (driver records rows-only if registered);
pinned against a dense numpy implementation in tests, like gradient
descent (SURVEY §2.5).

Scale design: one join + one groupBy-sum per iteration, both keyed on
the node id; ranks and contributions shuffle as (node, double) pairs
only. Each round localCheckpoints — same lineage-truncation requirement
as connected_components (a persisted-only loop overflows the JVM stack
printing the plan past ~10 rounds). Dangling nodes (no out-edges)
redistribute uniformly via a 1-row scalar broadcast, keeping Σpr = 1
without any driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    damping: float = 0.85,
    n_iter: int = 15,
    directed: bool = False,
) -> DataFrame:
    """PageRank over an edge list (undirected by default — each pair
    contributes both directions, matching the near-dup use case).
    Returns (node, pr) with Σpr = 1."""
    edges = pairs.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    if not directed:
        edges = edges.union(
            edges.select(F.col("t").alias("s"), F.col("s").alias("t"))
        )
    edges = edges.persist()
    try:
        nodes = (
            edges.select(F.col("s").alias("node"))
            .union(edges.select(F.col("t").alias("node")))
            .distinct()
        ).persist()
        n = nodes.count()
        deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        ranks = nodes.withColumn("pr", F.lit(1.0 / n)).localCheckpoint()
        for _ in range(n_iter):
            with_deg = ranks.join(deg, ranks["node"] == deg["s"], "left")
            # mass from dangling nodes (deg null) spreads uniformly
            dangling = (
                with_deg.filter(F.col("deg").isNull())
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang"))
            )
            contrib = (
                with_deg.filter(F.col("deg").isNotNull())
                .select("node", (F.col("pr") / F.col("deg")).alias("w"))
                .join(edges, F.col("node") == F.col("s"))
                .groupBy(F.col("t").alias("node"))
                .agg(F.sum("w").alias("inflow"))
            )
            ranks = (
                nodes.join(contrib, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("inflow"), F.lit(0.0))
                            + F.col("dang") / n
                        )
                    ).alias("pr"),
                )
            ).localCheckpoint()
        return ranks
    finally:
        edges.unpersist()
        try:
            nodes.unpersist()
        except Exception:
            pass
