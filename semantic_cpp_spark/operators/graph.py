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
    seeds: list | None = None,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """PageRank over an edge list (undirected by default — each pair
    contributes both directions, matching the near-dup use case).
    Returns (node, pr) with Σpr = 1.

    ``seeds`` switches to PERSONALIZED PageRank: the teleport
    distribution concentrates on the seed nodes (1/|seeds| each, 0
    elsewhere) instead of uniform 1/n, and pr₀ = teleport — ranking
    every node by proximity to the seed set (the "which documents
    duplicate-orbit around these known-good ones" question). The
    uniform branch keeps its exact original arithmetic ((1−d)/n as one
    driver-side double) so existing oracles replay unchanged; the
    seeded branch uses (1−d)·t_v + d·(inflow + dang·t_v), the classic
    PPR recurrence with dangling mass redistributed BY the teleport. A
    seed absent from the graph contributes nothing (its teleport mass
    is simply lost and Σpr < 1 — deterministic, documented).

    Per-iteration cost is exactly one equi-join of the rank vector with
    the (persisted) edges + one groupBy-sum + one left join back onto the
    static node table. The out-degree is STATIC, so it is folded into the
    checkpointed rank frame once instead of re-joined every round, and
    the dangling-mass aggregation — a whole extra job per round — only
    runs when the graph actually HAS dangling nodes (an undirected graph
    never does; the one-time count decides). Measured on a 47-node gate
    graph: 3.5 s/round -> 1.1 s/round."""
    if seeds is not None and len(seeds) == 0:
        raise ValueError("seeds must be a non-empty list (or None for uniform)")
    edges = pairs.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    if not directed:
        edges = edges.union(
            edges.select(F.col("t").alias("s"), F.col("s").alias("t"))
        )
    edges0 = edges = edges.persist()
    nodes = None
    try:
        nodes = (
            edges.select(F.col("s").alias("node"))
            .union(edges.select(F.col("t").alias("node")))
            .distinct()
        ).persist()
        n = nodes.count()
        m = edges.count()  # cached above — a metadata-cheap second action
        # Iteration parallelism from the MEASURED graph size, not the session
        # default: every in-loop exchange carries (node, long, double) rows
        # only, so ~1M rows per task keeps tasks seconds-long at any scale,
        # while a gate-sized graph runs 4 tasks per stage instead of 200
        # mostly-empty ones per round. Scoped PER PLAN via explicit
        # repartition(p, key) on the loop frames — never by flipping the
        # session-global shuffle-partitions conf, which would leak into any
        # query another caller plans on the same session mid-loop (r7 ADVICE).
        # Explicit-N repartitions are exempt from AQE coalescing, and the
        # contrib join / groupBy / base join all reuse the hash(p) layout
        # (EnsureRequirements sees co-partitioned children), so each round
        # still runs exactly one rank-sized exchange.
        p = int(min(2048, max(4, m // 1_000_000 + 4)))
        # edges pre-partitioned on the join key once, outside the loop
        edges = edges.repartition(p, "s").persist()
        deg = edges.groupBy(F.col("s").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        # static (node, deg) base — deg is null only for dangling nodes;
        # hash(node, p) layout survives the checkpoint, so the per-round
        # left join back onto base never re-shuffles base
        base = nodes.join(deg, "node", "left")
        if seeds is not None:
            # teleport column is STATIC per node, so it rides the
            # checkpointed base frame exactly like deg does
            base = base.withColumn(
                "tele",
                F.when(
                    F.col("node").isin(list(seeds)),
                    F.lit(1.0 / len(seeds)),
                ).otherwise(F.lit(0.0)),
            )
        base = base.repartition(p, "node").localCheckpoint()
        has_dangling = base.filter(F.col("deg").isNull()).count() > 0
        keep_cols = ("node", "deg", "tele") if seeds is not None else ("node", "deg")
        init_pr = F.col("tele") if seeds is not None else F.lit(1.0 / n)
        ranks = base.withColumn("pr", init_pr).localCheckpoint()
        if checkpoint_every is None:
            # r16 sf1.0 A/B (SCALING.md): per-round sync points cost
            # ~20-25% wall on the near-dup gate graph (cadence 1:
            # 5.2-7.1 s, cadence 2: 4.2-4.8 s, cadence 3 within noise
            # of 2; values identical — checkpointing is physical
            # only). Cadence 2 is the default where ranks is consumed
            # ONCE per round; a dangling-mass graph references ranks
            # TWICE per round (contrib + dangling aggregate), so an
            # uncheckpointed round would execute its subtree twice —
            # those keep the per-round checkpoint.
            checkpoint_every = 1 if has_dangling else 2
        if checkpoint_every < 1:
            raise ValueError("checkpoint_every must be >= 1")
        for _i in range(n_iter):
            contrib = (
                ranks.filter(F.col("deg").isNotNull())
                .select(
                    F.col("node").alias("s_src"),
                    (F.col("pr") / F.col("deg")).alias("w"),
                )
                .repartition(p, "s_src")
                .join(edges, F.col("s_src") == F.col("s"))
                .repartition(p, "t")
                .groupBy(F.col("t").alias("node"))
                .agg(F.sum("w").alias("inflow"))
            )
            joined = base.join(contrib, "node", "left")
            inflow = F.coalesce(F.col("inflow"), F.lit(0.0))
            if has_dangling:
                # mass from dangling nodes (deg null) spreads by the
                # teleport (uniform branch: /n == uniform teleport)
                dangling = ranks.filter(F.col("deg").isNull()).agg(
                    F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang")
                )
                joined = joined.crossJoin(F.broadcast(dangling))
                if seeds is None:
                    new_pr = F.lit((1.0 - damping) / n) + F.lit(damping) * (
                        inflow + F.col("dang") / n
                    )
                else:
                    new_pr = F.lit(1.0 - damping) * F.col("tele") + F.lit(
                        damping
                    ) * (inflow + F.col("dang") * F.col("tele"))
            else:
                if seeds is None:
                    new_pr = F.lit((1.0 - damping) / n) + F.lit(damping) * inflow
                else:
                    new_pr = (
                        F.lit(1.0 - damping) * F.col("tele")
                        + F.lit(damping) * inflow
                    )
            ranks = joined.select(*keep_cols, new_pr.alias("pr"))
            # checkpoint cadence (r16, VERDICT r15 #7): the per-round
            # localCheckpoint is a sync point; skipping rounds trades
            # deeper lineage (and, when has_dangling, a duplicated
            # subtree — ranks is referenced twice per round then) for
            # fewer materialisations. Values are identical either way
            # (checkpointing is physical only); the default stays at
            # the measured winner (see SCALING.md r16 A/B).
            if (_i + 1) % checkpoint_every == 0 or _i == n_iter - 1:
                ranks = ranks.localCheckpoint()
        return ranks.select("node", "pr")
    finally:
        for fr in (edges, edges0, nodes):
            try:
                if fr is not None:
                    fr.unpersist()
            except Exception:
                pass


def _oriented_wedges(edges: DataFrame, src: str = "d1", dst: str = "d2"):
    """Canonicalization + degree orientation + wedge build of
    triangle_count, exposed so tests can COUNT the wedge set — the
    quantity the degree-orientation guarantee is about (a hub node with
    degree n would generate ~n²/2 wedges id-oriented; degree-oriented
    all its edges point INTO it and it generates none). Returns
    (canonical edges, wedges)."""
    u, v = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") < F.col("v"))  # drops self-loops
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    o1, o2 = o.alias("o1"), o.alias("o2")
    wedges = o1.join(
        o2, (F.col("o1.a") == F.col("o2.a")) & (F.col("o1.b") < F.col("o2.b"))
    ).select(
        F.col("o1.a").alias("a"),
        F.col("o1.b").alias("x"),
        F.col("o2.b").alias("y"),
    )
    return e, wedges


def triangle_count(edges: DataFrame, src: str = "d1", dst: str = "d2") -> DataFrame:
    """Exact per-node triangle counts over an undirected edge list — the
    cluster-density diagnostic for near-dup pair graphs (a clique-ish
    component is one duplicated document family; a triangle-free star is
    one hub shingle wiring unrelated docs together).

    Algorithm: node-iterator++ with DEGREE orientation (Schank &
    Wagner '05; the MapReduce form is Suri & Vassilvitskii WWW'11):
    canonicalize u<v, compute degrees, orient every edge from its
    lower-(degree, id) endpoint to the higher one, build wedges by
    self-joining oriented edges on the apex, and close each wedge
    against the canonical edge set. Every triangle is counted exactly
    once (at its unique degree-order-minimum vertex).

    Why the orientation matters at 100 TB: the wedge join's fan-out per
    apex is its OUT-degree, which degree orientation bounds by O(√m) —
    a 10⁶-degree hub node in an id-oriented join would explode into
    10¹² wedges; degree-oriented it contributes none (all its edges
    point INTO it from the low-degree side). All steps are plain
    equi-joins/groupBys — no windows, no iteration.

    Returns (node, n_tri) for every node in at least one triangle."""
    e, wedges = _oriented_wedges(edges, src, dst)
    tris = wedges.join(
        e, (F.col("x") == F.col("u")) & (F.col("y") == F.col("v"))
    ).select("a", "x", "y")
    return (
        tris.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    src: str = "d1",
    dst: str = "d2",
    max_rounds: int = 12,
) -> DataFrame:
    """Nodes of the k-core of an undirected graph — the maximal subgraph
    where every node has degree ≥ k — by parallel peeling: each round
    drops EVERY node currently under degree k (and its edges) at once,
    until a fixpoint. The dense-cluster extractor for near-dup pair
    graphs: a k-core survives only where duplication is mutual and
    thick, where connected_components also chains through incidental
    bridge pairs.

    Returns (node, core_deg) — surviving nodes with their degree inside
    the core. Input is treated as a MULTIGRAPH: duplicate or
    bidirectional edge rows count toward degree twice (the gate feeds
    canonical d1<d2 distinct pairs, where this never arises; dedupe
    upstream if your edge list isn't canonical — the oracle counts the
    same raw rows).

    Scale design: per round, one degree groupBy + two semi-joins keyed
    on the node id, localCheckpointed (lineage truncation, as pagerank /
    connected_components). Parallel peeling converges in rounds bounded
    by the graph's DEGENERACY ORDERING DEPTH, not its size — near-dup
    graphs (clique-like clusters + sparse bridges) settle in 1-3 rounds
    at any scale; the adversarial worst case is a long path peeled from
    the ends inward (O(diameter) rounds), which ``max_rounds`` caps —
    the loop then returns the still-shrinking subgraph, a documented
    truncation the registered gate query proves it never hits (its
    convergence round count is test-pinned well under the cap)."""
    src_edges = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).persist()
    e = src_edges
    n_edges = e.count()
    try:
        for _ in range(max_rounds):
            if n_edges == 0:
                break
            deg = (
                e.select(F.col("u").alias("node"))
                .union(e.select(F.col("v").alias("node")))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("dg"))
            )
            keep = deg.filter(F.col("dg") >= k).select("node")
            # localCheckpoint is EAGER (truncates per-round lineage, the
            # pagerank requirement) and its blocks outlive the finally-
            # block unpersist, which touches only the source frame
            ne = (
                e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
                .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
                .select("u", "v")
                .localCheckpoint()
            )
            n_new = ne.count()
            e = ne
            if n_new == n_edges:
                break
            n_edges = n_new
        return (
            e.select(F.col("u").alias("node"))
            .union(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
        )
    finally:
        try:
            src_edges.unpersist()
        except Exception:
            pass


def core_numbers(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_k: int = 6,
    max_rounds: int = 12,
) -> DataFrame:
    """Full core decomposition: per-node CORE NUMBER — the largest k for
    which the node survives in the k-core — by iterated parallel
    peeling k = 1, 2, ... (each level starts from the previous level's
    fixpoint edge set, since the (k+1)-core is a subgraph of the
    k-core). Where kcore(k=2) gives the dedup funnel a single
    membership bit, this gives the full cluster-density profile: core 1
    = tendril, core 2 = cycle, core c = sits inside a (c+1)-clique-ish
    region of mutual near-duplication.

    Same multigraph degree convention as kcore. ``max_k`` caps the
    decomposition (nodes denser than max_k report max_k) — the
    registered gate pins a cap the fixture graph's degeneracy stays
    under, test-verified, so the cap never binds there; ``max_rounds``
    caps each level's peel exactly as in kcore.

    Scale design: total work is Σ_k (k-core peel), and each level's
    edge set only shrinks — the level-k pass scans the (k-1)-core, not
    the input graph. Rounds per level are bounded by the peel depth
    (1-3 on near-dup topologies); levels by the graph degeneracy, which
    for dedup pair graphs is the max duplicate-cluster density, a data
    property independent of corpus size. Returns (node, core_num) for
    every non-isolated node."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    levels: DataFrame | None = None
    for k in range(1, max_k + 1):
        surv = kcore(e, k=k, src="u", dst="v", max_rounds=max_rounds)
        lv = surv.select("node", F.lit(k).alias("k")).localCheckpoint()
        if lv.count() == 0:
            break
        levels = lv if levels is None else levels.union(lv)
        keep = lv.select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
    if levels is None:
        return e.select(F.col("u").alias("node")).limit(0).withColumn(
            "core_num", F.lit(0).cast("long")
        )
    return levels.groupBy("node").agg(
        F.max("k").cast("long").alias("core_num")
    )
