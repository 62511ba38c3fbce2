"""Pins for PageRank (vs a dense numpy power iteration — iterative, no
SQL oracle, same treatment as gradient descent) and small-file
compaction."""

import glob
import os
import tempfile

import numpy as np
import pytest

from semantic_cpp_spark import maintenance
from semantic_cpp_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n, d=0.85, iters=15, directed=False):
    A = np.zeros((n, n))
    for s, t in edges:
        A[s, t] = 1.0
        if not directed:
            A[t, s] = 1.0
    deg = A.sum(axis=1)
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        dang = 0.0
        for v in range(n):
            if deg[v] > 0:
                inflow += pr[v] / deg[v] * A[v]
            else:
                dang += pr[v]
        pr = (1 - d) / n + d * (inflow + dang / n)
    return pr


def test_pagerank_matches_numpy_with_dangling(spark):
    # star 0-{1,2,3} + chain 3-4, plus a DIRECTED sink node (5 has no
    # out-edges) to exercise the dangling redistribution
    edges = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5)]
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    out = {
        r["node"]: r["pr"]
        for r in pagerank(pairs, n_iter=10, directed=True).collect()
    }
    exp = _numpy_pagerank(edges, 6, iters=10, directed=True)
    assert set(out) == set(range(6))
    for v in range(6):
        assert out[v] == pytest.approx(exp[v], rel=1e-9)
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_undirected_hub_ranks_highest(spark):
    edges = [(0, i) for i in range(1, 6)]  # hub 0
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    out = {r["node"]: r["pr"] for r in pagerank(pairs, n_iter=12).collect()}
    exp = _numpy_pagerank(edges, 6, iters=12)
    for v in range(6):
        assert out[v] == pytest.approx(exp[v], rel=1e-9)
    assert out[0] == max(out.values())


def _numpy_ppr(edges, n, seeds, d=0.85, iters=15, directed=False):
    A = np.zeros((n, n))
    for s, t in edges:
        A[s, t] = 1.0
        if not directed:
            A[t, s] = 1.0
    deg = A.sum(axis=1)
    tele = np.zeros(n)
    for s in seeds:
        if 0 <= s < n:
            tele[s] = 1.0 / len(seeds)
    pr = tele.copy()
    for _ in range(iters):
        inflow = np.zeros(n)
        dang = 0.0
        for v in range(n):
            if deg[v] > 0:
                inflow += pr[v] / deg[v] * A[v]
            else:
                dang += pr[v]
        pr = (1 - d) * tele + d * (inflow + dang * tele)
    return pr


def test_personalized_pagerank_matches_numpy_with_dangling(spark):
    # directed graph with a sink (5) so the dangling-mass-to-teleport
    # branch runs; seeds {0, 3} concentrate the teleport
    edges = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (1, 0)]
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    out = {
        r["node"]: r["pr"]
        for r in pagerank(
            pairs, n_iter=10, directed=True, seeds=[0, 3]
        ).collect()
    }
    exp = _numpy_ppr(edges, 6, [0, 3], iters=10, directed=True)
    assert set(out) == set(range(6))
    for v in range(6):
        assert out[v] == pytest.approx(exp[v], rel=1e-9)
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_undirected_locality(spark):
    # two 3-cliques bridged by one edge; seeding in clique A must rank
    # every A node above every B node (proximity, not global degree)
    a = [(0, 1), (0, 2), (1, 2)]
    b = [(3, 4), (3, 5), (4, 5)]
    edges = a + b + [(2, 3)]
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    out = {
        r["node"]: r["pr"]
        for r in pagerank(pairs, n_iter=15, seeds=[0]).collect()
    }
    exp = _numpy_ppr(edges, 6, [0], iters=15)
    for v in range(6):
        assert out[v] == pytest.approx(exp[v], rel=1e-9)
    assert min(out[v] for v in (0, 1, 2)) > max(out[v] for v in (4, 5))
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_absent_seed_loses_mass(spark):
    # seed 99 is not in the graph: its teleport mass is simply lost
    # (documented) and the result is deterministic with sum < 1
    edges = [(0, 1), (1, 2), (2, 0)]
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    out = {
        r["node"]: r["pr"]
        for r in pagerank(pairs, n_iter=10, seeds=[0, 99]).collect()
    }
    assert set(out) == {0, 1, 2}
    assert sum(out.values()) < 1.0
    exp = _numpy_ppr(edges, 3, [0, 99], iters=10)
    for v in range(3):
        assert out[v] == pytest.approx(exp[v], rel=1e-9)


def test_personalized_pagerank_empty_seeds_raises(spark):
    pairs = spark.createDataFrame([(0, 1)], "d1 long, d2 long")
    with pytest.raises(ValueError, match="non-empty"):
        pagerank(pairs, seeds=[])


def test_compact_parquet_reduces_file_count(spark):
    with tempfile.TemporaryDirectory(prefix="compact_") as tmp:
        src, dst = os.path.join(tmp, "src"), os.path.join(tmp, "dst")
        spark.range(10_000).repartition(40).write.parquet(src)
        assert len(glob.glob(os.path.join(src, "*.parquet"))) == 40
        total = maintenance.dataset_bytes(spark.read.parquet(src))
        assert total > 0
        # target half the dataset → 2 output files
        n = maintenance.compact_parquet(spark, src, dst, target_bytes=(total + 1) // 2)
        assert n == 2
        assert len(glob.glob(os.path.join(dst, "*.parquet"))) == 2
        # content round-trips
        assert spark.read.parquet(dst).count() == 10_000
        a = sorted(r["id"] for r in spark.read.parquet(dst).collect())
        assert a == list(range(10_000))


def test_profile_table_counts_nulls_and_distincts(spark):
    from semantic_cpp_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a"), (3, None)],
        "x int, s string",
    )
    out = {r["column"]: r for r in profile_table(df, ["x", "s"]).collect()}
    assert out["x"]["n_rows"] == 5
    assert out["x"]["n_nulls"] == 1
    assert out["x"]["n_distinct"] == 3  # count_distinct ignores nulls
    assert out["x"]["min_str"] == "1" and out["x"]["max_str"] == "3"
    assert out["s"]["n_nulls"] == 2
    assert out["s"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"


def test_zorder_improves_bucket_locality(spark):
    """The point of z-ordering: file-run bounding boxes must be much
    tighter than row-order runs on a 2-D grid, on BOTH dimensions."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.operators.layout import zorder_bucket_stats, zvalue

    # 32×32 grid enumerated in row-major id order
    df = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    stats = zorder_bucket_stats(df, F.col("x"), F.col("y"), 16).collect()
    assert sum(r["n"] for r in stats) == 1024
    # each z-run of 64 cells covers an 8×8 tile: bbox spans of 7 on both
    # axes — row-major runs would span the full 0..31 x-range (31)
    for r in stats:
        assert r["x_max"] - r["x_min"] <= 7
        assert r["y_max"] - r["y_min"] <= 7

    # sanity of the bit interleave itself
    row = (
        spark.range(1)
        .select(zvalue(F.lit(0b101), F.lit(0b011)).alias("z"))
        .collect()[0]
    )
    # x=101 → bits at 0,4 ; y=011 → bits at 1,3 → z = 1+2+8+16 = 27... 
    # x bits (1,0,1) land at positions 0,2,4 → 1 + 16; y bits (1,1,0)
    # land at 1,3,5 → 2 + 8  ⇒ 27
    assert row["z"] == 27


def test_triangle_count_hand_built_graphs(spark):
    """K4 → every node in C(3,2)=3 triangles; a star (no triangles) →
    empty; a hub with one closing edge → exactly that triangle."""
    from semantic_cpp_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = {r.node: r.n_tri for r in triangle_count(
        spark.createDataFrame(k4, "d1 long, d2 long")).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    star = [(0, i) for i in range(1, 6)]
    assert triangle_count(spark.createDataFrame(star, "d1 long, d2 long")).count() == 0

    hub = star + [(1, 2)]
    out = {r.node: r.n_tri for r in triangle_count(
        spark.createDataFrame(hub, "d1 long, d2 long")).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangle_count_ignores_duplicates_loops_and_direction(spark):
    """Reversed duplicates, repeated edges, and self-loops must not
    change the count (canonicalize + distinct before anything else)."""
    from semantic_cpp_spark.operators.graph import triangle_count

    edges = [(0, 1), (1, 0), (1, 2), (1, 2), (2, 0), (1, 1)]
    out = {r.node: r.n_tri for r in triangle_count(
        spark.createDataFrame(edges, "d1 long, d2 long")).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangle_count_matches_naive_on_random_graph(spark):
    """Erdős–Rényi G(30, 0.25) vs the naive all-triple count."""
    import itertools
    import random

    from semantic_cpp_spark.operators.graph import triangle_count

    rng = random.Random(11)
    edges = [(a, b) for a, b in itertools.combinations(range(30), 2)
             if rng.random() < 0.25]
    eset = set(edges)
    expect: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(30), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    out = {r.node: r.n_tri for r in triangle_count(
        spark.createDataFrame(edges, "d1 long, d2 long")).collect()}
    assert out == expect and sum(expect.values()) > 0


def test_triangle_wedges_degree_orientation_kills_hubs(spark):
    """The scale claim, ASSERTED on the wedge count: a 400-leaf star
    would generate C(399,2) = 79,401 wedges id-oriented (hub id 0 is the
    smallest); degree orientation points every edge INTO the hub, so the
    wedge set is EMPTY — and a closing triangle added between two leaves
    still surfaces through its low-degree apexes."""
    from semantic_cpp_spark.operators.graph import _oriented_wedges, triangle_count

    star = [(0, i) for i in range(1, 400)]
    _, wedges = _oriented_wedges(spark.createDataFrame(star, "d1 long, d2 long"))
    assert wedges.count() == 0

    withtri = star + [(1, 2)]
    df = spark.createDataFrame(withtri, "d1 long, d2 long")
    _, w2 = _oriented_wedges(df)
    assert w2.count() <= 3  # leaves have out-degree <= 2
    out = {r.node: r.n_tri for r in triangle_count(df).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_kcore_hand_built_graphs(spark):
    """k-core by parallel peeling on graphs with known cores: a K4 with a
    pendant path keeps exactly the K4 at k=3 (core degrees all 3); a
    cycle IS its own 2-core; a path has an empty 2-core (peeled from the
    ends inward — the multi-round case); k=1 keeps every non-isolated
    node."""
    from semantic_cpp_spark.operators.graph import kcore

    def pairs(*e):
        return spark.createDataFrame(list(e), "d1 long, d2 long")

    # K4 on 0-3 plus pendant path 3-4-5
    g = pairs((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5))
    core3 = {r["node"]: r["core_deg"] for r in kcore(g, k=3).collect()}
    assert core3 == {0: 3, 1: 3, 2: 3, 3: 3}
    # 5-cycle: its own 2-core
    cyc = pairs((0, 1), (1, 2), (2, 3), (3, 4), (4, 0))
    core2 = {r["node"]: r["core_deg"] for r in kcore(cyc, k=2).collect()}
    assert core2 == {i: 2 for i in range(5)}
    # 6-path: 2-core empty, needs 3 peel rounds (ends inward)
    path = pairs((0, 1), (1, 2), (2, 3), (3, 4), (4, 5))
    assert kcore(path, k=2).count() == 0
    # k=1 keeps everything with an edge
    assert kcore(path, k=1).count() == 6
    # max_rounds cap: the 6-path truncated at 1 round has peeled only
    # the two endpoints (documented truncation behavior)
    trunc = {r["node"] for r in kcore(path, k=2, max_rounds=1).collect()}
    assert trunc == {1, 2, 3, 4}


def test_kcore_gate_graph_converges_fast(spark):
    """The unrolled 12-round oracle equals Spark's early-exiting loop
    only if peeling converges inside the cap: pin that the gate graph's
    2-core is already stable after THREE rounds (clique-like near-dup
    clusters peel their tendrils immediately — the documented 1-3 round
    regime, far under max_rounds=12)."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.operators.graph import kcore
    from semantic_cpp_spark.pipeline import dedup
    from semantic_cpp_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = dedup.minhash_lsh_pairs(docs, F.col("text"), F.col("doc_id")).persist()
    full = sorted(map(tuple, kcore(pairs, k=2).collect()))
    capped = sorted(map(tuple, kcore(pairs, k=2, max_rounds=3).collect()))
    assert full == capped
    pairs.unpersist()


def test_core_numbers_hand_built_graphs(spark):
    """Full core decomposition on known graphs: K4 + pendant path gives
    core 3 on the clique, core 1 along the tendril; a 5-cycle is
    uniformly core 2; two K3s bridged by an edge are uniformly core 2
    everywhere except nothing (both triangles survive the 2-peel, the
    bridge endpoints keep degree >= 2); a random graph matches a naive
    networkx-style peel in numpy."""
    from semantic_cpp_spark.operators.graph import core_numbers

    def pairs(*e):
        return spark.createDataFrame(list(e), "d1 long, d2 long")

    g = pairs((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5))
    got = {r["node"]: r["core_num"] for r in core_numbers(g).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1}
    cyc = pairs((0, 1), (1, 2), (2, 3), (3, 4), (4, 0))
    got = {r["node"]: r["core_num"] for r in core_numbers(cyc).collect()}
    assert got == {i: 2 for i in range(5)}
    # empty input -> empty typed frame
    empty = core_numbers(pairs((0, 1)).filter("d1 < 0"))
    assert empty.count() == 0 and empty.columns == ["node", "core_num"]
    # max_k cap binds: a K5 (true core 4) capped at max_k=2 reports 2
    k5 = pairs(*[(i, j) for i in range(5) for j in range(i + 1, 5)])
    capped = {r["node"]: r["core_num"] for r in core_numbers(k5, max_k=2).collect()}
    assert capped == {i: 2 for i in range(5)}


def test_core_numbers_matches_naive_on_random_graph(spark):
    """core_numbers vs a naive sequential min-degree peel (the textbook
    Matula-Beck algorithm) on a seeded random graph — parallel and
    sequential peeling provably agree on core numbers."""
    import random as rnd

    from semantic_cpp_spark.operators.graph import core_numbers

    r = rnd.Random(7)
    edges = sorted({(r.randrange(30), r.randrange(30)) for _ in range(90)})
    edges = [(a, b) for a, b in edges if a != b]
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges})

    # naive: repeatedly remove a min-degree node; its core number is the
    # running max of min-degrees seen when it is removed
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want, kmax = {}, 0
    live = {n: set(vs) for n, vs in adj.items()}
    while live:
        n = min(live, key=lambda x: (len(live[x]), x))
        kmax = max(kmax, len(live[n]))
        want[n] = kmax
        for m in live[n]:
            live[m].discard(n)
        del live[n]

    df = spark.createDataFrame(canon, "d1 long, d2 long")
    got = {r2["node"]: r2["core_num"] for r2 in core_numbers(df, max_k=10).collect()}
    assert got == {n: k for n, k in want.items() if k >= 1}


def test_core_numbers_gate_graph_within_caps(spark):
    """The chained 6-level x 12-round oracle equals Spark's early-exit
    loop only while convergence sits inside BOTH caps: pin that on the
    gate graph (a) every level's peel stabilises within 3 rounds and
    (b) the decomposition exhausts below max_k=6, so the cap never
    binds at gate scale."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.operators.graph import core_numbers
    from semantic_cpp_spark.pipeline import dedup
    from semantic_cpp_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = dedup.minhash_lsh_pairs(docs, F.col("text"), F.col("doc_id")).persist()
    full = sorted(map(tuple, core_numbers(pairs, max_k=6).collect()))
    fast = sorted(map(tuple, core_numbers(pairs, max_k=6, max_rounds=3).collect()))
    assert full == fast
    assert max(k for _, k in full) < 6  # cap headroom at gate scale
    pairs.unpersist()


def test_checkpoint_steps_marker_filters_incomplete(spark, tmp_path):
    """ADVICE r11: with a marker, checkpoint_steps lists only steps
    whose commit marker file exists — a crash mid-checkpoint leaves a
    marker-less dir that resume must not see; with marker=None every
    step dir is listed (the provenance form the sidecar guards use)."""
    import os

    from semantic_cpp_spark import maintenance

    root = str(tmp_path / "steps")
    for i, complete in [(1, True), (2, True), (3, False)]:
        os.makedirs(f"{root}/step={i}/books", exist_ok=True)
        if complete:
            open(f"{root}/step={i}/books/_SUCCESS", "w").close()
    os.makedirs(f"{root}/step=x", exist_ok=True)  # non-numeric: ignored
    assert maintenance.checkpoint_steps(spark, root) == [1, 2, 3]
    assert maintenance.checkpoint_steps(
        spark, root, marker="books/_SUCCESS"
    ) == [1, 2]
    assert maintenance.checkpoint_steps(spark, str(tmp_path / "nope")) == []
