"""Pins for the r3 corpus-curation operators: deterministic sampling,
decontamination, redaction, sharding, connected components, BM25, and the
iterative k-means loop (the oracle queries cover the SQL-expressible
surfaces; these tests pin semantics on hand-built inputs and the
iterative/driver-side paths that have no SQL oracle)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_cpp_spark.pipeline import clustering, curation, dedup, retrieval


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# -- sampling ---------------------------------------------------------------

def test_bernoulli_sample_deterministic_and_rate(spark):
    df = spark.range(10_000).select(F.col("id").alias("doc_id"))
    s1 = curation.bernoulli_sample(df, F.col("doc_id"), 0.3, "t1")
    s2 = curation.bernoulli_sample(df, F.col("doc_id"), 0.3, "t1")
    a = sorted(r["doc_id"] for r in s1.collect())
    assert a == sorted(r["doc_id"] for r in s2.collect())  # same salt → same set
    # rate lands within ±3 sigma of binomial expectation
    n = len(a)
    sigma = math.sqrt(10_000 * 0.3 * 0.7)
    assert abs(n - 3000) < 3 * sigma
    # different salt → different set
    s3 = curation.bernoulli_sample(df, F.col("doc_id"), 0.3, "t2")
    assert sorted(r["doc_id"] for r in s3.collect()) != a


def test_bernoulli_sample_nested_subset(spark):
    # keep-threshold monotonicity: a 0.1 sample is a subset of the 0.5
    # sample under the same salt — the property that lets pipelines carve
    # nested corpus tiers from one hash.
    df = spark.range(2_000).select(F.col("id").alias("doc_id"))
    small = {r["doc_id"] for r in curation.bernoulli_sample(df, F.col("doc_id"), 0.1, "x").collect()}
    big = {r["doc_id"] for r in curation.bernoulli_sample(df, F.col("doc_id"), 0.5, "x").collect()}
    assert small <= big


def test_bernoulli_rate_bounds():
    with pytest.raises(ValueError):
        curation.sample_threshold(1.5)
    assert curation.sample_threshold(0.0) == 0
    assert curation.sample_threshold(1.0) == curation.HASH_SPACE


def _brute_temperature_kept(rows, alpha, budget_frac, salt):
    """Naive Python replica of temperature_mixture_sample's keep set:
    same exact-integer threshold arithmetic, per-row md5 compare."""
    import hashlib
    from collections import Counter

    counts = Counter(d for _, d in rows)
    if alpha == 0.5:
        w = {d: int(math.floor(math.sqrt(n) * 1e6)) for d, n in counts.items()}
    else:
        w = {d: int(math.floor(n**alpha * 1e6)) for d, n in counts.items()}
    total, sw = sum(counts.values()), sum(w.values())
    budget = int(budget_frac * total)
    thr = {
        d: min(
            curation.HASH_SPACE,
            budget * w[d] * curation.HASH_SPACE // (sw * counts[d]),
        )
        for d in counts
    }
    kept = set()
    for k, d in rows:
        u = int(hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:15], 16)
        if u < thr[d]:
            kept.add(k)
    return kept, thr


def test_temperature_mixture_matches_naive_and_flattens(spark):
    # skewed domains: 'big' dominates 10:1; alpha=0.5 must cut big's
    # keep RATE below small's (the flattening that defines the operator)
    rows = [(i, "big" if i < 5_000 else "small") for i in range(5_500)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    out = curation.temperature_mixture_sample(
        df, F.col("doc_id"), F.col("dom"), alpha=0.5, budget_frac=0.5, salt="tm"
    )
    got = {r["doc_id"] for r in out.collect()}
    exp, thr = _brute_temperature_kept(rows, 0.5, 0.5, "tm")
    assert got == exp  # bit-exact vs the naive integer-threshold replica
    kept_big = sum(1 for k in got if k < 5_000) / 5_000
    kept_small = sum(1 for k in got if k >= 5_000) / 500
    assert kept_small > kept_big  # rare domain keeps a higher fraction
    # overall budget respected within binomial noise
    assert abs(len(got) - 2_750) < 4 * math.sqrt(2_750)


def test_temperature_mixture_alpha_one_is_proportional(spark):
    # alpha=1: thresholds collapse to the flat budget rate for every
    # domain (w_d ∝ n_d cancels n_d) — proportional sampling
    rows = [(i, "a" if i % 3 == 0 else "b") for i in range(3_000)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    _, thr = _brute_temperature_kept(rows, 1.0, 0.4, "tm2")
    rates = {d: t / curation.HASH_SPACE for d, t in thr.items()}
    assert rates["a"] == pytest.approx(rates["b"], rel=1e-4)
    assert rates["a"] == pytest.approx(0.4, rel=1e-3)
    out = curation.temperature_mixture_sample(
        df, F.col("doc_id"), F.col("dom"), alpha=1.0, budget_frac=0.4, salt="tm2"
    )
    exp, _ = _brute_temperature_kept(rows, 1.0, 0.4, "tm2")
    assert {r["doc_id"] for r in out.collect()} == exp


def test_temperature_mixture_rare_domain_kept_whole(spark):
    # a tiny domain whose sqrt-share target exceeds its size caps at
    # rate 1.0 — every row survives
    rows = [(i, "huge") for i in range(10_000)] + [(10_000 + i, "rare") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    out = curation.temperature_mixture_sample(
        df, F.col("doc_id"), F.col("dom"), alpha=0.5, budget_frac=0.5, salt="tm3"
    )
    got = {r["doc_id"] for r in out.collect()}
    assert all(10_000 + i in got for i in range(5))


def test_temperature_mixture_arg_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, dom string")
    with pytest.raises(ValueError, match="budget_frac"):
        curation.temperature_mixture_sample(
            df, F.col("doc_id"), F.col("dom"), budget_frac=0.0
        )
    with pytest.raises(ValueError, match="alpha"):
        curation.temperature_mixture_sample(
            df, F.col("doc_id"), F.col("dom"), alpha=-1.0
        )


def test_stratified_sample_rates(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(4_000)],
        "doc_id long, stratum string",
    )
    out = curation.stratified_sample(
        df, F.col("doc_id"), F.col("stratum"), {"a": 1.0, "b": 0.0}, "s"
    ).collect()
    assert len(out) == 2_000
    assert all(r["stratum"] == "a" for r in out)
    # unknown stratum uses default_rate
    out2 = curation.stratified_sample(
        df, F.col("doc_id"), F.col("stratum"), {"a": 1.0}, "s", default_rate=1.0
    )
    assert out2.count() == 4_000


def test_lookup_tables_survive_high_cardinality(spark):
    """r11: the pre-r11 when-chain fold StackOverflowed at ~400
    strata, making temperature_mixture_sample's documented 10⁵ domain
    bound fiction. Both lookup tiers must work: the flat literal map
    at 1000 strata (past the old SOE point, under
    MAP_LOOKUP_THRESHOLD) and the broadcast join at 1500 (over it) —
    with keep decisions identical to the per-row Python replay of the
    same md5 thresholds."""
    import hashlib

    n_strata, rows = 1_000, 4_000
    df = spark.createDataFrame(
        [(i, f"s{i % n_strata}") for i in range(rows)],
        "doc_id long, stratum string",
    )
    rates = {f"s{j}": (1.0 if j % 2 == 0 else 0.0) for j in range(n_strata)}

    def py_keep(key, rate, salt="s"):
        h = int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:15], 16)
        return h < curation.sample_threshold(rate)

    got = {
        r["doc_id"]
        for r in curation.stratified_sample(
            df, F.col("doc_id"), F.col("stratum"), rates, "s"
        ).collect()
    }
    want = {
        i for i in range(rows)
        if py_keep(i, rates[f"s{i % n_strata}"])
    }
    assert got == want
    # broadcast tier: 1500 strata > MAP_LOOKUP_THRESHOLD
    n2 = 1_500
    df2 = spark.createDataFrame(
        [(i, f"s{i % n2}") for i in range(rows)],
        "doc_id long, stratum string",
    )
    rates2 = {f"s{j}": (1.0 if j % 3 == 0 else 0.0) for j in range(n2)}
    out2 = curation.stratified_sample(
        df2, F.col("doc_id"), F.col("stratum"), rates2, "s"
    )
    assert set(out2.columns) == {"doc_id", "stratum"}  # helpers dropped
    got2 = {r["doc_id"] for r in out2.collect()}
    want2 = {
        i for i in range(rows)
        if py_keep(i, rates2[f"s{i % n2}"])
    }
    assert got2 == want2
    # temperature mixture at 500 domains (old impl died at ~400)
    df3 = spark.createDataFrame(
        [(i, f"d{i % 500}") for i in range(rows)],
        "doc_id long, dom string",
    )
    kept = curation.temperature_mixture_sample(
        df3, F.col("doc_id"), F.col("dom"), budget_frac=0.5
    ).count()
    assert 0 < kept < rows
    # importance weights at 1500 targets (broadcast tier)
    w = curation.importance_weights(
        df2, F.col("stratum"), {f"s{j}": 1.0 / n2 for j in range(n2)}
    )
    rows_w = w.collect()
    assert len(rows_w) == n2
    assert all(abs(r["target_share"] - round(1.0 / n2, 6)) < 1e-9 for r in rows_w)


def test_lookup_none_keys_fall_through_to_default(spark):
    """ADVICE r11: a None key in a lookup table is unmatchable in
    every tier (the pre-r11 when-chain's `stratum == lit(None)` never
    matched; element_at(map, NULL) is NULL; a join on a null key never
    matches), so both tiers DROP it up front instead of hitting
    Spark's 'cannot use null as map key' error — null-stratum rows get
    the default rate, exactly the pre-r11 fall-through. And
    temperature_mixture_sample accepts corpora whose domain column
    contains NULLs (the groupBy emits a None-keyed count)."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None), (5, "b")],
        "doc_id long, stratum string",
    )
    # None-keyed rate 1.0 must NOT apply; default 0.0 drops null strata
    kept = curation.stratified_sample(
        df, F.col("doc_id"), F.col("stratum"),
        {"a": 1.0, None: 1.0}, "s", default_rate=0.0,
    ).collect()
    assert {r["stratum"] for r in kept} == {"a"}
    # broadcast tier behaves identically (force it via the helper)
    joined, thresh = curation._broadcast_lookup(
        df, F.col("stratum"),
        {"a": 7, None: 9}, F.lit(0), "long",
    )
    got = {
        (r["doc_id"], r["t"]) for r in joined.select(
            "doc_id", thresh.alias("t")
        ).collect()
    }
    assert got == {(1, 7), (2, 7), (3, 0), (4, 0), (5, 0)}
    # null domains no longer kill temperature sampling mid-job
    out = curation.temperature_mixture_sample(
        df, F.col("doc_id"), F.col("stratum"), budget_frac=1.0
    )
    assert {r["stratum"] for r in out.collect()} <= {"a", "b"}


def test_broadcast_lookup_rejects_reserved_columns(spark):
    """VERDICT r11 'What's wrong #1': a frame already carrying the
    reserved __lk_key/__lk_val helper columns would misjoin — raise
    up front instead."""
    import pytest

    bad = spark.createDataFrame([(1, "x")], "doc_id long, __lk_key string")
    with pytest.raises(ValueError, match="__lk_key"):
        curation._broadcast_lookup(
            bad, F.col("__lk_key"), {"x": 1}, F.lit(0), "long"
        )
    bad2 = spark.createDataFrame([(1, 2)], "doc_id long, __lk_val long")
    with pytest.raises(ValueError, match="__lk_val"):
        curation._broadcast_lookup(
            bad2, F.col("doc_id"), {1: 1}, F.lit(0), "long"
        )


# -- decontamination --------------------------------------------------------

def test_contaminated_docs_counts(spark):
    df = _docs(
        spark,
        [
            "alpha beta gamma delta",      # bench doc 0
            "zig zag zog",                  # doc 1: shares "alpha beta gamma" + "beta gamma delta"? no
            "alpha beta gamma epsilon",     # doc 2: shares span "alpha beta gamma"
            "beta gamma delta alpha beta gamma delta",  # doc 3: two bench spans
            "nothing in common here at all",            # doc 4: clean
        ],
    )
    out = {
        r["doc_id"]: r["n_bench_spans"]
        for r in curation.contaminated_docs(
            df, F.col("text"), F.col("doc_id"), [0], 3
        ).collect()
    }
    # bench spans of doc 0: {alpha beta gamma, beta gamma delta}
    assert out == {2: 1, 3: 2}


# -- redaction --------------------------------------------------------------

def test_redact_and_match_count(spark):
    df = _docs(spark, ["mail me at a.b@x.co or c@y.io ref 123 and 4567"])
    email = r"[a-z0-9.]+@[a-z0-9.]+"
    num = r"[0-9]+"
    row = df.select(
        curation.match_count(F.col("text"), email).alias("ne"),
        curation.redact(
            curation.redact(F.col("text"), email, "<EMAIL>"), num, "<NUM>"
        ).alias("red"),
    ).collect()[0]
    assert row["ne"] == 2
    assert row["red"] == "mail me at <EMAIL> or <EMAIL> ref <NUM> and <NUM>"


# -- sharding ---------------------------------------------------------------

def test_shard_stats_cover_and_balance(spark):
    df = _docs(spark, [f"word{i} filler text here" for i in range(800)])
    out = curation.shard_stats(df, F.col("text"), F.col("doc_id"), 8).collect()
    assert sorted(r["shard"] for r in out) == list(range(8))
    assert sum(r["n_docs"] for r in out) == 800
    # hash balance: every shard within ±50% of the mean (loose, 3+ sigma)
    for r in out:
        assert 50 <= r["n_docs"] <= 150


# -- connected components ---------------------------------------------------

def test_connected_components_chain_triangle_pair(spark):
    # chain 1-2-3-4, triangle 10-11-12 (+edge), isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "d1 long, d2 long",
    )
    out = {
        r["doc_id"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    # a 40-node chain has diameter 40: plain hash-min propagation could
    # NOT converge within max_iter=10 — only the pointer-jumping rewrite
    # (O(log n) rounds) can. Pins both correctness and the round bound.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "d1 long, d2 long"
    )
    out = dedup.connected_components(pairs, max_iter=10).collect()
    assert all(r["component"] == 0 for r in out)
    assert len(out) == 41


# -- BM25 -------------------------------------------------------------------

def test_bm25_matches_hand_computation(spark):
    texts = [
        "data data query",   # doc 0
        "data fluff fluff fluff",  # doc 1
        "other words only",  # doc 2
    ]
    df = _docs(spark, texts)
    out = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_topk(
            df, F.col("text"), F.col("doc_id"), ["data", "query"], 10
        ).collect()
    }
    # hand-compute
    N, avgdl = 3, (3 + 4 + 3) / 3
    k1, b = retrieval.BM25_K1, retrieval.BM25_B

    def idf(dfreq):
        return math.log(1.0 + (N - dfreq + 0.5) / (dfreq + 0.5))

    def sat(tf, dl):
        return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    exp0 = idf(2) * sat(2, 3) + idf(1) * sat(1, 3)
    exp1 = idf(2) * sat(1, 4)
    assert out.keys() == {0, 1}
    assert out[0] == pytest.approx(exp0, abs=1e-6)
    assert out[1] == pytest.approx(exp1, abs=1e-6)


# -- k-means ----------------------------------------------------------------

def test_kmeans_fit_matches_numpy(spark):
    rng = np.random.RandomState(7)
    # three well-separated blobs in 4-D
    blobs = np.concatenate(
        [
            rng.normal(0.0, 0.3, (30, 4)),
            rng.normal(5.0, 0.3, (30, 4)),
            rng.normal(-5.0, 0.3, (30, 4)),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in blobs[i]]) for i in range(90)],
        "vec_id long, embedding array<double>",
    )
    cents, assigned = clustering.kmeans_fit(df, k=3, dims=4, n_iter=4)

    # numpy Lloyd with identical seeding (vectors 0..2) and tie rule
    c = blobs[:3].copy()
    for _ in range(4):
        d = ((blobs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)  # argmin takes smallest index on ties
        for j in range(3):
            if (lab == j).any():
                c[j] = blobs[lab == j].mean(axis=0)
    np.testing.assert_allclose(np.array(cents), c, rtol=1e-9)
    got = {r["vec_id"]: r["c_id"] for r in assigned.collect()}
    assert got == {i: int(lab[i]) for i in range(90)}


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # seed 2 sits far away with no members after step 1 → keeps its seed
    pts = [[0.0, 0.0], [0.2, 0.0], [100.0, 100.0]]
    df = spark.createDataFrame(
        [(i, pts[i]) for i in range(3)], "vec_id long, embedding array<double>"
    )
    cents, _ = clustering.kmeans_fit(df, k=3, dims=2, n_iter=2)
    assert cents[2] == [100.0, 100.0]


# -- token packing ----------------------------------------------------------

def test_pack_token_sequences_boundaries(spark):
    # one shard (n_shards=1), budget 10, doc token counts 4,4,4,10,2
    df = _docs(
        spark,
        [
            "a b c d",          # cum_excl 0  → seq 0
            "a b c d",          # cum_excl 4  → seq 0
            "a b c d",          # cum_excl 8  → seq 0 (starts before budget)
            "a b c d e f g h i j",  # cum_excl 12 → seq 1
            "a b",              # cum_excl 22 → seq 2
        ],
    )
    out = {
        (r["shard"], r["seq_id"]): (r["n_docs"], r["seq_tokens"])
        for r in curation.pack_token_sequences(
            df, F.col("text"), F.col("doc_id"), n_shards=1, budget=10
        ).collect()
    }
    assert out == {(0, 0): (3, 12), (0, 1): (1, 10), (0, 2): (1, 2)}


# -- tf-idf keywords --------------------------------------------------------

def test_tfidf_keywords_hand_check(spark):
    df = _docs(
        spark,
        [
            "apple apple banana shared",
            "cherry shared",
            "banana shared shared",
        ],
    )
    out = retrieval.tfidf_keywords(df, F.col("text"), F.col("doc_id"), 2).collect()
    top = {(r["doc_id"], r["rk"]): r["term"] for r in out}
    # doc 0: apple tf=2 idf=ln(3/1) → top; banana tf=1 idf=ln(3/2)
    assert top[(0, 1)] == "apple" and top[(0, 2)] == "banana"
    # doc 1: cherry idf=ln(3) beats shared idf=ln(1)=0
    assert top[(1, 1)] == "cherry"
    # doc 2: banana ln(3/2) beats shared 2·ln(1)=0
    assert top[(2, 1)] == "banana"


# -- corpus-relative quality filter -----------------------------------------

def test_quality_above_median_keeps_top_half(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, q double"
    )
    kept = curation.quality_above_median(df, F.col("q")).collect()
    ids = sorted(r["doc_id"] for r in kept)
    # median of 0..99 = 49.5 → keep 50..99
    assert ids == list(range(50, 100))


# -- cluster medoids --------------------------------------------------------

def test_cluster_medoids_nontrivial_after_update(spark):
    # two obvious blobs; seeds are vectors 0 and 1 (one in each blob)
    pts = [
        [0.0, 0.0], [10.0, 10.0],          # seeds
        [1.0, 0.0], [0.0, 1.0],            # blob A around origin
        [10.0, 11.0], [11.0, 10.0],        # blob B around (10,10)
    ]
    df = spark.createDataFrame(
        [(i, pts[i]) for i in range(len(pts))],
        "vec_id long, embedding array<double>",
    )
    out = {r["c_id"]: r for r in clustering.cluster_medoids(df, k=2).collect()}
    assert set(out) == {0, 1}
    # updated centroid of cluster 0 = mean([0,0],[1,0],[0,1]) = (1/3, 1/3):
    # medoid is the seed [0,0] (d2 = 2/9), strictly > 0 → non-trivial
    assert out[0]["vec_id"] == 0
    assert out[0]["d2"] > 0


def test_connected_components_random_graphs_vs_union_find(spark):
    """Randomized robustness: hash-min propagation must agree with a
    plain union-find on arbitrary graph shapes (seeded, deterministic)."""
    import random

    def uf_components(edges, nodes):
        parent = {v: v for v in nodes}

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in nodes}

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        n = rng.randint(8, 30)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(5, 40))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        nodes = {v for e in edges for v in e}
        pairs = spark.createDataFrame(edges, "d1 long, d2 long")
        got = {
            r["doc_id"]: r["component"]
            for r in dedup.connected_components(pairs).collect()
        }
        assert got == uf_components(edges, nodes), f"seed={seed}"


# -- PCA --------------------------------------------------------------------

def test_pca_fit_matches_numpy(spark):
    rng = np.random.RandomState(5)
    # anisotropic cloud: variance concentrated along two known axes
    base = rng.normal(0, 1, (200, 2)) @ np.array([[3.0, 0.0], [0.0, 1.0]])
    rot = np.array([[np.cos(0.6), -np.sin(0.6)], [np.sin(0.6), np.cos(0.6)]])
    X = np.hstack([base @ rot, rng.normal(0, 0.1, (200, 2))]) + 7.0
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    from semantic_cpp_spark.pipeline import decomposition

    mean, comps, ev = decomposition.pca_fit(df, k=2, dims=4)

    cov = np.cov(X.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-9)
    for j, i in enumerate(order):
        assert ev[j] == pytest.approx(vals[i], rel=1e-9)
        v = vecs[:, i]
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if len(nz) and v[nz[0]] < 0:
            v = -v
        np.testing.assert_allclose(comps[j], v, rtol=1e-7, atol=1e-9)
    # explained variance sorted descending and dominated by the 3σ axis
    assert ev[0] > ev[1]


def test_pca_project_variances_match_eigenvalues(spark):
    rng = np.random.RandomState(9)
    X = rng.normal(0, 1, (300, 3)) * np.array([5.0, 2.0, 0.5])
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    from semantic_cpp_spark.pipeline import decomposition

    mean, comps, ev = decomposition.pca_fit(df, k=3, dims=3)
    proj = decomposition.pca_project(df, mean, comps).collect()
    P = np.array([r["proj"] for r in sorted(proj, key=lambda r: r["vec_id"])])
    # per-axis variance of the projection equals the eigenvalue
    np.testing.assert_allclose(P.var(axis=0), ev, rtol=1e-9)
    # projection plan is pure map — no exchange
    plan = decomposition.pca_project(
        df, mean, comps
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pca_power_fit_converges_to_eigh(spark):
    """pca_power_fit (the oracle-replayable fixed-round fit) must agree
    with eigh on a well-separated spectrum: eigenvalues to 1e-6 rel,
    components to |cos| ≈ 1 (power-iteration sign is pinned by v0, eigh
    sign is arbitrary — compare up to sign), trace = Σ all eigenvalues,
    and explained ratios descending. 15 rounds on eigengap ratios ≥ 2
    converge far past 6dp — the margin the DuckDB replay relies on."""
    rng = np.random.RandomState(3)
    X = rng.normal(0, 1, (400, 6)) * np.array([6.0, 3.0, 1.5, 0.7, 0.3, 0.1])
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    from semantic_cpp_spark.pipeline import decomposition

    mean, comps, vals, trace = decomposition.pca_power_fit(
        df, k=3, rounds=15, dims=6
    )
    cov = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-9)
    assert trace == pytest.approx(float(evals.sum()), rel=1e-9)
    for j in range(3):
        assert vals[j] == pytest.approx(float(evals[order[j]]), rel=1e-6)
        cosang = abs(float(np.dot(comps[j], evecs[:, order[j]])))
        assert cosang == pytest.approx(1.0, abs=1e-6)
    assert vals[0] > vals[1] > vals[2] > 0


# -- edge cases across the r3 operator families ------------------------------

def test_empty_input_edges(spark):
    """None of the r3 operators may throw on empty/degenerate input."""
    from semantic_cpp_spark.operators.interval import interval_join

    empty_pairs = spark.createDataFrame([], "d1 long, d2 long")
    assert dedup.connected_components(empty_pairs).count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert (
        retrieval.bm25_topk(
            empty_docs, F.col("text"), F.col("doc_id"), ["x"], 5
        ).count()
        == 0
    )
    assert (
        curation.pack_token_sequences(
            empty_docs, F.col("text"), F.col("doc_id"), 4, 100
        ).count()
        == 0
    )
    left = spark.createDataFrame([(1, 1, 10)], "k long, lid long, lt long")
    empty_right = spark.createDataFrame([], "k long, rid long, rt long")
    assert interval_join(left, empty_right, "k", "lt", "rt", 5).count() == 0


def test_bm25_terms_absent_from_corpus(spark):
    df = _docs(spark, ["alpha beta", "gamma delta"])
    out = retrieval.bm25_topk(
        df, F.col("text"), F.col("doc_id"), ["zzz", "qqq"], 5
    )
    assert out.count() == 0


def test_kmeans_k_exceeds_data(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = clustering.kmeans_assign(df, k=5).collect()
    assert {r["vec_id"] for r in out} == {0, 1}
    assert all(r["d2"] == 0.0 for r in out)  # every point is its own seed


def test_fixed_k_per_stratum_exact_size_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(200)],
        "doc_id long, stratum string",
    )
    out1 = curation.fixed_k_per_stratum(
        df, F.col("doc_id"), F.col("stratum"), 7, "x"
    ).collect()
    assert len(out1) == 14
    from collections import Counter

    assert Counter(r["stratum"] for r in out1) == {"a": 7, "b": 7}
    out2 = curation.fixed_k_per_stratum(
        df.repartition(13), F.col("doc_id"), F.col("stratum"), 7, "x"
    ).collect()
    assert sorted(r["doc_id"] for r in out1) == sorted(r["doc_id"] for r in out2)


def test_fuzzy_match_edit1_blocking_lossless(spark):
    """Randomized losslessness: the first/last-char blocked fuzzy join
    must find EXACTLY the pairs the naive all-pairs levenshtein finds —
    insertions, deletions, substitutions, at every position."""
    import random

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    rng = random.Random(13)
    alpha = "abc"  # tiny alphabet → dense collisions
    # lengths 0-5: the len<=1 corner (substitution 'a'<->'b', ''<->'x')
    # shares neither end char and needs the S-key rescue (r3 advisor)
    vocab = list({"".join(rng.choices(alpha, k=rng.randint(0, 5))) for _ in range(60)})
    queries = list({"".join(rng.choices(alpha, k=rng.randint(0, 5))) for _ in range(40)})
    assert any(len(s) <= 1 for s in vocab) and any(len(s) <= 1 for s in queries)
    exp = sorted(
        (q, t, lev(q, t)) for q in queries for t in vocab if lev(q, t) <= 1
    )
    qdf = spark.createDataFrame([(q,) for q in queries], "q string")
    vdf = spark.createDataFrame([(t,) for t in vocab], "term string")
    got = sorted(
        (r["q"], r["term"], r["dist"])
        for r in retrieval.fuzzy_match_edit1(qdf, vdf).collect()
    )
    assert got == exp


# -- round 6: word chunks, boilerplate removal, containment, splits ---------

def test_word_chunks_shapes(spark):
    df = _docs(spark, ["a b c d e f g h i j k l", "x y", "solo"])
    out = df.select(
        "doc_id", curation.word_chunks(F.col("text"), 5).alias("ch")
    ).collect()
    by_id = {r["doc_id"]: r["ch"] for r in out}
    assert by_id[0] == ["a b c d e", "f g h i j", "k l"]  # short last chunk
    assert by_id[1] == ["x y"]
    assert by_id[2] == ["solo"]


def test_remove_boilerplate_chunks(spark):
    # chunk_size=2; "dup dup" appears in docs 0 and 1 -> boilerplate;
    # doc 2 shares nothing.
    df = _docs(
        spark,
        [
            "dup dup keep one",
            "dup dup other text here",
            "clean words only",
        ],
    )
    out = curation.remove_boilerplate_chunks(
        df, F.col("text"), F.col("doc_id"), chunk_size=2, min_docs=2
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_chunks"] == 2 and by_id[0]["n_kept"] == 1
    assert by_id[0]["clean_text"] == "keep one"
    assert by_id[1]["n_chunks"] == 3 and by_id[1]["n_kept"] == 2
    assert by_id[1]["clean_text"] == "other text here"  # order preserved
    assert by_id[2]["n_kept"] == by_id[2]["n_chunks"] == 2
    assert by_id[2]["clean_text"] == "clean words only"


def test_remove_boilerplate_within_doc_repeat_not_hot(spark):
    # a chunk repeated twice in the SAME doc is not boilerplate
    # (min_docs counts DISTINCT docs).
    df = _docs(spark, ["aa bb aa bb cc dd", "zz yy xx ww vv uu"])
    out = curation.remove_boilerplate_chunks(
        df, F.col("text"), F.col("doc_id"), chunk_size=2, min_docs=2
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_kept"] == 3
    assert by_id[0]["clean_text"] == "aa bb aa bb cc dd"


def test_containment_directed_vs_jaccard(spark):
    # doc 0 is fully contained in doc 1 (a strict prefix); the union
    # denominator keeps Jaccard low, but containment(0 -> 1) == 1.0.
    short = "q w e r t y u"
    long_ = short + " " + " ".join(f"pad{i}" for i in range(40))
    df = _docs(spark, [short, long_])
    pairs = dedup.containment_pairs(
        df, F.col("text"), F.col("doc_id"), k=3, threshold=0.5
    ).collect()
    directed = {(r["d1"], r["d2"]): r["containment"] for r in pairs}
    assert directed[(0, 1)] == 1.0
    assert (1, 0) not in directed  # long doc is NOT contained in short
    jac = dedup.ngram_jaccard_pairs(
        df, F.col("text"), F.col("doc_id"), k=3, threshold=0.5
    ).collect()
    assert jac == []  # symmetric Jaccard misses the subset duplicate


def test_split_assign_deterministic_and_fractions(spark):
    df = spark.range(5_000).select(F.col("id").alias("doc_id"))
    out = df.select(
        "doc_id", curation.split_assign(F.col("doc_id")).alias("split")
    )
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5_000 - 0.8) < 0.03
    assert abs(counts["val"] / 5_000 - 0.1) < 0.02
    assert abs(counts["test"] / 5_000 - 0.1) < 0.02
    # repartitioning must not move any document between splits
    again = {
        r["doc_id"]: r["split"]
        for r in df.repartition(13).select(
            "doc_id", curation.split_assign(F.col("doc_id")).alias("split")
        ).collect()
    }
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again


def test_incremental_near_dup_matches_self_join_restriction(spark):
    # corpus with a planted near-duplicate pair crossing the batch split:
    # doc 7 (batch) duplicates doc 2 (corpus); doc 17 (batch) is unique.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (2, base),
        (7, base + " tail"),        # near-dup of 2, lands in the batch
        (17, "totally different words with no overlap at all here now"),
        (4, "another unrelated corpus document with its own content set"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    batch = df.filter(F.col("doc_id") % 10 == 7)
    corpus = df.filter(F.col("doc_id") % 10 != 7)
    out = dedup.incremental_near_dup(
        corpus, batch, F.col("text"), F.col("doc_id")
    ).collect()
    got = {(r["new_id"], r["dup_of"]): r["est_jaccard"] for r in out}
    assert (7, 2) in got and got[(7, 2)] >= 0.5
    assert all(n in (7, 17) for n, _ in got)  # only batch docs on the left
    # agreement with the full self-join restricted to cross-split pairs
    full = dedup.minhash_lsh_pairs(
        df, F.col("text"), F.col("doc_id")
    ).collect()
    cross = {
        (max(r["d1"], r["d2"]) if (max(r["d1"], r["d2"]) % 10 == 7) else min(r["d1"], r["d2"])):
        r["est_jaccard"]
        for r in full
        if (r["d1"] % 10 == 7) != (r["d2"] % 10 == 7)
    }
    for (n, _), ej in got.items():
        assert cross.get(n) == ej


def test_bigram_cross_entropy_hand_computed(spark):
    # corpus: "a b a b" and "a b c". bigram counts: (a,b)=3, (b,a)=1,
    # (b,c)=1; left totals: a·=3, b·=2.
    # doc0 bigrams: ab, ba, ab -> nll = -ln(3/3) -ln(1/2) -ln(3/3) = ln2
    #   H = ln2 / 3
    # doc1 bigrams: ab, bc -> nll = -ln(3/3) - ln(1/2) = ln2; H = ln2/2
    import math

    df = _docs(spark, ["a b a b", "a b c", "solo"])
    out = {r["doc_id"]: r for r in retrieval.bigram_cross_entropy(
        df, F.col("text"), F.col("doc_id")).collect()}
    assert set(out) == {0, 1}  # 1-token doc has no bigrams
    assert out[0]["n_bigrams"] == 3
    assert abs(out[0]["cross_entropy2"] - round(math.log(2) / 3, 6)) < 1e-9
    assert out[1]["n_bigrams"] == 2
    assert abs(out[1]["cross_entropy2"] - round(math.log(2) / 2, 6)) < 1e-9


def test_boilerplate_identity_when_nothing_hot(spark):
    # min_docs above the corpus size: nothing is hot, so every doc
    # re-assembles to its whitespace-normalised self.
    import random

    rng = random.Random(11)
    vocab = [f"w{j}" for j in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 35)))
        for _ in range(25)
    ]
    df = _docs(spark, texts)
    out = {r["doc_id"]: r for r in curation.remove_boilerplate_chunks(
        df, F.col("text"), F.col("doc_id"), chunk_size=7, min_docs=999
    ).collect()}
    for i, t in enumerate(texts):
        assert out[i]["n_kept"] == out[i]["n_chunks"]
        assert out[i]["clean_text"] == t


def test_containment_uncapped_vs_naive(spark):
    # randomized differential: containment_pairs with the df-cap OFF must
    # equal a naive pure-Python all-pairs computation.
    import random

    rng = random.Random(23)
    vocab = [f"t{j}" for j in range(12)]  # small vocab -> dense overlaps
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 25)))
        for _ in range(18)
    ]
    k, th = 3, 0.3
    sh = []
    for t in texts:
        ws = t.split()
        sh.append({" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}
                  if len(ws) >= k else set())
    expect = {}
    for a in range(len(texts)):
        for b in range(len(texts)):
            if a == b or not sh[a]:
                continue
            c = len(sh[a] & sh[b]) / len(sh[a])
            if c >= th:
                expect[(a, b)] = round(c, 6)
    df = _docs(spark, texts)
    got = {
        (r["d1"], r["d2"]): r["containment"]
        for r in dedup.containment_pairs(
            df, F.col("text"), F.col("doc_id"), k=k, threshold=th,
            max_shingle_df=None,
        ).collect()
    }
    assert got == expect


def test_incremental_near_dup_never_self_pairs(spark):
    # a batch re-ingesting an id already in the corpus must not report
    # the doc as a near-dup of itself.
    base = "one two three four five six seven eight nine ten " * 2
    df_corpus = spark.createDataFrame(
        [(7, base), (2, "entirely different corpus content here")],
        "doc_id long, text string",
    )
    df_batch = spark.createDataFrame([(7, base)], "doc_id long, text string")
    out = dedup.incremental_near_dup(
        df_corpus, df_batch, F.col("text"), F.col("doc_id")
    ).collect()
    assert all(r["new_id"] != r["dup_of"] for r in out)
    assert out == []  # identical doc is its only collision -> filtered


def test_clean_corpus_summary_funnel(spark):
    # 6 docs: 2 exact dups of doc 0 (whitespace/case variants), leaving
    # 4 unique; median filter keeps the top half (>= med of 4 uniques).
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "THE  Quick  brown fox jumps over the lazy dog"),  # dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),    # dup of 0
        (3, "zz yy xx ww vv uu tt ss"),
        (4, "the a of and to in is it the a of and"),
        (5, "mixed words the and some other tokens here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.clean_corpus_summary(
        df, F.col("text"), F.col("doc_id")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_total"] == 6 and r["n_unique"] == 4
    # >= median of 4 values keeps at least 2 (both middle values tie-free)
    assert 2 <= r["n_final"] <= 4
    assert r["n_train"] + r["n_val"] + r["n_test"] == r["n_final"]


def test_minhash_containment_detects_subset_dup(spark):
    # the same planted subset-duplicate scenario as the exact operator:
    # short doc contained in a long one. The minhash estimate must flag
    # the same direction and roughly agree with exact containment.
    short = "q w e r t y u i o p a s d f g h"
    long_ = short + " " + " ".join(f"pad{i}" for i in range(10))
    df = _docs(spark, [short, long_, "unrelated other words entirely here"])
    got = {
        (r["d1"], r["d2"]): r["est_containment"]
        for r in dedup.minhash_containment_pairs(
            df, F.col("text"), F.col("doc_id"), j_threshold=0.3,
            c_threshold=0.5,
        ).collect()
    }
    assert (0, 1) in got and got[(0, 1)] >= 0.7  # short mostly inside long
    assert (1, 0) not in got or got[(1, 0)] < got[(0, 1)]


# -- weighted sampling / chunking / line dedup (round-6 session) -------------

def test_weighted_sample_k_basics(spark):
    from semantic_cpp_spark.pipeline import curation

    df = spark.createDataFrame(
        [(i, 1 if i else 10**9) for i in range(100)], "id long, w long"
    )
    out = curation.weighted_sample_k(df, F.col("id"), F.col("w"), k=10)
    rows = out.collect()
    assert len(rows) == 10
    assert all(r.priority > 0 for r in rows)
    # priority = -ln(u)/w: the 10^9-weight row's priority is ~1e-9 scale
    # vs ~1.0 for the unit-weight rows, so it must be drawn.
    assert 0 in {r.id for r in rows}
    # deterministic: a second invocation selects the identical set
    again = {r.id for r in curation.weighted_sample_k(
        df, F.col("id"), F.col("w"), k=10).collect()}
    assert again == {r.id for r in rows}
    # k >= n returns everything
    assert curation.weighted_sample_k(df, F.col("id"), F.col("w"), k=500).count() == 100


def test_weighted_sample_salt_changes_sample(spark):
    from semantic_cpp_spark.pipeline import curation

    df = spark.createDataFrame([(i, 1) for i in range(200)], "id long, w long")
    a = {r.id for r in curation.weighted_sample_k(df, F.col("id"), F.col("w"), 20, salt="a").collect()}
    b = {r.id for r in curation.weighted_sample_k(df, F.col("id"), F.col("w"), 20, salt="b").collect()}
    assert a != b  # measure-zero collision for 200 hashed priorities


def test_chunk_text_exact_windows(spark):
    from semantic_cpp_spark.pipeline import curation

    df = spark.createDataFrame([(1, "abcdefghij"), (2, ""), (3, "xy")],
                               "doc_id long, text string")
    out = curation.chunk_text(df, F.col("text"), F.col("doc_id"), size=4, stride=3)
    got = {(r.doc_id, r.chunk_idx): (r.chunk, r.chunk_len) for r in out.collect()}
    # doc 1, len 10: starts 1,4,7,10 -> abcd defg hij j
    assert got[(1, 0)] == ("abcd", 4)
    assert got[(1, 1)] == ("defg", 4)
    assert got[(1, 2)] == ("ghij", 4)
    assert got[(1, 3)] == ("j", 1)
    # empty text: one empty chunk (start position clamped to 1)
    assert got[(2, 0)] == ("", 0)
    # short text: single partial chunk
    assert got[(3, 0)] == ("xy", 2)
    assert len(got) == 6
    # overlap: consecutive chunks share size-stride chars
    assert got[(1, 0)][0][3:] == got[(1, 1)][0][:1]


def test_chunk_text_rejects_bad_params(spark):
    from semantic_cpp_spark.pipeline import curation

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        curation.chunk_text(df, F.col("text"), F.col("doc_id"), size=0, stride=3)
    with pytest.raises(ValueError):
        curation.chunk_text(df, F.col("text"), F.col("doc_id"), size=4, stride=0)


def test_line_dedup_keeps_first_occurrence_only(spark):
    from semantic_cpp_spark.pipeline import curation

    rep = "a b c d e f g h i j"          # one full 10-word chunk
    uniq1 = "k l m n o p q r s t"
    uniq2 = "u v w x y z aa bb cc dd"
    df = spark.createDataFrame(
        [(1, rep + " " + uniq1), (2, uniq2 + " " + rep), (3, rep)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation.line_dedup(
        df, F.col("text"), F.col("doc_id"), chunk_size=10).collect()}
    # doc 1 holds the first occurrence (smallest doc_id) -> keeps both chunks
    assert (out[1].n_chunks, out[1].n_kept) == (2, 2)
    assert out[1].clean_text == rep + " " + uniq1
    # doc 2's copy of rep (chunk_idx 1) is a later occurrence -> removed
    assert (out[2].n_chunks, out[2].n_kept) == (2, 1)
    assert out[2].clean_text == uniq2
    # doc 3 is nothing but a later occurrence -> emptied, row still present
    assert (out[3].n_chunks, out[3].n_kept) == (1, 0)
    assert out[3].clean_text == ""


def test_line_dedup_first_by_chunk_idx_within_doc(spark):
    from semantic_cpp_spark.pipeline import curation

    rep = "a b c d e f g h i j"
    # same doc repeats the chunk twice: idx 0 survives, idx 1 removed
    df = spark.createDataFrame([(7, rep + " " + rep)], "doc_id long, text string")
    r = curation.line_dedup(df, F.col("text"), F.col("doc_id"), 10).collect()[0]
    assert (r.n_chunks, r.n_kept, r.clean_text) == (2, 1, rep)


def test_prefix_filter_matches_exact_allpairs(spark):
    """Losslessness: prefix filtering must return EXACTLY the pairs the
    uncapped all-pairs shingle join returns (same τ, same shingles)."""
    from semantic_cpp_spark.pipeline import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" tail{i}") for i in range(20)]           # near-dups
    rows += [(100 + i, f"u{i} v{i} w{i} x{i} y{i} z{i} q{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.d1, r.d2, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(
            df, F.col("text"), F.col("doc_id"), k=3, threshold=0.8,
            max_shingle_df=None,
        ).collect()
    }
    got = {
        (r.d1, r.d2, r.jaccard)
        for r in dedup.prefix_filter_jaccard_pairs(
            df, F.col("text"), F.col("doc_id"), k=3, tau_num=4, tau_den=5
        ).collect()
    }
    assert got == exact and len(got) > 0


def test_prefix_filter_integer_ceil_boundary(spark):
    """J exactly = τ with τ·n integral (9 shingles sharing 8, union 10 →
    J = 0.8): a float ceil(0.8·9)=ceil(7.2000…0001) is harmless but
    ceil(0.8·10) computed as 9 instead of 8 would shorten doc prefixes
    below the lossless bound — the integer-exact ceil keeps the pair."""
    from semantic_cpp_spark.pipeline import dedup

    w = [f"w{i}" for i in range(11)]
    d1 = " ".join(w)                       # 9 shingles
    d2 = " ".join(w[:10] + ["DIFF"])       # shares 8 of its 9 shingles
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    rows = dedup.prefix_filter_jaccard_pairs(
        df, F.col("text"), F.col("doc_id"), k=3, tau_num=4, tau_den=5
    ).collect()
    assert [(r.d1, r.d2, r.jaccard) for r in rows] == [(1, 2, 0.8)]


def test_prefix_filter_rejects_bad_tau(spark):
    from semantic_cpp_spark.pipeline import dedup

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.prefix_filter_jaccard_pairs(df, F.col("text"), F.col("doc_id"), tau_num=0)
    with pytest.raises(ValueError):
        dedup.prefix_filter_jaccard_pairs(df, F.col("text"), F.col("doc_id"), tau_num=6, tau_den=5)


def test_jl_project_matches_numpy_and_preserves_distance(spark):
    """jl_project vs a numpy reference of the same ±1/√8 matrix, plus a
    JL sanity check: projected pairwise distance within a loose (1±0.9)
    band of the original for k=8 (the lemma's ε at this k is weak — this
    pins sign/scale wiring, not tight distortion)."""
    import numpy as np

    from semantic_cpp_spark.pipeline import decomposition

    rng = np.random.default_rng(7)
    X = rng.normal(size=(20, 64)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = decomposition.jl_project(df).collect()
    R = np.array(decomposition.jl_signs(8, 64), dtype=np.float64)
    Y = (X.astype(np.float64) @ R.T) * decomposition.JL_SCALE_8
    got = np.zeros_like(Y)
    for r in out:
        got[r.vec_id, r.out_dim] = r.value
    assert np.allclose(got, Y, atol=1e-6)
    d_orig = np.linalg.norm(X[0].astype(np.float64) - X[1].astype(np.float64))
    d_proj = np.linalg.norm(Y[0] - Y[1])
    assert 0.1 * d_orig < d_proj < 1.9 * d_orig


def test_jl_project_rejects_unpinned_shapes(spark):
    from semantic_cpp_spark.pipeline import decomposition

    df = spark.createDataFrame([(1, [0.0] * 64)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        decomposition.jl_project(df, out_dims=4)


def test_pmi_bigrams_hand_computed(spark):
    """Corpus where 'x y' always co-occur vs independent fillers: PMI of
    (x,y) must top the list and equal the closed form."""
    import math

    from semantic_cpp_spark.pipeline import retrieval

    docs = [(i, "x y " + f"f{i} g{i}") for i in range(6)]  # 6 docs, 4 tokens each
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = retrieval.pmi_bigrams(df, F.col("text"), min_count=5, k=10).collect()
    # only ('x','y') reaches count >= 5 (6 occurrences); all others unique
    assert [(r.w1, r.w2, r.n_pair) for r in out] == [("x", "y", 6)]
    n_tokens, n_bigrams, c_xy, c_x, c_y = 24, 18, 6, 6, 6
    expect = math.log(c_xy) + 2 * math.log(n_tokens) - math.log(n_bigrams) \
        - math.log(c_x) - math.log(c_y)
    assert abs(out[0].pmi - round(expect, 6)) < 1e-9


def test_zipf_fit_recovers_known_slope(spark):
    """A corpus built with freq(rank r) = round(1000·r^-0.8) must fit
    slope ≈ -0.8 with r² ≈ 1 (exact-integer rounding gives tiny
    residue)."""
    from semantic_cpp_spark.pipeline import retrieval

    words = []
    for r in range(1, 51):
        words += [f"w{r:03d}"] * max(1, round(1000 * r ** -0.8))
    # spread over docs so nothing depends on document boundaries
    docs = [(i, " ".join(words[i::20])) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = retrieval.zipf_fit(df, F.col("text"), top_n=50).collect()[0]
    assert row.n_terms == 50
    assert abs(row.slope - (-0.8)) < 0.02
    assert row.r2 > 0.999


def test_token_entropy_hand_computed(spark):
    """'a a a a' → H=0, ttr=0.25; 'a b c d' → H=ln 4, ttr=1; 'a a b b'
    → H=ln 2."""
    import math

    from semantic_cpp_spark.pipeline import text as T

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.token_entropy(df, F.col("text"), F.col("doc_id")).collect()}
    assert (out[1].n_tokens, out[1].n_types, out[1].entropy, out[1].ttr) == (4, 1, 0.0, 0.25)
    assert out[2].entropy == round(math.log(4), 6) and out[2].ttr == 1.0
    assert out[3].entropy == round(math.log(2), 6) and out[3].ttr == 0.5


def test_ngram_novelty_first_doc_wins(spark):
    from semantic_cpp_spark.pipeline import text as T

    span = "one two three four five"
    df = spark.createDataFrame(
        [(1, span + " six seven eight nine ten"),
         (2, span),                      # entirely recycled from doc 1
         (3, "a b c d e f g h i j")],    # entirely novel
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.ngram_novelty(
        df, F.col("text"), F.col("doc_id"), span_words=5).collect()}
    assert out[1].novelty == 1.0            # first occurrence of everything
    assert (out[2].n_spans, out[2].n_seen_before, out[2].novelty) == (1, 1, 0.0)
    assert out[3].novelty == 1.0


def test_prefix_filter_randomized_losslessness(spark):
    """Randomized differential: on corpora with planted near-dup families
    plus noise, prefix filtering must equal the uncapped all-pairs join
    at every tested threshold (the lossless claim, not just one case)."""
    import random

    from semantic_cpp_spark.pipeline import dedup

    rng = random.Random(1234)
    vocab = [f"t{i}" for i in range(60)]
    rows = []
    doc_id = 0
    for fam in range(5):                      # planted families of 4
        base = rng.sample(vocab, 12)
        for v in range(4):
            toks = list(base)
            for _ in range(rng.randrange(0, 3)):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            rows.append((doc_id, " ".join(toks)))
            doc_id += 1
    for _ in range(15):                        # noise docs
        rows.append((doc_id, " ".join(rng.choice(vocab) for _ in range(10))))
        doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for num, den in ((1, 2), (7, 10), (4, 5)):
        exact = {
            (r.d1, r.d2, r.jaccard)
            for r in dedup.ngram_jaccard_pairs(
                df, F.col("text"), F.col("doc_id"), k=3,
                threshold=num / den, max_shingle_df=None,
            ).collect()
        }
        got = {
            (r.d1, r.d2, r.jaccard)
            for r in dedup.prefix_filter_jaccard_pairs(
                df, F.col("text"), F.col("doc_id"), k=3,
                tau_num=num, tau_den=den,
            ).collect()
        }
        assert got == exact, (num, den, got ^ exact)


def test_hybrid_rrf_hand_computed(spark):
    """Tiny id-aligned corpus: doc present in both lists outranks docs
    in one list; exact 1/(60+r) sums."""
    from semantic_cpp_spark.pipeline import retrieval

    docs = spark.createDataFrame(
        [(0, "query data spark engine"),      # matches all 3 terms
         (1, "data data data data"),          # strong on one term
         (2, "nothing relevant here at all"),
         (3, "query spark")],
        "doc_id long, text string",
    )
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # the query vector
        (1, [0.9, 0.1, 0.0, 0.0]),   # closest
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.5, 0.5, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = retrieval.hybrid_rrf(
        docs, emb, F.col("text"), F.col("doc_id"),
        ["data", "query", "spark"], query_vec_id=0, k=4, k_each=10,
    ).collect()
    by_doc = {r.doc_id: r for r in out}
    # doc 1: lexical hit AND vec rank 1 -> both terms present
    assert by_doc[1].lex_rank is not None and by_doc[1].vec_rank == 1
    assert abs(by_doc[1].rrf - round(1 / (60 + by_doc[1].lex_rank) + 1 / 61, 6)) < 1e-9
    # doc 2: no lexical match -> vec-only contribution
    assert by_doc[2].lex_rank is None
    assert abs(by_doc[2].rrf - round(1 / (60 + by_doc[2].vec_rank), 6)) < 1e-9
    # fused ranking is 1..4 with rrf non-increasing
    rks = sorted(out, key=lambda r: r.rk)
    assert [r.rk for r in rks] == [1, 2, 3, 4]
    assert all(rks[i].rrf >= rks[i + 1].rrf for i in range(3))


def test_negative_samples_contract(spark):
    from semantic_cpp_spark.pipeline import curation

    pos = spark.createDataFrame(
        [(1, 0), (1, 1), (2, 5)], "user long, item long"
    )
    n_items = spark.createDataFrame([(50,)], "n_items long")
    out = curation.negative_samples(pos, n_items, k=3, margin=4)
    rows = out.collect()
    pos_set = {(1, 0), (1, 1), (2, 5)}
    assert all((r.user, r.item) not in pos_set for r in rows)
    assert all(0 <= r.item < 50 for r in rows)
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user, []).append(r.rank)
    for u, ranks in by_user.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # determinism across invocations
    again = {(r.user, r.item, r.rank) for r in curation.negative_samples(
        pos, n_items, k=3, margin=4).collect()}
    assert again == {(r.user, r.item, r.rank) for r in rows}


def test_negative_samples_margin_exhaustion(spark):
    """With a 2-item universe where the user owns one item, at most one
    distinct negative can exist regardless of k."""
    from semantic_cpp_spark.pipeline import curation

    pos = spark.createDataFrame([(7, 0)], "user long, item long")
    n_items = spark.createDataFrame([(2,)], "n_items long")
    rows = curation.negative_samples(pos, n_items, k=5, margin=5).collect()
    assert len(rows) <= 1
    if rows:
        assert rows[0].item == 1 and rows[0].rank == 1


def test_prefix_filter_hot_shingle_candidates_stay_linear(spark):
    """The prefix-filter scale guarantee, asserted on the CANDIDATE
    count: 120 docs all sharing one hot 14-token boilerplate prefix plus
    unique tails. The naive any-shared-shingle join meets every pair
    through the boilerplate (120·119/2 = 7140 candidates); the canonical
    df-asc order pushes those hot shingles out of every prefix, so
    prefix candidates collapse to ~0 — near-linear, with zero loss (the
    exact result has no pairs: the unique tails push Jaccard below τ)."""
    from semantic_cpp_spark.pipeline import dedup

    boiler = " ".join(f"b{i}" for i in range(14))
    docs = [(i, boiler + f" u{i} v{i} w{i} x{i} y{i} z{i}") for i in range(120)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    _, cand = dedup._prefix_filter_candidates(
        df, F.col("text"), F.col("doc_id"), k=3, tau_num=4, tau_den=5
    )
    n_cand = cand.count()
    naive_pairs = 120 * 119 // 2
    assert n_cand < naive_pairs / 50, (n_cand, naive_pairs)
    # and the guarantee is not vacuous: losslessness on the same corpus
    assert dedup.prefix_filter_jaccard_pairs(
        df, F.col("text"), F.col("doc_id"), k=3, tau_num=4, tau_den=5
    ).count() == dedup.ngram_jaccard_pairs(
        df, F.col("text"), F.col("doc_id"), k=3, threshold=0.8,
        max_shingle_df=None,
    ).count()


def test_cluster_cohesion_matches_naive_pairwise(spark):
    """The O(n) sum identity vs the naive O(n²) pairwise mean on random
    vectors, plus singleton-NULL and zero-vector exclusion."""
    import itertools

    import numpy as np

    from semantic_cpp_spark.pipeline import clustering

    rng = np.random.default_rng(3)
    X = rng.normal(size=(30, 64))
    # centroid seeds are ids < k: make ids 0..7 well-separated seeds
    rows = [(i, [float(v) for v in X[i]]) for i in range(30)]
    rows.append((30, [0.0] * 64))          # zero vector -> excluded
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.c_id: r for r in clustering.cluster_cohesion(df, k=8).collect()}
    # recompute the naive mean pairwise cosine per cluster from the SAME
    # assignment the operator used
    assigned = clustering.kmeans_assign(df, 8).collect()
    clusters: dict[int, list[np.ndarray]] = {}
    for r in assigned:
        v = np.array(r.v)
        nv = np.linalg.norm(v)
        if nv > 0:
            clusters.setdefault(r.c_id, []).append(v / nv)
    for cid, vs in clusters.items():
        row = out[cid]
        assert row.n_members == len(vs)
        if len(vs) == 1:
            assert row.mean_pair_cos is None
            continue
        naive = np.mean([
            float(a @ b) for a, b in itertools.combinations(vs, 2)
        ])
        # two pairs (i,j)/(j,i) per combination -> same mean
        assert abs(row.mean_pair_cos - naive) < 1e-4, (cid, row.mean_pair_cos, naive)


def test_cluster_cohesion_non_64_dims(spark):
    """n_members must come from the data, not a hardcoded /64 (ADVICE r6
    #2): on 16-dim vectors the member counts and the pairwise-cosine mean
    must still be right."""
    import itertools

    import numpy as np

    from semantic_cpp_spark.pipeline import clustering

    rng = np.random.default_rng(7)
    X = rng.normal(size=(20, 16))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = {r.c_id: r for r in clustering.cluster_cohesion(df, k=4).collect()}
    clusters: dict[int, list[np.ndarray]] = {}
    for r in clustering.kmeans_assign(df, 4).collect():
        v = np.array(r.v)
        clusters.setdefault(r.c_id, []).append(v / np.linalg.norm(v))
    assert sum(r.n_members for r in out.values()) == 20
    for cid, vs in clusters.items():
        assert out[cid].n_members == len(vs)
        if len(vs) > 1:
            naive = np.mean(
                [float(a @ b) for a, b in itertools.combinations(vs, 2)]
            )
            assert abs(out[cid].mean_pair_cos - naive) < 1e-4


def test_semdedup_matches_naive_reference(spark):
    """clustering.semdedup vs a naive numpy replay of the same policy
    (assign to nearest deterministic seed, remove iff a lower-id member
    of the SAME cluster has cosine >= threshold) on clustered data with
    PLANTED near-duplicates; cross-cluster near-dups must NOT be removed
    (blocking semantics), and every cluster keeps >= 1 member."""
    import numpy as np

    from semantic_cpp_spark.pipeline import clustering

    rng = np.random.default_rng(5)
    centers = rng.normal(0, 1, (4, 16))
    labels = rng.integers(0, 4, 40)
    X = centers[labels] + rng.normal(0, 0.4, (40, 16))
    # plant near-dup pairs: docs 20/21 and 30/31 almost identical
    X[21] = X[20] + rng.normal(0, 0.01, 16)
    X[31] = X[30] + rng.normal(0, 0.01, 16)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    th = 0.9
    got = {r.vec_id: r for r in clustering.semdedup(df, k=4, threshold=th).collect()}

    seeds = X[:4]
    d2 = ((X[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
    cid = d2.argmin(axis=1)
    unit = X / np.linalg.norm(X, axis=1, keepdims=True)
    for i in range(40):
        same = [j for j in range(i) if cid[j] == cid[i]]
        removed = any(float(unit[i] @ unit[j]) >= th for j in same)
        assert got[i].keep == (not removed), i
        assert got[i].c_id == cid[i], i
    # planted dups: the higher id of each near-identical pair always goes
    # (its partner sits below it in the same cluster at cos≈1); the lower
    # one may ALSO go if it has its own natural lower near-neighbor —
    # covered exactly by the reference loop above
    assert not got[21].keep
    assert not got[31].keep
    # every cluster retains at least one member
    kept_clusters = {r.c_id for r in got.values() if r.keep}
    assert kept_clusters == set(cid.tolist())


def test_semdedup_scaled_matches_naive_two_level_replay(spark):
    """semdedup_scaled = derived k (max(8, n // 75)) + TWO-LEVEL IVF
    assignment + the shared removal pass — pinned against a naive numpy
    replay of exactly those rules on a 900-vector corpus (k=12,
    k_coarse=4, so both the derivation and the routing are visibly in
    play) and on an 80-vector corpus at the k=8 floor. Every coarse
    seed must route to itself, so no cluster id outside [0, k) and no
    vector dropped."""
    import numpy as np

    from semantic_cpp_spark.pipeline import clustering

    def naive(X, th):
        n = len(X)
        k = max(8, n // 75)
        kc = min(max(4, int(np.floor(np.sqrt(k)))), k)
        d2 = lambda a, b: float(((a - b) ** 2).sum())  # noqa: E731
        def route(v, seeds):
            ds = [(d2(v, X[s]), s) for s in seeds]
            return min(ds)[1]
        coarse = list(range(kc))
        fine_cell = {f: route(X[f], coarse) for f in range(k)}
        cid = {}
        for i in range(n):
            cell = route(X[i], coarse)
            cands = [f for f in range(k) if fine_cell[f] == cell]
            cid[i] = min((d2(X[i], X[f]), f) for f in cands)[1]
        unit = X / np.linalg.norm(X, axis=1, keepdims=True)
        keep = {}
        for i in range(n):
            same = [j for j in range(i) if cid[j] == cid[i]]
            keep[i] = not any(float(unit[i] @ unit[j]) >= th for j in same)
        return cid, keep

    rng = np.random.default_rng(11)
    for n in (900, 80):
        X = rng.normal(0, 1, (n, 8))
        df = spark.createDataFrame(
            [(i, [float(v) for v in X[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r.vec_id: r
            for r in clustering.semdedup_scaled(df, threshold=0.9).collect()
        }
        cid, keep = naive(X, 0.9)
        assert len(got) == n
        for i in range(n):
            assert got[i].c_id == cid[i], (n, i)
            assert got[i].keep == keep[i], (n, i)
        k = max(8, n // 75)
        assert {r.c_id for r in got.values()} <= set(range(k))
        # derived k visibly in play on the big corpus
        if n == 900:
            assert len({r.c_id for r in got.values()}) > 8


def test_importance_weights_hand_computed(spark):
    """50/50 corpus toward a 80/20 target: weights 1.6 and 0.4; a
    stratum missing from the target gets default weight 0."""
    from semantic_cpp_spark.pipeline import curation

    df = spark.createDataFrame(
        [(i, "a" if i < 50 else ("b" if i < 100 else "c")) for i in range(110)],
        "doc_id long, lang string",
    )
    out = {r.stratum: r for r in curation.importance_weights(
        df, F.col("lang"), {"a": 0.8, "b": 0.2}).collect()}
    assert out["a"].n_docs == 50 and out["b"].n_docs == 50 and out["c"].n_docs == 10
    assert abs(out["a"].weight - round(0.8 / (50 / 110), 6)) < 1e-9
    assert abs(out["b"].weight - round(0.2 / (50 / 110), 6)) < 1e-9
    assert out["c"].weight == 0.0
    # the weighted mixture reproduces the target on covered strata:
    # n_docs * weight proportional to target share
    wa = out["a"].n_docs * out["a"].weight
    wb = out["b"].n_docs * out["b"].weight
    assert abs(wa / wb - 0.8 / 0.2) < 1e-6


def test_redundancy_curve_mechanism(spark):
    """A corpus whose second half introduces a fresh vocabulary shows
    new tokens in BOTH halves with cumulative coverage reaching 1."""
    qs = __import__("__spark_entry__").queries()
    import os
    import tempfile

    docs = [(i, f"shared a b c u{i}") for i in range(10)]      # deciles 0-4ish
    docs += [(10 + i, f"fresh x{i} y{i} z{i}") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tmp = tempfile.mkdtemp(prefix="redun_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    rows = sorted(qs["txt_redundancy_curve"](spark, tmp).collect(),
                  key=lambda r: r.decile)
    assert rows[-1].cum_coverage == 1.0
    assert len(rows) >= 2 and all(r.new_tokens > 0 for r in rows)
    # coverage is non-decreasing
    assert all(a.cum_coverage <= b.cum_coverage for a, b in zip(rows, rows[1:]))


def test_rank_eval_matches_hand_computation(spark):
    """NDCG@k/MRR/P@k/R@k from retrieval.rank_eval against a worked
    example: graded gains in rank order, ideal ranking from qrels,
    zero-relevant query floors every metric at 0."""
    run = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3), ("q2", 9, 1)],
        "query_id string, doc_id long, rk long",
    )
    qrels = spark.createDataFrame(
        [("q1", 2, 2), ("q1", 3, 1), ("q1", 4, 1), ("q2", 5, 1)],
        "query_id string, doc_id long, rel long",
    )
    out = {r["query_id"]: r for r in retrieval.rank_eval(run, qrels, k=3).collect()}
    dcg = (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    idcg = (2**2 - 1) / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    q1 = out["q1"]
    assert q1["ndcg"] == round(dcg / idcg, 6)
    assert q1["mrr"] == 0.5          # first relevant at rank 2
    assert q1["p_at_k"] == round(2 / 3, 6)
    assert q1["r_at_k"] == round(2 / 3, 6)   # 2 of 3 relevant retrieved
    q2 = out["q2"]                   # nothing relevant retrieved
    assert (q2["ndcg"], q2["mrr"], q2["p_at_k"], q2["r_at_k"]) == (0.0, 0.0, 0.0, 0.0)


def test_per_term_bm25_runs_rank_per_query(spark):
    """per_term_bm25_runs emits one independent k-cut ranking per term;
    single-term scores equal bm25_topk on the same corpus."""
    texts = [
        "data data query",
        "data fluff fluff fluff",
        "query query data words",
    ]
    df = _docs(spark, texts)
    runs = retrieval.per_term_bm25_runs(
        df, F.col("text"), F.col("doc_id"), ["data", "query"], k=10
    ).collect()
    by_q = {}
    for r in runs:
        by_q.setdefault(r["query_id"], []).append(r)
    # every doc containing the term appears, ranks contiguous from 1
    assert sorted(r["rk"] for r in by_q["data"]) == [1, 2, 3]
    assert sorted(r["rk"] for r in by_q["query"]) == [1, 2]
    single = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_topk(
            df, F.col("text"), F.col("doc_id"), ["data"], 10
        ).collect()
    }
    for r in by_q["data"]:
        assert r["score"] == single[r["doc_id"]]


def test_bloom_filter_membership_properties(spark):
    """Bloom build/probe invariants: NO false negatives ever; held-out
    keys all miss at the 4M-bit sizing (FP ~1e-13); a deliberately
    saturated 32-bit filter answers true for everything (the FP knob
    made visible); empty corpus → all probes false; non-power-of-two
    sizing rejected."""
    corpus = spark.createDataFrame(
        [(i, f"member-{i}") for i in range(200)], "id long, key string"
    )
    held_out = spark.createDataFrame(
        [(i, f"absent-{i}") for i in range(200)], "id long, key string"
    )
    bloom = dedup.bloom_build(corpus, F.col("key"))
    got = {
        r["id"]: r["maybe_member"]
        for r in dedup.bloom_probe(bloom, corpus, F.col("key"), F.col("id")).collect()
    }
    assert all(got.values()) and len(got) == 200  # no false negatives
    miss = {
        r["id"]: r["maybe_member"]
        for r in dedup.bloom_probe(bloom, held_out, F.col("key"), F.col("id")).collect()
    }
    assert not any(miss.values())
    # saturated filter: 200 keys x 5 hashes over 32 bits -> every bit set
    sat = dedup.bloom_build(corpus, F.col("key"), n_bits=32)
    sat_probe = dedup.bloom_probe(
        sat, held_out, F.col("key"), F.col("id"), n_bits=32
    ).collect()
    assert all(r["maybe_member"] for r in sat_probe)
    # empty corpus -> empty sparse filter -> everything misses
    empty = dedup.bloom_build(corpus.filter(F.lit(False)), F.col("key"))
    none = dedup.bloom_probe(empty, held_out, F.col("key"), F.col("id")).collect()
    assert not any(r["maybe_member"] for r in none)
    with pytest.raises(ValueError):
        dedup.bloom_build(corpus, F.col("key"), n_bits=1000)


def test_bloom_save_load_roundtrip(spark, tmp_path):
    """The persisted-index shape SCALING.md describes: bloom_save writes
    the sparse filter WITH its sizing sidecar, bloom_load hands both
    back, and a probe through the round-trip keeps the no-false-negative
    guarantee and the same miss set as the in-memory filter — the
    mismatch class (probing with re-typed wrong constants) is exactly
    what the sidecar exists to prevent."""
    corpus = spark.createDataFrame(
        [(i, f"member-{i}") for i in range(200)], "id long, key string"
    )
    held_out = spark.createDataFrame(
        [(i, f"absent-{i}") for i in range(200)], "id long, key string"
    )
    n_bits, k_hashes = 1 << 16, 4
    bloom = dedup.bloom_build(corpus, F.col("key"), n_bits=n_bits, k_hashes=k_hashes)
    root = str(tmp_path / "bloom_idx")
    dedup.bloom_save(bloom, root, n_bits=n_bits, k_hashes=k_hashes)
    loaded, got_bits, got_k = dedup.bloom_load(spark, root)
    assert (got_bits, got_k) == (n_bits, k_hashes)
    # identical sparse rows survive the parquet round-trip
    assert sorted(map(tuple, bloom.collect())) == sorted(map(tuple, loaded.collect()))
    hits = dedup.bloom_probe(
        loaded, corpus, F.col("key"), F.col("id"), n_bits=got_bits, k_hashes=got_k
    ).collect()
    assert all(r["maybe_member"] for r in hits) and len(hits) == 200
    direct = dedup.bloom_probe(
        bloom, held_out, F.col("key"), F.col("id"), n_bits=n_bits, k_hashes=k_hashes
    ).collect()
    via_disk = dedup.bloom_probe(
        loaded, held_out, F.col("key"), F.col("id"), n_bits=got_bits, k_hashes=got_k
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_disk))


def test_hll_distinct_error_band(spark):
    """Batch HLL (dedup.hll_distinct): estimate within 5% of the exact
    distinct count across two orders of magnitude, EXACTLY equal to the
    pure-Python streaming estimator on the same key set (shared md5
    register derivation — the two surfaces are mutually checkable), and
    invariant to duplication of the input. Bad sizing rejected."""
    from semantic_cpp_spark.pipeline.dedup import hll_distinct
    from semantic_cpp_spark.streaming.ops import HLL_M, hll_add, hll_estimate

    for n in (50, 1000, 20000):
        df = spark.range(n).select(F.col("id"))
        got = hll_distinct(df, F.col("id")).collect()[0]
        assert abs(got["hll_count"] - n) / n < 0.05, (n, got)
        regs = [0] * HLL_M
        for i in range(n):
            hll_add(regs, i)
        assert got["hll_count"] == pytest.approx(
            round(hll_estimate(regs), 4), abs=1e-4
        )
        # duplication invariance: registers are max-merged
        dup = spark.range(n).select((F.col("id") % n).alias("id")).union(df)
        got2 = hll_distinct(dup, F.col("id")).collect()[0]
        assert got2["hll_count"] == got["hll_count"]
    with pytest.raises(ValueError):
        hll_distinct(spark.range(5), F.col("id"), n_regs=100)


def test_cms_one_sided_bound_and_heavy_hitters(spark):
    """Count-Min invariants on a zipf-ish corpus: the estimate NEVER
    undercounts (structural: min over rows of sums that each include
    the key's own increments); the excess stays within the
    (e/width)*N guarantee with generous margin; absent keys estimate
    only collision mass; and sketches over corpus deltas MERGE by
    cell-summing to the whole-corpus sketch exactly."""
    import collections

    from semantic_cpp_spark.pipeline.dedup import cms_build, cms_estimate

    # zipf-ish: key k appears ~1000/k times
    rows = [k for k in range(1, 60) for _ in range(1000 // k)]
    exact = collections.Counter(rows)
    n_total = len(rows)
    df = spark.createDataFrame([(k,) for k in rows], "k long")
    cms = cms_build(df, F.col("k")).cache()
    keys = spark.createDataFrame([(k,) for k in exact], "k long")
    est = {
        r["key"]: r["cms_count"]
        for r in cms_estimate(cms, keys, F.col("k")).collect()
    }
    import math

    bound = math.e / 1024 * n_total
    for k, n in exact.items():
        assert est[k] >= n, (k, n, est[k])
        assert est[k] - n <= 4 * bound, (k, n, est[k], bound)
    # top-10 by estimate contains the true top-5 heavy hitters
    top_est = sorted(est, key=lambda k: (-est[k], k))[:10]
    assert set(range(1, 6)) <= set(top_est)
    # absent keys: only collision mass, far below the heavy hitters
    absent = spark.createDataFrame([(10_000 + i,) for i in range(20)], "k long")
    ab = cms_estimate(cms, absent, F.col("k")).collect()
    assert all(r["cms_count"] <= 4 * bound for r in ab)
    # mergeability: sum of per-delta sketches == whole-corpus sketch
    d1 = cms_build(
        spark.createDataFrame([(k,) for k in rows[:2000]], "k long"), F.col("k")
    )
    d2 = cms_build(
        spark.createDataFrame([(k,) for k in rows[2000:]], "k long"), F.col("k")
    )
    merged = {
        (r["r"], r["c"]): r["s"]
        for r in d1.unionByName(d2)
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    whole = {(r["r"], r["c"]): r["cnt"] for r in cms.collect()}
    assert merged == whole
    cms.unpersist()


# -- exact-substring dedup planner (duplicate_span_cuts) --------------------

def test_span_cuts_identical_doc_fully_cut(spark):
    words = " ".join(f"w{i}" for i in range(20))
    df = _docs(spark, [words, words, "totally different content here now ok"])
    out = dedup.duplicate_span_cuts(
        df, F.col("text"), F.col("doc_id"), n=8
    ).collect()
    # doc 1 is a verbatim copy: one cut covering all 20 tokens; doc 0
    # (first occurrence) and doc 2 (novel) emit nothing
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id"], r["cut_start"], r["cut_end"]) == (1, 0, 20)
    assert r["n_spans"] == 13  # 20 - 8 + 1 duplicated span starts


def test_span_cuts_embedded_region_exact_coverage(spark):
    # the completeness argument: a 12-token shared region embedded in
    # DIFFERENT contexts is cut exactly, boundaries included, because
    # its 5 duplicated 8-gram occurrences union to [start, start+12)
    shared = " ".join(f"s{i}" for i in range(12))
    doc_a = "x1 x2 x3 x4 x5 " + shared + " y1 y2 y3 y4 y5"
    doc_b = "z1 z2 z3 " + shared + " w1 w2 w3 w4 w5 w6 w7 w8"
    df = _docs(spark, [doc_a, doc_b])
    out = dedup.duplicate_span_cuts(
        df, F.col("text"), F.col("doc_id"), n=8
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id"], r["cut_start"], r["cut_end"]) == (1, 3, 15)
    assert r["n_spans"] == 5  # 12 - 8 + 1


def test_span_cuts_within_doc_repeat(spark):
    # only the corpus-wide FIRST occurrence survives — a doc repeating
    # its own 10 words gets its second occurrence cut
    block = " ".join(f"b{i}" for i in range(10))
    df = _docs(spark, [block + " mid1 mid2 " + block])
    out = dedup.duplicate_span_cuts(
        df, F.col("text"), F.col("doc_id"), n=8
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["cut_start"], r["cut_end"]) == (12, 22)


def test_span_cuts_no_duplication_is_empty(spark):
    df = _docs(
        spark,
        [
            " ".join(f"a{i}" for i in range(15)),
            " ".join(f"b{i}" for i in range(15)),
        ],
    )
    assert (
        dedup.duplicate_span_cuts(df, F.col("text"), F.col("doc_id")).count()
        == 0
    )


def test_apply_span_cuts_surgery(spark):
    words = " ".join(f"w{i}" for i in range(20))
    shared = " ".join(f"s{i}" for i in range(12))
    docs = _docs(
        spark,
        [
            words,                                   # 0: first occurrence, untouched
            words,                                   # 1: verbatim copy, fully cut
            "a1 a2 a3 " + shared + " b1 b2 b3 b4 b5",  # 2: novel context
            "c1 c2 " + shared + " d1 d2 d3 d4 d5 d6",  # 3: shared region cut
        ],
    )
    cuts = dedup.duplicate_span_cuts(docs, F.col("text"), F.col("doc_id"), n=8)
    out = {
        r["doc_id"]: r
        for r in dedup.apply_span_cuts(
            docs, F.col("text"), F.col("doc_id"), cuts
        ).collect()
    }
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[0]["n_cut"] == 0 and out[0]["clean_fp"] == md5(words)
    assert out[1]["n_cut"] == 20 and out[1]["clean_fp"] == md5("")
    assert out[2]["n_cut"] == 0  # first occurrence of the shared region
    assert out[3]["n_cut"] == 12
    assert out[3]["clean_fp"] == md5("c1 c2 d1 d2 d3 d4 d5 d6")
    assert out[3]["n_tokens"] == 20


def test_apply_span_cuts_emit_text_matches_fingerprint(spark):
    """emit_text=True materializes the cleaned text; md5(clean_text)
    must equal clean_fp row-for-row (VERDICT r8 #6)."""
    import hashlib

    words = " ".join(f"w{i}" for i in range(20))
    docs = _docs(
        spark,
        [words, words, "x1 x2 x3 " + " ".join(f"y{i}" for i in range(9))],
    )
    cuts = dedup.duplicate_span_cuts(docs, F.col("text"), F.col("doc_id"), n=8)
    rows = dedup.apply_span_cuts(
        docs, F.col("text"), F.col("doc_id"), cuts, emit_text=True
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert hashlib.md5(r["clean_text"].encode()).hexdigest() == r["clean_fp"]
    assert {r["doc_id"]: r["clean_text"] for r in rows}[1] == ""


def test_span_cuts_clean_text_composes_downstream(spark):
    """The materialized cleaned corpus feeds an existing text operator
    unchanged: fingerprinting the cleaned docs (the downstream
    exact-dedup key) gives the full-text fp for the kept first
    occurrence and the empty-text fp for the fully-cut copy."""
    import hashlib

    from semantic_cpp_spark.pipeline import text as text_ops

    words = " ".join(f"w{i}" for i in range(20))
    docs = _docs(spark, [words, words])
    cuts = dedup.duplicate_span_cuts(docs, F.col("text"), F.col("doc_id"), n=8)
    clean = dedup.apply_span_cuts(
        docs, F.col("text"), F.col("doc_id"), cuts, emit_text=True
    ).select("doc_id", F.col("clean_text").alias("text"))
    fps = {
        r["doc_id"]: r["fp"]
        for r in clean.select(
            "doc_id", text_ops.fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert fps[0] == md5(words) and fps[1] == md5("")


def test_span_cuts_guards_packed_position_overflow(spark, monkeypatch):
    """VERDICT r8 #3: a document beyond 2^SPAN_POS_BITS tokens would
    silently alias the packed first-occurrence key
    (pk = doc_id*2^bits + pos) into another doc's range. The in-plan
    guard raises at execution. Exercised at a shrunk width (the guard
    expression is width-independent; a literal 2^20-token doc costs
    minutes of single-row ngram compute), with the aliasing it
    prevents demonstrated: at bits=4, doc 0's position 16 would pack
    identically to doc 1's position 0."""
    from pyspark.errors import SparkRuntimeException

    monkeypatch.setattr(dedup, "SPAN_POS_BITS", 4)
    # 16 + 8 tokens -> max pos = (24-8) = 16 >= 2^4: the first doc
    # would bleed into doc 1's packed range without the guard
    over = " ".join(f"t{i % 9}" for i in range(24))
    short = " ".join(f"u{i}" for i in range(10))
    df = _docs(spark, [over, short])
    with pytest.raises(SparkRuntimeException, match="chunk documents"):
        dedup.duplicate_span_cuts(
            df, F.col("text"), F.col("doc_id"), n=8
        ).count()
    # just under the limit is fine at the same width
    ok = " ".join(f"v{i}" for i in range(8 + 15))  # max pos 15 < 2^4
    assert (
        dedup.duplicate_span_cuts(
            _docs(spark, [ok]), F.col("text"), F.col("doc_id"), n=8
        ).count()
        == 0
    )


# -- passage-level MinHash near-dup -------------------------------------------

def _docs_frame(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_passage_explode_windows_and_packing(spark):
    from semantic_cpp_spark.pipeline import dedup

    words = " ".join(f"w{i}" for i in range(70))  # 70 tokens -> 3 passages
    df = _docs_frame(spark, [words, "short text"])
    p = {
        (r["doc_id"], r["pid"]): r
        for r in dedup.passage_explode(
            df, F.col("text"), F.col("doc_id")
        ).collect()
    }
    assert len([k for k in p if k[0] == 0]) == 3
    assert p[(0, 0)]["ptext"].split(" ")[0] == "w0"
    assert p[(0, 2)]["ptext"] == "w64 w65 w66 w67 w68 w69"  # ragged tail
    assert p[(0, 2)]["pkey"] == 0 * (1 << 20) + 2
    assert p[(1, 0)]["ptext"] == "short text"


def test_passage_pairs_find_planted_boilerplate(spark):
    """Two docs share a lightly-edited 32-token passage buried in
    otherwise-novel text: whole-doc MinHash misses them (doc Jaccard is
    tiny), but the passage pass must flag exactly those passages on
    both docs — and a fully novel doc must report zero."""
    from semantic_cpp_spark.pipeline import dedup

    boiler = " ".join(f"legal disclaimer clause{i}" for i in range(11))
    edited = boiler.replace("clause3", "clause3b")  # light edit
    novel_a = " ".join(f"alpha{i} beta{i}" for i in range(16))
    novel_b = " ".join(f"gamma{i} delta{i}" for i in range(16))
    novel_c = " ".join(f"zeta{i} eta{i}" for i in range(16))
    df = _docs_frame(
        spark,
        [novel_a + " " + boiler, novel_b + " " + edited, novel_c],
    )
    summary = {
        r["doc_id"]: r
        for r in dedup.passage_dup_summary(
            df, F.col("text"), F.col("doc_id")
        ).collect()
    }
    assert summary[2]["n_dup_passages"] == 0 and summary[2]["dup_ppm"] == 0
    assert summary[0]["n_dup_passages"] >= 1
    assert summary[1]["n_dup_passages"] >= 1
    # whole-doc signatures do NOT pair these docs at the same threshold
    doc_pairs = dedup.minhash_lsh_pairs(
        df, F.col("text"), F.col("doc_id"), threshold=0.5
    ).collect()
    assert not any({r["d1"], r["d2"]} == {0, 1} for r in doc_pairs)


def test_passage_pairs_within_doc_kept_summary_cross_only(spark):
    from semantic_cpp_spark.pipeline import dedup

    rep = " ".join(f"tok{i % 32}" for i in range(96))  # same 32 tokens x3
    df = _docs_frame(spark, [rep])
    pairs = dedup.passage_minhash_pairs(
        df, F.col("text"), F.col("doc_id")
    ).collect()
    assert pairs and all(r["d1"] == 0 and r["d2"] == 0 for r in pairs)
    s = dedup.passage_dup_summary(df, F.col("text"), F.col("doc_id")).collect()
    assert s[0]["n_dup_passages"] == 0  # within-doc repeats are not boilerplate


def test_passage_explode_pid_guard_raises(spark):
    from semantic_cpp_spark.pipeline import dedup

    big = "a " * ((1 << 20) + 2)
    df = _docs_frame(spark, [big])
    with pytest.raises(Exception, match="passage index"):
        dedup.passage_explode(df, F.col("text"), F.col("doc_id"), window=1).agg(
            F.max("pid")
        ).collect()


def test_pack_encoded_sequences_streams_and_budget(spark):
    """Hand-checkable composition: the id stream of each sequence is the
    doc-ordered concatenation of encoded docs with EOS terminators, the
    (shard, seq_id) assignment matches pack_token_sequences exactly, and
    the fingerprint is the md5 of the joined stream."""
    import hashlib

    from semantic_cpp_spark.pipeline import curation, text as T

    df = spark.createDataFrame(
        [(i, "a b") for i in range(6)], "doc_id long, text string"
    )
    vocab = T.vocab_build(df, F.col("text"))  # a=0, b=1
    out = curation.pack_encoded_sequences(
        df, F.col("text"), F.col("doc_id"), vocab, n_shards=1, budget=4
    ).collect()
    # one shard, 2 tokens/doc, budget 4 -> docs {0,1}, {2,3}, {4,5}
    assert sorted(r["seq_id"] for r in out) == [0, 1, 2]
    for r in out:
        assert r["n_docs"] == 2 and r["seq_tokens"] == 4
        assert r["ids"] == [0, 1, -2, 0, 1, -2]
        assert r["seq_fp"] == hashlib.md5(b"0_1_-2_0_1_-2").hexdigest()
    # counts view agrees with the id-stream view (shared assignment core)
    counts = {
        (r["shard"], r["seq_id"]): (r["n_docs"], r["seq_tokens"])
        for r in curation.pack_token_sequences(
            df, F.col("text"), F.col("doc_id"), n_shards=1, budget=4
        ).collect()
    }
    assert counts == {
        (r["shard"], r["seq_id"]): (r["n_docs"], r["seq_tokens"]) for r in out
    }


def test_passage_keep_list_keeps_one_per_cluster(spark):
    """Cluster resolution at passage level: of the three near-identical
    boilerplate passages across three docs, exactly the packed-smallest
    survives; every unique passage keeps; within-doc repeats keep only
    their first occurrence."""
    from semantic_cpp_spark.pipeline import dedup

    boiler = " ".join(f"term{i} clause{i}" for i in range(16))
    docs = [
        boiler,                                  # doc 0: the original
        boiler,                                  # doc 1: verbatim copy
        " ".join(f"novel{i} word{i}" for i in range(16)),  # doc 2: unique
        boiler + " " + boiler,                   # doc 3: within-doc repeat
    ]
    df = _docs_frame(spark, docs)
    out = {
        (r["doc_id"], r["pid"]): r["keep"]
        for r in dedup.passage_keep_list(
            df, F.col("text"), F.col("doc_id")
        ).collect()
    }
    assert out[(0, 0)] is True          # smallest packed key in the cluster
    assert out[(1, 0)] is False         # copy drops
    assert out[(2, 0)] is True          # unique passage keeps
    assert out[(3, 0)] is False and out[(3, 1)] is False  # later copies drop
    # exactly one survivor among the boilerplate cluster
    cluster = [(0, 0), (1, 0), (3, 0), (3, 1)]
    assert sum(out[k] for k in cluster) == 1


def test_apply_passage_keep_rebuilds_and_drops(spark):
    """The passage write-side: an untouched doc reconstructs VERBATIM
    (fingerprint = md5 of its own text), a doc whose passage lost its
    cluster drops exactly that passage, and an all-dropped doc emits
    empty with n_passages_kept = 0."""
    import hashlib

    from semantic_cpp_spark.pipeline import dedup

    boiler = " ".join(f"term{i} clause{i}" for i in range(16))
    unique = " ".join(f"novel{i} word{i}" for i in range(16))
    docs = [boiler, unique + " " + boiler, unique.replace("novel", "other")]
    df = _docs_frame(spark, docs)
    keep = dedup.passage_keep_list(df, F.col("text"), F.col("doc_id"))
    out = {
        r["doc_id"]: r
        for r in dedup.apply_passage_keep(
            df, F.col("text"), F.col("doc_id"), keep, emit_text=True
        ).collect()
    }
    # doc 0 owns the boilerplate cluster -> verbatim
    assert out[0]["text"] == boiler
    assert out[0]["clean_fp"] == hashlib.md5(boiler.encode()).hexdigest()
    # doc 1 keeps its unique passage, loses the boilerplate copy
    assert out[1]["text"] == unique
    assert out[1]["n_passages_kept"] == 1
    # doc 2 fully unique -> verbatim
    assert out[2]["text"] == docs[2]
    # all-dropped case: a doc that is ONLY a copy of doc 0
    df2 = _docs_frame(spark, [boiler, boiler])
    keep2 = dedup.passage_keep_list(df2, F.col("text"), F.col("doc_id"))
    out2 = {
        r["doc_id"]: r
        for r in dedup.apply_passage_keep(
            df2, F.col("text"), F.col("doc_id"), keep2
        ).collect()
    }
    assert out2[1]["n_passages_kept"] == 0
    assert out2[1]["clean_fp"] == hashlib.md5(b"").hexdigest()


def test_cluster_representatives_best_member_wins(spark):
    """(score DESC, doc_id ASC) picks the best member; singleton docs
    keep themselves; exactly one keep per component."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, 5), (2, 9), (3, 9),   # chain component 1-2-3: 2 and 3 tie
                                       # on score 9 -> smaller id 2 wins
            (7, 1),                    # singleton
            (8, 4), (9, 2),            # pair: 8 wins on score
        ],
        "doc_id long, score long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (8, 9)], "d1 long, d2 long"
    )
    out = {
        r["doc_id"]: (r["component"], r["rep_id"], r["keep"])
        for r in dedup.cluster_representatives(
            docs, F.col("doc_id"), F.col("score"), pairs
        ).collect()
    }
    assert out[1] == (1, 2, False)
    assert out[2] == (1, 2, True)
    assert out[3] == (1, 2, False)
    assert out[7] == (7, 7, True)
    assert out[8] == (8, 8, True)
    assert out[9] == (8, 8, False)
    comps = {}
    for d, (c, _, k) in out.items():
        comps.setdefault(c, 0)
        comps[c] += int(k)
    assert all(v == 1 for v in comps.values())


@pytest.mark.parametrize("seed", [2, 31, 59])
def test_cluster_representatives_random_graph_vs_union_find(spark, seed):
    """Seeded random pair graphs vs a serial union-find replay: the
    component partition, the (score DESC, id ASC) argmax, and the
    one-keep-per-component invariant all match."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(seed)
    n = 40
    docs = [(i, rng.randint(0, 9)) for i in range(n)]
    pairs = sorted(
        {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randint(5, 25))
        }
    )
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in range(n)}
    score = dict(docs)
    want_rep = {}
    for i in range(n):
        c = comp[i]
        best = want_rep.get(c)
        if best is None or (score[i], -i) > (score[best], -best):
            want_rep[c] = i
    ddf = spark.createDataFrame(docs, "doc_id long, score long")
    pdf = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {
        r["doc_id"]: (r["component"], r["rep_id"], r["keep"])
        for r in dedup.cluster_representatives(
            ddf, F.col("doc_id"), F.col("score"), pdf
        ).collect()
    }
    for i in range(n):
        c = comp[i]
        assert got[i] == (c, want_rep[c], i == want_rep[c]), (seed, i)


# -- DSIR per-example importance log-weights (r14) ----------------------------


def test_dsir_target_equals_corpus_gives_zero_weights(spark):
    """When the target slice IS the whole corpus, t_b = r_b and T = R for
    every bucket, so each event's nll_raw − nll_target is exactly 0 and
    every document's log-weight is exactly integer zero."""
    docs = [(i, f"alpha beta gamma d{i}") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = curation.dsir_logweights(
        df, F.col("text"), F.col("doc_id"), F.lit(True)
    ).collect()
    assert len(out) == 20
    for r in out:
        assert r["logw_micro"] == 0 and r["log_weight"] == 0.0


def test_dsir_feature_count_and_target_direction(spark):
    """n_feats = unigrams + bigrams = 2·len − 1; documents made of
    target-exclusive vocabulary score strictly higher than documents
    made of non-target vocabulary (the DSIR selection property)."""
    tgt = [(i, "good solid prose here", True) for i in range(10)]
    raw = [(100 + i, "zzq qqz zqq xqx", False) for i in range(10)]
    df = spark.createDataFrame(
        tgt + raw, "doc_id long, text string, is_tgt boolean"
    )
    rows = {
        r["doc_id"]: r
        for r in curation.dsir_logweights(
            df, F.col("text"), F.col("doc_id"), F.col("is_tgt")
        ).collect()
    }
    assert all(rows[i]["n_feats"] == 7 for i in rows)  # 4 uni + 3 bi
    assert rows[0]["logw_micro"] > rows[100]["logw_micro"]
    # and the display column is the exact micro division
    for r in rows.values():
        assert r["log_weight"] == r["logw_micro"] / 1_000_000.0


def test_dsir_single_token_doc_has_no_bigrams(spark):
    """size-1 docs must NOT hit Spark's descending sequence(1, 0) trap:
    exactly one unigram feature, no bigram."""
    df = spark.createDataFrame(
        [(1, "solo", True), (2, "a b", True)],
        "doc_id long, text string, is_tgt boolean",
    )
    rows = {
        r["doc_id"]: r["n_feats"]
        for r in curation.dsir_logweights(
            df, F.col("text"), F.col("doc_id"), F.col("is_tgt")
        ).collect()
    }
    assert rows == {1: 1, 2: 3}


def test_dsir_empty_doc_emits_no_row(spark):
    df = spark.createDataFrame(
        [(1, "   ", True), (2, "some text", True)],
        "doc_id long, text string, is_tgt boolean",
    )
    out = curation.dsir_logweights(
        df, F.col("text"), F.col("doc_id"), F.col("is_tgt")
    ).collect()
    assert [r["doc_id"] for r in out] == [2]
