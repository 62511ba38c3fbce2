"""Embedding clustering: Lloyd k-means over the embeddings table — the
operator that turns the IVF quantizer's deterministic seeds
(similarity.ivf_assign) into trained centroids, and the standard corpus
tool for topic bucketing / diversity sampling over document embeddings.

Two surfaces:
- ``kmeans_step`` — one assignment + per-cluster update summary, fully
  SQL-expressible (squared-distance argmin via the dot-product expansion
  ‖x−c‖² = x·x − 2x·c + c·c, each dot sequential-summed so DuckDB's
  list_dot_product reproduces it bit-for-bit) → oracle-checked.
- ``kmeans_fit`` — the iterative Lloyd loop. Centroids are MODEL STATE
  (k×dims doubles), so they legitimately live on the driver between
  iterations — the same shape MLlib uses (per-iteration aggregate to the
  driver, broadcast back). Each iteration is one crossJoin(broadcast
  centroids) + one groupBy(cluster) with per-dimension sum aggregates;
  the data never collects. Pinned against a numpy reference in tests
  (iterative → no SQL oracle, per the driver's rows-only contract).

At 100 TB: the assignment pass is a narrow broadcast-join scan (k·dims
doubles broadcast); the update is a k-row aggregate — Lloyd's cost is
O(n·k·dims) compute with O(k·dims) shuffle, exactly what a 1000-executor
cluster wants. Empty clusters keep their previous centroid (documented
deviation from sklearn's re-seeding, which needs a random source).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from semantic_cpp_spark.functions.vectors import dot

# Fixture centroid count — matches similarity.IVF_K so the k-means step is
# the trainer for the same coarse quantizer.
KMEANS_K = 8


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def sq_dist(a: Column, b: Column) -> Column:
    """Squared euclidean distance via the dot expansion — three sequential
    dot products, engine-portable (DuckDB list_dot_product)."""
    return dot(a, a) - F.lit(2.0) * dot(a, b) + dot(b, b)


def kmeans_assign(
    df: DataFrame,
    k: int = KMEANS_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared euclidean,
    ties → smallest centroid id). ``centroids=None`` seeds from the k
    smallest vector ids (deterministic, same as similarity.ivf_assign).
    Returns (vec_id, v, c_id, d2)."""
    e = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    if centroids is None:
        centroids = e.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
        )
    scored = e.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "v", "c_id", sq_dist(F.col("v"), F.col("cv")).alias("d2")
    )
    # argmin as a map-side-combinable aggregate (r10, the
    # similarity.ivf_assign note): a #groups-sized hash fold instead
    # of the window's local sort of the n·k scored frame (vector
    # payloads included). (d2, c_id) is unique per group — tie-break
    # identical.
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("d2", "c_id", "v")).alias("__b"))
        .select(
            "vec_id",
            F.col("__b.v").alias("v"),
            F.col("__b.c_id").alias("c_id"),
            F.col("__b.d2").alias("d2"),
        )
    )


def kmeans_step_summary(
    df: DataFrame,
    k: int = KMEANS_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """One Lloyd step's per-cluster report: member count, the updated
    centroid's mean mass (Σ_dims of the new centroid = mean over members
    of each member's coordinate sum), and the cluster inertia (Σ d²) —
    the convergence quantity Lloyd minimises. (vec-coordinate sums are
    sequential dot(v, 1⃗) so the oracle matches bitwise before the 6dp
    round.)"""
    assigned = kmeans_assign(df, k, id_col, vec_col)
    ones = F.array(*([F.lit(1.0)] * dims))
    mass = dot(F.col("v"), ones)
    return (
        assigned.select("c_id", "d2", mass.alias("mass"))
        .groupBy("c_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(F.sum("mass") / F.count(F.lit(1)), 6).alias("centroid_mass"),
            F.round(F.sum("d2"), 6).alias("inertia"),
        )
    )


def updated_centroids(assigned: DataFrame) -> DataFrame:
    """Per-dimension mean of each cluster's members — the real Lloyd
    centroid update as a DataFrame op: posexplode dims (narrow, ×dims
    rows) → avg per (cluster, dim) → re-assemble the array in dim order.
    Shuffle carries (c_id, dim, partial sums) only. Returns (c_id, m)."""
    pe = assigned.select("c_id", F.posexplode("v").alias("pos", "x"))
    upd = pe.groupBy("c_id", "pos").agg(F.avg("x").alias("mi"))
    return upd.groupBy("c_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mi"))),
            lambda s: s["mi"],
        ).alias("m")
    )


def cluster_medoids(
    df: DataFrame,
    k: int = KMEANS_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Representative selection (coreset/diversity sampling): per cluster,
    the member closest to the UPDATED centroid (one Lloyd step from the
    deterministic seeds; against the seeds themselves every seed would be
    its own 0-distance medoid — a trivial answer). Ties → smallest id.
    The "one exemplar per topic bucket" primitive for corpus inspection.

    Plan: assignment scan → per-dim centroid update (bounded k×dims
    aggregate) → broadcast the k new centroids back → per-cluster top-1
    argmin. The assignment feeds BOTH the centroid update and the
    re-distance pass, so it is localCheckpointed (r15): one corpus
    assignment scan (the crossJoin×k HOF fold — the expensive half)
    instead of two, exactly the "persist the assignment between the
    passes" this docstring used to defer to callers. Output (c_id,
    vec_id, d2)."""
    assigned = kmeans_assign(df, k, id_col, vec_col).localCheckpoint()
    cent = updated_centroids(assigned)
    d2n = sq_dist(F.col("v"), F.col("m"))
    # per-cluster argmin as a map-side-combinable aggregate (r10): the
    # old per-cluster window shuffled every member row through k hot
    # partitions (the worst skew shape — cluster sizes are corpus-
    # scale); min(struct) reduces each partition to ≤k partials first.
    return (
        assigned.join(F.broadcast(cent), "c_id")
        .select("c_id", "vec_id", d2n.alias("d2n"))
        .groupBy("c_id")
        .agg(F.min(F.struct("d2n", "vec_id")).alias("__b"))
        .select(
            "c_id",
            F.col("__b.vec_id").alias("vec_id"),
            F.round(F.col("__b.d2n"), 6).alias("d2"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = KMEANS_K,
    dims: int = 64,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """Iterative Lloyd: returns (centroids, final assignment DataFrame).
    Per iteration: broadcast the k×dims centroid table, assign, update
    centroids with one groupBy(c_id) carrying ``dims`` sum aggregates +
    a count (flat, k rows out), pull the k rows to the driver as the next
    iteration's model. Empty clusters retain their previous centroid."""
    spark = df.sparkSession
    e = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    seeds = (
        e.filter(F.col("vec_id") < k)
        .orderBy("vec_id")
        .collect()
    )
    cents: list[list[float]] = [list(r["v"]) for r in seeds]
    assigned = None
    for _ in range(n_iter):
        cdf = spark.createDataFrame(
            [(i, cents[i]) for i in range(len(cents))],
            "c_id long, cv array<double>",
        )
        assigned = kmeans_assign(df, k, id_col, vec_col, centroids=cdf)
        sums = [
            F.sum(F.element_at("v", d + 1)).alias(f"s{d}") for d in range(dims)
        ]
        rows = (
            assigned.groupBy("c_id")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .collect()
        )
        new_cents = [list(c) for c in cents]
        for r in rows:
            if r["n"] > 0:
                new_cents[r["c_id"]] = [r[f"s{d}"] / r["n"] for d in range(dims)]
        cents = new_cents
    return cents, assigned


def cluster_cohesion(
    df: DataFrame,
    k: int = KMEANS_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster MEAN PAIRWISE COSINE — the cluster-quality diagnostic
    (a near-dup cluster scores ~1, a garbage cluster ~0) — in O(n)
    instead of the naive O(n²) pair enumeration, via the sum identity
    over unit-normalized vectors:

        Σ_{i≠j} cos(x_i, x_j) = ‖Σ_i u_i‖² − n      (u_i = x_i/‖x_i‖)

    so mean_pair_cos = (‖s‖² − n) / (n(n−1)) with s = Σu — one
    aggregate per cluster, no pair join at ANY scale.

    Cross-engine exactness: each unit vector's components are rounded
    to int64 MICRO-units before the group sum (the emb_dim_stats
    dodge), so the only order-sensitive float sum becomes an exact
    integer sum; ‖s‖² then folds 64 exact terms left-to-right.
    Zero-norm vectors are excluded (undefined direction). Singleton
    clusters report NULL (no pairs).

    Returns (c_id, n_members, mean_pair_cos)."""
    from semantic_cpp_spark.functions.vectors import norm

    assigned = kmeans_assign(df, k, id_col, vec_col)
    nrm = norm(F.col("v"))
    # the division is null-safe via nullif even though zero-norm rows are
    # filtered: under ANSI mode the projected expression can be evaluated
    # in a stage where the filter hasn't pruned the row yet, and x/0
    # would throw instead of never materializing
    safe_nrm = F.nullif(nrm, F.lit(0.0))
    unit = assigned.filter(nrm > 0).select(
        "c_id",
        F.transform(
            "v", lambda x: F.round(x / safe_nrm * 1e6, 0).cast("long")
        ).alias("u"),
    )
    ex = unit.select("c_id", F.posexplode("u").alias("dim", "w"))
    # ONE pass over the exploded unit table (r15): the per-dim sums and
    # the diagonal used to be two independent groupBys over `ex`, which
    # re-ran the whole upstream (assignment crossJoin×k HOF fold +
    # normalize + explode) twice and joined the halves back. The
    # diagonal and member count are associative, so they ride the same
    # (c_id, dim) partial aggregate as the sums (integer/decimal
    # partials re-sum exactly) and the final per-cluster fold needs no
    # join at all.
    sums = ex.groupBy("c_id", "dim").agg(
        F.sum("w").alias("s"),
        F.sum((F.col("w") * F.col("w")).cast("decimal(38,0)")).alias("__dp"),
        F.count(F.lit(1)).cast("long").alias("__cnt"),
    )
    per_cluster = sums.groupBy("c_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("dim", "s"))),
            F.lit(0.0),
            lambda acc, r: acc
            + (r["s"].cast("double") / 1e6) * (r["s"].cast("double") / 1e6),
        ).alias("s2"),
        # diagonal Σ_i‖u_i‖² as an EXACT integer (not the nominal n):
        # the micro-rounding makes each ‖u_i‖² ≈ 1 ± 1e-5, and
        # subtracting the true diagonal instead of n removes that bias
        F.sum("__dp").alias("__d"),
        # member count = rows at dim 0 (every vector has one), NOT
        # count(*)/64: correct for any vec_col dimensionality
        F.sum(F.when(F.col("dim") == 0, F.col("__cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n"),
    )
    n = F.col("n").cast("double")
    return (
        per_cluster
        .select(
            "c_id",
            F.col("n").alias("n_members"),
            # denominator guarded via nullif, not when(): ANSI mode
            # evaluates both branches, so n=1 would still divide by zero
            F.round(
                (F.col("s2") - F.col("__d").cast("double") / F.lit(1e12))
                / F.nullif(n * (n - 1), F.lit(0.0)),
                6,
            ).alias("mean_pair_cos"),
        )
    )


def semdedup(
    df: DataFrame,
    k: int = KMEANS_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embeddings, then look for
    near-duplicates ONLY within each cluster — the clustering IS the
    blocking, so pair cost is Σ|cluster|² instead of n², and the
    candidate join is a plain equi-join on c_id. This is the embedding
    answer to what MinHash-LSH does for text: prune semantically
    redundant items, not just byte-identical ones.

    Keep policy (deterministic, recursion-free): a vector is REMOVED iff
    ANY lower-id member of its own cluster lies within the cosine
    threshold — whether or not that neighbor was itself removed. This
    "independent lower-neighbor" rule is STRICTER than greedy
    keep-first-occurrence: on a chain a(0)~b(1), b(1)~c(2), a≁c, a
    greedy scan over kept survivors retains c (its only near neighbor b
    is already gone), while this rule removes both b and c. The
    non-recursive form is what makes the operator one self-join instead
    of a sequential scan (the paper keeps one arbitrary member per
    duplicate group; lowest-id is this repo's standing determinism
    convention, cf. dedup.keep_list). Cosine is the sequential-fold
    dot/norm expansion, so the DuckDB oracle reproduces the threshold
    comparison bit-for-bit — no rounded-boundary coin flips.

    At 100 TB: assignment is the broadcast-centroid scan; the in-cluster
    self-join's fan-out is bounded by cluster size — pick k ~ n/50k to
    bound it (and a pathological hot cluster routes through the same
    triangle-split machinery as hot LSH buckets, pipeline.blocking).
    The assignment frame is referenced three times (both self-join sides
    + the verdict re-attach) and recomputes per reference — a narrow
    broadcast scan with no exchange; persist it between passes at scale,
    same note as cluster_medoids. Plan shape pinned in
    test_plans.test_semdedup_in_cluster_join_is_equi_join.

    Returns (vec_id, c_id, keep) for every input vector."""
    return _semdedup_verdicts(kmeans_assign(df, k, id_col, vec_col), threshold)


def _semdedup_verdicts(assigned: DataFrame, threshold: float) -> DataFrame:
    """The in-cluster removal pass shared by semdedup (exact assignment)
    and semdedup_scaled (two-level IVF assignment): expects
    (vec_id, v, c_id), returns (vec_id, c_id, keep)."""
    # norm computed ONCE per vector before the self-join (bit-identical
    # to the per-pair form — same fold, same sqrt — but O(n) folds
    # instead of O(pairs), the difference between a scan and a straggler
    # on a big cluster)
    #
    # localCheckpoint (r15): this frame is referenced THREE times (both
    # self-join sides + the verdict re-attach) and as lazy lineage each
    # reference re-ran the whole assignment (broadcast-centroid scan —
    # or the two-level IVF routing in semdedup_scaled; 18 scan leaves
    # in emb_semdedup_family's before-plan). Materializing it is the
    # "persist it between passes at scale" note made executable.
    a = assigned.select(
        "vec_id",
        "v",
        "c_id",
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm"),
    ).localCheckpoint()
    lo = a.select(
        "c_id",
        F.col("vec_id").alias("lo_id"),
        F.col("v").alias("lv"),
        F.col("nrm").alias("ln"),
    )
    hi = a.select(
        "c_id",
        F.col("vec_id").alias("hi_id"),
        F.col("v").alias("hv"),
        F.col("nrm").alias("hn"),
    )
    cos = dot(F.col("hv"), F.col("lv")) / F.nullif(
        F.col("hn") * F.col("ln"), F.lit(0.0)
    )
    removed = (
        hi.join(lo, "c_id")
        .filter(F.col("lo_id") < F.col("hi_id"))
        .filter(cos >= F.lit(threshold))
        .select(F.col("hi_id").alias("vec_id"))
        .distinct()
        .withColumn("__rm", F.lit(1))
    )
    return (
        a.join(removed, "vec_id", "left")
        .select(
            "vec_id",
            F.col("c_id").cast("long").alias("c_id"),
            F.col("__rm").isNull().alias("keep"),
        )
    )


# semdedup_scaled's closed form: k = max(SEMDEDUP_MIN_K, n // SEMDEDUP_N_PER_K).
# n // 75 is the gate-scale stand-in for the production n/50k rule — it makes
# k a REAL function of corpus size at the fixture SFs (sf0.01 → 8, sf0.1 → 80,
# sf1.0 → 800), so the gated plan has the same asymptotics as the production
# plan: pair cost ~ n²/k grows linearly in n instead of quadratically.
SEMDEDUP_MIN_K = 8
SEMDEDUP_N_PER_K = 75


def _isqrt_seed_count(k: int, floor_k: int = 4) -> int:
    """Coarse-level seed count for two-level assignment:
    max(floor_k, floor(sqrt(k))) — the same IEEE double sqrt both
    engines evaluate (exact for k < 2^52), so the oracle replays it."""
    import math

    return max(floor_k, int(math.floor(math.sqrt(k))))


def kmeans_assign_ivf(
    df: DataFrame,
    k: int,
    k_coarse: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """TWO-LEVEL (IVF-style) approximate nearest-seed assignment — the
    scale repair for brute-force kmeans_assign when k grows with the
    corpus (the SemDeDup regime, where exact assignment is n·k = n²/75
    and was MEASURED quadratic: 32× wall at the 10× step-up, SCALING.md
    r8): route every vector to its nearest of √k coarse seeds, then
    argmin only over the fine seeds that themselves routed to that
    coarse cell — n·(√k + k/√k avg) ≈ 2n√k distance folds instead of
    n·k. This is the paper's own regime (SemDeDup assigns with ANN, not
    brute force); the approximation is DETERMINISTIC (ties → smaller
    id at both levels, seeds = smallest ids as everywhere else), so a
    SQL oracle replays it verbatim — a boundary vector may land in a
    neighboring fine cluster vs exact argmin, identically on both
    engines. Every coarse seed is also a fine seed (ids < k_coarse ≤ k)
    and routes to itself at distance 0, so no cell is ever empty and no
    vector is dropped. Returns (vec_id, v, c_id)."""
    if k_coarse is None:
        k_coarse = _isqrt_seed_count(k)
    k_coarse = min(k_coarse, k)
    e = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    coarse = e.filter(F.col("vec_id") < k_coarse).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("gv")
    )
    fine = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )

    # both routing argmins and the fine argmin run as map-side-
    # combinable min(struct) aggregates (r10, the kmeans_assign note):
    # one partial per routed row crosses each exchange instead of the
    # full n·√k (and n·k/√k) scored frames.
    def route(frame, idc, vc):
        scored = frame.crossJoin(F.broadcast(coarse)).select(
            idc, vc, "cell", sq_dist(F.col(vc), F.col("gv")).alias("__d2")
        )
        return (
            scored.groupBy(idc)
            .agg(
                F.min(
                    F.struct(F.col("__d2"), F.col("cell"), F.col(vc))
                ).alias("__b")
            )
            .select(
                idc,
                F.col(f"__b.{vc}").alias(vc),
                F.col("__b.cell").alias("cell"),
            )
        )

    fine_cells = route(fine, "c_id", "cv")
    v_cells = route(e, "vec_id", "v")
    return (
        v_cells.join(F.broadcast(fine_cells), "cell")
        .select(
            "vec_id", "v", "c_id", sq_dist(F.col("v"), F.col("cv")).alias("__f2")
        )
        .groupBy("vec_id")
        .agg(F.min(F.struct("__f2", "c_id", "v")).alias("__b"))
        .select(
            "vec_id",
            F.col("__b.v").alias("v"),
            F.col("__b.c_id").alias("c_id"),
        )
    )


def semdedup_scaled(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_per_k: int = SEMDEDUP_N_PER_K,
) -> DataFrame:
    """semdedup with the PRODUCTION sizing and assignment strategy:
    k = max(SEMDEDUP_MIN_K, n // n_per_k) (the paper's k ~ n/50k rule;
    n/75 at gate scale) and TWO-LEVEL IVF assignment
    (kmeans_assign_ivf) — with derived k, brute-force assignment is
    n·k = n²/n_per_k and was measured quadratic at the 10× step-up
    (32×, SCALING.md r8); two-level routing cuts it to ~2n√k, leaving
    the linear pair stage (Σ|cluster|² ≈ n·n_per_k) the asymptotic
    cost. Both the k derivation (pure closed form of count(*)) and the
    routing (deterministic tie-breaks) replay in SQL, so the gated plan
    is the production plan under a hard oracle.

    The count() is one scalar action over the id column (column-pruned
    scan); the removal pass is semdedup's unchanged."""
    n = df.select(F.col(id_col)).count()
    k = max(SEMDEDUP_MIN_K, n // n_per_k)
    return _semdedup_verdicts(
        kmeans_assign_ivf(df, k, id_col=id_col, vec_col=vec_col), threshold
    )
