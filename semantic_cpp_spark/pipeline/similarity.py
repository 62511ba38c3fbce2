"""Similarity search over embedding columns (north star per BASELINE.json;
`embeddings` fixture: vec_id, embedding array<float>, label).

Two paths:
- brute-force cosine top-k: exact baseline. Query side is broadcast; the
  big side streams through one narrow pass + a per-query top-k window.
  At 100 TB this is the 'small query set × huge corpus' scan shape —
  no shuffle of the corpus, only the (n_queries × k) result.
- random-hyperplane LSH (per-bucket search): the scale path when the
  query set is itself huge — bucket both sides on sign-bit signatures
  and search only within buckets.

All arithmetic is double (float inputs cast up front) with sequential
left-to-right summation in both Spark (higher-order `aggregate`) and the
DuckDB oracle (`list_dot_product`) — results match bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from semantic_cpp_spark.functions.vectors import dot

# 4 sign-bits → 16 buckets: meaningful recall on the FIXTURE sizes (500-2000
# vectors). The registry queries pass this explicitly so the DuckDB oracles
# stay deterministic; the library default (planes=None) derives the plane
# count from the corpus size instead — see derived_lsh_planes.
LSH_PLANES = 4

# Average vectors per LSH bucket the derivation aims for: buckets ≈ n/64,
# i.e. planes = log2(n/64). 64 keeps per-bucket exact-cosine work trivially
# small while leaving enough collisions for recall.
LSH_TARGET_BUCKET_SIZE = 64


def _raw_lsh_planes(n: int) -> int:
    """UNCLAMPED plane derivation: round(log2(n / LSH_TARGET_BUCKET_SIZE)),
    floor 1. Single source of truth shared by derived_lsh_planes (which
    clamps at 24 for the single-key bucket join) and ann_topk's router
    (which compares the raw value against BANDING_THRESHOLD_PLANES to
    decide bucket-vs-banded) — so the derivation can never silently
    diverge between the two."""
    import math

    if n <= LSH_TARGET_BUCKET_SIZE:
        return 1
    return max(1, round(math.log2(n / LSH_TARGET_BUCKET_SIZE)))


def derived_lsh_planes(n: int) -> int:
    """Plane count from corpus size: buckets ~ n / LSH_TARGET_BUCKET_SIZE,
    clamped to [1, 24] (2^24 buckets is plenty at any n; beyond that the
    signature join key should switch to banding like the MinHash path).
    Measured sweep in SCALING.md §LSH/IVF constants."""
    return min(24, _raw_lsh_planes(n))


def derived_ivf_k(n: int) -> int:
    """Centroid count from corpus size: K ≈ √n (the classic IVF balance —
    per-list scan length n/K equals the centroid-probe cost K at K=√n),
    clamped to [1, 65536]."""
    import math

    return max(1, min(65536, round(math.sqrt(max(n, 1)))))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def safe_cos(a: Column, b: Column) -> Column:
    """Cosine similarity, null when either vector has zero norm (the
    undefined case): under Spark's ANSI mode a bare division would THROW
    on an all-zero corpus vector, and null sorts last under the desc
    rank ordering every top-k here uses — exactly the intended 'never a
    candidate' behavior."""
    d = F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
    return F.when(d != 0, dot(a, b) / d)


def pair_cos_kernel() -> Column:
    """Arrow-batched safe-cosine for HIGH-VOLUME pair verification.

    The expression-level safe_cos is a higher-order ``aggregate(zip_with)``
    fold — correct, but HOFs are interpreted (no whole-stage codegen),
    measured ~75 µs/pair at the r6 sf1.0 step-up; fine for top-k candidate
    sets, a straggler-maker for near-dup pair verification. This kernel
    runs the same arithmetic vectorized over Arrow batches at ~1 µs/pair.

    Bit-parity with the DuckDB oracle is preserved by SUMMATION ORDER:
    ``cumsum`` accumulates strictly left-to-right over the dims (NOT
    ``np.dot``/``einsum``, whose pairwise/SIMD summation differs in the
    last ulp), matching both the fold's seed-0.0 left fold and DuckDB's
    ``list_dot_product``. Zero-norm vectors yield None (null), matching
    safe_cos."""
    import numpy as np
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def _cos(a, b):
        import pandas as pd

        out = np.empty(len(a), dtype=object)
        if len(a):
            av = np.stack([np.asarray(x, dtype=np.float64) for x in a])
            bv = np.stack([np.asarray(x, dtype=np.float64) for x in b])
            dot = np.cumsum(av * bv, axis=1)[:, -1]
            na = np.sqrt(np.cumsum(av * av, axis=1)[:, -1])
            nb = np.sqrt(np.cumsum(bv * bv, axis=1)[:, -1])
            den = na * nb
            for i in range(len(a)):
                out[i] = float(dot[i] / den[i]) if den[i] != 0 else None
        return pd.Series(out)

    return _cos


def plane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 entry of pseudo-random hyperplane `plane` at `dim`,
    derived from md5 (public, engine-portable)."""
    h = hashlib.md5(f"plane_{plane}_{dim}".encode()).hexdigest()
    return 1 if int(h[:2], 16) % 2 == 1 else -1


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k for each query id (self excluded).
    Output: (q_id, rk, vec_id, cos)."""
    e = df.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v"))
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            safe_cos(F.col("v"), F.col("qv")).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("rk").cast("long").alias("rk"), "vec_id", F.round("cos", 6).alias("cos"))
    )


def lsh_signature(vec: Column, dims: int, planes: int = LSH_PLANES) -> Column:
    """Sign-bit signature: bit p = 1 iff dot(vec, plane_p) > 0, packed into
    a long. Planes are the deterministic ±1 matrix from plane_sign.

    Expression shape matters at real embedding widths: the plane matrix is
    ONE shallow array-of-arrays literal and the projection is a
    higher-order ``aggregate(zip_with(...))`` fold, so the expression tree
    is O(planes·dims) flat literals + O(1) operators — not the
    O(planes·dims)-deep ``element_at*sign + ...`` add-chain that blows
    past whole-stage-codegen limits at 1024-dim embeddings (pinned by
    tests/test_pipeline.py::test_lsh_signature_wide_dims).

    Summation order (left-to-right over dims, seeded 0.0) is identical to
    the DuckDB oracle's list_dot_product, so bucket assignment stays
    bit-for-bit reproducible."""
    plane_mat = F.array(
        *[
            F.array(*[F.lit(float(plane_sign(p, d))) for d in range(dims)])
            for p in range(planes)
        ]
    )
    bits = F.transform(
        plane_mat,
        lambda plane, p: F.when(
            F.aggregate(
                F.zip_with(vec, plane, lambda x, s: x * s),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            > 0,
            # 2^p as an exact double→long (p ≤ 24 « 2^53)
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b)


def _lsh_bit_array(vec: Column, dims: int, planes: int) -> Column:
    """Per-plane sign bits (array<long> of 0/1) via the same flat
    array-literal + fold expression shape as lsh_signature."""
    plane_mat = F.array(
        *[
            F.array(*[F.lit(float(plane_sign(p, d))) for d in range(dims)])
            for p in range(planes)
        ]
    )
    return F.transform(
        plane_mat,
        lambda plane: F.when(
            F.aggregate(
                F.zip_with(vec, plane, lambda x, s: x * s),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def lsh_band_keys(
    vec: Column, dims: int, planes: int, band_bits: int
) -> Column:
    """Banded signature keys (array<long>, one per band): ``planes`` sign
    bits split into planes/band_bits bands; band b's key packs its bits
    plus ``b << band_bits`` so keys from different bands never collide.

    This is the OR-of-ANDs construction (same as the MinHash banding):
    two vectors are candidates iff ANY band matches — the scale path for
    WIDE signatures, where a single whole-signature key (2^planes
    buckets) would over-fragment and recall would collapse.
    derived_lsh_planes clamps the single-key form at 24 planes for
    exactly this reason."""
    if planes % band_bits != 0:
        raise ValueError("planes must be a multiple of band_bits")
    return _band_keys_from_bits(
        _lsh_bit_array(vec, dims, planes), planes, band_bits
    )


def _band_keys_from_bits(bits: Column, planes: int, band_bits: int) -> Column:
    """Pack an existing sign-bit array into band keys. ``bits`` should be
    a real ATTRIBUTE on the corpus path: each of the ``planes``
    element_at references re-inlines an expression-valued ``bits`` under
    projection collapse, re-running all plane dot products once per bit
    (r15 — the O(planes²·dims) flavour of the materialize_tokens trap;
    lsh_banded_topk routes through an explode(array(.)) barrier)."""
    n_bands = planes // band_bits
    keys = []
    for b in range(n_bands):
        key = F.lit(b * (1 << band_bits)).cast("long")
        for j in range(band_bits):
            key = key + F.element_at(bits, b * band_bits + j + 1) * F.lit(
                1 << j
            ).cast("long")
        keys.append(key)
    return F.array(*keys)


def lsh_banded_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dims: int = 64,
    planes: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via BANDED LSH: candidates are vectors sharing
    at least one signature band with the query (OR-of-ANDs), then exact
    cosine on the (deduplicated) candidates. Compared to the single-key
    bucket join, banding keeps recall at wide signatures: per-band
    collision probability is cos-angle^band_bits, amplified across
    planes/band_bits independent bands.

    Plan shape: corpus explodes into n_bands (band, key) rows, joins the
    broadcast exploded query side on the key, dedups (q_id, vec_id) with
    a first-value aggregate (vectors are identical across duplicate
    band hits), and windows top-k per query — the corpus shuffles once
    on the band key, never all-pairs. Output: (q_id, rk, vec_id, cos)."""
    e = (
        df.select(
            F.col(id_col).alias("vec_id"),
            _as_double(F.col(vec_col)).alias("v"),
        )
        # explode(array(.)) barrier: materialize the plane sign bits
        # once per row before the per-bit element_at packing (r15 —
        # see _band_keys_from_bits; without it every bit reference
        # re-ran all `planes` dot products)
        .select(
            "vec_id",
            "v",
            F.explode(
                F.array(_lsh_bit_array(F.col("v"), dims, planes))
            ).alias("__bits"),
        )
        .withColumn(
            "bkeys",
            _band_keys_from_bits(F.col("__bits"), planes, band_bits),
        )
    )
    ec = e.select("vec_id", "v", F.explode("bkeys").alias("bkey"))
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.explode("bkeys").alias("bkey"),
    )
    cand = (
        ec.join(F.broadcast(q), "bkey")
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.first("v").alias("v"), F.first("qv").alias("qv"))
    )
    scored = cand.select(
        "q_id", "vec_id", safe_cos(F.col("v"), F.col("qv")).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "q_id",
            F.col("rk").cast("long").alias("rk"),
            "vec_id",
            F.round("cos", 6).alias("cos"),
        )
    )


def quantize_q127(vec: Column) -> Column:
    """Symmetric int8 quantization: q_i = round(x_i · 127 / max|x|) as an
    array<long> (values ∈ [−127, 127]; all-zero vectors quantize to
    zeros). At 100 TB this is the memory-bound ANN lever — a 4× smaller
    corpus resident per executor — and because the per-vector scale
    cancels in cosine, the quantized cosine needs no dequantization."""
    mx = F.array_max(F.transform(vec, F.abs))
    return F.when(
        mx == 0, F.transform(vec, lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(vec, lambda x: F.round(x * 127.0 / mx, 0).cast("long"))
    )


def quantized_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-phase ANN: rank candidates by INT8-quantized cosine (exact
    integer dot products — 64·127² « 2⁵³, so the arithmetic is engine-
    exact), keep top-k per query, then RESCORE the survivors with the
    full-precision cosine. The candidate scan touches only the 4×-smaller
    quantized column; full vectors are read for k rows per query.
    Output: (q_id, rk, vec_id, approx_cos, cos) with rk in approx order."""
    e = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("qv", quantize_q127(F.col("v")))
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv_full"),
        F.col("qv").alias("qq"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "v",
            "qv_full",
            safe_cos(F.col("qv"), F.col("qq")).alias("approx_cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("approx_cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "q_id",
            F.col("rk").cast("long").alias("rk"),
            "vec_id",
            F.round("approx_cos", 6).alias("approx_cos"),
            F.round(safe_cos(F.col("v"), F.col("qv_full")), 6).alias("cos"),
        )
    )


def truncated_rescore_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    prefix_dims: int = 16,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage truncation ANN: candidate generation by cosine over the
    first ``prefix_dims`` dimensions (top-``n_candidates`` per query),
    then EXACT full-width rescore of the survivors — the standard
    pattern that makes prefix truncation useful on ANY embedding
    regime, not just matryoshka-trained ones (the
    sim_dim_truncation_recall diagnostic measured one-stage d=48
    truncation at 0.464 recall@5 on non-MRL vectors; the rescore stage
    recovers what the cheap scan misses as long as the true neighbors
    sit anywhere in the top-C prefix ranking).

    Scale shape: the candidate scan reads ONLY the prefix slice — at
    rest, store the first ``prefix_dims`` dims as their own column and
    the scan's bandwidth drops dims/prefix_dims-fold (4× at 16/64) —
    while full vectors are fetched by an equi-join for just
    C·|queries| rows. Both stages are the broadcast-query pattern of
    cosine_topk; candidate ties cut deterministically on
    (prefix_cos DESC, vec_id), so the oracle replays the exact same
    candidate set. Output: (q_id, rk, vec_id, cos) ranked by the
    rescored full-width cosine."""
    e = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    pref = e.select("vec_id", F.slice("v", 1, prefix_dims).alias("p"))
    qp = pref.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("p").alias("qp")
    )
    wc = Window.partitionBy("q_id").orderBy(F.col("pcos").desc(), F.col("vec_id"))
    cand = (
        pref.crossJoin(F.broadcast(qp))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", safe_cos(F.col("p"), F.col("qp")).alias("pcos"))
        .withColumn("__rc", F.row_number().over(wc))
        .filter(F.col("__rc") <= n_candidates)
        .select("q_id", "vec_id")
    )
    qf = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    rescored = (
        cand.join(e, "vec_id")
        .join(F.broadcast(qf), "q_id")
        .select("q_id", "vec_id", safe_cos(F.col("v"), F.col("qv")).alias("cos"))
    )
    wk = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        rescored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select(
            "q_id",
            F.col("rk").cast("long").alias("rk"),
            "vec_id",
            F.round("cos", 6).alias("cos"),
        )
    )


def lsh_bucket_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket
    (same sign-signature), then exact cosine within the bucket. Recall<1
    by construction; the oracle reproduces the same algorithm so results
    still match exactly. planes=None derives the bucket count from the
    corpus size (one count job); pass an explicit value for deterministic
    fixtures. Output: (q_id, rk, vec_id, cos)."""
    if planes is None:
        planes = derived_lsh_planes(df.count())
    e = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("sig", lsh_signature(F.col("v"), dims, planes))
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("sig").alias("qsig")
    )
    scored = (
        e.join(F.broadcast(q), (F.col("sig") == F.col("qsig")) & (F.col("vec_id") != F.col("q_id")))
        .select(
            "q_id",
            "vec_id",
            safe_cos(F.col("v"), F.col("qv")).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("rk").cast("long").alias("rk"), "vec_id", F.round("cos", 6).alias("cos"))
    )


def lsh_multiprobe_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dims: int = 64,
    planes: int = LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """MULTI-PROBE LSH top-k: each query searches its own sign-bucket AND
    every bucket at Hamming distance 1 (flip one plane bit) — 1+planes
    probe keys. This is the standard recall repair for single-table LSH
    (measured in SCALING.md: at 8 planes the single bucket holds 0.5% of
    the corpus with recall 0.044; the nearest-miss vectors sit one sign
    flip away). The corpus side is untouched — one signature, one shuffle
    — only the (tiny, broadcast) query side fans out ×(1+planes), and
    each corpus vector's signature equals at most ONE distinct probe key,
    so no candidate dedup is needed. Output: (q_id, rk, vec_id, cos)."""
    e = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("sig", lsh_signature(F.col("v"), dims, planes))
    probe = F.array(
        F.col("qsig"),
        *[
            F.col("qsig").bitwiseXOR(F.lit(1 << p).cast("long"))
            for p in range(planes)
        ],
    )
    q = (
        e.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("sig").alias("qsig"),
        )
        .select("q_id", "qv", F.explode(probe).alias("probe"))
    )
    scored = e.join(
        F.broadcast(q),
        (F.col("sig") == F.col("probe")) & (F.col("vec_id") != F.col("q_id")),
    ).select("q_id", "vec_id", safe_cos(F.col("v"), F.col("qv")).alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "q_id",
            F.col("rk").cast("long").alias("rk"),
            "vec_id",
            F.round("cos", 6).alias("cos"),
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = None,
    bucket_cap: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidate pairs share an LSH
    sign-bucket (blocking — never all-pairs), verified by exact cosine ≥
    threshold. Output (d1, d2, cos) with d1 < d2.

    Scale shape: the bucket self-join touches only same-signature pairs;
    planes=None sizes the bucket count from the corpus (derived_lsh_planes)
    so the per-bucket pair count stays ~LSH_TARGET_BUCKET_SIZE² on
    UNIFORM data. Real embedding corpora cluster, and sign-LSH cannot
    split a tight cluster (near vectors colliding is its purpose) — so a
    hot bucket's O(m²) pair scan is irreducible, but it must never become
    ONE straggler task (measured at the r6 sf1.0 step-up: a 20k-vector
    clustered corpus at 4 pinned planes ran a 2-task stage for ~25 min).

    Fix: TRIANGLE-DISTRIBUTED self-join (pipeline.blocking): a hot bucket
    fans out into g² independent tasks of ≤ bucket_cap² pairs each with
    pair completeness preserved bit-for-bit (the driver oracle stays a
    plain self-join); cold buckets degenerate to the plain join with zero
    overhead."""
    from semantic_cpp_spark.pipeline import blocking

    if planes is None:
        planes = derived_lsh_planes(df.count())
    e = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("sig", lsh_signature(F.col("v"), dims, planes))
    e = blocking.triangle_tag(e, ["sig"], "vec_id", bucket_cap)
    # Explicit co-partitioned exchanges (fixed numPartitions, exempt from
    # AQE coalescing): the join INPUT is tiny in bytes but the pair
    # explosion inside it is the compute — AQE's byte-based coalescer
    # would otherwise merge every triangle task onto 1-2 cores (measured
    # ~25 min straggler at the sf1.0 step-up). Key ORDER matters: b's
    # (sig, __t, __gid) aligns positionally with a's (sig, __gid, __t)
    # under the triangle join condition, so both sides hash identically
    # and the join reuses these exchanges as-is.
    p = df.sparkSession.sparkContext.defaultParallelism
    a = e.repartition(p, "sig", "__gid", "__t").alias("a")
    b = e.repartition(p, "sig", "__t", "__gid").alias("b")
    pairs = a.join(
        b,
        (F.col("a.sig") == F.col("b.sig"))
        & blocking.triangle_cond("a", "b")
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("d1"),
        F.col("b.vec_id").alias("d2"),
        pair_cos_kernel()(F.col("a.v"), F.col("b.v")).alias("cos"),
    )
    return (
        pairs.filter(F.col("cos") >= threshold)
        .select("d1", "d2", F.round("cos", 6).alias("cos"))
    )


# Fixture centroid count (oracle-deterministic); the library default
# (n_centroids=None) derives K ≈ √n from the corpus — see derived_ivf_k.
IVF_K = 8


def ivf_assign(
    df: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
) -> DataFrame:
    """IVF coarse quantizer: centroids are the vectors with the K smallest
    ids (deterministic seeding — production would k-means these); every
    vector is assigned to its max-cosine centroid (ties → smallest id).
    n_centroids=None derives K ≈ √n (one count job).
    Returns (vec_id, v, centroid_id)."""
    if n_centroids is None:
        n_centroids = derived_ivf_k(df.count())
    e = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    cos = safe_cos(F.col("v"), F.col("cv"))
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "c_id", cos.alias("ccos")
    )
    # argmax as ONE map-side-combinable aggregate (r10): the scored
    # frame is n·K rows; the aggregate folds it into a #groups-sized
    # hash map per task with NO sort and no reliance on
    # InferWindowGroupLimit (the optimizer rule that bounds the
    # row_number form's exchange — it fires only on specific
    # rank-filter shapes; the honest 1M×K=256 A/B in SCALING r10
    # measured the two forms within box noise once both get enough
    # heap, so this is a robustness choice, not a claimed speedup).
    # max(struct(ccos, -c_id, v)) is order-isomorphic to the old
    # (ccos DESC, c_id ASC) window including the edge orderings: null
    # cos (zero-norm vector) loses to any real cos in struct
    # comparison exactly as NULLS LAST did, and -c_id makes ties
    # resolve to the SMALLEST id. Equivalence is test-pinned against
    # a row_number reimplementation.
    best = F.max(F.struct(F.col("ccos"), (-F.col("c_id")).alias("nc"),
                          F.col("v"))).alias("__b")
    return scored.groupBy("vec_id").agg(best).select(
        "vec_id",
        F.col("__b.v").alias("v"),
        (-F.col("__b.nc")).alias("centroid_id"),
    )


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: search only the query's centroid list.
    The inverted lists partition the corpus, so the scan touches ~n/K
    vectors per query — the index-style scale path complementing the LSH
    variant. Output (q_id, rk, vec_id, cos).

    Exactly the nprobe=1 case of ivf_multiprobe_topk (a query's rank-1
    probe centroid IS its ivf_assign centroid — same ranking), so it
    delegates: one pipeline to keep tie-breaks/rounding in sync."""
    return ivf_multiprobe_topk(
        df, query_ids, k=k, dims=dims, nprobe=1,
        id_col=id_col, vec_col=vec_col, n_centroids=n_centroids,
    )


def ivf_query_probes(
    assigned: DataFrame,
    query_ids: list[int],
    nprobe: int,
    n_centroids: int,
) -> DataFrame:
    """Per-query probe set: the query's ``nprobe`` nearest centroids by
    the same (cosine desc, c_id) ranking ivf_assign uses — rank 1 is
    exactly the query's own inverted list. Shared by ivf_multiprobe_topk
    and the recall-measurement script so the measured probe set can
    never diverge from the one the operator scans. Returns
    (q_id, qv, probe_cent)."""
    cents = assigned.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    qv = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    ccos = safe_cos(F.col("qv"), F.col("cv"))
    wq = Window.partitionBy("q_id").orderBy(
        F.col("ccos").desc(), F.col("c_id")
    )
    return (
        qv.crossJoin(F.broadcast(cents))
        .select("q_id", "qv", "c_id", ccos.alias("ccos"))
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= nprobe)
        .select("q_id", "qv", F.col("c_id").alias("probe_cent"))
    )


def ivf_multiprobe_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dims: int = 64,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
) -> DataFrame:
    """IVF top-k with nprobe > 1: each query scans the inverted lists of
    its ``nprobe`` nearest centroids instead of only the nearest one —
    the standard recall/cost dial for IVF (the r6 recall sweep measured
    nprobe=1 at 0.876 recall@5 scanning 2.2% of the corpus; widening the
    probe set recovers the neighbors that fall just across a Voronoi
    boundary, at nprobe× the scan).

    Scale shape is unchanged from ivf_topk: the corpus is partitioned
    into inverted lists ONCE (each vector in exactly one list, so
    candidates need no dedup); only the broadcast query side fans out,
    nprobe rows per query. Output (q_id, rk, vec_id, cos)."""
    if n_centroids is None:
        n_centroids = derived_ivf_k(df.count())
    assigned = ivf_assign(df, dims, id_col, vec_col, n_centroids)
    probes = ivf_query_probes(assigned, query_ids, nprobe, n_centroids)
    cos = safe_cos(F.col("v"), F.col("qv"))
    scored = assigned.join(
        F.broadcast(probes),
        (F.col("centroid_id") == F.col("probe_cent"))
        & (F.col("vec_id") != F.col("q_id")),
    ).select("q_id", "vec_id", cos.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "q_id",
            F.col("rk").cast("long").alias("rk"),
            "vec_id",
            F.round("cos", 6).alias("cos"),
        )
    )


# Above this derived plane count the single whole-signature key would
# exceed derived_lsh_planes' clamp — switch to banding (8-bit bands keep
# per-band collision probability meaningful at any width).
BANDING_THRESHOLD_PLANES = 24
BAND_BITS_DEFAULT = 8


def ann_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_override: int | None = None,
) -> DataFrame:
    """The self-tuning ANN front door: derive the signature width from
    the corpus size (one count job; ``n_override`` for tests/pre-counted
    corpora) and route to the right physical strategy —

    - derived planes ≤ 24 → single-key bucket join (lsh_bucket_topk):
      one equi-join on the whole signature, the cheapest form while the
      bucket count stays sane;
    - wider → banded OR-of-ANDs (lsh_banded_topk) with 8-bit bands:
      recall survives where a 2^planes single key over-fragments.

    Output schema is identical either way: (q_id, rk, vec_id, cos)."""
    n = df.count() if n_override is None else n_override
    raw_planes = _raw_lsh_planes(n)
    if raw_planes <= BANDING_THRESHOLD_PLANES:
        return lsh_bucket_topk(
            df, query_ids, k=k, dims=dims, id_col=id_col, vec_col=vec_col,
            planes=raw_planes,
        )
    planes = -(-raw_planes // BAND_BITS_DEFAULT) * BAND_BITS_DEFAULT
    return lsh_banded_topk(
        df, query_ids, k=k, dims=dims, planes=planes,
        band_bits=BAND_BITS_DEFAULT, id_col=id_col, vec_col=vec_col,
    )


def lsh_plane_sql_literal(dims: int, planes: int = LSH_PLANES) -> str:
    """DuckDB literal for the plane matrix: list of per-plane ±1 lists,
    generated from the same md5 derivation."""
    rows = []
    for p in range(planes):
        entries = ", ".join(
            str(float(plane_sign(p, d))) for d in range(dims)
        )
        rows.append(f"[{entries}]")
    return "[" + ", ".join(rows) + "]"


# -- product quantization (PQ) ----------------------------------------------
# The FAISS-style compression path past scalar int8 (quantize_q127) and
# prefix truncation (truncated_rescore_topk): split each vector into M
# subspaces, learn K centroids per subspace, store each vector as M
# small codes (M·log2(K) bits — 16 bits here vs 256 float bytes), and
# answer queries by ADC (asymmetric distance computation): exact
# query-to-centroid tables + code lookups, never touching the original
# vectors at probe time.

PQ_M = 4     # subspaces
PQ_K = 16    # centroids per subspace -> 4-bit codes
PQ_SUB = 16  # dims per subspace (PQ_M * PQ_SUB = the 64-dim fixture)


def pq_books(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = PQ_K,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
) -> DataFrame:
    """Per-subspace codebooks (m, c_id, cv) seeded from the
    ``n_centroids`` smallest vector ids' subvectors — the deterministic
    id-seeding discipline kmeans_assign/ivf_assign use, so the oracle
    replays the books exactly (pq_books_trained Lloyd-iterates these
    seeds with the emb_kmeans_step replay pattern). m_subs·n_centroids
    rows — broadcast-sized at any corpus (even 8-bit codes are
    m_subs·256 rows). Defaults give the 16-bit fixture config; the
    8-bit production config is n_centroids=256 (sim_pq_train_means_k256
    pins it under the gate)."""
    from semantic_cpp_spark.pipeline.clustering import _as_double

    e = emb.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("v")
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(m_subs - 1))).alias("m")
    return e.select("c_id", ms, "v").select(
        "m",
        "c_id",
        F.slice(F.col("v"), F.col("m") * sub_dims + 1, sub_dims).alias("cv"),
    )


def _pq_books_np(books: DataFrame) -> dict:
    """Collect a codebook frame into {m: (c_ids sorted ascending,
    centroid matrix)} for the Arrow assignment kernels. Model-sized by
    construction (m_subs·K rows — the same bound the old broadcast
    relied on); ascending c_id is what makes argmin's first-minimum
    the smallest-id tie-break."""
    import numpy as np

    by_m: dict[int, list] = {}
    for r in books.collect():  # model-sized: m_subs·K rows
        by_m.setdefault(int(r["m"]), []).append(
            (int(r["c_id"]), np.asarray(r["cv"], dtype=np.float64))
        )
    books_np = {}
    for m, lst in by_m.items():
        lst.sort(key=lambda t: t[0])  # ascending c_id → argmin tie-break
        books_np[m] = (
            np.array([c for c, _ in lst], dtype=np.int64),
            np.stack([cv for _, cv in lst]),
        )
    return books_np


def _pq_nearest(Xs, ids, C):
    """Nearest-centroid ids for one subspace batch, replaying the
    sq_dist EXPRESSION bit-for-bit: each dot is the same ascending-j
    sequential fold (dot(a,a) − 2·dot(a,b) + dot(b,b), elementwise
    IEEE ops in identical order), NaN distances lose to any finite
    one, ties take the smallest c_id (``ids``/``C`` sorted ascending;
    argmin returns the first minimum). Shared by the training and
    encode kernels so the replayed float semantics cannot diverge."""
    import numpy as np

    dxx = np.zeros(len(Xs))
    dxb = np.zeros((len(Xs), len(C)))
    dcc = np.zeros(len(C))
    for j in range(Xs.shape[1]):
        xj = Xs[:, j]
        cj = C[:, j]
        dxx = dxx + xj * xj
        dxb = dxb + xj[:, None] * cj[None, :]
        dcc = dcc + cj * cj
    d2 = (dxx[:, None] - 2.0 * dxb) + dcc[None, :]
    a = np.argmin(np.where(np.isnan(d2), np.inf, d2), axis=1)
    return ids[a]


def pq_encode(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: DataFrame | None = None,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
) -> DataFrame:
    """PQ codes (vec_id, m, code): per subspace, the nearest codebook
    centroid by squared euclidean (ties → smallest c_id) — m_subs·
    log2(K) bits of index state per vector at any scale. The 100 TB
    shape: codes persist next to the corpus like the Bloom/CMS
    sidecars (pq_index_save); re-encoding only touches new vectors.

    The assignment runs as ONE Arrow-batched numpy kernel (r15, guide
    §4.2 — the pq_train_means pattern): the old shape exploded every
    vector m_subs ways, broadcast-joined the codebook and folded
    n·m_subs·K per-row higher-order-function sq_dist evaluations
    through a struct-min aggregate (one exchange per encode). The
    kernel shares _pq_nearest with the trainer, so the replayed float
    semantics are the proven bit-identical fold (oracle replay + the
    window-argmin differential test pin it); codes come out of the map
    with ZERO shuffle and no per-row expression trees. The codebook is
    collected for the kernel closure — model-sized by construction
    (m_subs·K rows, the bound the old broadcast relied on). Subspaces
    absent from ``books`` yield no rows, exactly the old inner join."""
    import numpy as np

    from semantic_cpp_spark.pipeline.clustering import _as_double

    if books is None:
        books = pq_books(emb, id_col, vec_col, m_subs=m_subs, sub_dims=sub_dims)
    books_np = _pq_books_np(books)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["v"].to_numpy())
            vid = pdf["vec_id"].to_numpy()
            cols_v, cols_m, cols_c = [], [], []
            for m in range(m_subs):
                if m not in books_np:  # inner-join semantics
                    continue
                ids, C = books_np[m]
                Xs = X[:, m * sub_dims:(m + 1) * sub_dims]
                cols_v.append(vid)
                cols_m.append(np.full(len(Xs), m, dtype=np.int32))
                cols_c.append(_pq_nearest(Xs, ids, C))
            if not cols_v:
                continue
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(cols_v),
                    "m": np.concatenate(cols_m),
                    "code": np.concatenate(cols_c),
                }
            )

    e = emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    )
    return e.mapInPandas(encode, schema="vec_id long, m int, code long")


def _pq_default_index(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    trained: bool,
    books: DataFrame | None,
    codes: DataFrame | None,
    m_subs: int,
    sub_dims: int,
) -> tuple[DataFrame, DataFrame]:
    """Resolve the (books, codes) pair a probe runs against: passed-in
    frames win (the pq_index_load path — a persisted index is probed
    without re-deriving anything, ADVICE r8), otherwise both derive
    from the corpus. Passing codes without books raises — codes probed
    against the wrong books silently return garbage distances."""
    if codes is not None and books is None:
        raise ValueError(
            "pq probe: codes without their books — load both via "
            "pq_index_load (codes are meaningless against other books)"
        )
    if books is None:
        books = (
            pq_books_trained(emb, id_col, vec_col,
                             m_subs=m_subs, sub_dims=sub_dims)
            if trained
            else pq_books(emb, id_col, vec_col,
                          m_subs=m_subs, sub_dims=sub_dims)
        )
    if codes is None:
        codes = pq_encode(
            emb, id_col, vec_col, books=books,
            m_subs=m_subs, sub_dims=sub_dims,
        )
    return books, codes


def _pq_query_lut(
    emb: DataFrame,
    query_ids: list[int],
    books: DataFrame,
    id_col: str,
    vec_col: str,
    m_subs: int,
    sub_dims: int,
) -> DataFrame:
    """ADC lookup table (q_id, m, c_id, qd2): the query stays EXACT —
    per subspace its squared distance to every codebook centroid.
    |Q|·m_subs·K rows, broadcast-sized at any corpus."""
    from semantic_cpp_spark.pipeline.clustering import _as_double, sq_dist

    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(m_subs - 1))).alias("m")
    qsub = q.select("q_id", ms, "qv").select(
        "q_id",
        "m",
        F.slice(F.col("qv"), F.col("m") * sub_dims + 1, sub_dims).alias("qx"),
    )
    return qsub.join(F.broadcast(books), "m").select(
        "q_id", "m", "c_id", sq_dist(F.col("qx"), F.col("cv")).alias("qd2")
    )


def pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
    books: DataFrame | None = None,
    codes: DataFrame | None = None,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
) -> DataFrame:
    """Top-k by PQ ASYMMETRIC distance: the query stays exact; per
    subspace its distance to each of the K centroids forms a lookup
    table (|Q|·m_subs·K rows — broadcast), and a candidate's distance
    is the SUM of table entries at its codes — the original vectors are
    never read at probe time. ``books``/``codes`` (pq_index_load) probe
    a PERSISTED index without re-deriving either; by default both
    derive from the corpus. Ordering pinned on (rounded adc, vec_id);
    self-matches excluded. Returns (q_id, rk, vec_id, adc) — an
    APPROXIMATION whose recall-vs-compression trade is pinned in
    tests/measured in SCALING.md, the standard memory-bound regime
    (16 bits vs 256 bytes per vector = 128×). This probe scans the
    WHOLE code table per query batch — ivfpq_topk is the list-pruned
    composition for the 10¹⁰-vector regime."""
    books, codes = _pq_default_index(
        emb, id_col, vec_col, trained, books, codes, m_subs, sub_dims
    )
    lut = _pq_query_lut(
        emb, query_ids, books, id_col, vec_col, m_subs, sub_dims
    )
    c, l = codes.alias("c"), lut.alias("l")
    joined = c.join(
        F.broadcast(l),
        (F.col("c.m") == F.col("l.m")) & (F.col("c.code") == F.col("l.c_id")),
    ).select(F.col("l.q_id"), F.col("c.vec_id"), F.col("l.qd2"))
    adc = joined.groupBy("q_id", "vec_id").agg(
        F.round(F.sum("qd2"), 6).alias("adc")
    ).filter(F.col("q_id") != F.col("vec_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("adc"), F.col("vec_id"))
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("rk").cast("long").alias("rk"), "vec_id", "adc")
    )


# Positivity shift for exact floor division: Spark's integer `div`
# truncates toward zero while DuckDB's `//` floors, so the numerator
# must be non-negative for the two to agree — which PRESUPPOSES every
# embedding component ≥ −1024.0 (micro-units ≥ −PQ_TRAIN_OFF). The
# precondition is enforced in-plan (ADVICE r8): a component below the
# shift raises at execution instead of silently flooring differently
# on the two engines. The RESULT is shift-independent — (Σ + OFF·n)
# div n − OFF = floor(Σ/n) for any integer OFF keeping the numerator
# non-negative — so an oracle replaying with a different (smaller)
# shift on in-range data produces the identical table; 1024 covers
# every sane embedding scale while keeping OFF·n inside int64 up to
# ~9·10⁹ members per (m, centroid, dim) cell.
PQ_TRAIN_OFF = 1_024_000_000


def _pq_checkpoint_guard(
    spark, path, emb, id_col, vec_col,
    n_centroids, m_subs, sub_dims, train_frac, train_salt,
) -> None:
    """Refuse checkpointed books of foreign provenance (ADVICE r10):
    a one-row params sidecar at ``<path>/params`` records the training
    parameters plus a corpus content fingerprint (row count + bit_xor
    of a 60-bit md5 over each (id, vector) — order-independent, one
    corpus pass, cheap against a corpus·K Lloyd step); resume compares
    and raises on ANY mismatch instead of silently adopting step
    state written under a different corpus or configuration. Fresh
    roots get the sidecar written; roots holding step dirs with no
    sidecar (pre-r11 layouts included) raise."""
    from pyspark.errors import AnalysisException

    from semantic_cpp_spark.maintenance import checkpoint_steps

    fp = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "\x01",
                                F.col(id_col).cast("string"),
                                F.col(vec_col).cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
            ),
            F.lit(0),
        ).alias("h"),
    ).collect()[0]
    want = (
        int(fp["n"]), int(fp["h"]), int(n_centroids), int(m_subs),
        int(sub_dims), -1.0 if train_frac is None else float(train_frac),
        train_salt,
    )
    try:
        prow = spark.read.parquet(f"{path}/params").collect()
    except AnalysisException:
        if checkpoint_steps(spark, path):
            raise ValueError(
                f"checkpoint root {path} has step dirs but no params "
                "sidecar - refusing to adopt state of unknown provenance "
                "(pre-r11 checkpoint roots must be rebuilt or pointed "
                "elsewhere)"
            ) from None
        spark.createDataFrame(
            [want],
            "n_vecs long, corpus_fp long, n_centroids int, m_subs int, "
            "sub_dims int, train_frac double, train_salt string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")
        return
    if len(prow) != 1:
        raise ValueError(
            f"pq checkpoint params sidecar must hold exactly 1 row, "
            f"got {len(prow)}"
        )
    p = prow[0]
    got = (
        int(p["n_vecs"]), int(p["corpus_fp"]), int(p["n_centroids"]),
        int(p["m_subs"]), int(p["sub_dims"]), float(p["train_frac"]),
        p["train_salt"],
    )
    if got != want:
        raise ValueError(
            f"checkpoint root {path} was written under different "
            f"training inputs ({got} != {want}) - point this "
            "corpus/configuration at a fresh root"
        )


def pq_books_trained(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = PQ_K,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
    iters: int = 1,
    seed_books: DataFrame | None = None,
    train_frac: float | None = None,
    train_salt: str = "pqtrain",
    checkpoint_path: str | None = None,
) -> DataFrame:
    """``iters`` exactness-disciplined Lloyd steps over the id-seeded
    books: each step assigns every subvector to its nearest current
    centroid, then replaces each centroid with its members' element-wise
    mean — computed so BOTH engines produce the bit-identical result:
    components round to int64 micro-units before the group sum
    (order-exact, the cluster_cohesion discipline), the mean is an exact
    positive-shifted integer floor division ((Σ + OFF·n) // n − OFF —
    `div`/`//` agree on positives where they differ on negatives), and
    only the final /1e6 returns to double (correctly rounded identically
    everywhere). Empty clusters keep their previous centroid, so every
    step emits full m_subs·K books and later steps can re-populate them.
    The 1e-6 centroid quantization is noise against the quantization PQ
    itself introduces; what it buys is a TRAINED codebook the DuckDB
    oracle can replay exactly, step by step (sim_pq_train_means pins one
    4-bit step; sim_pq_train_means_k256 pins TWO steps at 8-bit codes,
    cell-for-cell).

    HONEST FINDING (measured, both fixtures, SCALING.md r8/r9): at
    4-bit codes ONE training step does not reliably beat the id seeding
    — the code budget, not centroid placement, dominates ADC error at
    16 bits. At 8-bit codes (n_centroids=256) training DOES pay:
    adc-only recall on the clustered fixture improves with both the
    bigger budget and the second iteration (scripts/pq_recall.py). The
    recall lever that works at every budget is the candidate+
    exact-rescore stage (pq_rescore_topk).

    ``train_frac`` is the production dial: Lloyd steps ASSIGN only a
    deterministic hash sample of the corpus (curation.bernoulli_sample
    on ``id_col`` with ``train_salt`` — content-addressed, so any
    cluster draws the identical training set) while seeds and the
    final encode side still see everything. Codebook quality needs
    only a representative sample (FAISS trains on ~10⁵–10⁶ of 10¹⁰
    vectors); the step cost drops from corpus·K to sample·K scoring
    rows. Fully oracle-replayable: the sample is an md5-threshold
    WHERE clause, not an RNG (sim_pq_train_sampled).

    ``checkpoint_path`` makes the 100-TB advice executable: each
    step's books persist to ``<checkpoint_path>/step=<i>`` (m_subs·K
    rows — KB-scale) and a re-invocation with the same path RESUMES
    from the newest completed step ≤ iters instead of replaying the
    chain, which also truncates the lazy lineage between steps. A
    one-row params sidecar (training params + corpus content
    fingerprint) is written on the first run and CHECKED on resume
    (ADVICE r10): pointing a different corpus, n_centroids, m_subs,
    sub_dims, train_frac, or train_salt at an existing root raises
    instead of silently adopting foreign step state."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if train_frac is not None and not 0.0 < train_frac <= 1.0:
        raise ValueError(f"train_frac must be in (0,1], got {train_frac}")
    from semantic_cpp_spark.pipeline.curation import bernoulli_sample

    train = emb
    if train_frac is not None and train_frac < 1.0:
        train = bernoulli_sample(emb, F.col(id_col), train_frac, train_salt)
    books = seed_books if seed_books is not None else pq_books(
        emb, id_col, vec_col,
        n_centroids=n_centroids, m_subs=m_subs, sub_dims=sub_dims,
    )
    start = 0
    if checkpoint_path is not None:
        spark = emb.sparkSession
        _pq_checkpoint_guard(
            spark, checkpoint_path, emb, id_col, vec_col,
            n_centroids, m_subs, sub_dims, train_frac, train_salt,
        )
        from semantic_cpp_spark.maintenance import checkpoint_steps

        # only steps whose parquet job committed (_SUCCESS present)
        # are resumable (ADVICE r11) — a crash mid-write leaves a
        # marker-less dir that resume skips for the previous step
        for i in (
            s
            for s in reversed(
                checkpoint_steps(spark, checkpoint_path, marker="_SUCCESS")
            )
            if s <= iters
        ):
            books, start = (
                spark.read.parquet(f"{checkpoint_path}/step={i}"),
                i,
            )
            break
    for _step in range(start, iters):
        trained = (
            pq_train_means(
                train, id_col, vec_col, books=books,
                m_subs=m_subs, sub_dims=sub_dims,
            )
            .groupBy("m", "c_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "q"))),
                    lambda st: st["q"].cast("double") / F.lit(1e6),
                ).alias("cv")
            )
        )
        # empty clusters keep their previous centroid; both sides are
        # m_subs·K rows (KB at any corpus size) — broadcast the trained
        # side so the merge never sort-merge-exchanges two tiny frames
        b0 = books.alias("b0")
        t = F.broadcast(trained.alias("t"))
        books = b0.join(
            t,
            (F.col("b0.m") == F.col("t.m"))
            & (F.col("b0.c_id") == F.col("t.c_id")),
            "left",
        ).select(
            F.col("b0.m").alias("m"),
            F.col("b0.c_id").alias("c_id"),
            F.coalesce(F.col("t.cv"), F.col("b0.cv")).alias("cv"),
        )
        if checkpoint_path is not None:
            step_path = f"{checkpoint_path}/step={_step + 1}"
            books.write.mode("overwrite").parquet(step_path)
            books = emb.sparkSession.read.parquet(step_path)
    return books


def pq_train_means(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: DataFrame | None = None,
    n_centroids: int = PQ_K,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
) -> DataFrame:
    """The exact integer means table behind one pq_books_trained step:
    (m, c_id, dim, q) with q = the trained centroid component in
    micro-units — pure int64 end to end, so a differential oracle can
    verify the whole assign→group→mean pipeline cell-for-cell with no
    float anywhere. Assignment runs against ``books`` (default: the
    id-seeded books — the first Lloyd step; pass the previous step's
    output to chain iterations). Only clusters with members appear.

    The ASSIGNMENT stage runs as one Arrow-batched numpy kernel (r15,
    guide §4.2): the old shape exploded every vector m_subs ways and
    broadcast-joined the codebook, materializing n·m_subs·K scored
    rows whose sq_dist evaluated through per-row higher-order-function
    expressions — at K=256 that is 20M interpreted rows per Lloyd step
    and it made sim_pq_train_family the single most expensive gate in
    the registry sweep (21.8 s at sf0.1; ~3× faster after). The kernel
    replays the EXACT float semantics: each dot is the same ascending-j
    sequential fold as the sq_dist expression (dot(a,a) − 2·dot(a,b) +
    dot(b,b), elementwise IEEE ops in identical order), NaN distances
    lose to any finite one, and ties take the smallest c_id (centroids
    are processed sorted by c_id, argmin returns the first minimum) —
    so the assignment, and therefore every downstream integer cell, is
    bit-identical to the expression form (oracle-replay hash equality
    re-verified at sf0.001/0.01/0.1). The micro-unit rounding, the positivity
    guard, and the exact integer mean stay IN-PLAN, unchanged. The
    codebook is collected to the driver for the kernel closure — it is
    model-sized by construction (m_subs·K rows, the same bound the old
    broadcast relied on)."""
    from semantic_cpp_spark.pipeline.clustering import _as_double

    books0 = books if books is not None else pq_books(
        emb, id_col, vec_col,
        n_centroids=n_centroids, m_subs=m_subs, sub_dims=sub_dims,
    )
    import numpy as np

    books_np = _pq_books_np(books0)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["v"].to_numpy())
            cols_m, cols_c, cols_x = [], [], []
            for m in range(m_subs):
                ids, C = books_np[m]
                Xs = X[:, m * sub_dims:(m + 1) * sub_dims]
                cols_m.append(np.full(len(Xs), m, dtype=np.int32))
                cols_c.append(_pq_nearest(Xs, ids, C))
                cols_x.append(Xs)
            yield pd.DataFrame(
                {
                    "m": np.concatenate(cols_m),
                    "c_id": np.concatenate(cols_c),
                    "xv": [
                        row.tolist()
                        for Xs in cols_x
                        for row in Xs
                    ],
                }
            )

    e = emb.select(_as_double(F.col(vec_col)).alias("v"))
    assigned = e.mapInPandas(
        assign, schema="m int, c_id long, xv array<double>"
    )
    xi = F.round(F.col("x") * 1e6).cast("long")
    # enforce the positivity-shift precondition (|x| <= OFF µ-units)
    # in-plan: raises at execution on the violating row rather than
    # letting `div` (truncate) and `//` (floor) silently diverge
    guarded = F.when(xi >= F.lit(-PQ_TRAIN_OFF), xi).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "pq_train_means: embedding component below "
                    f"-{PQ_TRAIN_OFF / 1e6} breaks the positivity shift "
                    "(scale inputs to |x| <= 1024): "
                ),
                F.col("x").cast("string"),
            )
        ).cast("long")
    )
    dims = assigned.select(
        "m", "c_id",
        F.posexplode(F.col("xv")).alias("dim", "x"),
    ).select(
        "m", "c_id", "dim",
        guarded.alias("xi"),
    )
    # integer `div` on the positive-shifted numerator — never a double
    # quotient (whose rounding could cross an integer before truncation)
    return dims.groupBy("m", "c_id", "dim").agg(
        F.sum("xi").alias("s"), F.count(F.lit(1)).alias("n")
    ).select(
        "m",
        "c_id",
        F.col("dim").cast("long").alias("dim"),
        (
            F.expr(f"(s + {PQ_TRAIN_OFF}L * n) div n") - F.lit(PQ_TRAIN_OFF)
        ).alias("q"),
    )


def pq_index_save(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
    n_centroids: int = PQ_K,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
    iters: int = 1,
) -> None:
    """Persist a PQ index NEXT TO its codebooks — the bloom_save
    discipline applied to ANN: codes probed against the wrong books
    silently return garbage distances (no error, just wrong
    neighbors), so books and codes travel under one root
    (``<path>/books`` + ``<path>/codes`` + ``<path>/params``) and
    pq_index_load refuses to hand back a partial index. The loaded
    pair plugs straight into pq_adc_topk/pq_rescore_topk(books=,
    codes=) — probing never re-derives either. Codes stay distributed
    end to end (16 bits/vector: a 10¹⁰-vector corpus is ~20 GB of code
    rows — never driver state); books are m_subs·K rows."""
    books = (
        pq_books_trained(emb, id_col, vec_col, n_centroids=n_centroids,
                         m_subs=m_subs, sub_dims=sub_dims, iters=iters)
        if trained
        else pq_books(emb, id_col, vec_col, n_centroids=n_centroids,
                      m_subs=m_subs, sub_dims=sub_dims)
    )
    codes = pq_encode(
        emb, id_col, vec_col, books=books, m_subs=m_subs, sub_dims=sub_dims
    )
    books.write.mode("overwrite").parquet(f"{path}/books")
    codes.write.mode("overwrite").parquet(f"{path}/codes")
    emb.sparkSession.createDataFrame(
        [(m_subs, n_centroids, sub_dims, bool(trained))],
        "pq_m int, pq_k int, pq_sub int, trained boolean",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def pq_index_load(spark, path: str) -> tuple[DataFrame, DataFrame, dict]:
    """Re-open a pq_index_save'd index: (books, codes, params). The
    params sidecar is one row; books/codes scans stay lazy."""
    p = spark.read.parquet(f"{path}/params").collect()
    if len(p) != 1:
        raise ValueError(
            f"pq params sidecar must hold exactly 1 row, got {len(p)}"
        )
    params = {
        "pq_m": int(p[0]["pq_m"]),
        "pq_k": int(p[0]["pq_k"]),
        "pq_sub": int(p[0]["pq_sub"]),
        "trained": bool(p[0]["trained"]),
    }
    return (
        spark.read.parquet(f"{path}/books"),
        spark.read.parquet(f"{path}/codes"),
        params,
    )


def pq_rescore_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_candidates: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
    books: DataFrame | None = None,
    codes: DataFrame | None = None,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
) -> DataFrame:
    """The production PQ probe: ADC candidate generation (top
    ``n_candidates`` by code lookups — the memory-bound scan that never
    touches vectors) followed by EXACT squared-euclidean rescore of the
    survivors only (the FAISS refine stage; the truncated_rescore_topk
    pattern). ``books``/``codes`` probe a pq_index_load'd index
    directly. This is the recall lever at small code budgets — measured
    0.13 → 0.73 (sf0.001) and 0.33 → 0.87 (sf0.01) at C=100 on the
    isotropic worst case; monotone in C and exact at C = n
    (test-pinned). Returns (q_id, rk, vec_id, d2) ordered by (rounded
    exact d2, vec_id)."""
    from semantic_cpp_spark.pipeline.clustering import _as_double, sq_dist

    cand = pq_adc_topk(
        emb, query_ids, k=n_candidates, id_col=id_col, vec_col=vec_col,
        trained=trained, books=books, codes=codes,
        m_subs=m_subs, sub_dims=sub_dims,
    ).select("q_id", "vec_id")
    e = emb.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        cand.join(e, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(sq_dist(F.col("v"), F.col("qv")), 6).alias("d2"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d2"), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("rk").cast("long").alias("rk"), "vec_id", "d2")
    )


# -- IVFADC: IVF coarse routing composed with PQ codes -----------------------
# The FAISS IVFADC index (Jégou et al. 2011): pq_adc_topk alone scans the
# ENTIRE code table per query batch — correct, but the known
# non-scalable probe shape at 10^10 vectors (VERDICT r8 #1). Routing
# every code row into its vector's IVF inverted list lets the probe
# scan only the nprobe lists nearest each query: candidate volume drops
# from n·|Q| to |Q|·nprobe·(n/n_lists), the same pruning ivf_topk
# applies to raw vectors — while distances stay ADC code lookups, so
# the probe still never touches a vector except the broadcast queries.


def ivfpq_codes(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int | None = None,
    books: DataFrame | None = None,
    trained: bool = False,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
    codes: DataFrame | None = None,
) -> DataFrame:
    """LISTED PQ codes (vec_id, list_id, m, code): every vector's PQ
    codes tagged with its IVF coarse-quantizer list (ivf_assign's
    max-cosine centroid, ties → smallest id). This is the INDEX-BUILD
    step — one assignment pass + one encode pass + one equi-join on
    vec_id, run once and persisted (ivfpq_index_save); probes read the
    listed codes only. n_lists=None derives K ≈ √n (one count job).
    ``trained=True`` Lloyd-trains the books first (pq_books_trained)
    when none are passed; explicit ``books`` always win (they may
    already be trained — re-training someone else's books here would
    desync them from any codes encoded elsewhere). ``codes`` skips the
    encode pass entirely with PRE-ENCODED (vec_id, m, code) rows — the
    share-one-encode hook for callers composing several probe paths
    over one corpus (sim_ivfpq_family_topk): codes must come from the
    same ``books`` (the pq_index_load contract), so passing codes
    without books raises."""
    if codes is not None and books is None:
        raise ValueError(
            "ivfpq_codes: codes without their books — pre-encoded codes "
            "are meaningless against other books; pass both"
        )
    if n_lists is None:
        n_lists = derived_ivf_k(emb.count())
    if books is None and trained:
        books = pq_books_trained(
            emb, id_col, vec_col, m_subs=m_subs, sub_dims=sub_dims
        )
    assigned = ivf_assign(emb, 0, id_col, vec_col, n_lists).select(
        "vec_id", F.col("centroid_id").alias("list_id")
    )
    if codes is None:
        codes = pq_encode(
            emb, id_col, vec_col, books=books,
            m_subs=m_subs, sub_dims=sub_dims,
        )
    return codes.join(assigned, "vec_id").select(
        "vec_id", "list_id", "m", "code"
    )


def ivfpq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    n_lists: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
    books: DataFrame | None = None,
    listed_codes: DataFrame | None = None,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
) -> DataFrame:
    """IVFADC top-k — the production ANN probe shape at corpus scale:

    1. coarse route: each query picks its ``nprobe`` nearest IVF
       centroids (ivf_query_probes — the same (cosine desc, c_id)
       ranking the lists were built with), a broadcast-sized frame;
    2. prune: the listed code table equi-joins those (q_id, list) pairs
       — only codes in probed lists survive, |Q|·nprobe·(n/n_lists)
       rows instead of the full table;
    3. ADC: survivors join the broadcast query LUT on (m, code) and
       group-sum to asymmetric distances — vectors never read;
    4. top-k window on (rounded adc, vec_id), self-matches excluded.

    ``books``/``listed_codes`` (ivfpq_index_load) probe a persisted
    index; by default both derive from the corpus. Recall floor vs the
    full-scan pq_adc_topk is pinned in tests (a neighbor in an
    unprobed list is the IVF trade, dialed by nprobe); the pruned plan
    shape is pinned in test_plans (no full-code-table scan reaches the
    ADC join). Returns (q_id, rk, vec_id, adc)."""
    if n_lists is None:
        n_lists = derived_ivf_k(emb.count())
    if books is None and listed_codes is not None:
        raise ValueError(
            "ivfpq probe: listed_codes without their books — load both "
            "via ivfpq_index_load (codes are meaningless against other "
            "books)"
        )
    if books is None:
        books = (
            pq_books_trained(emb, id_col, vec_col,
                             m_subs=m_subs, sub_dims=sub_dims)
            if trained
            else pq_books(emb, id_col, vec_col,
                          m_subs=m_subs, sub_dims=sub_dims)
        )
    if listed_codes is None:
        listed_codes = ivfpq_codes(
            emb, id_col, vec_col, n_lists=n_lists, books=books,
            m_subs=m_subs, sub_dims=sub_dims,
        )
    # ivf_query_probes only reads (vec_id, v) — hand it the raw vectors
    # rather than re-running the full corpus assignment on the probe side
    from semantic_cpp_spark.pipeline.clustering import _as_double as _asd
    vecs = emb.select(
        F.col(id_col).alias("vec_id"), _asd(F.col(vec_col)).alias("v")
    )
    probes = ivf_query_probes(vecs, query_ids, nprobe, n_lists).select(
        "q_id", "probe_cent"
    )
    lut = _pq_query_lut(
        emb, query_ids, books, id_col, vec_col, m_subs, sub_dims
    )
    pruned = listed_codes.join(
        F.broadcast(probes),
        F.col("list_id") == F.col("probe_cent"),
    ).select("q_id", "vec_id", "m", "code")
    l = lut.alias("l")
    p = pruned.alias("p")
    joined = p.join(
        F.broadcast(l),
        (F.col("p.q_id") == F.col("l.q_id"))
        & (F.col("p.m") == F.col("l.m"))
        & (F.col("p.code") == F.col("l.c_id")),
    ).select(F.col("p.q_id"), F.col("p.vec_id"), F.col("l.qd2"))
    adc = joined.groupBy("q_id", "vec_id").agg(
        F.round(F.sum("qd2"), 6).alias("adc")
    ).filter(F.col("q_id") != F.col("vec_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("adc"), F.col("vec_id"))
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("rk").cast("long").alias("rk"), "vec_id", "adc")
    )


def ivfpq_index_save(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int | None = None,
    trained: bool = False,
    n_centroids: int = PQ_K,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
    iters: int | None = None,
    residual: bool = False,
) -> None:
    """Persist an IVFADC index under one root: ``<path>/books`` +
    ``<path>/codes`` (listed — each row carries its IVF list_id) +
    ``<path>/params`` (including n_lists, so probes route against the
    list count the index was built with, and ``residual``, so a loaded
    index is probed with the MATCHING probe — residual codes against a
    raw-LUT probe return garbage distances, exactly the mismatch the
    sidecar exists to prevent). Same refuse-partial discipline as
    pq_index_save/bloom_save. ``residual=True`` builds via
    ivfpq_residual_index, and ``iters`` threads through to its Lloyd
    training on the residual space (ADVICE r9 — one residual step pays
    on clustered data, SCALING r9). ``iters=None`` keeps each form's
    default (1 Lloyd step for raw ``trained=True``, untrained seeds
    for residual — the probe-side derivation default, so a default
    save always matches a default fresh probe); the EFFECTIVE value is
    recorded in the sidecar."""
    if n_lists is None:
        n_lists = derived_ivf_k(emb.count())
    if residual:
        eff_iters = 0 if iters is None else iters
        books, listed = ivfpq_residual_index(
            emb, id_col, vec_col, n_lists=n_lists,
            n_centroids=n_centroids, m_subs=m_subs, sub_dims=sub_dims,
            iters=eff_iters,
        )
        trained = False
    else:
        eff_iters = (1 if iters is None else iters) if trained else 0
        books = (
            pq_books_trained(emb, id_col, vec_col, n_centroids=n_centroids,
                             m_subs=m_subs, sub_dims=sub_dims,
                             iters=eff_iters)
            if trained
            else pq_books(emb, id_col, vec_col, n_centroids=n_centroids,
                          m_subs=m_subs, sub_dims=sub_dims)
        )
        listed = ivfpq_codes(
            emb, id_col, vec_col, n_lists=n_lists, books=books,
            m_subs=m_subs, sub_dims=sub_dims,
        )
    books.write.mode("overwrite").parquet(f"{path}/books")
    listed.write.mode("overwrite").parquet(f"{path}/codes")
    emb.sparkSession.createDataFrame(
        [(m_subs, n_centroids, sub_dims, bool(trained), int(n_lists),
          bool(residual), int(eff_iters))],
        "pq_m int, pq_k int, pq_sub int, trained boolean, n_lists int, "
        "residual boolean, iters int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def ivfpq_index_load(spark, path: str) -> tuple[DataFrame, DataFrame, dict]:
    """Re-open an ivfpq_index_save'd index: (books, listed_codes,
    params). One-row params sidecar; books/codes scans stay lazy."""
    p = spark.read.parquet(f"{path}/params").collect()
    if len(p) != 1:
        raise ValueError(
            f"ivfpq params sidecar must hold exactly 1 row, got {len(p)}"
        )
    params = {
        "pq_m": int(p[0]["pq_m"]),
        "pq_k": int(p[0]["pq_k"]),
        "pq_sub": int(p[0]["pq_sub"]),
        "trained": bool(p[0]["trained"]),
        "n_lists": int(p[0]["n_lists"]),
        # pre-r9 sidecars have no residual column: those indexes are raw
        "residual": bool(p[0]["residual"]) if "residual" in p[0].__fields__
        else False,
        # pre-r10 sidecars have no iters column. Untrained saves are
        # safely 0; for TRAINED ones the true depth is unrecoverable
        # (pre-r10 ivfpq_index_save accepted an explicit iters — e.g. 3
        # — that the old sidecar never recorded), so backfill None =
        # "trained, depth unknown" rather than asserting 1 (ADVICE r10).
        "iters": int(p[0]["iters"]) if "iters" in p[0].__fields__
        else (None if bool(p[0]["trained"]) else 0),
    }
    return (
        spark.read.parquet(f"{path}/books"),
        spark.read.parquet(f"{path}/codes"),
        params,
    )


# -- IVFADC with RESIDUAL encoding (the full FAISS IVF-PQ shape) -------------
# ivfpq_topk above quantizes raw vectors: the PQ error budget is spent
# representing the vector's absolute position, most of which the coarse
# quantizer already knows. Jégou et al.'s production form encodes the
# RESIDUAL r = x − c_list instead — residual magnitudes are a fraction
# of vector magnitudes whenever the data clusters, so the same
# m·log2(K) bits buy a strictly finer grid around each list's centroid
# (MAE of ADC vs true distance is test-pinned lower than the raw-vector
# codes on the clustered regime). The probe pays one extra broadcast:
# the LUT becomes per-(query, probed list) (|Q|·nprobe·m·K rows — still
# KB-scale) because the query must be expressed in each probed list's
# residual frame (q − c_list). Everything else keeps the ivfpq_topk
# scale shape: codes live in inverted lists, the ADC join only ever
# sees |Q|·nprobe·(n/n_lists) candidate rows, vectors are never read
# at probe time.


def _coarse_residuals(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int,
    lo: int | None = None,
    hi: int | None = None,
) -> DataFrame:
    """(vec_id, list_id, rv): each target vector's ivf_assign list
    (max-cosine over the n_lists smallest-id centroids, ties → smaller
    id — the exact ivf_assign ranking, inlined so ``lo``/``hi`` can
    restrict the TARGET side to a handful of seed ids without touching
    the centroid side) and its residual r = x − c_list, one exact IEEE
    zip_with. Per-vector assignment is independent, so restricting the
    targets yields exactly the full run's rows for those ids."""
    from semantic_cpp_spark.pipeline.clustering import _as_double

    e = emb.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    cents = e.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    targets = e
    if lo is not None:
        targets = e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
    scored = targets.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "c_id", "cv",
        safe_cos(F.col("v"), F.col("cv")).alias("ccos"),
    )
    # argmax as a map-side-combinable aggregate (r10, the ivf_assign
    # note): one partial per vec_id crosses the exchange instead of
    # n·n_lists scored rows with full vector payloads.
    best = F.max(
        F.struct(
            F.col("ccos"),
            (-F.col("c_id")).alias("nc"),
            F.col("v"),
            F.col("cv"),
        )
    ).alias("__b")
    return (
        scored.groupBy("vec_id")
        .agg(best)
        .select(
            "vec_id",
            (-F.col("__b.nc")).alias("list_id"),
            F.zip_with("__b.v", "__b.cv", lambda a, b: a - b).alias("rv"),
        )
    )


def _exact_euclid_topk_sets(
    emb: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, set]:
    """Exact euclidean top-k as {q_id: {vec_id, ...}} — the ground
    truth PQ approximates, used by the early-stop recall check. Scored
    as one broadcast-query cross over the corpus (|Q| tiny); the
    collect is |Q|·k rows of ids, the recall-diagnostic pattern."""
    from semantic_cpp_spark.pipeline.clustering import _as_double, sq_dist

    e = emb.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", sq_dist(F.col("v"), F.col("qv")).alias("d2")
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d2"), F.col("vec_id"))
    out: dict[int, set] = {}
    for r in (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id")
        .collect()
    ):
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def ivfpq_residual_index(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int | None = None,
    n_centroids: int = PQ_K,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
    iters: int = 0,
    train_frac: float | None = None,
    train_salt: str = "pqtrain",
    early_stop_ids: list[int] | None = None,
    early_stop_k: int = 5,
    early_stop_nprobe: int = 2,
    early_stop_info: dict | None = None,
    checkpoint_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the residual IVFADC index: (books, listed_codes).

    1. residual codebooks seeded from the residuals of the n_centroids
       smallest ids ≥ n_lists (ids < n_lists are the coarse centroids
       themselves — their residuals are exactly zero, useless seeds),
       computed on a TINY branch (n_centroids target rows only);
    2. the corpus passes through ONE linear pipeline — assign (one
       broadcast-centroid cross, the ivf_assign idiom), residual
       (exact IEEE zip_with; the oracle's indexed list_transform folds
       identically), then the Arrow (d2, c_id)-argmin encode kernel
       (r15 — the pq_encode shape; _pq_nearest replays the sq_dist
       fold bit-identically) — so the corpus is scanned and assigned
       exactly once per build (the pq_encode-composition first cut
       re-expanded the assignment cross in every DAG branch;
       plan-pinned against now);
    3. list_id rides the encode rows, no post-hoc corpus self-join.

    ``iters`` ≥ 1 Lloyd-trains the residual books on the residual
    corpus (pq_books_trained's exactness-disciplined steps, seeded from
    the offset seeds) — Lloyd on the residual space, the FAISS training
    recipe; each iteration's total assignment SSE is non-increasing
    (test-pinned, the Lloyd monotonicity theorem).

    ``train_frac``/``train_salt`` thread to pq_books_trained: Lloyd
    steps assign only the deterministic hash sample of the RESIDUAL
    corpus (sampled by vec_id, so the training set is the residuals of
    a content-addressed vector sample) — the same production dial as
    raw PQ training, with the same sample ≫ K contract (SCALING r10).
    Seeds and the final encode pass always see everything.

    ``early_stop_ids`` makes the SCALING r9 finding executable
    machinery (VERDICT r9 #5): SSE decreases monotonically while
    HELD-OUT recall can fall with extra steps (0.240 → 0.192 measured
    at tiny code budgets), so when a held-out query set is given the
    build trains one step at a time, measures recall@``early_stop_k``
    of the full residual probe (nprobe=``early_stop_nprobe``) against
    the exact euclidean top-k after EACH step — the untrained seeds
    are step 0's baseline — and keeps the first maximum: it stops as
    soon as a step fails to improve and returns the previous step's
    books. Pass a dict as ``early_stop_info`` to receive
    {"steps_used", "recall_per_step"}. Each evaluated step costs one
    extra corpus encode + probe; at 100 TB run the evaluation build on
    a hash-sampled sub-corpus (curation.bernoulli_sample) and train
    the final index with the chosen step count.

    Run once and persisted via ivfpq_index_save's layout; probes read
    listed codes only."""
    if early_stop_ids and iters < 1:
        # ADVICE r10: the early-stop branch requires at least one
        # training step; silently returning untrained seeds when a
        # caller passes held-out ids with the default iters=0 is the
        # silent-wrong-results shape — fail loudly instead.
        raise ValueError(
            "early_stop_ids requires iters >= 1 (early stopping picks "
            f"among training steps; got iters={iters})"
        )
    if early_stop_ids and checkpoint_path is not None:
        # same fail-loudly discipline: the early-stop branch trains
        # step-by-step with its own stop rule and does not checkpoint;
        # silently ignoring the path would be the ADVICE-r10 shape.
        raise ValueError(
            "checkpoint_path applies to fixed-iters residual training; "
            "combine it with early_stop_ids is not supported"
        )
    if n_lists is None:
        n_lists = derived_ivf_k(emb.count())
    seeds = _coarse_residuals(
        emb, id_col, vec_col, n_lists, lo=n_lists, hi=n_lists + n_centroids
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(m_subs - 1))).alias("m")
    books = seeds.select(F.col("vec_id").alias("c_id"), ms, "rv").select(
        "m",
        F.col("c_id"),
        F.slice(F.col("rv"), F.col("m") * sub_dims + 1, sub_dims).alias("cv"),
    )
    corpus = _coarse_residuals(emb, id_col, vec_col, n_lists)

    def _encode(bks: DataFrame) -> DataFrame:
        # the pq_encode Arrow kernel (r15, guide §4.2) with list_id
        # riding through the map: one batched numpy argmin over the
        # residual rows, zero shuffle, no per-row sq_dist expression
        # trees. _pq_nearest is the same proven bit-identical fold the
        # raw encode and the trainer replay; subspaces absent from
        # ``bks`` yield no rows, exactly the old inner join.
        import numpy as np

        books_np = _pq_books_np(bks)

        def encode(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["rv"].to_numpy())
                vid = pdf["vec_id"].to_numpy()
                lid = pdf["list_id"].to_numpy()
                cols_v, cols_l, cols_m, cols_c = [], [], [], []
                for m in range(m_subs):
                    if m not in books_np:  # inner-join semantics
                        continue
                    ids, C = books_np[m]
                    Xs = X[:, m * sub_dims:(m + 1) * sub_dims]
                    cols_v.append(vid)
                    cols_l.append(lid)
                    cols_m.append(np.full(len(Xs), m, dtype=np.int32))
                    cols_c.append(_pq_nearest(Xs, ids, C))
                if not cols_v:
                    continue
                yield pd.DataFrame(
                    {
                        "vec_id": np.concatenate(cols_v),
                        "list_id": np.concatenate(cols_l),
                        "m": np.concatenate(cols_m),
                        "code": np.concatenate(cols_c),
                    }
                )

        return corpus.select("vec_id", "list_id", "rv").mapInPandas(
            encode, schema="vec_id long, list_id long, m int, code long"
        )

    if iters >= 1 and early_stop_ids:
        truth = _exact_euclid_topk_sets(
            emb, early_stop_ids, early_stop_k, id_col, vec_col
        )

        def _recall(bks: DataFrame) -> float:
            probe = ivfpq_residual_topk(
                emb, early_stop_ids, k=early_stop_k,
                nprobe=early_stop_nprobe, n_lists=n_lists,
                id_col=id_col, vec_col=vec_col,
                books=bks, listed_codes=_encode(bks),
                n_centroids=n_centroids, m_subs=m_subs, sub_dims=sub_dims,
            )
            got: dict[int, set] = {}
            for r in probe.collect():
                got.setdefault(r["q_id"], set()).add(r["vec_id"])
            num = den = 0
            for q, t in truth.items():
                den += len(t)
                num += len(t & got.get(q, set()))
            return num / den if den else 1.0

        recalls = [_recall(books)]
        steps_used = 0
        for _ in range(iters):
            cand = pq_books_trained(
                corpus, "vec_id", "rv", n_centroids=n_centroids,
                m_subs=m_subs, sub_dims=sub_dims, iters=1,
                seed_books=books,
                train_frac=train_frac, train_salt=train_salt,
            )
            recalls.append(_recall(cand))
            if recalls[-1] <= recalls[-2]:
                break
            books, steps_used = cand, steps_used + 1
        if early_stop_info is not None:
            early_stop_info["steps_used"] = steps_used
            early_stop_info["recall_per_step"] = recalls
    elif iters >= 1:
        # checkpoint_path threads straight to pq_books_trained (the
        # residual corpus is what fingerprints into its sidecar, so a
        # different base corpus or n_lists changes the residuals and
        # is refused at resume like any other foreign state)
        books = pq_books_trained(
            corpus, "vec_id", "rv", n_centroids=n_centroids,
            m_subs=m_subs, sub_dims=sub_dims, iters=iters,
            seed_books=books,
            train_frac=train_frac, train_salt=train_salt,
            checkpoint_path=checkpoint_path,
        )
    return books, _encode(books)


def ivfpq_residual_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    n_lists: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: DataFrame | None = None,
    listed_codes: DataFrame | None = None,
    n_centroids: int = PQ_K,
    m_subs: int = PQ_M,
    sub_dims: int = PQ_SUB,
) -> DataFrame:
    """Residual-encoded IVFADC top-k (Jégou et al. 2011, the FAISS
    IVF{K},PQ{m} production index):

    1. coarse route: each query picks nprobe nearest lists
       (ivf_query_probes — the build-side ranking);
    2. per (query, probed list) the query re-expresses itself in that
       list's residual frame (q − c_list) and builds its ADC LUT
       against the RESIDUAL books — |Q|·nprobe·m_subs·K rows,
       broadcast;
    3. prune: listed codes equi-join the probe pairs —
       |Q|·nprobe·(n/n_lists) candidates, never the full table;
    4. ADC: candidates meet the LUT on (q, list, m, code), group-sum,
       top-k on (rounded adc, vec_id), self-matches excluded.

    ``books``/``listed_codes`` probe a persisted index (build them with
    ivfpq_residual_index); both must come from the SAME build — codes
    against other books return garbage, so passing one without the
    other raises. Returns (q_id, rk, vec_id, adc)."""
    from semantic_cpp_spark.pipeline.clustering import _as_double, sq_dist

    if n_lists is None:
        n_lists = derived_ivf_k(emb.count())
    if (books is None) != (listed_codes is None):
        raise ValueError(
            "ivfpq residual probe: books and listed_codes must be "
            "passed together (both from one ivfpq_residual_index build) "
            "or both derived"
        )
    if books is None:
        books, listed_codes = ivfpq_residual_index(
            emb, id_col, vec_col, n_lists=n_lists,
            n_centroids=n_centroids, m_subs=m_subs, sub_dims=sub_dims,
        )
    e = emb.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    cents = e.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    probes = ivf_query_probes(e, query_ids, nprobe, n_lists).select(
        "q_id", "probe_cent"
    )
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    # query residual per probed list: (q_id, probe_cent, qr)
    qres = (
        q.join(F.broadcast(probes), "q_id")
        .join(F.broadcast(cents), F.col("probe_cent") == F.col("c_id"))
        .select(
            "q_id",
            "probe_cent",
            F.zip_with("qv", "cv", lambda a, b: a - b).alias("qr"),
        )
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(m_subs - 1))).alias("m")
    qsub = qres.select("q_id", "probe_cent", ms, "qr").select(
        "q_id",
        "probe_cent",
        "m",
        F.slice(F.col("qr"), F.col("m") * sub_dims + 1, sub_dims).alias("qx"),
    )
    lut = qsub.join(F.broadcast(books), "m").select(
        "q_id",
        "probe_cent",
        "m",
        F.col("c_id"),
        sq_dist(F.col("qx"), F.col("cv")).alias("qd2"),
    )
    pruned = listed_codes.join(
        F.broadcast(probes), F.col("list_id") == F.col("probe_cent")
    ).select("q_id", "list_id", "vec_id", "m", "code")
    p, l = pruned.alias("p"), lut.alias("l")
    joined = p.join(
        F.broadcast(l),
        (F.col("p.q_id") == F.col("l.q_id"))
        & (F.col("p.list_id") == F.col("l.probe_cent"))
        & (F.col("p.m") == F.col("l.m"))
        & (F.col("p.code") == F.col("l.c_id")),
    ).select(F.col("p.q_id"), F.col("p.vec_id"), F.col("l.qd2"))
    adc = joined.groupBy("q_id", "vec_id").agg(
        F.round(F.sum("qd2"), 6).alias("adc")
    ).filter(F.col("q_id") != F.col("vec_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("adc"), F.col("vec_id"))
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("rk").cast("long").alias("rk"), "vec_id", "adc")
    )
