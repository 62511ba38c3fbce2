"""Embedding decomposition: distributed PCA — covariance by Arrow-batched
partial sums, eigendecomposition on the driver (k×dims model state, the
MLlib shape), projection as a broadcast map. The embedding-column
compression/whitening primitive next to clustering (topic axes, variance
diagnostics, dimensionality reduction before ANN).

Iterative/eigen work has no SQL oracle (same treatment as gradient
descent and kmeans_fit): numpy-pinned in tests.

Scale design: each Arrow batch contributes one (n, Σx, ΣxᵀX) partial —
O(dims²) state per PARTITION, not per row; the driver combines
≤num_partitions partials (≈33 KB each at dims=64) and never sees data
rows. Projection is a pure narrow map with the k×dims component matrix
folded into literal expressions (JVM-side dot products, no Python on
the scoring path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_cpp_spark.functions.vectors import dot


def _partials_fn(dims: int):
    def f(batches):
        import numpy as np
        import pandas as pd

        s = np.zeros(dims)
        ss = np.zeros((dims, dims))
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["v"].to_numpy())
            s += X.sum(axis=0)
            ss += X.T @ X
            n += len(X)
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "ss": [ss.flatten().tolist()]}
        )

    return f


def _covariance(df: DataFrame, dims: int, vec_col: str):
    """Distributed covariance: Arrow-batched (n, Σx, ΣxᵀX) partials →
    driver combine. Returns (n, mean, cov) with cov = ss/n − μμᵀ —
    numpy arrays, KB-scale model state."""
    import numpy as np

    vecs = df.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    parts = vecs.mapInPandas(
        _partials_fn(dims), "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(r["n"] for r in parts)
    if n == 0:
        raise ValueError("pca fit on empty input")
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(dims, dims) for r in parts], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_fit(
    df: DataFrame,
    k: int,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit PCA: returns (mean, components, explained_variance) — the top-k
    eigenvectors/eigenvalues of the covariance matrix, eigenvectors
    sign-normalised (first nonzero coordinate positive) so results are
    deterministic."""
    import numpy as np

    _, mean, cov = _covariance(df, dims, vec_col)
    vals, vecs_ = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for i in order:
        v = vecs_[:, i]
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if len(nz) and v[nz[0]] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return (
        [float(x) for x in mean],
        comps,
        [float(vals[i]) for i in order],
    )


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project vectors onto fitted components — one Arrow-batched numpy
    matrix product per batch (r15, guide §4.2). The previous shape
    folded the k×dims component matrix into literal expression trees
    (k·dims literals — 4096 at the full-rank k=64 gate), whose codegen
    and per-row interpreted evaluation made emb_pca_norm_preserved one
    of the slowest gates in the registry sweep (6.1 → ~1.5 s at
    sf0.1). The kernel replays the EXACT float semantics of the old
    zip_with/dot expressions: centring is the same elementwise
    subtract, and each projection accumulates its dims terms in the
    same ascending-j sequential fold (one vectorized add per j, all
    components at once), so every output double is bit-identical —
    emb_pca_project's 6dp-rounded oracle hash stays exact. Zero
    shuffle, model-sized (k×dims) closure state. Output
    (vec_id, proj array<double>)."""
    import numpy as np

    mean_np = np.asarray(mean, dtype=np.float64)
    W = np.stack([np.asarray(c, dtype=np.float64) for c in components])
    dims = len(mean_np)
    k = len(components)

    def project(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["__v"].to_numpy())
            Xc = X - mean_np
            P = np.zeros((len(Xc), k))
            for j in range(dims):
                P = P + Xc[:, j:j + 1] * W[None, :, j]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "proj": [row.tolist() for row in P],
                }
            )

    out = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    id_type = out.schema["vec_id"].dataType.simpleString()
    return out.mapInPandas(
        project, schema=f"vec_id {id_type}, proj array<double>"
    )


def pca_power_fit(
    df: DataFrame,
    k: int = 4,
    rounds: int = 15,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[float], list[list[float]], list[float], float]:
    """PCA by FIXED-ROUND power iteration with deflation — the
    oracle-replayable fit: exactly ``rounds`` iterations per component
    from v₀ = 1⃗/√dims (no convergence test, no early exit), λ by
    Rayleigh quotient, then deflate C ← C − λvvᵀ and repeat. Because
    every step is a fixed arithmetic recurrence on the covariance, a
    SQL engine can replay the identical rounds as unrolled CTEs and the
    results agree to well past 6dp — the same replay contract as
    graph_pagerank_top10, which is what buys emb_pca_project a HARD
    value oracle where eigh (LAPACK-internal iteration, sign-arbitrary)
    cannot have one. Sign needs no canonicalisation: v₀ and the
    positive-norm normalisation fix it deterministically on both
    engines.

    The distributed work is the covariance pass (_covariance, Arrow
    partials); the k×rounds matrix-vector products run on the dims²
    driver-state matrix — sub-millisecond at any corpus size, identical
    shape to pca_fit. Returns (mean, components, eigenvalues,
    trace(cov)) — trace is Σ per-dim variances, the explained-ratio
    denominator."""
    import numpy as np

    _, mean, cov = _covariance(df, dims, vec_col)
    C = cov.copy()
    comps, vals = [], []
    for _c in range(k):
        v = np.full(dims, 1.0 / np.sqrt(dims))
        for _t in range(rounds):
            w = C @ v
            v = w / np.linalg.norm(w)
        lam = float(v @ (C @ v))
        comps.append([float(x) for x in v])
        vals.append(lam)
        C = C - lam * np.outer(v, v)
    return (
        [float(x) for x in mean],
        comps,
        vals,
        float(np.trace(cov)),
    )


# -- Johnson–Lindenstrauss random projection ---------------------------------

JL_SCALE_8 = 0.35355339059327373  # 1/sqrt(8), shared literal with the oracle


def jl_signs(out_dims: int, in_dims: int, salt: str = "jl") -> list[list[int]]:
    """Deterministic ±1 sign matrix for JL random projection (Achlioptas,
    'Database-friendly random projections', JPDC 2003: ±1 entries satisfy
    the JL lemma with the same distortion bound as Gaussians). Entry
    (j, i) is derived from md5 — reproducible across runs, engines, and
    cluster sizes, and cheap enough to regenerate anywhere (no model
    state to ship)."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{salt}-{j}-{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
            for i in range(in_dims)
        ]
        for j in range(out_dims)
    ]


def jl_project(
    df: DataFrame,
    out_dims: int = 8,
    in_dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "jl",
) -> DataFrame:
    """JL random projection 64→k: y_j = (1/√k)·Σ_i sign(j,i)·x_i. The
    cheap dimensionality reduction before ANN when no PCA fit is wanted
    — data-independent, single narrow pass, preserves pairwise
    distances within (1±ε) w.h.p. (JL lemma).

    Scale shape: the sign matrix is folded into literal expressions
    (same zero-exchange pattern as pca_project — pure JVM map, no
    Python, no shuffle, no model state). Each dot is a LEFT-TO-RIGHT
    fold over exact ±1·float32 terms, so the DuckDB oracle's
    list_sum(list_transform(...)) reproduces it bit-for-bit; the 1/√k
    scale is applied once at the end from a shared literal. Output is
    exploded to scalar rows (vec_id, out_dim, value)."""
    if out_dims != 8 or in_dims != 64:
        # JL_SCALE_8 is the 1/sqrt(8) literal shared with the SQL oracle;
        # other shapes would need their own shared scale constant.
        raise ValueError("jl_project is pinned to 64 -> 8 (shared oracle scale)")
    wide = jl_project_wide(df, out_dims, in_dims, id_col, vec_col, salt)
    return wide.select(
        "vec_id",
        F.posexplode(
            F.transform("proj", lambda p: F.round(p, 6))
        ).alias("out_dim", "value"),
    ).select("vec_id", F.col("out_dim").cast("long").alias("out_dim"), "value")


def jl_project_wide(
    df: DataFrame,
    out_dims: int = 8,
    in_dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "jl",
) -> DataFrame:
    """jl_project's array form: (vec_id, proj array<double>) — the shape
    downstream vector ops (cosine_topk over the projected space, ANN
    pre-filtering) consume directly. Same zero-exchange literal-matrix
    plan; the driver-gate query uses the exploded scalar form."""
    signs = jl_signs(out_dims, in_dims, salt)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dots = [
        (dot(v, F.array(*[F.lit(float(s)) for s in row])) * F.lit(JL_SCALE_8)).alias(
            f"p{j}"
        )
        for j, row in enumerate(signs)
    ]
    wide = df.select(F.col(id_col).alias("vec_id"), *dots)
    return wide.select(
        "vec_id",
        F.array(*[F.col(f"p{j}") for j in range(out_dims)]).alias("proj"),
    )
