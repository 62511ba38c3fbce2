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

    vecs = df.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    parts = vecs.mapInPandas(
        _partials_fn(dims), "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(r["n"] for r in parts)
    if n == 0:
        raise ValueError("pca_fit on empty input")
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(dims, dims) for r in parts], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
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
    """Project vectors onto fitted components: centred dot products with
    the component matrix folded into literal arrays — pure JVM map,
    zero shuffle, no Python. Output (vec_id, proj array<double>)."""
    centred = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.array(*[F.lit(m) for m in mean]),
        lambda x, m: x - m,
    )
    out = df.select(F.col(id_col).alias("vec_id"), centred.alias("__c"))
    projs = [
        dot(F.col("__c"), F.array(*[F.lit(w) for w in comp])).alias(f"p{i}")
        for i, comp in enumerate(components)
    ]
    wide = out.select("vec_id", *projs)
    return wide.select(
        "vec_id",
        F.array(*[F.col(f"p{i}") for i in range(len(components))]).alias("proj"),
    )
