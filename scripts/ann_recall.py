"""Measured ANN retrieval quality (VERDICT r5 next-round #2).

The sim_* driver oracles replicate each blocking algorithm in SQL, which
proves implementation-determinism but NOT retrieval quality. This script
measures recall@k of every approximate strategy against the brute-force
``cosine_topk`` ground truth on the sf0.01 embeddings fixture (2000
vectors, 64 dims), across signature widths and IVF centroid counts:

    python scripts/ann_recall.py [sf_dir] [n_queries]

Prints a markdown table for SCALING.md. The pytest floor lives in
tests/test_pipeline.py::test_ann_recall_floors (smaller sweep, asserted
invariants: banded-candidates ⊇ bucket-candidates ⇒ banded recall ≥
bucket recall at equal planes; quantized rescore stays near-exact).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from semantic_cpp_spark.pipeline import similarity
from semantic_cpp_spark.session import get_spark, load_table


def topk_sets(df_rows):
    out = {}
    for r in df_rows:
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def recall(approx, truth):
    num = den = 0
    for q, tset in truth.items():
        den += len(tset)
        num += len(tset & approx.get(q, set()))
    return num / den if den else 1.0


def _mean_cands(spark, emb, qids, n, key_fn):
    """Mean per-query candidate count for a blocking scheme: key_fn maps
    the corpus to (vec_id, key) rows; candidates share >=1 key with the
    query (self excluded, deduped)."""
    from pyspark.sql import functions as F

    keyed = key_fn(emb)
    q = keyed.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("q_id"), "key"
    )
    cnt = (
        keyed.join(F.broadcast(q), "key")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
        .count()
    )
    return cnt / len(qids)


def main():
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = 5
    spark = get_spark("ann_recall")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    qids = list(range(n_q))

    truth = topk_sets(similarity.cosine_topk(emb, qids, k=k).collect())

    print(f"corpus n={n}, dims=64, k={k}, queries={n_q} (ground truth: brute cosine)\n")
    print("| strategy | param | recall@5 | cands/query | % corpus scanned |")
    print("|---|---|---|---|---|")

    def row(label, param, rec, cands):
        print(f"| {label} | {param} | {rec:.3f} | {cands:.0f} | {100*cands/n:.1f}% |")

    for planes in (4, 8, 16, 24):
        b = topk_sets(
            similarity.lsh_bucket_topk(emb, qids, k=k, dims=64, planes=planes)
            .collect()
        )
        cands = _mean_cands(
            spark, emb, qids, n,
            lambda e, p=planes: e.select(
                "vec_id",
                similarity.lsh_signature(
                    F.transform("embedding", lambda x: x.cast("double")), 64, p
                ).alias("key"),
            ),
        )
        row("lsh_bucket", f"planes={planes}", recall(b, truth), cands)
    for planes in (4, 8, 16):
        b = topk_sets(
            similarity.lsh_multiprobe_topk(
                emb, qids, k=k, dims=64, planes=planes
            ).collect()
        )
        # candidate count for multiprobe = corpus rows matching ANY of the
        # 1+planes probe keys; probe keys are distinct so no dedup needed
        from pyspark.sql import functions as FF
        e2 = emb.select(
            FF.col("vec_id"),
            similarity.lsh_signature(
                FF.transform("embedding", lambda x: x.cast("double")), 64, planes
            ).alias("sig"),
        )
        qs = e2.filter(FF.col("vec_id").isin(qids)).select(
            FF.col("vec_id").alias("q_id"), FF.col("sig").alias("qsig")
        )
        probe = FF.array(
            FF.col("qsig"),
            *[FF.col("qsig").bitwiseXOR(FF.lit(1 << p).cast("long"))
              for p in range(planes)],
        )
        qp = qs.select("q_id", FF.explode(probe).alias("sig"))
        cands = (
            e2.join(FF.broadcast(qp), "sig")
            .filter(FF.col("vec_id") != FF.col("q_id"))
            .count()
        ) / len(qids)
        row("lsh_multiprobe", f"planes={planes},probes={planes+1}",
            recall(b, truth), cands)
    for planes, bb in ((8, 4), (16, 4), (16, 8), (24, 8), (32, 8)):
        b = topk_sets(
            similarity.lsh_banded_topk(
                emb, qids, k=k, dims=64, planes=planes, band_bits=bb
            ).collect()
        )
        cands = _mean_cands(
            spark, emb, qids, n,
            lambda e, p=planes, w=bb: e.select(
                "vec_id",
                F.explode(
                    similarity.lsh_band_keys(
                        F.transform("embedding", lambda x: x.cast("double")),
                        64, p, w,
                    )
                ).alias("key"),
            ),
        )
        row("lsh_banded", f"planes={planes},band_bits={bb}", recall(b, truth), cands)
    q = topk_sets(similarity.quantized_topk(emb, qids, k=k).collect())
    row("quantized_int8", "q127 rescore", recall(q, truth), n - 1)
    for K in (4, 8, 45):
        b = topk_sets(
            similarity.ivf_topk(emb, qids, k=k, dims=64, n_centroids=K).collect()
        )
        assigned = similarity.ivf_assign(emb, 64, n_centroids=K)
        cands = _mean_cands(
            spark, emb, qids, n,
            lambda e, a=assigned: a.select(
                "vec_id", F.col("centroid_id").alias("key")
            ),
        )
        row("ivf nprobe=1", f"K={K}", recall(b, truth), cands)
    for nprobe in (2, 3):
        K = 45
        b = topk_sets(
            similarity.ivf_multiprobe_topk(
                emb, qids, k=k, dims=64, nprobe=nprobe, n_centroids=K
            ).collect()
        )
        assigned = similarity.ivf_assign(emb, 64, n_centroids=K)
        # the OPERATOR's own probe selection — measurement can't diverge
        probes = similarity.ivf_query_probes(assigned, qids, nprobe, K).select(
            "q_id", F.col("probe_cent").alias("key")
        )
        cands = (
            assigned.select("vec_id", F.col("centroid_id").alias("key"))
            .join(F.broadcast(probes), "key")
            .filter(F.col("vec_id") != F.col("q_id"))
            .count()
        ) / len(qids)
        row(f"ivf nprobe={nprobe}", f"K={K}", recall(b, truth), cands)

    # JL projected-space brute force: rank in the 8-dim projection (8×
    # cheaper dots), score recall of that ranking vs the 64-dim truth —
    # how much neighborhood structure the data-independent ±1 projection
    # keeps at this k (the JL lemma's ε at out_dims=8 is loose; this is
    # the measured reality check).
    from semantic_cpp_spark.pipeline import decomposition

    proj = decomposition.jl_project_wide(emb).cache()
    jl = topk_sets(
        similarity.cosine_topk(proj, qids, k=k, vec_col="proj").collect()
    )
    row("jl_projected_brute", "out_dims=8", recall(jl, truth), n - 1)
    proj.unpersist()


if __name__ == "__main__":
    main()
