"""PQ code-budget / training-iteration recall sweep (the measurement
behind ``pq_books_trained``'s honest-finding docstring and the
``sim_pq_train_means_k256`` gate query): adc-only recall@5 vs the exact
euclidean baseline across

  - code budget: K=16 (4-bit codes, the fixture config) vs K=256
    (8-bit, the production config — 32 bits/vector, still 64x vs raw),
  - training: id-seeded books vs 1 vs 2 exactness-disciplined Lloyd
    iterations,

on BOTH embedding regimes — isotropic sf0.01 (worst case for PQ: no
cluster structure for centroids to learn) and the mixture-of-Gaussians
fixture (.localdata/annmog — the realistic case). Also prints the
IVFADC recall-vs-nprobe dial at the best config (the list-pruning trade
of ivfpq_topk).

    python scripts/pq_recall.py [n_queries]

Prints markdown tables for SCALING.md.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from semantic_cpp_spark.pipeline import similarity
from semantic_cpp_spark.session import get_spark, load_table


def topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def recall(approx, truth):
    num = den = 0
    for q, t in truth.items():
        den += len(t)
        num += len(t & approx.get(q, set()))
    return num / den if den else 1.0


def exact_truth(emb, qids, k=5):
    """Exact euclidean top-k (the metric PQ approximates)."""
    from semantic_cpp_spark.pipeline.clustering import _as_double, sq_dist

    e = emb.select(
        F.col("vec_id"), _as_double(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", sq_dist(F.col("v"), F.col("qv")).alias("d2"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d2"), F.col("vec_id"))
    return topk_sets(
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .collect()
    )


def main():
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    spark = get_spark(
        "pq_recall",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fixtures = [
        ("isotropic sf0.01", "/root/testdata/sf0.01"),
        ("mixture-of-Gaussians", "/root/repo/.localdata/annmog"),
    ]
    configs = [
        ("K=16 seed", dict(n_centroids=16, iters=0)),
        ("K=16 1it", dict(n_centroids=16, iters=1)),
        ("K=256 seed", dict(n_centroids=256, iters=0)),
        ("K=256 1it", dict(n_centroids=256, iters=1)),
        ("K=256 2it", dict(n_centroids=256, iters=2)),
    ]
    print("| fixture | " + " | ".join(c[0] for c in configs) + " |")
    print("|---|" + "---|" * len(configs))
    for label, sf_dir in fixtures:
        emb = load_table(spark, sf_dir, "embeddings").persist()
        qids = list(range(n_q))
        truth = exact_truth(emb, qids, k=5)
        cells = []
        for _, cfg in configs:
            if cfg["iters"] == 0:
                books = similarity.pq_books(
                    emb, n_centroids=cfg["n_centroids"]
                )
            else:
                books = similarity.pq_books_trained(
                    emb, n_centroids=cfg["n_centroids"], iters=cfg["iters"]
                )
            codes = similarity.pq_encode(emb, books=books)
            adc = topk_sets(
                similarity.pq_adc_topk(
                    emb, qids, k=5, books=books, codes=codes
                ).collect()
            )
            cells.append(f"{recall(adc, truth):.3f}")
        print(f"| {label} | " + " | ".join(cells) + " |")

        # IVFADC: the nprobe dial at K=256 2it (the production config)
        books = similarity.pq_books_trained(emb, n_centroids=256, iters=2)
        n = emb.count()
        n_lists = similarity.derived_ivf_k(n)
        listed = similarity.ivfpq_codes(
            emb, n_lists=n_lists, books=books
        ).persist()
        cells = []
        for nprobe in (1, 2, 4, n_lists):
            ivf = topk_sets(
                similarity.ivfpq_topk(
                    emb, qids, k=5, nprobe=nprobe, n_lists=n_lists,
                    books=books, listed_codes=listed,
                ).collect()
            )
            cells.append(f"nprobe={nprobe}: {recall(ivf, truth):.3f}")
        listed.unpersist()
        print(f"|   + IVFADC n_lists={n_lists} | " + " | ".join(cells) + " |")

        # residual A/B at MATCHED budget (K=16 id-seeded books both sides):
        # same 16-bit codes, the only change is encoding x vs x - c_list
        raw_books = similarity.pq_books(emb, n_centroids=16)
        raw_listed = similarity.ivfpq_codes(
            emb, n_lists=n_lists, books=raw_books
        ).persist()
        res_books, res_listed = similarity.ivfpq_residual_index(
            emb, n_lists=n_lists
        )
        res_listed = res_listed.persist()
        cells = []
        for nprobe in (1, 2, 4, n_lists):
            raw = topk_sets(
                similarity.ivfpq_topk(
                    emb, qids, k=5, nprobe=nprobe, n_lists=n_lists,
                    books=raw_books, listed_codes=raw_listed,
                ).collect()
            )
            res = topk_sets(
                similarity.ivfpq_residual_topk(
                    emb, qids, k=5, nprobe=nprobe, n_lists=n_lists,
                    books=res_books, listed_codes=res_listed,
                ).collect()
            )
            cells.append(
                f"nprobe={nprobe}: raw {recall(raw, truth):.3f} "
                f"/ res {recall(res, truth):.3f}"
            )
        raw_listed.unpersist()
        res_listed.unpersist()
        emb.unpersist()
        print(f"|   + residual A/B (K=16 seed) | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
