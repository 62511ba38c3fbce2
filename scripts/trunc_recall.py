"""Dimension-truncation recall sweep (the measurement companion of the
``sim_dim_truncation_recall`` gate query): recall@5 of brute cosine over
the first d dims vs the exact 64-dim baseline, across d and BOTH
embedding regimes — the isotropic sf0.01 fixture (worst case: every dim
carries equal variance, so a prefix keeps d/64 of the signal) and the
mixture-of-Gaussians fixture (.localdata/annmog — the realistic case:
cluster identity concentrates in a few directions).

    python scripts/trunc_recall.py [n_queries]

Prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from semantic_cpp_spark.pipeline import similarity
from semantic_cpp_spark.session import get_spark, load_table

DIMS = [4, 8, 16, 32, 48]


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


def main():
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    spark = get_spark(
        "trunc_recall",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fixtures = [
        ("isotropic sf0.01", "/root/testdata/sf0.01"),
        ("mixture-of-Gaussians", "/root/repo/.localdata/annmog"),
    ]
    print("| fixture | " + " | ".join(f"d={d}" for d in DIMS) + " |")
    print("|---|" + "---|" * len(DIMS))
    for label, sf_dir in fixtures:
        emb = load_table(spark, sf_dir, "embeddings").persist()
        qids = list(range(n_q))
        truth = topk_sets(similarity.cosine_topk(emb, qids, k=5).collect())
        cells = []
        for d in DIMS:
            trunc = emb.select(
                "vec_id", F.slice("embedding", 1, d).alias("embedding")
            )
            approx = topk_sets(similarity.cosine_topk(trunc, qids, k=5).collect())
            cells.append(f"{recall(approx, truth):.3f}")
        print(f"| {label} | " + " | ".join(cells) + " |")

        # two-stage rescore: d=16 prefix candidates, exact 64-dim rescore —
        # recall@5 vs the candidate budget C (the knob that buys back what
        # one-stage truncation loses)
        cs = [10, 25, 50, 100, 200]
        rcells = []
        for c in cs:
            two = topk_sets(
                similarity.truncated_rescore_topk(
                    emb, qids, k=5, prefix_dims=16, n_candidates=c
                ).collect()
            )
            rcells.append(f"C={c}: {recall(two, truth):.3f}")
        emb.unpersist()
        print(f"|   + d=16 rescore | " + " | ".join(rcells) + " |")


if __name__ == "__main__":
    main()
