"""Skew torture for the dedup path (VERDICT r5 next-round #8).

Compares minhash_lsh_pairs + connected_components wall time on a UNIFORM
corpus (all docs unique) vs a HOT one (80% of docs are one duplicate
clique) at the same doc count. The hot corpus has an inherently quadratic
PAIR OUTPUT (c²/2 for a c-clique — no pair-enumerating operator avoids
that), so the comparison to watch is:

- per-PAIR throughput: hot time / hot pairs vs uniform baseline — the
  triangle-distributed band join (pipeline.blocking) keeps the clique's
  quadratic work spread across ceil(c/cap)² tasks instead of one
  straggler;
- connected_components: rounds are O(log n) regardless of skew (a clique
  converges in one hash-min round), so hot ≈ uniform.

Usage: python scripts/skew_torture.py [n_docs]
Prints a small table for SCALING.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from semantic_cpp_spark.pipeline import dedup
from semantic_cpp_spark.session import get_spark


def corpus(spark, n, hot):
    rows = []
    n_hot = int(n * 0.8) if hot else 0
    for i in range(n):
        if i < n_hot:
            rows.append((i, "the identical duplicated boilerplate body text"))
        else:
            rows.append(
                (i, f"unique document {i} tokens {i*7%9973} {i*13%9973} "
                    f"{i*29%9973} {i*31%9973} {i*37%9973}")
            )
    return spark.createDataFrame(rows, "doc_id long, text string")


def run(spark, n, hot):
    df = corpus(spark, n, hot)
    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(
        df, F.col("text"), F.col("doc_id"), threshold=0.5
    )
    pairs = pairs.persist()
    n_pairs = pairs.count()
    t1 = time.time()
    cc = dedup.connected_components(pairs)
    n_comp = cc.select("component").distinct().count()
    t2 = time.time()
    pairs.unpersist()
    from semantic_cpp_spark.indexing import release_ordinal_caches

    release_ordinal_caches()  # flush the plan-keyed signature memo
    return n_pairs, t1 - t0, n_comp, t2 - t1


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("skew_torture")
    # warm the JVM/python-worker pools so the uniform run isn't charged
    run(spark, 200, False)
    up, ut_pairs, ucomp, ut_cc = run(spark, n, False)
    hp, ht_pairs, hcomp, ht_cc = run(spark, n, True)
    print(f"\nn_docs={n} (hot = 80% one duplicate clique)\n")
    print("| corpus | lsh pairs | pairs time | CC distinct comps | CC time |")
    print("|---|---|---|---|---|")
    print(f"| uniform | {up} | {ut_pairs:.2f}s | {ucomp} | {ut_cc:.2f}s |")
    print(f"| hot-80% | {hp} | {ht_pairs:.2f}s | {hcomp} | {ht_cc:.2f}s |")
    per_pair = ht_pairs / max(hp, 1) * 1e6
    print(f"\nhot per-pair cost: {per_pair:.2f} µs/pair "
          f"({hp} pairs in {ht_pairs:.2f}s); CC ratio hot/uniform: "
          f"{ht_cc / max(ut_cc, 1e-9):.2f}×")


if __name__ == "__main__":
    main()
