"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Query set = the performance-representative subset (scan+agg, joins,
window replication, ordinal machinery) — not every correctness query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "rel_q1_pricing_summary",
    "rel_q3_top_revenue",
    "rel_q5_nation_revenue",
    "rel_topk_per_segment",
    "sem_sort_stable",
    "sem_filter_rebases_idx",
    "agg_skew_kurt",
    "agg_quantiles",
    "grp_frequency_profile",
    "win_tumble",
    "win_slide",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "txt_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from semantic_cpp_spark import registry
    from semantic_cpp_spark.session import get_spark

    spark = get_spark("bench")
    qs = registry.queries()

    # Warm the JVM + parquet footers with one cheap action.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # Protocol: one untimed warm-up execution per query (JIT, parquet
    # footer cache, Arrow init), then the MEDIAN of n timed executions
    # (default 3, override $SPARK_GRAFT_BENCH_RUNS) — machine noise on
    # this box is documented at 2-3×, and a median of 3 keeps the
    # steady-state number comparable across rounds without chasing it.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            # noop sink materialises every column (count() would let
            # Catalyst prune the aggregate expressions away).
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        # min-of-n alongside the median (VERDICT r10): the minimum is
        # the least-contended reading, so round-over-round deltas in
        # value_min separate plan changes from host noise; value stays
        # the median sum for cross-round continuity.
        timings_min[name] = round(samples[0], 3)

    # Boundary flush of ordinal caches (range-strategy persists) so a
    # long-lived harness embedding bench.main() doesn't accumulate them.
    from semantic_cpp_spark.indexing import release_ordinal_caches

    release_ordinal_caches()

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "value_min": round(sum(timings_min.values()), 3),
        "queries_min": timings_min,
        "sf": float(sf) if sf else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
