"""Streaming step-up at sf1.0 (VERDICT r6 next-round #7).

The r6 batch step-up proved the batch operators survive 10×; this script
runs the CUSTOM STATEFUL streaming operators (running-stats / count-
windows / top-k trio, funnel, last-touch, bounded sliding-uniques) over
the sf1.0 events fixture (1M events, 15k users) on BOTH state-store
providers (default HDFS-heap and RocksDB), recording wall time,
throughput, emitted rows, and the state-store's own size metrics
(stateOperators.numRowsTotal / memoryUsedBytes from the query's final
progress) — the numbers the 100 TB claim about bounded state rests on.

Usage: python scripts/streaming_stepup.py [sf_dir ...]
       (default /root/testdata/sf0.1 then /root/repo/.localdata/sf1.0)

Prints one markdown table per sf_dir for SCALING.md.
"""

from __future__ import annotations

import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

from semantic_cpp_spark.streaming import ops  # noqa: E402


def run_measured(stream_df, output_mode):
    """run_to_memory, but returns (rows, seconds, state_rows, state_mb)
    from the final StreamingQueryProgress."""
    name = f"stepup_{uuid.uuid4().hex[:12]}"
    t0 = time.time()
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        wall = time.time() - t0
        prog = q.lastProgress or {}
    finally:
        q.stop()
    state_rows = state_bytes = 0
    for op in prog.get("stateOperators", []):
        state_rows += op.get("numRowsTotal", 0)
        state_bytes += op.get("memoryUsedBytes", 0)
    n = stream_df.sparkSession.table(name).count()
    return n, wall, state_rows, state_bytes / 1e6


def main() -> None:
    from semantic_cpp_spark.session import get_spark

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/root/repo/.localdata/sf1.0",
    ]
    spark = get_spark(
        "streaming_stepup",
        master="local[32]",
        shuffle_partitions=32,
    )
    cases = [
        ("running_stats", lambda ev: ops.running_stats_per_user(ev), "update"),
        ("count_windows", lambda ev: ops.count_tumble_per_user(ev), "append"),
        ("topk_per_user", lambda ev: ops.topk_per_user(ev, 3), "update"),
        ("funnel_stages", lambda ev: ops.funnel_stages_per_user(ev), "update"),
        ("last_touch", lambda ev: ops.last_touch_per_user(ev), "append"),
        (
            "sliding_uniques_bounded",
            lambda ev: ops.sliding_unique_users_bounded(ev),
            "append",
        ),
        (
            "sliding_uniques_hll",
            lambda ev: ops.sliding_unique_users_hll(ev),
            "append",
        ),
    ]
    providers = [("hdfs", None), ("rocksdb", ops.ROCKSDB_PROVIDER)]
    key = "spark.sql.streaming.stateStore.providerClass"
    default_provider = spark.conf.get(key)

    from semantic_cpp_spark.session import load_table

    for sf_dir in sf_dirs:
        n_in = load_table(spark, sf_dir, "events").count()
        print(f"\n### {sf_dir} ({n_in:,} events)\n")
        print(
            "| operator | provider | rows out | wall s | events/s "
            "| state rows | state MB |"
        )
        print("|---|---|---|---|---|---|---|")
        for label, mk, mode in cases:
            for pname, pclass in providers:
                spark.conf.set(key, pclass or default_provider)
                ev = ops.read_events_stream(spark, sf_dir)
                n, wall, srows, smb = run_measured(mk(ev), mode)
                print(
                    f"| {label} | {pname} | {n} | {wall:.1f} | "
                    f"{n_in / wall:,.0f} | {srows:,} | {smb:.1f} |",
                    flush=True,
                )
        spark.conf.set(key, default_provider)


if __name__ == "__main__":
    main()
