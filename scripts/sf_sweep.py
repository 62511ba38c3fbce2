"""Full-registry timing sweep at one SF dir (VERDICT r14 item 4: the
systematic heavy tail — the O(L²) projection-collapse class was
invisible below sf10, and the 9-gate ad-hoc sample found 2 hits, so
the top-of-cost cohort gets a measured step-up row every round).

Times EVERY registry gate (or a named subset) with one warm-up + one
timed run in a single warm local[32] session and writes a JSON dict
{name: {"sec": t, "rows": n}} for downstream ranking / step-up tables.
Failures are recorded as {"err": ...} and don't stop the sweep.

Usage:
    python scripts/sf_sweep.py <sf_dir> <out.json> [name ...]
    SPARK_GRAFT_SWEEP_WARMUP=0  # skip the warm-up pass (rankings only)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]

    import __spark_entry__ as e
    from semantic_cpp_spark.session import get_spark

    qs = e.queries()
    names = only or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")

    spark = get_spark(
        "sf_sweep",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    warmup = os.environ.get("SPARK_GRAFT_SWEEP_WARMUP", "1") != "0"

    results: dict[str, dict] = {}
    for i, name in enumerate(names):
        try:
            if warmup:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            # noop sink, not count(): count() lets Catalyst prune the
            # expensive computed columns out of the plan, which is
            # exactly the cost this sweep exists to rank.
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 2)
            results[name] = {"sec": dt}
            print(f"[{i + 1}/{len(names)}] {name}: {dt}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            results[name] = {"err": str(exc)[:300]}
            print(f"[{i + 1}/{len(names)}] {name}: ERR {str(exc)[:120]}", flush=True)
        # write-through so a killed sweep still leaves the prefix
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
