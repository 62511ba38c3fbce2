"""Per-query scale-factor step-up measurement (the SCALING.md tables).

Runs the named registry queries at two SF dirs (default: the driver's
sf0.1 fixtures and the regenerated .localdata/sf1.0 — see
scripts/gen_fixtures.py) with one warm-up then one timed collect each,
in a single warm local[32] session — the methodology every round-6
step-up row was measured with.

Usage:
    python scripts/stepup.py q1 [q2 ...]           # named queries
    python scripts/stepup.py --all-new <prefix>    # every query name with prefix
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIRS = ["/root/testdata/sf0.1", "/root/repo/.localdata/sf1.0"]


def main() -> None:
    import __spark_entry__ as e
    from semantic_cpp_spark.session import get_spark

    args = sys.argv[1:]
    qs = e.queries()
    if args and args[0] == "--all-new":
        names = [n for n in qs if n.startswith(args[1])]
    else:
        names = args
    unknown = [n for n in names if n not in qs]
    if unknown or not names:
        raise SystemExit(f"unknown or missing query names: {unknown or '(none given)'}")

    spark = get_spark(
        "stepup",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in SF_DIRS:
        print(f"== {sf_dir}")
        for name in names:
            qs[name](spark, sf_dir).collect()  # warm-up
            t0 = time.time()
            n = len(qs[name](spark, sf_dir).collect())
            print(f"{name}: {n} rows / {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
