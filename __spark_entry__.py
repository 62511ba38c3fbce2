"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``semantic_cpp_spark``; this module is the thin
driver-facing shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from semantic_cpp_spark import registry
from semantic_cpp_spark.relational import q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-style pricing summary (SURVEY.md §7 M0): pruned+pushed-down
    lineitem scan → one partial+final hash aggregate → tiny sort.
    """
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and the
    Spark-native extensions). Each callable takes (spark, sf_dir) and
    returns a DataFrame whose column names match the oracle exactly."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL equivalents (tables pre-registered as views).
    Keys without an oracle get the driver's weaker rows-only check."""
    return registry.oracle_sql()
