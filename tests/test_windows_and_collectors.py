"""Count-window and grouping-collector semantics (reference semantic.h:1595-1643,
collector.h:1065-2203)."""

from pyspark.sql import functions as F

from semantic_cpp_spark.operators import collectors, windows
from semantic_cpp_spark.sources import from_container


def _win_map(df):
    return {
        r["win_start"]: list(r["values"]) for r in df.collect()
    }


def test_tumble_partial_last_window(spark):
    s = from_container(spark, [1, 2, 3, 4, 5]).to_df()
    got = _win_map(windows.tumble(s, 2))
    assert got == {0: [1, 2], 2: [3, 4], 4: [5]}


def test_slide_overlap_and_partial(spark):
    """slide(3, 2) over 0..6: windows [0,3),[2,5),[4,7) per the reference's
    start+=step loop (semantic.h:1595-1643)."""
    s = from_container(spark, [10, 11, 12, 13, 14, 15, 16]).to_df()
    got = _win_map(windows.slide(s, 3, 2))
    assert got == {
        0: [10, 11, 12],
        2: [12, 13, 14],
        4: [14, 15, 16],
        6: [16],
    }


def test_slide_step_larger_than_size_gaps(spark):
    s = from_container(spark, [1, 2, 3, 4, 5, 6]).to_df()
    got = _win_map(windows.slide(s, 1, 3))
    assert got == {0: [1], 3: [4]}


def test_window_aggregate(spark):
    s = from_container(spark, [1.0, 2.0, 3.0, 4.0, 5.0]).to_df()
    w = windows.tumble(s, 2)
    got = {
        r["win_start"]: (r["sum"], r["win_len"])
        for r in windows.window_aggregate(w, "sum").collect()
    }
    assert got == {0: (3.0, 2), 2: (7.0, 2), 4: (5.0, 1)}


def test_group_collect_encounter_order(spark):
    """useGroup groups in encounter order (collector.h:1065-1093)."""
    s = from_container(spark, ["a1", "b1", "a2", "b2", "a3"]).to_df()
    grouped = collectors.group_collect(s, F.substring(F.col("value"), 1, 1))
    got = {r["key"]: list(r["values"]) for r in grouped.collect()}
    assert got == {"a": ["a1", "a2", "a3"], "b": ["b1", "b2"]}


def test_partition_chunks_and_singleton_floor(spark):
    s = from_container(spark, [1, 2, 3, 4, 5]).to_df()
    got = {
        r["chunk"]: list(r["values"])
        for r in collectors.partition_chunks(s, 2).collect()
    }
    assert got == {0: [1, 2], 1: [3, 4], 2: [5]}
    # size<=1 → singletons (collector.h:2098-2136)
    got1 = {
        r["chunk"]: list(r["values"])
        for r in collectors.partition_chunks(s, 0).collect()
    }
    assert got1 == {i: [v] for i, v in enumerate([1, 2, 3, 4, 5])}


def test_frequency_profile(spark):
    """useFrequency: positional occurrence profile (collector.h:1805-1906)."""
    s = from_container(spark, ["x", "y", "x", "x", "y"]).to_df()
    prof = {
        r["value"]: (list(r["positions"]), r["total"])
        for r in collectors.frequency_profile(s, F.col("value")).collect()
    }
    assert prof == {"x": ([0, 2, 3], 5), "y": ([1, 4], 5)}


def test_mode_deterministic_tiebreak(spark):
    s = from_container(spark, [3.0, 1.0, 3.0, 1.0, 2.0]).to_df()
    got = collectors.mode_df(s, F.col("value")).first()["value"]
    assert got == 1.0  # tie between 1 and 3 → smallest wins (SURVEY §7.4)


def test_capped_collectors_bound_memory(spark):
    """r2-verdict #2: the capped group/frequency variants must cap BEFORE
    collection — the plan shows the row_number filter upstream of the
    collect_list aggregate, so no task materialises an unbounded array on
    a skewed key — while keeping the dropped information as counts."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.indexing import IDX
    from semantic_cpp_spark.operators.collectors import (
        frequency_profile_capped,
        group_collect_capped,
    )

    # skewed key: 90% of rows share one key
    df = spark.range(1000).select(
        F.col("id").alias(IDX),
        F.when(F.col("id") % 10 == 0, F.col("id") % 3 + 1)
        .otherwise(F.lit(0))
        .alias("k"),
        (F.col("id") * 2).alias("value"),
    )
    out = group_collect_capped(df, F.col("k"), 5)
    rows = {r["key"]: (list(r["values"]), r["n_total"]) for r in out.collect()}
    assert rows[0][1] == 900 and len(rows[0][0]) == 5
    # first-5 in encounter (index) order
    assert rows[0][0] == [2, 4, 6, 8, 10]
    assert all(len(v[0]) <= 5 for v in rows.values())

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the cap (row_number <= 5 filter) must sit in the plan feeding the
    # collect_list aggregate — cap-before-collect, not collect-then-slice
    assert "collect_list" in plan and "row_number" in plan
    assert "<= 5" in plan

    freq = frequency_profile_capped(df, F.col("k"), 3)
    frows = {r["value"]: (list(r["positions"]), r["n_value"], r["total"])
             for r in freq.collect()}
    assert frows[0] == ([1, 2, 3], 900, 1000)
    assert frows[1][1] + frows[2][1] + frows[3][1] == 100
