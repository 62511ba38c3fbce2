"""Pins for the mergeable-aggregate-state operator (operators.rollup):
the monoid identity merge(state(A), state(B)) == state(A ∪ B) in any
order and grouping — the property that makes incremental rollup
maintenance correct."""

import pytest
from pyspark.sql import functions as F

from semantic_cpp_spark.operators import rollup


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _collect_state(df):
    return {
        r["k"]: (r["st_n"], r["st_sum"], r["st_min"], r["st_max"])
        for r in df.collect()
    }


def test_merge_equals_direct_state(spark):
    a = _frame(spark, [("x", 5), ("x", -2), ("y", 7)])
    b = _frame(spark, [("x", 100), ("z", 0)])
    c = _frame(spark, [("y", -50), ("y", 3)])
    full = a.unionByName(b).unionByName(c)
    direct = _collect_state(rollup.agg_state(full, ["k"], F.col("v")))
    merged = _collect_state(
        rollup.merge_states(
            [rollup.agg_state(d, ["k"], F.col("v")) for d in (a, b, c)], ["k"]
        )
    )
    assert merged == direct
    assert direct["x"] == (3, 103, -2, 100)
    assert direct["y"] == (3, -40, -50, 7)
    assert direct["z"] == (1, 0, 0, 0)


def test_merge_is_order_and_grouping_invariant(spark):
    a = _frame(spark, [("x", 1), ("y", 2)])
    b = _frame(spark, [("x", 3)])
    c = _frame(spark, [("x", 5), ("y", -9)])
    sa, sb, sc = (rollup.agg_state(d, ["k"], F.col("v")) for d in (a, b, c))
    m1 = _collect_state(rollup.merge_states([sa, sb, sc], ["k"]))
    m2 = _collect_state(rollup.merge_states([sc, sa, sb], ["k"]))
    # associativity: merge(merge(a,b), c) — a merged state IS a state
    m3 = _collect_state(
        rollup.merge_states([rollup.merge_states([sa, sb], ["k"]), sc], ["k"])
    )
    assert m1 == m2 == m3


def test_absent_key_is_identity(spark):
    # a delta with no rows for a key leaves that key's state untouched
    a = _frame(spark, [("x", 4), ("y", 8)])
    b = _frame(spark, [("y", 1)])
    sa = rollup.agg_state(a, ["k"], F.col("v"))
    sb = rollup.agg_state(b, ["k"], F.col("v"))
    merged = _collect_state(rollup.merge_states([sa, sb], ["k"]))
    assert merged["x"] == (1, 4, 4, 4)
    assert merged["y"] == (2, 9, 1, 8)


def test_finalize_outputs_exact_mean(spark):
    a = _frame(spark, [("x", 1), ("x", 2)])
    out = {
        r["k"]: r
        for r in rollup.finalize(
            rollup.agg_state(a, ["k"], F.col("v")), ["k"]
        ).collect()
    }
    assert out["x"]["n"] == 2
    assert out["x"]["total"] == 3
    assert out["x"]["vavg"] == pytest.approx(1.5)


def test_merge_states_empty_list_raises(spark):
    with pytest.raises(ValueError, match="at least one"):
        rollup.merge_states([], ["k"])


# -- mergeable HLL register states (dedup.hll_state/merge/finalize) ---------

from semantic_cpp_spark.pipeline import dedup


def _events_frame(spark, rows):
    return spark.createDataFrame(rows, "g string, uid long")


def _regs(df):
    return {(r["g"], r["idx"]): r["m"] for r in df.collect()}


def test_hll_merge_equals_direct_state(spark):
    rows = [("h1", i % 40) for i in range(200)] + [
        ("h2", i % 7) for i in range(50)
    ]
    full = _events_frame(spark, rows)
    a = full.filter(F.col("uid") % 2 == 0)
    b = full.filter(F.col("uid") % 2 == 1)
    direct = _regs(dedup.hll_state(full, ["g"], F.col("uid")))
    merged = _regs(
        dedup.hll_merge(
            [
                dedup.hll_state(a, ["g"], F.col("uid")),
                dedup.hll_state(b, ["g"], F.col("uid")),
            ],
            ["g"],
        )
    )
    assert merged == direct


def test_hll_merge_is_idempotent_and_overlap_safe(spark):
    # the property plain counts cannot have: re-merging the SAME or an
    # OVERLAPPING increment changes nothing — at-least-once safe
    full = _events_frame(spark, [("g", i) for i in range(100)])
    s = dedup.hll_state(full, ["g"], F.col("uid"))
    assert _regs(dedup.hll_merge([s, s], ["g"])) == _regs(s)
    first70 = dedup.hll_state(
        full.filter(F.col("uid") < 70), ["g"], F.col("uid")
    )
    last60 = dedup.hll_state(
        full.filter(F.col("uid") >= 40), ["g"], F.col("uid")
    )  # uids 40-69 overlap
    assert _regs(dedup.hll_merge([first70, last60], ["g"])) == _regs(s)


def test_hll_finalize_matches_single_group_hll_distinct(spark):
    # the per-group estimator must equal hll_distinct's single-group
    # epilogue on the same data
    full = _events_frame(spark, [("only", i * 13) for i in range(500)])
    via_state = dedup.hll_finalize(
        dedup.hll_state(full, ["g"], F.col("uid")), ["g"]
    ).collect()[0]["hll_count"]
    direct = dedup.hll_distinct(full, F.col("uid")).collect()[0]["hll_count"]
    assert via_state == direct
    # and the estimate sits in the ~3.3% band around the exact 500
    assert abs(via_state - 500) / 500 < 0.12


def test_hll_state_validates_n_regs(spark):
    df = _events_frame(spark, [("g", 1)])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="power of two"):
        dedup.hll_state(df, ["g"], F.col("uid"), n_regs=1000)


def test_cms_merge_equals_direct_and_estimates_agree(spark):
    # cms(A) + cms(B) must equal cms(A u B) cell-for-cell, and the
    # point estimates through the merged sketch match the direct ones
    full = spark.createDataFrame(
        [(i, i % 13) for i in range(400)], "rid long, uid long"
    )
    a = full.filter(F.col("rid") % 2 == 0)
    b = full.filter(F.col("rid") % 2 == 1)
    direct = {
        (r["r"], r["c"]): r["cnt"]
        for r in dedup.cms_build(full, F.col("uid")).collect()
    }
    merged = {
        (r["r"], r["c"]): r["cnt"]
        for r in dedup.cms_merge(
            [
                dedup.cms_build(a, F.col("uid")),
                dedup.cms_build(b, F.col("uid")),
            ]
        ).collect()
    }
    assert merged == direct


def test_cms_merge_empty_list_raises(spark):
    with pytest.raises(ValueError, match="at least one"):
        dedup.cms_merge([])
