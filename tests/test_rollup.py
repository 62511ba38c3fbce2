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


# -- mergeable variance state ------------------------------------------------

def _collect_var(df):
    return {
        r["k"]: (r["st_n"], r["st_sum"], int(r["st_ssq"]))
        for r in df.collect()
    }


def test_var_merge_equals_direct_state(spark):
    a = _frame(spark, [("x", 5), ("x", -2), ("y", 7)])
    b = _frame(spark, [("x", 100), ("z", 0)])
    c = _frame(spark, [("y", -50), ("y", 3)])
    full = a.unionByName(b).unionByName(c)
    direct = _collect_var(rollup.var_state(full, ["k"], F.col("v")))
    merged = _collect_var(
        rollup.merge_var_states(
            [rollup.var_state(d, ["k"], F.col("v")) for d in (a, b, c)],
            ["k"],
        )
    )
    assert merged == direct
    assert direct["x"] == (3, 103, 25 + 4 + 10000)
    assert direct["z"] == (1, 0, 0)


def test_var_finalize_matches_spark_var_pop(spark):
    rows = [("x", v) for v in (5, -2, 100, 17, 17)] + [
        ("y", v) for v in (7, -50, 3)
    ]
    df = _frame(spark, rows)
    got = {
        r["k"]: r["var_pop"]
        for r in rollup.finalize_var(
            rollup.var_state(df, ["k"], F.col("v")), ["k"]
        ).collect()
    }
    ref = {
        r["k"]: r["vp"]
        for r in df.groupBy("k").agg(F.var_pop("v").alias("vp")).collect()
    }
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-12), k


def test_var_state_carries_chans_m2_exactly(spark):
    """The integer sufficient statistics carry EXACTLY Chan's (n, mean,
    M2) combiner state (reference collector.h:695-715): merging two
    states via M2 = M2a + M2b + d^2*na*nb/n must agree with
    M2 = ssq - s^2/n computed from the merged integer state."""
    a_vals = [5, -2, 9, 9]
    b_vals = [100, 3]

    def chan(vals):
        n = len(vals)
        mean = sum(vals) / n
        m2 = sum((v - mean) ** 2 for v in vals)
        return n, mean, m2

    na, ma, m2a = chan(a_vals)
    nb, mb, m2b = chan(b_vals)
    d = mb - ma
    n = na + nb
    m2_chan = m2a + m2b + d * d * na * nb / n

    sa = rollup.var_state(
        _frame(spark, [("x", v) for v in a_vals]), ["k"], F.col("v")
    )
    sb = rollup.var_state(
        _frame(spark, [("x", v) for v in b_vals]), ["k"], F.col("v")
    )
    st = rollup.merge_var_states([sa, sb], ["k"]).collect()[0]
    m2_int = int(st["st_ssq"]) - st["st_sum"] ** 2 / st["st_n"]
    assert m2_int == pytest.approx(m2_chan, rel=1e-12)


def test_merge_var_states_rejects_empty(spark):
    with pytest.raises(ValueError):
        rollup.merge_var_states([], ["k"])

# -- mergeable quantile-sketch state ------------------------------------------


def _collect_qs(df):
    return {(r["k"], r["st_qv"]): r["st_cnt"] for r in df.collect()}


def test_qsketch_merge_equals_direct_state(spark):
    import random

    rng = random.Random(7)
    rows = [("x", rng.randint(-100000, 5000000)) for _ in range(300)] + [
        ("y", rng.randint(0, 255)) for _ in range(80)
    ]
    full = _frame(spark, rows)
    a = full.filter(F.pmod(F.col("v"), F.lit(3)) == 0)
    b = full.filter(F.pmod(F.col("v"), F.lit(3)) == 1)
    c = full.filter(F.pmod(F.col("v"), F.lit(3)) == 2)
    direct = _collect_qs(rollup.qsketch_state(full, ["k"], F.col("v")))
    merged = _collect_qs(
        rollup.merge_qsketch_states(
            [rollup.qsketch_state(d, ["k"], F.col("v")) for d in (a, b, c)],
            ["k"],
        )
    )
    assert merged == direct


def test_qsketch_quantize_is_exact_below_2b1_and_monotone(spark):
    # |v| < 2^(QSKETCH_BITS+1) must pass through EXACTLY; quantization
    # must preserve order across the whole domain incl. negatives
    vals = [-300000, -257, -256, -255, -1, 0, 1, 255, 256, 257, 10**12]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = [
        r["q"]
        for r in df.select(rollup._quantize("v").alias("q"), "v")
        .orderBy("v")
        .collect()
    ]
    for v, q in zip(sorted(vals), out):
        if abs(v) < 256:
            assert q == v, (v, q)
        else:
            assert abs(q) <= abs(v) and (q < 0) == (v < 0), (v, q)
    assert out == sorted(out)


def test_qsketch_relative_error_bound(spark):
    """DDSketch-grade guarantee: every quantile answer is within
    2^-QSKETCH_BITS relative error of an EXACT lower quantile."""
    import random

    rng = random.Random(41)
    vals = sorted(rng.randint(1, 10**9) for _ in range(5000))
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v long")
    st = rollup.qsketch_state(df, ["k"], F.col("v"))
    row = rollup.qsketch_quantiles(st, ["k"], [50, 95, 99]).collect()[0]
    assert row["n"] == 5000
    for p in (50, 95, 99):
        exact = vals[-(-5000 * p // 100) - 1]  # ceil rank, 1-indexed
        got = row[f"p{p}"]
        assert abs(got - exact) <= exact * 2 ** -rollup.QSKETCH_BITS + 1, (
            p,
            got,
            exact,
        )


def test_qsketch_state_is_bounded_regardless_of_cardinality(spark):
    # 200k distinct values -> bounded bins (<= ~14.6k; in practice far
    # fewer: few occupied octaves), the whole point vs exact quantiles
    df = spark.range(0, 200000).select(
        F.lit("k").alias("k"), (F.col("id") * 7919 + 13).alias("v")
    )
    n_bins = rollup.qsketch_state(df, ["k"], F.col("v")).count()
    assert n_bins < 14600, n_bins


def test_qsketch_merge_rejects_empty(spark):
    with pytest.raises(ValueError, match="at least one"):
        rollup.merge_qsketch_states([], ["k"])


def test_qsketch_weighted_equals_row_replication(spark):
    """Weighted state must equal the state of the row-replicated frame
    bin-for-bin — the definition of integer weights — and weighted
    quantiles follow."""
    rows = [("k", 10, 3), ("k", 5000, 2), ("k", 7, 5)]
    wdf = spark.createDataFrame(rows, "k string, v long, w long")
    rep = spark.createDataFrame(
        [("k", v) for (_, v, w) in rows for _ in range(w)],
        "k string, v long",
    )
    ws = _collect_qs(
        rollup.qsketch_state(wdf, ["k"], F.col("v"), weight=F.col("w"))
    )
    rs = _collect_qs(rollup.qsketch_state(rep, ["k"], F.col("v")))
    assert ws == rs
    wq = rollup.qsketch_quantiles(
        rollup.qsketch_state(wdf, ["k"], F.col("v"), weight=F.col("w")),
        ["k"],
        [50],
    ).collect()[0]
    assert wq["n"] == 10 and wq["p50"] == 7  # rank ceil(5) falls in the 7s


def test_qsketch_rank_probe_matches_exact_cdf(spark):
    """rank_ppm at a probe value must equal the exact CDF of the
    QUANTIZED distribution — and be within the bin-width bound of the
    raw CDF; negatives tagged with 'm'."""
    import random

    rng = random.Random(5)
    vals = [rng.randint(-1000, 10**8) for _ in range(3000)]
    df = _frame(spark, [("k", v) for v in vals])
    st = rollup.qsketch_state(df, ["k"], F.col("v"))
    probes = [-500, 100, 10**6, 10**8 + 5]
    row = rollup.qsketch_rank(st, ["k"], probes).collect()[0]
    assert row["n"] == 3000
    qs = sorted(rollup.quantize_py(v) for v in vals)
    import bisect

    for v in probes:
        tag = str(v).replace("-", "m")
        got = row[f"rank_{tag}_ppm"]
        exact_q = bisect.bisect_right(qs, rollup.quantize_py(v))
        assert got == (exact_q * 1000000) // 3000, (v, got, exact_q)
    assert row[f"rank_{10**8 + 5}_ppm"] == 1000000  # above max -> full mass


def test_qsketch_quantize_hypothesis_monotone_and_bounded(spark):
    """Property: quantization is order-preserving, magnitude-shrinking
    (toward zero), sign-preserving, and within 2^-B relative of the
    input — across the whole int64-ish domain including negatives.
    Checked via the pure-Python twin (pinned equal to the Column form
    in test_sliding_quantiles_error_band_and_binning_parity)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.integers(min_value=-(2**62), max_value=2**62),
    )
    def prop(a, b):
        qa, qb = rollup.quantize_py(a), rollup.quantize_py(b)
        if a <= b:
            assert qa <= qb
        assert abs(qa) <= abs(a)
        assert (qa < 0) == (a < 0) or qa == 0
        assert abs(a - qa) <= abs(a) * 2 ** -rollup.QSKETCH_BITS

    prop()
