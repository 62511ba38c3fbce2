"""Mergeable aggregate state — the continuous-aggregate / materialized-
view-maintenance primitive (TimescaleDB's hypertable rollups, Druid's
delta ingestion, every incremental OLAP pipeline): compute a per-key
PARTIAL state once, store it, and fold new deltas in WITHOUT rescanning
the already-aggregated history.

The state is the classic commutative monoid (n, sum, min, max): merging
is itself one groupBy with (sum, sum, min, max) — associative and
commutative, so state tables can be merged in any order, any grouping,
any number of increments, and the result is bit-identical to a direct
aggregation over the union of the inputs (exactness requires an exact
value column — int64 cents in the gate query, the decayed-activity
discipline; float sums would make merge order observable in the last
ulp).

100 TB design: agg_state is one map-side-combinable groupBy over the
delta ONLY — the whole point is that history costs zero scan. The state
table is one row per (key) — bounded by key cardinality, not event
count. merge_states unions KB..MB-scale state tables and re-groups;
finalize is a narrow projection. This is what Spark's partial
aggregation does INSIDE one query, exposed as a dataset-level API so it
works ACROSS queries, days, and pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

STATE_COLS = ("st_n", "st_sum", "st_min", "st_max")


def agg_state(df: DataFrame, keys: list[str], value: Column) -> DataFrame:
    """Per-key mergeable state (st_n, st_sum, st_min, st_max) over
    ``value``. One map-side-combinable groupBy; output rows = distinct
    keys in ``df`` (keys absent from a delta simply contribute no row —
    merge_states treats absence as the monoid identity)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("st_n"),
        F.sum(value).cast("long").alias("st_sum"),
        F.min(value).cast("long").alias("st_min"),
        F.max(value).cast("long").alias("st_max"),
    )


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold any number of state tables into one: union + one groupBy
    with (sum, sum, min, max). Associative and commutative — daily
    states can merge into weeks, weeks into months, in any order, and
    equal the state of the concatenated raw data (test-pinned)."""
    if not states:
        raise ValueError("merge_states needs at least one state table")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.sum("st_n").cast("long").alias("st_n"),
        F.sum("st_sum").cast("long").alias("st_sum"),
        F.min("st_min").cast("long").alias("st_min"),
        F.max("st_max").cast("long").alias("st_max"),
    )


def finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Resolve a state table to user-facing aggregates: count, sum,
    min, max, and the derived mean (exact int sum / exact int count,
    rounded to 6dp — the only float in the whole path)."""
    return state.select(
        *keys,
        F.col("st_n").alias("n"),
        F.col("st_sum").alias("total"),
        F.col("st_min").alias("vmin"),
        F.col("st_max").alias("vmax"),
        F.round(
            F.col("st_sum").cast("double") / F.col("st_n").cast("double"), 6
        ).alias("vavg"),
    )


# -- mergeable VARIANCE state (VERDICT r8 #5) --------------------------------
# The reference's own parallel-variance combiner (collector.h:695-715)
# is Chan et al.'s (n, mean, M2) merge:
#     M2 = M2_a + M2_b + delta^2 * n_a*n_b/(n_a+n_b).
# That form is float-path: delta^2*n_a*n_b/(n_a+n_b) is not an integer,
# so merge ORDER leaks into the last ulp — the exact opposite of what a
# distributed, merge-in-any-order state table needs. The
# integer-sufficient-statistics formulation carries the SAME information
# ((n, Σx, Σx²) determines (n, mean, M2) via M2 = Σx² − (Σx)²/n) but
# every component is an exact integer that merges by ADDITION — order-
# independent, bit-identical to direct aggregation, engine-replayable.
# Σx² rides in decimal(38,0) (its int64 headroom is what overflows
# first: cents² values reach 1e10, so int64 dies near 1e9 rows/key
# while decimal38 holds past any real key cardinality).

VAR_STATE_COLS = ("st_n", "st_sum", "st_ssq")

# -- mergeable QUANTILE state (the last gap in the mergeable family) ---------
# count/sum/min/max, variance, HLL-distinct and CMS-frequency all have
# mergeable forms above / in pipeline.dedup; quantiles are the remaining
# aggregate every rollup system ships (DDSketch in Datadog, HdrHistogram
# in Cassandra/Dropwizard, t-digest in Elasticsearch). The sketch here is
# the HdrHistogram/DDSketch shape with an EXACTNESS twist: values bucket
# by "keep the top QSKETCH_BITS+1 significant bits, zero the rest", i.e.
# the bucket key IS the bucket's lower bound
#     q(v) = sign(v) * ((|v| >> s) << s),  s = max(0, msb(|v|) - B)
# computed with integer shifts and msb(|v|) = length(bin(|v|)) - 1 — both
# Spark and DuckDB evaluate bin()/shift identically, so the binning (and
# therefore every downstream hash) replays exactly in SQL, unlike
# DDSketch's float log-gamma binning where the last-ulp of ln() would
# make bucket boundaries engine-dependent. Guarantees are DDSketch-grade:
# relative error ≤ 2^-B (B=7 → 0.79%), values with |v| < 2^(B+1) exact,
# quantization monotone (order-preserving, negatives mirrored), state
# ≤ 2·(63−B)·2^B + 2^(B+1) ≈ 14.6k bins per key REGARDLESS of row count.
#
# 100 TB design: state building is one map-side-combinable groupBy over
# the delta only; state rows = keys × occupied bins (bounded above, and
# in practice ~hundreds — real value distributions occupy few octaves).
# Merging is union + one groupBy SUM — associative, commutative, pure
# integer addition, so merge(state(A), state(B)) ≡ state(A ∪ B)
# bit-for-bit in any order or grouping (test-pinned). Quantile queries
# never touch raw data: one key-partitioned window cumsum over ≤14.6k
# bins per key with exact integer rank thresholds ceil(n·p/100) =
# (n·p + 99) div 100.

QSKETCH_BITS = 7
QSKETCH_STATE_COLS = ("st_qv", "st_cnt")


def _quantize(name: str) -> Column:
    """Exact log2 bucketing of int64 column ``name``: keep the top
    QSKETCH_BITS+1 significant bits of |v|, re-apply the sign. Pure
    integer ops (string-length msb + shifts) — replays bit-identically
    in DuckDB; see module comment."""
    b = QSKETCH_BITS
    mag = f"abs({name})"
    s = f"cast(length(bin({mag})) - {b + 1} as int)"
    return F.expr(
        f"case when {mag} < {1 << (b + 1)} then {name} "
        f"when {name} < 0 then -shiftleft(shiftright({mag}, {s}), {s}) "
        f"else shiftleft(shiftright({mag}, {s}), {s}) end"
    ).cast("long")


def qsketch_state(
    df: DataFrame,
    keys: list[str],
    value: Column,
    weight: Column | None = None,
) -> DataFrame:
    """Per-key mergeable quantile-sketch state (st_qv, st_cnt) over an
    exact integer ``value`` (cents / micro-units). One map-side-
    combinable groupBy over the delta; output rows = keys × occupied
    bins (≤ ~14.6k bins at B=7 no matter how many input rows).
    ``weight`` (exact non-negative int64 — row multiplicity, token
    counts, pre-aggregated tallies) makes st_cnt the weight sum, and
    qsketch_quantiles' rank thresholds become weighted quantiles with
    the same all-integer exactness."""
    binned = df.select(
        *keys,
        value.cast("long").alias("__qs_v"),
        (weight if weight is not None else F.lit(1))
        .cast("long")
        .alias("__qs_w"),
    ).select(*keys, _quantize("__qs_v").alias("st_qv"), "__qs_w")
    return binned.groupBy(*keys, "st_qv").agg(
        F.sum("__qs_w").cast("long").alias("st_cnt")
    )


def merge_qsketch_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold quantile-sketch states: union + one groupBy SUM per (key,
    bin). Pure integer addition — order/grouping can never show in the
    result (test-pinned against the direct state of the concatenation)."""
    if not states:
        raise ValueError("merge_qsketch_states needs at least one state table")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys, "st_qv").agg(
        F.sum("st_cnt").cast("long").alias("st_cnt")
    )


def quantize_py(v: int, b: int = QSKETCH_BITS) -> int:
    """Pure-Python twin of _quantize (single source — streaming.ops
    delegates here; pinned equal to the Column form in tests): keep the
    top b+1 significant bits of |v|, re-apply the sign."""
    a = abs(v)
    if a < (1 << (b + 1)):
        return v
    s = a.bit_length() - 1 - b
    q = (a >> s) << s
    return -q if v < 0 else q


def qsketch_rank(
    state: DataFrame, keys: list[str], probe_values: list[int]
) -> DataFrame:
    """Inverse quantile (CDF probe) on a sketch state: for each key and
    each probe value v, rank_<v>_ppm = (mass in bins ≤ quantize(v)) ·
    10⁶ div n — "what fraction of the distribution sits at or below v",
    exact integers end to end, resolution bounded by the bin width at v
    (≤ 2^-QSKETCH_BITS relative). One groupBy with conditional sums
    over the (small) bin table — the monitoring-side twin of
    qsketch_quantiles (alert when rank(SLO-threshold) drops below
    99%)."""
    aggs = [F.sum("st_cnt").cast("long").alias("n")]
    for v in probe_values:
        qv = quantize_py(int(v))
        tag = str(v).replace("-", "m")
        aggs.append(
            F.expr(
                f"(sum(case when st_qv <= {qv} then st_cnt else 0 end)"
                f" * 1000000) div sum(st_cnt)"
            ).alias(f"rank_{tag}_ppm")
        )
    return state.groupBy(*keys).agg(*aggs)


def qsketch_quantiles(
    state: DataFrame, keys: list[str], percents: list[int]
) -> DataFrame:
    """Resolve a sketch state to lower-quantile estimates at integer
    ``percents`` (e.g. [50, 95, 99]): per key, the smallest bin whose
    running count reaches ceil(n·p/100), computed with the exact
    integer threshold (n·p + 99) div 100 — no float rank anywhere. One
    key-partitioned window over the (small) bin table; answers carry
    the DDSketch-grade ≤2^-QSKETCH_BITS relative-error bound."""
    from pyspark.sql import Window

    w_cum = Window.partitionBy(*keys).orderBy("st_qv")
    w_all = Window.partitionBy(*keys)
    enriched = state.select(
        *keys,
        "st_qv",
        F.sum("st_cnt").over(w_cum).alias("__cum"),
        F.sum("st_cnt").over(w_all).alias("__n"),
    )
    aggs = []
    for p in percents:
        thr = F.expr(f"(__n * {int(p)} + 99) div 100")
        aggs.append(
            F.min(F.when(F.col("__cum") >= thr, F.col("st_qv"))).alias(f"p{int(p)}")
        )
    return enriched.groupBy(*keys).agg(
        F.max("__n").alias("n"), *aggs
    )


def var_state(df: DataFrame, keys: list[str], value: Column) -> DataFrame:
    """Per-key mergeable variance state (st_n, st_sum, st_ssq) over an
    EXACT INTEGER ``value`` (cents / micro-units — the decayed-activity
    discipline; float inputs must quantize first or merge order shows).
    One map-side-combinable groupBy over the delta only."""
    d = value.cast("decimal(19,0)")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("st_n"),
        F.sum(value).cast("long").alias("st_sum"),
        F.sum((d * d).cast("decimal(38,0)")).cast("decimal(38,0)").alias("st_ssq"),
    )


def merge_var_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold variance state tables: union + one groupBy of three sums —
    associative, commutative, exact (pure integer addition), so
    merge(state(A), state(B)) ≡ state(A ∪ B) bit-for-bit, in any
    grouping or order (test-pinned, including against Chan's float M2
    merge and Spark's var_pop)."""
    if not states:
        raise ValueError("merge_var_states needs at least one state table")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.sum("st_n").cast("long").alias("st_n"),
        F.sum("st_sum").cast("long").alias("st_sum"),
        F.sum("st_ssq").cast("decimal(38,0)").alias("st_ssq"),
    )


def finalize_var(state: DataFrame, keys: list[str]) -> DataFrame:
    """Resolve variance state to (n, total, var_pop): the population
    variance as the exact integer rational (n·Σx² − (Σx)²) / n², with
    ONE decimal→double conversion per operand at the end — numerator
    and denominator are exact integers (decimal38), each converts
    round-to-nearest identically on every engine, and only then does
    the single double division run. Variance is in ``value`` units
    squared; rescale/round in the caller."""
    n = F.col("st_n").cast("decimal(38,0)")
    s = F.col("st_sum").cast("decimal(38,0)")
    num = (n * F.col("st_ssq") - s * s).cast("decimal(38,0)")
    den = (n * n).cast("decimal(38,0)")
    return state.select(
        *keys,
        F.col("st_n").alias("n"),
        F.col("st_sum").alias("total"),
        (num.cast("double") / den.cast("double")).alias("var_pop"),
    )
