"""with_ordinal strategy equivalence + determinism."""

from pyspark.sql import functions as F

from semantic_cpp_spark.indexing import IDX, normalize_index, rebase_index, with_ordinal


def _mk(spark, n=1000):
    # sparse, shuffled keys to stress bucket/range assignment
    return spark.range(n).select(
        (F.col("id") * 37 % n * 1000 + F.col("id")).alias("key"),
        F.col("id").alias("payload"),
    )


def test_strategies_agree(spark):
    df = _mk(spark)
    expect = {
        r["key"]: r[IDX]
        for r in with_ordinal(df, ["key"], strategy="window").collect()
    }
    for strategy in ("bucket", "range"):
        got = {
            r["key"]: r[IDX]
            for r in with_ordinal(df, ["key"], strategy=strategy).collect()
        }
        assert got == expect, strategy


def test_ordinal_dense_and_ordered(spark):
    df = _mk(spark, 500)
    out = with_ordinal(df, ["key"]).collect()
    idxs = sorted(r[IDX] for r in out)
    assert idxs == list(range(500))
    by_key = sorted(out, key=lambda r: r["key"])
    assert [r[IDX] for r in by_key] == list(range(500))


def test_rebase_after_filter(spark):
    df = with_ordinal(_mk(spark, 100), ["key"])
    kept = df.filter(F.col(IDX) % 3 == 0)
    out = rebase_index(kept)
    idxs = sorted(r[IDX] for r in out.collect())
    assert idxs == list(range(34))


def test_normalize_wraps_negative(spark):
    df = spark.createDataFrame(
        [(-3, "a"), (-2, "b"), (-1, "c"), (0, "d")], f"{IDX} long, value string"
    )
    out = {r["value"]: r[IDX] for r in normalize_index(df).collect()}
    # n=4: -3 -> 1, -2 -> 2, -1 -> 3, 0 -> 0
    assert out == {"a": 1, "b": 2, "c": 3, "d": 0}


def test_dense_key_fast_path(spark):
    """A dense 0-based (or offset) integer key becomes the ordinal via a
    pure map — and still agrees with the window strategy."""
    from pyspark.sql import functions as F

    df = spark.range(100).select((F.col("id") + 7).alias("key"), F.col("id").alias("p"))
    out = with_ordinal(df, ["key"], strategy="auto")
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["key"]: r[IDX] for r in out.collect()}
    expect = {
        r["key"]: r[IDX]
        for r in with_ordinal(df, ["key"], strategy="window").collect()
    }
    assert got == expect


def test_range_quantile_bounds_path(spark):
    """r16: a named ASC numeric leading key takes the deterministic
    quantile-bounds range path — literal boundaries, no persist — and
    must agree with the window ground truth on doubles with duplicates,
    nulls (first) and NaN (last), with string tiebreaks ordered within
    equal keys."""
    import math

    rows = []
    vals = [3.5, 1.0, None, float("nan"), 2.25, 3.5, -1.5, None, 0.0, 2.25]
    for i, v in enumerate(vals * 30):
        rows.append((v, f"t{i:04d}"))
    df = spark.createDataFrame(rows, "k double, tie string")
    def _norm(v):
        # nan != nan in Python tuple equality; normalise to a sentinel
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return v

    got = [
        (_norm(r["k"]), r["tie"])
        for r in sorted(
            with_ordinal(df, ["k", "tie"], strategy="range").collect(),
            key=lambda r: r[IDX],
        )
    ]
    expect = [
        (_norm(r["k"]), r["tie"])
        for r in sorted(
            with_ordinal(df, ["k", "tie"], strategy="window").collect(),
            key=lambda r: r[IDX],
        )
    ]

    def _key(t):
        k = t[0]
        return (
            0 if k is None else (2 if k == "NaN" else 1),
            -math.inf if k is None or k == "NaN" else k,
            t[1],
        )

    assert got == expect
    assert got == sorted(got, key=_key)
    # the quantile path must not persist anything (no range cache entry)
    plan = (
        with_ordinal(df, ["k", "tie"], strategy="range")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "InMemoryTableScan" not in plan


def test_range_quantile_bounds_deterministic(spark):
    """two independent constructions produce identical ordinals (the
    boundaries are frozen literals, not a nondeterministic sample)."""
    from semantic_cpp_spark.indexing import release_ordinal_caches

    df = spark.range(2000).select(
        (F.col("id") % 97 * 1.5).alias("k"), F.col("id").alias("tie")
    )
    a = {r["tie"]: r[IDX] for r in with_ordinal(df, ["k", "tie"], strategy="range").collect()}
    release_ordinal_caches()
    b = {r["tie"]: r[IDX] for r in with_ordinal(df, ["k", "tie"], strategy="range").collect()}
    assert a == b
