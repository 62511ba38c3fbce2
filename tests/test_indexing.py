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
