"""SemanticFrame — the fluent (element, index) stream API, Spark-first.

Mirrors the reference's ``Semantic<E>`` chainable surface
(reference semantic.h:980-1591) on top of a DataFrame with columns
``(__idx: long, value: <T>)``. Operators are lazy DataFrame
transformations; Catalyst fuses the chain exactly as the reference's
closure composition does (reference semantic.h:1376-1395), but with
predicate pushdown / column pruning / codegen for free.

Index behavior is reproduced per-operator (SURVEY.md §2.2-2.3):
preserved (map, skip, sub, peek, redirect, translate, take_while),
re-based (filter, flat, distinct, limit, sort, concatenate, drop_while),
negated (reverse — observable as rotation-reversal after to_ordered()).

User callables receive Columns ``(value)`` or ``(value, idx)`` — the
reference's arity-dispatched index-aware lambda pattern
(semantic.h:1342-1357) — and must return a Column, keeping everything
JVM-side; Python-valued callables belong in pandas_udf kernels instead.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from semantic_cpp_spark.indexing import (
    IDX,
    normalize_index,
    rebase_index,
    with_ordinal,
)

VALUE = "value"

ColumnFn = Union[Column, Callable[..., Column]]


def _apply(fn: ColumnFn, value: Column, idx: Column) -> Column:
    """Arity-dispatch an index-aware lambda (reference semantic.h:1342-1357)."""
    if isinstance(fn, Column):
        return fn
    try:
        arity = len(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        arity = 1
    return fn(value, idx) if arity >= 2 else fn(value)


class SemanticFrame:
    """A stream of (value, __idx) pairs backed by a DataFrame.

    ``df`` must contain LongType ``__idx`` and a value column (any Spark
    type — the reference's template parameter E, SURVEY.md §1.3).
    """

    def __init__(self, df: DataFrame, value_col: str = VALUE):
        if value_col != VALUE:
            df = df.withColumnRenamed(value_col, VALUE)
        self.df = df.select(IDX, VALUE)

    # -- plumbing ---------------------------------------------------------

    @property
    def _v(self) -> Column:
        return F.col(VALUE)

    @property
    def _i(self) -> Column:
        return F.col(IDX)

    def _with(self, df: DataFrame) -> "SemanticFrame":
        return SemanticFrame(df)

    def to_df(self) -> DataFrame:
        """The raw (``__idx``, ``value``) DataFrame, unordered."""
        return self.df

    def to_list(self) -> list[Any]:
        """Driver-side materialisation in index order (test helper)."""
        return [r[VALUE] for r in self.df.orderBy(IDX).select(VALUE).collect()]

    def pairs(self) -> list[tuple[int, Any]]:
        return [
            (r[IDX], r[VALUE]) for r in self.df.orderBy(IDX, VALUE).collect()
        ]

    # -- intermediate ops: projections / filters (SURVEY §2.2) ------------

    def map(self, fn: ColumnFn) -> "SemanticFrame":
        """1:1 transform; index preserved (reference semantic.h:1376-1395)."""
        return self._with(
            self.df.select(self._i, _apply(fn, self._v, self._i).alias(VALUE))
        )

    def redirect(self, fn: ColumnFn) -> "SemanticFrame":
        """Rewrite element as f(element, index); index preserved.

        Reference semantic.h:1433-1446 — despite README.md:411 calling it an
        index remap, the code rewrites the ELEMENT (accept(redirector(e,i), i)).
        """
        return self.map(fn)

    def filter(self, pred: ColumnFn) -> "SemanticFrame":
        """Keep matches; indices re-based 0..k (reference semantic.h:1197-1216)."""
        kept = self.df.filter(_apply(pred, self._v, self._i))
        return self._with(rebase_index(kept))

    def flat(self, fn: ColumnFn | None = None) -> "SemanticFrame":
        """Flatten an array-valued element (or extractor result) 1:N;
        indices re-based globally (reference semantic.h:1244-1307).

        Inner-element order is the array order, outer order the parent
        index — reproduced by ranking on (parent __idx, position).
        """
        arr = self._v if fn is None else _apply(fn, self._v, self._i)
        exploded = self.df.select(
            self._i.alias("__pidx"), F.posexplode(arr).alias("__pos", VALUE)
        )
        out = with_ordinal(exploded, ["__pidx", "__pos"], name=IDX)
        return self._with(out.select(IDX, VALUE))

    def flat_map(self, fn: ColumnFn) -> "SemanticFrame":
        """Alias of flat(extractor) — reference flatMap semantic.h:1309-1335."""
        return self.flat(fn)

    def peek(self) -> "SemanticFrame":
        """Observation point. The reference's side-effect consumer
        (semantic.h:1407-1431) has no distributed analogue with exactly-once
        semantics; we expose the stream unchanged (use ``df.observe`` /
        accumulators externally for metrics)."""
        return self

    def distinct(self, key: ColumnFn | None = None) -> "SemanticFrame":
        """First-occurrence dedup; indices re-based (reference
        semantic.h:1122-1164). ``key`` gives dedup under a custom
        equivalence (the comparator overload)."""
        k = self._v if key is None else _apply(key, self._v, self._i)
        tagged = self.df.withColumn("__k", k)
        w = Window.partitionBy("__k").orderBy(IDX)
        kept = (
            tagged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__k", "__rn")
        )
        return self._with(rebase_index(kept))

    def take_while(self, pred: ColumnFn) -> "SemanticFrame":
        """Emit while pred holds then stop; indices preserved (reference
        semantic.h:1532-1554). Needs the global min index failing pred —
        a scalar aggregate broadcast back (two jobs, SURVEY §7.3)."""
        fail = F.when(~_apply(pred, self._v, self._i), self._i)
        cut = self.df.agg(F.min(fail).alias("__cut"))
        out = (
            self.df.crossJoin(F.broadcast(cut))
            .filter(F.col("__cut").isNull() | (self._i < F.col("__cut")))
            .drop("__cut")
        )
        return self._with(out)

    def drop_while(self, pred: ColumnFn) -> "SemanticFrame":
        """Drop the leading run; indices re-based (reference
        semantic.h:1166-1195)."""
        fail = F.when(~_apply(pred, self._v, self._i), self._i)
        cut = self.df.agg(F.min(fail).alias("__cut"))
        out = (
            self.df.crossJoin(F.broadcast(cut))
            .filter(F.col("__cut").isNotNull() & (self._i >= F.col("__cut")))
            .drop("__cut")
        )
        return self._with(rebase_index(out))

    # -- size control / index ops / ordering (SURVEY §2.3) ----------------

    def limit(self, n: int) -> "SemanticFrame":
        """First n by index; re-based (trivially already dense 0..n-1).
        Reference semantic.h:1359-1374 short-circuits; Spark's LimitPushDown
        plays the same role on the sorted stream."""
        return self._with(self.df.filter(self._i < n))

    def skip(self, n: int) -> "SemanticFrame":
        """Drop first n; indices PRESERVED (reference semantic.h:1463-1481
        keeps counting through skipped elements)."""
        return self._with(self.df.filter(self._i >= n))

    def sub(self, start: int, end: int) -> "SemanticFrame":
        """Slice [start, end); indices PRESERVED (reference semantic.h:1512-1530)."""
        return self._with(self.df.filter((self._i >= start) & (self._i < end)))

    def reverse(self) -> "SemanticFrame":
        """Negate indices (reference semantic.h:1448-1461). The observable
        reversal happens at to_ordered()'s modulo-normalisation:
        -i mod n == n-i, so element 0 stays at index 0 and elements 1..n-1
        reverse — a rotation-reversal, pinned by tests."""
        return self._with(self.df.withColumn(IDX, -self._i))

    def translate(self, offset: int) -> "SemanticFrame":
        """Shift all indices by offset (reference semantic.h:1577-1590)."""
        return self._with(self.df.withColumn(IDX, self._i + F.lit(offset)))

    def concatenate(self, other: "SemanticFrame") -> "SemanticFrame":
        """Append another stream; both sides re-numbered with a running
        count across the boundary (reference semantic.h:1012-1120)."""
        left = rebase_index(self.df)
        cnt = left.agg(F.count(F.lit(1)).cast("long").alias("__lc"))
        right = (
            rebase_index(other.df)
            .crossJoin(F.broadcast(cnt))
            .withColumn(IDX, F.col(IDX) + F.col("__lc"))
            .drop("__lc")
        )
        return self._with(left.unionByName(right))

    def parallel(self, n: int | None = None) -> "SemanticFrame":
        """Concurrency declaration → repartition hint. Reference quirk: the
        no-arg overload sets concurrency to 1 (sequential!), semantic.h:
        1397-1400 — mapped to coalesce(1) for fidelity."""
        if n is None:
            return self._with(self.df.coalesce(1))
        return self._with(self.df.repartition(n))

    def sort(self, key: ColumnFn | None = None, ascending: bool = True) -> "SemanticFrame":
        """Stable value sort, ties broken by original index, re-indexed
        0..n-1 (reference semantic.h:1483-1503, tiebreak :477-490).
        Custom comparators become derived sort-key columns."""
        k = self._v if key is None else _apply(key, self._v, self._i)
        tagged = self.df.withColumn("__k", k)
        order = [F.col("__k").asc() if ascending else F.col("__k").desc(), F.col(IDX).asc()]
        out = with_ordinal(tagged, order, name="__idx2")
        return self._with(
            out.select(F.col("__idx2").alias(IDX), F.col(VALUE))
        )

    # -- materialisation seams (SURVEY §1.2) ------------------------------

    def to_ordered(self) -> "SemanticFrame":
        """OrderedCollectable: modulo-normalise indices into [0, n)
        (reference semantic.h:471-517). This is where reverse()/translate()
        become observable."""
        return self._with(normalize_index(self.df))

    def to_unordered(self) -> "SemanticFrame":
        """UnorderedCollectable — no ordering guarantee; identity here
        (a DataFrame is already unordered; reference semantic.h:916-974
        materialises eagerly, which Spark replaces with laziness)."""
        return self

    def cache(self) -> "SemanticFrame":
        return self._with(self.df.cache())

    def to_statistics(self) -> DataFrame:
        """Statistics materialisation (reference semantic.h:600-879): the
        numeric terminal bundle as one row — count, sum, avg (empty→0),
        min, max, range, population variance/stddev, exact median. One
        aggregation pass (median shares the sort buffer)."""
        from semantic_cpp_spark.functions import stats

        v = self._v.cast("double")
        return self.df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("sum"),
            F.coalesce(F.avg(v), F.lit(0.0)).alias("avg"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            (F.max(v) - F.min(v)).alias("range"),
            F.var_pop(v).alias("var_pop"),
            F.stddev_pop(v).alias("stddev_pop"),
            F.percentile(v, F.lit(0.5)).alias("median"),
            stats.skewness_ref(v).alias("skewness"),
            stats.kurtosis_ref(v).alias("kurtosis"),
        )

    def peek_observe(self, name: str, *exprs: Column) -> "SemanticFrame":
        """peek with real observability (reference semantic.h:1407-1431):
        attaches a named `DataFrame.observe` metric evaluated when the
        stream materialises — the exactly-once-safe form of a side-effect
        consumer (collect metrics via the QueryExecutionListener or
        `Observation`)."""
        metrics = exprs or (F.count(F.lit(1)).alias("rows"),)
        return self._with(self.df.observe(name, *metrics))

    # -- terminal finders (SURVEY §2.5 matching/finding) -------------------

    def find_at(self, i: int) -> DataFrame:
        """Element at index i. Negative i wraps python-style WITH modulo:
        (n - (|i| % n)) % n — reference collector.h:883-910 (so
        find_at(-n-1) == find_at(-1)); non-negative short-circuits
        (collector.h:859-881)."""
        if i >= 0:
            return self.df.filter(self._i == i).select(self._v.alias(VALUE))
        n_df = self.df.agg(F.count(F.lit(1)).cast("long").alias("__n"))
        nn = F.col("__n")
        # CASE-guard the modulo: ANSI mode (Spark 4 default) raises on % 0
        # for the empty-stream case.
        tgt = F.when(nn > 0, (nn - (F.lit(-i) % nn)) % nn)
        return (
            self.df.crossJoin(F.broadcast(n_df))
            .filter(self._i == tgt)
            .select(self._v.alias(VALUE))
        )

    def find_any(self) -> DataFrame:
        """useFindAny: genuinely nondeterministic in the reference
        (function.h:88-102 random accept, collector.h:838-857). Spark
        form: first row of whichever partition answers first — `limit(1)`
        with no ordering. Documented nondeterminism (SURVEY §7.4)."""
        return self.df.select(self._v.alias(VALUE)).limit(1)

    def for_each(self, fn) -> int:
        """useForEach (collector.h:450-464): driver-observable side effect
        per element + count. Spark's foreach runs on executors with
        at-least-once semantics; here we fold the rows on the driver in
        index order to honor the reference's sequential contract (use
        ``df.foreach`` directly for fire-and-forget executor-side effects)."""
        rows = self.df.orderBy(IDX).select(VALUE).collect()
        for r in rows:
            fn(r[VALUE])
        return len(rows)

    def to_vector(self) -> list[Any]:
        """toVector (collector.h:2434-2448): values in index order."""
        return self.to_list()

    def to_set(self) -> set:
        """toSet: dedup (collector.h:2463-2474)."""
        return {
            r[VALUE]
            for r in self.df.select(VALUE).distinct().collect()
        }

    def to_map(self, key_fn: ColumnFn, value_fn: ColumnFn) -> dict:
        """toMap(keyFn, valueFn): last write wins per key in index order
        (unordered_map insert-or-assign over the stream)."""
        rows = (
            self.df.select(
                _apply(key_fn, self._v, self._i).alias("k"),
                _apply(value_fn, self._v, self._i).alias("v"),
                self._i,
            )
            .orderBy(IDX)
            .collect()
        )
        return {r["k"]: r["v"] for r in rows}

    def use_out(self, delimiter: str = ", ", prefix: str = "[", suffix: str = "]") -> str:
        """useOut (collector.h:1351-1576): join + print to stdout."""
        s = self.scalar(self.join_str(delimiter, prefix, suffix))
        print(s)
        return s

    def use_error(self, delimiter: str = ", ", prefix: str = "[", suffix: str = "]") -> str:
        """useError (collector.h:1578-1803): join + print to stderr."""
        import sys

        s = self.scalar(self.join_str(delimiter, prefix, suffix))
        print(s, file=sys.stderr)
        return s

    def find_first(self) -> DataFrame:
        return (
            self.df.agg(F.min_by(self._v, self._i).alias(VALUE))
        )

    def find_last(self) -> DataFrame:
        return self.df.agg(F.max_by(self._v, self._i).alias(VALUE))

    def find_minimum(self, key: ColumnFn | None = None) -> DataFrame:
        k = self._v if key is None else _apply(key, self._v, self._i)
        return self.df.agg(F.min_by(self._v, k).alias(VALUE))

    def find_maximum(self, key: ColumnFn | None = None) -> DataFrame:
        k = self._v if key is None else _apply(key, self._v, self._i)
        return self.df.agg(F.max_by(self._v, k).alias(VALUE))

    def all_match(self, pred: ColumnFn) -> DataFrame:
        p = _apply(pred, self._v, self._i)
        return self.df.agg(
            F.coalesce(F.bool_and(p), F.lit(True)).alias(VALUE)
        )

    def any_match(self, pred: ColumnFn) -> DataFrame:
        p = _apply(pred, self._v, self._i)
        return self.df.agg(
            F.coalesce(F.bool_or(p), F.lit(False)).alias(VALUE)
        )

    def none_match(self, pred: ColumnFn) -> DataFrame:
        p = _apply(pred, self._v, self._i)
        return self.df.agg(
            (~F.coalesce(F.bool_or(p), F.lit(False))).alias(VALUE)
        )

    def count(self) -> DataFrame:
        return self.df.agg(F.count(F.lit(1)).alias(VALUE))

    # -- grouping / windows (delegate to operators.*; SURVEY §2.6/2.8) -----

    def group(self, key_fn: ColumnFn, value_fn: ColumnFn | None = None) -> DataFrame:
        """useGroup/useGroupBy (collector.h:1065-1130): key → values in
        encounter order."""
        from semantic_cpp_spark.operators.collectors import group_collect

        k = _apply(key_fn, self._v, self._i)
        v = None if value_fn is None else _apply(value_fn, self._v, self._i)
        return group_collect(self.df, k, v)

    def partition(self, size: int) -> DataFrame:
        """usePartition (collector.h:2098-2136)."""
        from semantic_cpp_spark.operators.collectors import partition_chunks

        return partition_chunks(self.df, size)

    def partition_by(self, key_fn: ColumnFn, value_fn: ColumnFn | None = None) -> DataFrame:
        """usePartitionBy (collector.h:2138-2203)."""
        from semantic_cpp_spark.operators.collectors import partition_by_key

        k = _apply(key_fn, self._v, self._i)
        v = None if value_fn is None else _apply(value_fn, self._v, self._i)
        return partition_by_key(self.df, k, v)

    def tumble(self, size: int) -> DataFrame:
        """toWindow().tumble(size) (semantic.h:910-913)."""
        from semantic_cpp_spark.operators.windows import tumble

        return tumble(self.to_ordered().df, size)

    def slide(self, size: int, step: int) -> DataFrame:
        """toWindow().slide(size, step) (semantic.h:1595-1643)."""
        from semantic_cpp_spark.operators.windows import slide

        return slide(self.to_ordered().df, size, step)

    # -- terminal string join (SURVEY §2.7) --------------------------------

    def join_str(
        self, delimiter: str = ", ", prefix: str = "[", suffix: str = "]"
    ) -> DataFrame:
        """useJoin: '[a, b, c]' in index order (reference collector.h:1132-1241).
        Implemented as sort_array(collect_list((idx, value))) so encounter
        order is pinned regardless of partitioning."""
        packed = F.array_sort(
            F.collect_list(F.struct(self._i.alias("i"), self._v.cast("string").alias("v")))
        )
        joined = F.array_join(F.transform(packed, lambda s: s["v"]), delimiter)
        return self.df.agg(
            F.concat(F.lit(prefix), joined, F.lit(suffix)).alias(VALUE)
        )

    def scalar(self, df: DataFrame | None = None) -> Any:
        """Collect a 1-row/1-col terminal DataFrame to a Python scalar."""
        target = self.df if df is None else df
        row = target.first()
        return None if row is None else row[0]
