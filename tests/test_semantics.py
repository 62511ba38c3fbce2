"""Semantics-pinning tests (SURVEY.md §5.2): each pins a reference quirk
with its file:line citation so parity is auditable."""

import pytest
from pyspark.sql import functions as F

from semantic_cpp_spark.sources import from_container, from_range


def test_reverse_is_rotation_reversal(spark):
    """reverse() negates indices (semantic.h:1448-1461); toOrdered's modulo
    normalisation (semantic.h:492-504) keeps element 0 at index 0 and
    reverses the rest: -i mod n == n-i."""
    s = from_container(spark, [10, 20, 30, 40]).reverse().to_ordered()
    assert s.to_list() == [10, 40, 30, 20]


def test_find_at_negative_modulo_wrap(spark):
    """findAt(-i) resolves (n - (|i| % n)) % n (collector.h:883-910):
    findAt(-n-1) == findAt(-1)."""
    s = from_container(spark, [1, 2, 3, 4, 5])
    assert s.scalar(s.find_at(-1)) == 5
    assert s.scalar(s.find_at(-6)) == 5  # wraps with modulo
    assert s.scalar(s.find_at(-5)) == 1
    assert s.scalar(s.find_at(-10)) == 1


def test_skip_preserves_indices_filter_rebases(spark):
    """skip keeps counting through skipped elements (semantic.h:1463-1481);
    filter re-bases 0..k (semantic.h:1197-1216)."""
    s = from_container(spark, [5, 6, 7, 8])
    assert s.skip(2).pairs() == [(2, 7), (3, 8)]
    assert s.filter(lambda v: v >= 7).pairs() == [(0, 7), (1, 8)]


def test_sub_preserves_indices(spark):
    """sub(start, end) slices [start, end) keeping indices
    (semantic.h:1512-1530)."""
    s = from_container(spark, [5, 6, 7, 8, 9])
    assert s.sub(1, 3).pairs() == [(1, 6), (2, 7)]


def test_limit(spark):
    s = from_container(spark, [5, 6, 7, 8])
    assert s.limit(2).pairs() == [(0, 5), (1, 6)]


def test_distinct_keeps_first_occurrence(spark):
    """distinct dedups to the FIRST occurrence, re-based
    (semantic.h:1122-1142)."""
    s = from_container(spark, [3, 1, 3, 2, 1, 3])
    assert s.distinct().to_list() == [3, 1, 2]


def test_sort_stable_with_original_index_tiebreak(spark):
    """sort is a stable value sort; ties keep original order
    (semantic.h:1483-1503, comparator :477-490)."""
    s = from_container(spark, ["b2", "a1", "b1", "a2"]).sort(
        key=lambda v: F.substring(v, 1, 1)
    )
    assert s.to_list() == ["a1", "a2", "b2", "b1"]


def test_concatenate_renumbers_across_boundary(spark):
    """concatenate re-numbers both sides with a running count
    (semantic.h:1012-1120)."""
    a = from_container(spark, [1, 2])
    b = from_container(spark, [8, 9])
    assert a.concatenate(b).pairs() == [(0, 1), (1, 2), (2, 8), (3, 9)]


def test_take_while_preserves_drop_while_rebases(spark):
    """takeWhile emits then stops, indices preserved (semantic.h:1532-1554);
    dropWhile drops the leading run and re-bases (semantic.h:1166-1195)."""
    s = from_container(spark, [1, 2, 9, 1, 2])
    assert s.take_while(lambda v: v < 5).pairs() == [(0, 1), (1, 2)]
    assert s.drop_while(lambda v: v < 5).pairs() == [(0, 9), (1, 1), (2, 2)]


def test_take_while_never_failing_keeps_all(spark):
    s = from_container(spark, [1, 2, 3])
    assert s.take_while(lambda v: v < 99).to_list() == [1, 2, 3]
    assert s.drop_while(lambda v: v < 99).to_list() == []


def test_translate_then_ordered_wraps(spark):
    """translate shifts (semantic.h:1577-1590); toOrdered wraps modulo n
    (semantic.h:492-504)."""
    s = from_container(spark, [10, 20, 30]).translate(1).to_ordered()
    assert s.pairs() == [(0, 30), (1, 10), (2, 20)]


def test_map_preserves_index_and_flat_rebases(spark):
    s = from_container(spark, [1, 2]).map(lambda v, i: v * 10 + i)
    assert s.pairs() == [(0, 10), (1, 21)]
    f = from_container(spark, [1, 2]).flat(lambda v: F.array(v, v * 10))
    assert f.pairs() == [(0, 1), (1, 10), (2, 2), (3, 20)]


def test_range_sources(spark):
    """useRange auto-swap + stepped + closed (semantic.h:1653-1761)."""
    assert from_range(spark, 0, 4).to_list() == [0, 1, 2, 3]
    assert from_range(spark, 4, 0).to_list() == [0, 1, 2, 3]  # auto-swap
    assert from_range(spark, 0, 10, 3).to_list() == [0, 3, 6, 9]
    assert from_range(spark, 10, 0, -3).to_list() == [10, 7, 4, 1]
    assert from_range(spark, 0, 10, 0).to_list() == []
    from semantic_cpp_spark.sources import from_range_closed

    assert from_range_closed(spark, 1, 3).to_list() == [1, 2, 3]
    assert from_range_closed(spark, 0, 9, 3).to_list() == [0, 3, 6, 9]


def test_matching_collectors_and_empty_semantics(spark):
    """allMatch/anyMatch/noneMatch on empty streams follow the identity
    values (collector.h:399-448); average of empty = 0, not null
    (collector.h:520-524)."""
    from semantic_cpp_spark.functions import stats
    from semantic_cpp_spark.sources import use_empty

    s = from_container(spark, [2, 4])
    assert s.scalar(s.all_match(lambda v: v % 2 == 0)) is True
    assert s.scalar(s.any_match(lambda v: v > 3)) is True
    assert s.scalar(s.none_match(lambda v: v > 9)) is True

    e = use_empty(spark, "long")
    assert e.scalar(e.all_match(lambda v: v > 0)) is True
    assert e.scalar(e.any_match(lambda v: v > 0)) is False
    avg = e.to_df().agg(stats.average_or_zero(F.col("value")).alias("a"))
    assert e.scalar(avg) == 0.0


def test_find_first_last_min_max(spark):
    s = from_container(spark, [7, 3, 9, 3])
    assert s.scalar(s.find_first()) == 7
    assert s.scalar(s.find_last()) == 3
    assert s.scalar(s.find_minimum()) == 3
    assert s.scalar(s.find_maximum()) == 9


def test_join_str_collector(spark):
    """useJoin default format '[a, b, c]' (collector.h:1132-1186)."""
    s = from_container(spark, [1, 2, 3])
    assert s.scalar(s.join_str()) == "[1, 2, 3]"


def test_limit_skip_sub_count_by_arrival_not_index(spark):
    """limit/skip/sub emit their OWN arrival counter (semantic.h:1366,
    :1472, :1521), so they compose by element position even when incoming
    indices are non-dense — skip(2).skip(1) drops 3 elements total, and
    skip(2).limit(2) takes the next two."""
    s = from_container(spark, [10, 11, 12, 13, 14])
    assert s.skip(2).skip(1).pairs() == [(1, 13), (2, 14)]
    assert s.skip(2).limit(2).pairs() == [(0, 12), (1, 13)]
    assert s.skip(1).sub(1, 3).pairs() == [(1, 12), (2, 13)]
    assert s.translate(100).limit(2).pairs() == [(0, 10), (1, 11)]
    assert s.sub(1, 4).sub(1, 2).pairs() == [(1, 12)]


def test_counter_ops_use_push_order_not_index(spark):
    """Push order vs logical index: reverse()/translate() rewrite indices
    WITHOUT reordering pushes (semantic.h:1454, :1583), so counter-based
    ops still see the original arrival sequence."""
    s = from_container(spark, [10, 11, 12, 13])
    # reverse().limit(2): first two PUSHED elements, counter 0..1
    assert s.reverse().limit(2).pairs() == [(0, 10), (1, 11)]
    # reverse().filter: re-counts in push order
    assert s.reverse().filter(lambda v: v % 2 == 1).pairs() == [(0, 11), (1, 13)]
    # reverse().take_while: stops at first pushed failure, indices (negated) preserved
    assert s.reverse().take_while(lambda v: v < 12).pairs() == [(-1, 11), (0, 10)]
    # translate().skip: arrival counter, not shifted index
    assert s.translate(100).skip(3).pairs() == [(3, 13)]
    # distinct first-occurrence is by push order even under reverse
    d = from_container(spark, [7, 8, 7, 9]).reverse().distinct()
    assert d.pairs() == [(0, 7), (1, 8), (2, 9)]


def test_concatenate_element_and_container(spark):
    """concatenate's scalar and container overloads (semantic.h:1012-1120
    branches 2 and 4)."""
    s = from_container(spark, [1, 2])
    assert s.concatenate_element(9).pairs() == [(0, 1), (1, 2), (2, 9)]
    assert s.concatenate_container([7, 8]).pairs() == [
        (0, 1), (1, 2), (2, 7), (3, 8),
    ]


def test_sort_descending_and_custom_key_finders(spark):
    s = from_container(spark, [3, 1, 4, 1, 5])
    assert s.sort(ascending=False).to_list() == [5, 4, 3, 1, 1]
    # comparator variants: min/max by derived key (collector.h:953-1063)
    m = from_container(spark, ["bb", "a", "ccc"])
    assert m.scalar(m.find_maximum(key=lambda v: F.length(v))) == "ccc"
    assert m.scalar(m.find_minimum(key=lambda v: F.length(v))) == "a"


def test_distinct_with_custom_equivalence(spark):
    """distinct(comparator) → dedup under a derived key
    (semantic.h:1144-1164): here case-insensitive, first occurrence wins."""
    s = from_container(spark, ["Aa", "aa", "BB", "aA", "bb"])
    assert s.distinct(key=lambda v: F.lower(v)).to_list() == ["Aa", "BB"]


def test_distinct_comparator_family(spark):
    """The std::set comparator overload, compare-by-key family
    (semantic.h:1144-1164): duplicates are elements neither of which
    orders before the other — for compare_by(lower), case-folded ties.
    Arbitrary pairwise comparators are the documented unsupported subset
    (COVERAGE.md §2.2) and must raise, not run an O(n²) plan."""
    import pytest

    from semantic_cpp_spark.frame import compare_by

    s = from_container(spark, ["Aa", "aa", "BB", "aA", "bb"])
    got = s.distinct(comparator=compare_by(lambda v: F.lower(v))).to_list()
    assert got == ["Aa", "BB"]
    with pytest.raises(NotImplementedError):
        s.distinct(comparator=lambda a, b: a < b)
    with pytest.raises(ValueError):
        s.distinct(key=F.lower(F.col("value")), comparator=compare_by(F.col("value")))


def test_flat_skips_empty_containers(spark):
    """flat over an empty inner container contributes nothing
    (semantic.h:1244-1274 iterates zero times)."""
    s = from_container(spark, [1, 2, 3]).flat(
        lambda v: F.when(v % 2 == 0, F.array(v, v)).otherwise(
            F.array().cast("array<int>")
        )
    )
    assert s.pairs() == [(0, 2), (1, 2)]
