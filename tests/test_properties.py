"""Property-based differential tests (SURVEY §5.3): for random inputs and
random operator chains, the engine must equal a ~40-line pure-Python
interpreter of the reference semantics (cheap to write because the
semantics are a fold over (element, index) pairs)."""

from hypothesis import given, settings, strategies as st

from semantic_cpp_spark.sources import from_container


# -- pure-Python reference interpreter (reference semantic.h semantics) -----

def ref_map(pairs, f):
    return [(i, f(v, i)) for i, v in pairs]


def ref_filter(pairs, p):
    return [(k, v) for k, (_, v) in enumerate((i, v) for i, v in pairs if p(v))]


def ref_skip(pairs, n):
    return [(i, v) for i, v in pairs if i >= n]


def ref_sub(pairs, a, b):
    return [(i, v) for i, v in pairs if a <= i < b]


def ref_limit(pairs, n):
    return [(i, v) for i, v in pairs if i < n]


def ref_reverse_ordered(pairs):
    n = len(pairs)
    return sorted(((-i) % n, v) for i, v in pairs) if n else []


def ref_translate_ordered(pairs, off):
    n = len(pairs)
    return sorted(((i + off) % n, v) for i, v in pairs) if n else []


def ref_distinct(pairs):
    seen, out = set(), []
    for _, v in sorted(pairs):
        if v not in seen:
            seen.add(v)
            out.append(v)
    return [(i, v) for i, v in enumerate(out)]


def ref_sort(pairs):
    ordered = sorted(sorted(pairs), key=lambda t: t[1])  # stable by (v, i)
    return [(k, v) for k, (_, v) in enumerate(ordered)]


def ref_take_while(pairs, p):
    out = []
    for i, v in sorted(pairs):
        if not p(v):
            break
        out.append((i, v))
    return out


def ref_drop_while(pairs, p):
    items = sorted(pairs)
    k = 0
    while k < len(items) and p(items[k][1]):
        k += 1
    return [(j, v) for j, (_, v) in enumerate(items[k:])]


ints = st.lists(st.integers(min_value=-50, max_value=50), max_size=25)


@settings(max_examples=12, deadline=None)
@given(ints, st.integers(min_value=0, max_value=30))
def test_skip_limit_sub_chain(spark, xs, n):
    s = from_container(spark, xs)
    assert s.skip(n).pairs() == ref_skip(list(enumerate(xs)), n)
    assert s.limit(n).pairs() == ref_limit(list(enumerate(xs)), n)
    assert s.sub(2, 2 + n).pairs() == ref_sub(list(enumerate(xs)), 2, 2 + n)


@settings(max_examples=12, deadline=None)
@given(ints)
def test_reverse_translate_normalisation(spark, xs):
    s = from_container(spark, xs)
    assert sorted(s.reverse().to_ordered().pairs()) == ref_reverse_ordered(
        list(enumerate(xs))
    )
    assert sorted(s.translate(5).to_ordered().pairs()) == ref_translate_ordered(
        list(enumerate(xs)), 5
    )


@settings(max_examples=12, deadline=None)
@given(ints)
def test_distinct_and_sort(spark, xs):
    s = from_container(spark, xs)
    assert s.distinct().pairs() == ref_distinct(list(enumerate(xs)))
    assert s.sort().pairs() == ref_sort(list(enumerate(xs)))


@settings(max_examples=12, deadline=None)
@given(ints, st.integers(min_value=-20, max_value=20))
def test_take_drop_while(spark, xs, cut):
    s = from_container(spark, xs)
    p = lambda v: v < cut  # noqa: E731
    assert s.take_while(p).pairs() == ref_take_while(list(enumerate(xs)), lambda v: v < cut)
    assert s.drop_while(p).pairs() == ref_drop_while(list(enumerate(xs)), lambda v: v < cut)


@settings(max_examples=10, deadline=None)
@given(ints, ints)
def test_concatenate_renumbering(spark, xs, ys):
    got = from_container(spark, xs).concatenate(from_container(spark, ys)).pairs()
    expect = list(enumerate(xs + ys))
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(ints, st.integers(min_value=-60, max_value=60))
def test_find_at_any_index(spark, xs, i):
    s = from_container(spark, xs)
    got = s.scalar(s.find_at(i))
    n = len(xs)
    if n == 0 or (i >= 0 and i >= n):
        assert got is None
    elif i >= 0:
        assert got == xs[i]
    else:
        assert got == xs[(n - ((-i) % n)) % n]
