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


# -- round-6 session operators: randomized property pins ---------------------

@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=5, max_size=25),
    st.integers(min_value=1, max_value=8),
)
def test_weighted_sample_monotone_in_weight(spark, weights, k):
    """A-ES property: with the hash fixed per id, priority = -ln(u)/w is
    strictly decreasing in w — so doubling a selected row's weight can
    never evict it from the sample."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.pipeline import curation

    rows = list(enumerate(weights))
    df = spark.createDataFrame(rows, "id long, w long")
    k = min(k, len(rows))
    picked = {r.id for r in curation.weighted_sample_k(
        df, F.col("id"), F.col("w"), k).collect()}
    boosted = [(i, w * 2 if i in picked else w) for i, w in rows]
    df2 = spark.createDataFrame(boosted, "id long, w long")
    picked2 = {r.id for r in curation.weighted_sample_k(
        df2, F.col("id"), F.col("w"), k).collect()}
    assert picked <= picked2


@settings(max_examples=10, deadline=None)
@given(
    st.text(alphabet="abc d", min_size=0, max_size=80),
    st.integers(min_value=1, max_value=20),
)
def test_chunk_text_covers_exactly(spark, text, size):
    """With stride == size (no overlap) the chunks concatenate back to
    the exact original text, and with stride < size every consecutive
    pair overlaps by size - stride chars."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.pipeline import curation

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    parts = sorted(
        curation.chunk_text(df, F.col("text"), F.col("doc_id"), size, size).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert "".join(p.chunk for p in parts) == text
    stride = max(1, size - 1)
    over = sorted(
        curation.chunk_text(df, F.col("text"), F.col("doc_id"), size, stride).collect(),
        key=lambda r: r.chunk_idx,
    )
    for a, b in zip(over, over[1:]):
        if len(a.chunk) == size:  # full window
            assert a.chunk[stride:] == b.chunk[: size - stride]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3)),
                min_size=2, max_size=40))
def test_markov_rows_normalize(spark, evs):
    """P(next|cur) sums to 1 per cur over any event log."""
    from semantic_cpp_spark.operators import eventflow

    rows = [(i, u, i * 1_000_000, f"t{t}", 0.0) for i, (u, t) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, tus long, event_type string, value double"
    )
    out = eventflow.markov_transitions(df).collect()
    sums: dict[str, float] = {}
    for r in out:
        sums[r.cur] = sums.get(r.cur, 0.0) + r.p
    for cur, s in sums.items():
        assert abs(s - 1.0) < 1e-4, (cur, s)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 3), st.integers(0, 400)),
                min_size=1, max_size=30, unique_by=lambda t: (t[0], t[1])))
def test_scd2_versions_chain(spark, orders):
    """SCD2 contract on random order sets: per customer, versions are
    1..n in date order, each valid_to equals the next valid_from,
    exactly one open (is_current) interval, and cum_spend is
    non-decreasing."""
    import datetime

    qs = __import__("__spark_entry__").queries()
    rows = [
        (u * 100000 + d, u, datetime.date(2024, 1, 1) + datetime.timedelta(days=d),
         float(10 + d % 7))
        for u, d in orders
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    )
    import tempfile, os
    tmp = tempfile.mkdtemp(prefix="scd2_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "orders.parquet"))
    out = qs["rel_scd2_customer_history"](spark, tmp).collect()
    by_cust: dict[int, list] = {}
    for r in out:
        by_cust.setdefault(r.custkey, []).append(r)
    for cust, vs in by_cust.items():
        vs.sort(key=lambda r: r.version)
        assert [v.version for v in vs] == list(range(1, len(vs) + 1))
        assert sum(1 for v in vs if v.is_current) == 1
        assert vs[-1].is_current and vs[-1].valid_to == "9999-12-31"
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from
            assert a.cum_spend <= b.cum_spend


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.binary(min_size=81, max_size=81),
    st.sampled_from(["P5", "P4"]),
)
def test_pnm_gray_decode_random_payloads(w, h, raw, magic):
    """Randomized P5/P4 round-trip against a direct Python rendering:
    the decoder must reproduce exactly the bytes/bits we packed."""
    from semantic_cpp_spark.pipeline.multimodal import decode_image

    if magic == "P5":
        gray = list(raw[: w * h])
        payload = f"P5\n{w} {h}\n255\n".encode() + bytes(gray)
        got = decode_image(payload)
        assert got[:3] == (w, h, 255)
        assert list(got[3][::3]) == gray
        assert got[3][1::3] == got[3][::3] == got[3][2::3]
    else:
        bits = [raw[r * w + c] & 1 for r in range(h) for c in range(w)]
        row_bytes = (w + 7) // 8
        packed = bytearray(row_bytes * h)
        for r in range(h):
            for c in range(w):
                if bits[r * w + c]:
                    packed[r * row_bytes + c // 8] |= 1 << (7 - c % 8)
        payload = f"P4\n{w} {h}\n".encode() + bytes(packed)
        got = decode_image(payload)
        assert got[:3] == (w, h, 255)
        assert [0 if b else 255 for b in bits] == list(got[3][::3])


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(st.integers(1, 4), st.integers(0, 40),
              st.integers(0, 50000)),  # (user, day, value_cents)
    min_size=1, max_size=40))
def test_decayed_activity_matches_python_reference(spark, evs):
    """The power-of-two decay sum must equal a direct Python float
    computation EXACTLY (that is the point of the integer-shift design):
    score = Σ cents·2^(30−Δ) / (100·2^30), Δ from the corpus max day."""
    rows = [
        (i, u, d * 86_400_000_000, "a", c / 100.0)
        for i, (u, d, c) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, tus long, event_type string, value double"
    )
    from semantic_cpp_spark.operators import eventflow

    out = {r.user_id: r for r in eventflow.decayed_activity(df).collect()}
    T = max(d for _, d, _ in evs)
    expect: dict[int, list] = {}
    for u, d, c in evs:
        if T - d <= 30:
            expect.setdefault(u, []).append(c * (1 << (30 - (T - d))))
    from decimal import ROUND_HALF_UP, Decimal

    for u, terms in expect.items():
        raw = sum(terms) / (100 * (1 << 30))
        # Spark/DuckDB round(x, 6) is HALF_UP on the shortest decimal
        # repr; Python's round() is banker's — emulate the engines
        # (falsifying case: 9 cents at delta=5 -> exactly 0.0028125)
        score = float(
            Decimal(repr(raw)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )
        assert out[u].n_recent == len(terms)
        assert out[u].score == score, (u, out[u].score, score)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 5), st.integers(0, 20)),
                min_size=1, max_size=60))
def test_sliding_uniques_matches_brute_force(spark, evs):
    """Batch sliding distinct users vs a brute-force Python reference on
    random (user, hour) logs — window membership, distinct counting,
    and edge-window trimming all pinned at once."""
    qs = __import__("__spark_entry__").queries()
    import os
    import tempfile

    rows = [
        (i, u, h * 3_600_000_000_000, "a", 0.0)   # ns epoch per fixture shape
        for i, (u, h) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string, value double"
    )
    tmp = tempfile.mkdtemp(prefix="slide_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    got = {r.win_start: r.n_users for r in qs["evt_sliding_uniques"](spark, tmp).collect()}
    hours = [h for _, h in evs]
    lo, hi = min(hours), max(hours)
    expect = {}
    for ws in range(lo, hi - 5 + 1):
        users = {u for u, h in evs if ws <= h <= ws + 5}
        if users:
            expect[ws] = len(users)
    assert got == expect


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=0, max_size=10, unique=True),
    st.lists(st.integers(0, 30), min_size=0, max_size=10, unique=True),
)
def test_rrf_fusion_reference(lex_ids, vec_ids):
    """RRF arithmetic against a direct Python reference: the fused score
    of every doc equals 1/(60+lex_rank) + 1/(60+vec_rank) with absent
    ranks contributing 0 — checked on random rank lists (pure function,
    no Spark)."""
    c = 60
    scores = {}
    for r, d in enumerate(lex_ids, start=1):
        scores[d] = scores.get(d, 0.0) + 1.0 / (c + r)
    for r, d in enumerate(vec_ids, start=1):
        scores[d] = scores.get(d, 0.0) + 1.0 / (c + r)
    # docs in both lists strictly outscore the same-rank single-list doc
    for d in set(lex_ids) & set(vec_ids):
        lr = lex_ids.index(d) + 1
        assert scores[d] > 1.0 / (c + lr)
    # ordering by fused score is total after (score, id) tie-break
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    assert len(ranked) == len(scores)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 2), st.integers(0, 60), st.integers(0, 15)),
                min_size=1, max_size=25))
def test_merge_intervals_matches_python_sweep(spark, ivs):
    """merge_intervals vs a direct Python sweep on random per-key
    interval sets (overlap, touching, containment, duplicates)."""
    from semantic_cpp_spark.operators import eventflow

    rows = [(k, s, s + d) for k, s, d in ivs]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got: dict[tuple, tuple] = {}
    for r in eventflow.merge_intervals(df, "k", "s", "e").collect():
        got[(r.k, r.block_idx)] = (r.b_start, r.b_end, r.n_intervals)
    expect: dict[tuple, tuple] = {}
    by_key: dict[int, list] = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, lst in by_key.items():
        lst.sort()
        blocks = []
        for s, e in lst:
            if blocks and s <= blocks[-1][1]:   # overlapping-or-touching
                bs, be, n = blocks[-1]
                blocks[-1] = (bs, max(be, e), n + 1)
            else:
                blocks.append((s, e, 1))
        for i, b in enumerate(blocks):
            expect[(k, i)] = b
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 4), st.integers(0, 30)),
                min_size=2, max_size=40))
def test_max_concurrency_matches_python_sweep(spark, evs):
    """Per-day peak concurrency vs a brute-force Python scan over every
    event instant (sessions degenerate to points/short runs on random
    logs — the sweep still has to agree everywhere)."""
    from semantic_cpp_spark.operators import eventflow

    M = 1_000_000
    rows = [(i, u, t * 60 * M, "a", 0.0) for i, (u, t) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, tus long, event_type string, value double"
    )
    gap = 10 * 60 * M
    out = {r.day: r.max_concurrent for r in
           eventflow.max_concurrency_per_day(df, gap_us=gap).collect()}
    # Python reference: same sessionization (sorted per user, split on
    # gap), then per-day point-wise max over candidate instants
    sess: list[tuple[int, int]] = []
    by_user: dict[int, list[int]] = {}
    for _, u, t, _, _ in rows:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        start = prev = ts[0]
        for t in ts[1:]:
            if t - prev > gap:
                sess.append((start, prev))
                start = t
            prev = t
        sess.append((start, prev))
    DAY = 86_400_000_000
    days = {d for s, e in sess for d in range(s // DAY, e // DAY + 1)}
    expect = {}
    for d in days:
        instants = sorted({max(s, d * DAY) for s, e in sess} |
                          {min(e, (d + 1) * DAY - 1) for s, e in sess})
        best = 0
        for t in instants:
            if d * DAY <= t < (d + 1) * DAY:
                best = max(best, sum(1 for s, e in sess if s <= t <= e))
        expect[d] = best
    assert out == expect


@settings(max_examples=8, deadline=None)
@given(st.lists(st.lists(st.integers(0, 4), min_size=10, max_size=30),
                min_size=1, max_size=12))
def test_line_dedup_matches_python_reference(spark, docs_tokens):
    """Keep-first chunk dedup vs a direct Python reference on random
    small-vocabulary corpora (heavy chunk collisions by construction)."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.pipeline import curation

    docs = [(i, " ".join(f"t{t}" for t in toks))
            for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_chunks, r.n_kept, r.clean_text)
           for r in curation.line_dedup(df, F.col("text"), F.col("doc_id"), 10).collect()}
    # python reference: chunks of 10 tokens, global first-(doc,idx) wins
    chunks_by_doc = {}
    for i, toks in enumerate(docs_tokens):
        words = [f"t{t}" for t in toks]
        chunks_by_doc[i] = [" ".join(words[j:j + 10])
                            for j in range(0, len(words), 10)]
    first: dict[str, tuple] = {}
    for i in sorted(chunks_by_doc):
        for j, ch in enumerate(chunks_by_doc[i]):
            first.setdefault(ch, (i, j))
    for i, chs in chunks_by_doc.items():
        kept = [ch for j, ch in enumerate(chs) if first[ch] == (i, j)]
        assert got[i] == (len(chs), len(kept), " ".join(kept)), i


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 19)),
                min_size=1, max_size=30, unique=True),
       st.integers(min_value=1, max_value=4))
def test_negative_samples_random_contract(spark, pos_pairs, k):
    """Contract invariants on random positive sets: no sampled pair is
    positive, items stay in-range, ranks are 1..m per user, and every
    user with a positive appears."""
    from pyspark.sql import functions as F

    from semantic_cpp_spark.pipeline import curation

    pos = spark.createDataFrame(pos_pairs, "user long, item long")
    n_items = spark.createDataFrame([(20,)], "n_items long")
    rows = curation.negative_samples(pos, n_items, k=k, margin=4).collect()
    pos_set = set(pos_pairs)
    users = {u for u, _ in pos_pairs}
    by_user: dict[int, list[int]] = {}
    for r in rows:
        assert (r.user, r.item) not in pos_set
        assert 0 <= r.item < 20
        by_user.setdefault(r.user, []).append(r.rank)
    for u, ranks in by_user.items():
        assert u in users
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= k


# -- hybrid BPE trainer: incremental updates vs naive recount ----------------
# _bpe_train_local maintains pair counts INCREMENTALLY (before/after
# deltas per touched word, a lazy-deletion heap, a pair->word index);
# _py-style naive training recounts every pair every round. Same tie
# order (bytes == codepoint order on these alphabets). Pure Python on
# both sides - no Spark - so hypothesis can hammer the bookkeeping.

def _naive_bpe(word_freqs: dict[str, int], n: int, min_count: int = 1):
    state = {w: list(w) for w in word_freqs}
    out = []
    for rank in range(1, n + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + word_freqs[w]
        if not pc:
            break
        m = max(pc.values())
        if m < min_count:
            break
        lhs, rhs = min(
            (k for k, v in pc.items() if v == m),
            key=lambda p: (p[0].encode(), p[1].encode()),
        )
        out.append((rank, lhs, rhs, m))
        for w, syms in state.items():
            i, ns = 0, []
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                    ns.append(lhs + rhs)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            state[w] = ns
    return out


@given(
    st.dictionaries(
        st.text(alphabet="abcdeé", min_size=1, max_size=10),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=120, deadline=None)
def test_bpe_local_trainer_matches_naive_recount(word_freqs, n, min_count):
    from semantic_cpp_spark.pipeline.text import _bpe_train_local

    rows = [
        (freq, " " + "  ".join(list(w)) + " ") for w, freq in word_freqs.items()
    ]
    got = _bpe_train_local(rows, n, min_count)
    assert got == _naive_bpe(word_freqs, n, min_count)


@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=60, deadline=None)
def test_bpe_local_trainer_matches_naive_recount_eow(word_freqs, n):
    """The eow form is the same algorithm over marker-terminated
    symbol sequences — the incremental trainer must match the naive
    recount when every word carries the atomic end-of-word symbol
    (which the marker-bearing naive state models as one extra
    symbol)."""
    from semantic_cpp_spark.pipeline.text import _bpe_train_local

    EOW = "</w>"
    rows = [
        (freq, " " + "  ".join(list(w) + [EOW]) + " ")
        for w, freq in word_freqs.items()
    ]
    got = _bpe_train_local(rows, n, 1)
    # naive reference over marker-terminated states: reuse the plain
    # recount by mapping each word to a synthetic symbol list
    state = {w: list(w) + [EOW] for w in word_freqs}
    out = []
    for rank in range(1, n + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + word_freqs[w]
        if not pc:
            break
        m = max(pc.values())
        lhs, rhs = min(
            (k for k, v in pc.items() if v == m),
            key=lambda p: (p[0].encode(), p[1].encode()),
        )
        out.append((rank, lhs, rhs, m))
        for w, syms in state.items():
            i, ns = 0, []
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                    ns.append(lhs + rhs)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            state[w] = ns
    assert got == out


# -- unigram Viterbi DP vs exhaustive argmax (pure Python, no Spark) ----------


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_viterbi_matches_exhaustive_argmax(data):
    """The DP core (unigram._viterbi) against brute-force enumeration
    of every segmentation on random words over a tiny alphabet with a
    random piece inventory — hammering exactly the split/tie/UNK
    bookkeeping the driver gate exercises only on fixture text. Tie
    rule replayed: maximize total score, then prefer the smaller split
    point at every backward step (compare reversed cut tuples)."""
    from semantic_cpp_spark.pipeline.unigram import UNK_SCORE_MICRO, _viterbi

    word = data.draw(st.text(alphabet="abc", min_size=1, max_size=9))
    # random inventory: always cover at least one char to keep scores
    # interesting; uncovered single chars exercise the UNK path
    all_subs = sorted(
        {word[i:j] for i in range(len(word)) for j in range(i + 1, len(word) + 1)}
    )
    chosen = data.draw(
        st.lists(st.sampled_from(all_subs), min_size=1, max_size=8, unique=True)
    )
    scores = {
        p: data.draw(
            st.integers(min_value=-5_000_000, max_value=-1), label=f"s[{p}]"
        )
        for p in chosen
    }
    ml = max(len(p) for p in scores)
    got = _viterbi(word, scores, ml, UNK_SCORE_MICRO)

    n = len(word)
    best = None
    for mask in range(1 << (n - 1)):
        cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
        segs = [word[cuts[k] : cuts[k + 1]] for k in range(len(cuts) - 1)]
        tot = 0
        ok = True
        for s in segs:
            if s in scores:
                tot += scores[s]
            elif len(s) == 1:
                tot += UNK_SCORE_MICRO
            else:
                ok = False
                break
        if not ok:
            continue
        key = (-tot, tuple(reversed(cuts)))
        if best is None or key < best[0]:
            best = (key, segs)
    assert got == best[1]
