"""Interpolated trigram LM (retrieval.lm_train_trigram /
lm_score_trigram): model and scores against a pure-Python replay, the
OOV uniform floor, BOS event framing on short documents, and partition
invariance of the micro-unit sums."""

import math

import pytest
from pyspark.sql import functions as F

from semantic_cpp_spark.pipeline import retrieval

L3, L2, L1, L0 = retrieval.LM_LAMBDAS
BOS = retrieval.LM_BOS

TRAIN = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the fish"),
    (2, "a dog sat on a log"),
    (3, "the dog ate the bone"),
]

TEST = [
    (10, "the cat sat"),          # seen n-grams
    (11, "zz qq"),                # fully OOV -> floor only
    (12, "cat"),                  # single token: u=v=<s>
    (13, "the dog sat on the mat"),
]


def _events(txt):
    t = [w for w in txt.lower().split() if w]
    out = []
    for i, w in enumerate(t):
        u = t[i - 2] if i >= 2 else BOS
        v = t[i - 1] if i >= 1 else BOS
        out.append((u, v, w))
    return out


def _py_lm(train):
    ev = [e for _, txt in train for e in _events(txt)]
    from collections import Counter

    c3 = Counter(ev)
    ch2 = Counter((u, v) for u, v, _ in ev)
    c2 = Counter((v, w) for _, v, w in ev)
    ch1 = Counter(v for _, v, _ in ev)
    c1 = Counter(w for _, _, w in ev)
    n = len(ev)
    vt = len({w for _, _, w in ev})
    return c3, ch2, c2, ch1, c1, n, vt


def _py_score(lm, docs):
    c3, ch2, c2, ch1, c1, n, vt = lm
    out = {}
    for doc_id, txt in docs:
        evs = _events(txt)
        if not evs:
            continue
        total = 0
        for u, v, w in evs:
            p3 = c3[(u, v, w)] / ch2[(u, v)] if c3[(u, v, w)] else 0.0
            p2 = c2[(v, w)] / ch1[v] if c2[(v, w)] else 0.0
            p1 = c1[w] / n if c1[w] else 0.0
            p = L3 * p3 + L2 * p2 + L1 * p1 + L0 * (1.0 / (vt + 1.0))
            x = -math.log(p) * 1e6
            total += int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))
        nn = len(evs)
        out[doc_id] = (nn, total, ((2 * total + nn) // (2 * nn)) / 1e6)
    return out


@pytest.fixture(scope="module")
def fitted(spark):
    tr = spark.createDataFrame(TRAIN, "doc_id long, text string")
    return retrieval.lm_train_trigram(tr, F.col("text"))


def test_scores_match_python_replay(spark, fitted):
    want = _py_score(_py_lm(TRAIN), TEST)
    te = spark.createDataFrame(TEST, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_micro"], r["cross_entropy"])
        for r in retrieval.lm_score_trigram(
            te, F.col("text"), F.col("doc_id"), fitted
        ).collect()
    }
    assert got == want


def test_oov_doc_scores_exactly_the_floor(spark, fitted):
    _, _, _, _, _, n, vt = _py_lm(TRAIN)
    te = spark.createDataFrame([(11, "zz qq")], "doc_id long, text string")
    row = retrieval.lm_score_trigram(
        te, F.col("text"), F.col("doc_id"), fitted
    ).collect()[0]
    x = -math.log(L0 * (1.0 / (vt + 1.0))) * 1e6
    per_event = int(math.floor(x + 0.5))
    assert row["nll_micro"] == 2 * per_event
    assert row["n_tokens"] == 2


def test_single_token_doc_uses_double_bos_history(spark, fitted):
    # "cat" scores as the (<s>, <s>, cat) event; "the cat ..." docs in
    # TRAIN mean c3[(<s>,<s>,cat)] == 0 but c2[(<s>,cat)] == 0 as well
    # (no train doc starts with cat), so only p1 + floor contribute.
    c3, ch2, c2, ch1, c1, n, vt = _py_lm(TRAIN)
    assert c3[(BOS, BOS, "cat")] == 0 and c2[(BOS, "cat")] == 0
    p = L1 * (c1["cat"] / n) + L0 * (1.0 / (vt + 1.0))
    x = -math.log(p) * 1e6
    want = int(math.floor(x + 0.5))
    te = spark.createDataFrame([(12, "cat")], "doc_id long, text string")
    row = retrieval.lm_score_trigram(
        te, F.col("text"), F.col("doc_id"), fitted
    ).collect()[0]
    assert row["nll_micro"] == want


def test_empty_doc_drops_out(spark, fitted):
    te = spark.createDataFrame(
        [(20, ""), (21, "   "), (22, "the cat")], "doc_id long, text string"
    )
    rows = retrieval.lm_score_trigram(
        te, F.col("text"), F.col("doc_id"), fitted
    ).collect()
    assert {r["doc_id"] for r in rows} == {22}


def test_partition_invariance(spark, fitted):
    te = spark.createDataFrame(TEST, "doc_id long, text string")
    a = sorted(
        map(
            tuple,
            retrieval.lm_score_trigram(
                te, F.col("text"), F.col("doc_id"), fitted
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            retrieval.lm_score_trigram(
                te.repartition(7), F.col("text"), F.col("doc_id"), fitted
            ).collect(),
        )
    )
    assert a == b


def test_self_scoring_beats_shuffled_text(spark, fitted):
    """The LM property that makes perplexity a quality signal: text
    drawn from the training distribution must carry lower cross-entropy
    than the same tokens in scrambled order (trigram structure gone)."""
    te = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "mat the on cat the sat")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["cross_entropy"]
        for r in retrieval.lm_score_trigram(
            te, F.col("text"), F.col("doc_id"), fitted
        ).collect()
    }
    assert rows[0] < rows[1]


@pytest.mark.parametrize("seed", [5, 31])
def test_random_corpus_matches_python_replay(spark, seed):
    """Seeded random train/score corpora through the trigram LM vs the
    serial replay — exercises unseen-bigram/trigram fallthrough mixes
    the fixed corpus barely samples."""
    import random

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(8)]
    train = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15))))
        for i in range(20)
    ]
    test = [
        (
            100 + i,
            " ".join(
                rng.choice(vocab + ["xx"]) for _ in range(rng.randint(1, 10))
            ),
        )
        for i in range(10)
    ]
    tr = spark.createDataFrame(train, "doc_id long, text string")
    lm = retrieval.lm_train_trigram(tr, F.col("text"))
    te = spark.createDataFrame(test, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_micro"], r["cross_entropy"])
        for r in retrieval.lm_score_trigram(
            te, F.col("text"), F.col("doc_id"), lm
        ).collect()
    }
    assert got == _py_score(_py_lm(train), test), seed


# -- interpolated Kneser-Ney (retrieval.lm_train_kn_trigram) -------------------

KD = retrieval.KN_DISCOUNT


def _py_kn_lm(train):
    from collections import Counter

    ev = [e for _, txt in train for e in _events(txt)]
    c3 = Counter(ev)
    ch2 = Counter()
    n1p3 = Counter()
    for (u, v, _), c in c3.items():
        ch2[(u, v)] += c
        n1p3[(u, v)] += 1
    cc2 = Counter((v, w) for (_, v, w) in c3)  # distinct-u continuation
    den2 = Counter()
    n1p2 = Counter()
    for (v, _), c in cc2.items():
        den2[v] += c
        n1p2[v] += 1
    cc1 = Counter(w for (_, w) in cc2)
    nbt = len(cc2)
    vt = len({w for _, _, w in ev})
    return c3, ch2, n1p3, cc2, den2, n1p2, cc1, nbt, vt


def _py_kn_score(lm, docs, lam=0.01):
    c3, ch2, n1p3, cc2, den2, n1p2, cc1, nbt, vt = lm
    out = {}
    for doc_id, txt in docs:
        evs = _events(txt)
        if not evs:
            continue
        total = 0
        for u, v, w in evs:
            p1f = cc1[w] / nbt if cc1[w] else 0.0
            if den2[v]:
                p2top = (
                    max(cc2[(v, w)] - KD, 0.0) / den2[v] if cc2[(v, w)] else 0.0
                )
                gamma2 = KD * n1p2[v] / den2[v]
                p2f = p2top + gamma2 * p1f
            else:
                p2f = p1f
            if ch2[(u, v)]:
                p3top = (
                    max(c3[(u, v, w)] - KD, 0.0) / ch2[(u, v)]
                    if c3[(u, v, w)]
                    else 0.0
                )
                gamma3 = KD * n1p3[(u, v)] / ch2[(u, v)]
                p3f = p3top + gamma3 * p2f
            else:
                p3f = p2f
            p = (1.0 - lam) * p3f + lam * (1.0 / (vt + 1.0))
            x = -math.log(p) * 1e6
            total += int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))
        nn = len(evs)
        out[doc_id] = (nn, total, ((2 * total + nn) // (2 * nn)) / 1e6)
    return out


@pytest.fixture(scope="module")
def kn_fitted(spark):
    tr = spark.createDataFrame(TRAIN, "doc_id long, text string")
    return retrieval.lm_train_kn_trigram(tr, F.col("text"))


def test_kn_scores_match_python_replay(spark, kn_fitted):
    want = _py_kn_score(_py_kn_lm(TRAIN), TEST)
    te = spark.createDataFrame(TEST, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_micro"], r["cross_entropy"])
        for r in retrieval.lm_score_kn_trigram(
            te, F.col("text"), F.col("doc_id"), kn_fitted
        ).collect()
    }
    assert got == want


def test_kn_oov_doc_scores_exactly_the_floor(spark, kn_fitted):
    """Every backoff level zeroes out for fully-OOV tokens (even under
    a SEEN <s> history the released mass multiplies a zero lower
    order), so each event scores exactly the uniform floor."""
    lm = _py_kn_lm(TRAIN)
    vt = lm[-1]
    floor_nll = round(-math.log(0.01 * (1.0 / (vt + 1.0))) * 1e6)
    te = spark.createDataFrame([(11, "zz qq")], "doc_id long, text string")
    row = retrieval.lm_score_kn_trigram(
        te, F.col("text"), F.col("doc_id"), kn_fitted
    ).collect()[0]
    assert row["n_tokens"] == 2
    assert row["nll_micro"] == 2 * floor_nll


def test_kn_released_mass_is_conserved():
    """The defining KN identity: for every SEEN history the discounted
    top terms plus the released-mass recursion sum to EXACTLY 1 over
    the vocabulary — the discount moves probability, never destroys
    it. (Checked at every level on the replay model; the Spark model
    is pinned to the replay by test_kn_scores_match_python_replay.)"""
    c3, ch2, n1p3, cc2, den2, n1p2, cc1, nbt, vt = _py_kn_lm(TRAIN)
    vocab = set(cc1)
    assert abs(sum(cc1[w] / nbt for w in vocab) - 1.0) < 1e-12
    for v in den2:
        s = sum(
            (max(cc2[(v, w)] - KD, 0.0) / den2[v] if cc2[(v, w)] else 0.0)
            + (KD * n1p2[v] / den2[v]) * (cc1[w] / nbt)
            for w in vocab
        )
        assert abs(s - 1.0) < 1e-9, (v, s)
    for (u, v) in ch2:
        def p2f(w):
            top = max(cc2[(v, w)] - KD, 0.0) / den2[v] if cc2[(v, w)] else 0.0
            return top + (KD * n1p2[v] / den2[v]) * (cc1[w] / nbt)
        s = sum(
            (max(c3[(u, v, w)] - KD, 0.0) / ch2[(u, v)] if c3[(u, v, w)] else 0.0)
            + (KD * n1p3[(u, v)] / ch2[(u, v)]) * p2f(w)
            for w in vocab
        )
        assert abs(s - 1.0) < 1e-9, ((u, v), s)


def test_kn_partition_invariance(spark, kn_fitted):
    te = spark.createDataFrame(TEST, "doc_id long, text string")
    one = retrieval.lm_score_kn_trigram(
        te.coalesce(1), F.col("text"), F.col("doc_id"), kn_fitted
    )
    many = retrieval.lm_score_kn_trigram(
        te.repartition(7), F.col("text"), F.col("doc_id"), kn_fitted
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


@pytest.mark.parametrize("seed", [5, 17])
def test_kn_random_corpus_matches_python_replay(spark, seed):
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(10)]
    train = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15))))
        for i in range(12)
    ]
    test = [
        (100 + i, " ".join(
            rng.choice(vocab + ["oov1", "oov2"])
            for _ in range(rng.randint(1, 9))
        ))
        for i in range(8)
    ]
    tr = spark.createDataFrame(train, "doc_id long, text string")
    te = spark.createDataFrame(test, "doc_id long, text string")
    lm = retrieval.lm_train_kn_trigram(tr, F.col("text"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_micro"], r["cross_entropy"])
        for r in retrieval.lm_score_kn_trigram(
            te, F.col("text"), F.col("doc_id"), lm
        ).collect()
    }
    assert got == _py_kn_score(_py_kn_lm(train), test), seed


# -- MODIFIED Kneser-Ney (retrieval.lm_train_mkn_trigram) ----------------------
#
# No driver gate: the fixture corpus is a UNIFORM word salad whose
# count-of-counts is degenerate at every scale (measured r13: sf0.01
# trigram n=(41,2,0,1); sf1.0 n=(0,0,0,0) — with a ~31-word vocabulary
# every trigram type at sf1.0 occurs far more than 4 times), which is
# exactly the profile the Chen-Goodman estimator rejects and KenLM
# refuses with "discounts are out of range". The operator's vouch is
# therefore the pytest differential on a ZIPFIAN synthetic corpus (the
# estimator's home turf) plus the raise pin on salad-like counts.


def _py_mkn_tables(train):
    from collections import Counter

    ev = [e for _, txt in train for e in _events(txt)]
    c3 = Counter(ev)

    def discounts(vals):
        n = Counter()
        for c in vals:
            if 1 <= c <= 4:
                n[c] += 1
        n1, n2, n3, n4 = n[1], n[2], n[3], n[4]
        assert n1 and n2 and n3, "degenerate count-of-counts in test corpus"
        y = n1 / (n1 + 2.0 * n2)
        d1 = 1.0 - 2.0 * y * n2 / n1
        d2 = 2.0 - 3.0 * y * n3 / n2
        d3 = 3.0 - 4.0 * y * n4 / n3
        assert d1 >= 0 and d2 >= 0 and d3 >= 0
        return d1, d2, d3

    def disc(ds, c):
        return ds[0] if c == 1 else (ds[1] if c == 2 else ds[2])

    ds3 = discounts(c3.values())
    ch2, m = Counter(), {}
    for (u, v, w), c in c3.items():
        ch2[(u, v)] += c
        mm = m.setdefault((u, v), [0, 0, 0])
        mm[min(c, 3) - 1] += 1
    p3top = {
        g: max(c - disc(ds3, c), 0.0) / ch2[(g[0], g[1])]
        for g, c in c3.items()
    }
    gamma3 = {
        h: (ds3[0] * mm[0] + ds3[1] * mm[1] + ds3[2] * mm[2]) / ch2[h]
        for h, mm in m.items()
    }
    cc2 = Counter((v, w) for (_, v, w) in c3)
    ds2 = discounts(cc2.values())
    den2, m2 = Counter(), {}
    for (v, w), c in cc2.items():
        den2[v] += c
        mm = m2.setdefault(v, [0, 0, 0])
        mm[min(c, 3) - 1] += 1
    p2top = {
        g: max(c - disc(ds2, c), 0.0) / den2[g[0]] for g, c in cc2.items()
    }
    gamma2 = {
        v: (ds2[0] * mm[0] + ds2[1] * mm[1] + ds2[2] * mm[2]) / den2[v]
        for v, mm in m2.items()
    }
    cc1 = Counter(w for (_, w) in cc2)
    nbt = len(cc2)
    p1 = {w: c / nbt for w, c in cc1.items()}
    vt = len({w for _, _, w in ev})
    return p3top, gamma3, p2top, gamma2, p1, vt


def _py_tables_score(tables, docs, lam=0.01):
    p3top, gamma3, p2top, gamma2, p1, vt = tables
    out = {}
    for doc_id, txt in docs:
        evs = _events(txt)
        if not evs:
            continue
        total = 0
        for u, v, w in evs:
            p1f = p1.get(w, 0.0)
            if v in gamma2:
                p2f = p2top.get((v, w), 0.0) + gamma2[v] * p1f
            else:
                p2f = p1f
            if (u, v) in gamma3:
                p3f = p3top.get((u, v, w), 0.0) + gamma3[(u, v)] * p2f
            else:
                p3f = p2f
            p = (1.0 - lam) * p3f + lam * (1.0 / (vt + 1.0))
            x = -math.log(p) * 1e6
            total += int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))
        nn = len(evs)
        out[doc_id] = (nn, total, ((2 * total + nn) // (2 * nn)) / 1e6)
    return out


def _zipf_corpus(seed, n_docs=60, vocab_n=60):
    """Zipf-weighted random docs — the count-of-count profile the
    Chen-Goodman estimator assumes (plenty of 1-4-count types)."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(vocab_n)]
    wts = [1.0 / (i + 1) for i in range(vocab_n)]
    return [
        (i, " ".join(rng.choices(vocab, weights=wts, k=rng.randint(2, 18))))
        for i in range(n_docs)
    ]


@pytest.mark.parametrize("seed", [3, 29])
def test_mkn_scores_match_python_replay_on_zipf_corpus(spark, seed):
    train = _zipf_corpus(seed)
    test = _zipf_corpus(seed + 1000, n_docs=10)
    tr = spark.createDataFrame(train, "doc_id long, text string")
    te = spark.createDataFrame(test, "doc_id long, text string")
    lm = retrieval.lm_train_mkn_trigram(tr, F.col("text"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_micro"], r["cross_entropy"])
        for r in retrieval.lm_score_kn_trigram(
            te, F.col("text"), F.col("doc_id"), lm
        ).collect()
    }
    assert got == _py_tables_score(_py_mkn_tables(train), test), seed


def test_mkn_released_mass_is_conserved_on_zipf_corpus():
    train = _zipf_corpus(7)
    p3top, gamma3, p2top, gamma2, p1, vt = _py_mkn_tables(train)
    vocab = set(p1)
    assert abs(sum(p1.values()) - 1.0) < 1e-12
    for v in gamma2:
        s = sum(p2top.get((v, w), 0.0) + gamma2[v] * p1[w] for w in vocab)
        assert abs(s - 1.0) < 1e-9, (v, s)
    for (u, v) in gamma3:
        s = sum(
            p3top.get((u, v, w), 0.0)
            + gamma3[(u, v)]
            * (p2top.get((v, w), 0.0) + gamma2[v] * p1[w])
            for w in vocab
        )
        assert abs(s - 1.0) < 1e-9, ((u, v), s)


def test_mkn_refuses_degenerate_count_of_counts(spark):
    """The word-salad profile (no 3-count types) must raise where
    KenLM refuses, not train garbage discounts — this is the fixture
    corpus's profile at every sf (the reason MKN has no driver gate)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    tr = spark.createDataFrame(
        [(i, "a b a b a b") for i in range(4)], "doc_id long, text string"
    )
    lm = retrieval.lm_train_mkn_trigram(tr, F.col("text"))
    with pytest.raises(SparkRuntimeException, match="modified-KN"):
        lm.tri.collect()
