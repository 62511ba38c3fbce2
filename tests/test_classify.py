"""Multinomial Naive Bayes (pipeline.classify): model values against a
pure-Python replay, argmax/tie-break/empty-doc semantics, and partition
invariance of the exact integer scoring."""

import math

import pytest
from pyspark.sql import functions as F

from semantic_cpp_spark.pipeline import classify


def _py_nb(train, alpha=1.0, vocab_size=50_000):
    """Serial NB replay: returns (model {(term,label): lp_micro},
    priors {label: prior_micro}, vocab set)."""
    tok = [(lab, t) for lab, txt in train for t in txt.lower().split() if t]
    cnt_all = {}
    for _, t in tok:
        cnt_all[t] = cnt_all.get(t, 0) + 1
    vocab = sorted(cnt_all, key=lambda t: (-cnt_all[t], t))[:vocab_size]
    vset = set(vocab)
    labels = sorted({lab for lab, _ in train})
    cnts = {}
    for lab, t in tok:
        if t in vset:
            cnts[(lab, t)] = cnts.get((lab, t), 0) + 1
    tots = {lab: sum(c for (l, _), c in cnts.items() if l == lab) for lab in labels}
    v = len(vocab)
    model = {
        (t, lab): int(
            _half_up(math.log((cnts.get((lab, t), 0) + alpha) / (tots[lab] + alpha * v)) * 1e6)
        )
        for t in vocab
        for lab in labels
    }
    n = len(train)
    n_l = {lab: sum(1 for l, _ in train if l == lab) for lab in labels}
    priors = {lab: int(_half_up(math.log(n_l[lab] / n) * 1e6)) for lab in labels}
    return model, priors, vset


def _half_up(x: float) -> float:
    # HALF_UP (away from zero), matching Spark F.round / DuckDB round.
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _py_predict(model, priors, vset, docs):
    out = {}
    for doc_id, txt in docs:
        scores = dict(priors)
        for t in txt.lower().split():
            if t in vset:
                for lab in priors:
                    scores[lab] += model[(t, lab)]
        best = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[doc_id] = best
    return out


TRAIN = [
    ("en", "the cat sat on the mat"),
    ("en", "the dog ate the food"),
    ("de", "der hund und die katze"),
    ("de", "die katze sitzt auf der matte"),
    ("es", "el gato y el perro"),
]

TEST = [
    (0, "the cat and the dog"),
    (1, "der hund sitzt auf der matte"),
    (2, "el gato"),
    (3, ""),                      # zero vocab tokens -> priors argmax
    (4, "zzz qqq unseen words"),  # all-OOV -> priors argmax
]


@pytest.fixture(scope="module")
def fitted(spark):
    tr = spark.createDataFrame(TRAIN, "label string, text string")
    nbm = classify.nb_train(tr, F.col("text"), F.col("label"))
    return nbm


def test_model_matches_python_replay(spark, fitted):
    model, priors, _ = _py_nb(TRAIN)
    got = {
        (r["term"], r["label"]): r["lp_micro"]
        for r in fitted.model.collect()
    }
    assert got == model
    got_p = {r["label"]: r["prior_micro"] for r in fitted.priors.collect()}
    assert got_p == priors


def test_predictions_match_python_replay(spark, fitted):
    model, priors, vset = _py_nb(TRAIN)
    want = _py_predict(model, priors, vset, TEST)
    te = spark.createDataFrame(TEST, "doc_id long, text string")
    pred = classify.nb_predict(te, F.col("text"), F.col("doc_id"), fitted)
    rows = {r["doc_id"]: r for r in pred.collect()}
    assert len(rows) == len(TEST)
    for doc_id, (lab, score) in want.items():
        assert rows[doc_id]["predicted"] == lab, doc_id
        assert rows[doc_id]["score_micro"] == score, doc_id


def test_empty_and_oov_docs_fall_back_to_prior_argmax(spark, fitted):
    te = spark.createDataFrame(TEST, "doc_id long, text string")
    pred = classify.nb_predict(te, F.col("text"), F.col("doc_id"), fitted)
    rows = {r["doc_id"]: r for r in pred.collect()}
    # en and de both have 2/5 prior (tie) -> label ascending wins: 'de'
    for doc_id in (3, 4):
        assert rows[doc_id]["predicted"] == "de"
        assert rows[doc_id]["n_vocab_tokens"] == 0


def test_margin_is_top1_minus_top2(spark, fitted):
    te = spark.createDataFrame(TEST, "doc_id long, text string")
    pred = classify.nb_predict(te, F.col("text"), F.col("doc_id"), fitted)
    row = {r["doc_id"]: r for r in pred.collect()}[3]
    # doc 3 scores = priors alone: en == de (tie), so margin == 0
    assert row["margin_micro"] == 0


def test_partition_invariance(spark, fitted):
    te = spark.createDataFrame(TEST, "doc_id long, text string")
    a = classify.nb_predict(te, F.col("text"), F.col("doc_id"), fitted)
    b = classify.nb_predict(
        te.repartition(7), F.col("text"), F.col("doc_id"), fitted
    )
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_vocab_cut_is_deterministic(spark):
    # vocab_size=2 with frequency ties: cut breaks on (count desc, term asc)
    tr = spark.createDataFrame(
        [("a", "x x y z"), ("b", "y z w w")], "label string, text string"
    )
    nbm = classify.nb_train(tr, F.col("text"), F.col("label"), vocab_size=2)
    terms = sorted({r["term"] for r in nbm.model.collect()})
    # counts: x=2, w=2, y=2, z=2 -> all tie at 2; term asc -> w, x
    assert terms == ["w", "x"]


def test_confusion_fingerprints_pin_membership(spark, fitted):
    te = spark.createDataFrame(TEST, "doc_id long, text string")
    pred = classify.nb_predict(te, F.col("text"), F.col("doc_id"), fitted)
    truth = spark.createDataFrame(
        [(0, "en"), (1, "de"), (2, "es"), (3, "de"), (4, "de")],
        "doc_id long, label string",
    )
    conf = classify.nb_confusion(pred, truth).collect()
    total = sum(r["n_docs"] for r in conf)
    assert total == len(TEST)
    import hashlib

    for r in conf:
        assert len(r["docs_fp"]) == 32
    # the (de, de) cell holds docs 1, 3, 4 -> fingerprint is md5('1_3_4')
    cell = {(r["label"], r["predicted"]): r for r in conf}
    got = cell[("de", "de")]
    assert got["docs_fp"] == hashlib.md5(b"1_3_4").hexdigest()
    assert got["n_docs"] == 3


def test_single_label_training(spark):
    """One label: every doc predicts it, margin is NULL (no runner-up),
    and the prior contributes ln(1) = 0."""
    tr = spark.createDataFrame(
        [("en", "the cat"), ("en", "a dog")], "label string, text string"
    )
    nbm = classify.nb_train(tr, F.col("text"), F.col("label"))
    assert {r["prior_micro"] for r in nbm.priors.collect()} == {0}
    te = spark.createDataFrame([(0, "the"), (1, "zzz")], "doc_id long, text string")
    rows = classify.nb_predict(te, F.col("text"), F.col("doc_id"), nbm).collect()
    assert all(r["predicted"] == "en" for r in rows)
    assert all(r["margin_micro"] is None for r in rows)


def test_null_labels_are_excluded_from_training(spark):
    tr = spark.createDataFrame(
        [("en", "the cat"), (None, "der hund"), ("es", "el gato")],
        "label string, text string",
    )
    nbm = classify.nb_train(tr, F.col("text"), F.col("label"))
    labels = {r["label"] for r in nbm.priors.collect()}
    assert labels == {"en", "es"}
    # priors over the 2 SURVIVING docs: round(ln(1/2)*1e6) each
    assert all(r["prior_micro"] == -693147 for r in nbm.priors.collect())


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_corpus_matches_python_replay(spark, seed):
    """Seeded random corpora (skewed word distribution, variable doc
    lengths, OOV-heavy test docs) through train+predict vs the serial
    replay — the differential at inputs the fixed corpus never shapes."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    labels = ["a", "b", "c"]
    train = [
        (
            rng.choice(labels),
            " ".join(
                rng.choice(vocab[: 4 + 4 * (i % 3)])
                for _ in range(rng.randint(1, 12))
            ),
        )
        for i in range(25)
    ]
    test = [
        (
            i,
            " ".join(
                rng.choice(vocab + ["zzz", "qqq"])
                for _ in range(rng.randint(0, 8))
            ),
        )
        for i in range(12)
    ]
    tr = spark.createDataFrame(train, "label string, text string")
    nbm = classify.nb_train(tr, F.col("text"), F.col("label"), vocab_size=9)
    model, priors, vset = _py_nb(train, vocab_size=9)
    got_m = {
        (r["term"], r["label"]): r["lp_micro"] for r in nbm.model.collect()
    }
    assert got_m == model, seed
    te = spark.createDataFrame(test, "doc_id long, text string")
    pred = {
        r["doc_id"]: (r["predicted"], r["score_micro"])
        for r in classify.nb_predict(
            te, F.col("text"), F.col("doc_id"), nbm
        ).collect()
    }
    assert pred == _py_predict(model, priors, vset, test), seed


def test_all_oov_label_keeps_dense_model_column(spark):
    """A label whose every training token falls OUTSIDE the vocabulary
    must still hold a full vocab-sized model column with
    lp = ln(alpha/(alpha·V)) (tot = 0), not vanish from the model —
    the inner-join bug let it score prior-only and win argmax for
    token-rich documents (ADVICE r12)."""
    tr = spark.createDataFrame(
        [
            ("en", "the the the cat cat dog"),
            ("en", "the cat dog dog"),
            ("xx", "zzz qqq"),  # every xx token will be cut from vocab
        ],
        "label string, text string",
    )
    # vocab_size=3 keeps {the, cat, dog}; zzz/qqq are dropped -> xx
    # trains on zero in-vocab tokens.
    nbm = classify.nb_train(tr, F.col("text"), F.col("label"), vocab_size=3)
    rows = nbm.model.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], {})[r["term"]] = r["lp_micro"]
    assert set(by_label) == {"en", "xx"}
    assert len(by_label["xx"]) == 3  # dense: vocab_size rows for xx too
    want_xx = int(_half_up(math.log(1.0 / 3.0) * 1e6))
    assert all(v == want_xx for v in by_label["xx"].values())
    # a token-rich doc must NOT flip to the all-OOV label: per-token
    # xx cost ln(1/3) is worse than en's smoothed in-vocab terms.
    te = spark.createDataFrame(
        [(0, "the the cat dog the cat")], "doc_id long, text string"
    )
    pred = classify.nb_predict(te, F.col("text"), F.col("doc_id"), nbm).collect()
    assert pred[0]["predicted"] == "en"


def test_confusion_fp_string_ids_distinct(spark):
    """Non-numeric doc ids must fingerprint by value, not collapse to
    one empty-concat md5 via a silent cast('long')→NULL drop
    (ADVICE r12): two cells with different string-id memberships get
    different fingerprints."""
    pred = spark.createDataFrame(
        [("a-1", "en"), ("b-2", "en"), ("c-3", "es")],
        "doc_id string, predicted string",
    )
    truth = spark.createDataFrame(
        [("a-1", "en"), ("b-2", "es"), ("c-3", "es")],
        "doc_id string, label string",
    )
    rows = classify.nb_confusion(pred, truth).collect()
    fps = {(r["label"], r["predicted"]): r["docs_fp"] for r in rows}
    assert len(fps) == 3 and len(set(fps.values())) == 3
    import hashlib

    assert fps[("en", "en")] == hashlib.md5(b"a-1").hexdigest()
    assert fps[("es", "en")] == hashlib.md5(b"b-2").hexdigest()
    assert fps[("es", "es")] == hashlib.md5(b"c-3").hexdigest()
