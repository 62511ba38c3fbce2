"""Unigram-LM Viterbi segmentation (pipeline.unigram): piece scores
against a pure-Python occurrence count, the DP against brute-force
enumeration over all segmentations, tie-break and UNK semantics, cache
bound, and the exchange-free kernel plan."""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from semantic_cpp_spark.pipeline import unigram


def _half_up(x: float) -> int:
    return int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))


def _py_scores(words, pieces):
    """words: [(word, freq)]; pieces: [str] -> {piece: (occ, micro)}."""
    occ = {}
    for w, f in words:
        for p in pieces:
            cnt = sum(
                1 for i in range(len(w) - len(p) + 1) if w[i : i + len(p)] == p
            )
            if cnt:
                occ[p] = occ.get(p, 0) + f * cnt
    tot = sum(occ.values())
    return {p: (o, _half_up(math.log(o / tot) * 1e6)) for p, o in occ.items()}


def _brute_best(word, scores):
    """All segmentations by exhaustive split-mask; argmax total score
    with the engine's tie rule (longest final piece = smallest last
    split; recursively, the LEXICOGRAPHICALLY SMALLEST backpointer
    path when walking from the end)."""
    n = len(word)
    best = None
    for mask in range(1 << max(0, n - 1)):
        cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
        segs = [word[cuts[k] : cuts[k + 1]] for k in range(len(cuts) - 1)]
        tot = 0
        ok = True
        for s in segs:
            if s in scores:
                tot += scores[s][1]
            elif len(s) == 1:
                tot += unigram.UNK_SCORE_MICRO
            else:
                ok = False
                break
        if not ok:
            continue
        # tie key: backward-walk split points, preferring the SMALLER
        # previous position at each step (the DP's min-i rule applied
        # from the end) -> compare reversed cut positions ascending
        key = (-tot, tuple(reversed(cuts)))
        if best is None or key < best[0]:
            best = (key, segs)
    return best[1]


WORDS = [("spark", 5), ("sparse", 3), ("park", 7), ("are", 2), ("spa", 1)]
PIECES = ["s", "p", "a", "r", "k", "e", "sp", "ar", "par", "spar", "rk"]


@pytest.fixture(scope="module")
def fitted(spark):
    wdf = spark.createDataFrame(WORDS, "word string, freq long")
    pdf = spark.createDataFrame([(p,) for p in PIECES], "unit string")
    return unigram.piece_scores(wdf, pdf)


def test_piece_scores_match_python_replay(spark, fitted):
    want = _py_scores(WORDS, PIECES)
    got = {
        r["piece"]: (r["occ"], r["score_micro"]) for r in fitted.collect()
    }
    assert got == want


def test_viterbi_matches_bruteforce_on_every_train_word(spark, fitted):
    scores = _py_scores(WORDS, PIECES)
    pieces = sorted((p, m) for p, (_, m) in scores.items())
    docs = spark.createDataFrame(
        [(i, w) for i, (w, _) in enumerate(WORDS)], "doc_id long, text string"
    )
    seg = unigram.viterbi_segment(
        docs, F.col("text"), F.col("doc_id"), pieces
    )
    got = {r["doc_id"]: r["piece_text"] for r in seg.collect()}
    for i, (w, _) in enumerate(WORDS):
        assert got[i] == " ".join(_brute_best(w, scores)), w


def test_tie_breaks_toward_longest_final_piece(spark):
    # 'ab' with score(a)+score(b) == score(ab): the DP must pick the
    # single piece 'ab' (smallest split point for the last piece).
    pieces = [("a", -1_000_000), ("b", -1_000_000), ("ab", -2_000_000)]
    docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    seg = unigram.viterbi_segment(docs, F.col("text"), F.col("doc_id"), pieces)
    assert seg.collect()[0]["piece_text"] == "ab"


def test_unknown_chars_surface_as_single_char_pieces(spark):
    pieces = [("a", -1_000_000), ("b", -2_000_000)]
    docs = spark.createDataFrame([(0, "axb")], "doc_id long, text string")
    seg = unigram.viterbi_segment(docs, F.col("text"), F.col("doc_id"), pieces)
    assert seg.collect()[0]["piece_text"] == "a x b"


def test_null_empty_and_multiword_text(spark):
    pieces = [("a", -1_000_000), ("b", -2_000_000), ("ab", -1_500_000)]
    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "  "), (3, "ab a\tb")],
        "doc_id long, text string",
    )
    seg = unigram.viterbi_segment(docs, F.col("text"), F.col("doc_id"), pieces)
    got = {r["doc_id"]: r["piece_text"] for r in seg.collect()}
    assert got[0] is None
    assert got[1] == ""
    assert got[2] == ""
    assert got[3] == "ab a b"


def test_cache_cap_does_not_change_output(spark, monkeypatch):
    pieces = [("a", -1_000_000), ("b", -2_000_000), ("ab", -1_500_000)]
    docs = spark.createDataFrame(
        [(i, "ab ba ab aab") for i in range(20)], "doc_id long, text string"
    )
    full = sorted(
        map(
            tuple,
            unigram.viterbi_segment(
                docs, F.col("text"), F.col("doc_id"), pieces
            ).collect(),
        )
    )
    monkeypatch.setattr(unigram, "UNIGRAM_SEGMENT_CACHE_CAP", 1)
    tiny = sorted(
        map(
            tuple,
            unigram.viterbi_segment(
                docs, F.col("text"), F.col("doc_id"), pieces
            ).collect(),
        )
    )
    assert full == tiny


def test_inventory_validation(spark):
    docs = None
    with pytest.raises(ValueError, match="duplicate piece"):
        unigram.viterbi_segment(
            spark.range(1), F.lit("x"), F.col("id"), [("a", 1), ("a", 2)]
        )
    with pytest.raises(ValueError, match="empty piece"):
        unigram.viterbi_segment(
            spark.range(1), F.lit("x"), F.col("id"), [("", 1)]
        )


def test_kernel_plan_is_exchange_free(spark):
    from semantic_cpp_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    seg = unigram.viterbi_segment(
        docs, F.col("text"), F.col("doc_id"), [("a", -1), ("b", -2)]
    )
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


# -- driver-side EM trainer ---------------------------------------------------

TRAIN_WORDS = [
    ("lowering", 6), ("lower", 9), ("low", 11), ("newest", 7),
    ("widest", 5), ("newer", 8), ("wider", 4), ("wide", 6), ("new", 10),
]


@pytest.fixture(scope="module")
def trained(spark):
    wdf = spark.createDataFrame(TRAIN_WORDS, "word string, freq long")
    return unigram.train_pieces(
        wdf, vocab_size=24, max_piece_len=6, rounds=4
    )


def test_trainer_is_deterministic(spark, trained):
    wdf = spark.createDataFrame(
        list(reversed(TRAIN_WORDS)), "word string, freq long"
    ).repartition(5)
    again = unigram.train_pieces(
        wdf, vocab_size=24, max_piece_len=6, rounds=4
    )
    a = sorted(map(tuple, trained.pieces.collect()))
    b = sorted(map(tuple, again.pieces.collect()))
    assert a == b
    assert trained.history == again.history


def test_trainer_covers_alphabet_and_respects_budget(spark, trained):
    rows = trained.pieces.collect()
    pieces = {r["piece"] for r in rows}
    alphabet = {c for w, _ in TRAIN_WORDS for c in w}
    assert alphabet <= pieces
    assert len(pieces) <= max(24, len(alphabet))


def test_em_objective_is_monotone(trained):
    objs = [h["objective_micro"] for h in trained.history]
    # hard-EM coordinate ascent; pruning + the single-char usage floor
    # can nudge it by rounding-scale amounts, hence the small slack
    for a, b in zip(objs, objs[1:]):
        assert b >= a - 1000, objs


def test_trained_pieces_compress_better_than_chars(spark, trained):
    docs = spark.createDataFrame(
        [(i, w) for i, (w, _) in enumerate(TRAIN_WORDS)],
        "doc_id long, text string",
    )
    pieces = [
        (r["piece"], r["score_micro"]) for r in trained.pieces.collect()
    ]
    seg = unigram.viterbi_segment(docs, F.col("text"), F.col("doc_id"), pieces)
    total_pieces = sum(
        len(r["piece_text"].split(" ")) for r in seg.collect()
    )
    total_chars = sum(len(w) for w, _ in TRAIN_WORDS)
    assert total_pieces < total_chars
    # and the frequent stems surface as single pieces
    got = {r["doc_id"]: r["piece_text"] for r in seg.collect()}
    joined = " | ".join(got[i] for i in range(len(TRAIN_WORDS)))
    assert "low" in joined.split() or "new" in joined.split()


def test_trainer_word_cap_contract(spark):
    wdf = spark.createDataFrame(TRAIN_WORDS, "word string, freq long")
    with pytest.raises(ValueError, match="max_words"):
        unigram.train_pieces(wdf, vocab_size=8, max_words=3)


def test_trainer_rejects_empty_table(spark):
    wdf = spark.createDataFrame([], "word string, freq long")
    with pytest.raises(ValueError, match="empty word table"):
        unigram.train_pieces(wdf, vocab_size=8)


def test_trainer_rejects_zero_rounds(spark):
    wdf = spark.createDataFrame(TRAIN_WORDS, "word string, freq long")
    with pytest.raises(ValueError, match="rounds"):
        unigram.train_pieces(wdf, vocab_size=8, rounds=0)


def test_viterbi_segment_eow_standalone_marker(spark):
    """viterbi_segment(eow=…) emits the marker as a STANDALONE piece
    after each word — presentation-only (same pieces, same DP), making
    word boundaries stream-recoverable for the encode→decode
    round-trip (txt_unigram_roundtrip)."""
    pieces = [("a", -100), ("b", -200), ("ab", -150)]
    docs = spark.createDataFrame(
        [(0, "ab a  b"), (1, None), (2, "")],
        "doc_id long, text string",
    )
    plain = {
        r["doc_id"]: r["piece_text"]
        for r in unigram.viterbi_segment(
            docs, F.col("text"), F.col("doc_id"), pieces
        ).collect()
    }
    eow = {
        r["doc_id"]: r["piece_text"]
        for r in unigram.viterbi_segment(
            docs, F.col("text"), F.col("doc_id"), pieces, eow="</w>"
        ).collect()
    }
    assert plain[0] == "ab a b"
    assert eow[0] == "ab </w> a </w> b </w>"
    assert eow[1] is None and plain[1] is None
    assert eow[2] == "" and plain[2] == ""
    # stripping the markers recovers the plain stream exactly
    assert " ".join(p for p in eow[0].split() if p != "</w>") == plain[0]


def test_viterbi_segment_eow_validation(spark):
    pieces = [("a", -100)]
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="whitespace"):
        unigram.viterbi_segment(docs, F.col("text"), F.col("doc_id"), pieces, eow="x y")
    with pytest.raises(ValueError, match="collides"):
        unigram.viterbi_segment(docs, F.col("text"), F.col("doc_id"), pieces, eow="a")
