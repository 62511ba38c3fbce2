"""Unigram-LM (SentencePiece-style) subword segmentation.

The second major learned-tokenizer family next to BPE (Kudo 2018,
"Subword Regularization"; the SentencePiece unigram model): instead of
replaying merge rules, score every candidate piece with a log-
probability and segment each word by VITERBI — the piece sequence
maximizing the summed scores.  Where BPE's segmentation is procedural
(apply rules in rank order), unigram's is declarative (argmax over all
segmentations), which is what makes it the better fit for sampling-
based subword regularization and for inventories assembled from
multiple sources.

This module keeps the engine's established tokenizer architecture:

- piece SCORES are corpus statistics computed distributed
  (``piece_scores``: weighted substring occurrences over the
  vocab-sized word table — never a corpus-scale pass), rounded to
  int64 micro-units at the model boundary so the DP cost of every
  segmentation is an EXACT integer — partition-order-free, and
  serially replayable by an unrolled SQL DP;
- SEGMENTATION is an Arrow kernel (``viterbi_segment``), a 1→1
  exchange-free mapInPandas over (doc_id, text) with the piece table
  in the task closure and the same bounded per-task word cache as the
  BPE kernel (text._bpe_segment_kernel) — cost independent of
  inventory size, inherits scan partitioning at any corpus scale.

Determinism contract: DP ties (two segmentations with equal total
micro-score) break toward the SMALLEST split point at every position
(equivalently: the longest final piece), chosen by ascending-index
iteration with strict improvement — the same rule the oracle's
``min(i) FILTER (cand = max)`` replays.  Out-of-inventory single
characters (possible only when segmenting text whose alphabet the
piece inventory doesn't cover) take UNK_SCORE_MICRO, a constant far
below any real piece score, so coverage is total and unknown
characters surface as single-char pieces.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Far below any achievable piece score: real scores are
# ln(occ/tot)·1e6 ≥ ln(1/2^63)·1e6 ≈ -4.37e7 > -1e9. Keeping it a
# round int64 constant (not -inf) keeps the DP pure integer algebra.
UNK_SCORE_MICRO = -1_000_000_000

# Same bound/idiom as text.BPE_SEGMENT_CACHE_CAP: an all-unique-word
# partition must not grow Python worker memory without limit.
UNIGRAM_SEGMENT_CACHE_CAP = 1 << 20


def _viterbi(word: str, scores: dict[str, int], ml: int, unk: int) -> list[str]:
    """The shared DP core (kernel tasks AND the driver-side EM trainer
    call exactly this function, so their segmentations agree by
    construction): maximum total micro-score segmentation of ``word``,
    ties toward the smallest split point (ascending-i iteration with
    strict improvement), single-char fallback at ``unk`` for characters
    outside the inventory."""
    n = len(word)
    best: list[int | None] = [None] * (n + 1)
    best[0] = 0
    bp = [0] * (n + 1)
    for j in range(1, n + 1):
        b = None
        arg = 0
        for i in range(max(0, j - ml), j):
            prev = best[i]
            if prev is None:
                continue
            s = scores.get(word[i:j])
            if s is None:
                if j - i == 1:
                    s = unk
                else:
                    continue
            cand = prev + s
            if b is None or cand > b:
                b, arg = cand, i
        best[j] = b
        bp[j] = arg
    out: list[str] = []
    j = n
    while j > 0:
        i = bp[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def piece_scores(
    words: DataFrame, pieces: DataFrame, piece_col: str = "unit"
) -> DataFrame:
    """(piece, occ, score_micro): unigram log-probabilities from
    frequency-weighted substring occurrences.

    occ(p) = Σ_words freq(w) · #{positions i : w[i : i+|p|] = p}
    (OVERLAPPING occurrences counted — the position-explode definition
    both engines express identically), and
    score = round(ln(occ / Σocc)·1e6) as int64.

    Pieces absent from every word are dropped (occ = 0 has no ln);
    by construction a corpus-derived inventory (e.g. text.bpe_vocab
    units) never loses a piece this way.

    Scale: the explode is |words| · len · max_piece_len rows over the
    VOCAB-sized word table, joined to the piece table on the substring
    key — bounded by model-shaped inputs, independent of corpus size
    (the corpus was already reduced to (word, freq) by
    text.bpe_word_counts' additive monoid).

    Materialization (r15): ``pieces`` is referenced twice (the ml
    collect + the broadcast join) and ``occ`` twice (the totals
    aggregate + the result projection) — as lazy lineage each reference
    re-ran its upstream, so a vocab-derived piece table (alphabet
    distinct + ordinal sort) executed twice and the substring explode
    twice per call. Both are model-sized by this function's own
    contract, so they localCheckpoint: one vocab pass, one explode."""
    pieces = pieces.select(F.col(piece_col).alias(piece_col)).localCheckpoint()
    ml_row = pieces.agg(F.max(F.length(piece_col))).collect()[0][0]
    if ml_row is None:
        raise ValueError("piece inventory is empty")
    ml = int(ml_row)
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(ml), F.length(w) - i + F.lit(1))
                ),
                lambda l: w.substr(i, l),
            ),
        )
    )
    occ = (
        words.filter(F.length("word") >= 1)
        .select(F.col("freq"), F.explode(subs).alias("piece"))
        .join(
            F.broadcast(pieces.select(F.col(piece_col).alias("piece"))),
            "piece",
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("occ"))
        .localCheckpoint()  # ≤ |pieces| rows; feeds tot AND the result
    )
    tot = occ.agg(F.sum("occ").cast("long").alias("tot"))
    return occ.crossJoin(F.broadcast(tot)).select(
        "piece",
        "occ",
        F.round(
            F.log(F.col("occ").cast("double") / F.col("tot"))
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("score_micro"),
    )


def collect_pieces(scores: DataFrame) -> list[tuple[str, int]]:
    """Collect a piece_scores frame into the [(piece, score_micro)]
    closure shape viterbi_segment ships to tasks (model-sized — the
    piece inventory is the caller-bounded vocabulary, never corpus
    data). Deterministic order (piece asc) for stable task closures."""
    rows = scores.select("piece", "score_micro").orderBy("piece").collect()
    return [(r["piece"], int(r["score_micro"])) for r in rows]


def viterbi_segment(
    df: DataFrame,
    text: Column,
    id_col: Column,
    pieces: list[tuple[str, int]],
    eow: str | None = None,
) -> DataFrame:
    """Segment every whitespace word of ``text`` into the maximum-score
    piece sequence (exact int64 micro-score DP; ties break toward the
    smallest split point — see module docstring), emitting
    (doc_id, piece_text) with pieces and words single-space joined —
    the same stream shape as text.bpe_segment.

    With ``eow`` the kernel emits the marker as a STANDALONE piece
    after each word's sequence ("pi pi </w> pi </w> …"), making word
    boundaries recoverable from the stream — encode against a
    vocabulary holding the marker as its own unit and
    text.decode_subwords(eow=…) inverts the whole chain back to the
    whitespace-normalized source (the unigram half of the
    decode(encode(x)) == normalize(x) lifecycle contract; the BPE
    family reaches the same property by suffixing the marker INTO its
    units at train time, which unigram's substring-occurrence scores
    cannot — a standalone boundary piece is presentation-only and
    leaves the DP untouched). The marker must not collide with any
    piece or contain whitespace.

    100 TB shape: identical to the BPE kernel — 1→1 mapInPandas, no
    explode, no shuffle, output inherits scan partitioning; per-task
    state is the piece dict plus the bounded word cache."""
    from pyspark.sql import types as T

    scores: dict[str, int] = {}
    for p, s in pieces:
        if p in scores:
            raise ValueError(f"duplicate piece: {p!r}")
        if p == "":
            raise ValueError("empty piece in inventory")
        scores[p] = int(s)
    if eow is not None:
        if eow == "" or any(ch.isspace() for ch in eow):
            raise ValueError(f"eow must be non-empty, whitespace-free: {eow!r}")
        if eow in scores:
            raise ValueError(f"eow collides with a piece: {eow!r}")
    ml = max(len(p) for p in scores)
    cache_cap = int(UNIGRAM_SEGMENT_CACHE_CAP)
    unk = int(UNK_SCORE_MICRO)

    pre = df.select(id_col.alias("doc_id"), text.alias("__text"))
    out_schema = T.StructType(
        [
            pre.schema["doc_id"],
            T.StructField("piece_text", T.StringType(), True),
        ]
    )
    import re

    _ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s, as the BPE kernel

    def _run(batches):
        import pandas as pd

        cache: dict[str, str] = {}

        def seg(word: str) -> str:
            got = cache.get(word)
            if got is not None:
                return got
            got = " ".join(_viterbi(word, scores, ml, unk))
            if eow is not None:
                got = got + " " + eow
            if len(cache) >= cache_cap:
                cache.clear()
            cache[word] = got
            return got

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "piece_text": [
                        None
                        if not isinstance(t, str)
                        else " ".join(
                            seg(w) for w in _ws.split(t.strip(" ")) if w
                        )
                        for t in pdf["__text"]
                    ],
                }
            )

    return pre.mapInPandas(_run, schema=out_schema)


# -- driver-side EM training over the collected word table --------------------

# The hybrid-BPE contract (text.bpe_train_merges' local fast path): the
# DISTRIBUTED part of tokenizer training is reducing the corpus to the
# (word, freq) table — vocab-sized, Zipf-bounded — and the iterative
# part runs in driver memory against it. This cap refuses corpora whose
# word table would not fit (the caller then cleans or pre-splits words
# first; a 100 TB corpus with a sane alphabet stays far below it).
UNIGRAM_TRAIN_MAX_WORDS = 5_000_000


class UnigramModel:
    """Result of train_pieces: ``pieces`` is a (piece, score_micro,
    usage) DataFrame ready for collect_pieces/viterbi_segment;
    ``history`` records per-round (n_pieces, objective_micro) — the
    corpus total micro-score of the round's Viterbi segmentation, the
    hard-EM objective (non-decreasing round over round up to the
    1-micro-per-piece rounding granularity; pruning between rounds may
    step it down, recorded as its own entry)."""

    def __init__(self, pieces: DataFrame, history: list[dict]):
        self.pieces = pieces
        self.history = history


def _seed_inventory(
    rows: list[tuple[str, int]], max_piece_len: int, seed_size: int
) -> dict[str, int]:
    """Weighted OVERLAPPING substring occurrence counts (the
    piece_scores definition), cut to single chars (always kept) + the
    top ``seed_size`` longer substrings by (occ DESC, piece ASC)."""
    occ: dict[str, int] = {}
    for w, f in rows:
        n = len(w)
        for i in range(n):
            for l in range(1, min(max_piece_len, n - i) + 1):
                p = w[i : i + l]
                occ[p] = occ.get(p, 0) + f
    chars = {p: c for p, c in occ.items() if len(p) == 1}
    longer = sorted(
        ((p, c) for p, c in occ.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    return {**chars, **dict(longer)}


def _em_scores(usage: dict[str, int]) -> tuple[dict[str, int], int]:
    """M-step: score = round(ln(usage/total)·1e6). Single-char pieces
    are REQUIRED for coverage and keep a floor usage of 1 when unused;
    longer pieces with zero usage are dropped (hard-EM zero posterior).
    Returns (scores, total)."""
    eff = {
        p: (u if u > 0 else 1)
        for p, u in usage.items()
        if u > 0 or len(p) == 1
    }
    total = sum(eff.values())
    scores = {
        p: _round_half_away(math.log(u / total) * 1e6)
        for p, u in sorted(eff.items())
    }
    return scores, total


def _round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))


def train_pieces(
    words: DataFrame,
    vocab_size: int = 8_000,
    max_piece_len: int = 8,
    rounds: int = 4,
    prune_frac: float = 0.25,
    seed_size: int | None = None,
    max_words: int = UNIGRAM_TRAIN_MAX_WORDS,
) -> UnigramModel:
    """Train a unigram-LM piece inventory by deterministic hard EM
    (Viterbi-EM — the E-step takes each word's single best
    segmentation rather than the forward-backward posterior;
    deterministic by the DP's tie rule, and the standard
    quality/simplicity trade the SentencePiece paper itself offers
    for its final Viterbi inference).

    Round = E-step (segment every distinct word with the shared
    _viterbi core, usage[piece] += freq·multiplicity) then M-step
    (score = ln(usage/total) in micro-units; unused longer pieces
    drop, single chars keep a floor so coverage never breaks), then a
    gradual prune toward ``vocab_size``: keep all single chars + the
    top remaining pieces by (usage DESC, piece ASC), shedding at most
    ``prune_frac`` of the over-budget excess per round (SentencePiece's
    gradual shrink), with a hard cut to budget after the final round.

    The input is the distributed (word, freq) table
    (text.bpe_word_counts); training collects it under the
    ``max_words`` contract — the same shape as the hybrid BPE trainer:
    corpus-scale work happens once in the word count, EM state is
    vocab-sized."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1: {rounds}")
    n_words = words.count()
    if n_words > max_words:
        raise ValueError(
            f"word table has {n_words} rows > max_words={max_words}; "
            "clean the corpus or raise the cap explicitly"
        )
    rows = [
        (r["word"], int(r["freq"]))
        for r in words.select("word", "freq").collect()
        if r["word"]
    ]
    rows.sort()
    if not rows:
        raise ValueError("empty word table")
    if seed_size is None:
        seed_size = 4 * vocab_size
    inv = _seed_inventory(rows, max_piece_len, seed_size)
    # seed scores from raw occurrence counts (piece_scores semantics)
    total0 = sum(inv.values())
    scores = {
        p: _round_half_away(math.log(c / total0) * 1e6)
        for p, c in sorted(inv.items())
    }
    history: list[dict] = []
    n_chars = sum(1 for p in scores if len(p) == 1)
    for rnd in range(1, rounds + 1):
        ml = max(len(p) for p in scores)
        usage: dict[str, int] = {p: 0 for p in scores}
        objective = 0
        for w, f in rows:
            for piece in _viterbi(w, scores, ml, UNK_SCORE_MICRO):
                # UNK single chars can only appear if the corpus and
                # inventory disagree — impossible here (seed covers
                # every corpus char), so every piece is in usage
                usage[piece] += f
                objective += f * scores.get(piece, UNK_SCORE_MICRO)
        scores, _ = _em_scores(usage)
        history.append(
            {
                "round": rnd,
                "n_pieces": len(scores),
                "objective_micro": objective,
            }
        )
        # gradual prune toward budget (never below the char alphabet)
        budget = max(vocab_size, n_chars)
        excess = len(scores) - budget
        if excess > 0:
            shed = (
                excess
                if rnd == rounds
                else min(excess, max(1, int(excess * prune_frac)))
            )
            longer = sorted(
                ((p, usage.get(p, 0)) for p in scores if len(p) > 1),
                key=lambda pu: (-pu[1], pu[0]),
            )
            keep_longer = [p for p, _ in longer[: len(longer) - shed]]
            kept = {p: usage.get(p, 0) for p in keep_longer}
            kept.update(
                {p: usage.get(p, 0) for p in scores if len(p) == 1}
            )
            scores, _ = _em_scores(kept)
    spark = words.sparkSession
    final_usage = usage
    out = [
        (p, int(s), int(final_usage.get(p, 0)))
        for p, s in sorted(scores.items())
    ]
    pieces = spark.createDataFrame(
        out, "piece string, score_micro long, usage long"
    )
    return UnigramModel(pieces=pieces, history=history)
