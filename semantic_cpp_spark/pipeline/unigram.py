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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Far below any achievable piece score: real scores are
# ln(occ/tot)·1e6 ≥ ln(1/2^63)·1e6 ≈ -4.37e7 > -1e9. Keeping it a
# round int64 constant (not -inf) keeps the DP pure integer algebra.
UNK_SCORE_MICRO = -1_000_000_000

# Same bound/idiom as text.BPE_SEGMENT_CACHE_CAP: an all-unique-word
# partition must not grow Python worker memory without limit.
UNIGRAM_SEGMENT_CACHE_CAP = 1 << 20


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
    text.bpe_word_counts' additive monoid)."""
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
) -> DataFrame:
    """Segment every whitespace word of ``text`` into the maximum-score
    piece sequence (exact int64 micro-score DP; ties break toward the
    smallest split point — see module docstring), emitting
    (doc_id, piece_text) with pieces and words single-space joined —
    the same stream shape as text.bpe_segment.

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
            n = len(word)
            # best[j] = max total micro-score over segmentations of
            # word[:j]; bp[j] = SMALLEST i achieving it (ascending i
            # with strict > keeps the first maximum).
            neg = None
            best: list[int | None] = [neg] * (n + 1)
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
            got = " ".join(reversed(out))
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
