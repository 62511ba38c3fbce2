"""Multi-pattern blocklist matching: the C4 / RefinedWeb filtering
stage (bad-word lists, URL/domain blocklists, policy phrase lists) as
a first-class operator.

A production blocklist holds 10³-10⁵ phrases. Folding that into a
regex alternation or a per-phrase Column chain hits the same JVM
expression-depth wall the BPE fold and the when-chain lookups did
(measured failures at a few hundred terms, SCALING r11) — so this
module keeps the engine's established two-tier design:

- ``phrase_hits`` (the scale path): an Arrow kernel running a real
  AHO-CORASICK automaton (goto/fail/output links built ONCE at plan
  time, shipped in the task closure like a broadcast model) — one pass
  over each document finds every occurrence of every phrase at every
  position, cost independent of phrase count. 1→1 exchange-free
  mapInPandas, output inherits scan partitioning.
- ``word_blocklist_hits`` (the word-granularity form): when phrases
  are single whitespace tokens, matching IS an equi-join — explode
  tokens, broadcast-join the list, one groupBy. Pure Column algebra,
  pushdown-friendly, and the form a SQL engine replays verbatim.

Match semantics (both forms, and the oracle): ALL occurrences at all
starting positions, overlapping included — e.g. phrases {'aa'} in
'aaa' count 2, and phrases {'he', 'she'} in 'she' count one each.
This is the natural automaton semantics AND the position-explode
definition a serial SQL replay expresses exactly; it deliberately
differs from regexp_extract_all's non-overlapping scan
(curation.match_count), which remains the single-pattern tool.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _build_automaton(phrases: list[str]):
    """Classic Aho-Corasick: trie + BFS failure links + output counts.
    Returns (goto: list[dict[char, state]], fail: list[int],
    out: list[int]) where out[s] = number of phrases ENDING at state s
    following suffix links (pre-collapsed so matching is O(1)/char),
    and outset: list of phrase indices ending at each state (for
    per-phrase attribution)."""
    goto: list[dict[str, int]] = [{}]
    ends: list[list[int]] = [[]]
    for pi, p in enumerate(phrases):
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                ends.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        ends[s].append(pi)
    fail = [0] * len(goto)
    order = deque(goto[0].values())
    while order:
        s = order.popleft()
        for ch, t in goto[s].items():
            order.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
        # collapse output links: everything the fail state matches,
        # this state matches too
        ends[s] = ends[s] + ends[fail[s]]
    return goto, fail, ends


def phrase_hits(
    df: DataFrame,
    text: Column,
    id_col: Column,
    phrases: list[str],
) -> DataFrame:
    """(doc_id, n_hits, n_phrases_hit): total occurrence count (all
    positions, overlapping included) and number of DISTINCT phrases
    found, per document — the decision columns a filtering pass
    thresholds on. Null text → null counts; phrases must be non-empty
    and unique (raise — a duplicate would double-count silently).

    100 TB shape: the automaton is built once at plan time from the
    phrase list (model-sized — a 10⁵-phrase list is a few MB of trie)
    and ships in the task closure; matching is one linear pass per
    document inside an exchange-free 1→1 mapInPandas."""
    from pyspark.sql import types as T

    seen = set()
    for p in phrases:
        if not p:
            raise ValueError("empty phrase in blocklist")
        if p in seen:
            raise ValueError(f"duplicate phrase: {p!r}")
        seen.add(p)
    if not phrases:
        raise ValueError("empty blocklist")
    goto, fail, ends = _build_automaton(list(phrases))
    n_phrases = len(phrases)

    pre = df.select(id_col.alias("doc_id"), text.alias("__text"))
    out_schema = T.StructType(
        [
            pre.schema["doc_id"],
            T.StructField("n_hits", T.LongType(), True),
            T.StructField("n_phrases_hit", T.LongType(), True),
        ]
    )

    def _run(batches):
        import pandas as pd

        def scan(t: str) -> tuple[int, int]:
            s = 0
            total = 0
            hit = [False] * n_phrases
            for ch in t:
                while s and ch not in goto[s]:
                    s = fail[s]
                s = goto[s].get(ch, 0)
                es = ends[s]
                if es:
                    total += len(es)
                    for pi in es:
                        hit[pi] = True
            return total, sum(hit)

        for pdf in batches:
            hits, distinct = [], []
            for t in pdf["__text"]:
                if not isinstance(t, str):
                    hits.append(None)
                    distinct.append(None)
                else:
                    a, b = scan(t)
                    hits.append(a)
                    distinct.append(b)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_hits": pd.array(hits, dtype="Int64"),
                    "n_phrases_hit": pd.array(distinct, dtype="Int64"),
                }
            )

    return pre.mapInPandas(_run, schema=out_schema)


def word_blocklist_hits(
    df: DataFrame,
    text: Column,
    id_col: Column,
    words: DataFrame,
    word_col: str = "word",
) -> DataFrame:
    """Word-granularity blocklist as pure Column algebra: lower-cased
    whitespace tokens equi-joined against the (broadcast) word list;
    (doc_id, n_hits, n_phrases_hit) with the same column contract as
    phrase_hits. Documents with no hits report 0 (left-join restore),
    null text reports null. The form to prefer when the blocklist is
    token-shaped: the join is SQL-verbatim and keeps everything
    whole-stage-codegen."""
    tok = df.select(
        id_col.alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(text)), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("word"),
    )
    hits = (
        tok.join(
            F.broadcast(words.select(F.col(word_col).alias("word"))), "word"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.count_distinct("word").cast("long").alias("n_phrases_hit"),
        )
    )
    base = df.select(
        id_col.alias("doc_id"),
        F.when(text.isNull(), F.lit(None).cast("long")).otherwise(
            F.lit(0)
        ).alias("__zero"),
    )
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__zero").isNull(), F.lit(None).cast("long"))
            .otherwise(F.coalesce(F.col("n_hits"), F.lit(0)))
            .alias("n_hits"),
            F.when(F.col("__zero").isNull(), F.lit(None).cast("long"))
            .otherwise(F.coalesce(F.col("n_phrases_hit"), F.lit(0)))
            .alias("n_phrases_hit"),
        )
    )
