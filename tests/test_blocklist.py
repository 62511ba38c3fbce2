"""Aho-Corasick blocklist matching (pipeline.blocklist): automaton
output vs brute-force positional counting (hypothesis-hammered),
overlap semantics, the word-granularity join form, validation, and
the exchange-free kernel plan."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from semantic_cpp_spark.pipeline import blocklist


def _brute(text, phrases):
    total = 0
    hit = set()
    for p in phrases:
        c = sum(
            1
            for i in range(len(text) - len(p) + 1)
            if text[i : i + len(p)] == p
        )
        if c:
            total += c
            hit.add(p)
    return total, len(hit)


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_automaton_matches_bruteforce(data):
    """Pure-Python: the automaton scan against positional brute force
    on random text and random phrase sets over a tiny alphabet (dense
    overlaps by construction)."""
    text = data.draw(st.text(alphabet="ab ", max_size=40))
    phrases = data.draw(
        st.lists(
            st.text(alphabet="ab ", min_size=1, max_size=4),
            min_size=1,
            max_size=6,
            unique=True,
        )
    )
    goto, fail, ends = blocklist._build_automaton(phrases)
    s, total, hit = 0, 0, [False] * len(phrases)
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for pi in ends[s]:
            total += 1
            hit[pi] = True
    assert (total, sum(hit)) == _brute(text, phrases)


def test_overlapping_and_suffix_matches(spark):
    docs = spark.createDataFrame(
        [(0, "aaa"), (1, "she said shells"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["n_phrases_hit"])
        for r in blocklist.phrase_hits(
            docs, F.col("text"), F.col("doc_id"), ["aa", "he", "she", "hell"]
        ).collect()
    }
    # 'aaa': 'aa' at positions 0 and 1 (overlapping) -> 2 hits
    assert out[0] == (2, 1)
    # 'she said shells': she@0, he@1, she@9, he@10, hell@9... wait:
    # 'shells' holds she, he, hell -> total she*2, he*2, hell*1 = 5
    assert out[1] == (5, 3)
    assert out[2] == (None, None)
    assert out[3] == (0, 0)


def test_word_blocklist_join_form(spark):
    docs = spark.createDataFrame(
        [(0, "the cat THE bat"), (1, "dog"), (2, None), (3, "  ")],
        "doc_id long, text string",
    )
    words = spark.createDataFrame([("the",), ("bat",)], "word string")
    out = {
        r["doc_id"]: (r["n_hits"], r["n_phrases_hit"])
        for r in blocklist.word_blocklist_hits(
            docs, F.col("text"), F.col("doc_id"), words
        ).collect()
    }
    assert out[0] == (3, 2)  # the, THE (lower-cased), bat
    assert out[1] == (0, 0)
    assert out[2] == (None, None)
    assert out[3] == (0, 0)


def test_blocklist_validation(spark):
    docs = spark.range(1)
    with pytest.raises(ValueError, match="empty blocklist"):
        blocklist.phrase_hits(docs, F.lit("x"), F.col("id"), [])
    with pytest.raises(ValueError, match="empty phrase"):
        blocklist.phrase_hits(docs, F.lit("x"), F.col("id"), ["a", ""])
    with pytest.raises(ValueError, match="duplicate phrase"):
        blocklist.phrase_hits(docs, F.lit("x"), F.col("id"), ["a", "a"])


def test_phrase_kernel_plan_is_exchange_free(spark):
    from semantic_cpp_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = blocklist.phrase_hits(
        docs, F.col("text"), F.col("doc_id"), ["the", "a b"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan
