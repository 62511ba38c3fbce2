"""Hypothesis differential tests for the charset layer vs Python's codec
module (VERDICT r5 next-round #9, extending the r5 hostile-byte hardening).

Reference contract (charsequence.h:123-544): 9 charsets, invalid input
decodes to U+FFFD — never an exception. Spark 4's builtin encode/decode is
ANSI-strict by default (MALFORMED_CHARACTER_CODING throw); the engine pins
``spark.sql.legacy.codingErrorAction=true`` (session.py) to restore the
reference's REPLACE policy — this fuzz suite is what exposed that gap.

Parity tiers (established empirically, 500-payload probe):
- ascii / latin1 / utf32 / utf32le / utf32be: BYTE-EXACT parity with
  Python ``errors='replace'`` on arbitrary hostile bytes.
- utf8: parity up to U+FFFD *run length* — Java and CPython both emit
  replacements per malformed subpart but group maximal subparts
  differently (e.g. ``fe 99`` → 1 vs 2 U+FFFD). UTF-8 is
  self-synchronizing, so no VALID character is ever swallowed either way;
  collapsing U+FFFD runs makes the outputs identical.
- utf16 / utf16le / utf16be: never-throws + valid-input round-trip only.
  Java's decoder consumes an unpaired high surrogate TOGETHER with the
  following unit (one U+FFFD for 4 bytes) where CPython replaces the lone
  surrogate and re-decodes the next unit — both are standards-compliant
  U+FFFD policies, but not byte-identical on pathological input. (Java's
  no-BOM "UTF-16" also defaults big-endian vs CPython's little-endian.)
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from semantic_cpp_spark.functions import charsets as cs

# engine charset name -> Python codec implementing the same byte layout
EXACT_PARITY = {
    "ascii": "ascii",
    "latin1": "latin-1",
    "utf32": "utf-32-le",
    "utf32le": "utf-32-le",
    "utf32be": "utf-32-be",
}
ROUNDTRIP_ONLY = ["utf8", "utf16", "utf16le", "utf16be"]
ALL9 = list(EXACT_PARITY) + ROUNDTRIP_ONLY

hostile_payloads = st.lists(
    st.binary(min_size=0, max_size=24), min_size=1, max_size=12
)
texts = st.lists(st.text(max_size=20), min_size=1, max_size=12)


def _decode_all(spark, payloads, names):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i long, b binary"
    )
    sel = [cs.decode_charset(F.col("b"), n).alias(n) for n in names]
    return {r["i"]: r for r in df.select("i", *sel).collect()}


@settings(max_examples=10, deadline=None)
@given(hostile_payloads)
def test_exact_parity_charsets_match_python_replace(spark, payloads):
    rows = _decode_all(spark, payloads, list(EXACT_PARITY))
    for name, codec in EXACT_PARITY.items():
        for i, p in enumerate(payloads):
            assert rows[i][name] == p.decode(codec, errors="replace"), (
                name, p.hex())


def _collapse_fffd(s: str) -> str:
    out, prev = [], False
    for ch in s:
        if ch == "�":
            if not prev:
                out.append(ch)
            prev = True
        else:
            out.append(ch)
            prev = False
    return "".join(out)


@settings(max_examples=10, deadline=None)
@given(hostile_payloads)
def test_utf8_parity_up_to_replacement_runs(spark, payloads):
    rows = _decode_all(spark, payloads, ["utf8"])
    for i, p in enumerate(payloads):
        want = _collapse_fffd(p.decode("utf-8", errors="replace"))
        assert _collapse_fffd(rows[i]["utf8"]) == want, p.hex()


@settings(max_examples=10, deadline=None)
@given(hostile_payloads)
def test_no_charset_ever_throws_on_hostile_bytes(spark, payloads):
    rows = _decode_all(spark, payloads, ALL9)
    for i in range(len(payloads)):
        for name in ALL9:
            assert isinstance(rows[i][name], str)


@settings(max_examples=10, deadline=None)
@given(texts)
def test_valid_text_roundtrips_all_charsets(spark, xs):
    """decode(encode(s)) == s for every charset that can represent
    arbitrary text; ascii/latin1 match Python's '?'-replacement instead."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(xs)], "i long, s string"
    )
    sel = [
        cs.decode_charset(cs.encode_charset(F.col("s"), n), n).alias(n)
        for n in ALL9
    ]
    rows = {r["i"]: r for r in df.select("i", *sel).collect()}
    for i, s in enumerate(xs):
        for name in ("utf8", "utf16", "utf16le", "utf16be",
                     "utf32", "utf32le", "utf32be"):
            assert rows[i][name] == s, (name, s)
        for name, codec in (("ascii", "ascii"), ("latin1", "latin-1")):
            want = s.encode(codec, errors="replace").decode(codec)
            assert rows[i][name] == want, (name, s)


def test_coding_error_action_is_runtime_settable(spark):
    """The driver invokes queries on ITS OWN session, where load_table
    pins the conf at runtime — prove a runtime flip actually changes
    decode behavior in both directions (not just at builder time)."""
    df = spark.createDataFrame([(b"\xff\xfe\xff",)], "b binary")
    expr = cs.decode_charset(F.col("b"), "utf8").alias("s")
    try:
        spark.conf.set("spark.sql.legacy.codingErrorAction", "false")
        with pytest.raises(Exception, match="MALFORMED_CHARACTER_CODING"):
            df.select(expr).collect()
        spark.conf.set("spark.sql.legacy.codingErrorAction", "true")
        assert df.select(expr).collect()[0]["s"] == "���"
    finally:
        spark.conf.set("spark.sql.legacy.codingErrorAction", "true")
