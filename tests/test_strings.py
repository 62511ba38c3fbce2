"""Charsequence fidelity (reference charsequence.h, SURVEY §2.7/§5.2)."""

from pyspark.sql import functions as F

from semantic_cpp_spark.functions import strings


def _one(spark, col):
    return spark.range(1).select(col.alias("r")).first()["r"]


def test_ascii_only_case_mapping(spark):
    """toUpperCase/toLowerCase touch ONLY a-z/A-Z (charsequence.h:1128, :1148)
    — ß, é, etc. pass through unchanged (unlike Spark upper/lower)."""
    assert _one(spark, strings.upper_ascii(F.lit("aéßz"))) == "AéßZ"
    assert _one(spark, strings.lower_ascii(F.lit("AÉSSZ"))) == "aÉssz"


def test_split_literal_keeps_trailing_empty(spark):
    """split keeps the trailing empty field (charsequence.h:1172-1192);
    delimiter is literal, not regex."""
    assert _one(spark, strings.split_literal(F.lit("a.b."), ".")) == ["a", "b", ""]
    assert _one(spark, strings.split_literal(F.lit("a|b"), "|")) == ["a", "b"]


def test_trim_reference_whitespace_set(spark):
    """trim strips ' \\t\\n\\r\\v\\f' (charsequence.h:1365-1368)."""
    assert _one(spark, strings.trim_ref(F.lit("\t\n x \x0b\x0c\r"))) == "x"


def test_count_occurrences_non_overlapping(spark):
    """count(needle) is non-overlapping left-to-right (charsequence.h:1078-1103)."""
    assert _one(spark, strings.count_occurrences(F.lit("aaaa"), "aa")) == 2
    assert _one(spark, strings.count_occurrences(F.lit("abcabc"), "abc")) == 2
    assert _one(spark, strings.count_occurrences(F.lit("abc"), "zz")) == 0


def test_index_of_zero_based_minus_one(spark):
    """indexOf: 0-based, -1 when absent (charsequence.h:900-938)."""
    assert _one(spark, strings.index_of(F.lit("hello"), "ll")) == 2
    assert _one(spark, strings.index_of(F.lit("hello"), "zz")) == -1
    assert _one(spark, strings.index_of(F.lit("ababab"), "ab", 1)) == 2


def test_replace_literal(spark):
    assert _one(spark, strings.replace_literal(F.lit("a.b.c"), ".", "-")) == "a-b-c"


def test_sub_clamps(spark):
    """Charsequence::sub clamps instead of throwing (charsequence.h:786-810)."""
    assert _one(spark, strings.sub_clamped(F.lit("hello"), 1, 3)) == "ell"
    assert _one(spark, strings.sub_clamped(F.lit("hello"), 3, 99)) == "lo"


def test_codepoint_indexing_beyond_bmp(spark):
    """The reference indexes by CODE POINT (charsequence.h:666: vector of
    Points); Spark strings agree even for astral chars (surrogate pairs in
    UTF-16 count as ONE position)."""
    s = "a\U0001D11Eb\U0001F600"  # a, MUSICAL SYMBOL G CLEF, b, emoji
    assert _one(spark, F.length(F.lit(s))) == 4
    assert _one(spark, F.substring(F.lit(s), 2, 1)) == "\U0001D11E"
    assert _one(spark, strings.sub_clamped(F.lit(s), 2, 2)) == "b\U0001F600"
    assert _one(spark, strings.reverse_str(F.lit(s))) == "\U0001F600b\U0001D11Ea"
    assert _one(spark, strings.index_of(F.lit(s), "b")) == 2
    # split on empty pattern yields per-codepoint elements
    assert _one(spark, F.split(F.lit(s), "")) == ["a", "\U0001D11E", "b", "\U0001F600"]
