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


def test_replace_max_count(spark):
    """replace(target, repl, maxCount) caps at the first N occurrences
    (charsequence.h:1029-1076); maxCount=0 and empty target are no-ops."""
    s = F.lit("a.b.c.d.e")
    assert _one(spark, strings.replace_literal(s, ".", "-", 1)) == "a-b.c.d.e"
    assert _one(spark, strings.replace_literal(s, ".", "-", 2)) == "a-b-c.d.e"
    assert _one(spark, strings.replace_literal(s, ".", "-", 99)) == "a-b-c-d-e"
    assert _one(spark, strings.replace_literal(s, ".", "-", 0)) == "a.b.c.d.e"
    assert _one(spark, strings.replace_literal(s, "", "-", 3)) == "a.b.c.d.e"
    # replacement longer than target; overlapping-free left-to-right
    assert _one(spark, strings.replace_literal(F.lit("aaaa"), "aa", "XX", 1)) == "XXaa"
    # regex metachars are literal
    assert _one(spark, strings.replace_literal(F.lit("x+y+z"), "+", "*", 1)) == "x*y+z"


def test_last_index_of_from_offset(spark):
    """lastIndexOf(needle, from) bounds the match START at
    min(from, n-m); from >= n → -1; empty needle → n regardless
    (charsequence.h:940-987)."""
    s = F.lit("banana")  # 'an' at 1 and 3
    assert _one(spark, strings.last_index_of(s, "an")) == 3
    assert _one(spark, strings.last_index_of(s, "an", 3)) == 3
    assert _one(spark, strings.last_index_of(s, "an", 2)) == 1
    assert _one(spark, strings.last_index_of(s, "an", 0)) == -1
    # from >= n → -1 even though a match exists (reference :954-957)
    assert _one(spark, strings.last_index_of(s, "an", 6)) == -1
    assert _one(spark, strings.last_index_of(s, "an", 5)) == 3
    # needle longer than haystack → -1
    assert _one(spark, strings.last_index_of(F.lit("ab"), "abc", 1)) == -1
    # empty needle → size (checked before the from bound, :943-947)
    assert _one(spark, strings.last_index_of(s, "", 2)) == 6


def test_compare_three_way(spark):
    """compare is codepoint-lexicographic -1/0/1 with shorter-prefix
    tie-break (charsequence.h:1220-1249); UTF8_BINARY == codepoint order."""
    cmp = strings.compare_cs
    assert _one(spark, cmp(F.lit("apple"), F.lit("banana"))) == -1
    assert _one(spark, cmp(F.lit("banana"), F.lit("apple"))) == 1
    assert _one(spark, cmp(F.lit("same"), F.lit("same"))) == 0
    assert _one(spark, cmp(F.lit("ab"), F.lit("abc"))) == -1  # prefix < longer
    assert _one(spark, cmp(F.lit(""), F.lit("a"))) == -1
    # astral codepoint (U+1D11E) sorts above BMP chars by codepoint value
    assert _one(spark, cmp(F.lit("\U0001D11E"), F.lit("�"))) == 1


def test_blob_bytes_column(spark):
    """blob_bytes yields UTF-8 byte values 0-255 (semantic.h:2101-2118
    column form); multibyte codepoints expand; empty string → empty array."""
    assert _one(spark, strings.blob_bytes(F.lit("AB"))) == [65, 66]
    # é = 0xC3 0xA9 in UTF-8
    assert _one(spark, strings.blob_bytes(F.lit("é"))) == [0xC3, 0xA9]
    assert _one(spark, strings.blob_bytes(F.lit(""))) == []
