"""Text-analysis operators for large-scale training-data pipelines
(BASELINE.json north star; the reference has no text analytics beyond the
Charsequence scalar surface, SURVEY §2.7 — this module is the Spark-native
extension).

All operators are pure Column expressions (JVM-side, codegen) over the
``documents`` table — no UDFs — so they scale to 100 TB as embarrassingly
parallel map work with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker vocabularies for the language-ID heuristic. The fixture's texts are
# synthetic word salads, so this demonstrates the marker-scoring MECHANISM
# (count matches per language, argmax with a fixed priority order) with
# deterministic, oracle-reproducible results.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "fast", "slow"],
    "de": ["data", "key", "group"],
    "es": ["query", "row", "table"],
    "zh": ["spark", "join", "merge"],
}
LANG_PRIORITY = ["en", "de", "es", "zh"]

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(col: Column) -> Column:
    """Whitespace tokenisation (regex split on \\s+ after trim)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def avg_token_len(col: Column) -> Column:
    t = tokens(col)
    total = F.aggregate(
        F.transform(t, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    return total.cast("double") / F.size(t)


def alpha_ratio(col: Column) -> Column:
    """Fraction of [a-z] characters (lowercase alpha density)."""
    return (
        F.length(F.regexp_replace(col, "[^a-z]", "")).cast("double")
        / F.length(col)
    )


def stopword_ratio(col: Column) -> Column:
    t = tokens(col)
    hits = F.size(F.filter(t, lambda w: w.isin(STOPWORDS)))
    return hits.cast("double") / F.size(t)


def quality_score(col: Column) -> Column:
    """Composite quality score: stopword density + length saturation +
    alpha density, weighted 0.4/0.3/0.3 — the standard cheap-filter shape
    for pretraining corpora (length/punct/stopword ratios)."""
    length_sat = F.least(token_count(col).cast("double") / 100.0, F.lit(1.0))
    return (
        0.4 * stopword_ratio(col) + 0.3 * length_sat + 0.3 * alpha_ratio(col)
    )


def lang_scores(col: Column) -> dict[str, Column]:
    t = tokens(col)
    return {
        lang: F.size(F.filter(t, lambda w: w.isin(words))).cast("long")
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Predicted language: argmax marker-hit count with fixed priority
    order on ties (en > de > es > zh)."""
    s = lang_scores(col)
    expr = None
    for lang in reversed(LANG_PRIORITY):
        cond = None
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            c = s[lang] >= s[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else F.when(
            cond, F.lit(lang)
        ).otherwise(expr)
    return expr


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprint/dedup: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalised text (engine-portable —
    identical in DuckDB, so oracle-checkable; a rolling hash would be
    engine-specific for no gain at this granularity)."""
    return F.md5(normalize_text(col))


def fingerprint64(col: Column) -> Column:
    """First 60 bits of the fingerprint as a non-negative long (15 hex
    digits keeps it inside int64)."""
    return F.conv(F.substring(fingerprint(col), 1, 15), 16, 10).cast("long")


def lang_id_sql_case(text_expr: str) -> str:
    """The DuckDB CASE expression equivalent of lang_id (same priority
    order), for oracle generation."""
    score = {
        lang: (
            f"length(list_filter(regexp_split_to_array(trim({text_expr}), '\\s+'), "
            f"w -> w IN ({', '.join(repr(w) for w in words)})))"
        )
        for lang, words in LANG_MARKERS.items()
    }
    clauses = []
    for lang in LANG_PRIORITY[:-1]:
        conds = " AND ".join(
            f"{score[lang]} >= {score[o]}" for o in LANG_PRIORITY if o != lang
        )
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{LANG_PRIORITY[-1]}' END"
