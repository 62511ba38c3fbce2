"""Registry-contract pins: the driver's correctness gate verifies only the
first 50 entries of ``queries()`` in insertion order, so window membership is
a load-bearing property, not cosmetics."""

from semantic_cpp_spark import registry

# Queries that had never received a driver CORRECTNESS row before round 3
# (registry positions 50-76 in r01/r02) — they must sit inside the window.
NEVER_CHECKED_BEFORE_R3 = [
    "stream_tumble_hour",
    "stream_slide_2h_30m",
    "stream_session_5m",
    "stream_distinct_keys",
    "stream_running_stats",
    "stream_count_windows",
    "stream_stream_join",
    "stream_topk_per_user",
    "rel_q7_nation_volume",
    "rel_q10_returned_items",
    "rel_q14_promo_share",
    "rel_q19_bracketed_discounts",
    "rel_q4_semi_join",
    "rel_customers_without_urgent_orders",
    "asof_purchase_last_signup",
    "rel_rollup_order_priority",
    "rel_pivot_status_by_flag",
    "rel_datetime_parts",
    "udaf_per_order_weighted_avg",
    "reduce_bit_xor",
    "agg_distribution_profile",
    "agg_corr_covar",
    "str_charsequence_medley",
    "str_codepoint_sequence",
    "str_levenshtein_to_anchor",
    "txt_word_count_topk",
    "evt_json_extract",
]


def test_never_driver_checked_queries_inside_50_window():
    window = list(registry.queries())[:50]
    missing = [n for n in NEVER_CHECKED_BEFORE_R3 if n not in window]
    assert not missing, f"outside driver window: {missing}"


# Round-3 additions reserved in _PRIORITY; shrink as each one lands.
PLANNED: set[str] = set()


def test_priority_names_all_exist():
    # A typo in _PRIORITY silently burns a window slot; catch it here.
    names = set(registry.queries()) | PLANNED
    ghosts = [n for n in registry._PRIORITY if n not in names]
    assert not ghosts, f"_PRIORITY names not registered: {ghosts}"


def test_every_query_callable_and_oracles_subset():
    qs = registry.queries()
    assert all(callable(f) for f in qs.values())
    assert set(registry.oracle_sql()) <= set(qs)


def test_query_names_are_slugs():
    """A register() call that loses its name argument silently registers
    the SQL text as the query name (and the query becomes rows-only in
    the driver gate) — pin the name shape instead."""
    import re

    for name in registry.queries():
        assert re.fullmatch(r"[a-z0-9_]{3,60}", name), repr(name)[:80]
