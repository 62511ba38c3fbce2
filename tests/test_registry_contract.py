"""Registry-contract pins: the driver's correctness gate verifies only the
first 50 entries of ``queries()`` in insertion order, so window membership is
a load-bearing property, not cosmetics."""

import json
import pathlib

from semantic_cpp_spark import registry

# Queries that had never received a driver CORRECTNESS row before round 4
# (union of CORRECTNESS_r01/r02/r03 vs the 125-query registry) — they must sit
# inside the window this round so every registered query has a hard-gate row.
NEVER_CHECKED_BEFORE_R4 = [
    "evt_sessionize",
    "evt_funnel_signup_view_purchase",
    "evt_retention_cohorts",
    "evt_interval_join_1h",
    "evt_hourly_moving_avg",
    "evt_merged_activity",
    "evt_hourly_anomalies",
    "evt_user_trend",
    "stream_static_enrich",
    "rel_cube_flag_status",
    "rel_running_customer_revenue",
    "rel_profile_lineitem",
    "rel_grouped_percentiles",
    "rel_zorder_bucket_stats",
    "rel_price_histogram",
    "pack_token_sequences",
    "txt_tfidf_keywords",
    "txt_quality_above_median",
    "txt_quality_bands",
    "txt_unigram_cross_entropy",
    "txt_fuzzy_vocab_match",
    "emb_cluster_medoids",
    "emb_pca_project",
    "dedup_keep_list",
    "samp_fixed_k_per_lang",
    "corpus_diff_versions",
]

# Queries whose implementation changed in round 4 — a historical green row no
# longer vouches for the current code, so they need a fresh one.
CHANGED_IN_R4 = ["sim_lsh_bucket_topk", "mm_feature_extract"]


def test_never_driver_checked_queries_inside_50_window():
    window = list(registry.queries())[:50]
    missing = [
        n for n in NEVER_CHECKED_BEFORE_R4 + CHANGED_IN_R4 if n not in window
    ]
    assert not missing, f"outside driver window: {missing}"


# Round-4 additions reserved in _PRIORITY; shrink as each one lands.
PLANNED: set[str] = set()


def test_priority_names_all_exist():
    # A typo in _PRIORITY silently burns a window slot; catch it here.
    names = set(registry.queries()) | PLANNED
    ghosts = [n for n in registry._PRIORITY if n not in names]
    assert not ghosts, f"_PRIORITY names not registered: {ghosts}"


def test_priority_is_exactly_the_window():
    """_PRIORITY must hold exactly 50 unique names: fewer silently shrinks
    driver coverage, more silently pushes entries out of the gate."""
    assert len(registry._PRIORITY) == 50, len(registry._PRIORITY)
    assert len(set(registry._PRIORITY)) == 50, "duplicate names in _PRIORITY"


def test_no_registered_query_left_unverified_after_r4():
    """Every name in the registry must either hold a green historical driver
    row (CORRECTNESS_r01..r03) or sit inside this round's 50-slot window."""
    root = pathlib.Path(__file__).resolve().parents[1]
    seen: set[str] = set()
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        seen |= set(json.loads(p.read_text()))
    window = set(list(registry.queries())[:50])
    orphans = [n for n in registry.queries() if n not in seen and n not in window]
    assert not orphans, f"never driver-verified and outside window: {orphans}"


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
