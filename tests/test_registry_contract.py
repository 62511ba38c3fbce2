"""Registry-contract pins: the driver's correctness gate verifies only the
first 50 entries of ``queries()`` in insertion order, so window membership is
a load-bearing property, not cosmetics."""

import json
import pathlib

from semantic_cpp_spark import registry

# Queries whose code path changed (or which are new) in round 5 — a
# historical green row no longer vouches for the current code, so each must
# sit inside this round's 50-slot driver window for a fresh one.
TOUCHED_IN_R5 = [
    "asof_purchase_last_signup",   # ts_micros import fix
    "emb_pca_project",             # output exploded to scalar rows
    "emb_pca_norm_preserved",      # new full-rank eigen oracle
    "sim_lsh_bucket_topk",         # lsh_signature fold rewrite
    "sim_embedding_near_dup",      # shares lsh_signature
    "mm_feature_extract",          # real PPM decode + new oracle
    "grp_partition_by_sorted",     # dtype-adaptive day key
    "evt_interval_join_1h",        # interval_join collision-proof bucket col
    "evt_funnel_signup_view_purchase",  # single-scan fold funnel
    "sem_distinct_comparator",     # new distinct(comparator) family query
    "sim_quantized_topk",          # new int8-quantized ANN query
    "sim_cosine_topk",             # safe_cos zero-norm guard
    "sim_ivf_topk",                # safe_cos zero-norm guard
    "sim_lsh_banded_topk",         # new banded-LSH query
    "mm_resize_features",          # new resize-chain query
    "mm_audio_features",           # new real-WAV-decode query
    "mm_video_frames",             # new real-Y4M-decode query
]


def test_r5_touched_queries_inside_50_window():
    window = list(registry.queries())[:50]
    missing = [n for n in TOUCHED_IN_R5 if n not in window]
    assert not missing, f"outside driver window: {missing}"


# Round-5 additions reserved in _PRIORITY; shrink as each one lands.
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
        for name, row in json.loads(p.read_text()).items():
            # a row only vouches if it is GREEN (ADVICE r4): err unset and
            # no explicit mismatch — rows-only rows carry null matches and
            # still count, a red row must not
            if row.get("err") is None and not any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                seen.add(name)
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
