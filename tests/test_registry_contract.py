"""Registry-contract pins: the driver's correctness gate verifies only the
first 50 entries of ``queries()`` in insertion order, so window membership is
a load-bearing property, not cosmetics. Also pins the oracle RESULT-TYPE
contract: every oracle column must land in the type set the driver
canonicalizes identically to Spark (the r6 ``samp_train_val_split`` failure
was DuckDB ``sum(INTEGER)`` silently returning HUGEINT)."""

import json
import os
import pathlib

import duckdb
import pytest

from semantic_cpp_spark import registry

# Queries that are new (or re-enter on a behavioral change) in round 13 —
# each must sit inside this round's 50-slot driver window for a fresh row.
TOUCHED_IN_R13 = [
    # rule-(b) family-consolidation first rows — each carries its r8
    # members' rotation deadline (r13 gate consolidation; members were
    # unregistered, every member row survives in the tagged union):
    "dedup_simhash_family",
    "emb_semdedup_family",
    "mm_decode_family",
    "evt_rollup_merge_family",
    "agg_sketch_cardinality",
    # rule-(b) r12 differential-tier first rows:
    "txt_bpe_vocab",
    "txt_tokenizer_stats",
    "txt_encode_subwords",
    "txt_nb_holdout_confusion",
    "txt_lm_perplexity_bands",
    "txt_unigram_viterbi",
    "txt_subword_roundtrip",
    "txt_tokenizer_compare",
    "txt_blocklist_hits",
    # rule-(a) re-entries: EXECUTED paths changed in r13 (the
    # half-boundary audit conversions to stats.ratio_round6):
    "evt_markov_transitions",
    "evt_dau_wau_stickiness",
    "txt_token_stats",
    "txt_token_entropy",
    "txt_redundancy_curve",
    "ir_rank_metrics",
]

# The 30 UNCONSOLIDATED r8-vintage queries at the rotation deadline
# (scripts/rotation_recount.py 13 lists 41 r8-vintage due; 11 of those
# were members of the five consolidated families above, whose first
# rows take over the obligation).
R8_VINTAGE_DUE = [
    "agg_corr_covar",
    "agg_distribution_profile",
    "dedup_exact",
    "dedup_keep_list",
    "emb_pca_variance",
    "evt_json_extract",
    "graph_core_numbers",
    "graph_pagerank_top10",
    "graph_ppr_seeds",
    "grp_frequency_capped",
    "ir_bm25_topk",
    "reduce_bit_xor",
    "rel_datetime_parts",
    "rel_pivot_status_by_flag",
    "rel_q13_order_histogram",
    "rel_q14_promo_share",
    "rel_q6_forecast_revenue",
    "rel_rollup_order_priority",
    "samp_temperature_mixture",
    "shard_token_budget",
    "sim_truncation_rescore",
    "src_blob_bytes",
    "str_charsequence_medley",
    "str_codepoint_sequence",
    "str_compare_and_join",
    "str_levenshtein_to_anchor",
    "stream_sliding_cms_freq",
    "txt_decontaminate",
    "txt_pii_redact",
    "txt_word_count_topk",
]

# r13 window policy (VERDICT r12 #1/#2 + registry._PRIORITY's capacity
# plan): 30 unconsolidated r8-vintage due + 5 family first rows + 9
# differential-tier first rows + 6 rule-(a) conversion re-entries =
# exactly 50. Nothing is pushed below the cut this round; the five
# rule-(b) candidates past the cut are the r14 forecast (see
# PRE_VERIFIED_AWAITING_WINDOW).
EXPECTED_SPILL = 0


def test_r13_touched_and_due_queries_inside_50_window():
    window = list(registry.queries())[:50]
    missing = [n for n in R8_VINTAGE_DUE + TOUCHED_IN_R13 if n not in window]
    assert not missing, f"outside driver window: {missing}"
    # the policy deadline: the 30 due queries LEAD the window
    assert window[:30] == R8_VINTAGE_DUE


def test_priority_names_all_exist():
    # A typo in _PRIORITY silently burns a window slot; catch it here.
    names = set(registry.queries())
    ghosts = [n for n in registry._PRIORITY if n not in names]
    assert not ghosts, f"_PRIORITY names not registered: {ghosts}"


def test_priority_fills_the_window_exactly():
    """_PRIORITY must hold exactly 50 + EXPECTED_SPILL unique names: fewer
    silently shrinks driver coverage, more silently pushes entries out of
    the gate beyond the documented spill."""
    assert len(registry._PRIORITY) == 50 + EXPECTED_SPILL, len(registry._PRIORITY)
    assert len(set(registry._PRIORITY)) == len(registry._PRIORITY), (
        "duplicate names in _PRIORITY"
    )


# Queries registered past the r13 window cut (the r14 forecast in
# registry._PRIORITY's capacity plan): their correctness vouch, until
# the r14 rotation hands them rule-(b) slots, is a DIFFERENTIAL
# PYTEST that runs the Spark callable and the DuckDB oracle side by side
# with the verify_local compare discipline. Any name listed here must
# have such a test; test_awaiting_window_names_have_differential_tests
# enforces the pairing so this set cannot silently become a skip list.
PRE_VERIFIED_AWAITING_WINDOW = {
    "dedup_span_cuts_family": "tests/test_r14_gate_candidates.py",
    "asof_nearest_family": "tests/test_r14_gate_candidates.py",
    "sim_pq_train_family": "tests/test_r14_gate_candidates.py",
    "sim_ivfpq_family_topk": "tests/test_r14_gate_candidates.py",
    "txt_unigram_roundtrip": "tests/test_r14_gate_candidates.py",
    "txt_lm_kn_scores": "tests/test_r14_gate_candidates.py",
    "dedup_cluster_reps": "tests/test_r14_gate_candidates.py",
}


def test_awaiting_window_names_have_differential_tests():
    root = pathlib.Path(__file__).resolve().parents[1]
    for name, test_path in PRE_VERIFIED_AWAITING_WINDOW.items():
        body = (root / test_path).read_text()
        assert name in body, (
            f"{name} claims a differential vouch in {test_path} "
            "but the file never references it"
        )


def test_no_registered_query_left_unverified():
    """Every name in the registry must either hold a green historical driver
    row (CORRECTNESS_r01..r06), sit inside this round's 50-slot window, or
    carry a documented differential-pytest vouch while awaiting its first
    rule-(b) slot (PRE_VERIFIED_AWAITING_WINDOW).
    (The r6 overflow list is gone: all 20 entries now hold window slots.)"""
    root = pathlib.Path(__file__).resolve().parents[1]
    seen: set[str] = set()
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(p.read_text()).items():
            # a row only vouches if it is GREEN (ADVICE r4): err unset and
            # no explicit mismatch — rows-only rows carry null matches and
            # still count, a red row must not. err="no_oracle" is the
            # driver's deliberate rows-only recording for queries with no
            # SQL-expressible oracle (emb_pca_project) — a weaker but
            # by-design vouch, visible as such to the judge.
            if row.get("err") in (None, "no_oracle") and not any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                seen.add(name)
    window = set(list(registry.queries())[:50])
    orphans = [
        n for n in registry.queries()
        if n not in seen
        and n not in window
        and n not in PRE_VERIFIED_AWAITING_WINDOW
    ]
    assert not orphans, f"never driver-verified and outside window: {orphans}"


def test_rotation_invariant_no_row_older_than_4_rounds():
    """The standing rotation policy: by each round N, no query's latest
    driver row may be older than round N-4 unless the query sits in the
    current window (it is about to get a fresh row). At r9 that means
    every r4-vintage row is either in the window or in the documented
    EXPECTED_SPILL-entry r10 spill section of _PRIORITY."""
    root = pathlib.Path(__file__).resolve().parents[1]
    latest: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        for name in json.loads(p.read_text()):
            latest[name] = max(latest.get(name, 0), rnd)
    window = set(list(registry.queries())[:50])
    spill = set(registry._PRIORITY[50:])
    stale = [
        n for n, r in latest.items()
        if r <= 4 and n in registry.queries()
        and n not in window and n not in spill
    ]
    assert not stale, f"r4-vintage rows neither in window nor spill: {stale}"


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


# -- oracle result-type contract ---------------------------------------------
# The driver compares Spark and DuckDB results after canonicalisation; the
# only types proven to canonicalise identically on both engines are the ones
# below (INTEGER included: the mm_* width/height columns are driver-green in
# r6). DuckDB's sum(INTEGER) returns HUGEINT (int128), which the driver's
# canonicaliser renders differently from Spark's BIGINT — that single class
# cost samp_train_val_split its r6 row. DESCRIBE every oracle so it can
# never recur.

_ALLOWED_ORACLE_TYPES = {
    "BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}

_SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")


@pytest.mark.skipif(
    not os.path.isdir(_SF_DIR), reason="driver testdata not present"
)
def test_every_oracle_result_type_is_canonical():
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{_SF_DIR}/{t}.parquet')"
        )
    offenders = []
    for name, sql in registry.oracle_sql().items():
        for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
            if typ not in _ALLOWED_ORACLE_TYPES:
                offenders.append((name, col, typ))
    assert not offenders, (
        f"oracle result columns outside the canonical type set "
        f"(cast them, e.g. ::BIGINT): {offenders}"
    )
