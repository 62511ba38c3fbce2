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

# Queries that re-enter in round 16 on a behavioral/plan change —
# each must sit inside this round's 50-slot driver window for a fresh
# row (rule (a) of the standing rotation policy):
TOUCHED_IN_R16 = [
    # window-form first-occurrence rewrite (VERDICT r15 #1)
    "txt_ngram_novelty",
    # deterministic quantile-bounds ordinal path (indexing.py r16)
    "sem_sort_stable",
    "txt_vocab_ids",
    # shared residual index build in the family gate
    "sim_ivfpq_family_topk",
    # checkpoint-cadence parameter (default decided by the sf1.0 A/B)
    "graph_pagerank_top10",
]

# The 45 r11-vintage queries at the rotation deadline
# (scripts/rotation_recount.py 16 — due rule: latest row <= N-5).
R11_VINTAGE_DUE = [
    "dedup_incremental_batch",
    "dedup_minhash_containment",
    "dedup_minhash_lsh",
    "emb_dim_stats",
    "emb_jl_project",
    "emb_pca_project",
    "emb_whiten_norms",
    "evt_conversion_latency",
    "evt_debounce",
    "evt_decayed_activity",
    "evt_last_touch_attribution",
    "evt_mad_outliers",
    "evt_max_concurrency",
    "evt_rfm_segments",
    "evt_user_trend",
    "graph_triangle_counts",
    "mm_compressed_text",
    "mm_feature_extract",
    "mm_gif_features",
    "mm_pgm_features",
    "mm_png_features",
    "mm_resize_features",
    "pipe_clean_corpus",
    "rel_equidepth_histogram",
    "rel_grouping_sets",
    "rel_order_gaps_lead_lag",
    "samp_weighted_topk",
    "sim_ann_router_banded",
    "sim_ann_router_bucket",
    "sim_cosine_topk",
    "sim_ivf_multiprobe",
    "sim_lsh_banded_topk",
    "sim_lsh_multiprobe_topk",
    "stream_last_touch",
    "txt_bigram_cross_entropy",
    "txt_boilerplate_removal",
    "txt_chunk_overlap",
    "txt_line_dedup",
    "txt_pmi_bigrams",
    "txt_quality_above_median",
    "txt_quality_bands",
    "txt_source_report",
    "txt_zipf_fit",
    "udaf_per_order_weighted_avg",
    "udaf_weighted_avg",
]

# r16 window policy: 45 r11-vintage due + 5 rule-(a) changed-code
# re-entries = exactly 50. Nothing is pushed below the cut.
EXPECTED_SPILL = 0


def test_r16_touched_and_due_queries_inside_50_window():
    window = list(registry.queries())[:50]
    missing = [n for n in R11_VINTAGE_DUE + TOUCHED_IN_R16 if n not in window]
    assert not missing, f"outside driver window: {missing}"
    # the policy deadline: the 45 due queries LEAD the window
    assert window[:45] == R11_VINTAGE_DUE


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
    # (the seven r13-queued family gates got their first driver rows in
    # the committed CORRECTNESS_r14.json and have left this set.)
    # registered past the r14 cut, holding r15 rule-(b) slots:
    "txt_lm_mkn_zipf": "tests/test_r15_gate_candidates.py",
    "samp_dsir_logweights": "tests/test_r15_gate_candidates.py",
    # r14 consolidation: carries the four str_ members' obligations
    # (their r13 rows stay valid through r17; the family first row
    # should land well before then)
    "str_family": "tests/test_r15_gate_candidates.py",
    # end-of-r14 consolidations (mm 3→1, passage 2→1): members' r13
    # rows stay valid through r17; family first rows land r15.
    "mm_media_family": "tests/test_r15_gate_candidates.py",
    "dedup_passage_family": "tests/test_r15_gate_candidates.py",
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


def _latest_rows() -> tuple[dict[str, int], int]:
    """(latest recorded round per query, max recorded round) over ALL
    committed driver artifacts — any row counts for vintage purposes
    (staleness is about when the driver last LOOKED, not whether it
    passed; red rows force rule-(a) re-entry separately)."""
    root = pathlib.Path(__file__).resolve().parents[1]
    latest: dict[str, int] = {}
    max_round = 0
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        max_round = max(max_round, rnd)
        for name in json.loads(p.read_text()):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def test_rotation_invariant_no_row_older_than_4_rounds():
    """The standing rotation policy: entering round N+1 (N = newest
    committed artifact), any registered query whose latest driver row is
    vintage N-4 or older must sit in the current window (it is about to
    get a fresh row) or in the documented EXPECTED_SPILL section of
    _PRIORITY — otherwise its row ages out of the span-5 validity
    window unrefreshed. Dynamic over the committed artifacts (the old
    hardcoded `r <= 4` form stopped checking anything after r9).

    DESIGNED TRIPWIRE (ADVICE r14 raised it, VERDICT r14 "What's
    wrong #1" adjudicated it): the moment the round-N driver artifacts
    are committed, this test goes red until _PRIORITY is rotated to
    the round-N+1 window — one round TIGHTER than the recount's
    deadline, deliberately: it makes building the next window the
    unskippable FIRST act of every round. The enforced policy is
    therefore "the first commit of round N+1 rotates the window",
    not "artifacts and rotation land together" (the driver commits
    artifacts itself, so same-commit is impossible)."""
    latest, max_round = _latest_rows()
    window = set(list(registry.queries())[:50])
    spill = set(registry._PRIORITY[50:])
    stale = [
        n for n, r in latest.items()
        if r <= max_round - 4 and n in registry.queries()
        and n not in window and n not in spill
    ]
    assert not stale, (
        f"r{max_round - 4}-vintage rows neither in window nor spill: {stale}"
    )


def test_rotation_recount_due_rule_matches_span5_invariant():
    """Script-vs-policy consistency pin (VERDICT r13 "What's wrong #1" —
    the second appearance of this contradiction class, so it gets a
    test): for the upcoming round N+1, scripts/rotation_recount.py's
    DUE bucket must be exactly the registered queries whose newest
    driver row is vintage N-4 or older — the cohort whose rows fall out
    of the span-5 validity window (rounds M-4..M valid during round M)
    unless refreshed. The r13 off-by-one (deadline N-4 instead of N-5)
    made the script also sweep in the still-valid N-3 cohort and report
    a phantom 42-slot overflow against the registry's own plan."""
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root / "scripts"))
    try:
        import rotation_recount
    finally:
        sys.path.pop(0)

    latest, max_round = rotation_recount.latest_green_rows()
    next_round = max_round + 1
    due, no_row, ok, _ = rotation_recount.buckets(next_round)
    names = list(registry.queries())
    expected_due = sorted(
        n for n in names if 0 < latest.get(n, 0) <= max_round - 4
    )
    assert due == expected_due, (
        "recount DUE bucket diverges from the span-5 invariant cohort "
        f"(vintage <= r{max_round - 4}): script={len(due)} "
        f"expected={len(expected_due)}"
    )
    # the three buckets partition the registry
    assert sorted(due + no_row + ok) == sorted(names)
    # and no-row is exactly the never-recorded set
    assert no_row == sorted(n for n in names if n not in latest)


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
