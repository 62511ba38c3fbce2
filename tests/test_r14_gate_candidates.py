"""Differential pre-verification of the r13 additions awaiting window
slots (the consolidated family gates + the unigram round-trip — the
five past the r13 cut get their first driver rows with the r14
rotation): each candidate's Spark callable and DuckDB oracle run
side-by-side at sf0.001 with the verify_local compare discipline
(columns sorted by name, rows sorted, values canonicalised).  The five
IN-window family gates (simhash/semdedup/mm/rollup/sketch) are
included too — their r13 rows should be a formality, not a first
contact."""

import math
import os

import duckdb
import pytest

from semantic_cpp_spark import registry

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

CANDIDATES = [
    # in the r13 window (family first rows):
    "dedup_simhash_family",
    "emb_semdedup_family",
    "mm_decode_family",
    "evt_rollup_merge_family",
    "agg_sketch_cardinality",
    # past the r13 cut (r14 rule-(b) forecast):
    "dedup_span_cuts_family",
    "asof_nearest_family",
    "sim_pq_train_family",
    "sim_ivfpq_family_topk",
    "txt_unigram_roundtrip",
    "txt_lm_kn_scores",
    "dedup_cluster_reps",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", CANDIDATES)
def test_candidate_matches_duckdb_oracle(spark, duck, name):
    qs, oracles = registry.queries(), registry.oracle_sql()
    sdf = qs[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracles[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _key(s_rows, s_cols) == _key(d_rows, d_cols)


def test_family_gates_cover_every_member_aspect(spark):
    """A consolidated gate that silently drops an aspect would still
    hash-match its own oracle; pin the aspect census so family
    coverage is structural, not incidental."""
    want = {
        "dedup_simhash_family": {"sig", "pair"},
        "emb_semdedup_family": {"fixed", "scaled"},
        "mm_decode_family": {"ahash", "histogram", "audio", "video", "tiff"},
        "evt_rollup_merge_family": {"merge", "var", "hll", "quantile"},
        "agg_sketch_cardinality": {"hll", "cms"},
        "dedup_span_cuts_family": {"cuts", "apply", "text"},
        "asof_nearest_family": {"nearest", "tol"},
        "sim_pq_train_family": {"k16", "k256"},
        "sim_ivfpq_family_topk": {"adc", "ivf", "residual"},
    }
    qs = registry.queries()
    for name, aspects in want.items():
        got = {
            r["aspect"]
            for r in qs[name](spark, SF).select("aspect").distinct().collect()
        }
        assert got == aspects, (name, got)
