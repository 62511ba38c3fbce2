"""Differential pre-verification of gates registered past the r14
window cut, awaiting their first driver rows with the r15 rotation
(the rule-(b) queue; names also listed in
test_registry_contract.PRE_VERIFIED_AWAITING_WINDOW): each candidate's
Spark callable and DuckDB oracle run side-by-side at sf0.001 with the
verify_local compare discipline (columns sorted by name, rows sorted,
values canonicalised).

txt_lm_mkn_zipf ignores the sf_dir by design (it builds its seeded
Zipf corpus in-query — the fixture's count-of-counts is degenerate at
every scale and the Chen-Goodman estimator correctly refuses it), so
this differential IS its full-strength check: the corpus, the three
count-dependent discounts per level, the gammas, and the shared KN
scoring recursion must match DuckDB hash-exactly."""

import math
import os

import duckdb
import pytest

from semantic_cpp_spark import registry

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

CANDIDATES = [
    "txt_lm_mkn_zipf",
    "samp_dsir_logweights",
    "str_family",
    # end-of-r14 consolidation unions (mm 3→1, passage 2→1): every
    # member value survives verbatim in the tagged union, so this
    # differential re-proves each member against DuckDB until the
    # family's first driver row lands with the r15 window.
    "mm_media_family",
    "dedup_passage_family",
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
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
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
