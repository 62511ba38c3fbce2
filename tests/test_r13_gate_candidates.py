"""Differential pre-verification of the r13 gate candidates (the r12
tokenizer additions, now @register-ed past the r12 window cut; their
first driver rows arrive with the r13 rotation): each candidate's
Spark callable and DuckDB oracle run side-by-side at sf0.001 with the
verify_local compare discipline (columns sorted by name, rows sorted,
values canonicalised) — so the driver row is a formality, not a first
contact."""

import math
import os

import duckdb
import pytest

from semantic_cpp_spark import registry_pipeline as RP

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

CANDIDATES = [
    (RP.txt_bpe_vocab, RP._bpe_vocab_sql(6)),
    (RP.txt_tokenizer_stats, RP._tokenizer_stats_sql(6)),
    (RP.txt_encode_subwords, RP._encode_subwords_sql(6)),
    (RP.txt_nb_holdout_confusion, RP._nb_holdout_sql()),
    (RP.txt_lm_perplexity_bands, RP._lm_bands_sql()),
    (RP.txt_unigram_viterbi, RP._unigram_viterbi_sql(6)),
    (RP.txt_subword_roundtrip, RP._roundtrip_sql()),
    (RP.txt_tokenizer_compare, RP._tokenizer_compare_sql()),
    (RP.txt_blocklist_hits, RP._blocklist_sql()),
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
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "fn,sql", CANDIDATES, ids=[f.__name__ for f, _ in CANDIDATES]
)
def test_candidate_matches_duckdb_oracle(spark, duck, fn, sql):
    sdf = fn(spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _key(s_rows, s_cols) == _key(d_rows, d_cols)
