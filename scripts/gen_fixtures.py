"""Scale-factor step-up fixture generator (VERDICT r5 next-round #1).

The driver ships read-only fixtures at sf0.001/0.01/0.1 only; proving the
100 TB design claims needs at least one decade step beyond the bench scale.
This generator extrapolates the OBSERVED sf0.1 schemas and value domains
(FIXTURES.md; verified against the parquet footers and DuckDB profiles) to
an arbitrary scale factor — same tables, same dtypes (timestamp[us], int32
dims, float32 embeddings), same literal domains the registry queries filter
on (BUILDING / ASIA / PROMO / Brand#N / signup...purchase / en..zh), with
row counts scaled linearly like the driver's own 0.001→0.1 progression:

    customer 150k·sf  supplier 10k·sf  part 200k·sf  orders 1.5M·sf
    lineitem ~6M·sf (per-order Poisson(4) clipped [1,17])
    events 1M·sf     documents 50k·sf  embeddings 20k·sf

Correctness at the new scale is DIFFERENTIAL (Spark vs DuckDB on the same
parquet), so exact replication of the driver's RNG stream is not required —
only the shapes and domains. Deterministic under --seed (default 4242).

Usage: python scripts/gen_fixtures.py <out_dir> [--sf 1.0] [--seed 4242]
       (writes <out_dir>/{region,...,embeddings}.parquet)

Never writes outside the given out_dir; intended target is the gitignored
/root/repo/.localdata/sf<sf>/ tree.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
RETFLAGS = ["A", "N", "R"]
LINESTATUSES = ["O", "F"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["large", "hot", "blue", "old", "cold", "dark", "pale", "new"]
P_NOUN = ["ring", "bolt", "plate", "screw", "gear", "valve", "wheel", "pin"]
EVENT_TYPES = ["signup", "view", "click", "purchase", "error"]
LANGS = ["en", "fr", "es", "de", "zh"]
LANG_P = [0.41, 0.15, 0.15, 0.14, 0.15]
VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data vector a the plan join shuffle stage task"
).split()

DAY_US = 86_400_000_000
ORDERDATE_LO = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
ORDERDATE_DAYS = 2404  # .. 2001-08-01 inclusive, matching sf0.1
SHIPDATE_LO = np.datetime64("1995-01-02").astype("datetime64[us]").astype(np.int64)
SHIPDATE_DAYS = 2499  # .. 2001-11-04
EVENTS_LO = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
EVENTS_SPAN_US = 30 * DAY_US  # 2024-01-01 .. 2024-01-30


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    # SPLITTABLE row groups (r15): pyarrow's default wrote one row group
    # per table — Spark cannot split inside a row group, so every
    # per-doc-heavy gate ran its Arrow kernel in ONE task at the
    # step-up scales (measured: txt_unigram_roundtrip 13.3 s at sf1.0
    # single-group vs >14 min single-task at sf10). A 100 TB corpus
    # arrives as thousands of ~128 MB splittable files; 64k-row groups
    # reproduce that input shape at fixture scale. (The driver's own
    # sf≤0.1 fixtures stay single-group — small enough not to matter.)
    pq.write_table(
        table,
        os.path.join(out_dir, f"{name}.parquet"),
        row_group_size=65536,
    )
    print(f"  {name}: {table.num_rows} rows")


def _money(rng, n, lo, hi):
    return np.round(rng.uniform(lo, hi, n), 2)


def generate(
    out_dir: str, sf: float, seed: int, tables: set[str] | None = None
) -> None:
    """``tables`` restricts which parquet files are WRITTEN (None = all).
    Every table is still computed (the rng draws are eager arguments to
    the write helper), so the RNG stream is unchanged and a filtered
    run's tables are byte-identical to the full run's at the same
    sf/seed — `--tables embeddings` writes exactly the embeddings the
    full fixture would contain (used for the clustered-ANN recall set).
    The flag saves write I/O and disk, not generation compute."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    def want(name: str) -> bool:
        return tables is None or name in tables

    def w(name: str, table: pa.Table) -> None:
        if want(name):
            _write(out_dir, name, table)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_user = max(1, int(15_000 * sf))

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    w("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _money(rng, n_cust, -1000, 10_000),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _money(rng, n_supp, -1000, 10_000),
    }))
    adj = rng.integers(0, len(P_ADJ), n_part)
    noun = rng.integers(0, len(P_NOUN), n_part)
    w("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{P_ADJ[a]} {P_NOUN[b]}" for a, b in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + rng.uniform(0, 100, n_part), 2),
    }))

    odate = ORDERDATE_LO + rng.integers(0, ORDERDATE_DAYS, n_ord) * DAY_US
    w("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": _money(rng, n_ord, 1000, 500_000),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    per_order = np.clip(rng.poisson(4, n_ord), 1, 17)
    n_li = int(per_order.sum())
    l_orderkey = np.repeat(np.arange(n_ord), per_order)
    l_linenumber = (
        np.arange(n_li) - np.repeat(np.cumsum(per_order) - per_order, per_order) + 1
    )
    sdate = SHIPDATE_LO + rng.integers(0, SHIPDATE_DAYS, n_li) * DAY_US
    w("lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _money(rng, n_li, 900, 105_000),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(RETFLAGS)[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(LINESTATUSES)[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))

    ts = np.sort(EVENTS_LO + rng.integers(0, EVENTS_SPAN_US, n_evt))
    w("events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_user, n_evt), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]
        ),
        "value": np.round(rng.gamma(1.2, 60.0, n_evt), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)],
    }))

    # documents: ~0.2% planted exact duplicates (like the driver fixture's
    # 8-in-5000) so exact/minhash dedup has work at every scale
    lengths = rng.integers(10, 61, n_doc)
    word_ids = rng.integers(0, len(VOCAB), int(lengths.sum()))
    texts, pos = [], 0
    for ln in lengths:
        texts.append(" ".join(VOCAB[w] for w in word_ids[pos : pos + ln]))
        pos += ln
    dup_idx = rng.choice(n_doc, max(2, n_doc // 500), replace=False)
    for i in range(1, len(dup_idx)):
        texts[dup_idx[i]] = texts[dup_idx[0]]
    w("documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 Gaussian clusters keyed by label, 64-dim float32
    labels = rng.integers(0, 10, n_emb)
    centers = rng.normal(0, 1, (10, 64))
    vecs = (centers[labels] + rng.normal(0, 0.5, (n_emb, 64))).astype(np.float32)
    w("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of tables to write (byte-identical "
        "to the full run's tables — saves write I/O only, see generate())",
    )
    a = ap.parse_args()
    tables = set(a.tables.split(",")) if a.tables else None
    print(f"generating sf={a.sf} fixtures into {a.out_dir} (seed {a.seed})")
    generate(a.out_dir, a.sf, a.seed, tables)


if __name__ == "__main__":
    main()
