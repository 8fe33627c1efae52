"""Generate scaled synthetic testdata matching the driver's tables.

The driver ships read-only parquet at ``/root/testdata/sf{0.001,0.01,
0.1}``; round-3's verdict asks for scale validation at sf1 (10x the
bench scale).  This script reproduces the same star schema with the
same column types, categorical domains, and distributions (measured
off the shipped sf0.1 tables — uniform dates/prices, Exponential(50)
event values, the 30-word document vocabulary with the rare 'dup'
token, ~0.2% exact-duplicate documents, unit-norm random float32
embeddings with uniform labels), deterministic under ``--seed``.

Usage:
    python scripts/gen_testdata.py --sf 1 --out /root/repo/testdata_sf1

Row counts scale linearly: customer 150k/sf, supplier 10k/sf, part
200k/sf, orders 1.5M/sf, lineitem ~6M/sf, events 1M/sf (users
15k/sf), documents 50k/sf, embeddings 20k/sf; nation/region fixed.

This is test INPUT data only — it feeds bench.py / check_oracle.py at
scales the driver does not ship; it never replaces driver data.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]

DAY_US = 86_400_000_000


def _write(df: pd.DataFrame, out: str, name: str) -> None:
    """Write ``name.parquet`` as a single file (small tables) or a
    directory of part files (large ones).

    A real lake table is MANY files; a single-file table caps the scan
    at one Spark task no matter how many cores the executor fleet has
    (parquet splits are byte ranges, and these files sit under the
    128 MB ``maxPartitionBytes`` default — the SCALE.md "single-core
    scan" caveat).  Splitting every ≥12.5k-row table into ≤32 parts
    makes local bench numbers reflect the parallel plans a cluster
    would actually run.  Deterministic: contiguous row slices, fixed
    part count from the row count alone."""
    table = pa.Table.from_pandas(df, preserve_index=False)
    parts = max(1, min(32, len(df) // 12_500))
    path = os.path.join(out, f"{name}.parquet")
    if parts == 1:
        pq.write_table(table, path)
    else:
        if os.path.isfile(path):
            os.remove(path)
        os.makedirs(path, exist_ok=True)
        step = -(-len(df) // parts)
        for i in range(parts):
            pq.write_table(
                table.slice(i * step, step),
                os.path.join(path, f"part-{i:05d}.parquet"),
            )
    print(f"  {name}: {len(df)} rows ({parts} file{'s' if parts > 1 else ''})")


def _days(rng, n, start: str, end: str) -> pd.Series:
    lo = np.datetime64(start).astype("datetime64[D]").astype(int)
    hi = np.datetime64(end).astype("datetime64[D]").astype(int)
    d = rng.integers(lo, hi + 1, n).astype("datetime64[D]")
    return pd.Series(d.astype("datetime64[us]"))


def generate(sf: float, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_usr = max(1, int(15_000 * sf))
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": REGIONS,
    }), out, "region")
    _write(pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    }), out, "nation")

    _write(pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust),
    }), out, "customer")

    _write(pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }), out, "supplier")

    names = [f"{a} {n}" for a in ADJ for n in NOUN]
    _write(pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": rng.choice(names, n_part),
        "p_brand": [f"Brand#{b}" for b in rng.integers(0, 25, n_part)],
        "p_type": rng.choice(PTYPES, n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * (np.arange(n_part) % 1000), 1),
    }), out, "part")

    _write(pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": rng.choice(["F", "O", "P"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _days(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": rng.choice(PRIORITIES, n_ord),
    }), out, "orders")

    # 1..7 lineitems per order (avg 4), trimmed to the exact total
    per = rng.integers(1, 8, n_ord)
    okeys = np.repeat(np.arange(n_ord, dtype=np.int64), per)[:n_li]
    lnum = np.concatenate([np.arange(1, p + 1) for p in per])[:n_li].astype(np.int32)
    if len(okeys) < n_li:  # pad from the start if the draw ran short
        pad = n_li - len(okeys)
        okeys = np.concatenate([okeys, okeys[:pad]])
        lnum = np.concatenate([lnum, lnum[:pad] + 7])
    _write(pd.DataFrame({
        "l_orderkey": okeys,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": lnum,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": _days(rng, n_li, "1995-01-01", "2001-11-01"),
    }), out, "lineitem")

    ts0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = 30 * DAY_US
    ts = np.sort(rng.integers(ts0, ts0 + span, n_ev))
    _write(pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "user_id": rng.integers(0, n_usr, n_ev),
        "event_type": rng.choice(EVENT_TYPES, n_ev),
        "value": np.round(np.minimum(rng.exponential(50.0, n_ev), 600.0), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }), out, "events")

    # documents: 10-100 tokens from the 30-word vocab; ~0.1% of tokens
    # are the rare 'dup' marker; ~0.2% of docs exact-copy an earlier one
    lens = rng.integers(10, 101, n_doc)
    toks = rng.choice(VOCAB, int(lens.sum()))
    rare = rng.random(len(toks)) < 0.001
    toks[rare] = "dup"
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(toks[pos:pos + ln]))
        pos += ln
    for i in rng.integers(1, n_doc, max(1, n_doc // 500)):
        texts[i] = texts[i - 1]
    _write(pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc, p=LANG_P),
        "source": [f"src{s}" for s in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }), out, "documents")

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": [v for v in vecs],
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    }), out, "embeddings")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    print(f"generating sf={a.sf} -> {a.out}")
    generate(a.sf, a.out, a.seed)
