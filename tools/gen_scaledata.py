#!/usr/bin/env python
"""Synthetic scale-factor data generator for the shuffle-slope gate's
THIRD scale point (round 8 — VERDICT r7 item 1).

The driver ships sf{0.001,0.01,0.1} only, and the superlinear-shuffle
gate (bench.py) extrapolated every 100x-scale claim from the single
two-point slope 0.01 -> 0.1. This tool re-creates the driver tables at
an arbitrary sf so the gate gets a third point (default sf0.3): a
quadratic candidate-generation term that is marginal at 0.1 shows
unmistakably at 3x the rows.

Every distribution below was INFERRED by profiling the driver's own
parquet at two scale factors (all checks in the round-8 transcript):

  table      rows           distributions
  --------   ------------   -------------------------------------------
  region     5              fixed TPC-H names
  nation     25             NATION_i, regionkey = i % 5
  supplier   10000*sf       Supplier#%09d, nation U(0..24),
                            acctbal U(-1000,10000) 2dp
  part       200000*sf      name = adj x noun (8x8), Brand#U(0..24),
                            type U(6), size U(1..50),
                            retailprice = 900 + 0.1*(key % 1000)
  customer   150000*sf      Customer#%09d, nation U(0..24),
                            acctbal U(-1000,10000) 2dp, segment U(5)
  orders     1.5e6*sf       custkey U, status U{O,P,F}, priority U(5),
                            totalprice U(1000,500000) 2dp,
                            orderdate = uniform DAY in
                            [1995-01-01, 2001-08-01]
  lineitem   4 rows/order   orderkey U(orders)  (=> Poisson(4) fanout,
                            ~1.8% childless orders, max ~17),
                            part/supp U, linenumber U(1..7),
                            qty U{1..50}, extprice U(900,105000) 2dp,
                            discount U{0.00..0.10}, tax U{0.00..0.08},
                            returnflag U{A,N,R}, linestatus U{O,F},
                            shipdate = independent uniform day
                            + U(1..95) days
  events     1e6*sf         ts uniform micros in [2024-01-01,
                            2024-01-31), user U(15000*sf),
                            type U(5 names), value Exp(50) 2dp,
                            props = '{"k": U(0..99)}'
  documents  max(500,       31-word vocab (verbatim below), U(10..100)
             50000*sf)      tokens/doc, lang w=[.4,.15,.15,.15,.15],
                            source = 'src' + (id % 20);
                            NEAR-DUP PLANTING: with p=.0486 a doc is a
                            copy of a random earlier doc with the LAST
                            TOKEN DROPPED (measured 24/500 @0.01,
                            243/5000 @0.1), with p=.0016 an exact copy
                            (8/5000 @0.1) — this is what makes
                            pair-emitting dedup answers grow faster
                            than rows, and the gate must see the same
                            growth law at the third point
  embeddings max(500,       64-dim unit-norm gaussian directions,
             20000*sf)      label U(0..9) (measured: intra-label mean
                            cosine ~ 0 — labels are NOT direction
                            clusters; no cos>0.99 planted pairs)

Physical types mirror the driver's current footers: timestamp[us]
(no tz) for ts/orderdate/shipdate, int64 keys, float64 measures,
float32 list embeddings.

Usage:  python tools/gen_scaledata.py --sf 0.3 --out .benchdata/sf0.3
Deterministic for a given (sf, seed).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.40, 0.15, 0.15, 0.15, 0.15]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
ADJS = "new cold large hot red small blue old".split()
NOUNS = "gizmo widget bolt plate rod anvil ring gear".split()
PTYPES = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000
ORDER_EPOCH_US = np.datetime64("1995-01-01", "us").astype("int64")
ORDER_DAYS = int(
    (np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
    / np.timedelta64(1, "D")
)
EVENT_EPOCH_US = np.datetime64("2024-01-01", "us").astype("int64")
EVENT_SPAN_US = 30 * DAY_US

P_NEARDUP = 0.0486  # drop-last-token copy of a random earlier doc
P_EXACTDUP = 0.0016


def _ts_us(int_us: np.ndarray) -> pa.Array:
    return pa.array(int_us, type=pa.timestamp("us"))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def gen(sf: float, out_dir: str, seed: int = 42) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = 4 * n_ord
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp), pa.int32()
        ),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    pk = np.arange(n_part)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": [
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(
                rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
            )
        ],
        "p_brand": [f"Brand#{b}" for b in rng.integers(0, 25, n_part)],
        "p_type": [PTYPES[t] for t in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + 0.1 * (pk % 1000), 2),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [
            SEGMENTS[s] for s in rng.integers(0, 5, n_cust)
        ],
    }))
    odate_us = (
        ORDER_EPOCH_US
        + rng.integers(0, ORDER_DAYS + 1, n_ord) * DAY_US
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [
            "OPF"[s] for s in rng.integers(0, 3, n_ord)
        ],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_us(odate_us),
        "o_orderpriority": [
            PRIORITIES[p] for p in rng.integers(0, 5, n_ord)
        ],
    }))
    ship_us = (
        ORDER_EPOCH_US
        + rng.integers(0, ORDER_DAYS + 1, n_li) * DAY_US
        + rng.integers(1, 96, n_li) * DAY_US
    )
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": ["ANR"[f] for f in rng.integers(0, 3, n_li)],
        "l_linestatus": ["OF"[s] for s in rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_us(ship_us),
    }))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts_us(
            EVENT_EPOCH_US
            + rng.integers(0, EVENT_SPAN_US, n_ev)
        ),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": [ETYPES[t] for t in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents — sequential pass for the dup planting
    texts: list[str] = []
    kinds = rng.random(n_doc)
    lengths = rng.integers(10, 101, n_doc)
    tok_ids = rng.integers(0, len(VOCAB), int(lengths.sum()))
    pos = 0
    for i in range(n_doc):
        ln = int(lengths[i])
        toks = [VOCAB[t] for t in tok_ids[pos : pos + ln]]
        pos += ln
        if i > 0 and kinds[i] < P_NEARDUP:
            src = texts[int(rng.integers(0, i))].split()
            texts.append(" ".join(src[:-1]) if len(src) > 1 else src[0])
        elif i > 0 and kinds[i] < P_NEARDUP + P_EXACTDUP:
            texts.append(texts[int(rng.integers(0, i))])
        else:
            texts.append(" ".join(toks))
    lang_idx = rng.choice(len(LANGS), n_doc, p=LANG_W)
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in lang_idx],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    vecs = rng.standard_normal((n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype("float32")],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))

    counts = {
        "customer": n_cust, "supplier": n_supp, "part": n_part,
        "orders": n_ord, "lineitem": n_li, "events": n_ev,
        "documents": n_doc, "embeddings": n_emb,
    }
    with open(os.path.join(out_dir, "GENERATED.json"), "w") as f:
        json.dump({"sf": sf, "seed": seed, "rows": counts}, f, indent=1)
    return counts


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    print(gen(a.sf, a.out, a.seed))
