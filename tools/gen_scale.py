#!/usr/bin/env python3
"""Deterministic synthetic-table generator for SCALE-CURVE benchmarking.

The driver ships read-only test data up to sf0.1; validating that query
plans scale (sf0.1 -> sf1 should cost ~10x, not 100x) needs a bigger
input, and this container has no network for DuckDB's tpch extension.
This generator reproduces the driver tables' SHAPES — same schemas, same
value ranges/cardinality ratios (profiled from /root/testdata/sf0.1, see
SCALE.md), same fk structure — at any scale factor, seeded and
deterministic. The scale bench (tools/scale_bench.py) generates its OWN
pair of scales with it (e.g. 0.1 and 1.0) and compares within-generator,
so ratio analysis never mixes two data sources.

Row counts scale linearly from the sf0.1 profile; region/nation are
fixed dimensions like real TPC-H. NOT a TPC-H dbgen replacement — value
distributions are simplified (uniform/exponential where the profile
showed those shapes) but selectivity-relevant ranges (dates, prices,
discount steps, segment/type/priority vocabularies) mirror the driver's
so catalog-query predicates keep comparable selectivity.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# rows per table at sf=0.1 (matches the driver's sf0.1 profile)
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["SMALL", "MEDIUM", "LARGE", "ECONOMY", "STANDARD", "PROMO"]
PADJ = ["large", "hot", "blue", "small", "dark", "shiny", "round", "flat"]
PNOUN = ["ring", "bolt", "gear", "cog", "pin", "rod", "cap", "disk"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
VOCAB = (
    "spark line column order small sort fast value scan a hash slow group "
    "batch part agg filter query big key window row table stream merge data "
    "join vector customer the"
).split()

_EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[s]").astype(np.int64)
_EPOCH_2001 = np.datetime64("2001-08-01").astype("datetime64[s]").astype(np.int64)
_EPOCH_EV0 = np.datetime64("2024-01-01").astype("datetime64[s]").astype(np.int64)
_EPOCH_EV1 = np.datetime64("2024-01-31").astype("datetime64[s]").astype(np.int64)


def _ts_us(epoch_s: np.ndarray) -> pa.Array:
    return pa.array((epoch_s * 1_000_000).astype("int64"), pa.timestamp("us"))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def _n(name: str, sf: float) -> int:
    return max(1, int(round(BASE[name] * sf / 0.1)))


def generate(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    r = np.random.RandomState(SEED)
    nc = _n("customer", sf)
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc, dtype=np.int64)),
        "c_name": [f"Customer#{k:09d}" for k in range(nc)],
        "c_nationkey": pa.array(r.randint(0, 25, nc).astype(np.int32)),
        "c_acctbal": np.round(r.uniform(-1000.0, 10_000.0, nc), 2),
        "c_mktsegment": [SEGMENTS[i] for i in r.randint(0, 5, nc)],
    }))

    ns = _n("supplier", sf)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns, dtype=np.int64)),
        "s_name": [f"Supplier#{k:09d}" for k in range(ns)],
        "s_nationkey": pa.array(r.randint(0, 25, ns).astype(np.int32)),
        "s_acctbal": np.round(r.uniform(-1000.0, 10_000.0, ns), 2),
    }))

    npart = _n("part", sf)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(npart, dtype=np.int64)),
        "p_name": [
            f"{PADJ[a]} {PNOUN[b]}"
            for a, b in zip(r.randint(0, 8, npart), r.randint(0, 8, npart))
        ],
        "p_brand": [f"Brand#{10 + i}" for i in r.randint(0, 25, npart)],
        "p_type": [PTYPES[i] for i in r.randint(0, len(PTYPES), npart)],
        "p_size": pa.array((r.randint(1, 51, npart)).astype(np.int32)),
        "p_retailprice": np.round(r.uniform(900.0, 999.9, npart), 2),
    }))

    no = _n("orders", sf)
    odate = r.randint(_EPOCH_1995, _EPOCH_2001, no)
    odate -= odate % 86_400  # driver dates are day-aligned
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no, dtype=np.int64)),
        "o_custkey": pa.array(r.randint(0, nc, no).astype(np.int64)),
        "o_orderstatus": [("O", "P", "F")[i] for i in r.randint(0, 3, no)],
        "o_totalprice": np.round(r.uniform(1000.0, 500_000.0, no), 2),
        "o_orderdate": _ts_us(odate),
        "o_orderpriority": [PRIORITIES[i] for i in r.randint(0, 5, no)],
    }))

    nl = _n("lineitem", sf)
    lok = np.sort(r.randint(0, no, nl)).astype(np.int64)
    # linenumber = 1-based rank within order (same shape as the profile:
    # ~4 lines/order, max ~7)
    starts = np.flatnonzero(np.r_[True, lok[1:] != lok[:-1]])
    linenum = (np.arange(nl) - np.repeat(starts, np.diff(np.r_[starts, nl])) + 1)
    ship = odate[lok] + r.randint(1, 96, nl) * 86_400
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lok),
        "l_partkey": pa.array(r.randint(0, npart, nl).astype(np.int64)),
        "l_suppkey": pa.array(r.randint(0, ns, nl).astype(np.int64)),
        "l_linenumber": pa.array(linenum.astype(np.int32)),
        "l_quantity": r.randint(1, 51, nl).astype(np.float64),
        "l_extendedprice": np.round(r.uniform(900.0, 105_000.0, nl), 2),
        "l_discount": r.randint(0, 11, nl) / 100.0,
        "l_tax": r.randint(0, 9, nl) / 100.0,
        "l_returnflag": [("A", "N", "R")[i] for i in r.randint(0, 3, nl)],
        "l_linestatus": [("O", "F")[i] for i in r.randint(0, 2, nl)],
        "l_shipdate": _ts_us(ship),
    }))

    ne = _n("events", sf)
    nusers = max(10, int(round(1500 * sf / 0.1)))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(ne, dtype=np.int64)),
        "ts": _ts_us(
            np.sort(r.randint(_EPOCH_EV0, _EPOCH_EV1, ne))
            + 0  # second precision suffices; driver has sub-second noise
        ),
        "user_id": pa.array(r.randint(0, nusers, ne).astype(np.int64)),
        "event_type": [EVENT_TYPES[i] for i in r.randint(0, 5, ne)],
        "value": np.round(np.minimum(r.exponential(60.0, ne), 560.0), 2),
        "props": [json.dumps({"k": int(k)}) for k in r.randint(0, 100, ne)],
    }))

    nd = _n("documents", sf)
    texts: list[str] = []
    langs = [LANGS[i] for i in r.choice(len(LANGS), nd, p=LANG_P)]
    for d in range(nd):
        if d > 20 and r.random_sample() < 0.02:
            # planted near-duplicate of a recent doc: linear-in-N dup
            # structure (what a crawl actually looks like), never a
            # blowup of copies of one template
            src_doc = texts[d - 1 - r.randint(0, 20)].split()
            for _ in range(2):
                src_doc[r.randint(0, len(src_doc))] = VOCAB[r.randint(0, len(VOCAB))]
            texts.append(" ".join(src_doc))
            continue
        nwords = r.randint(12, 70)
        texts.append(" ".join(VOCAB[i] for i in r.randint(0, len(VOCAB), nwords)))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd, dtype=np.int64)),
        "text": texts,
        "lang": langs,
        "source": [f"src{i}" for i in r.randint(0, 20, nd)],
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    nv = _n("embeddings", sf)
    labels = r.randint(0, 10, nv)
    cents = np.random.RandomState(7).normal(0.0, 0.12, (10, 64))
    vecs = (cents[labels] + r.normal(0.0, 0.08, (nv, 64))).astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    }))

    with open(os.path.join(out_dir, "_GENERATED"), "w") as fh:
        fh.write(f"sf={sf} seed={SEED}\n")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/ssbc_scale/gen-sf{sf:g}"
    if os.path.exists(os.path.join(out, "_GENERATED")):
        print(f"already generated: {out}")
        return
    generate(sf, out)
    print(f"generated sf={sf} at {out}")


if __name__ == "__main__":
    main()
