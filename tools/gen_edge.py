#!/usr/bin/env python3
"""Adversarial edge-case tables for catalog robustness sweeps.

Same ten schemas as the driver data / tools/gen_scale.py, tiny row
counts, but every value chosen to hit a boundary the clean generators
never produce: empty and whitespace-only documents, uniform-character
and single-token texts, CJK/emoji/RTL unicode, a 100k-char document,
zero and near-zero embedding vectors, exactly-duplicated vectors,
extreme magnitudes, tied event timestamps, zero/huge event values, a
single hyperactive user, orders without lineitems and customers without
orders. The sweep (tools/drive_driver.py with SPARK_GRAFT_SIM_SF) then
checks every query still matches its oracle on this data — NaN
handling, empty-token paths, zero-norm divisions, and tie-breaks are
exactly where two engines drift apart silently.

Deterministic (fixed literals + seeded randint); writes parquet with
the same physical types as gen_scale.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gen_scale import (  # noqa: E402  (same dir)
    EVENT_TYPES,
    LANGS,
    NATIONS,
    PRIORITIES,
    PTYPES,
    REGIONS,
    SEGMENTS,
    _ts_us,
)


def _write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))


def generate(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    r = np.random.RandomState(99)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()), "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = 40  # customers 20..39 have no orders
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc, dtype=np.int64)),
        "c_name": [f"Customer#{k:09d}" for k in range(nc)],
        "c_nationkey": pa.array((np.arange(nc) % 25).astype(np.int32)),
        "c_acctbal": [0.0, -999.99, 9999.99] + [float(k) for k in range(nc - 3)],
        "c_mktsegment": [SEGMENTS[k % 5] for k in range(nc)],
    }))
    ns = 8
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns, dtype=np.int64)),
        "s_name": [f"Supplier#{k:09d}" for k in range(ns)],
        "s_nationkey": pa.array((np.arange(ns) % 25).astype(np.int32)),
        "s_acctbal": [0.0, -1000.0] + [float(k) for k in range(ns - 2)],
    }))
    npart = 30
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(npart, dtype=np.int64)),
        # duplicate names (entity-resolution stressor) + unicode
        "p_name": ["large ring"] * 5 + ["大 螺栓"] * 3 + [
            f"part {k}" for k in range(npart - 8)
        ],
        "p_brand": [f"Brand#{10 + (k % 25)}" for k in range(npart)],
        "p_type": [PTYPES[k % len(PTYPES)] for k in range(npart)],
        "p_size": pa.array(([1, 50] * npart)[:npart], pa.int32()),
        "p_retailprice": [900.0 + k for k in range(npart)],
    }))

    no = 60  # orders 50..59 have no lineitems
    day = 86_400
    base = 788_918_400  # 1995-01-01
    odate = np.array([base + (k % 30) * day for k in range(no)], dtype=np.int64)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no, dtype=np.int64)),
        "o_custkey": pa.array((np.arange(no) % 20).astype(np.int64)),
        "o_orderstatus": [("O", "P", "F")[k % 3] for k in range(no)],
        "o_totalprice": [0.01] + [1000.0 + k for k in range(no - 1)],
        "o_orderdate": _ts_us(odate),
        "o_orderpriority": [PRIORITIES[k % 5] for k in range(no)],
    }))
    nl = 150
    lok = np.sort(r.randint(0, 50, nl)).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, lok[1:] != lok[:-1]])
    linenum = np.arange(nl) - np.repeat(starts, np.diff(np.r_[starts, nl])) + 1
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lok),
        "l_partkey": pa.array((np.arange(nl) % npart).astype(np.int64)),
        "l_suppkey": pa.array((np.arange(nl) % ns).astype(np.int64)),
        "l_linenumber": pa.array(linenum.astype(np.int32)),
        "l_quantity": [1.0, 50.0] * (nl // 2),
        "l_extendedprice": [900.68] + [1000.0 + k for k in range(nl - 1)],
        "l_discount": [0.0, 0.1] * (nl // 2),
        "l_tax": [0.0, 0.08] * (nl // 2),
        "l_returnflag": [("A", "N", "R")[k % 3] for k in range(nl)],
        "l_linestatus": [("O", "F")[k % 2] for k in range(nl)],
        "l_shipdate": _ts_us(odate[lok] + ((np.arange(nl) % 95) + 1) * day),
    }))

    ne = 200
    ev0 = 1_704_067_200  # 2024-01-01
    # tied timestamps (20 events at the same second), one hyperactive user
    ts = np.array([ev0 + 3600] * 20 + [ev0 + (k * 977) % (30 * day)
                                       for k in range(ne - 20)], dtype=np.int64)
    ts.sort()
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(ne, dtype=np.int64)),
        "ts": _ts_us(ts),
        "user_id": pa.array(
            np.array([0] * 120 + [k % 10 for k in range(ne - 120)], dtype=np.int64)
        ),
        "event_type": [EVENT_TYPES[k % 5] for k in range(ne)],
        "value": [0.0, 560.21] * (ne // 2),
        "props": ['{"k": 0}', "{}"] * (ne // 2),
    }))

    texts = (
        [""] * 10                                    # empty
        + ["   "] * 5 + ["\n\t \n"] * 3              # whitespace-only
        + ["word"] * 5                               # single token
        + ["aaaa " * 40] * 6                         # uniform repeated token
        + ["a" * 100_000]                            # one huge doc
        + ["你好 世界 这是 一个 测试 文档 你好 世界"] * 4   # CJK
        + ["🎉 emoji 🌍 heavy 🎉 emoji 🌍 doc"] * 3      # emoji
        + ["مرحبا بالعالم هذا اختبار"] * 3            # RTL
        + ["MiXeD CaSe MiXeD CaSe mixed case"] * 3
        + ["punct!!! ??? ;;; ::: --- ..."] * 3
        + [
            " ".join(
                ["spark", "line", "sort", "fast", "key"][k % 5]
                for k in range(12 + (j % 50))
            )
            for j in range(80)
        ]
    )
    nd = len(texts)
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd, dtype=np.int64)),
        "text": texts,
        "lang": [LANGS[k % 5] for k in range(nd)],
        "source": [f"src{k % 4}" for k in range(nd)],
        "n_chars": pa.array(
            np.array([len(t) for t in texts], dtype=np.int64)
        ),
    }))

    vecs = (
        [[0.0] * 64]                                  # zero vector
        + [[1e-12] + [0.0] * 63]                      # near-zero norm
        + [[100.0] + [0.0] * 63]                      # extreme in-domain magnitude
        # (the distance-op domain is |x| <= sqrt(2^63/dims)/(2*scale)
        # ~ 190 at scale=1e6, 64 dims; beyond it the integer squared-L2
        # overflows LOUDLY in both engines — pinned by
        # test_fixed_point_overflow_is_loud — so the parity sweep stays
        # inside the documented domain)
        + [[-1.0] * 64]                               # all-negative
        + [[1.0] + [0.0] * 63] * 3                    # exact duplicates
        + [
            [float(np.round(np.sin(k * 31 + d), 6)) for d in range(64)]
            for k in range(43)
        ]
    )
    nv = len(vecs)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv, dtype=np.int64)),
        "embedding": pa.array(
            [np.array(v, dtype=np.float32) for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array((np.arange(nv) % 10).astype(np.int32)),
    }))

    with open(os.path.join(out_dir, "_GENERATED"), "w") as fh:
        fh.write("edge-case tables, seed=99\n")
    print(json.dumps({"documents": nd, "embeddings": nv, "events": ne}))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ssbc_scale/gen-edge"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    generate(out)
