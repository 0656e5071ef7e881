#!/usr/bin/env python3
"""Adversarially SKEWED test tables at real scale (r7 VERDICT ask #7).

``gen_edge.py`` proves boundary-value correctness on tiny tables;
``gen_scale.py`` proves volume on uniform keys. Neither stresses the
thing that actually melts shuffles at 100 TB: pathological KEY
DISTRIBUTIONS. This generator produces the same ten schemas at the
requested scale factor but with Zipf-distributed join/aggregation keys
(one key carrying ~30% of all rows, a heavy power-law tail behind it)
and near-duplicate document clusters that bloat MinHash band buckets —
the workload shapes salting, AQE skew-join splitting and the LSH
size-gated verify exist for. ``tools/skew_bench.py`` then times the
skew-sensitive queries here vs the uniform dataset and records the
ratios in SCALE.md.

Deterministic: gen_scale's seeded output, rewritten with a fixed-seed
Zipf draw. Every rewritten column keeps its physical type, and derived
columns (documents.n_chars) are recomputed so oracle arithmetic stays
exact on this distribution too.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gen_scale  # noqa: E402

SKEW_SEED = 4242
ZIPF_A = 1.3  # P(rank 1) ~ 1/zeta(1.3) ~ 0.29: one key ~30% of rows


def _zipf_keys(r: np.random.RandomState, n_rows: int, n_keys: int) -> np.ndarray:
    z = r.zipf(ZIPF_A, size=n_rows)
    return ((z - 1) % n_keys).astype(np.int64)


def _rewrite(out: str, name: str, **cols) -> None:
    path = os.path.join(out, f"{name}.parquet")
    t = pq.read_table(path)
    for col, arr in cols.items():
        t = t.set_column(t.schema.get_field_index(col), col, arr)
    pq.write_table(t, path)


def generate(sf: float, out_dir: str) -> None:
    gen_scale.generate(sf, out_dir)
    r = np.random.RandomState(SKEW_SEED)

    nc = gen_scale._n("customer", sf)
    ns = gen_scale._n("supplier", sf)
    npart = gen_scale._n("part", sf)
    no = gen_scale._n("orders", sf)
    nl = gen_scale._n("lineitem", sf)
    ne = gen_scale._n("events", sf)
    nusers = max(1, ne // 50)

    # hot customer: the salted-join stress (orders x customer)
    _rewrite(out_dir, "orders",
             o_custkey=pa.array(_zipf_keys(r, no, nc)))
    # hot supplier + hot part: profile_key_skew and every lineitem join
    _rewrite(out_dir, "lineitem",
             l_suppkey=pa.array(_zipf_keys(r, nl, ns)),
             l_partkey=pa.array(_zipf_keys(r, nl, npart)))
    # hyperactive user: sessionization / funnel / stateful paths
    _rewrite(out_dir, "events",
             user_id=pa.array(_zipf_keys(r, ne, nusers)))

    # near-duplicate document clusters: ~14% of docs collapse onto 5
    # templates x 11 tails, so MinHash band buckets hold O(nd/55) docs
    # each instead of O(1) — the candidate-explosion shape the banded
    # join's size gates must absorb
    path = os.path.join(out_dir, "documents.parquet")
    t = pq.read_table(path)
    texts = t.column("text").to_pylist()
    nd = len(texts)
    templates = [
        " ".join(gen_scale.VOCAB[(7 * k + j) % len(gen_scale.VOCAB)]
                 for j in range(40))
        for k in range(5)
    ]
    for d in range(nd):
        if d % 7 == 3:
            texts[d] = f"{templates[d % 5]} tail {d % 11}"
    _rewrite(
        out_dir, "documents",
        text=pa.array(texts),
        n_chars=pa.array(np.array([len(x) for x in texts], dtype=np.int64)),
    )

    with open(os.path.join(out_dir, "_GENERATED"), "w") as fh:
        fh.write(f"sf={sf} seed={gen_scale.SEED} skew_seed={SKEW_SEED} zipf_a={ZIPF_A}\n")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/ssbc_scale/gen-skew-sf{sf}"
    generate(sf, out)
    print(out)


if __name__ == "__main__":
    main()
