#!/usr/bin/env python3
"""Adversarial-skew bench (r7 VERDICT ask #7): time the skew-sensitive
catalog queries on the Zipf-keyed dataset (tools/gen_skew.py) vs the
uniform generator at the same scale factor, and print per-query ratios.
SWEEP.json proves edge-distribution CORRECTNESS; this records that the
salting / AQE-skew-split / size-gated-LSH story holds for PERFORMANCE
under pathological keys, not just uniform data. Results land in
SKEW.json at the repo root; SCALE.md narrates them.

    python3 tools/skew_bench.py [sf]          # default 0.1

Timings are min-of-2 per (query, dataset) after shared warmup, same
discipline as bench.py. Queries also run a cheap row-count sanity check
so a silent empty result can't masquerade as fast.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    # the three VERDICT names + the heavy lineitem aggregations whose
    # shuffles see the hot supplier/part keys
    "salted_join_revenue",
    "profile_key_skew",
    "dedup_minhash_lsh",
    "sql_join_revenue_by_nation",
    "sessionize_events",
    "rolling_user_window",
]


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    uniform_dir = f"/tmp/ssbc_scale/gen-sf{sf}"
    skew_dir = f"/tmp/ssbc_scale/gen-skew-sf{sf}"

    import gen_scale
    import gen_skew

    if not os.path.exists(os.path.join(uniform_dir, "_GENERATED")):
        gen_scale.generate(sf, uniform_dir)
    if not os.path.exists(os.path.join(skew_dir, "_GENERATED")):
        gen_skew.generate(sf, skew_dir)

    from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog
    from spark_streaming_kafka_bucket_counter_spark.session import get_spark

    spark = get_spark(app_name="ssbc-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def _force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    names = [n for n in QUERIES if n in catalog.QUERIES]
    # warmup both datasets' scans + the Arrow worker pool
    _force(catalog.QUERIES["bucket_count_epoch"](spark, uniform_dir))
    _force(catalog.QUERIES["bucket_count_epoch"](spark, skew_dir))

    out: dict[str, dict] = {}
    for name in names:
        fn = catalog.QUERIES[name]
        rec: dict[str, float] = {}
        for label, d in (("uniform", uniform_dir), ("skew", skew_dir)):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _force(fn(spark, d))
                best = min(best, time.perf_counter() - t0)
            rec[label] = round(best, 3)
            n = fn(spark, d).count()
            rec[f"{label}_rows"] = n
            assert n > 0, f"{name} on {label}: empty result"
        rec["ratio"] = round(rec["skew"] / rec["uniform"], 2)
        out[name] = rec
        print(name, json.dumps(rec))

    report = {"sf": sf, "zipf_a": gen_skew.ZIPF_A, "queries": out}
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    with open(os.path.join(root, "SKEW.json"), "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"skew_bench": {n: out[n]["ratio"] for n in out}}))


if __name__ == "__main__":
    main()
