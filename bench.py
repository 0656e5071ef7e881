#!/usr/bin/env python3
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE SMALL JSON line (the LAST line of stdout):
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {core name: sec, ...}, "sf": <sf>, "n_queries": N,
   "full": "bench_full.json"}

The driver captures only a bounded stdout tail, so the printed line keeps
`queries` to the 8 CORE reference-parity timings (~400 bytes — round 2's
single ~8 KB line with all 107 timings was truncated to an unparseable
fragment, BENCH_r02 "parsed": null). The COMPLETE per-query timing map is
written to `bench_full.json` next to this script and committed per round,
so round-over-round per-query comparison never depends on driver capture.

Each query is forced end-to-end with the noop sink (full execution, no
driver collect overhead). Warmup passes absorb one-time machinery cost so
numbers reflect steady-state plan quality, not queue position: the
flagship absorbs JVM/codegen startup and an Arrow-path query warms the
Python worker pool (round 3 lesson: moving sim_ivf_topk into the CORE
prefix made it pay ~6s of Arrow worker startup that mid-run queries never
see — 8.1s cold vs 1.5s warm, misread as a 2.4x regression).

CORE queries run under the MEDIAN protocol (r10 VERDICT ask #2): one
throwaway warm pass, then N=5 timed passes, recording the median — the
round-over-round headline record is order-insensitive AND noise-robust
(the r10 quiet run drifted +15% on 9 of 11 headline queries, entirely
inside single-run ±40% noise; medians make a real 15-30% regression
visible the round it lands). The per-query samples land in
bench_full.json under "core_samples". The full catalog stays
single-pass (adaptive min-of-2 for the heavy tail).
`SPARK_GRAFT_BENCH_CORE_RUNS` overrides N for quick local iteration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog
from spark_streaming_kafka_bucket_counter_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The reference-parity core + heavy relational queries run first (their
# timings are the round-over-round headline), then EVERY remaining catalog
# query — full coverage so a regression anywhere (SQL surface, predicates,
# multimodal, extensions) is visible in the per-round bench record.
CORE = [
    "bucket_count_epoch",
    "bucket_count_multikey",
    "bucket_count_iso",
    "json_decode_count",
    "merged_count_by_type",
    "sql_join_revenue_by_nation",
    "sql_topk_orders",
    "retention_recent_batches",
    # extension flagships — per-round driver visibility for the heavy
    # curation paths without growing the printed line past a tail window
    "dedup_minhash_lsh",
    "sim_ivf_topk",
    "corpus_curation_stack",
    # CPU-bound scaling witness (r13, VERDICT r12 ask #2): every other
    # CORE query is <=2 s fixed-cost-bound at sf0.1, so low-core/high-
    # core ratios sit at ~1 and the driver cannot distinguish "env
    # ignored" from "nothing here scales". text_entropy's per-doc
    # folds are fanned to defaultParallelism (sources/files.fan_out_scan),
    # so its runtime genuinely tracks core count. ADDITION-only: no
    # existing CORE entry moved or renamed.
    "text_entropy",
]
HEADLINE = CORE + [n for n in sorted(catalog.QUERIES) if n not in CORE]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _loadavg() -> list[float] | None:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - non-unix
        return None


def _machine_jiffies() -> tuple[int, int] | None:
    """(busy, total) aggregate jiffies from /proc/stat — the
    machine-wide CPU meter behind the per-run busy samples."""
    try:
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:]]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
        return sum(vals) - idle, sum(vals)
    except (OSError, ValueError, IndexError):  # pragma: no cover
        return None


def _busy_frac(j0, j1) -> float | None:
    """Machine-wide busy CPU fraction between two _machine_jiffies
    samples (None when /proc/stat is unavailable or no time passed)."""
    if j0 is None or j1 is None or j1[1] <= j0[1]:
        return None
    return round((j1[0] - j0[0]) / (j1[1] - j0[1]), 3)


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # pre-Spark loadavg = the co-tenant evidence (everything after this
    # point includes our own 32-thread load); r11 SCALE.md read this by
    # hand from /proc/loadavg — now it's stamped into the artifact so
    # loaded bench windows are machine-detectable (VERDICT r11 ask #4)
    load_start = _loadavg()
    jiff_start = _machine_jiffies()
    spark = get_spark(app_name="ssbc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # stamp the APPLIED parallelism into the artifact (VERDICT r12 ask
    # #2): session code honors $SPARK_GRAFT_CPUS (session.get_spark),
    # but the JSON line carried no evidence, so a scaling run could not
    # be distinguished from an ignored env from the artifact alone
    parallelism = {
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
    }

    # Warmups (untimed): JVM/codegen via the flagship, then the Arrow
    # python-worker pool via an Arrow-path query — so no CORE query pays
    # one-time machinery cost just for being first in line.
    _force(catalog.QUERIES["bucket_count_epoch"](spark, SF_DIR))
    if "sim_ivf_topk" in catalog.QUERIES:
        _force(catalog.QUERIES["sim_ivf_topk"](spark, SF_DIR))

    try:
        core_runs = int(os.environ.get("SPARK_GRAFT_BENCH_CORE_RUNS", "5"))
    except ValueError:
        # a malformed env override must not abort the bench after the
        # expensive warmup (ADVICE r11 #3) — fall back to the default
        core_runs = 5
    timings: dict[str, float] = {}
    core_samples: dict[str, list[float]] = {}
    core_busy: dict[str, list[float | None]] = {}
    for name in HEADLINE:
        fn = catalog.QUERIES.get(name)
        if fn is None:
            continue
        if name in CORE:
            # median protocol: warm throwaway, then N timed passes
            _force(fn(spark, SF_DIR))
            samples = []
            busy = []
            for _ in range(max(1, core_runs)):
                j0 = _machine_jiffies()
                t0 = time.time()
                _force(fn(spark, SF_DIR))
                samples.append(round(time.time() - t0, 3))
                busy.append(_busy_frac(j0, _machine_jiffies()))
            core_samples[name] = samples
            core_busy[name] = busy
            timings[name] = _median(samples)
            continue
        t0 = time.time()
        _force(fn(spark, SF_DIR))
        elapsed = time.time() - t0
        if elapsed > 2.0:
            # heavy tail queries are what round-over-round diffs audit;
            # a single shot mixes first-run costs (broadcasts, cache
            # builds, GC) into the record — take min-of-2 adaptively so
            # only the ~15 heavy queries pay the extra pass
            t1 = time.time()
            _force(fn(spark, SF_DIR))
            elapsed = min(elapsed, time.time() - t1)
        timings[name] = round(elapsed, 3)

    load = {
        "start": load_start,
        "end": _loadavg(),
        "busy_frac": _busy_frac(jiff_start, _machine_jiffies()),
    }
    full, summary = build_records(
        timings, sf, core_samples, core_busy, load, parallelism
    )
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")

    # Small summary LAST (survives any stdout tail window): totals + the
    # CORE timings only; the full per-query map lives in bench_full.json.
    print(json.dumps(summary))


def _median(samples: list[float]) -> float:
    s = sorted(samples)
    n = len(s)
    mid = n // 2
    return round(s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2, 3)


def build_records(
    timings: dict[str, float], sf: str,
    core_samples: dict[str, list[float]] | None = None,
    core_busy: dict[str, list[float | None]] | None = None,
    load: dict | None = None,
    parallelism: dict | None = None,
) -> tuple[dict, dict]:
    """(full record, one-line summary). The summary must stay SMALL —
    the driver captures a bounded stdout tail, and round 2's 8 KB line
    was truncated to an unparseable fragment (contract pinned in
    tests/test_bench_contract.py). ``load`` (r11 ask #4) stamps the
    co-tenant evidence into BOTH records: pre-Spark loadavg ("start" —
    the only sample our own 32 threads haven't polluted), end loadavg,
    and the machine-wide busy-CPU fraction over the whole window;
    per-run busy fractions for the CORE medians land in the full record
    so a loaded window is attributable to specific samples.
    ``parallelism`` (r13, VERDICT r12 ask #2) stamps the applied
    master / defaultParallelism / shuffle-partition default into BOTH
    records (~70 bytes, tail-safe) so the scaling contract is
    verifiable from the artifact."""
    full = {
        "metric": f"headline_query_total_sf{sf}",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        # raw N-run samples behind each CORE median — the drift audit's
        # evidence trail (summary line elides them to stay tail-safe)
        "core_samples": core_samples or {},
        # machine-wide busy-CPU fraction during each CORE timed run
        "core_busy_frac": core_busy or {},
        "loadavg": load or {},
        "parallelism": parallelism or {},
    }
    summary = dict(full)
    del summary["core_samples"]
    del summary["core_busy_frac"]
    summary["queries"] = {n: timings[n] for n in CORE if n in timings}
    summary["n_queries"] = len(timings)
    summary["full"] = "bench_full.json"
    return full, summary


if __name__ == "__main__":
    main()
