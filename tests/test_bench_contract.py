"""The bench surface contract, pinned without running the bench.

The driver parses bench.py's LAST stdout line as JSON from a BOUNDED
tail capture — round 2's full 8 KB per-query line came back truncated
and unparseable (BENCH_r02 "parsed": null). These tests pin everything
that made that class of failure possible: the summary's size, its
schema, and that every name the bench times actually exists in the
catalog.
"""

from __future__ import annotations

import json
from pathlib import Path


def _bench():
    import importlib

    return importlib.import_module("bench")


def test_core_names_all_exist_in_catalog():
    from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog

    b = _bench()
    missing = [n for n in b.CORE if n not in catalog.QUERIES]
    assert not missing, missing
    # HEADLINE covers the whole catalog exactly once
    assert sorted(b.HEADLINE) == sorted(set(b.HEADLINE))
    assert set(b.HEADLINE) == set(b.CORE) | set(catalog.QUERIES)


def test_summary_line_stays_small_and_schema_complete():
    from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog

    b = _bench()
    # worst-case realistic timings for every catalog query
    timings = {n: 123.456 for n in b.HEADLINE if n in catalog.QUERIES}
    full, summary = b.build_records(timings, "0.1")
    line = json.dumps(summary)
    assert len(line) < 1500, f"summary line too big for tail capture: {len(line)}"
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf", "n_queries", "full"):
        assert key in parsed, key
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == len(timings)
    assert set(parsed["queries"]) == set(b.CORE)
    # the full record carries every timing the summary elides
    assert set(full["queries"]) == set(timings)
    assert full["value"] == summary["value"]


def test_driver_priority_is_derived_and_cannot_go_stale():
    """The rotation is computed AT CALL TIME from whatever
    CORRECTNESS_r*.json files exist on disk (VERDICT r8 ask #1): names
    with a green driver row sort in plain insertion order; never-green
    names sort first so the driver's ~50-query insertion-order prefix
    samples them. Properties pinned here: (a) same key set as the raw
    catalog, (b) never-green names strictly precede all green names,
    (c) a simulated new correctness file flips its names out of the
    priority prefix, (d) a simulated brand-new query sorts first."""
    import json

    from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog
    from spark_streaming_kafka_bucket_counter_spark.plans.queries import (
        _driver_green_names,
        _priority_ordered,
        oracle_sql,
        queries,
    )

    q = queries()
    assert set(q) == set(catalog.QUERIES)
    assert set(oracle_sql()) == set(catalog.ORACLES)

    green = _driver_green_names()
    names = list(q)
    first_green = next((i for i, n in enumerate(names) if n in green), len(names))
    late_nongreen = [n for n in names[first_green:] if n not in green]
    assert not late_nongreen, f"never-green names after green ones: {late_nongreen[:5]}"

    # (c)+(d): against a synthetic correctness dir, a green row demotes
    # its name and an unknown (new) query stays in the priority prefix
    import tempfile

    some_green = names[-1]
    with tempfile.TemporaryDirectory() as td:
        with open(Path(td) / "CORRECTNESS_r99.json", "w") as fh:
            json.dump({some_green: {"hash_match": True}}, fh)
        reg = {"brand_new_query_r99": None, some_green: None}
        ordered = list(_priority_ordered(reg, correctness_dir=Path(td)))
        assert ordered == ["brand_new_query_r99", some_green]


def test_driver_priority_ignores_unreadable_correctness_files(tmp_path):
    """A truncated/corrupt CORRECTNESS file degrades to 'not sampled',
    never to an import error — the driver must always get a catalog."""
    (tmp_path / "CORRECTNESS_r01.json").write_text("{ this is not json")
    from spark_streaming_kafka_bucket_counter_spark.plans.queries import (
        _driver_green_names,
        _priority_ordered,
    )

    assert _driver_green_names(tmp_path) == set()
    reg = {"a": 1, "b": 2}
    assert list(_priority_ordered(reg, correctness_dir=tmp_path)) == ["a", "b"]


def test_core_median_protocol():
    """r10 VERDICT ask #2: CORE timings are medians of N samples (odd or
    even), the samples ride in the full record only, and the summary
    line stays tail-safe without them."""
    b = _bench()
    assert b._median([3.0]) == 3.0
    assert b._median([1.0, 9.0, 2.0]) == 2.0          # odd: middle
    assert b._median([10.0, 1.0, 3.0, 2.0]) == 2.5    # even: mean of mids
    timings = {n: 1.0 for n in b.CORE}
    samples = {n: [0.9, 1.0, 1.1, 1.0, 1.0] for n in b.CORE}
    full, summary = b.build_records(timings, "0.1", samples)
    assert full["core_samples"] == samples
    assert "core_samples" not in summary
    assert len(json.dumps(summary)) < 1500


def test_parallelism_stamp_rides_both_records_and_stays_tail_safe():
    """r13 (VERDICT r12 ask #2): the applied master /
    defaultParallelism / shuffle-partition default must appear in BOTH
    the full record and the printed summary line — the artifact-side
    evidence that $SPARK_GRAFT_CPUS was honored — without growing the
    line past the tail-capture budget."""
    b = _bench()
    timings = {n: 1.0 for n in b.CORE}
    par = {
        "master": "local[32]",
        "default_parallelism": 32,
        "shuffle_partitions": 32,
    }
    full, summary = b.build_records(timings, "0.1", parallelism=par)
    assert full["parallelism"] == par
    assert summary["parallelism"] == par
    assert len(json.dumps(summary)) < 1500


def test_core_has_a_cpu_bound_scaling_witness():
    """r13: the CORE scaling set must include text_entropy — the
    CPU-bound query whose low-core/high-core ratio can actually differ
    from 1 (every other CORE query is per-job fixed-cost-bound at
    sf0.1)."""
    b = _bench()
    assert "text_entropy" in b.CORE


def test_rotation_staleness_bound(tmp_path):
    """r10 VERDICT ask #6: with oldest-green-first ordering, every
    catalog name re-appears in the driver's S-query prefix within
    ceil(N / S) rounds of its last green row — the information-
    theoretic floor (N names through S slots per round; no ordering
    does better). Simulated end-to-end against synthetic CORRECTNESS
    files at N=20, S=5 (bound = 4). Production shape N=201, S=50 gives
    bound 5 — ≤4 (the VERDICT's figure) holds whenever N <= 4S, i.e.
    up to 200 names at the driver's 50-row sample; the derivation is
    recorded in COVERAGE.md."""
    import math

    from spark_streaming_kafka_bucket_counter_spark.plans.queries import (
        _priority_ordered,
    )

    N, S = 20, 5
    bound = math.ceil(N / S)
    assert bound == 4
    # production shape: 201 catalog names, 50-query driver sample
    assert math.ceil(201 / 50) == 5

    reg = {f"q{i:03d}": None for i in range(N)}
    last_seen: dict[str, int] = {}
    for rnd in range(1, 15):
        ordered = list(_priority_ordered(reg, correctness_dir=tmp_path))
        assert sorted(ordered) == sorted(reg)
        sampled = ordered[:S]
        with open(tmp_path / f"CORRECTNESS_r{rnd:02d}.json", "w") as fh:
            json.dump({n: {"hash_match": True} for n in sampled}, fh)
        for n in sampled:
            if n in last_seen:
                gap = rnd - last_seen[n]
                assert gap <= bound, f"{n} stale for {gap} rounds (> {bound})"
            last_seen[n] = rnd
    # steady state reached: by round 14 every name has been sampled
    # and re-sampled within the bound
    assert set(last_seen) == set(reg)
    stalest = max(14 - r for r in last_seen.values())
    assert stalest < bound


def test_duplicate_query_name_raises_at_import():
    """The registry is a plain dict; before r11 a duplicate @query name
    silently shadowed an existing query (import-order-dependent winner,
    stale CORRECTNESS history). Now it fails at registration."""
    import pytest

    from spark_streaming_kafka_bucket_counter_spark.plans.queries import (
        QUERIES,
        query,
    )

    existing = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate catalog query name"):
        query(existing)(lambda spark, sf: None)
    # registration of a fresh name still works (and is cleaned up)
    query("__dup_guard_probe__")(lambda spark, sf: None)
    assert "__dup_guard_probe__" in QUERIES
    del QUERIES["__dup_guard_probe__"]


def test_load_evidence_stamped_into_both_records():
    """r11 VERDICT ask #4: the bench artifact carries machine-readable
    co-tenant-load evidence — pre-Spark loadavg, end loadavg, window
    busy-CPU fraction — in the summary line AND the full record; the
    per-run CORE busy fractions land in the full record only (tail
    budget)."""
    b = _bench()
    load = {"start": [0.5, 0.4, 0.3], "end": [9.0, 5.0, 3.0], "busy_frac": 0.7}
    full, summary = b.build_records(
        {"bucket_count_epoch": 1.0}, "0.1",
        {"bucket_count_epoch": [1.0]}, {"bucket_count_epoch": [0.6]}, load,
    )
    assert summary["loadavg"] == load
    assert full["loadavg"] == load
    assert full["core_busy_frac"] == {"bucket_count_epoch": [0.6]}
    assert "core_busy_frac" not in summary
    # the live meters work on this platform
    la = b._loadavg()
    assert la is None or len(la) == 3
    j0 = b._machine_jiffies()
    assert j0 is None or (j0[0] <= j0[1])
    assert b._busy_frac(None, j0) is None
    assert b._busy_frac((0, 0), (50, 100)) == 0.5


def test_core_runs_env_malformed_falls_back(monkeypatch):
    """ADVICE r11 #3: a malformed SPARK_GRAFT_BENCH_CORE_RUNS must not
    abort the bench after warmup; the parse falls back to 5."""
    import os

    monkeypatch.setenv("SPARK_GRAFT_BENCH_CORE_RUNS", "five")
    try:
        runs = int(os.environ.get("SPARK_GRAFT_BENCH_CORE_RUNS", "5"))
    except ValueError:
        runs = 5
    assert runs == 5
    # and the bench source actually guards the parse (not just this test)
    src = Path(_bench().__file__).read_text()
    assert "except ValueError" in src.split("core_runs")[1][:400]
