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
