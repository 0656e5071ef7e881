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


def test_driver_priority_list_is_not_stale():
    """_DRIVER_PRIORITY exists to rotate never-driver-sampled queries
    into the driver's ~50-query insertion-order prefix. A name that
    already has a green row in any committed CORRECTNESS_r*.json has
    been sampled — keeping it in the list would displace genuinely
    unsampled queries, so the list may only contain never-green catalog
    names (VERDICT r5 ask #4: keep the rotation truthful). "Green" means
    the row's check actually passed: a hash-matched row, or an
    errorless rows-only row for a query that STILL has no oracle. A
    query whose only rows were ``err: no_oracle`` and that has since
    grown an oracle (r7: multimodal_jpeg_stats) is legitimately due for
    re-sampling."""
    import glob
    import json

    from spark_streaming_kafka_bucket_counter_spark.plans.queries import (
        _DRIVER_PRIORITY,
        oracle_sql,
        queries,
    )

    oracles = set(oracle_sql())
    green = set()
    for path in glob.glob(str(Path(__file__).resolve().parent.parent / "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                green.add(name)
            elif row.get("err") == "no_oracle" and name not in oracles:
                green.add(name)  # rows-only by design, ran clean
    catalog = set(queries())
    for name in _DRIVER_PRIORITY:
        assert name in catalog, f"{name} is not a catalog query"
        assert name not in green, f"{name} already driver-green; drop it"
