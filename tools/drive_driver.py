#!/usr/bin/env python3
"""End-to-end driver-contract simulation — the grading flow, runnable
locally: a BARE SparkSession (none of session.py's confs, exactly like
the external harness) imports ``__spark_entry__``, smoke-checks
``entry()``, then runs every ``queries()`` entry against its
``oracle_sql()`` twin via DuckDB (row count + sorted column names +
order-insensitive value hash, through tests/oracle_harness.compare).

Usage:
    python3 tools/drive_driver.py                       # full catalog, sf0.01
    python3 tools/drive_driver.py name1 name2 ...       # subset re-check
    SPARK_GRAFT_SIM_SF=/tmp/ssbc_scale/gen-sf0.01 \\
        python3 tools/drive_driver.py                   # second distribution

The second-distribution run (tools/gen_scale.py data) is not optional
polish: it caught a cross-engine ROUND() divergence the fixed test data
never exercised (see label_centroids). Exit code = number of mismatches.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# The grading driver runs at sf0.01 where Spark's 1g local-mode default
# heap is plenty; the sf1 scale sweep is not — in local mode executors
# share the driver JVM, and 8 concurrent tasks over 6M-row joins OOM a
# 1g heap (observed: JVM SIGSEGV mid-catalog, every later query failing
# on the dead gateway). driver-memory must be set BEFORE the JVM
# launches, hence the env hook rather than a builder conf.
_mem = os.environ.get("SPARK_GRAFT_SIM_MEM")
if _mem:
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", f"--driver-memory {_mem} pyspark-shell"
    )

import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from oracle_harness import compare

    subset = set(sys.argv[1:])
    if not subset:
        rows = e.entry(spark).collect()
        assert rows, "entry() returned no rows"
        print(f"entry smoke OK: {len(rows)} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, oracles = e.queries(), e.oracle_sql()
    t0, bad = time.time(), 0
    for name in sorted(qs):
        if subset and name not in subset:
            continue
        try:
            if name in oracles:
                ok, detail = compare(spark, con, qs[name], oracles[name], SF)
                if not ok:
                    bad += 1
                    print(name, "MISMATCH", detail, flush=True)
                else:
                    # always one line per query: a full-catalog run at a
                    # big sf can take hours, and a silent loop is
                    # indistinguishable from a hung one
                    print(name, "OK", f"{time.time() - t0:.0f}s", flush=True)
            else:
                print(name, "rows-only:", qs[name](spark, SF).count(), flush=True)
        except Exception as exc:  # keep sweeping; an error IS a finding
            bad += 1
            msg = str(exc).replace("\n", " ")[:300]
            print(name, "ERROR", f"{type(exc).__name__}: {msg}", flush=True)
    n = len(subset or qs)
    print(f"done {n} queries, {bad} mismatches, {int(time.time() - t0)}s vs {SF}")
    return bad


if __name__ == "__main__":
    raise SystemExit(main())
