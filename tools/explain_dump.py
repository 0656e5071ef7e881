#!/usr/bin/env python3
"""Dump `.explain("formatted")` for named catalog queries into text files.

Usage:
    python tools/explain_dump.py <outdir> <suffix> name1 name2 ...

Writes `<outdir>/<name>_<suffix>.txt` for every name — the plan evidence
the optimization rounds commit under plans/r<N>/ so the judge can check
plan-shape claims (Exchange counts, join strategies, PushedFilters)
without running Spark. Queries whose build executes a stream/iterative
loop get the dump_plans.py SIDE_EFFECTFUL annotation instead of a plan.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog  # noqa: E402
from spark_streaming_kafka_bucket_counter_spark.session import get_spark  # noqa: E402

from dump_plans import SIDE_EFFECTFUL  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        if name in SIDE_EFFECTFUL:
            with open(path, "w") as fh:
                fh.write(
                    f"{name}: plan owned by a streaming/iterative loop — "
                    f"{SIDE_EFFECTFUL[name]}\n"
                )
            print(f"{name}: side-effectful, annotated")
            continue
        df = catalog.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"{name}: {path}")


if __name__ == "__main__":
    main()
