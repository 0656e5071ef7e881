#!/usr/bin/env python3
"""Time individual catalog queries with the noop sink (guide §1.4).

Usage:
    python tools/qtime.py [-n RUNS] name1 name2 ...

One warm throwaway pass per query, then N timed passes (default 3);
prints per-query samples + median. Honors SPARK_GRAFT_SF_DIR /
SPARK_GRAFT_CPUS exactly like bench.py, so numbers are comparable to
the bench record. Jobs are labeled for UI/event-log attribution."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog  # noqa: E402
from spark_streaming_kafka_bucket_counter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    spark = get_spark(app_name="qtime")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args:
        fn = catalog.QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name}: timed {i}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        mid = sorted(samples)[len(samples) // 2]
        print(f"{name}: median {mid:.3f}s samples {samples}", flush=True)


if __name__ == "__main__":
    main()
