"""Streaming-native sessionization: Spark's session_window (state-backed,
watermark-evicted, append-mode) must group events identically to the
batch islands operator — INCLUDING at the exact-gap boundary, where
``session_window`` merges touching windows (split iff diff > gap), the
same ``>`` rule the batch islands use. Pinned empirically below; a
``>=`` streaming oracle survived four rounds only because the driver
dataset's sub-second timestamps never produce an exact-gap pair."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.functions.buckets import ts_epoch_seconds
from spark_streaming_kafka_bucket_counter_spark.operators.sessions import (
    session_summary,
    streaming_session_counts,
)

ROWS = [
    # user 1: burst at 0/10/20, second session at 100/105
    (1, 0, 1), (1, 10, 2), (1, 20, 3), (1, 100, 4), (1, 105, 5),
    # user 2: single event
    (2, 50, 6),
]
GAP = 30
FLUSH_USER = 99  # late high-ts event that advances the watermark past
#                  every real session end so append mode emits them


def test_session_window_matches_batch_islands(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    f1 = src / "a_events.json"
    f1.write_text(
        "\n".join(
            json.dumps({"user_id": u, "ts_e": t, "event_id": e}) for u, t, e in ROWS
        )
    )
    f2 = src / "b_flush.json"
    f2.write_text(json.dumps({"user_id": FLUSH_USER, "ts_e": 10_000, "event_id": 999}))
    now = time.time()
    os.utime(f1, (now - 60, now - 60))  # ensure f1 is the earlier batch
    os.utime(f2, (now, now))

    stream = (
        spark.readStream.schema("user_id long, ts_e long, event_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select("user_id", F.timestamp_seconds("ts_e").alias("ts"))
    )
    q = (
        streaming_session_counts(stream, "user_id", "ts", GAP)
        .select(
            "user_id",
            ts_epoch_seconds(F.col("session.start")).alias("session_start"),
            "n_events",
        )
        .writeStream.format("memory")
        .queryName("sessions_native")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    streamed = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql(
            f"SELECT * FROM sessions_native WHERE user_id <> {FLUSH_USER}"
        ).collect()
    }

    batch_df = spark.createDataFrame(ROWS, "user_id long, ts_e long, event_id long")
    batch = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_summary(batch_df, "user_id", "ts_e", GAP, ["event_id"]).collect()
    }
    assert streamed == batch == {
        (1, 0, 3),
        (1, 100, 2),
        (2, 50, 1),
    }


def test_session_window_exact_gap_continues_session(spark):
    """An event EXACTLY ``gap`` seconds after the previous one CONTINUES
    the session (touching windows merge); one second more splits. Both
    engines' oracles must use the same ``> gap`` rule — the gen-sf0.1
    sweep caught a ``>=`` oracle producing two extra sessions."""
    df = spark.createDataFrame(
        [(1, 1000), (1, 2800), (1, 4600), (2, 1000), (2, 2801)], "u long, t long"
    ).select("u", F.timestamp_seconds("t").alias("ts"))
    out = (
        df.groupBy("u", F.session_window("ts", "1800 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("u", F.col("w.start").cast("long").alias("s"), "n")
    )
    got = sorted(tuple(r) for r in out.collect())
    # user 1: chain of exact gaps -> ONE session of 3; user 2: gap+1 -> split
    assert got == [(1, 1000, 3), (2, 1000, 1), (2, 2801, 1)]

    # batch islands agree (they split on diff > gap)
    from spark_streaming_kafka_bucket_counter_spark.operators.sessions import (
        session_summary,
    )

    batch = spark.createDataFrame(
        [(1, 1000, 1), (1, 2800, 2), (1, 4600, 3), (2, 1000, 4), (2, 2801, 5)],
        "u long, ts_e long, event_id long",
    )
    rows = sorted(
        (r["u"], r["session_start"], r["n_events"])
        for r in session_summary(batch, "u", "ts_e", 1800, ["event_id"]).collect()
    )
    assert rows == [(1, 1000, 3), (2, 1000, 1), (2, 2801, 1)]
