"""Streaming-native exact dedup: replayed records arriving in LATER
micro-batches (within the watermark delay) must be dropped — the
at-least-once ingestion guard."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.streaming.pipeline import (
    streaming_drop_duplicates,
)


def test_cross_batch_duplicate_records_dropped(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    f1 = src / "a.json"
    f1.write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"event_id": 1, "ts_e": 100, "v": "first"},
                {"event_id": 2, "ts_e": 110, "v": "first"},
            ]
        )
    )
    # batch 2 replays event 1 (same key, later batch) + one new record
    f2 = src / "b.json"
    f2.write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"event_id": 1, "ts_e": 100, "v": "REPLAY"},
                {"event_id": 3, "ts_e": 120, "v": "first"},
            ]
        )
    )
    now = time.time()
    os.utime(f1, (now - 60, now - 60))
    os.utime(f2, (now, now))

    stream = (
        spark.readStream.schema("event_id long, ts_e long, v string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select("event_id", F.timestamp_seconds("ts_e").alias("ts"), "v")
    )
    deduped = streaming_drop_duplicates(stream, ["event_id"], "ts", delay="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    rows = {
        (r["event_id"], r["v"])
        for r in spark.sql("SELECT event_id, v FROM dedup_stream").collect()
    }
    # the replay of event 1 in batch 2 must NOT appear
    assert rows == {(1, "first"), (2, "first"), (3, "first")}
