"""Stateful merged-count mode (A5 semantics), watermarking, delete, and
the ISO-string bucket variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.functions.buckets import (
    ts_epoch_seconds,
    with_bucket_iso_strings,
    with_time_window,
)
from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
from spark_streaming_kafka_bucket_counter_spark.streaming.pipeline import (
    parse_and_bucket,
    start_merged_counter,
)
from spark_streaming_kafka_bucket_counter_spark.streaming.serving import ServingStore
from tests.conftest import SF_DIR


def _payload(spark, n):
    events = load_table(spark, SF_DIR, "events").limit(n)
    return events.select(
        F.to_json(
            F.struct(F.col("event_type"), ts_epoch_seconds(F.col("ts")).cast("double").alias("epoch_ts"))
        ).alias("value")
    )


def test_merged_counter_accumulates_across_batches(spark, tmp_path):
    """Two files -> one availableNow run may process them as separate
    micro-batches; update-mode state must merge counts across them to
    equal the batch groupBy (the reference's MySQL-upsert semantics)."""
    src = tmp_path / "src"
    _payload(spark, 200).coalesce(1).write.mode("append").text(str(src))
    _payload(spark, 400).coalesce(1).write.mode("append").text(str(src))

    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .text(str(src))
    )
    records = parse_and_bucket(
        stream, {"etype": "event_type"}, "epoch_ts", 3600, "epoch"
    )
    q = start_merged_counter(
        records, ["etype"], str(tmp_path / "ckpt"), query_name="merged_test"
    )
    q.awaitTermination(120)

    # memory sink in update mode: last row per key is the merged count
    merged = spark.sql(
        """
        SELECT etype, bucket_start, bucket_end, max(count) AS count
        FROM merged_test GROUP BY etype, bucket_start, bucket_end
        """
    )
    expected = (
        parse_and_bucket(
            _payload(spark, 200).unionAll(_payload(spark, 400)),
            {"etype": "event_type"},
            "epoch_ts",
            3600,
            "epoch",
        )
        .groupBy("etype", "bucket_start", "bucket_end")
        .count()
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, expected.collect()))


def test_time_window_equivalent_to_floor_buckets(spark):
    """F.window tumbling windows == the explicit floor formula (P3 vs the
    watermark-ready representation)."""
    events = load_table(spark, SF_DIR, "events").limit(500)
    win = with_time_window(events, "ts", 300).select(
        "event_id",
        ts_epoch_seconds(F.col("window.start")).alias("ws"),
        ts_epoch_seconds(F.col("window.end")).alias("we"),
    )
    floor = (
        events.withColumn("epoch", ts_epoch_seconds(F.col("ts")))
        .select(
            "event_id",
            (F.floor(F.col("epoch") / 300) * 300).cast("long").alias("bs"),
            (F.floor(F.col("epoch") / 300) * 300 + 300).cast("long").alias("be"),
        )
    )
    joined = win.join(floor, "event_id")
    assert joined.filter((F.col("ws") != F.col("bs")) | (F.col("we") != F.col("be"))).count() == 0


def test_watermarked_merged_counter_runs(spark, tmp_path):
    src = tmp_path / "src"
    events = load_table(spark, SF_DIR, "events").limit(100)
    events.select(
        F.to_json(F.struct(F.col("event_type"), F.col("ts"))).alias("value")
    ).coalesce(1).write.mode("append").text(str(src))
    stream = spark.readStream.schema("value string").text(str(src))
    from spark_streaming_kafka_bucket_counter_spark.functions.projection import (
        decode_json_values,
    )
    from spark_streaming_kafka_bucket_counter_spark.functions.buckets import with_bucket

    decoded = decode_json_values(stream, {"etype": "event_type"}, bucket_field_src="ts")
    records = with_bucket(
        decoded.withColumn("ts", F.col("ts").cast("timestamp")), "ts", 3600, "timestamp"
    )
    q = start_merged_counter(
        records,
        ["etype"],
        str(tmp_path / "ckpt"),
        query_name="wm_test",
        watermark=("ts", "1 hour"),
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT COUNT(*) c FROM wm_test").collect()[0]["c"] > 0


def test_store_delete_conditions(spark, tmp_path):
    store = ServingStore(spark, str(tmp_path / "s"), clean_freq=0)
    df = spark.createDataFrame(
        [("click", 1), ("view", 2), ("click", 3)], "etype string, count long"
    )
    store.append(df, 0)
    store.append(df, 1)
    n = store.delete({"etype": "click"})
    assert n == 4
    left = store.view().collect()
    assert len(left) == 2 and all(r["etype"] == "view" for r in left)
    # rst preserved even though rows were rewritten
    assert store.rst() == 1


def test_iso_string_buckets(spark):
    df = spark.createDataFrame([(1440179087,)], "ts long")
    row = with_bucket_iso_strings(df, "ts", 20).collect()[0]
    assert row["bucket_start_iso"] == "2015-08-21T17:44:40.000000Z"
    assert row["bucket_end_iso"] == "2015-08-21T17:45:00.000000Z"


def test_sliding_count_streaming_batch_parity(spark, tmp_path):
    """sliding_bucket_count is built on the exact F.window construct
    Structured Streaming implements hopping windows with — drive it
    through a real availableNow file stream (complete mode) and require
    bit-identical results to the batch plan."""
    from spark_streaming_kafka_bucket_counter_spark.operators.count import (
        sliding_bucket_count,
    )

    events = load_table(spark, SF_DIR, "events").limit(300).select("event_type", "ts")
    src = tmp_path / "slide_src"
    events.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        sliding_bucket_count(stream, ["event_type"], "ts", window=60, slide=20)
        .writeStream.format("memory")
        .queryName("slide_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "slide_ckpt"))
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain in time"

    got = sorted(map(tuple, spark.sql("SELECT * FROM slide_test").collect()))
    want = sorted(
        map(
            tuple,
            sliding_bucket_count(
                events, ["event_type"], "ts", window=60, slide=20
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
