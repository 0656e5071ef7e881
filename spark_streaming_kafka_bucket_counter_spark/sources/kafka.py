"""Kafka source + value decoders (reference S1-S4).

Reference: receiver-based ``KafkaUtils.createStream`` consuming ONE
partition per topic (``{topic: 1}``, main.py:113-121) with an optional
Avro ``valueDecoder`` (utils.py:341-373). Structured Streaming's Kafka
source is offset-based ("direct") with parallelism = topic partitions, so
both reference source variants (S1 receiver / S2 direct) collapse into
one reader, and the 1-receiver bottleneck disappears.

No Kafka broker exists in the test container, so ``kafka_stream`` is
exercised by unit tests only up to builder construction; the decode
functions are pure DataFrame transforms testable on static data (the
pipeline is source-agnostic past ``value``).

Avro: ``from_avro`` needs the spark-avro package on the classpath; gated
behind an import-try with a clear error. The reference's multi-record
Avro framing (S4, ``avro_to_dict`` with msg_count) is unnecessary here —
Kafka delivers one record per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Build the Kafka source stream (S1/S2 unified).

    ``maxOffsetsPerTrigger`` bounds micro-batch size — the scale knob the
    reference lacked (its batches were whatever arrived in the interval).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_values(df: DataFrame) -> DataFrame:
    """P1: discard Kafka keys/metadata, keep value as string (main.py:124)."""
    return df.select(F.col("value").cast("string").alias("value"))


def avro_values(df: DataFrame, avro_schema_json: str) -> DataFrame:
    """S3: Avro-encoded values -> struct column ``j`` (utils.py:341-373).

    Requires the spark-avro package (org.apache.spark:spark-avro_2.13).
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as exc:  # pragma: no cover - environment dependent
        raise ImportError(
            "Avro decode requires pyspark.sql.avro (spark-avro package on "
            "the Spark classpath); add "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        ) from exc
    return df.select(from_avro(F.col("value"), avro_schema_json).alias("j"))


def kafka_sink_writer(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint_dir: str,
):
    """K2: count rows -> JSON -> Kafka producer sink (main.py:342-371).

    The reference spliced ``"count"`` into the JSON key string
    (combine_count_json, main.py:175-187 — corrupting non-dict payloads);
    ``to_json(struct(*))`` serializes the real columns instead.
    """
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
