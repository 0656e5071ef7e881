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

Avro: ``from_avro`` (spark-avro package) is the fast JVM path when its
jar is on the classpath; otherwise the pure-Python wire-format codec in
``functions/avro_lite.py`` decodes the same bytes under Arrow
``mapInPandas`` — both paths produce the same ``j`` struct. The
reference's multi-record Avro framing (S4, ``avro_to_dict`` with
msg_count) is record concatenation, handled by
``avro_lite.decode_records``.
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

    Uses spark-avro's codegen'd ``from_avro`` when the external module is
    on the classpath (the fast path — pure JVM). Otherwise falls back to
    the pure-Python Avro binary codec (``functions/avro_lite.py``, Arrow
    ``mapInPandas`` batches) — same wire format, same ``j`` struct
    contract, always executable.
    """
    # ONLY a missing spark-avro jar triggers the fallback: Spark 4 raises
    # AnalysisException[AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE] at plan
    # time (older lines: TypeError "'JavaPackage' object is not
    # callable"). Real analysis errors — bad schema, missing column —
    # must propagate, not silently reroute to the slower Python path.
    try:
        from pyspark.sql.avro.functions import from_avro

        return df.select(from_avro(F.col("value"), avro_schema_json).alias("j"))
    except (ImportError, TypeError):
        pass
    except Exception as exc:
        if "AVRO_NOT_LOADED" not in str(exc):
            raise
    from ..functions.avro_lite import avro_decode_df

    return avro_decode_df(df, avro_schema_json, value_col="value")


def count_json_payload(df: DataFrame) -> DataFrame:
    """P12: serialize count rows to the Kafka ``value`` JSON payload.

    The reference spliced ``"count"`` into the JSON key string
    (combine_count_json, main.py:175-187 — corrupting non-dict payloads);
    ``to_json(struct(*))`` serializes the real columns instead. Batch and
    streaming share this projection (it is the writer's only transform),
    so the broker-free unit test pins the exact wire bytes."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def kafka_sink_writer(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint_dir: str,
):
    """K2: count rows -> JSON -> Kafka producer sink (main.py:342-371)."""
    payload = count_json_payload(df)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
