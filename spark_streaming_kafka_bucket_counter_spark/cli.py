"""Composition root / CLI — the rebuild of the reference's
``kafka_http_sqlite`` (main.py:243-288) and ``__main__`` (main.py:324-336):

    python -m spark_streaming_kafka_bucket_counter_spark <config.ini>

One process wires everything the reference forked two processes for:

  source -> parse_and_bucket (JSON decode, {new:old} projection, tumbling
  bucket) -> foreachBatch per-batch count -> RST_ID-tagged ServingStore
  -> stdlib HTTP endpoint answering the reference's query routes.

Config is the reference's INI (3 sections + JSON side-files, the broken
``'0'`` key fixed). Two extensions, both config-optional:

- ``[KafkaSettings] source_dir`` — read newline-JSON files from a
  directory instead of Kafka (the no-broker/test mode; everything
  downstream is identical because the pipeline only sees a ``value``
  string column either way).
- ``[HTTPEndpointSetting] port`` — HTTP port (0 = pick free).

The reference's launch contract (config path as argv[1], blocking run) is
preserved; `run()` is importable for embedding and returns the pieces so
tests can drive it without processes.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession

from .config import EngineConfig, load_engine_config, read_config_file
from .session import get_spark
from .streaming.http import serve
from .streaming.pipeline import parse_and_bucket, start_bucket_counter
from .streaming.serving import ServingStore


def build_source(spark: SparkSession, cfg: EngineConfig, source_dir: str | None):
    """The value-string stream: Kafka by default, a JSON-lines directory
    when ``source_dir`` is set (identical downstream contract)."""
    if source_dir:
        return (
            spark.readStream.schema("value string")
            .text(source_dir)
            .select("value")
        )
    from .sources.kafka import avro_values, kafka_stream, kafka_values

    stream = kafka_stream(spark, cfg.broker, cfg.topic)
    if cfg.avro_schema:
        return avro_values(stream, cfg.avro_schema)
    return kafka_values(stream)


def run(
    config_path: str,
    spark: SparkSession | None = None,
    blocking: bool = True,
    store_path: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Start the full pipeline from an INI config. Returns
    (query, store, server) when non-blocking."""
    cfg = load_engine_config(config_path)
    raw = read_config_file(config_path)
    source_dir = raw.get("KafkaSettings", {}).get("source_dir") or None
    port = int(raw.get("HTTPEndpointSetting", {}).get("port") or 0)

    spark = spark or get_spark(app_name="ssbc")
    # ':memory:' -> ephemeral store dir (the reference's in-memory SQLite)
    path = store_path or (
        tempfile.mkdtemp(prefix="ssbc_store_")
        if cfg.db_path == ":memory:"
        else cfg.db_path
    )
    store = ServingStore(
        spark,
        path,
        table_name=cfg.table_name,
        clean_interval=cfg.clean_interval,
        clean_freq=cfg.clean_freq,
    )
    records = parse_and_bucket(
        build_source(spark, cfg, source_dir),
        cfg.msg_map,
        cfg.bucket_field or "timestamp",
        cfg.bucket_interval,
        cfg.bucket_type,
    )
    query = start_bucket_counter(
        records,
        store,
        group_cols=[k for k in cfg.msg_map if k != cfg.bucket_field],
        checkpoint_dir=checkpoint_dir or tempfile.mkdtemp(prefix="ssbc_ckpt_"),
        bucket_interval=None if source_dir else cfg.bucket_interval,
    )
    server, _ = serve(store, port=port)
    print(
        f"serving on http://127.0.0.1:{server.server_address[1]} "
        f"(store={path})",
        file=sys.stderr,
    )
    if blocking:
        try:
            query.awaitTermination()
        finally:
            server.shutdown()
        return None
    return query, store, server


def main(argv: list[str] | None = None) -> int:
    args = sys.argv[1:] if argv is None else argv
    if len(args) != 1:
        print(
            "usage: python -m spark_streaming_kafka_bucket_counter_spark <config.ini>",
            file=sys.stderr,
        )
        return 2
    run(args[0])
    return 0
