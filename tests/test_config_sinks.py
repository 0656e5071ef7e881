"""Config INI compatibility (S7/S8) and upsert-SQL builders (K4)."""

from __future__ import annotations

import json

from spark_streaming_kafka_bucket_counter_spark.config import (
    load_engine_config,
    read_config_file,
)
from spark_streaming_kafka_bucket_counter_spark.streaming.sinks import (
    merge_sql,
    upsert_sql,
)


def test_read_config_defaults_overlay(tmp_path):
    ini = tmp_path / "c.ini"
    ini.write_text(
        "[KafkaSettings]\nbroker = host:9092\ntopic =\n\n"
        "[MsgSettings]\nbucket_interval = 60\n\n"
        "[HTTPEndpointSetting]\nclean_interval = 50\n"
    )
    cfg = read_config_file(str(ini))
    assert cfg["KafkaSettings"]["broker"] == "host:9092"
    assert cfg["KafkaSettings"]["topic"] == "logstash-test"  # empty -> default
    assert cfg["MsgSettings"]["bucket_interval"] == 60  # int cast
    # the reference's broken CONFIG_TYPES '0' key (main.py:50) is fixed:
    assert cfg["HTTPEndpointSetting"]["clean_interval"] == 50


def test_load_engine_config_side_files(tmp_path):
    msg_map = tmp_path / "map.json"
    msg_map.write_text(json.dumps({"etype": "event_type", "uid": "user_id"}))
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({"etype": "TEXT", "count": "INTEGER"}))
    ini = tmp_path / "c.ini"
    ini.write_text(
        "[KafkaSettings]\nbroker = b:9092\ntopic = t\n\n"
        f"[MsgSettings]\nbucket_field = ts\nmsg_map_schema = {msg_map}\n\n"
        f"[HTTPEndpointSetting]\nsqlite_schema = {schema}\nsqlite_table = counts\n"
    )
    cfg = load_engine_config(str(ini))
    assert cfg.msg_map == {"etype": "event_type", "uid": "user_id"}
    assert cfg.table_schema == {"etype": "TEXT", "count": "INTEGER"}
    assert cfg.table_name == "counts"
    assert cfg.bucket_interval == 20 and cfg.bucket_type == "epoch"


def test_upsert_sql_accumulates_counts():
    # Reference doctest shape: main.py:433-451.
    row = {"etype": "click", "bucket_start": 100, "count": 7}
    sql = upsert_sql(
        "counts",
        row,
        column_map={"etype": "etype", "bucket_start": "bucket_start", "count": "count"},
        dup_key_update={"count": "count + {count}"},
    )
    assert sql == (
        "INSERT INTO counts (etype, bucket_start, count) "
        "VALUES ('click', 100, 7) ON DUPLICATE KEY UPDATE count = count + 7"
    )


def test_upsert_sql_escapes_quotes():
    sql = upsert_sql("t", {"k": "o'brien"})
    assert "o''brien" in sql  # no raw interpolation (models.py:359-363)


def test_merge_sql_shape():
    sql = merge_sql(
        "counts",
        "counts_staging",
        key_cols=["etype", "bucket_start"],
        update_cols={"count": "t.count + s.count"},
        insert_cols=["etype", "bucket_start", "count"],
    )
    assert sql.startswith("MERGE INTO counts t USING counts_staging s ON")
    assert "t.etype = s.etype AND t.bucket_start = s.bucket_start" in sql
    # ANSI: SET names the target column unqualified (Derby/Postgres
    # reject the MySQL-style qualified target)
    assert "UPDATE SET count = t.count + s.count" in sql


def test_count_json_payload_wire_format(spark):
    """P12: the Kafka sink's only transform — count rows serialized to a
    single string `value` column whose JSON carries the REAL columns
    (the reference's string-splice bug is intentionally not replicated)."""
    import json

    from spark_streaming_kafka_bucket_counter_spark.sources.kafka import (
        count_json_payload,
    )

    df = spark.createDataFrame(
        [("click", 100, 120, 7)],
        "event_type string, bucket_start long, bucket_end long, count long",
    )
    out = count_json_payload(df)
    assert out.columns == ["value"]
    assert dict(out.dtypes)["value"] == "string"
    assert json.loads(out.collect()[0]["value"]) == {
        "event_type": "click",
        "bucket_start": 100,
        "bucket_end": 120,
        "count": 7,
    }
