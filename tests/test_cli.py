"""Composition-root end-to-end: INI config + msg-map side file -> file
source -> bucket-count stream -> serving store -> HTTP queries. The whole
reference application driven exactly the way the reference is
(config-file launch), minus the Kafka broker."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from spark_streaming_kafka_bucket_counter_spark.cli import run


def _write_config(tmp_path, source_dir):
    msg_map = tmp_path / "msg_map.json"
    msg_map.write_text(json.dumps({"etype": "event_type"}))
    cfg = tmp_path / "config.ini"
    cfg.write_text(
        f"""
[KafkaSettings]
broker = unused:9092
topic = unused
source_dir = {source_dir}

[MsgSettings]
bucket_interval = 3600
bucket_field = epoch_ts
bucket_type = epoch
msg_map_schema = {msg_map}

[HTTPEndpointSetting]
sqlite_db = :memory:
sqlite_table = default
clean_interval = 100
clean_freq = 10
port = 0
"""
    )
    return cfg


def _get(base, path):
    with urllib.request.urlopen(base + urllib.parse.quote(path)) as resp:
        return json.loads(resp.read())


def test_cli_e2e_with_renamed_bucket_field(spark, tmp_path):
    """The conversion map renames the bucket source field (ts_new <-
    epoch_ts) — the pipeline must still bucket from the raw field and
    count per (etype, ts_new, bucket)."""
    src = tmp_path / "src"
    src.mkdir()
    rows = [{"event_type": "click", "epoch_ts": 7200} for _ in range(3)]
    (src / "batch0.json").write_text("\n".join(json.dumps(r) for r in rows))

    msg_map = tmp_path / "msg_map.json"
    msg_map.write_text(json.dumps({"etype": "event_type", "ts_new": "epoch_ts"}))
    cfg = tmp_path / "config.ini"
    cfg.write_text(
        f"""
[KafkaSettings]
broker = unused:9092
topic = unused
source_dir = {src}

[MsgSettings]
bucket_interval = 3600
bucket_field = epoch_ts
bucket_type = epoch
msg_map_schema = {msg_map}

[HTTPEndpointSetting]
sqlite_db = :memory:
sqlite_table = default
clean_interval = 100
clean_freq = 10
port = 0
"""
    )
    query, store, server = run(
        str(cfg),
        spark=spark,
        blocking=False,
        store_path=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        query.awaitTermination(120)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        rows_out = _get(base, "/a/*")
        got = {
            (r["etype"], r["ts_new"], r["bucket_start"], r["count"]) for r in rows_out
        }
        assert got == {("click", "7200", 7200, 3)}
    finally:
        server.shutdown()
        if query.isActive:
            query.stop()


def test_config_driven_pipeline_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"event_type": "click", "epoch_ts": 7200 + 10 * i} for i in range(4)
    ] + [{"event_type": "view", "epoch_ts": 7200}]
    (src / "batch0.json").write_text("\n".join(json.dumps(r) for r in rows))

    cfg = _write_config(tmp_path, src)
    query, store, server = run(
        str(cfg),
        spark=spark,
        blocking=False,
        store_path=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        query.awaitTermination(120)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        rows_out = _get(base, "/a/*")
        got = {(r["etype"], r["bucket_start"], r["count"]) for r in rows_out}
        assert got == {("click", 7200, 4), ("view", 7200, 1)}
        assert {r["bucket_end"] for r in rows_out} == {10800}
        # the reference README query, verbatim
        one = _get(base, "/c/Select * FROM default WHERE count=1")
        assert len(one) == 1 and one[0]["etype"] == "view"
        assert _get(base, "/rst") == {"rst_id": 0}
    finally:
        server.shutdown()
        if query.isActive:
            query.stop()
