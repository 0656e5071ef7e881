"""Resilience: corrupt-record dead-lettering (one bad message must not
stall the stream — the reference crashed the whole batch, utils.py:58)
and checkpoint recovery (restarting a drained query must process ONLY
new data; replays must not double-count — exactly-once serving rows)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.functions.projection import (
    CORRUPT_COL,
    decode_json_values,
)
from spark_streaming_kafka_bucket_counter_spark.streaming.pipeline import (
    parse_and_bucket,
    start_bucket_counter,
)
from spark_streaming_kafka_bucket_counter_spark.streaming.serving import (
    RST_COL,
    ServingStore,
)


def test_corrupt_records_dead_letter_not_crash(spark):
    rows = [
        (json.dumps({"event_type": "click", "timestamp": 45}),),
        ("not json at all {",),
        (json.dumps({"event_type": "view"}),),  # missing bucket field
    ]
    df = spark.createDataFrame(rows, "value string")
    out = decode_json_values(
        df, {"etype": "event_type"}, bucket_field_src="timestamp", keep_corrupt=True
    ).collect()
    assert len(out) == 3  # nothing dropped, nothing raised
    by_corrupt = {r[CORRUPT_COL]: r for r in out}
    assert by_corrupt.get("not json at all {") is not None
    good = [r for r in out if r[CORRUPT_COL] is None]
    # the well-formed record keeps its fields; the missing-field record
    # decodes with a NULL bucket source instead of KeyError-ing the batch
    assert {r["etype"] for r in good} == {"click", "view"}
    assert {r["timestamp"] for r in good} == {"45", None}


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    store = ServingStore(spark, str(tmp_path / "store"), clean_interval=100, clean_freq=10)

    def _write(name, n, ts):
        (src / name).write_text(
            "\n".join(
                json.dumps({"event_type": "click", "epoch_ts": ts}) for _ in range(n)
            )
        )

    def _drain():
        stream = spark.readStream.schema("value string").text(str(src))
        records = parse_and_bucket(
            stream, {"etype": "event_type"}, "epoch_ts", 3600, "epoch"
        )
        q = start_bucket_counter(records, store, ["etype"], checkpoint_dir=ckpt)
        assert q.awaitTermination(120)

    _write("b0.json", 3, 7200)
    _drain()
    first = {(r["etype"], r["bucket_start"], r["count"]) for r in store.view().drop(RST_COL).collect()}
    assert first == {("click", 7200, 3)}

    # restart from the same checkpoint with one NEW file: only it is read
    _write("b1.json", 2, 7200)
    _drain()
    view = store.view()
    rows = {(r["etype"], r["bucket_start"], r["count"], r[RST_COL]) for r in view.collect()}
    # batch 0 rows intact (no reprocessing/double-count), batch 1 adds the delta
    assert rows == {("click", 7200, 3, 0), ("click", 7200, 2, 1)}
    total = view.agg(F.sum("count")).collect()[0][0]
    assert total == 5
