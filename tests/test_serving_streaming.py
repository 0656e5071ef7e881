"""Serving store lifecycle, streaming pipeline parity, and the query API."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.operators.count import merged_count
from spark_streaming_kafka_bucket_counter_spark.functions.buckets import ts_epoch_seconds
from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
from spark_streaming_kafka_bucket_counter_spark.streaming import api
from spark_streaming_kafka_bucket_counter_spark.streaming.pipeline import (
    parse_and_bucket,
    start_bucket_counter,
)
from spark_streaming_kafka_bucket_counter_spark.streaming.serving import (
    RST_COL,
    ServingStore,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def store(spark, tmp_path):
    return ServingStore(spark, str(tmp_path / "store"), clean_interval=100, clean_freq=10)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "event_type string, count long")


def test_store_append_tag_and_rst(spark, store):
    store.append(_batch(spark, [("click", 3)]), 0)
    store.append(_batch(spark, [("click", 2), ("view", 5)]), 1)
    assert store.rst() == 1
    view = store.view()
    assert set(view.columns) == {"event_type", "count", RST_COL}
    # K7: every row tagged; same key in two batches -> two rows (§2.11)
    assert view.filter(F.col("event_type") == "click").count() == 2


def test_store_idempotent_replay(spark, store):
    store.append(_batch(spark, [("click", 3)]), 0)
    store.append(_batch(spark, [("click", 99)]), 0)  # crash-replay of batch 0
    rows = store.view().collect()
    assert len(rows) == 1 and rows[0]["count"] == 99


def test_store_retention_clean(spark, store):
    store.clean_freq = 0  # manual clean
    for i in range(6):
        store.append(_batch(spark, [("click", i)]), i)
    dropped = store.clean(clean_interval=3)
    # DELETE WHERE RST_ID < max - clean_interval (models.py:702-735)
    assert dropped == 2
    assert store.view().agg(F.min(RST_COL)).collect()[0][0] == 2
    assert store.rst() == 5


def test_store_reset_and_exists(spark, store):
    assert not store.exists()
    store.append(_batch(spark, [("click", 1)]), 0)
    assert store.exists()
    store.reset()
    assert not store.exists()


def test_api_surface(spark, store):
    store.append(_batch(spark, [("click", 3), ("view", 1)]), 0)
    store.append(_batch(spark, [("click", 2)]), 1)

    assert api.rst(store) == {"rst_id": 1}
    assert len(api.select_all(store)) == 3
    assert len(api.recent_values(store, 1)) == 1  # H6
    assert len(api.direct_value(store, 0)) == 2  # H7
    got = api.custom_sql(store, "SELECT * FROM default WHERE count = 1")  # H2 (README:134)
    assert got == [{"event_type": "view", "count": 1, RST_COL: 0}]
    rng = api.select_range(store, "count", 2, "None")  # H8 open side
    assert sorted(r["count"] for r in rng) == [2, 3]
    sel = api.custom_select(store, json.dumps({"event_type": ["eq", "click"]}))  # H9
    assert len(sel) == 2
    assert api.custom_select(store, "not json{") == []  # parse failure -> empty
    api.reset(store)
    assert api.rst(store) == {"rst_id": -1}


def test_streaming_batch_parity(spark, store, tmp_path):
    """Feed events as a JSON file stream through the full pipeline
    (decode -> project -> bucket -> per-batch count -> store) with
    availableNow, and assert equality with the batch groupBy over the
    same data (SURVEY §5.3 parity harness)."""
    events = load_table(spark, SF_DIR, "events").limit(500)
    payload = events.select(
        F.to_json(
            F.struct(
                F.col("event_type"),
                ts_epoch_seconds(F.col("ts")).cast("double").alias("epoch_ts"),
            )
        ).alias("value")
    )
    src_dir = tmp_path / "stream_src"
    payload.coalesce(1).write.mode("overwrite").text(str(src_dir))

    stream = spark.readStream.schema("value string").text(str(src_dir))
    records = parse_and_bucket(
        stream,
        conversion={"etype": "event_type"},
        bucket_field="epoch_ts",
        bucket_interval=20,
        bucket_type="epoch",
    )
    q = start_bucket_counter(
        records, store, ["etype"], checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    streamed = store.view().drop(RST_COL)
    batch = merged_count(
        parse_and_bucket(
            payload,
            conversion={"etype": "event_type"},
            bucket_field="epoch_ts",
            bucket_interval=20,
            bucket_type="epoch",
        ),
        ["etype", "bucket_start", "bucket_end"],
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))
    # exactly one batch id for a single availableNow drain of one file
    assert store.rst() >= 0


def test_parse_and_bucket_with_renamed_bucket_field(spark):
    """A conversion map that RENAMES the bucket source field must still
    bucket from the raw field (reference utils.py:93-94 reads the bucket
    field from the undecoded dict, independent of the map)."""
    payload = spark.createDataFrame(
        [(json.dumps({"event_type": "click", "timestamp": 45}),),
         (json.dumps({"event_type": "view", "timestamp": 75}),)],
        "value string",
    )
    out = parse_and_bucket(
        payload,
        conversion={"etype": "event_type", "ts_new": "timestamp"},
        bucket_field="timestamp",
        bucket_interval=20,
        bucket_type="epoch",
    )
    rows = {tuple(r) for r in out.select("etype", "ts_new", "bucket_start", "bucket_end").collect()}
    assert rows == {("click", "45", 40, 60), ("view", "75", 60, 80)}


def test_parse_and_bucket_dropped_bucket_field_still_buckets(spark):
    """Map that does NOT project the bucket field: bucket columns appear,
    the raw field does not (pre-fix behavior, must keep working)."""
    payload = spark.createDataFrame(
        [(json.dumps({"event_type": "click", "timestamp": 45}),)], "value string"
    )
    out = parse_and_bucket(
        payload,
        conversion={"etype": "event_type"},
        bucket_field="timestamp",
        bucket_interval=20,
        bucket_type="epoch",
    )
    assert set(out.columns) == {"etype", "bucket_start", "bucket_end"}
    assert [tuple(r) for r in out.collect()] == [("click", 40, 60)]


def test_sliding_counter_store_parity(spark, store, tmp_path):
    """start_sliding_counter: hopping-window counts drained through a real
    availableNow stream into the serving store must equal the batch
    sliding_bucket_count over the same rows."""
    from spark_streaming_kafka_bucket_counter_spark.operators.count import (
        sliding_bucket_count,
    )
    from spark_streaming_kafka_bucket_counter_spark.streaming.pipeline import (
        start_sliding_counter,
    )

    events = load_table(spark, SF_DIR, "events").limit(400).select("event_type", "ts")
    src = tmp_path / "slide_src"
    events.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = start_sliding_counter(
        stream, store, ["event_type"], "ts",
        window=60, slide=20,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(120), "stream did not drain in time"

    got = sorted(
        map(tuple, store.view().drop(RST_COL).collect())
    )
    want = sorted(
        map(tuple, sliding_bucket_count(events, ["event_type"], "ts", 60, 20).collect())
    )
    assert got == want and len(got) > 0


def test_store_compact_frozen_partitions(spark, tmp_path):
    """Round 9 (manifest substrate): compaction publishes ONE snapshot
    whose frozen partitions are single-file; the displaced fragments
    RETIRE (still on disk for readers pinned to the prior snapshot)
    and a zero-grace GC converges the directory to exactly the live
    set — the retire-then-GC twin of the old 'swept next maintenance'
    contract."""
    from spark_streaming_kafka_bucket_counter_spark.sources.manifest import (
        gc_index_tree,
        latest_manifest,
    )

    store = ServingStore(spark, str(tmp_path / "cstore"), clean_freq=0)
    df = spark.range(100).withColumnRenamed("id", "v")
    for b in range(4):
        store.append(df.repartition(4), b)  # 4 files per partition

    before = store.view().groupBy().sum("v").collect()[0][0]
    # freeze everything but the most recent 2
    assert store.compact(keep_recent=2) == 2

    def _live_per_batch():
        m = latest_manifest(tmp_path / "cstore")
        out = {}
        for f in m["files"]:
            b = int(f.split("/", 1)[0].split("=", 1)[1])
            out[b] = out.get(b, 0) + 1
        return out

    live = _live_per_batch()
    for b in range(2):  # frozen -> single live file
        assert live[b] == 1, live
    for b in range(2, 4):  # hot window untouched
        assert live[b] == 4, live
    # data unchanged, retired fragments invisible to the view
    assert store.view().groupBy().sum("v").collect()[0][0] == before
    assert store._batch_ids() == [0, 1, 2, 3]
    # idempotent: second run finds nothing to do
    assert store.compact(keep_recent=2) == 0

    # GC with expired grace converges disk to the live set exactly
    import glob

    gc_index_tree(tmp_path / "cstore", grace_sec=0)
    for b in range(2):
        assert len(glob.glob(str(tmp_path / "cstore" / f"RST_ID={b}" / "*.parquet"))) == 1
    for b in range(2, 4):
        assert len(glob.glob(str(tmp_path / "cstore" / f"RST_ID={b}" / "*.parquet"))) == 4
    assert store.view().groupBy().sum("v").collect()[0][0] == before


def test_store_compact_crash_recovery(spark, tmp_path):
    """Every interruption point of compact()'s two-rename swap must
    self-heal on the next metadata read — a batch can never vanish."""
    import shutil

    store = ServingStore(spark, str(tmp_path / "rstore"), clean_freq=0)
    df = spark.range(50).withColumnRenamed("id", "v")
    for b in range(3):
        store.append(df.repartition(3), b)
    total = store.view().groupBy().sum("v").collect()[0][0]
    part = tmp_path / "rstore" / "RST_ID=0"

    # crash point 1: staged rewrite written, swap not started
    shutil.copytree(part, tmp_path / "rstore" / "_compact_0")
    assert store._batch_ids() == [0, 1, 2]
    assert not (tmp_path / "rstore" / "_compact_0").exists()
    assert store.view().groupBy().sum("v").collect()[0][0] == total

    # crash point 2: between the renames (batch only under _old_0)
    shutil.copytree(part, tmp_path / "rstore" / "_compact_0")
    part.rename(tmp_path / "rstore" / "_old_0")
    assert store._batch_ids() == [0, 1, 2]  # promoted, not lost
    assert part.exists() and not (tmp_path / "rstore" / "_old_0").exists()
    assert store.view().groupBy().sum("v").collect()[0][0] == total

    # crash point 3: swap done, backup dir not yet deleted
    shutil.copytree(part, tmp_path / "rstore" / "_old_0")
    assert store._batch_ids() == [0, 1, 2]
    assert not (tmp_path / "rstore" / "_old_0").exists()
    assert store.view().groupBy().sum("v").collect()[0][0] == total

    # crash point 2 with the staged copy lost: original restored
    part.rename(tmp_path / "rstore" / "_old_0")
    assert store._batch_ids() == [0, 1, 2]
    assert store.view().groupBy().sum("v").collect()[0][0] == total


def test_store_time_travel(spark, tmp_path):
    store = ServingStore(spark, str(tmp_path / "ttstore"), clean_freq=0)
    for b in range(3):
        store.append(spark.createDataFrame([(b, b * 10)], "k long, v long"), b)
    asof1 = store.view_asof(1)
    assert sorted(r["k"] for r in asof1.collect()) == [0, 1]
    # pruning: only the qualifying partition dirs are scanned
    plan = asof1._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "RST_ID" in plan
    # full view unaffected
    assert store.view().count() == 3


def test_store_compact_is_reader_atomic(spark, tmp_path):
    """Racing readers during compaction never observe a partial store
    (VERDICT r5 ask #8). Two readers race repeated compactions: a Spark
    reader re-aggregating the full view (must always see every row), and
    a high-frequency filesystem lister resolving every partition the way
    Spark's file index does (every RST_ID must always be present,
    resolvable, and non-empty — the round-5 two-rename swap had a window
    where a partition was absent). The symlink publish makes the swap a
    single atomic rename, so both loops must be clean."""
    import glob
    import os
    import threading

    store = ServingStore(spark, str(tmp_path / "astore"), clean_freq=0)
    df = spark.range(100).withColumnRenamed("id", "v")
    n_parts = 4
    for b in range(n_parts):
        store.append(df.repartition(4), b)
    expect_sum = store.view().groupBy().sum("v").collect()[0][0]
    expect_ids = set(range(n_parts))
    stop = threading.Event()
    errors: list[str] = []

    def spark_reader():
        while not stop.is_set():
            got = store.view().groupBy().sum("v").collect()[0][0]
            if got != expect_sum:
                errors.append(f"spark reader saw partial sum {got}")
                return

    def fs_lister():
        root = str(tmp_path / "astore")
        while not stop.is_set():
            seen = {
                int(name.split("=", 1)[1])
                for name in os.listdir(root)
                if name.startswith("RST_ID=") and os.path.isdir(os.path.join(root, name))
            }
            if seen != expect_ids:
                errors.append(f"lister saw partitions {sorted(seen)}")
                return
            for b in expect_ids:
                files = glob.glob(os.path.join(root, f"RST_ID={b}", "*.parquet"))
                if not files:
                    errors.append(f"lister saw empty partition {b}")
                    return

    threads = [threading.Thread(target=spark_reader), threading.Thread(target=fs_lister)]
    for t in threads:
        t.start()
    try:
        for _ in range(5):
            # re-fragment every partition, then compact all of them: each
            # round performs n_parts atomic swaps under the racing readers
            for b in range(n_parts):
                store.append(df.repartition(4), b)
            assert store.compact(keep_recent=0) == n_parts
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors[0]
    assert store.view().groupBy().sum("v").collect()[0][0] == expect_sum

def test_store_clean_retires_then_gcs_and_snapshot_pins(spark, tmp_path):
    """Round 9 (r8 VERDICT ask #6): retention clean() must not yank
    files from under a reader — the dropped batches leave the latest
    snapshot immediately, but a reader that resolved the PREVIOUS
    snapshot keeps a complete, readable file set through the grace
    window; zero-grace GC then converges disk to the live set."""
    from spark_streaming_kafka_bucket_counter_spark.sources.manifest import (
        gc_index_tree,
    )

    store = ServingStore(spark, str(tmp_path / "gstore"), clean_freq=0)
    for b in range(6):
        store.append(spark.createDataFrame([(b, b * 10)], "k long, v long"), b)

    pinned = store.snapshot()
    pinned_df = store.view_at(pinned)  # planned BEFORE the clean

    assert store.clean(clean_interval=2) == 3  # drop batches 0,1,2
    assert store._batch_ids() == [3, 4, 5]
    assert sorted(r["k"] for r in store.view().collect()) == [3, 4, 5]

    # the pinned reader still sees all six batches: retired files are
    # on disk inside the grace window
    assert sorted(r["k"] for r in pinned_df.collect()) == [0, 1, 2, 3, 4, 5]
    assert sorted(r["k"] for r in store.view_at(pinned).collect()) == list(range(6))

    gc_index_tree(tmp_path / "gstore", grace_sec=0)
    import glob

    remaining = glob.glob(str(tmp_path / "gstore" / "RST_ID=*"))
    assert sorted(remaining) == [
        str(tmp_path / "gstore" / f"RST_ID={b}") for b in (3, 4, 5)
    ]
    assert sorted(r["k"] for r in store.view().collect()) == [3, 4, 5]


def test_store_forget_rows(spark, tmp_path):
    """Right-to-be-forgotten on the serving store (free on the manifest
    substrate): only files containing the ids are rewritten, results
    match never-inserted, and after GC the bytes are gone."""
    from spark_streaming_kafka_bucket_counter_spark.sources.manifest import (
        gc_index_tree,
    )

    store = ServingStore(spark, str(tmp_path / "fstore"), clean_freq=0)
    for b in range(3):
        rows = [(b * 10 + i, f"u{b * 10 + i}") for i in range(4)]
        store.append(
            spark.createDataFrame(rows, "user_id long, name string"), b
        )

    n = store.forget("user_id", [1, 21])
    assert n >= 1
    got = sorted(r["user_id"] for r in store.view().collect())
    assert got == [0, 2, 3, 10, 11, 12, 13, 20, 22, 23]
    # untouched batch 1 files were not rewritten (still 1 file live)
    m = store.snapshot()
    assert any(f.startswith("RST_ID=1/") for f in m["files"])

    gc_index_tree(tmp_path / "fstore", grace_sec=0)
    assert sorted(r["user_id"] for r in store.view().collect()) == got


def test_store_legacy_symlink_layout_migrates(spark, tmp_path):
    """A pre-round-9 store (RST_ID=<b> symlinks into hidden _data_*
    version dirs) must migrate losslessly: symlinks materialize, the
    first mutation adopts the tree as generation 1, and old version
    debris is swept — no batch vanishes on upgrade."""
    import os

    root = tmp_path / "lstore"
    root.mkdir()
    for b in range(2):
        data = root / f"_data_{b}_legacy"
        spark.createDataFrame([(b, b)], "k long, v long").write.parquet(str(data))
        os.symlink(data.name, root / f"RST_ID={b}")
    (root / "_data_9_orphan").mkdir()  # displaced version, swept

    store = ServingStore(spark, str(root), clean_freq=0)
    assert store._batch_ids() == [0, 1]
    assert sorted(r["k"] for r in store.view().collect()) == [0, 1]
    assert not any(p.is_symlink() for p in root.iterdir())
    assert not (root / "_data_9_orphan").exists()

    # first mutation adopts the migrated tree: nothing vanishes
    store.append(spark.createDataFrame([(2, 2)], "k long, v long"), 2)
    m = store.snapshot()
    assert m is not None and m["generation"] == 1
    assert sorted(r["k"] for r in store.view().collect()) == [0, 1, 2]
