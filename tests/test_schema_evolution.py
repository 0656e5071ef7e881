"""Schema evolution on the storage layer: files written before a column
existed must read cleanly next to newer files (mergeSchema), with NULLs
for the missing column — the lakehouse append-only evolution contract.
Also pins that the serving store tolerates schema-widened batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.streaming.serving import ServingStore


def test_merge_schema_reads_old_and_new_files(spark, tmp_path):
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v1.write.mode("append").parquet(path)
    v2 = spark.createDataFrame(
        [(2, "b", 99)], "id long, name string, score long"
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 99}


def test_store_survives_widened_batch(spark, tmp_path):
    store = ServingStore(spark, str(tmp_path / "wstore"), clean_freq=0)
    store.append(spark.createDataFrame([(1, 10)], "k long, v long"), 0)
    # a later batch gains a column; per-partition dirs isolate schemas,
    # and the merged view surfaces the union with NULL backfill
    store.append(spark.createDataFrame([(2, 20, "x")], "k long, v long, tag string"), 1)
    view = store.view()
    got = {r["k"]: (r["v"], r["tag"] if "tag" in view.columns else None) for r in view.collect()}
    assert got[1] == (10, None) and got[2] == (20, "x")
