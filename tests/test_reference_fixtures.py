"""Golden input->output pairs extracted from the reference's embedded
doctests and README examples (FIXTURES.md §A). These pin exact reference
semantics: bucket math, projection direction, comparator argument order,
serving-row shape, retention edge cases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.functions import predicates as P
from spark_streaming_kafka_bucket_counter_spark.functions.buckets import with_bucket
from spark_streaming_kafka_bucket_counter_spark.functions.projection import (
    decode_json_values,
)
from spark_streaming_kafka_bucket_counter_spark.operators.count import merged_count
from spark_streaming_kafka_bucket_counter_spark.streaming.serving import (
    RST_COL,
    ServingStore,
)


# --- A2: bucket_epoch_epoch doctest pairs (utils.py:226-233) -------------
@pytest.mark.parametrize(
    "interval,epoch,start,end",
    [
        (10, 1, 0, 10),
        (10, 9, 0, 10),
        (10, 11, 10, 20),
        (20, 1440179087, 1440179080, 1440179100),  # README:121-132 row
    ],
)
def test_bucket_epoch_doctest_pairs(spark, interval, epoch, start, end):
    df = spark.createDataFrame([(epoch,)], "ts long")
    row = with_bucket(df, "ts", interval, "epoch").collect()[0]
    assert (row["bucket_start"], row["bucket_end"]) == (start, end)


# --- A2: bucket_datetime_epoch doctest pairs (utils.py:196-203) ----------
@pytest.mark.parametrize(
    "interval,iso,start,end",
    [
        (10, "1970-01-01T00:00:00.000000Z", 0, 10),
        (10, "2015-08-19T18:40:02.177979Z", 1440009602 // 10 * 10, 1440009610),
    ],
)
def test_bucket_iso_doctest_pairs(spark, interval, iso, start, end):
    df = spark.createDataFrame([(iso,)], "ts string")
    row = with_bucket(df, "ts", interval, "iso").collect()[0]
    assert (row["bucket_start"], row["bucket_end"]) == (start, end)


# --- A3: projection direction (utils.py:46-51) ---------------------------
def test_projection_conversion_direction(spark):
    df = spark.createDataFrame([('{"offset": "1"}',)], "value string")
    out = decode_json_values(df, {"old_offset": "offset"}).collect()
    assert out[0].asDict() == {"old_offset": "1"}


# --- A1: the core e2e fixture (README:88-131) ----------------------------
def test_readme_end_to_end_row(spark, tmp_path):
    msg = '{"origin_server": "Iceman", "topic": "Dreams", "timestamp": 1440179087}'
    df = spark.createDataFrame([(msg,)], "value string")
    decoded = decode_json_values(
        df,
        {"server_name": "origin_server", "topic": "topic"},
        bucket_field_src="timestamp",
    )
    bucketed = with_bucket(decoded, "timestamp", 20, "epoch").drop("timestamp")
    counts = merged_count(bucketed, ["server_name", "topic", "bucket_start", "bucket_end"])
    store = ServingStore(spark, str(tmp_path / "s"))
    store.append(counts, 1)
    row = store.view().collect()[0].asDict()
    assert row == {
        "server_name": "Iceman",
        "topic": "Dreams",
        "bucket_start": 1440179080,
        "bucket_end": 1440179100,
        "count": 1,
        RST_COL: 1,
    }


# --- A5: comparator family argument order (models.py:847-909) ------------
@pytest.fixture(scope="module")
def dump_table(spark):
    return spark.createDataFrame(
        [("ex1", 1), ("ex2", 2), ("ex3", 3)], "name string, count long"
    )


def test_general_select_gt_param_vs_row(dump_table):
    out = P.select_gt(dump_table, {"count": 2}).collect()
    assert [r.asDict() for r in out] == [{"name": "ex1", "count": 1}]


def test_c_general_select_doctest(dump_table):
    out = P.c_general_select(dump_table, {"count": ("gt", 2)}).collect()
    assert [r.asDict() for r in out] == [{"name": "ex1", "count": 1}]


def test_c_general_select_empty_params_empty_result(dump_table):
    assert P.c_general_select(dump_table, {}).count() == 0


def test_range_unbounded_both_sides_matches_all(dump_table):
    # range((None, None)) -> True for every row (models.py:1072-1073)
    assert P.select_range(dump_table, {"count": (None, None)}).count() == 3


def test_erange_exclusive(dump_table):
    out = P.general_select(dump_table, {"count": (1, 3)}, "erange").collect()
    assert [r["count"] for r in out] == [2]


# --- A6: retention edge cases (models.py:679-727) ------------------------
def test_clean_interval_zero_keeps_only_latest(spark, tmp_path):
    store = ServingStore(spark, str(tmp_path / "s"), clean_freq=0)
    df = spark.createDataFrame([("x", 1)], "name string, count long")
    store.append(df, 0)
    store.append(df, 1)
    # clean(0): DELETE WHERE RST_ID < max - 0 -> only latest batch survives
    store.clean(clean_interval=0)
    assert store._batch_ids() == [1]


def test_rst_on_empty_store_is_sentinel(spark, tmp_path):
    # reference: SELECT MAX(RST_ID) on empty table -> None (models.py:679-693)
    store = ServingStore(spark, str(tmp_path / "s"))
    assert store.rst() == -1
