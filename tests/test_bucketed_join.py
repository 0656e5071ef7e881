"""Bucketed co-located joins: two tables bucketed on the join key must
join with NO shuffle exchange — the layout-level scale lever for
repeated fact-fact joins (pay one shuffle at write time, skip both
sides' exchanges on every downstream join)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.sources.files import (
    load_table,
    write_bucketed,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_fact_join_has_no_exchange(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        buckets=8,
    )
    try:
        # disable broadcast so the join would otherwise need a shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = _plan(joined)
        assert re.search(r"SortMergeJoin|ShuffledHashJoin", plan)
        assert not re.findall(r"\(\d+\) Exchange", plan), plan
        # and the result is still correct
        expected = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
