"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the named-query catalog in
``spark_streaming_kafka_bucket_counter_spark.plans.queries``; each entry pairs a
(spark, sf_dir) -> DataFrame callable with an equivalent DuckDB oracle SQL
string over the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_streaming_kafka_bucket_counter_spark.plans import queries as _catalog

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: tumbling 20s bucket-count of events by event_type —
    the reference's core streaming aggregation (SURVEY §2.3 A1) on sf0.001.
    """
    return _catalog.QUERIES["bucket_count_epoch"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
