"""Session hygiene: catalog queries must not leave session state behind.

The two Structured-Streaming catalog queries pin
``spark.sql.legacy.parquet.nanosAsLong`` while their drain executes and
used to leave it set (plus a /tmp checkpoint dir per call) — surprising
for any embedder calling a "query". Pinned here: conf restored, no
checkpoint-dir leak.
"""

from __future__ import annotations

import glob

from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog
from spark_streaming_kafka_bucket_counter_spark.session import restored_conf

SF_SMALL = "/root/testdata/sf0.001"

_NANOS = "spark.sql.legacy.parquet.nanosAsLong"


def _conf_or_none(spark, key):
    try:
        return spark.conf.get(key)
    except Exception:
        return None


def test_restored_conf_sets_back_and_unsets(spark):
    before = _conf_or_none(spark, _NANOS)
    with restored_conf(spark, _NANOS):
        spark.conf.set(_NANOS, "true")
        assert spark.conf.get(_NANOS) == "true"
    assert _conf_or_none(spark, _NANOS) == before


def test_stateful_query_leaves_no_conf_or_checkpoint(spark):
    spark.conf.unset(_NANOS)
    before = _conf_or_none(spark, _NANOS)  # default value (or None)
    assert before != "true"
    dirs_before = set(glob.glob("/tmp/ssbc_ckpt_*"))
    df = catalog.QUERIES["stateful_running_count"](spark, SF_SMALL)
    assert df.count() > 0
    assert _conf_or_none(spark, _NANOS) == before
    assert set(glob.glob("/tmp/ssbc_ckpt_*")) == dirs_before
