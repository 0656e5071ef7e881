"""Z-order clustering writer: the multi-dimension data-skipping layout.
Verified against parquet footer statistics — per-file min/max envelopes
on BOTH clustered columns must shrink vs the unsorted layout, which is
exactly the property file/row-group pruning exploits."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.functions.buckets import (
    ts_epoch_seconds,
)
from spark_streaming_kafka_bucket_counter_spark.sources.files import (
    load_table,
    write_zordered,
    zorder_key,
)
from tests.conftest import SF_DIR


def _envelope_sum(path_glob: str, col: str) -> int:
    """Sum over files of (max - min) of ``col`` — the total stat-range
    'surface' a range predicate has to intersect. Smaller = better
    pruning."""
    total = 0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            total += max(maxs) - min(mins)
    return total


def test_zorder_shrinks_stat_envelopes(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").select(
        "event_id",
        "user_id",
        ts_epoch_seconds(F.col("ts")).alias("ts_e"),
    )
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    # unsorted baseline at the same file count
    events.repartition(8).write.mode("overwrite").parquet(plain)
    write_zordered(events, zord, ["user_id", "ts_e"], bits=12, partitions=8)

    # same data round-trips
    assert spark.read.parquet(zord).count() == events.count()
    assert spark.read.parquet(zord).columns == ["event_id", "user_id", "ts_e"]

    for col in ("user_id", "ts_e"):
        base = _envelope_sum(f"{plain}/*.parquet", col)
        z = _envelope_sum(f"{zord}/*.parquet", col)
        # random layout: every file spans ~the full range (envelope ~
        # n_files * range). Z-order must cut the total envelope on BOTH
        # dimensions at once — a single-column sort can only do one.
        assert z < base * 0.7, (col, z, base)


def test_zorder_key_bounds_guard(spark):
    try:
        zorder_key(["a", "b", "c", "d"], bits=16)
    except ValueError as e:
        assert "64-bit" in str(e)
    else:
        raise AssertionError("expected ValueError")
