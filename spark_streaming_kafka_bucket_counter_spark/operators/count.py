"""Bucketed group-count — THE core reference query (A1), plus the
cross-batch merged variant (A5).

Reference: ``lines.map(lambda l: (message_parse(l), 1)).reduceByKey(add)``
(``spark-streaming-kafka-bucket-counter.py:125-126``) — count per distinct
(projected-fields + time-bucket) key. The reference groups on a serialized
JSON *string* as the key; here Spark groups on real columns, which at scale
means: map-side partial aggregation (HashAggregate partial->final, the
``reduceByKey`` combiner analog), a single hash shuffle on the group keys,
and whole-stage codegen end to end — no Python, no string blobs.

``merged_count`` reproduces the MySQL-upsert path's semantics
(``INSERT ... ON DUPLICATE KEY UPDATE count = count + n``, main.py:453-455):
counts accumulated across all batches = a plain groupBy over the full
input. In streaming it is the stateful ``groupBy().count()`` in update
mode; on static data the two coincide.

Scale: the bucket column has bounded cardinality per time interval, so the
shuffle keys are (projected dims x buckets) — well distributed unless one
dimension value dominates; AQE skew-join/partition-coalescing handles that
without manual salting for counts (partial aggs collapse skew before the
exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.buckets import ts_epoch_seconds, with_bucket


def bucket_count(
    df: DataFrame,
    keys: list[str],
    bucket_field: str,
    interval: int,
    bucket_type: str = "epoch",
    count_name: str = "count",
) -> DataFrame:
    """Count per (keys..., bucket_start, bucket_end) — reference A1 + P3."""
    bucketed = with_bucket(df, bucket_field, interval, bucket_type)
    return bucketed.groupBy(*keys, "bucket_start", "bucket_end").agg(
        F.count(F.lit(1)).alias(count_name)
    )


def merged_count(df: DataFrame, keys: list[str], count_name: str = "count") -> DataFrame:
    """Cross-batch accumulated count per key (reference A5 upsert semantics)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_name))


def select_max(df: DataFrame, column: str, alias: str | None = None) -> DataFrame:
    """MAX aggregate (reference A4: ``select_max``, models.py:667-700)."""
    return df.agg(F.max(F.col(column)).alias(alias or f"max_{column}"))


def sliding_bucket_count(
    df: DataFrame,
    keys: list[str],
    bucket_field: str,
    window: int,
    slide: int,
    count_name: str = "count",
) -> DataFrame:
    """Count per (keys..., hopping window): the sliding-window extension
    of the reference's tumbling-only bucket surface (SURVEY §2.11 notes
    the reference has no sliding windows — Structured Streaming gets
    them for free from the SAME ``F.window`` construct, so this operator
    is streaming-ready as written).

    ``window`` must be a multiple of ``slide``; every event lands in
    exactly ``window // slide`` overlapping windows. Spark expands the
    row to its windows *before* the aggregation, so the shuffle carries
    (keys x window) partial counts — map-side combine absorbs the
    ``window/slide`` fan-out and the exchange stays one hash shuffle,
    identical in shape to the tumbling plan.

    The event time is floored to whole epoch seconds before windowing so
    engines that carry microsecond precision agree with the oracle's
    integer arithmetic exactly.
    """
    if window % slide != 0:
        raise ValueError("window must be a multiple of slide")
    # normalize to whole epoch seconds first: timestamp(-NTZ) columns go
    # through the timezone-free field extraction (Spark 4 rejects a
    # direct NTZ -> BIGINT cast), numeric epoch columns truncate
    dtype = dict(df.dtypes).get(bucket_field, "")
    src = F.col(bucket_field)
    epoch = ts_epoch_seconds(src) if dtype.startswith("timestamp") else src.cast("long")
    win = F.window(
        epoch.cast("timestamp"),
        f"{window} seconds",
        f"{slide} seconds",
    )
    return (
        df.withColumn("_w", win)
        .groupBy(*keys, F.col("_w.start").cast("long").alias("bucket_start"),
                 F.col("_w.end").cast("long").alias("bucket_end"))
        .agg(F.count(F.lit(1)).alias(count_name))
    )


def sliding_bucket_count_sql(
    table: str,
    keys: list[str],
    epoch_expr: str,
    window: int,
    slide: int,
    count_name: str = "count",
) -> str:
    """DuckDB oracle twin: explode each event to its ``window // slide``
    hop offsets (``range``), derive the aligned window start, count.
    An event at floored epoch e belongs to starts ``(e//slide - i)*slide``
    for ``i in [0, window/slide)`` — always within (e - start < window),
    matching Spark's window assignment exactly."""
    ks = ", ".join(keys)
    return f"""
    SELECT {ks},
           (({epoch_expr}) // {slide} - h.i) * {slide}            AS bucket_start,
           (({epoch_expr}) // {slide} - h.i) * {slide} + {window} AS bucket_end,
           COUNT(*) AS "{count_name}"
    FROM {table}
    CROSS JOIN (SELECT unnest(range({window // slide})) AS i) h
    GROUP BY {", ".join(str(i + 1) for i in range(len(keys) + 2))}
    """


def salted_count(
    df: DataFrame,
    keys: list[str],
    salt_buckets: int = 8,
    count_name: str = "count",
) -> DataFrame:
    """Skew-proof two-stage count: salt the key, partial-count per
    (key, salt), then merge the partials per key.

    For COUNT, Spark's map-side partial aggregation already collapses
    skew before the exchange, so plain ``groupBy`` is usually enough.
    The salted form matters when partials can't absorb the skew — very
    high cardinality per task, or aggregates carrying heavy state
    (collect_list, exact distinct). The first shuffle spreads one hot key
    over ``salt_buckets`` reducers; the second merges ``salt_buckets``
    rows per key — bounded, tiny. Semantics identical to ``merged_count``
    (same oracle SQL), salt never escapes the operator.
    """
    # partition-id salt: deterministic, keeps the map-side combine local,
    # and spreads any single hot key across salt_buckets reducers
    salt = F.spark_partition_id() % salt_buckets
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(count_name))
