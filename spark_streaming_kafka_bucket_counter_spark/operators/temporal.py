"""Temporal dimension maintenance: SCD Type-2 versioning from a change
log, and time-series densification (gap filling) — the warehouse-side
operators that turn append-only logs into queryable dimensions and
dashboards without NULL holes.

Scale notes:

- ``scd2_from_changelog`` is ONE shuffle on the dimension key feeding a
  single window pass (lead); the classic MERGE-based SCD2 update is the
  incremental form of the same thing — run this operator over
  (current dimension UNION incoming changes) and the window rebuilds the
  validity chain, which on a cluster co-partitions by the key and never
  compares rows across keys.
- ``densify_buckets`` materializes exactly keys x buckets rows — that's
  the OUTPUT size, so the explode is intrinsic, not overhead. The bucket
  range comes from a 1-row broadcast (global min/max), the actual
  aggregates join back on (key, bucket) — one count shuffle + one
  left join of the dense spine against the (smaller) sparse counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2 from an append-only change log:
    one row per (key, change) with ``valid_from`` / ``valid_to`` (epoch
    seconds; NULL = open-ended) and ``is_current``.

    ``ts_col`` must be integer epoch seconds; ``tie_cols`` break
    same-timestamp ordering (required for cross-engine determinism when
    two changes collide on the timestamp)."""
    order = [F.col(ts_col), *[F.col(c) for c in (tie_cols or [])]]
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    return df.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).cast("long").alias("valid_from"),
        nxt.cast("long").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_sql(
    table: str,
    key_col: str,
    ts_expr: str,
    attr_cols: list[str],
    tie_cols: list[str] | None = None,
) -> str:
    """DuckDB oracle twin of :func:`scd2_from_changelog`."""
    order = ", ".join(["_ts", *(tie_cols or [])])
    attrs = ", ".join(attr_cols)
    ties = "".join(f", {c}" for c in (tie_cols or []) if c not in attr_cols)
    return f"""
    WITH _scd_log AS (SELECT {key_col}, {attrs}{ties}, {ts_expr} AS _ts FROM {table})
    SELECT {key_col}, {attrs},
           CAST(_ts AS BIGINT) AS valid_from,
           CAST(lead(_ts) OVER w AS BIGINT) AS valid_to,
           lead(_ts) OVER w IS NULL AS is_current
    FROM _scd_log WINDOW w AS (PARTITION BY {key_col} ORDER BY {order})
    """


def densify_buckets(
    df: DataFrame,
    key_col: str,
    epoch_col: str,
    interval: int,
    count_name: str = "count",
) -> DataFrame:
    """Gap-filled bucket counts: every (key, bucket) combination over
    the GLOBAL [min, max] bucket range gets a row, zero-filled where the
    key had no events — the dashboard/densify op (missing buckets render
    as 0, not as holes).

    Output: (key, bucket_start, count). ``epoch_col`` must be integer
    epoch seconds."""
    bucket = (F.floor(F.col(epoch_col) / interval) * interval).cast("long")
    counts = (
        df.select(F.col(key_col), bucket.alias("bucket_start"))
        .groupBy(key_col, "bucket_start")
        .agg(F.count(F.lit(1)).alias(count_name))
    )
    bounds = df.agg(
        F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi")
    )
    spine = (
        df.select(key_col)
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(interval))
            ).alias("bucket_start"),
        )
    )
    return (
        spine.join(counts, [key_col, "bucket_start"], "left")
        .select(
            key_col,
            F.col("bucket_start").cast("long"),
            F.coalesce(count_name, F.lit(0)).cast("long").alias(count_name),
        )
    )


def densify_buckets_sql(
    table: str,
    key_col: str,
    epoch_expr: str,
    interval: int,
    count_name: str = "count",
) -> str:
    """DuckDB oracle twin of :func:`densify_buckets`."""
    return f"""
    WITH _dz_ev AS (SELECT {key_col}, ({epoch_expr}) // {interval} * {interval} AS b
                    FROM {table}),
    _dz_counts AS (SELECT {key_col}, b, COUNT(*) AS c FROM _dz_ev GROUP BY 1, 2),
    _dz_bounds AS (SELECT MIN(b) AS lo, MAX(b) AS hi FROM _dz_ev),
    _dz_spine AS (
      SELECT k.{key_col}, gs.b
      FROM (SELECT DISTINCT {key_col} FROM _dz_ev) k,
           _dz_bounds,
           LATERAL (SELECT unnest(range(lo, hi + 1, {interval})) AS b) gs
    )
    SELECT s.{key_col},
           CAST(s.b AS BIGINT) AS bucket_start,
           CAST(COALESCE(c.c, 0) AS BIGINT) AS "{count_name}"
    FROM _dz_spine s
    LEFT JOIN _dz_counts c ON s.{key_col} = c.{key_col} AND s.b = c.b
    """
