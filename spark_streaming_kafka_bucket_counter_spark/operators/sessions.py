"""Sessionization: gap-based event sessions per user — the standard
event-pipeline operator (and a training-data op: conversation/episode
segmentation over interaction logs).

Semantics (classic islands construction, identical in any SQL engine):
order each user's events by (ts, event_id); an event starts a NEW
session when it is the user's first event or the gap since the previous
event exceeds ``gap_seconds``; the session index is the running sum of
new-session flags. Everything is integer arithmetic over epoch seconds —
deterministic across engines, no floats anywhere.

Scale design: ONE shuffle (hash partition by user) feeding both window
functions; Catalyst evaluates lag + running sum in a single Window
operator pass per partition. Sessions never span partitions because the
partition key IS the user. For unbounded streams the same semantics are
available natively as ``F.session_window(ts, gap)`` in Structured
Streaming (state-backed, watermark-evicted) — this module is the batch/
backfill form whose output an oracle can replay exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_sessions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Append ``session_idx`` (0-based per user) to each event row.

    ``ts_col`` must be integer epoch seconds. ``order_cols`` breaks ties
    within equal timestamps (required for cross-engine determinism when
    timestamps collide).
    """
    order = [F.col(ts_col), *[F.col(c) for c in (order_cols or [])]]
    w_lag = Window.partitionBy(user_col).orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_session = F.when(
        F.col(ts_col) - F.lag(ts_col).over(w_lag) > gap_seconds, 1
    ).otherwise(0)  # lag NULL (first event) -> comparison NULL -> otherwise 0
    return df.withColumn("_new", new_session).withColumn(
        "session_idx", F.sum("_new").over(w_run).cast("long")
    ).drop("_new")


def session_summary(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """One row per (user, session): event count, start/end epoch,
    duration seconds — the serving-side shape of sessionization."""
    s = with_sessions(df, user_col, ts_col, gap_seconds, order_cols)
    return s.groupBy(F.col(user_col), F.col("session_idx")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).cast("long").alias("duration_s"),
    )


def streaming_session_counts(
    stream: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    watermark: str = "1 second",
) -> DataFrame:
    """Streaming-native sessionization: Spark's ``session_window`` merges
    events within ``gap_seconds`` into state-backed sessions, watermark
    evicts closed state — the unbounded-stream form of
    :func:`session_summary` (same grouping whenever no inter-event gap
    equals the threshold exactly; the batch op keeps equal-gap events
    together, ``session_window`` splits them)."""
    from ..functions.buckets import require_utc_session

    # session boundaries round-trip through TIMESTAMP_LTZ; only correct
    # under a UTC session zone (fail loudly, don't shift silently)
    require_utc_session(stream.sparkSession)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("session"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def session_summary_sql(
    table: str, user_col: str, ts_expr: str, gap_seconds: int, order_cols: list[str]
) -> str:
    """DuckDB oracle twin of :func:`session_summary` (same islands
    construction, same tie-break order)."""
    # the running sum MUST use the same total order as the lag window —
    # with timestamp ties, ordering by ts alone would make session_idx
    # assignment order-dependent within the tied group
    order = ", ".join(["ts_e"] + order_cols)
    return f"""
    WITH e AS (SELECT {user_col}, {ts_expr} AS ts_e, {', '.join(order_cols)} FROM {table}),
    flagged AS (
      SELECT {user_col}, ts_e, {', '.join(order_cols)},
             CASE WHEN ts_e - lag(ts_e) OVER w > {gap_seconds} THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY {user_col} ORDER BY {order})
    ),
    sessioned AS (
      SELECT {user_col}, ts_e,
             CAST(SUM(new_s) OVER (PARTITION BY {user_col} ORDER BY {order}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      FROM flagged
    )
    SELECT {user_col}, session_idx,
           COUNT(*) AS n_events,
           MIN(ts_e) AS session_start,
           MAX(ts_e) AS session_end,
           CAST(MAX(ts_e) - MIN(ts_e) AS BIGINT) AS duration_s
    FROM sessioned GROUP BY 1, 2
    """
