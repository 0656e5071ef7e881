"""Event-journey analytics: funnel conversion and cohort retention —
the two canonical event-log rollups an analytics engine serves next to
sessionization (reference's event pipeline, SURVEY §2.3, generalized).

Both operators follow one scale discipline: every join and aggregation
is keyed on the user column, so a cluster executes the whole chain on a
single hash partitioning of users (AQE/exchange-reuse collapses the
repeated shuffles; on a real cluster the user key is also the natural
bucketing key for the event log). No windows over the full log, no
cross joins, integer-only epoch math.

Funnel semantics (strict-order funnel): step 1 time is the user's
earliest step-1 event; step i time is the earliest step-i event
STRICTLY AFTER the user's step-(i-1) time. A user "reaches" step i when
that time exists. This is the textbook definition (strict ordering, no
lookback window) — a ``within_seconds`` horizon bounds each transition
when given.

Cohort semantics: a user's cohort is the period (``period_seconds``
tumbling bucket) of their first event; retention at offset k counts
distinct cohort users active in cohort_period + k periods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Funnel
# ---------------------------------------------------------------------------


def funnel_times(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user earliest strict-order completion time of every funnel
    step: one row per user who completed step 1, with ``t_1 .. t_k``
    (epoch seconds, NULL from the first uncompleted step on).

    ``ts_col`` must be integer epoch seconds. Each transition is one
    user-keyed aggregation + one user-keyed left join — same shuffle key
    throughout, so a cluster runs the chain on one partitioning.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    u, t = F.col(user_col), F.col(ts_col)
    base = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i in range(2, len(steps) + 1):
        prev = f"t_{i - 1}"
        step_events = events.filter(F.col(type_col) == steps[i - 1]).select(
            u.alias(user_col), t.alias("_ts")
        )
        cond = F.col("_ts") > F.col(prev)
        if within_seconds is not None:
            cond = cond & (F.col("_ts") <= F.col(prev) + within_seconds)
        reached = (
            step_events.join(base.select(user_col, prev), user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"t_{i}"))
        )
        base = base.join(reached, user_col, "left")
    return base


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Funnel rollup: one row per step with the number of users who
    reached it (strict order). Columns: step_idx, step, n_users."""
    times = funnel_times(events, user_col, ts_col, type_col, steps, within_seconds)
    counts = times.agg(
        *[F.count(f"t_{i}").alias(f"n_{i}") for i in range(1, len(steps) + 1)]
    )
    stack = ", ".join(
        f"{i}L, '{s}', n_{i}" for i, s in enumerate(steps, start=1)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack}) AS (step_idx, step, n_users)"
    )


def funnel_sql(
    table: str,
    user_col: str,
    ts_expr: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> str:
    """DuckDB oracle twin of :func:`funnel_counts` (same strict-order
    semantics, same step-indexed output)."""
    ctes = [
        f"""s1 AS (SELECT {user_col} AS u, MIN({ts_expr}) AS t_1
               FROM {table} WHERE {type_col} = '{steps[0]}' GROUP BY 1)"""
    ]
    for i in range(2, len(steps) + 1):
        horizon = (
            f" AND {ts_expr} <= p.t_{i - 1} + {within_seconds}"
            if within_seconds is not None
            else ""
        )
        ctes.append(
            f"""s{i} AS (SELECT e.{user_col} AS u, MIN({ts_expr}) AS t_{i}
                 FROM {table} e JOIN s{i - 1} p ON e.{user_col} = p.u
                 WHERE e.{type_col} = '{steps[i - 1]}'
                   AND {ts_expr} > p.t_{i - 1}{horizon}
                 GROUP BY 1)"""
        )
    joins = " ".join(
        f"LEFT JOIN s{i} ON s1.u = s{i}.u" for i in range(2, len(steps) + 1)
    )
    counts = ", ".join(
        f"COUNT(t_{i}) AS n_{i}" for i in range(1, len(steps) + 1)
    )
    rows = " UNION ALL ".join(
        f"SELECT {i} AS step_idx, '{s}' AS step, n_{i} AS n_users FROM c"
        for i, s in enumerate(steps, start=1)
    )
    return f"""
    WITH {', '.join(ctes)},
    c AS (SELECT {counts} FROM s1 {joins})
    {rows}
    """


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_seconds: int,
) -> DataFrame:
    """Distinct active users per (cohort period, period offset).

    Columns: cohort_start (epoch of the cohort's tumbling period),
    period_offset (0 = the cohort period itself), n_users. ``ts_col``
    must be integer epoch seconds. Two user-keyed shuffles (first-event
    agg + join back) then one (cohort, offset) count-distinct."""
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("_first_ts"))
    cohort = F.floor(F.col("_first_ts") / period_seconds).cast("long")
    offset = (
        F.floor(F.col(ts_col) / period_seconds).cast("long") - F.col("_cohort")
    )
    return (
        events.select(user_col, ts_col)
        .join(first.select(user_col, "_first_ts"), user_col)
        .withColumn("_cohort", cohort)
        .withColumn("_offset", offset)
        .groupBy(
            (F.col("_cohort") * period_seconds).cast("long").alias("cohort_start"),
            F.col("_offset").alias("period_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def cohort_retention_sql(
    table: str, user_col: str, ts_expr: str, period_seconds: int
) -> str:
    """DuckDB oracle twin of :func:`cohort_retention`."""
    p = period_seconds
    return f"""
    WITH first_seen AS (
      SELECT {user_col} AS u, MIN({ts_expr}) // {p} AS cohort
      FROM {table} GROUP BY 1
    ),
    joined AS (
      SELECT e.{user_col} AS u, f.cohort,
             ({ts_expr}) // {p} - f.cohort AS period_offset
      FROM {table} e JOIN first_seen f ON e.{user_col} = f.u
    )
    SELECT CAST(cohort * {p} AS BIGINT) AS cohort_start,
           CAST(period_offset AS BIGINT) AS period_offset,
           COUNT(DISTINCT u) AS n_users
    FROM joined GROUP BY 1, 2
    """
