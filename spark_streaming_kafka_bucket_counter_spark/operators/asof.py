"""As-of join: for each left row, the most recent right row with
``right.ts <= left.ts`` within the same key — the canonical time-series
operator (feature lookup at event time, price-at-trade, last-state-at-
observation) that Spark has no built-in for.

Spark-first construction (NO range-explosion join, no per-row probe):
union both sides tagged, hash-partition by key, ONE window pass ordered
by (ts, side, tie) carrying the latest right-side attributes forward
with ``last(..., ignorenulls=True)``. Right rows sort BEFORE left rows
at equal timestamps, so a right row at exactly ``left.ts`` matches
(inclusive as-of). Cost at 100 TB: one shuffle of left+right on the key
and a linear per-partition scan — the same price as the sessionization
window, versus the quadratic blow-up of the naive ``ts_r <= ts_l`` range
join that Catalyst would otherwise plan as BroadcastNestedLoop.

Determinism: among right rows tied on ts, the max tie-column wins
(ordered last -> carried last). The DuckDB oracle replays the identical
union-window construction, so both engines agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """Left rows + ``asof_<col>`` columns from the latest right row with
    ``right.ts <= left.ts`` per key (NULLs when no right row precedes).

    ``tie_col`` must exist on both sides (used only for a total order;
    right-side ties on ts resolve to the max ``tie_col``).
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(tie_col).alias("_tie"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols if c not in (key_col, ts_col)],
    )
    tagged_l = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.col(tie_col).alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in (key_col, ts_col)],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        key_col,
        ts_col,
        "_side",
        *[F.col(f"_l_{c}") for c in lcols if c not in (key_col, ts_col)],
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        key_col,
        ts_col,
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in (key_col, ts_col)],
        *[f"asof_{c}" for c in right_cols],
    )


def asof_join_sql(
    left_cte: str,
    right_cte: str,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: list[str],
    tie_col: str,
) -> str:
    """DuckDB oracle twin: the same union + carry-forward window.

    ``left_cte``/``right_cte`` name in-scope CTEs; left must expose
    ``key_col, ts_col, tie_col, *left_cols`` and right
    ``key_col, ts_col, tie_col, *right_cols``.
    """
    r_null_l = ", ".join(f"NULL AS l_{c}" for c in left_cols)
    l_null_r = ", ".join(f"NULL AS r_{c}" for c in right_cols)
    l_sel = ", ".join(f"{c} AS l_{c}" for c in left_cols)
    r_sel = ", ".join(f"{c} AS r_{c}" for c in right_cols)
    carry = ", ".join(
        f"last_value(r_{c} IGNORE NULLS) OVER w AS asof_{c}" for c in right_cols
    )
    out_l = ", ".join(f"l_{c} AS {c}" for c in left_cols)
    out_r = ", ".join(f"asof_{c}" for c in right_cols)
    return f"""
    u AS (
      SELECT {key_col}, {ts_col}, 0 AS side, {tie_col} AS tie, {r_sel}, {r_null_l}
      FROM {right_cte}
      UNION ALL
      SELECT {key_col}, {ts_col}, 1 AS side, {tie_col} AS tie, {l_null_r}, {l_sel}
      FROM {left_cte}
    ),
    carried AS (
      SELECT {key_col}, {ts_col}, side, {', '.join(f'l_{c}' for c in left_cols)}, {carry}
      FROM u
      WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, side, tie
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT {key_col}, {ts_col}, {out_l}, {out_r}
    FROM carried WHERE side = 1
    """
