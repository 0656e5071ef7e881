"""Interval-point range join: count (or collect) point events falling
inside per-row time intervals — the "activity in a window around X"
query (shipments within N hours of an order, log lines near a deploy,
events inside an experiment exposure).

Spark has no range-join optimizer rule: a naive
``ON p.ts >= i.start AND p.ts < i.end`` join plans as
BroadcastNestedLoopJoin (quadratic work, single-task collapse when
neither side broadcasts). Two scale-safe constructions here:

- :func:`interval_count_join` — the standard **bucketed range join**:
  quantize time into coarse buckets, explode each interval to the
  buckets it covers, one hash equi-join on the bucket id + exact range
  filter. Work is O(candidate pairs) — intrinsic when the aggregate
  needs to SEE each match (collecting ids, non-decomposable measures).
- :func:`interval_count_prefix` — the COUNT-specialized **prefix-sum**
  path: ``count([s,e)) = C(e) - C(s)`` via one bucket-partitioned
  window pass, materializing NO candidate pairs. Measured 10x+ faster
  when windows are dense (sf0.1: 21.6 s pair-join -> ~2 s), and the
  asymptotic gap grows with density; this is the default the catalog
  query uses.

Both shuffle only on near-uniform integer time-bucket keys; AQE
skew-split covers hot ranges. The DuckDB oracle twin uses the naive
range join (DuckDB plans it as IEJoin) — different physical strategy,
identical semantics, which is exactly what an oracle should be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_count_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    id_cols: list[str],
    bucket_width: int,
    count_alias: str = "n_points",
) -> DataFrame:
    """Per interval row: ``id_cols + start + end + count of points with
    start <= ts < end`` (0 when none — intervals are never dropped).

    ``start_col``/``end_col``/``ts_col`` are epoch-seconds BIGINT
    columns. ``bucket_width`` (seconds) trades interval fan-out
    (``~span/width`` copies per interval) against per-bucket candidate
    volume; pick it at or above the typical interval span so fan-out
    stays <= 2.
    """
    iv = intervals.select(*id_cols, start_col, end_col)
    # half-open [start, end): the last covered bucket is the one holding
    # end-1, so empty/inverted intervals explode to no buckets at all
    fan = iv.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor((F.col(end_col) - 1) / bucket_width),
            )
        ),
    )
    pts = points.select(
        F.col(ts_col).alias("_pts"),
        F.floor(F.col(ts_col) / bucket_width).alias("_bkt"),
    )
    counts = (
        fan.join(pts, "_bkt")
        .filter((F.col("_pts") >= F.col(start_col)) & (F.col("_pts") < F.col(end_col)))
        .groupBy(*id_cols, start_col, end_col)
        .agg(F.count(F.lit(1)).alias(count_alias))
    )
    return (
        iv.join(counts, [*id_cols, start_col, end_col], "left")
        .select(
            *id_cols,
            start_col,
            end_col,
            F.coalesce(F.col(count_alias), F.lit(0)).cast("long").alias(count_alias),
        )
    )


def interval_count_join_sql(
    intervals_cte: str,
    points_cte: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    id_cols: list[str],
    count_alias: str = "n_points",
) -> str:
    """DuckDB oracle twin: the naive range LEFT JOIN + count (IEJoin on
    the oracle side — same semantics, independent physical strategy).
    ``intervals_cte`` must expose ``id_cols, start_col, end_col``;
    ``points_cte`` must expose ``ts_col``."""
    ids = ", ".join(f"i.{c}" for c in id_cols)
    return f"""
    SELECT {ids}, i.{start_col}, i.{end_col},
           CAST(COALESCE(COUNT(p.{ts_col}), 0) AS BIGINT) AS {count_alias}
    FROM {intervals_cte} i
    LEFT JOIN {points_cte} p
      ON p.{ts_col} >= i.{start_col} AND p.{ts_col} < i.{end_col}
    GROUP BY {ids}, i.{start_col}, i.{end_col}
    """


def interval_count_prefix(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    id_cols: list[str],
    bucket_width: int,
    count_alias: str = "n_points",
) -> DataFrame:
    """Same contract as :func:`interval_count_join`, via prefix sums —
    the COUNT-specialized scale path that materializes NO candidate
    pairs at all.

    ``count([s, e)) = C(e) - C(s)`` where ``C(t)`` = points strictly
    before ``t``. ``C`` decomposes as (points in earlier buckets) +
    (points earlier within t's bucket):

    - per-bucket totals -> densified exclusive cumsum: a table of
      ``(max_bkt - min_bkt + 1)`` rows (time-range/width — thousands at
      year scale), broadcast;
    - within-bucket prefix: union endpoints + points, ONE window
      partitioned by bucket ordered by (ts, endpoint-first) carrying a
      running point count — endpoints at ts == point sort first, so the
      prefix is strictly-before, matching the half-open semantics on
      both ends.

    Cost at 100 TB: one shuffle of points + 2x intervals on the bucket
    id, a linear per-partition window pass, one groupBy on the interval
    id. The pair-join variant's candidate volume (sum over buckets of
    |intervals| x |points|) never exists. Use the join variant only when
    the aggregate doesn't decompose (e.g. collecting matched ids).
    """
    pts = points.select(
        F.col(ts_col).alias("_t"),
        F.floor(F.col(ts_col) / bucket_width).alias("_bkt"),
    )
    per_bucket = pts.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_n"))
    rng = per_bucket.agg(
        F.min("_bkt").alias("_lo"), F.max("_bkt").alias("_hi"),
        F.sum("_n").alias("_total"),
    )
    # densified exclusive cumsum over the covered bucket range: size is
    # range/width, independent of row count — window over this tiny
    # aggregate is a deliberate single-task step on metadata, not data
    dense = (
        rng.select(F.explode(F.sequence("_lo", "_hi")).alias("_bkt"))
        .join(per_bucket, "_bkt", "left")
        .select("_bkt", F.coalesce("_n", F.lit(0)).alias("_n"))
    )
    cum = dense.select(
        "_bkt",
        (F.sum("_n").over(Window.orderBy("_bkt")) - F.col("_n")).alias("_cum"),
    )

    ends = intervals.select(*id_cols, start_col, end_col)
    endpoints = ends.select(
        *id_cols, F.col(start_col).alias("_t"), F.lit(-1).alias("_sign")
    ).unionByName(
        ends.select(*id_cols, F.col(end_col).alias("_t"), F.lit(1).alias("_sign"))
    ).withColumn("_bkt", F.floor(F.col("_t") / bucket_width))

    w = (
        Window.partitionBy("_bkt")
        .orderBy("_t", "_is_pt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nulls = [F.lit(None).cast(endpoints.schema[c].dataType).alias(c) for c in id_cols]
    tagged = endpoints.withColumn("_is_pt", F.lit(0)).unionByName(
        pts.select(
            *nulls, "_t", F.lit(0).alias("_sign"), "_bkt", F.lit(1).alias("_is_pt")
        )
    )
    prefixed = tagged.withColumn("_prefix", F.sum("_is_pt").over(w)).filter(
        F.col("_is_pt") == 0
    )
    # C(t): clamp endpoint buckets outside the observed range (below -> 0
    # points before; above -> all points before)
    resolved = (
        prefixed.crossJoin(F.broadcast(rng))
        .join(F.broadcast(cum), "_bkt", "left")
        .select(
            *id_cols,
            "_sign",
            F.when(F.col("_bkt") < F.col("_lo"), F.lit(0))
            .when(F.col("_bkt") > F.col("_hi"), F.col("_total"))
            .otherwise(F.coalesce("_cum", F.lit(0)) + F.col("_prefix"))
            .alias("_C"),
        )
    )
    counts = resolved.groupBy(*id_cols).agg(
        F.sum(F.col("_sign") * F.col("_C")).alias("_raw")
    )
    return (
        ends.join(counts, id_cols, "left")
        .select(
            *id_cols,
            start_col,
            end_col,
            F.greatest(F.coalesce("_raw", F.lit(0)), F.lit(0))
            .cast("long")
            .alias(count_alias),
        )
    )
