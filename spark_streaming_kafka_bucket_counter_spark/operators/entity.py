"""Entity resolution: blocked fuzzy matching.

The classic ER shape — cheap BLOCKING key to bound the candidate space,
exact edit-distance VERIFY inside each block — expressed as one hash
equi-join plus a codegen'd ``levenshtein`` filter. Never all-pairs: the
candidate volume is sum over blocks of |block|^2, controlled by the
blocking key's selectivity, and the verify predicate runs during the
join (no materialized candidate set).

Both engines implement identical Levenshtein semantics (unit-cost
insert/delete/substitute), so the oracle replays exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    max_distance: int = 4,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Within-block candidate pairs whose names are within
    ``max_distance`` edits: (id_a, id_b, name_a, name_b, distance),
    id_a < id_b.

    ``block_expr`` is the blocking key (e.g. last token of the name, a
    phonetic code, a sorted-token prefix). At 100 TB the join shuffles
    on the block key only; the verify cost inside a block is |block|^2,
    which the blocking key must keep bounded.

    ``salt_buckets`` additionally SALTS the block-key self-join
    (guide §2.5 hot keys, via the repo's ``salted_join`` — result
    identity pinned in test_joins): a natural-language blocking key is
    inherently hot (one common surname / head noun concentrates the
    quadratic levenshtein work on one reducer), so the a-side rows take
    a partition-local salt and the b-side replicates ``salt_buckets``x,
    spreading each block across that many tasks. Cost: b-side shuffle
    volume grows ``salt_buckets``x — names are short strings, while the
    avoided straggler is quadratic in the hot block, so 8 is a cheap
    default for skewed corpora; leave None when blocks are known
    uniform."""
    kb = df.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
        block_expr.alias("_blk"),
    )
    a = kb.select(
        F.col("_id").alias("id_a"), F.col("_name").alias("name_a"), "_blk"
    )
    b = kb.select(
        F.col("_id").alias("id_b"), F.col("_name").alias("name_b"), "_blk"
    )
    if salt_buckets is not None:
        from .joins import salted_join

        joined = salted_join(a, b, ["_blk"], salt_buckets=salt_buckets)
    else:
        joined = a.join(b, "_blk")
    return (
        joined
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "distance", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long")
        )
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )


def blocked_fuzzy_pairs_sql(
    table: str,
    id_col: str,
    name_col: str,
    block_sql: str,
    max_distance: int = 4,
) -> str:
    """CTE chain ending in `fuzzy_pairs` mirroring
    :func:`blocked_fuzzy_pairs`."""
    return f"""blocked AS (
      SELECT {id_col} AS _id, {name_col} AS _name, {block_sql} AS _blk FROM {table}
    ),
    fuzzy_pairs AS (
      SELECT a._id AS id_a, b._id AS id_b,
             a._name AS name_a, b._name AS name_b,
             CAST(levenshtein(a._name, b._name) AS BIGINT) AS distance
      FROM blocked a JOIN blocked b ON a._blk = b._blk AND a._id < b._id
      WHERE levenshtein(a._name, b._name) <= {max_distance}
    )"""


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    window: int = 3,
    max_distance: int = 4,
) -> DataFrame:
    """Sorted-neighborhood ER: order entities by name, compare each to
    its next ``window`` neighbors only — the complementary blocking
    strategy (catches near-misses that straddle block-key boundaries,
    e.g. typos in the blocking token itself).

    Scale shape — the global sort rank is computed DISTRIBUTED, never
    through a single-partition window: rows get a bucket key (the
    name's first character — any order-preserving prefix works), the
    rank WITHIN each bucket comes from a bucket-partitioned window, and
    the global rank adds the bucket's cumulative offset from a
    #buckets-sized side table (broadcast; its cum-sum window runs on
    that bounded-tiny frame only). Neighbor candidates are then an
    integer equi-join ``rn_b = rn_a + i`` for i in 1..window —
    exactly N * window candidates (linear, vs block-size-squared for
    key blocking), hash-shuffled on the rank key.

    Output: (id_a, id_b, name_a, name_b, distance) where a precedes b
    in (name, id) order.
    """
    bkt = F.substring(F.col(name_col), 1, 1)
    wb = Window.partitionBy("_bkt").orderBy("_name", "_id")
    base = df.select(
        F.col(id_col).alias("_id"), F.col(name_col).alias("_name"), bkt.alias("_bkt")
    ).withColumn("_rn_in", F.row_number().over(wb))
    sizes = base.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_n"))
    # cum-sum over the bucket table: single partition, but only
    # #distinct-prefix rows ever flow through it (bounded-tiny)
    wcum = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_bkt", F.coalesce(F.sum("_n").over(wcum), F.lit(0)).alias("_off")
    )
    ranked = base.join(F.broadcast(offsets), "_bkt").select(
        "_id", "_name", (F.col("_off") + F.col("_rn_in")).cast("long").alias("_rn")
    )
    probes = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("_name").alias("name_a"),
        F.explode(F.array(*[F.lit(i) for i in range(1, window + 1)])).alias("_i"),
        F.col("_rn"),
    ).withColumn("_rn_b", F.col("_rn") + F.col("_i"))
    nbrs = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_name").alias("name_b"),
        F.col("_rn").alias("_rn_b"),
    )
    return (
        probes.join(nbrs, "_rn_b")
        .withColumn(
            "distance", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long")
        )
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )


def sorted_neighborhood_pairs_sql(
    table: str,
    id_col: str,
    name_col: str,
    window: int = 3,
    max_distance: int = 4,
) -> str:
    """CTE chain ending in `sn_pairs` mirroring
    :func:`sorted_neighborhood_pairs`."""
    lead_rows = " UNION ALL ".join(
        f"""SELECT id_a, name_a,
               lead(id_a, {i}) OVER (ORDER BY name_a, id_a) AS id_b,
               lead(name_a, {i}) OVER (ORDER BY name_a, id_a) AS name_b
        FROM sn_base"""
        for i in range(1, window + 1)
    )
    return f"""sn_base AS (
      SELECT {id_col} AS id_a, {name_col} AS name_a FROM {table}
    ),
    sn_cand AS ({lead_rows}),
    sn_pairs AS (
      SELECT id_a, id_b, name_a, name_b,
             CAST(levenshtein(name_a, name_b) AS BIGINT) AS distance
      FROM sn_cand
      WHERE id_b IS NOT NULL
        AND levenshtein(name_a, name_b) <= {max_distance}
    )"""
