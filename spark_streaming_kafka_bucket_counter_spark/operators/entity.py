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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    max_distance: int = 4,
) -> DataFrame:
    """Within-block candidate pairs whose names are within
    ``max_distance`` edits: (id_a, id_b, name_a, name_b, distance),
    id_a < id_b.

    ``block_expr`` is the blocking key (e.g. last token of the name, a
    phonetic code, a sorted-token prefix). At 100 TB the join shuffles
    on the block key only; skewed mega-blocks should be additionally
    salted or length-bucketed (pair with ``length(name) DIV k`` as a
    composite key) — the verify cost inside a block is |block|^2, which
    the blocking key must keep bounded.
    """
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
    return (
        a.join(b, "_blk")
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
