"""Skew-mitigation join: the salted shuffle equi-join.

The third leg of the skew toolkit alongside `salted_count` (skewed
aggregation) and AQE's runtime skew-join splitting (`session.py` enables
`spark.sql.adaptive.skewJoin`). Explicit salting is the plan-level cure
when AQE can't help: a hot key whose rows exceed one executor's memory
in a shuffle join, with a right side too large to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the FACT side's key distribution is skewed: the
    fact rows take a partition-local salt in [0, salt_buckets), the dim
    side is replicated once per salt value, and the join key becomes
    (key..., salt) — one hot key's rows now land on ``salt_buckets``
    reducers instead of one.

    Result-identical to ``fact.join(dim, on, how)`` for inner/left joins
    with ANY key multiplicity: each dim row exists exactly once per
    salt, so every matching (fact row, dim row) pair meets exactly once
    — the property the oracle pins. Cost: the dim shuffle grows by
    ``salt_buckets``x (choose it ~ hot-key-rows / rows-per-reducer;
    8-16 covers real skew), the fact shuffle is unchanged. The salt is
    `spark_partition_id() % salt_buckets` — deterministic within a run,
    never content-derived (a content hash would re-concentrate the very
    key it is trying to spread), and dropped before returning.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got: {how}")
    if salt_buckets < 2:
        raise ValueError(f"salt_buckets must be >= 2: {salt_buckets}")
    # the synthetic column would silently overwrite (then drop) a user
    # column of the same name — refuse instead of corrupting
    for side, df_ in (("fact", fact), ("dim", dim)):
        if "_salt" in df_.columns:
            raise ValueError(
                f"salted_join: {side} side already has a '_salt' column — "
                "rename it before salting"
            )
    f = fact.withColumn("_salt", F.spark_partition_id() % salt_buckets)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return f.join(d, [*on, "_salt"], how).drop("_salt")
