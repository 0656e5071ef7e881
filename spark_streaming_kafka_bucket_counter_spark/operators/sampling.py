"""Deterministic sampling / split assignment for training-data pipelines.

Beyond-reference scope (BASELINE.json north star). ``df.sample`` is
seed-AND-partitioning dependent — re-running after a repartition yields a
different sample, which is unacceptable for train/eval splits over 100 TB
(splits must be reproducible, auditable, and stable when the table is
rewritten). The standard fix is content-hash bucketing: bucket =
hash(salt || id) mod B, sample = buckets below the rate. Properties:

- deterministic: same id + salt -> same bucket, on any engine (md5-based,
  so the DuckDB oracles reproduce it exactly)
- partition-independent: pure per-row projection, no shuffle, trivially
  parallel at any scale; the filter pushes down past column pruning
- composable: different salts give independent samples; the same salt
  gives consistent membership across tables keyed by the same id
  (e.g. join-safe document/embedding splits)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_hash32, token_hash32_sql


def hash_bucket(col: Column, buckets: int = 100, salt: str = "split") -> Column:
    """Stable bucket in [0, buckets) from the md5 of ``salt || ':' || id``."""
    return token_hash32(F.concat(F.lit(f"{salt}:"), col.cast("string"))) % buckets


def hash_bucket_sql(col: str, buckets: int = 100, salt: str = "split") -> str:
    inner = f"'{salt}:' || CAST({col} AS VARCHAR)"
    return f"({token_hash32_sql(inner)} % {buckets})"


def with_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 90,
    buckets: int = 100,
    salt: str = "split",
) -> DataFrame:
    """Append ``bucket`` and a train/eval ``split`` label."""
    b = hash_bucket(F.col(id_col), buckets, salt)
    return df.withColumn("bucket", b).withColumn(
        "split", F.when(F.col("bucket") < train_pct, F.lit("train")).otherwise(F.lit("eval"))
    )


def sample_fraction(
    df: DataFrame, id_col: str, pct: int, buckets: int = 100, salt: str = "sample"
) -> DataFrame:
    """Deterministic ~pct% sample: rows whose bucket falls below ``pct``."""
    return df.filter(hash_bucket(F.col(id_col), buckets, salt) < pct)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
    buckets: int = 100,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 10% of English, 100% of low-resource languages).

    One projection + one filter — no shuffle, no per-stratum pass; the
    rate lookup compiles to a CASE over the stratum column.
    """
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(F.col(id_col), buckets, salt) < rate)
