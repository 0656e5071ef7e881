"""Sequence packing: assign documents to fixed token-budget training
sequences — the step between curation and the data loader (greedy
concat-and-chunk, the standard packing recipe for LLM pretraining).

Construction: documents are hashed into shards (so packing parallelizes
— each shard packs independently and DETERMINISTICALLY, independent of
partition layout), ordered by id within the shard, and the running token
cumsum places each document: ``offset`` is the document's first token
position in the shard's concatenated stream, ``pack_id = offset //
budget`` the training sequence that position lands in (documents may
straddle a boundary — the loader splits them, as concat-and-chunk does).

Scale shape: ONE shuffle (hash partition by shard) + one window pass;
shard count is the parallelism knob. No collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket, hash_bucket_sql


def pack_documents(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    n_shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """(doc, shard, n_tokens, offset, pack_id) under greedy
    concat-and-chunk packing into ``budget``-token sequences per shard."""
    shard = hash_bucket(F.col(id_col), n_shards, salt)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(id_col), F.col(n_tokens_col).alias("n_tokens"), shard.alias("shard")
    )
    return (
        base.withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "shard",
            "n_tokens",
            (F.col("_cum") - F.col("n_tokens")).cast("long").alias("offset"),
            # integer division (DIV) — a double floor() would lose
            # exactness once shard cumsums pass 2^53 tokens
            F.expr(f"(_cum - n_tokens) DIV {budget}").cast("long").alias("pack_id"),
        )
    )


def write_training_shards(
    packed: DataFrame,
    docs: DataFrame,
    id_col: str,
    path: str,
) -> None:
    """Materialize packed documents as training shards: parquet
    partitioned by shard, each shard file sorted by (pack_id, offset) so
    a loader reads sequences with a straight scan.

    ``packed`` is :func:`pack_documents` output; ``docs`` supplies the
    payload columns (joined back on ``id_col`` — the packing projection
    deliberately carries no text so the window shuffle moves only
    metadata; the payload join is the LAST step, after which data is
    written straight out with no further shuffle beyond the
    repartition-by-shard that aligns files with shards).
    """
    out = packed.join(docs, id_col)
    (
        out.repartition("shard")
        .sortWithinPartitions("pack_id", "offset")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def pack_documents_sql(
    table: str,
    id_col: str,
    n_tokens_expr: str,
    budget: int,
    n_shards: int = 16,
    salt: str = "pack",
) -> str:
    """DuckDB oracle twin (same hash shards, same window order)."""
    shard = hash_bucket_sql(id_col, n_shards, salt)
    return f"""
    WITH base AS (
      SELECT {id_col}, {n_tokens_expr} AS n_tokens, {shard} AS shard FROM {table}
    ),
    packed AS (
      SELECT {id_col}, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM base
    )
    SELECT {id_col}, shard, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS offset,
           CAST((cum - n_tokens) // {budget} AS BIGINT) AS pack_id
    FROM packed
    """
