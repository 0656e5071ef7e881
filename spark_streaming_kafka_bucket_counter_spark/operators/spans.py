"""Exact substring (span-level) deduplication: find fixed-width token
windows that recur across documents and score each document by how much
of it is duplicated text — the span-granular counterpart of the
document-level exact/MinHash dedup family (the "exact substring dedup"
pass large-corpus pipelines run before document-level near-dup).

Unlike document dedup, the unit is a WIDTH-token window sampled every
STRIDE tokens, so boilerplate shared between otherwise-distinct pages
(headers, license blocks, templated paragraphs) is caught even when the
documents as wholes are dissimilar.

Scale design: the span inventory is pure per-row array expressions
(tokenize once, shifted ``slice`` windows, ``posexplode``) — no shuffle,
output rows ≈ corpus_tokens / stride. Corpus-wide detection is ONE hash
shuffle on the span hash (map-side partial distinct-doc counts), and the
per-document rollup is two id-keyed aggregations joined on the id — the
same key, so a cluster executes them on one partitioning. The span->
duplicate-set semi-join is a plain hash join AQE may broadcast when the
duplicate set is small; it is never forced to (duplicate sets grow with
the corpus — the LSH-broadcast lesson from the dedup module applies).

Span identity is ``md5`` of the space-joined window — the same portable
fingerprint used by the document-level operators, reproducible in any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql


def span_inventory(
    df: DataFrame,
    id_col: str,
    text_col: str,
    width: int = 8,
    stride: int = 4,
) -> DataFrame:
    """One row per sampled WIDTH-token span: ``(id, span_idx,
    span_hash)``. Only full-width spans are emitted (documents shorter
    than ``width`` tokens contribute none); starts step by ``stride``.
    """
    if width < 1 or stride < 1:
        raise ValueError("width and stride must be >= 1")
    from ..sources.files import fan_out_scan

    tok = tokens(F.col(text_col))
    # tokenize + span slicing + per-span md5 are scan-stage work — fan
    # small inputs out to the session's cores (r12; no-op at scale)
    base = fan_out_scan(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col), tok.alias("_tok")
    ).withColumn("_n", F.size("_tok"))
    starts = F.when(
        F.col("_n") >= width,
        F.sequence(F.lit(0), F.col("_n") - width, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return base.select(
        F.col(id_col),
        F.posexplode(
            F.transform(starts, lambda s: F.slice("_tok", s + 1, width))
        ).alias("span_idx", "_span"),
    ).select(
        F.col(id_col),
        F.col("span_idx").cast("long").alias("span_idx"),
        F.md5(F.array_join("_span", " ")).alias("span_hash"),
    )


def duplicated_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    width: int = 8,
    stride: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document span-duplication profile: ``(id, n_spans,
    n_dup_spans, dup_ppm)`` where a span is *duplicated* when its hash
    occurs in at least ``min_docs`` distinct documents. ``dup_ppm`` is
    the duplicated fraction in parts-per-million — exact integer
    arithmetic, no engine-dependent float division. Documents too short
    to emit a span report zero spans."""
    spans = span_inventory(df, id_col, text_col, width, stride)
    dup_hashes = (
        spans.groupBy("span_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("_n_docs"))
        .filter(F.col("_n_docs") >= min_docs)
        .select("span_hash")
    )
    flagged = spans.join(dup_hashes, "span_hash", "left_semi")
    n_all = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    n_dup = flagged.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_dup"))
    docs = df.select(F.col(id_col))
    return (
        docs.join(n_all, id_col, "left")
        .join(n_dup, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("_n_dup", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.floor(
                    F.coalesce("_n_dup", F.lit(0)) * 1000000 / F.col("n_spans")
                ),
            )
            .otherwise(0)
            .cast("long")
            .alias("dup_ppm"),
        )
    )


def span_inventory_sql(
    table: str, id_col: str, text_col: str, width: int = 8, stride: int = 4
) -> str:
    """DuckDB twin of :func:`span_inventory` (1-based inclusive
    ``list_slice`` bounds mirror Spark's ``slice(start, length)``)."""
    tok = tokens_sql(text_col)
    return f"""
    SELECT {id_col},
           CAST(s // {stride} AS BIGINT) AS span_idx,
           md5(array_to_string(list_slice(_tok, s + 1, s + {width}), ' ')) AS span_hash
    FROM (SELECT {id_col}, {tok} AS _tok FROM {table}),
         LATERAL (SELECT unnest(range(0, greatest(len(_tok) - {width} + 1, 0), {stride})) AS s) st
    """


def duplicated_span_stats_sql(
    table: str,
    id_col: str,
    text_col: str,
    width: int = 8,
    stride: int = 4,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`duplicated_span_stats`."""
    inv = span_inventory_sql(table, id_col, text_col, width, stride)
    return f"""
    WITH spans AS ({inv}),
    dup AS (SELECT span_hash FROM spans
            GROUP BY 1 HAVING COUNT(DISTINCT {id_col}) >= {min_docs}),
    n_all AS (SELECT {id_col}, COUNT(*) AS n_spans FROM spans GROUP BY 1),
    n_dup AS (SELECT {id_col}, COUNT(*) AS n_dup_spans FROM spans
              WHERE span_hash IN (SELECT span_hash FROM dup) GROUP BY 1)
    SELECT d.{id_col},
           CAST(COALESCE(n_all.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(n_dup.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(CASE WHEN COALESCE(n_all.n_spans, 0) > 0
                THEN COALESCE(n_dup.n_dup_spans, 0) * 1000000 // n_all.n_spans
                ELSE 0 END AS BIGINT) AS dup_ppm
    FROM {table} d
    LEFT JOIN n_all ON d.{id_col} = n_all.{id_col}
    LEFT JOIN n_dup ON d.{id_col} = n_dup.{id_col}
    """
