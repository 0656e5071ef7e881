"""External sinks: JDBC upsert (reference K3/K4) and Kafka writeback (K2).

Reference K4 (``create_mysql_parse_func``, main.py:410-467) generates
``INSERT ... ON DUPLICATE KEY UPDATE`` statements from a declarative
schema: a column map (``msg_map_schema``), a table name, and
``dup_key_update`` templates like ``{'count': 'count + {count}'}`` that
accumulate counts across batches. K3 (main.py:375-408) executes them over
a per-partition MySQL connection.

Spark-first: the same declarative schema drives
- :func:`upsert_sql` — the statement builder (pure, unit-testable; kept
  for wire-level parity with MySQL deployments), and
- :func:`jdbc_upsert_batch` — a ``foreachBatch`` body that stages the
  micro-batch via ``df.write.jdbc`` and issues one server-side MERGE /
  upsert per batch (connection-per-batch, not per-row like the
  reference's row loop at models.py:374-413).

The executor path is exercised end-to-end in tests against embedded
Apache Derby (ships with the Spark distribution for the Hive metastore):
``tests/test_jdbc_upsert.py`` runs two batches through
:func:`jdbc_upsert_batch` and asserts the MERGE accumulates counts — the
reference's A5 wire-level semantics (main.py:453-455) — with no external
database required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def upsert_sql(
    table_name: str,
    row: dict,
    column_map: dict[str, str] | None = None,
    dup_key_update: dict[str, str] | None = None,
) -> str:
    """K4: one-row MySQL upsert statement from the declarative schema.

    ``column_map`` maps ``{db_column: row_key}`` (the reference's
    msg_map_schema); ``dup_key_update`` maps ``{db_column: template}``
    where ``{key}`` placeholders are filled from the row, e.g.
    ``{'count': 'count + {count}'}`` reproduces the reference's
    cross-batch count accumulation (main.py:453-455). Values are escaped,
    unlike the reference's raw interpolation (models.py:359-363).
    """
    column_map = column_map or {k: k for k in row}
    cols = list(column_map)
    values = [_sql_literal(row[column_map[c]]) for c in cols]
    sql = (
        f"INSERT INTO {table_name} ({', '.join(cols)}) "
        f"VALUES ({', '.join(values)})"
    )
    if dup_key_update:
        sets = ", ".join(
            f"{col} = " + template.format(**{k: _sql_literal(v) for k, v in row.items()})
            for col, template in dup_key_update.items()
        )
        sql += f" ON DUPLICATE KEY UPDATE {sets}"
    return sql


def merge_sql(
    target: str,
    staging: str,
    key_cols: list[str],
    update_cols: dict[str, str],
    insert_cols: list[str],
) -> str:
    """ANSI MERGE equivalent of the upsert — one set-based statement per
    micro-batch instead of a statement per row.

    ``update_cols`` maps ``{col: expr}`` with ``t``/``s`` aliases, e.g.
    ``{'count': 't.count + s.count'}``.
    """
    on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
    # ANSI: SET names the target column unqualified (qualified targets are
    # a MySQL-ism that Derby/Postgres reject); expressions keep t./s.
    sets = ", ".join(f"{c} = {expr}" for c, expr in update_cols.items())
    ins_cols = ", ".join(insert_cols)
    ins_vals = ", ".join(f"s.{c}" for c in insert_cols)
    return (
        f"MERGE INTO {target} t USING {staging} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def jdbc_upsert_batch(
    batch_df: DataFrame,
    jdbc_url: str,
    table: str,
    key_cols: list[str],
    update_cols: dict[str, str],
    properties: dict[str, str] | None = None,
    staging_column_types: str | None = None,
) -> None:
    """K3 as a ``foreachBatch`` body: stage the batch, merge server-side.

    Connection-per-batch (vs the reference's connection-per-partition with
    row-at-a-time execute, main.py:375-408). Requires a JDBC driver on the
    classpath; raises a clear error otherwise.

    ``staging_column_types`` overrides the staging table's DDL types
    (Spark's dialect default for StringType is CLOB on some databases —
    e.g. Derby — which cannot be compared in a MERGE ON clause; pass
    ``"event_type VARCHAR(64)"``-style overrides for key columns).
    """
    staging = f"{table}_staging"
    writer = batch_df.write
    if staging_column_types:
        writer = writer.option("createTableColumnTypes", staging_column_types)
    writer.jdbc(jdbc_url, staging, mode="overwrite", properties=properties or {})
    stmt = merge_sql(table, staging, key_cols, update_cols, list(batch_df.columns))
    spark = batch_df.sparkSession
    # Issue the merge through the JVM driver connection.
    jvm = spark._jvm
    jdbc = jvm.java.sql.DriverManager.getConnection(jdbc_url)
    try:
        jdbc.createStatement().execute(stmt)
    finally:
        jdbc.close()
