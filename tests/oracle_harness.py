"""Mini replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, sorted column names, and an
order-insensitive value hash (rows rendered to canonical strings, sorted,
hashed). Catching a mismatch here at sf0.001 means the driver's sf0.01
gate will almost certainly pass too.
"""

from __future__ import annotations

import hashlib
import math
from datetime import datetime, timezone
from decimal import Decimal


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, Decimal):
        f = float(v)
        return _canon(f)
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return v.astimezone(timezone.utc).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_signature(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    rendered = sorted("|".join(_canon(row[i]) for i in order) for row in rows)
    h = hashlib.sha256("\n".join(rendered).encode()).hexdigest()
    return len(rows), sorted_cols, h


def spark_signature(df):
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return table_signature(cols, rows)


def duckdb_signature(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return table_signature(cols, rows)


def compare(spark, con, qfn, sql: str, sf_dir: str):
    """Return (ok, detail) comparing a Spark query against its oracle."""
    n1, c1, h1 = spark_signature(qfn(spark, sf_dir))
    n2, c2, h2 = duckdb_signature(con, sql)
    ok = (n1, c1, h1) == (n2, c2, h2)
    return ok, {
        "spark": {"rows": n1, "cols": c1, "hash": h1},
        "duckdb": {"rows": n2, "cols": c2, "hash": h2},
    }
