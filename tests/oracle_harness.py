"""Mini replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, sorted column names, and an
order-insensitive value hash (rows rendered to canonical strings, sorted,
hashed). Catching a mismatch here at sf0.001 means the driver's sf0.01
gate will almost certainly pass too.

Driver-faithfulness (hardened after the r03 array and r09 HUGEINT
escapes):

* BOTH sides are materialized through pandas (`DataFrame.toPandas()` /
  duckdb `fetchdf()`), the same representation layer the grading driver
  hashes through — not `collect()`/`fetchall()`, whose Python-int
  faithfulness masked DuckDB's ``SUM(BIGINT) -> HUGEINT`` widening in r09
  (the driver's pandas path turns HUGEINT into float64 and the hash
  diverges even though every value is numerically identical).
* Floats NEVER collapse to int strings: an int64 ``1020000000000`` and a
  float64 ``1020000000000.0`` must hash differently, exactly as they do
  under the driver.
* `duckdb_signature` additionally REJECTS any oracle whose result schema
  contains a type pandas cannot represent losslessly next to Spark's
  output (HUGEINT / UHUGEINT / DECIMAL) by raising `OracleTypeError`
  before any value is hashed. Oracles must cast aggregates back to
  BIGINT/DOUBLE explicitly (see plans/queries.py module docstring).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import re
from decimal import Decimal

import numpy as np
import pandas as pd

#: DuckDB logical types whose pandas materialization silently changes the
#: value representation (HUGEINT/DECIMAL -> float64) and therefore can
#: never legitimately appear in an oracle's output schema.
_LOSSY_TYPE_RE = re.compile(r"^(HUGEINT|UHUGEINT|DECIMAL\b.*)$", re.IGNORECASE)


class OracleTypeError(TypeError):
    """An oracle SQL produced a driver-lossy output column type."""


def _canon(v) -> str:
    if v is None:
        return "NULL"
    # pandas NA scalars (NaT, pd.NA); NaN floats are rendered as "NaN"
    # below so both sides agree whether NULL and NaN collide in a float64
    # column (they do, on both, once each side went through pandas).
    if v is pd.NaT or v is getattr(pd, "NA", None):
        return "NULL"
    if isinstance(v, (np.generic,)):
        v = v.item()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return _canon(float(v))
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return v.astimezone(_dt.timezone.utc).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), _canon(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def table_signature(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    rendered = sorted("|".join(_canon(row[i]) for i in order) for row in rows)
    h = hashlib.sha256("\n".join(rendered).encode()).hexdigest()
    return len(rows), sorted_cols, h


def pandas_signature(df: pd.DataFrame) -> tuple[int, list[str], str]:
    """Signature of a pandas frame — the shared canonical layer."""
    cols = [str(c) for c in df.columns]
    rows = [tuple(row) for row in df.itertuples(index=False, name=None)]
    return table_signature(cols, rows)


def spark_signature(df):
    return pandas_signature(df.toPandas())


def oracle_output_types(con, sql: str) -> list[tuple[str, str]]:
    """(column, duckdb logical type) pairs of an oracle's result schema."""
    rel = con.sql(sql)
    return list(zip(rel.columns, (str(t) for t in rel.types)))


def check_oracle_types(con, sql: str, name: str = "<oracle>") -> None:
    """Raise OracleTypeError if the oracle emits a driver-lossy type."""
    bad = [
        (c, t) for c, t in oracle_output_types(con, sql) if _LOSSY_TYPE_RE.match(t)
    ]
    if bad:
        raise OracleTypeError(
            f"{name}: oracle output contains driver-lossy DuckDB types "
            f"{bad}; cast aggregates back (e.g. CAST(SUM(x) AS BIGINT)) — "
            "pandas materializes these as float64 and the driver's value "
            "hash diverges from Spark's int64 output."
        )


def duckdb_signature(con, sql: str, name: str = "<oracle>"):
    check_oracle_types(con, sql, name)
    return pandas_signature(con.sql(sql).fetchdf())


def compare(spark, con, qfn, sql: str, sf_dir: str, name: str = "<oracle>"):
    """Return (ok, detail) comparing a Spark query against its oracle."""
    n1, c1, h1 = spark_signature(qfn(spark, sf_dir))
    n2, c2, h2 = duckdb_signature(con, sql, name)
    ok = (n1, c1, h1) == (n2, c2, h2)
    return ok, {
        "spark": {"rows": n1, "cols": c1, "hash": h1},
        "duckdb": {"rows": n2, "cols": c2, "hash": h2},
    }
