"""Oracle output-type discipline (r9 lesson: DuckDB HUGEINT escapes).

DuckDB widens ``SUM(BIGINT)`` to HUGEINT; the grading driver's pandas
canonicalizer materializes HUGEINT (and DECIMAL) as float64, so an
oracle that forgets the ``CAST(... AS BIGINT)`` hash-mismatches Spark's
int64 output even when every value is numerically identical
(CORRECTNESS_r09's four `sim_*pq*` reds).  Two guards:

1. a regression test that an uncast ``SUM(BIGINT)`` oracle is REJECTED
   by the harness before hashing, and
2. a one-shot audit of EVERY catalog oracle's result schema at sf0.001 —
   no HUGEINT / UHUGEINT / DECIMAL may appear in any output column.
"""

from __future__ import annotations

import pytest

from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog
from tests.oracle_harness import (
    OracleTypeError,
    check_oracle_types,
    duckdb_signature,
    oracle_output_types,
)


def test_uncast_sum_bigint_is_rejected(duck):
    """The exact r09 escape shape must now fail loudly, not hash-diverge."""
    sql = "SELECT SUM(x) AS s FROM (SELECT 1022337203685::BIGINT AS x)"
    with pytest.raises(OracleTypeError, match="HUGEINT"):
        duckdb_signature(duck, sql, "regression_uncast_sum")


def test_uncast_decimal_is_rejected(duck):
    sql = "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d"
    with pytest.raises(OracleTypeError, match="DECIMAL"):
        check_oracle_types(duck, sql, "regression_decimal")


def test_cast_sum_is_accepted(duck):
    sql = "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT 1::BIGINT AS x)"
    check_oracle_types(duck, sql, "regression_cast_ok")


@pytest.mark.parametrize("name", sorted(catalog.ORACLES))
def test_catalog_oracle_output_types(duck, name):
    """Schema-only audit: cheap (no execution beyond DuckDB binding)."""
    try:
        check_oracle_types(duck, catalog.ORACLES[name], name)
    except OracleTypeError:
        types = oracle_output_types(duck, catalog.ORACLES[name])
        pytest.fail(f"{name}: driver-lossy oracle output schema {types}")
