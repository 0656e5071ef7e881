"""Query-only gate on the arbitrary-SQL serving surface (SURVEY §7.3(d)).

The reference served full SQL over HTTP against a throwaway SQLite file
(http_endpoint.py:88-92, models.py:155-187); here the same route reaches
a live SparkSession, so mutating statements must be refused BEFORE they
execute — spark.sql runs DDL eagerly, so a post-hoc check would be too
late. These tests drive real sockets end-to-end and also pin the
parser-level classifier and the direct-API opt-out.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from spark_streaming_kafka_bucket_counter_spark.streaming.http import serve
from spark_streaming_kafka_bucket_counter_spark.streaming.serving import (
    CommandRejected,
    ServingStore,
    reject_non_query,
)


@pytest.fixture()
def gated(spark, tmp_path):
    store = ServingStore(spark, str(tmp_path / "store"))
    store.append(
        spark.createDataFrame(
            [("click", 1), ("view", 4)], "event_type string, count long"
        ),
        0,
    )
    server, _ = serve(store)
    yield store, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _get(base, path):
    quoted = urllib.parse.quote(path)
    try:
        with urllib.request.urlopen(base + quoted) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read())


QUERIES_OK = [
    "SELECT 1 AS one",
    "SELECT * FROM default WHERE count = 1",
    "WITH x AS (SELECT count FROM default) SELECT max(count) AS m FROM x",
    "(SELECT 1 AS a) UNION ALL (SELECT 2 AS a)",
    "VALUES (1, 2)",
    "TABLE default",
    "FROM default SELECT event_type",
]

COMMANDS_BLOCKED = [
    "DROP TABLE default",
    "INSERT INTO default VALUES ('x', 9)",
    "INSERT OVERWRITE TABLE default SELECT * FROM default",
    "CREATE TABLE pwned (a INT) USING parquet",
    "CREATE TABLE pwned AS SELECT * FROM default",
    "CREATE OR REPLACE TEMPORARY VIEW default AS SELECT 1",
    "SET spark.sql.shuffle.partitions=1",
    "ADD JAR '/tmp/evil.jar'",
    "CACHE TABLE default",
    "DELETE FROM default WHERE count = 1",
    "UPDATE default SET count = 0",
    "TRUNCATE TABLE default",
    "ALTER TABLE default ADD COLUMNS (z INT)",
    "LOAD DATA INPATH '/etc/passwd' INTO TABLE default",
    # root-node-only bypasses (ADVICE r6 high): the mutation hides below
    # a top-level UnresolvedWith / UnresolvedExecuteImmediate node
    "WITH x AS (SELECT 1) INSERT INTO default SELECT 'x', 9 FROM x",
    "WITH x AS (SELECT 1 AS a) DELETE FROM default "
    "WHERE EXISTS (SELECT 1 FROM x)",
    "WITH x AS (SELECT 1) MERGE INTO default USING x ON true "
    "WHEN MATCHED THEN DELETE",
    "EXECUTE IMMEDIATE 'DROP TABLE default'",
]


def test_classifier_accepts_queries(spark):
    for sql in QUERIES_OK:
        reject_non_query(spark, sql)  # no raise


def test_classifier_rejects_commands(spark):
    for sql in COMMANDS_BLOCKED:
        with pytest.raises(CommandRejected):
            reject_non_query(spark, sql)


def test_classifier_lets_parse_errors_through(spark):
    # unparseable SQL is NOT a gate decision: spark.sql raises the real
    # ParseException with its good error message
    reject_non_query(spark, "SELEKT oops FROM")


def test_readonly_commands_stay_queryable(spark):
    for sql in ("SHOW TABLES", "EXPLAIN SELECT 1", "DESCRIBE TABLE default"):
        reject_non_query(spark, sql)  # no raise


def test_explain_of_a_mutation_stays_queryable(spark):
    # EXPLAIN never executes its payload; the tree walk must not descend
    # into read-only commands and reject their inner InsertIntoStatement
    reject_non_query(spark, "EXPLAIN INSERT INTO default VALUES ('x', 9)")


def test_http_cte_wrapped_insert_is_403(gated):
    store, base = gated
    status, _ = _get(
        base, "/c/WITH x AS (SELECT 1) INSERT INTO default SELECT 'x', 9 FROM x"
    )
    assert status == 403
    status, rows = _get(base, "/a/*")
    assert status == 200 and len(rows) == 2  # nothing was inserted


def test_http_select_is_200(gated):
    _, base = gated
    status, rows = _get(base, "/c/SELECT * FROM default WHERE count=1")
    assert status == 200 and rows[0]["event_type"] == "click"


def test_http_drop_table_is_403_and_store_intact(gated):
    store, base = gated
    status, body = _get(base, "/c/DROP TABLE default")
    assert status == 403 and "DropTable" in body["error"]
    # the store still answers — nothing was dropped
    status, rows = _get(base, "/a/*")
    assert status == 200 and len(rows) == 2
    # and the view is still resolvable through SQL
    status, rows = _get(base, "/c/SELECT count(*) AS n FROM default")
    assert status == 200 and rows[0]["n"] == 2


def test_http_insert_is_403(gated):
    _, base = gated
    status, body = _get(base, "/c/INSERT INTO default VALUES ('x', 9)")
    assert status == 403 and "InsertIntoStatement" in body["error"]
    status, rows = _get(base, "/a/*")
    assert len(rows) == 2  # row count unchanged


def test_http_cs_route_is_gated_too(gated):
    _, base = gated
    status, _ = _get(base, "/cs/SET spark.sql.ansi.enabled=false")
    assert status == 403


def test_direct_api_override_executes_commands(spark, tmp_path):
    store = ServingStore(spark, str(tmp_path / "store2"))
    store.append(spark.createDataFrame([(1,)], "a long"), 0)
    with pytest.raises(CommandRejected):
        store.run_cmd("CREATE OR REPLACE TEMPORARY VIEW gate_probe AS SELECT 1 AS x")
    # per-call opt-out
    store.run_cmd(
        "CREATE OR REPLACE TEMPORARY VIEW gate_probe AS SELECT 1 AS x",
        allow_commands=True,
    )
    assert spark.sql("SELECT x FROM gate_probe").collect()[0][0] == 1
    spark.catalog.dropTempView("gate_probe")
    # store-level opt-out (reference-compat full-SQL mode)
    open_store = ServingStore(spark, str(tmp_path / "store3"), allow_commands=True)
    open_store.append(spark.createDataFrame([(1,)], "a long"), 0)
    open_store.run_cmd("CREATE OR REPLACE TEMPORARY VIEW gate_probe2 AS SELECT 2 AS x")
    assert spark.sql("SELECT x FROM gate_probe2").collect()[0][0] == 2
    spark.catalog.dropTempView("gate_probe2")
