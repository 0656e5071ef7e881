"""Unit tests for the insight-layer operators: funnel strict-ordering,
cohort retention, span-level substring dedup, profiling, and snapshot
diff edge cases the sf-scale oracle comparison can't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.operators.events import (
    cohort_retention,
    funnel_counts,
    funnel_times,
)
from spark_streaming_kafka_bucket_counter_spark.operators.profile import (
    key_share_topk,
    profile_columns,
    snapshot_diff,
)
from spark_streaming_kafka_bucket_counter_spark.operators.spans import (
    duplicated_span_stats,
    span_inventory,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts_e long, event_type string")


def test_funnel_strict_order(spark):
    # u1 completes A->B->C in order; u2 does C before B (C must not count);
    # u3 only does A.
    rows = [
        (1, 10, "A"), (1, 20, "B"), (1, 30, "C"),
        (2, 10, "A"), (2, 15, "C"), (2, 20, "B"),
        (3, 10, "A"),
    ]
    out = funnel_counts(_events(spark, rows), "user_id", "ts_e", "event_type", ["A", "B", "C"])
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"A": 3, "B": 2, "C": 1}


def test_funnel_equal_timestamp_not_counted(spark):
    # step 2 at the SAME time as step 1 is not strictly after
    rows = [(1, 10, "A"), (1, 10, "B")]
    t = funnel_times(_events(spark, rows), "user_id", "ts_e", "event_type", ["A", "B"])
    row = t.collect()[0]
    assert row["t_1"] == 10 and row["t_2"] is None


def test_funnel_within_horizon(spark):
    rows = [(1, 10, "A"), (1, 1000, "B"), (2, 10, "A"), (2, 20, "B")]
    out = funnel_counts(
        _events(spark, rows), "user_id", "ts_e", "event_type", ["A", "B"],
        within_seconds=60,
    )
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"A": 2, "B": 1}


def test_funnel_earliest_step1_anchors(spark):
    # the funnel anchors on the EARLIEST step-1 event: a later A would
    # allow the B at ts=5 if anchoring were per-pair, but strict
    # semantics use min(A)=1 so B at 5 counts
    rows = [(1, 1, "A"), (1, 8, "A"), (1, 5, "B")]
    t = funnel_times(_events(spark, rows), "user_id", "ts_e", "event_type", ["A", "B"])
    row = t.collect()[0]
    assert row["t_1"] == 1 and row["t_2"] == 5


def test_cohort_retention_offsets(spark):
    # period=100: u1 first in period 0, active in 0 and 2; u2 first in
    # period 1, active in 1 only
    rows = [(1, 10, "x"), (1, 250, "x"), (2, 150, "x")]
    out = cohort_retention(_events(spark, rows), "user_id", "ts_e", 100)
    got = {(r["cohort_start"], r["period_offset"]): r["n_users"] for r in out.collect()}
    assert got == {(0, 0): 1, (0, 2): 1, (100, 0): 1}


def test_span_inventory_short_doc_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    inv = span_inventory(docs, "doc_id", "text", width=5, stride=2)
    got = inv.groupBy("doc_id").count().collect()
    # doc 1 has 3 tokens < width -> no spans; doc 2 has starts 0 (6-5=1 -> starts 0)
    assert {r["doc_id"]: r["count"] for r in got} == {2: 1}


def test_duplicated_span_stats_cross_doc(spark):
    shared = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha beta gamma"),
            (2, shared + " delta epsilon zeta"),
            (3, "totally different words here now honestly"),
            (4, "ab"),  # too short: zero spans
        ],
        "doc_id long, text string",
    )
    out = duplicated_span_stats(docs, "doc_id", "text", width=5, stride=1, min_docs=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[4]["n_spans"] == 0 and rows[4]["dup_ppm"] == 0
    assert rows[3]["n_dup_spans"] == 0
    # the shared 5-token prefix is the only cross-doc span
    assert rows[1]["n_dup_spans"] == 1 and rows[2]["n_dup_spans"] == 1
    assert rows[1]["n_spans"] == 4  # 8 tokens -> starts 0..3
    assert rows[1]["dup_ppm"] == 250000


def test_profile_columns_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, v string"
    )
    out = {r["col_name"]: r for r in profile_columns(df, ["k", "v"]).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nonnull"] == 3
    assert out["k"]["n_distinct"] == 2
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "2"
    assert out["v"]["n_nonnull"] == 2 and out["v"]["n_distinct"] == 2


def test_key_share_topk_ties_and_share(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",)], "k string"
    )
    rows = key_share_topk(df, "k", 2).collect()
    # a and b tie at 2 rows; tie-break orders a first
    assert [(r["k"], r["n_rows"]) for r in rows] == [("a", 2), ("b", 2)]
    assert rows[0]["share_ppm"] == 400000


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None)], "k long, v long"
    )
    new = spark.createDataFrame(
        [(2, 25), (3, None), (4, 40)], "k long, v long"
    )
    out = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out == {1: "removed", 2: "changed", 3: "unchanged", 4: "added"}


def test_funnel_plan_no_cartesian(spark):
    from spark_streaming_kafka_bucket_counter_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    plan = QUERIES["funnel_conversion"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_pagerank_star_graph(spark):
    from spark_streaming_kafka_bucket_counter_spark.operators.graph import (
        PR_UNIT,
        pagerank,
    )

    # star: hub 1 connected to 2,3,4 — hub must outrank the leaves,
    # leaves must tie exactly (symmetry + integer arithmetic)
    edges = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "a long, b long")
    ranks = {r["node"]: r["rank_e9"] for r in pagerank(edges, "a", "b", 5).collect()}
    assert set(ranks) == {1, 2, 3, 4}
    assert ranks[2] == ranks[3] == ranks[4]
    assert ranks[1] > ranks[2]
    # mass approximately conserved (floor divisions shed < 1 unit/term)
    assert abs(sum(ranks.values()) - PR_UNIT) < 100


def test_pagerank_ring_uniform(spark):
    from spark_streaming_kafka_bucket_counter_spark.operators.graph import (
        PR_UNIT,
        pagerank,
    )

    # ring: perfectly symmetric -> every node keeps exactly UNIT/N
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "a long, b long"
    )
    ranks = [r["rank_e9"] for r in pagerank(edges, "a", "b", 3).collect()]
    assert len(set(ranks)) == 1
    assert abs(ranks[0] - PR_UNIT // 4) <= 1


def test_scd2_validity_chain(spark):
    from spark_streaming_kafka_bucket_counter_spark.operators.temporal import (
        scd2_from_changelog,
    )

    log = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 15, "x")],
        "k long, ts long, attr string",
    )
    rows = sorted(
        scd2_from_changelog(log, "k", "ts", ["attr"]).collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    k1 = [r for r in rows if r["k"] == 1]
    # adjacent validity: each version closes exactly where the next opens
    assert [(r["valid_from"], r["valid_to"]) for r in k1] == [
        (10, 20), (20, 30), (30, None)
    ]
    assert [r["is_current"] for r in k1] == [False, False, True]
    k2 = [r for r in rows if r["k"] == 2]
    assert k2[0]["valid_to"] is None and k2[0]["is_current"]


def test_densify_zero_fills(spark):
    from spark_streaming_kafka_bucket_counter_spark.operators.temporal import (
        densify_buckets,
    )

    df = spark.createDataFrame(
        [("a", 5), ("a", 25), ("b", 15)], "k string, ts_e long"
    )
    out = densify_buckets(df, "k", "ts_e", 10, "n")
    got = {(r["k"], r["bucket_start"]): r["n"] for r in out.collect()}
    # global range [0, 20]; every (key, bucket) present, zeros filled
    assert got == {
        ("a", 0): 1, ("a", 10): 0, ("a", 20): 1,
        ("b", 0): 0, ("b", 10): 1, ("b", 20): 0,
    }


def test_dedup_keep_best_prefers_score(spark):
    from spark_streaming_kafka_bucket_counter_spark.operators.dedup import (
        drop_duplicates_keep_best,
    )

    # docs 1 and 2 share content after normalization? no — identical
    # text dups: 1,2 same text; 3 unique. score favors doc 2.
    docs = spark.createDataFrame(
        [(1, "same text", 5), (2, "same text", 9), (3, "other", 1)],
        "doc_id long, text string, score long",
    )
    kept = sorted(
        r["doc_id"]
        for r in drop_duplicates_keep_best(docs, "doc_id", "text", "score").collect()
    )
    assert kept == [2, 3]


def test_weighted_sample_biased_and_deterministic(spark):
    from spark_streaming_kafka_bucket_counter_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, 100 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    s1 = weighted_sample_topk(df, "doc_id", "w", 100).collect()
    s2 = weighted_sample_topk(df, "doc_id", "w", 100).collect()
    # deterministic: identical runs
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    heavy = sum(1 for r in s1 if r["doc_id"] < 500)
    # 100x weight -> overwhelmingly heavy picks (uniform would be ~50)
    assert heavy >= 90
    # zero/negative weights never selected
    df2 = spark.createDataFrame([(1, 0), (2, -5), (3, 7)], "doc_id long, w long")
    assert [r["doc_id"] for r in weighted_sample_topk(df2, "doc_id", "w", 10).collect()] == [3]


def test_phash_near_pairs_semantics(spark):
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        image_phash,
        phash_near_pairs,
        with_binary_payload,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # identical -> hamming 0
            (3, base[:-6] + "zzzzzz"),      # localized edit -> small hamming
            (4, "完全 " * 0 + "abcdefgh " * 40),  # different text
        ],
        "doc_id long, text string",
    )
    ph = image_phash(with_binary_payload(docs))
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in phash_near_pairs(ph).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    # the perturbed doc should still be near its source (few slice sums change)
    if (1, 3) in pairs:
        assert pairs[(1, 3)] <= 3
    # unrelated text never pairs at hamming <= 3 with the base
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_feature_ewma_exact_integers(spark):
    """EWMA weights are exact scaled powers of two; verify the integer
    numerator/denominator and the ramp-up denominators on a tiny stream."""
    from spark_streaming_kafka_bucket_counter_spark.plans.insights import _EWMA_DEPTH

    assert _EWMA_DEPTH == 10
    import duckdb

    from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog

    out = {
        (r["user_id"], r["event_id"]): r
        for r in catalog.QUERIES["feature_ewma"](spark, "/root/testdata/sf0.001")
        .filter(F.col("user_id") == 1)
        .collect()
    }
    # replicate driver-side from the raw table for user 1
    con = duckdb.connect()
    rows = con.execute(
        """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_e,
                  CAST(ROUND("value" * 10000) AS BIGINT) AS v
           FROM '/root/testdata/sf0.001/events.parquet'
           WHERE user_id = 1 ORDER BY ts_e, event_id"""
    ).fetchall()
    assert rows and len(out) == len(rows)
    hist = []
    for eid, _, v in rows:
        hist.append(v)
        win = hist[-10:][::-1]  # most recent first
        num = sum(x * (1 << (9 - k)) for k, x in enumerate(win))
        den = sum(1 << (9 - k) for k in range(len(win)))
        r = out[(1, eid)]
        assert (r["ewma_num_x512"], r["ewma_den_x512"]) == (num, den), eid
        assert r["ewma_e4"] == num // den or (num < 0 and r["ewma_e4"] == int(num / den))


def test_sample_negatives_contract(spark):
    from spark_streaming_kafka_bucket_counter_spark.operators.sampling import (
        sample_negatives,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = sample_negatives(df, "doc_id", k=3, buckets=8).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["doc_id"], []).append((r["neg_rank"], r["negative_id"]))
        assert r["negative_id"] != r["doc_id"]  # never self-pair
    # every anchor gets exactly k negatives (every bucket non-empty here)
    assert set(len(v) for v in by_anchor.values()) == {3}
    assert len(by_anchor) == 200
    # deterministic across runs
    out2 = sample_negatives(df, "doc_id", k=3, buckets=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # buckets < 2 would make anchors pair with their own bucket
    import pytest

    with pytest.raises(ValueError, match="buckets >= 2"):
        sample_negatives(df, "doc_id", k=3, buckets=1)
