"""Scale-hardening tests for the round-2 fixes: the distributed blocked
all-pairs cosine, 64-bit SimHash recall, size-gated LSH broadcasts, and
cache lifecycle (no leaked persisted RDDs).
"""

from __future__ import annotations

import contextlib
import gc
import io

from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.operators import dedup as D
from spark_streaming_kafka_bucket_counter_spark.operators import similarity as S
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# Blocked all-pairs cosine
# ---------------------------------------------------------------------------


def test_blocked_allpairs_matches_driver_path(spark):
    """The distributed grid must emit the exact same pair set as the
    driver-broadcast numpy baseline — including across multiple blocks
    (block_rows=16 forces a real multi-cell grid at sf0.001)."""
    emb = _emb(spark)
    blocked = S.cosine_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.4, block_rows=16)
    driver = S.cosine_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.4, driver_allpairs=True)
    assert _rows(blocked) == _rows(driver)


def test_blocked_allpairs_plan_is_distributed(spark):
    """Plan pin: the default embedding near-dup path must run as a grouped
    Arrow stage (FlatMapGroupsInPandas) with the replication map broadcast
    — and never a cartesian product or a driver-side collect-limit."""
    df = S.cosine_near_dup_pairs(_emb(spark), "vec_id", "embedding", threshold=0.4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapGroupsInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "CollectLimit" not in plan


# ---------------------------------------------------------------------------
# 64-bit SimHash
# ---------------------------------------------------------------------------


def test_simhash64_full_recall_at_hamming_3(spark):
    """Pigeonhole guarantee: the banded candidate join must find EVERY
    pair with hamming <= 3 — verified against the brute-force all-pairs
    hamming over the same signatures."""
    # deterministic subset (limit without ordering may pick different
    # rows across the two independent plan executions below)
    docs = _docs(spark).filter(F.col("doc_id") < 120)
    sig = D.simhash64_signatures(docs, "doc_id", "text")
    a = sig.select(F.col("doc").alias("doc_a"), *[F.col(f"p{k}").alias(f"a{k}") for k in range(4)])
    b = sig.select(F.col("doc").alias("doc_b"), *[F.col(f"p{k}").alias(f"b{k}") for k in range(4)])
    ham = None
    for k in range(4):
        t = F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}")))
        ham = t if ham is None else ham + t
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )
    banded = D.simhash64_near_pairs(docs, "doc_id", "text", max_hamming=3)
    assert _rows(banded) == _rows(brute)


def test_simhash64_rejects_unguaranteed_hamming():
    import pytest

    with pytest.raises(ValueError, match="full recall"):
        D.simhash64_near_pairs(None, "doc_id", "text", max_hamming=4)


# ---------------------------------------------------------------------------
# Size-gated LSH verify
# ---------------------------------------------------------------------------


def test_lsh_shuffle_path_matches_broadcast_path(spark):
    """broadcast_max_docs=0 forces the shuffle-join verify; results must
    be identical to the (default) broadcast verify."""
    docs = _docs(spark)
    bcast = D.minhash_lsh_pairs(docs, "doc_id", "text")
    shuffle = D.minhash_lsh_pairs(docs, "doc_id", "text", broadcast_max_docs=0)
    assert _rows(bcast) == _rows(shuffle)


def test_lsh_max_shingle_freq_reaches_lsh_path(spark):
    """The stop-shingle control must apply on the LSH path: an absurdly
    low bound drops every shingle, so no candidates survive."""
    out = D.minhash_lsh_pairs(_docs(spark), "doc_id", "text", max_shingle_freq=0)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# Cache lifecycle
# ---------------------------------------------------------------------------


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_operator_caches_drain_after_result_gc(spark):
    """The persisted intermediates (inverted index, candidates, bucket
    projection) must be unpersisted once the consumer drops the result —
    a long-lived session (bench loop / serving) must not accumulate
    storage."""
    before = _n_persistent(spark)
    docs, emb = _docs(spark), _emb(spark)
    results = [
        D.ngram_jaccard_pairs(docs, "doc_id", "text"),
        D.minhash_lsh_pairs(docs, "doc_id", "text"),
        S.cosine_near_dup_pairs(emb, "vec_id", "embedding", bucketed=True),
    ]
    for df in results:
        df.count()
    assert _n_persistent(spark) > before  # caches live while results are held
    del results, df
    gc.collect()
    assert _n_persistent(spark) == before


def test_fan_out_scan_no_ops_on_non_file_frames(spark):
    """ADVICE r12 #2: a frame with no inputFiles() (createDataFrame,
    memoized checkpoint, non-file source) has unknown size — fan_out_scan
    must return it UNTOUCHED instead of paying an unconditional shuffle,
    so the documented 'no-op at scale' guarantee holds for every source
    kind."""
    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        fan_out_scan,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, t string")
    assert df.inputFiles() == []
    assert fan_out_scan(df, "id") is df


def test_fan_out_scan_fans_small_file_scan(spark):
    """A small single-split parquet scan IS repartitioned to the
    session's default parallelism (the r12 single-task-scan remedy)."""
    import re

    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        fan_out_scan,
        load_table,
    )

    df = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = fan_out_scan(df, "doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert re.search(r"hashpartitioning\(doc_id", plan), plan


def test_size_bytes_parses_spark_unit_suffixes():
    """ADVICE r12 #5: '64m'/'1g' style conf values must parse instead of
    silently falling back to the 128MB default."""
    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        _size_bytes,
    )

    assert _size_bytes("134217728", default=0) == 134217728
    assert _size_bytes("134217728b", default=0) == 134217728
    assert _size_bytes("64m", default=0) == 64 * 1024**2
    assert _size_bytes("64M", default=0) == 64 * 1024**2
    assert _size_bytes("1g", default=0) == 1024**3
    assert _size_bytes("512k", default=0) == 512 * 1024
    assert _size_bytes("not-a-size", default=77) == 77


def test_adopt_lifetime_keeps_wrapped_persists_alive(spark):
    """r13 persist-audit fix: a derived frame holds no Python reference
    to the operator result it wraps, so unpersist_with caches tied to
    that result died at function return, BEFORE the derived frame ever
    executed. adopt_lifetime must keep the wrapped result (and its
    caches) alive exactly until the derived frame is GC'd."""
    from spark_streaming_kafka_bucket_counter_spark.operators._cache import (
        adopt_lifetime,
        unpersist_with,
    )

    def is_cached(df):
        cm = spark._jsparkSession.sharedState().cacheManager()
        return cm.lookupCachedData(df._jdf).isDefined()

    base = spark.createDataFrame([(1,), (2,)], "x long").persist()
    assert is_cached(base)
    op_result = unpersist_with(base.select("x"), base)  # operator return
    wrapped = adopt_lifetime(op_result.selectExpr("x + 1 as y"), op_result)
    del op_result
    gc.collect()
    assert is_cached(base), "adoption must keep the operator result alive"
    del wrapped
    gc.collect()
    assert not is_cached(base), "cache must drain once the wrapper dies"


def test_persist_for_scale_gates_on_input_size(spark, monkeypatch):
    """r13: persists whose subtree is cheap to recompute on a small
    input LOSE locally (the cached plan executes without AQE and pays a
    materialization pass) but save whole corpus passes at scale — so
    persist_for_scale persists iff the source is NOT a provably-small
    file scan, with SPARK_GRAFT_FORCE_PERSIST=1 as the override."""
    from spark_streaming_kafka_bucket_counter_spark.operators._cache import (
        persist_for_scale,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        load_table,
    )

    def is_cached(df):
        cm = spark._jsparkSession.sharedState().cacheManager()
        return cm.lookupCachedData(df._jdf).isDefined()

    small = load_table(spark, SF_DIR, "documents")
    derived = small.select("doc_id")
    out = persist_for_scale(derived, small)
    assert out is derived and not is_cached(out)  # small scan: skipped

    unknown = spark.createDataFrame([(1,)], "x long")  # non-file: persist
    d2 = persist_for_scale(unknown.select("x"), unknown)
    assert is_cached(d2)
    d2.unpersist()

    monkeypatch.setenv("SPARK_GRAFT_FORCE_PERSIST", "1")
    d3 = persist_for_scale(small.select("doc_id", "source"), small)
    assert is_cached(d3)
    d3.unpersist()
