"""Right-to-be-forgotten across the serving indexes (round 8): row
deletes rewrite only the files containing the ids, publish as one
manifest snapshot (pinned readers finish untouched), and after the
forget the index answers bit-identically to one that never held the
docs — including BM25, whose additive dfreq/stats must be re-derived
per affected segment or every idf/avgdl silently corrupts."""

from __future__ import annotations

import pytest

from spark_streaming_kafka_bucket_counter_spark.sources.manifest import (
    gc_index_tree,
    latest_manifest,
    manifest_read,
    scan_parquet_files,
)


def _text(i: int) -> str:
    return " ".join(f"tok{i}x{j}" for j in range(8))


def test_lsh_forget_removes_all_trace(spark, tmp_path):
    from spark_streaming_kafka_bucket_counter_spark.operators.dedup import (
        lsh_build_index,
        lsh_forget,
        lsh_query_index,
    )

    idx = str(tmp_path / "lsh")
    docs = spark.createDataFrame(
        [(i, _text(i)) for i in range(30)], "doc_id long, text string"
    )
    lsh_build_index(docs, "doc_id", "text", idx)
    probe7 = spark.createDataFrame([(900, _text(7))], "doc_id long, text string")
    probe9 = spark.createDataFrame([(901, _text(9))], "doc_id long, text string")
    assert {r["snap_doc"] for r in lsh_query_index(spark, idx, probe7, "doc_id", "text").collect()} == {7}

    # pinned reader planned BEFORE the forget
    pinned = lsh_query_index(spark, idx, probe7, "doc_id", "text")
    assert lsh_forget(spark, idx, [7]) > 0
    assert [r["snap_doc"] for r in pinned.collect()] == [7]  # grace window

    # post-forget: no trace of doc 7, unrelated probes unchanged
    assert lsh_query_index(spark, idx, probe7, "doc_id", "text").count() == 0
    assert {r["snap_doc"] for r in lsh_query_index(spark, idx, probe9, "doc_id", "text").collect()} == {9}
    # no row for the id anywhere in the live snapshot
    snap = latest_manifest(idx)
    for sub in ("bands", "shingles"):
        assert manifest_read(spark, idx, sub, snapshot=snap).filter("doc = 7").count() == 0
    # GC erases the bytes; disk == manifest
    gc_index_tree(idx, grace_sec=0)
    m = latest_manifest(idx)
    assert scan_parquet_files(idx) == set(m["files"]) and not m["retired"]


def test_ivf_forget_matches_never_indexed(spark, tmp_path):
    from spark_streaming_kafka_bucket_counter_spark.operators.similarity import (
        ivf_build_index,
        ivf_forget,
        ivf_query_index,
    )

    def vec(i):
        return [1.0, float(i), float((i * i) % 7), 1.0]

    all_rows = [(i, vec(i)) for i in range(16)] + [(100, vec(5)), (101, vec(9))]
    emb = spark.createDataFrame(all_rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ivf")
    ivf_build_index(emb, "vec_id", "embedding", idx, n_centroids=16)

    q = spark.createDataFrame([(900, vec(5))], "vec_id long, embedding array<float>")
    before = ivf_query_index(spark, idx, q, "vec_id", "embedding", top_k=3).collect()
    assert 100 in {r["cand_id"] for r in before}

    assert ivf_forget(spark, idx, [100]) > 0
    after = ivf_query_index(spark, idx, q, "vec_id", "embedding", top_k=3).collect()
    assert 100 not in {r["cand_id"] for r in after}

    # bit-identical to an index that never saw id 100 (same seed
    # centroids: ids < 16 are all present in both corpora)
    idx2 = str(tmp_path / "ivf2")
    ivf_build_index(
        emb.filter("vec_id <> 100"), "vec_id", "embedding", idx2, n_centroids=16
    )
    want = ivf_query_index(spark, idx2, q, "vec_id", "embedding", top_k=3).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in want]


def test_bm25_forget_rederives_segment_stats(spark, tmp_path):
    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        bm25_forget,
        bm25_query_index,
        bm25_write_segment,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"shared word{'x' * (i % 3)} tok{i}") for i in range(12)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm")
    bm25_write_segment(docs.filter("doc_id < 6"), "doc_id", "text", idx, 0)
    bm25_write_segment(docs.filter("doc_id >= 6"), "doc_id", "text", idx, 1)

    forgotten = [2, 3, 7]
    assert bm25_forget(spark, idx, forgotten) > 0

    # bit-identical scores vs segments BUILT from the remaining docs
    idx2 = str(tmp_path / "bm2")
    keep = docs.filter(~F.col("doc_id").isin(forgotten))
    bm25_write_segment(keep.filter("doc_id < 6"), "doc_id", "text", idx2, 0)
    bm25_write_segment(keep.filter("doc_id >= 6"), "doc_id", "text", idx2, 1)
    for terms in (["shared"], ["tok4"], ["tok2"], ["shared", "word"]):
        got = [tuple(r) for r in bm25_query_index(spark, idx, terms, top_k=12).collect()]
        want = [tuple(r) for r in bm25_query_index(spark, idx2, terms, top_k=12).collect()]
        assert got == want, terms
        assert not ({2, 3, 7} & {r[0] for r in got}), terms

    # stats really shrank (N counts only remaining docs)
    n = manifest_read(spark, idx, "stats").agg(F.sum("_N")).collect()[0][0]
    assert n == 9

    # forgetting EVERY doc of a segment empties it cleanly
    assert bm25_forget(spark, idx, [0, 1, 4, 5]) > 0
    rows = bm25_query_index(spark, idx, ["shared"], top_k=12).collect()
    assert {r["doc_id"] for r in rows} == {6, 8, 9, 10, 11}
    gc_index_tree(idx, grace_sec=0)
    m = latest_manifest(idx)
    assert scan_parquet_files(idx) == set(m["files"]) and not m["retired"]


def test_forget_noop_on_absent_ids(spark, tmp_path):
    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        bm25_forget,
        bm25_write_segment,
    )

    docs = spark.createDataFrame(
        [(i, _text(i)) for i in range(4)], "doc_id long, text string"
    )
    idx = str(tmp_path / "bm")
    bm25_write_segment(docs, "doc_id", "text", idx, 0)
    g = latest_manifest(idx)["generation"]
    assert bm25_forget(spark, idx, [999]) == 0
    assert latest_manifest(idx)["generation"] == g  # nothing published

def test_bm25_forget_publishes_one_snapshot(spark, tmp_path):
    """r8 ADVICE #4: the postings drop and every affected segment's
    stats/dfreq re-derivation land in ONE published generation — a
    reader resolving latest_manifest at any moment gets either the full
    pre-forget index or the full post-forget index, never post-forget
    postings with pre-forget df/N/avgdl."""
    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        bm25_forget,
        bm25_write_segment,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.manifest import (
        latest_manifest,
    )

    idx = str(tmp_path / "bm")
    docs = spark.createDataFrame(
        [(i, f"shared tok{i} extra{i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    bm25_write_segment(docs.filter("doc_id < 6"), "doc_id", "text", idx, 0)
    bm25_write_segment(docs.filter("doc_id >= 6"), "doc_id", "text", idx, 1)
    gen_before = latest_manifest(idx)["generation"]

    # forget spans BOTH segments: two postings rewrites + two stats and
    # dfreq re-derivations, still exactly one new generation (default
    # grace keeps GC from publishing a second)
    assert bm25_forget(spark, idx, [2, 8]) > 0
    m = latest_manifest(idx)
    assert m["generation"] == gen_before + 1
    # the one snapshot carries BOTH sides of the mutation: no live
    # postings for the forgotten ids AND re-derived aggregate files
    assert any(f.startswith("stats/") for f in m["files"])
    assert any(f.startswith("dfreq/") for f in m["files"])


def test_bm25_forget_mid_flight_readers_see_pre_state(spark, tmp_path):
    """r9 VERDICT #6, the interleaved-reader property: latest_manifest
    resolved at EVERY intermediate point of a multi-segment forget (each
    per-segment replace, each file retire) returns the untouched
    pre-forget snapshot — the mutation is invisible until the single
    commit, so no reader can mix post-forget postings with pre-forget
    aggregates."""
    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        bm25_forget,
        bm25_query_index,
        bm25_write_segment,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources import manifest as MF

    from pyspark.sql import functions as F

    idx = str(tmp_path / "bm2")
    docs = spark.createDataFrame(
        [(i, f"shared tok{i} extra{i % 3}") for i in range(18)],
        "doc_id long, text string",
    )
    for b in range(3):
        bm25_write_segment(
            docs.filter((F.col("doc_id") % 3) == b), "doc_id", "text", idx, b
        )
    pre = MF.latest_manifest(idx)
    pre_hits = bm25_query_index(spark, idx, "shared", top_k=18).collect()

    observed = []
    real_replace = MF.ManifestTxnHandle.replace
    real_retire = MF.ManifestTxnHandle.retire

    def spy_replace(self, *a, **k):
        observed.append(MF.latest_manifest(idx))
        return real_replace(self, *a, **k)

    def spy_retire(self, *a, **k):
        observed.append(MF.latest_manifest(idx))
        return real_retire(self, *a, **k)

    MF.ManifestTxnHandle.replace = spy_replace
    MF.ManifestTxnHandle.retire = spy_retire
    try:
        # forget spans all three segments
        assert bm25_forget(spark, idx, [3, 4, 5]) > 0
    finally:
        MF.ManifestTxnHandle.replace = real_replace
        MF.ManifestTxnHandle.retire = real_retire

    assert len(observed) >= 3  # the spy actually interleaved
    for m in observed:
        assert m["generation"] == pre["generation"]
        assert sorted(m["files"]) == sorted(pre["files"])
    post = MF.latest_manifest(idx)
    assert post["generation"] == pre["generation"] + 1
    post_hits = bm25_query_index(spark, idx, "shared", top_k=18).collect()
    assert {r["doc_id"] for r in post_hits} == (
        {r["doc_id"] for r in pre_hits} - {3, 4, 5}
    )
