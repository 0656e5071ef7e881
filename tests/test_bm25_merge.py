"""Cross-segment BM25 merge with replay provenance (r8 VERDICT Next #2).

The one unbounded-growth axis left in the serving layer was BM25's
segment count == micro-batch count (SOAK r8: 1,234 live files at
generation 26 vs LSH's 105, IVF's 5). These tests pin the fix:
`bm25_merge_segments` folds all live segments into the base segment in
ONE snapshot, queries are bit-identical across the merge, folded batch
ids live in the snapshot's `bm25_covered_ranges` provenance (merged
[lo, hi] ranges — O(1) regardless of total batch count) so a
checkpoint-rollback replay of a covered batch is a manifest-level
no-op, and the streaming loop's `merge_every` keeps live file count
bounded as batches accumulate.
"""

from __future__ import annotations

import json
import os
import time

from spark_streaming_kafka_bucket_counter_spark.operators.search import (
    BM25_MERGED_SEGMENT,
    bm25_merge_segments,
    bm25_query_index,
    bm25_topk,
    bm25_write_segment,
)
from spark_streaming_kafka_bucket_counter_spark.sources.manifest import (
    gc_index_tree,
    latest_manifest,
    manifest_read,
    scan_parquet_files,
)

_DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry date elderberry fig"),
    (2, "apple apple apple grape"),
    (3, "completely unrelated words here only"),
    (4, "grape fig apple date"),
    (5, "cherry cherry banana words"),
]
_TERM_SETS = (["apple"], ["banana", "cherry"], ["grape", "fig"], ["words"])


def _build_segmented(spark, idx: str, n_segments: int = 3):
    corpus = spark.createDataFrame(_DOCS, "doc_id long, text string")
    for b in range(n_segments):
        bdf = corpus.filter(f"doc_id % {n_segments} = {b}")
        bm25_write_segment(bdf, "doc_id", "text", idx, b, buckets=8)
    return corpus


def _rankings(spark, idx: str):
    return {
        tuple(ts): [
            (r["doc_id"], r["score"], r["rank"])
            for r in bm25_query_index(spark, idx, ts, top_k=10, buckets=8).collect()
        ]
        for ts in _TERM_SETS
    }


def test_merge_is_bit_identical_one_snapshot_and_bounded(spark, tmp_path):
    idx = str(tmp_path / "bm")
    corpus = _build_segmented(spark, idx, 3)
    before = _rankings(spark, idx)
    gen_before = latest_manifest(idx)["generation"]

    assert bm25_merge_segments(spark, idx, grace_sec=0) == 3

    # bit-identical scoring, also vs the single-pass batch operator
    after = _rankings(spark, idx)
    assert after == before
    for ts in _TERM_SETS:
        direct = [
            (r["doc_id"], r["score"], r["rank"])
            for r in bm25_topk(corpus, "doc_id", "text", ts, top_k=10).collect()
        ]
        assert after[tuple(ts)] == direct, ts

    m = latest_manifest(idx)
    # ONE merge snapshot (zero-grace GC published one more to clear
    # the retired set; both carry the provenance)
    assert m["meta"]["bm25_covered_ranges"] == [[0, 2]]
    assert m["generation"] <= gen_before + 2
    # only the merged base segment remains on disk
    segs = {
        f.split("/")[1]
        for f in scan_parquet_files(idx)
        if f.startswith("postings/")
    }
    assert segs == {f"batch_id={BM25_MERGED_SEGMENT}"}

    # merge of an already-merged index is a no-op (no generation bump)
    g = latest_manifest(idx)["generation"]
    assert bm25_merge_segments(spark, idx) == 0
    assert latest_manifest(idx)["generation"] == g


def test_replay_of_covered_batch_is_manifest_noop(spark, tmp_path):
    idx = str(tmp_path / "bm")
    corpus = _build_segmented(spark, idx, 3)
    assert bm25_merge_segments(spark, idx, grace_sec=0) == 3
    before = _rankings(spark, idx)
    g = latest_manifest(idx)["generation"]

    # checkpoint rollback replays batch 1: its rows already live in the
    # base segment — re-writing them would double tf/df/N
    replay = corpus.filter("doc_id % 3 = 1")
    bm25_write_segment(replay, "doc_id", "text", idx, 1, buckets=8)

    assert latest_manifest(idx)["generation"] == g  # nothing published
    assert _rankings(spark, idx) == before
    from pyspark.sql import functions as F

    n = manifest_read(spark, idx, "stats").agg(F.sum("_N")).collect()[0][0]
    assert n == len(_DOCS)

    # an UNCOVERED new batch still folds in normally after the merge
    extra = spark.createDataFrame(
        [(100, "apple brand new words")], "doc_id long, text string"
    )
    bm25_write_segment(extra, "doc_id", "text", idx, 7, buckets=8)
    hits = bm25_query_index(spark, idx, ["apple"], top_k=10, buckets=8).collect()
    assert 100 in {r["doc_id"] for r in hits}


def test_streaming_merge_every_bounds_live_files(spark, tmp_path):
    """8 micro-batches with merge_every=4 + compact_every=4: live BM25
    file count stays bounded by (segments <= merge_every + base) x
    leaves, instead of growing a segment per batch forever — and the
    final index scores identically to the batch operator over the
    union corpus (the VERDICT's 'done' shape for Next #2)."""
    from spark_streaming_kafka_bucket_counter_spark.streaming.pipeline import (
        start_search_index_ingest,
    )

    src = tmp_path / "msrc"
    src.mkdir()
    rows = [
        {"doc_id": i, "text": f"shared tok{i} extra{i % 3} apple"}
        for i in range(8)
    ]
    now = time.time()
    for i, r in enumerate(rows):
        f = src / f"{i:02d}.json"
        f.write_text(json.dumps(r))
        os.utime(f, (now - 80 + 10 * i, now - 80 + 10 * i))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    idx = str(tmp_path / "bm25m")
    q = start_search_index_ingest(
        stream,
        "doc_id",
        "text",
        idx,
        str(tmp_path / "mck"),
        buckets=8,
        merge_every=4,
        compact_every=4,
        gc_grace_sec=0,
    )
    assert q.awaitTermination(300)
    gc_index_tree(idx, grace_sec=0)

    m = latest_manifest(idx)
    segs = {
        f.split("/")[1] for f in m["files"] if f.startswith("postings/")
    }
    # batches 0-3 merged at batch 3, 0-7 merged at batch 7: only base
    assert segs == {f"batch_id={BM25_MERGED_SEGMENT}"}
    assert m["meta"]["bm25_covered_ranges"] == [[0, 7]]
    # bounded: base segment compacted to <= 1 file per (tb) leaf per
    # table + 1 stats file — far under the 8-segments-uncompacted shape
    assert len(m["files"]) <= 2 * 8 + 1

    corpus = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    for ts in (["shared"], ["apple", "extra1"], ["tok3"]):
        via_index = [
            (r["doc_id"], r["score"], r["rank"])
            for r in bm25_query_index(spark, idx, ts, top_k=10, buckets=8).collect()
        ]
        direct = [
            (r["doc_id"], r["score"], r["rank"])
            for r in bm25_topk(corpus, "doc_id", "text", ts, top_k=10).collect()
        ]
        assert via_index == direct, ts


def test_covered_ranges_coalesce_and_legacy_compat():
    """Coverage provenance is O(#ranges), not O(#batches): contiguous
    ids coalesce, gaps stay separate, and pre-r9 snapshots' explicit
    bm25_covered_batches lists are still honored."""
    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        _covered_contains,
        _ranges_add,
    )

    r = _ranges_add([], range(0, 1000))
    assert r == [[0, 999]]
    r = _ranges_add(r, [1000, 1002, 5000])
    assert r == [[0, 1000], [1002, 1002], [5000, 5000]]  # 1001 is a gap
    meta = {"bm25_covered_ranges": r}
    assert _covered_contains(meta, 500) and _covered_contains(meta, 5000)
    assert not _covered_contains(meta, 1001)
    assert not _covered_contains(meta, 1003)
    legacy = {"bm25_covered_batches": [3, 4, 5, 9]}
    assert _covered_contains(legacy, 4) and not _covered_contains(legacy, 6)
    mixed = {"bm25_covered_ranges": [[0, 2]], "bm25_covered_batches": [3]}
    assert _covered_contains(mixed, 3)
