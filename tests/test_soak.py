"""Streaming-ingest SOAK (r6 VERDICT ask #7): the five loops —
near-dup LSH, semantic IVF, BM25 segments, line-level dedup, and the
compressed IVFADC index (r9) — run TOGETHER in one session
over dozens of micro-batches with compaction enabled at five different
cadences, concurrent serving-store queries hammering each live index
from reader threads, a mid-run simulated crash (checkpoint commit
removed on every loop at once), and a restart that must replay
idempotently. Each loop's behavior is individually pytest-pinned
elsewhere; this exercises the COMPOSITION — shared session, four
checkpoints, index compaction under read load — which is where
production breaks.

Long-running and env-gated like the sweep:

    SSBC_SOAK=1 python -m pytest tests/test_soak.py -q     # ~5-10 min

Writes SOAK.json at the repo root (batch counts, reader stats, transient
read errors). Since r8 the LSH/IVF/BM25 indexes are manifest-managed
(sources/manifest.py): readers plan over snapshot-pinned file lists and
compaction retires files through a GC grace window instead of deleting
them, so the pin is ZERO transient read errors on all five readers — no
reader-side retry (r7 VERDICT ask #2). r9's quintet run caught the
line-counts tree's compaction racing its directory-listing reader
(1 FILE_NOT_EXIST in ~360 reads), so that tree is now manifest-managed
like the rest. Ask #6's pin rides along:
after a final zero-grace GC, each index's on-disk file set equals its
manifest exactly (no unbounded accumulation of superseded segments).
"""

from __future__ import annotations

import json
import os
import threading
import time
from pathlib import Path

import pytest

SOAK = os.environ.get("SSBC_SOAK", "")

pytestmark = pytest.mark.skipif(
    not SOAK, reason="set SSBC_SOAK=1 to run the streaming soak (~5-10 min)"
)

N_BATCHES = 24  # per phase half: 12 before the crash, 12 after
DOCS_PER_BATCH = 4
DIM = 8


def _doc_text(i: int) -> str:
    # fully disjoint token sets -> Jaccard 0 across docs: the soak wants
    # every doc to SURVIVE dedup so the invariant is exact-count
    return " ".join(f"tok{i}x{j}" for j in range(8))


def _vec(i: int) -> list[float]:
    import random

    r = random.Random(1000 + i)
    return [r.uniform(-1.0, 1.0) for _ in range(DIM)]


def _write_batches(
    src: Path, rows_per_file: list[list[dict]], start: int = 0
) -> None:
    src.mkdir(parents=True, exist_ok=True)
    now = time.time()
    for k, rows in enumerate(rows_per_file, start=start):
        f = src / f"b{k:03d}.json"
        f.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(f, (now - (len(rows_per_file) + start - k) * 10,) * 2)


def _kill_last_commit(ck: str) -> None:
    commits = sorted(
        int(p.name) for p in (Path(ck) / "commits").iterdir() if p.name.isdigit()
    )
    last = str(commits[-1])
    os.remove(os.path.join(ck, "commits", last))
    crc = os.path.join(ck, "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)


class _Reader(threading.Thread):
    """Poll a serving query against a live index until stopped; count
    successes and transient failures, keep the last error."""

    def __init__(self, name: str, fn) -> None:
        super().__init__(name=name, daemon=True)
        self.fn = fn
        self.ok = 0
        self.transient = 0
        self.last_err: str | None = None
        self._halt = threading.Event()

    def run(self) -> None:
        while not self._halt.is_set():
            try:
                self.fn()
                self.ok += 1
            except Exception as exc:  # mid-swap leaf reads are legal
                self.transient += 1
                self.last_err = f"{type(exc).__name__}: {exc}"[:200]
            time.sleep(0.2)

    def stop(self) -> None:
        self._halt.set()


def test_streaming_quintet_soak(spark, tmp_path):
    from spark_streaming_kafka_bucket_counter_spark.operators.dedup import lsh_query_index
    from spark_streaming_kafka_bucket_counter_spark.operators.pq import ivfpq_query_index
    from spark_streaming_kafka_bucket_counter_spark.sources.manifest import manifest_read
    from spark_streaming_kafka_bucket_counter_spark.operators.search import bm25_query_index
    from spark_streaming_kafka_bucket_counter_spark.operators.similarity import ivf_query_index
    from spark_streaming_kafka_bucket_counter_spark.streaming.pipeline import (
        start_ivfpq_ingest,
        start_line_dedup_ingest,
        start_near_dup_ingest,
        start_search_index_ingest,
        start_semantic_dedup_ingest,
    )

    t_start = time.time()
    doc_src = tmp_path / "docs"
    vec_src = tmp_path / "vecs"
    all_doc_rows = [
        [
            {"doc_id": b * DOCS_PER_BATCH + j, "text": _doc_text(b * DOCS_PER_BATCH + j)}
            for j in range(DOCS_PER_BATCH)
        ]
        for b in range(N_BATCHES)
    ]
    all_vec_rows = [
        [
            {"vec_id": b * DOCS_PER_BATCH + j, "embedding": _vec(b * DOCS_PER_BATCH + j)}
            for j in range(DOCS_PER_BATCH)
        ]
        for b in range(N_BATCHES)
    ]
    half = N_BATCHES // 2
    _write_batches(doc_src, all_doc_rows[:half])
    _write_batches(vec_src, all_vec_rows[:half])

    lsh_idx = str(tmp_path / "lsh_idx")
    lsh_out = str(tmp_path / "lsh_out")
    lsh_ck = str(tmp_path / "lsh_ck")
    ivf_idx = str(tmp_path / "ivf_idx")
    ivf_out = str(tmp_path / "ivf_out")
    ivf_ck = str(tmp_path / "ivf_ck")
    bm_idx = str(tmp_path / "bm_idx")
    bm_ck = str(tmp_path / "bm_ck")
    ld_idx = str(tmp_path / "ld_idx")
    ld_out = str(tmp_path / "ld_out")
    ld_ck = str(tmp_path / "ld_ck")
    pq_idx = str(tmp_path / "pq_idx")
    pq_ck = str(tmp_path / "pq_ck")

    def _doc_stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(doc_src))
        )

    def _vec_stream():
        return (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .json(str(vec_src))
        )

    # grace far above any single reader query's lifetime (~1-2 s) but
    # small enough that GC actually collects superseded files DURING
    # the ~4-5 min soak, proving steady-state boundedness under load
    GRACE = 30.0

    def _start_all():
        # four loops, four checkpoints, one session; compaction at
        # four DIFFERENT cadences so swaps interleave with queries
        q1 = start_near_dup_ingest(
            _doc_stream(), "doc_id", "text", lsh_idx, lsh_out, lsh_ck,
            compact_every=3, gc_grace_sec=GRACE,
        )
        q2 = start_semantic_dedup_ingest(
            _vec_stream(), "vec_id", "embedding", ivf_idx, ivf_out, ivf_ck,
            compact_every=4, gc_grace_sec=GRACE,
        )
        q3 = start_search_index_ingest(
            _doc_stream(), "doc_id", "text", bm_idx, bm_ck,
            compact_every=5, merge_every=8, gc_grace_sec=GRACE,
        )
        q4 = start_line_dedup_ingest(
            _doc_stream(), "doc_id", "text", ld_idx, ld_out, ld_ck,
            compact_every=6, gc_grace_sec=GRACE,
        )
        # the compressed serving index (r9): bootstrap model trains on
        # the first 4-vector batch (ksub = n_centroids = 4).
        # cell_iters > 0 (r11, VERDICT r10 ask #5): the soak pins the
        # TRAINED-CELL layout (v2+: k-means coarse quantizer, persisted
        # metric) that now serves, not the r9 seed-cell layout.
        q5 = start_ivfpq_ingest(
            _vec_stream(), "vec_id", "embedding", pq_idx, pq_ck,
            dim=DIM, m=4, ksub=4, n_centroids=4, cell_iters=2,
            compact_every=7, gc_grace_sec=GRACE,
        )
        return [q1, q2, q3, q4, q5]

    # ---- phase 1: first half, all four live, readers hammering ----
    queries = _start_all()
    probe_doc = spark.createDataFrame(
        [(9_000_000, _doc_text(1))], "doc_id long, text string"
    )
    probe_vec = spark.createDataFrame(
        [(9_000_000, _vec(2))], "vec_id long, embedding array<float>"
    )
    readers = [
        _Reader("lsh", lambda: lsh_query_index(spark, lsh_idx, probe_doc, "doc_id", "text").collect()),
        _Reader("ivf", lambda: ivf_query_index(spark, ivf_idx, probe_vec, "vec_id", "embedding", top_k=1).collect()),
        _Reader("bm25", lambda: bm25_query_index(spark, bm_idx, ["tok5x0", "tok5x1"], top_k=1).collect()),
        _Reader("linecounts", lambda: manifest_read(
            spark, ld_idx, "line_counts"
        ).groupBy().sum("n_occ").collect()),
        # nprobe=None (r12, VERDICT r11 ask #6): the soak pins the
        # SERVING DEFAULT path — every query reads the persisted
        # default_nprobe out of the pinned snapshot's meta/ table while
        # maintenance/GC/forget churn underneath — not an explicit knob
        _Reader("ivfpq", lambda: ivfpq_query_index(
            spark, pq_idx, probe_vec, "vec_id", "embedding",
            DIM, m=4, ksub=4, nprobe=None, top_k=1,
        ).collect()),
    ]
    # start each reader only once its index EXISTS (first snapshot
    # published / first line-count segment landed): an
    # index-not-yet-created error is a bootstrap-ordering artifact, not
    # the maintenance-vs-reader race this soak pins at zero
    deadline = time.time() + 120
    # wait for each index's FIRST PUBLISHED SNAPSHOT (a v*.json), not
    # the _manifest dir: the maintainer lease creates the dir at txn
    # ENTRY, long before the bootstrap's writes complete — a reader
    # starting in that window dir-falls-back onto half-written subtrees
    # (the quintet soak caught exactly this on the ivfpq bootstrap)
    waiting = {
        "lsh": Path(lsh_idx) / "_manifest",
        "ivf": Path(ivf_idx) / "_manifest",
        "bm25": Path(bm_idx) / "_manifest",
        "linecounts": Path(ld_idx) / "_manifest",
        "ivfpq": Path(pq_idx) / "_manifest",
    }
    while waiting and time.time() < deadline:
        waiting = {
            k: p for k, p in waiting.items() if not list(p.glob("v*.json"))
        }
        time.sleep(0.5)
    assert not waiting, f"indexes never published: {sorted(waiting)}"
    for r in readers:
        r.start()
    for q in queries:
        assert q.awaitTermination(1200)

    # ---- simulated crash on ALL FOUR checkpoints at once ----
    for ck in (lsh_ck, ivf_ck, bm_ck, ld_ck, pq_ck):
        _kill_last_commit(ck)

    # ---- phase 2: second half lands, restart replays + continues ----
    _write_batches(doc_src, all_doc_rows[half:], start=half)
    _write_batches(vec_src, all_vec_rows[half:], start=half)
    queries = _start_all()
    for q in queries:
        assert q.awaitTermination(1200)
    for r in readers:
        r.stop()
    for r in readers:
        r.join(30)

    # ---- invariants ----
    n_ids = N_BATCHES * DOCS_PER_BATCH
    curated = spark.read.parquet(lsh_out).collect()
    got_docs = sorted(r["doc_id"] for r in curated)
    assert got_docs == list(range(n_ids)), "LSH curated rows: exactly-once"
    curated_v = spark.read.parquet(ivf_out).collect()
    got_vecs = sorted(r["vec_id"] for r in curated_v)
    assert got_vecs == list(range(n_ids)), "IVF curated rows: exactly-once"
    cleaned = spark.read.parquet(ld_out).collect()
    got_ld = sorted(r["doc_id"] for r in cleaned)
    assert got_ld == list(range(n_ids)), "line-dedup rows: exactly-once"
    # all lines are doc-unique here: nothing may be removed, and the
    # replayed batch's count segment must have been REPLACED not doubled
    assert all(r["n_removed"] == 0 for r in cleaned)
    seg_tot = (
        manifest_read(spark, ld_idx, "line_counts")
        .groupBy("line").sum("n_occ").collect()
    )
    assert all(r["sum(n_occ)"] == 1 for r in seg_tot)

    # serving answers are exact after the dust settles
    hits = lsh_query_index(spark, lsh_idx, probe_doc, "doc_id", "text").collect()
    assert {r["snap_doc"] for r in hits} == {1}
    top = ivf_query_index(spark, ivf_idx, probe_vec, "vec_id", "embedding", top_k=1).collect()[0]
    assert top["cand_id"] == 2 and top["cosine"] >= 0.999999
    bm_top = bm25_query_index(spark, bm_idx, ["tok5x0", "tok5x1"], top_k=1).collect()
    assert bm_top and bm_top[0]["doc_id"] == 5

    # BM25 segments: replay REPLACED (not duplicated) the killed batch —
    # additive stats would be silently corrupted otherwise. Every doc
    # indexed exactly once => its unique token hits exactly one doc.
    for probe_id in (0, 7, n_ids - 1):
        rows = bm25_query_index(spark, bm_idx, [f"tok{probe_id}x3"], top_k=5).collect()
        assert [r["doc_id"] for r in rows] == [probe_id]

    # index file sets are BOUNDED (r7 ask #6): a final zero-grace GC
    # converges every manifest-managed tree to exactly its live files —
    # superseded compaction/replay generations do not accumulate
    from spark_streaming_kafka_bucket_counter_spark.sources.manifest import (
        gc_index_tree,
        latest_manifest,
        scan_parquet_files,
    )

    gc_report = {}
    for name, idx in (("lsh", lsh_idx), ("ivf", ivf_idx), ("bm25", bm_idx),
                      ("ivfpq", pq_idx), ("linecounts", ld_idx)):
        gc_index_tree(idx, grace_sec=0)
        m = latest_manifest(idx)
        on_disk = scan_parquet_files(idx)
        assert on_disk == set(m["files"]), (
            f"{name}: {len(on_disk)} files on disk vs {len(m['files'])} live"
        )
        assert not m["retired"]
        gc_report[name] = {"live_files": len(m["files"]), "generation": m["generation"]}

    # BM25 live file count is BOUNDED by the term-bucket constant, not
    # by batch count (r8 VERDICT Next #2: segment count used to equal
    # micro-batch count — SOAK r8 measured 1,234 live files at 24
    # batches). merge_every=8 folds segments into the base; the final
    # merge fires on the last batch, so after GC at most the base
    # segment remains: <= buckets postings leaves + buckets dfreq
    # leaves + 1 stats file (compaction holds each leaf at 1 file).
    assert gc_report["bm25"]["live_files"] <= 2 * 64 + 1, gc_report["bm25"]

    # IVFADC: replay double-appends code rows by design (query-time
    # dedup); the INVARIANTS are (a) every ingested id is servable —
    # distinct ids in the cells == all ids — and (b) the live file set
    # is bounded by cells x compaction cadence (+ 3 metadata files:
    # centroids, codebook, meta since layout v3), NOT by total batch
    # count: compact_every=7 leaves at most 6 post-compaction appends
    # per cell in flight at any moment
    pq_cells = spark.read.parquet(os.path.join(pq_idx, "cells"))
    assert pq_cells.select("id").distinct().count() == n_ids
    assert gc_report["ivfpq"]["live_files"] <= 4 * 7 + 3, gc_report["ivfpq"]
    # trained-cell layout actually serves (r11): persisted metric is the
    # layout-v2+ k-means form, not the seed-cosine fallback
    pq_cents = spark.read.parquet(os.path.join(pq_idx, "centroids")).collect()
    assert all(r["metric"] == "l2e6" for r in pq_cents)
    pq_top = ivfpq_query_index(
        spark, pq_idx, probe_vec, "vec_id", "embedding", DIM, m=4, ksub=4, top_k=3
    ).collect()
    ids = [r["cand_id"] for r in pq_top]
    assert len(ids) == 3 and len(set(ids)) == 3  # replay copies deduped

    # readers: zero transients is the r8 contract (manifest-pinned
    # reads; retired files outlive every pinned snapshot's grace window)
    report = {
        "n_batches": N_BATCHES,
        "docs": n_ids,
        "elapsed_sec": round(time.time() - t_start, 1),
        "readers": {
            r.name: {"ok": r.ok, "transient": r.transient, "last_err": r.last_err}
            for r in readers
        },
        "index_files_after_gc": gc_report,
    }
    Path(__file__).resolve().parent.parent.joinpath("SOAK.json").write_text(
        json.dumps(report, indent=1) + "\n"
    )
    for r in readers:
        assert r.ok >= 5, f"reader {r.name} starved: {r.last_err}"
        assert r.transient == 0, (
            f"reader {r.name}: {r.transient} transient errors "
            f"(manifest reads must never race maintenance) last={r.last_err}"
        )
