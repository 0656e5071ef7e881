"""Semantic tests for deterministic sampling and IVF approximate search
(the properties the oracle hash-match can't express: stability, recall)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.operators import sampling as SP
from spark_streaming_kafka_bucket_counter_spark.operators import similarity as S
from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
from tests.conftest import SF_DIR


def test_split_is_stable_under_repartition(spark):
    """The whole point vs sample(): membership must not depend on physical
    layout."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    a = SP.with_split(docs, "doc_id").select("doc_id", "split")
    b = SP.with_split(docs.repartition(7), "doc_id").select("doc_id", "split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_partitions_and_rate(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    n = docs.count()
    lab = SP.with_split(docs, "doc_id", train_pct=90)
    counts = dict(lab.groupBy("split").count().collect())
    assert counts.get("train", 0) + counts.get("eval", 0) == n
    # hash buckets are ~uniform; 90/10 within a generous tolerance
    assert 0.8 * n <= counts.get("train", 0) <= 0.97 * n


def test_different_salts_give_different_samples(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    s1 = {r[0] for r in SP.sample_fraction(docs, "doc_id", 50, salt="a").collect()}
    s2 = {r[0] for r in SP.sample_fraction(docs, "doc_id", 50, salt="b").collect()}
    assert s1 != s2  # independent hash families


def test_stratified_rates_respected(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    out = SP.stratified_sample(docs, "doc_id", "lang", {"zh": 100}, default_pct=0)
    got = out.groupBy("lang").count().collect()
    assert {r["lang"] for r in got} == {"zh"}
    assert got[0]["count"] == docs.filter(F.col("lang") == "zh").count()


def test_ivf_results_subset_of_brute_force_candidates(spark):
    """Every IVF hit must be a real vector with the exact brute-force
    cosine; recall over the true top-5 should be substantial."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = S.cosine_topk(
        emb, "vec_id", "embedding", query_df=emb.filter(F.col("vec_id") < 10), top_k=5
    )
    approx = S.ivf_topk(
        emb, "vec_id", "embedding", query_ids_below=10, n_centroids=16, nprobe=2
    )
    ex = {(r["query_id"], r["cand_id"]): r["cosine"] for r in exact.collect()}
    ap = {(r["query_id"], r["cand_id"]): r["cosine"] for r in approx.collect()}
    # scores agree exactly where pairs overlap (same math, same rounding)
    overlap = set(ex) & set(ap)
    assert all(ex[p] == ap[p] for p in overlap)
    assert len(overlap) / len(ex) >= 0.3  # recall floor for nprobe=2/16 cells


def test_ivf_persisted_index_matches_direct(spark, tmp_path):
    from spark_streaming_kafka_bucket_counter_spark.operators.similarity import (
        ivf_build_index,
        ivf_query_index,
        ivf_topk,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "ivf_idx")
    ivf_build_index(emb, "vec_id", "embedding", idx, n_centroids=16)

    queries = emb.filter("vec_id < 5")
    via_index = ivf_query_index(
        spark, idx, queries, "vec_id", "embedding", nprobe=2, top_k=5
    )
    direct = ivf_topk(
        emb, "vec_id", "embedding", query_ids_below=5,
        n_centroids=16, nprobe=2, top_k=5,
    )
    a = {(r["query_id"], r["rank"]): (r["cand_id"], r["cosine"]) for r in via_index.collect()}
    b = {(r["query_id"], r["rank"]): (r["cand_id"], r["cosine"]) for r in direct.collect()}
    assert a == b and len(a) == 25

    # the probe join must prune cell partitions: the cells scan carries
    # a partition filter on cid (the point of the layout)
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cid" in plan or "dynamicpruning" in plan


def test_bm25_persisted_index_matches_direct(spark, tmp_path):
    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        bm25_build_index,
        bm25_query_index,
        bm25_topk,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    idx = str(tmp_path / "bm25_idx")
    bm25_build_index(docs, "doc_id", "text", idx, buckets=64)

    terms = ["data", "model", "training"]
    via_index = bm25_query_index(spark, idx, terms, top_k=10)
    direct = bm25_topk(docs, "doc_id", "text", terms, top_k=10)
    a = [(r["doc_id"], r["score"], r["rank"]) for r in via_index.collect()]
    b = [(r["doc_id"], r["score"], r["rank"]) for r in direct.collect()]
    assert a == b and len(a) == 10

    # the postings scan must prune term-bucket partitions AND push the
    # term predicate into the parquet scan
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [tb#" in plan.replace("PartitionFilters: [tb IN", "PartitionFilters: [tb#") or "tb IN" in plan
    assert "PushedFilters" in plan and "term" in plan


def test_ivf_append_index_equals_full_rebuild(spark, tmp_path):
    """build(half) + append(other half) must probe identically to
    build(full) — the IVF leg of the incremental-index contract. The
    first batch carries all seed-centroid ids so both indexes share the
    same cell geometry."""
    from spark_streaming_kafka_bucket_counter_spark.operators.similarity import (
        ivf_append_index,
        ivf_build_index,
        ivf_query_index,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    first = emb.filter("vec_id % 2 = 0 OR vec_id < 16")
    second = emb.subtract(first)
    p_inc = str(tmp_path / "ivf_inc")
    p_full = str(tmp_path / "ivf_full")
    ivf_build_index(first, "vec_id", "embedding", p_inc, n_centroids=16)
    ivf_append_index(spark, second, "vec_id", "embedding", p_inc)
    ivf_build_index(emb, "vec_id", "embedding", p_full, n_centroids=16)
    queries = emb.filter("vec_id < 5")
    a = {
        tuple(r)
        for r in ivf_query_index(
            spark, p_inc, queries, "vec_id", "embedding", nprobe=2, top_k=5
        ).collect()
    }
    b = {
        tuple(r)
        for r in ivf_query_index(
            spark, p_full, queries, "vec_id", "embedding", nprobe=2, top_k=5
        ).collect()
    }
    assert a == b and len(a) == 25


def test_bm25_append_index_equals_full_rebuild(spark, tmp_path):
    """build(half) + append(other half) must score identically to
    build(full): per-segment dfreq and corpus-stats rows are summed at
    read time, and both df and (N, sum dl) are additive over disjoint
    doc sets — so even the idf values match bit-for-bit."""
    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        bm25_append_index,
        bm25_build_index,
        bm25_query_index,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    first = docs.filter("doc_id % 2 = 0")
    second = docs.filter("doc_id % 2 = 1")
    p_inc = str(tmp_path / "bm25_inc")
    p_full = str(tmp_path / "bm25_full")
    bm25_build_index(first, "doc_id", "text", p_inc, buckets=64)
    bm25_append_index(second, "doc_id", "text", p_inc, buckets=64)
    bm25_build_index(docs, "doc_id", "text", p_full, buckets=64)
    terms = ["data", "model", "training"]
    a = [
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_query_index(spark, p_inc, terms, top_k=10).collect()
    ]
    b = [
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_query_index(spark, p_full, terms, top_k=10).collect()
    ]
    assert a == b and len(a) == 10


def test_bm25_query_index_many_matches_single_query_loop(spark, tmp_path):
    """One batched plan over the index must rank every query exactly as
    the single-query serving path does (same scoring, same ties), while
    reading the postings once for the whole batch."""
    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        bm25_build_index,
        bm25_query_index,
        bm25_query_index_many,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    idx = str(tmp_path / "bm25_many")
    bm25_build_index(docs, "doc_id", "text", idx, buckets=64)
    batches = {
        1: ["data", "model", "training"],
        2: ["the", "Data"],  # mixed case -> lowercased like the single path
        3: ["zzznotaterm"],  # no postings -> no rows for this query
    }
    qdf = spark.createDataFrame(
        [(qid, ts) for qid, ts in batches.items()],
        "query_id long, terms array<string>",
    )
    batched = bm25_query_index_many(spark, qdf, idx, top_k=7)
    # the batch's term union must still prune postings partitions and
    # push the term predicate — one pruned scan for the WHOLE batch
    plan = batched._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [tb#" in plan.replace(
        "PartitionFilters: [tb IN", "PartitionFilters: [tb#"
    ) or "tb IN" in plan
    assert "PushedFilters" in plan and "term" in plan
    got = {}
    for r in batched.collect():
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"], r["rank"]))
    for qid in got:
        got[qid].sort(key=lambda x: x[2])
    for qid, terms in batches.items():
        single = [
            (r["doc_id"], r["score"], r["rank"])
            for r in bm25_query_index(spark, idx, terms, top_k=7).collect()
        ]
        assert got.get(qid, []) == single, qid
    assert 3 not in got  # unseen term -> empty result, not an error


def test_compact_index_tree_preserves_index_answers(spark, tmp_path):
    """Manifest-aware compaction (r7 VERDICT ask #2): after several
    appends, compaction shrinks every multi-file leaf to one LIVE file
    in the snapshot while query results stay bit-identical; the
    displaced files remain on disk (retired) through the grace window
    and a zero-grace GC converges disk to exactly the manifest. Crash
    debris — an unpublished orphan file and an interrupted staging dir
    — is never adopted into a snapshot and is swept by GC."""
    import os
    import shutil

    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        bm25_append_index,
        bm25_build_index,
        bm25_query_index,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
    from spark_streaming_kafka_bucket_counter_spark.sources.manifest import (
        compact_index_tree,
        gc_index_tree,
        latest_manifest,
        scan_parquet_files,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    idx = str(tmp_path / "bm25_c")
    bm25_build_index(docs.filter("doc_id % 3 = 0"), "doc_id", "text", idx)
    bm25_append_index(docs.filter("doc_id % 3 = 1"), "doc_id", "text", idx)
    bm25_append_index(docs.filter("doc_id % 3 = 2"), "doc_id", "text", idx)
    terms = ["data", "model", "training"]
    before = [tuple(r) for r in bm25_query_index(spark, idx, terms, top_k=10).collect()]

    m0 = latest_manifest(idx)
    by_leaf: dict[str, int] = {}
    for f in m0["files"]:
        by_leaf[os.path.dirname(f)] = by_leaf.get(os.path.dirname(f), 0) + 1
    assert any(n > 1 for n in by_leaf.values()), "appends -> multi-file leaves"

    n = compact_index_tree(spark, idx, grace_sec=3600)
    assert n >= sum(1 for v in by_leaf.values() if v > 1)
    m1 = latest_manifest(idx)
    for f in m1["files"]:
        assert (
            sum(1 for g in m1["files"] if os.path.dirname(g) == os.path.dirname(f))
            == 1
        )
    # displaced files retired, still on disk for pinned readers
    assert m1["retired"] and set(m1["retired"]).issubset(scan_parquet_files(idx))
    after = [tuple(r) for r in bm25_query_index(spark, idx, terms, top_k=10).collect()]
    assert after == before

    # crash debris: (a) an unpublished orphan (a write that died before
    # its commit) — copy a live file under a new name; (b) a staging
    # dir from a compaction that died before its publish. Neither may
    # change answers, and GC sweeps both.
    live0 = m1["files"][0]
    orphan = os.path.join(
        os.path.dirname(live0), "part-99999-deadbeef.c000.snappy.parquet"
    )
    shutil.copyfile(os.path.join(idx, live0), os.path.join(idx, orphan))
    os.makedirs(os.path.join(idx, "_compactstage_dead"), exist_ok=True)
    assert [
        tuple(r) for r in bm25_query_index(spark, idx, terms, top_k=10).collect()
    ] == before

    gc_index_tree(idx, grace_sec=0)
    m2 = latest_manifest(idx)
    assert not m2["retired"]
    assert scan_parquet_files(idx) == set(m2["files"])  # orphan swept too
    assert not os.path.isdir(os.path.join(idx, "_compactstage_dead"))
    assert [
        tuple(r) for r in bm25_query_index(spark, idx, terms, top_k=10).collect()
    ] == before


def test_term_bucket_python_matches_spark(spark):
    """bm25_query_index prunes partitions with a PURE-PYTHON md5 bucket
    (no Spark job per serving query) — it must equal the Column recipe
    used at build time for every term, or pruning would read the wrong
    partitions and silently drop postings."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        _term_bucket,
        _term_bucket_py,
    )

    terms = ["data", "model", "training", "zebra", "ünïcode", "日本語", "x"]
    for buckets in (64, 17):
        spark_side = {
            r["t"]: r["tb"]
            for r in spark.createDataFrame([(t,) for t in terms], "t string")
            .select("t", _term_bucket(F.col("t"), buckets).alias("tb"))
            .collect()
        }
        for t in terms:
            assert _term_bucket_py(t, buckets) == spark_side[t], (t, buckets)


def test_kmeans_lloyd_separates_obvious_clusters(spark):
    """Two well-separated blobs with k=2 must land in distinct clusters
    with the right sizes; centroids are the exact fixed-point means;
    k > n and iters < 1 are rejected."""
    import pytest

    from spark_streaming_kafka_bucket_counter_spark.operators.clustering import (
        kmeans_lloyd,
    )

    rows = [(i, [10.0, 10.0]) for i in range(3)] + [
        (i, [-10.0, -10.0]) for i in range(3, 8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, "vec_id", "embedding", k=2, iters=2).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], {})[r["dim"]] = (r["n"], r["centroid_e6"])
    assert len(by_cluster) == 2
    sizes = sorted(c[0][0] for c in by_cluster.values())
    assert sizes == [3, 5]
    cents = sorted(c[0][1] for c in by_cluster.values())
    assert cents == [-10_000_000, 10_000_000]

    with pytest.raises(ValueError):
        kmeans_lloyd(df, "vec_id", "embedding", k=100, iters=1)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, "vec_id", "embedding", k=2, iters=0)


def test_group_split_users_are_disjoint(spark):
    """Grouped split: a user's events must NEVER straddle train/eval —
    the leakage invariant behind sample_group_split."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_bucket_counter_spark.operators.sampling import with_split

    rows = [(u, e) for u in range(40) for e in range(5)]
    df = spark.createDataFrame(rows, "user_id long, event_id long")
    tagged = with_split(df, "user_id", train_pct=50)
    per_user = tagged.groupBy("user_id").agg(
        F.count_distinct("split").alias("n_splits")
    )
    assert all(r["n_splits"] == 1 for r in per_user.collect())
    splits = {r["split"] for r in tagged.select("split").distinct().collect()}
    assert splits == {"train", "eval"}


def test_winsorize_clamps_to_sketch_cutoffs(spark):
    """Winsorized values must lie inside the per-group cutoff band,
    interior values pass through untouched, and extremes are clipped."""
    from spark_streaming_kafka_bucket_counter_spark.operators.sketches import (
        winsorize_by_histogram,
    )

    rows = [(i, "a", float(i)) for i in range(100)]  # uniform 0..99
    df = spark.createDataFrame(rows, "id long, g string, value double")
    out = {
        r["id"]: r
        for r in winsorize_by_histogram(
            df, ["g"], "value", 0.0, 128.0, bins=256, extra_cols=["id"]
        ).collect()
    }
    assert len(out) == 100
    # interior value untouched (well inside the p05..p95 band)
    assert out[50]["winsorized_e4"] == out[50]["value_e4"] == 500_000
    # extremes clipped INTO the band: strictly tighter than raw
    assert out[0]["winsorized_e4"] > out[0]["value_e4"]
    assert out[99]["winsorized_e4"] < out[99]["value_e4"]
    # clip never widens: winsorized stays within [min, max] of raw
    assert all(
        out[0]["winsorized_e4"] <= r["winsorized_e4"] <= out[99]["winsorized_e4"]
        for r in out.values()
    )


def test_cached_index_dir_builds_once_and_rekeys_on_data_change(tmp_path, monkeypatch):
    """The serving-cache contract: same (kind, sf_dir, params, data) ->
    one build; changed source data -> a different cache dir (stale
    indexes must never serve the correctness gate)."""
    import tempfile

    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        cached_index_dir,
    )

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "documents.parquet").write_bytes(b"v1-bytes")
    calls = []

    def build(path):
        calls.append(path)
        import os

        os.makedirs(path, exist_ok=True)

    p1 = cached_index_dir("k", str(sf), "params", build)
    p2 = cached_index_dir("k", str(sf), "params", build)
    assert p1 == p2 and len(calls) == 1
    # different params -> different dir, new build
    p3 = cached_index_dir("k", str(sf), "other", build)
    assert p3 != p1 and len(calls) == 2
    # changed source bytes (size differs) -> cache miss, new build
    (sf / "documents.parquet").write_bytes(b"v2-bytes-longer")
    p4 = cached_index_dir("k", str(sf), "params", build)
    assert p4 != p1 and len(calls) == 3
    # bumped writer LAYOUT_VERSION -> cache miss, new build (r9 VERDICT:
    # format staleness must be prevented by construction, not by
    # hand-editing params suffixes at call sites)
    p5 = cached_index_dir("k", str(sf), "params", build, layout_version=1)
    assert p5 != p4 and len(calls) == 4
    p6 = cached_index_dir("k", str(sf), "params", build, layout_version=1)
    assert p6 == p5 and len(calls) == 4
    # every index writer exposes the constant the call sites fold in
    from spark_streaming_kafka_bucket_counter_spark.operators.dedup import (
        LSH_LAYOUT_VERSION,
    )
    from spark_streaming_kafka_bucket_counter_spark.operators.pq import (
        IVFPQ_LAYOUT_VERSION,
    )
    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        BM25_LAYOUT_VERSION,
    )
    from spark_streaming_kafka_bucket_counter_spark.operators.similarity import (
        IVF_LAYOUT_VERSION,
    )

    assert all(
        isinstance(v, int)
        for v in (LSH_LAYOUT_VERSION, IVFPQ_LAYOUT_VERSION,
                  BM25_LAYOUT_VERSION, IVF_LAYOUT_VERSION)
    )


def test_cached_index_dir_crash_safe_publish(tmp_path, monkeypatch):
    """Atomic-publish contract: an interrupted build leaves NO published
    slot (only an orphaned staging dir), a retry builds cleanly, and a
    stale half-built root squatting the slot (a legacy in-place build
    that crashed) is evicted rather than served or wedging the rename."""
    import tempfile

    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        cached_index_dir,
    )

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "documents.parquet").write_bytes(b"bytes")

    def bad_build(path):
        (Path(path) / "partial.bin").write_bytes(b"half")
        raise RuntimeError("crash mid-build")

    from pathlib import Path

    import pytest

    with pytest.raises(RuntimeError, match="crash mid-build"):
        cached_index_dir("kc", str(sf), "p", bad_build)
    cache = tmp_path / "ssbc_index_cache"
    # nothing published: no kc-* slot with a _BUILT marker
    assert not [d for d in cache.glob("kc-*") if (d / "_BUILT").exists()]

    def good_build(path):
        (Path(path) / "index.bin").write_bytes(b"real")

    p = Path(cached_index_dir("kc", str(sf), "p", good_build))
    assert (p / "_BUILT").exists() and (p / "index.bin").read_bytes() == b"real"
    assert not (p / "partial.bin").exists()

    # legacy stale root: slot dir exists WITHOUT _BUILT -> evict + rebuild
    import shutil

    shutil.rmtree(p)
    p.mkdir()
    (p / "stale.bin").write_bytes(b"junk")
    p2 = Path(cached_index_dir("kc", str(sf), "p", good_build))
    assert p2 == p and (p2 / "_BUILT").exists()
    assert (p2 / "index.bin").exists() and not (p2 / "stale.bin").exists()


def test_compact_index_tree_is_reader_atomic(spark, tmp_path):
    """The manifest snapshot makes index maintenance reader-atomic for
    EXTERNAL readers (r7 VERDICT ask #2 — the soak's FILE_NOT_EXIST
    fix): a query PLANNED before a compaction/append cycle must still
    collect correctly afterwards (its pinned files are retired, not
    deleted, through the grace window), a racing reader thread looping
    plan+collect across two full append+compact cycles must see zero
    errors and only complete snapshots, and fragmented leaves must be
    re-compacted after later appends."""
    import threading

    from spark_streaming_kafka_bucket_counter_spark.operators.search import (
        bm25_append_index,
        bm25_build_index,
        bm25_query_index,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
    from spark_streaming_kafka_bucket_counter_spark.sources.manifest import (
        compact_index_tree,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    idx = str(tmp_path / "bm25_atomic")
    bm25_build_index(docs.filter("doc_id % 3 = 0"), "doc_id", "text", idx)
    for m in (1, 2):
        bm25_append_index(docs.filter(f"doc_id % 3 = {m}"), "doc_id", "text", idx)
    terms = ["data", "model", "training"]
    before = [tuple(r) for r in bm25_query_index(spark, idx, terms, top_k=10).collect()]

    # reader pinned BEFORE maintenance, collected AFTER it
    pinned = bm25_query_index(spark, idx, terms, top_k=10)
    assert compact_index_tree(spark, idx, grace_sec=3600) > 0
    assert [tuple(r) for r in pinned.collect()] == before

    stop = threading.Event()
    errors: list[str] = []
    reads = [0]

    def reader():
        while not stop.is_set():
            try:
                rows = bm25_query_index(spark, idx, terms, top_k=10).collect()
            except Exception as exc:  # noqa: BLE001 - the pin IS "no errors"
                errors.append(f"{type(exc).__name__}: {exc}"[:200])
                return
            if len(rows) != len(before):
                errors.append(f"partial snapshot: {len(rows)} rows")
                return
            reads[0] += 1

    t = threading.Thread(target=reader)
    t.start()
    try:
        # two full fragment+compact cycles under the racing reader; the
        # corpus is large enough that top_k stays saturated, so every
        # complete snapshot answers with exactly len(before) rows
        bm25_append_index(docs.filter("doc_id % 5 = 0"), "doc_id", "text", idx)
        assert compact_index_tree(spark, idx, grace_sec=3600) > 0
        bm25_append_index(docs.filter("doc_id % 7 = 0"), "doc_id", "text", idx)
        assert compact_index_tree(spark, idx, grace_sec=3600) > 0
    finally:
        stop.set()
        t.join()
    assert not errors, errors[0]
    assert reads[0] >= 1, "racing reader made no progress"
    after = bm25_query_index(spark, idx, terms, top_k=10).collect()
    assert len(after) == len(before)
