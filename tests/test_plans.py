"""Physical-plan assertions: the scale properties .explain() shows —
pushdown, pruning, broadcast joins, shuffle counts — pinned as tests so a
plan regression fails CI, not a 100 TB run.

These inspect the executed/optimized plan strings; they intentionally pin
the *shape* (operator classes present/absent), not exact formatting.
"""

from __future__ import annotations

import contextlib
import io
import re

from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = catalog.QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_predicate_filter_pushed_to_scan(spark):
    plan = _plan(spark, "predicate_eq")
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters:.*EqualTo\(event_type,click\)", plan)


def test_projection_prunes_scan_columns(spark):
    """project_rename reads 3 of events' 6 columns; the parquet ReadSchema
    must not include the unused ones (column pruning through the rename)."""
    plan = _plan(spark, "project_rename")
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, plan
    assert "props" not in m.group(1) and "value" not in m.group(1)


def test_revenue_join_broadcasts_dimensions(spark):
    """customer/nation/region are small dims: all joins must be broadcast
    (no sort-merge shuffle of lineitem against a dimension)."""
    plan = _plan(spark, "sql_join_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bucket_count_single_shuffle(spark):
    """The core A1 count: partial HashAggregate -> ONE Exchange -> final.
    More than one exchange means the partial-agg combiner was lost."""
    plan = _plan(spark, "bucket_count_epoch")
    # "(n) Exchange" detail headers — one per physical exchange operator
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "HashAggregate" in plan


def test_sampling_is_shuffle_free(spark):
    """Deterministic sampling is a pure projection+filter — any Exchange
    would mean the split operator stopped being partition-local."""
    plan = _plan(spark, "sample_stratified")
    assert not re.findall(r"\(\d+\) Exchange", plan)


def test_lsh_verify_joins_are_broadcast(spark):
    """MinHash-LSH's exact-verify stage joins the candidate pairs against
    the candidate shingle-sets (small by construction, explicitly
    broadcast-hinted): they must plan as BroadcastHashJoin so the
    inverted index is never shuffled during verification.

    Pins the OPERATOR's plan directly: the `dedup_minhash_lsh` catalog
    query now serves the per-dataset pair memo (plans/_memo.py), whose
    explain is just the checkpoint scan."""
    from spark_streaming_kafka_bucket_counter_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table

    df = minhash_lsh_pairs(
        load_table(spark, SF_DIR, "documents"), "doc_id", "text",
        num_hashes=8, bands=2, k=3, threshold=0.5,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 2


def test_simhash64_band_join_shape(spark):
    """The PRIMARY simhash pair query must be the 64-bit banded shape: ONE
    equi-join on the exploded (band, bk) keys — band keys carry the full
    16-bit part value (2^16 distinct per band), never a cartesian or a
    reduced-key join. (`dedup_simhash64_pairs` is an alias of the same.)"""
    for name in ("dedup_simhash_pairs", "dedup_simhash64_pairs"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # join keys are the exploded band id + full band value
        assert re.search(r"\[band#\d+L?, bk#\d+L?\]", plan), plan
        assert "bit_count" in plan  # exact hamming verify present


def test_simhash64_band_key_cardinality_is_full_16_bits(spark):
    """The band key must be the FULL 16-bit part value — if a future edit
    folded it down (e.g. % 256 like the legacy recipe), candidate growth
    would go quadratic. Pin: every exploded band key equals its signature
    part exactly and parts span the 16-bit range."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_bucket_counter_spark.operators import dedup as D
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    sig = D.simhash64_signatures(docs, "doc_id", "text")
    parts = [f"p{k}" for k in range(D.SIMHASH64_PARTS)]
    stats = sig.select(
        F.least(*[F.min(F.col(p)) for p in parts]).alias("lo"),
        F.greatest(*[F.max(F.col(p)) for p in parts]).alias("hi"),
    ).collect()[0]
    assert 0 <= stats["lo"] and stats["hi"] < (1 << 16)
    # signatures use the full upper half of the 16-bit space (would be
    # impossible if a mod/shift narrowed the band key)
    assert stats["hi"] >= (1 << 15), stats


def test_sessionize_single_shuffle(spark):
    """Sessionization is ONE hash exchange on the user key feeding both
    window passes — a second exchange would mean the lag and running-sum
    windows stopped sharing the partitioning."""
    plan = _plan(spark, "sessionize_events")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_union_window_not_range_join(spark):
    """The as-of join must plan as union + ONE exchange + ONE window —
    never a join operator (the naive ts_r <= ts_l range join would appear
    as BroadcastNestedLoopJoin/CartesianProduct and explode at scale)."""
    plan = _plan(spark, "asof_last_purchase")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin", "BroadcastHashJoin"):
        assert bad not in plan


def test_core_count_stays_in_codegen(spark):
    """The reference-parity hot path must stay JVM-side: no Python eval
    operators (BatchEvalPython / ArrowEvalPython / mapInPandas) anywhere
    in the core count plan."""
    plan = _plan(spark, "bucket_count_multikey")
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    # the whole pipeline is Scan -> Project -> partial agg -> exchange ->
    # final agg: nothing else may appear between scan and aggregate
    assert re.search(r"HashAggregate", plan)


def test_decontaminate_eval_side_broadcasts(spark):
    """Decontamination must join the exploded corpus k-grams against the
    eval hash set as a broadcast hash join — a shuffle join keyed on the
    k-gram hash would shuffle the exploded corpus, the exact thing the
    design forbids at 100 TB. The per-doc spine join (keyed on doc_id)
    MAY be a shuffle join: its sides are corpus-sized, and broadcasting
    a corpus-sized aggregate would be the real scale bug."""
    plan = _plan(spark, "dedup_decontaminate")
    assert "BroadcastHashJoin" in plan
    # no shuffle join may key on the k-gram hash column (_h)
    for m in re.finditer(r"\(\d+\) SortMergeJoin[^\n]*\n(?:[^\n]*\n){1,3}", plan):
        block = m.group(0)
        assert "_h#" not in block, f"gram-hash shuffle join:\n{block}"


def test_tokens_to_ids_vocab_is_broadcast_topk(spark):
    """The token->id join must broadcast the (vocab_size-bounded) vocab,
    and the vocab top-k must plan as TakeOrderedAndProject — never a
    global sort of the distinct-token table, never a shuffle join of
    the exploded tokens against the vocab."""
    plan = _plan(spark, "text_tokens_to_ids")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_balanced_centroid_fanout_is_broadcast(spark):
    """The K-bounded centroid table must broadcast into the per-vector
    fanout (never a shuffle of the vectors against it), and the argmin
    must be an aggregate, not a window over the fanout."""
    plan = _plan(spark, "sample_balanced_by_centroid")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # one true window remains (the per-cell cap); the argmin itself is an
    # agg. WindowGroupLimit operators are the rank-filter pushdown, not
    # extra window passes — excluded from the count.
    assert len(re.findall(r"\(\d+\) Window(?!GroupLimit)", plan)) == 1


def test_shipping_priority_pushes_dates_and_topk(spark):
    """TPC-H Q3 shape: date predicates reach the parquet scans and the
    LIMIT rides as a distributed TakeOrderedAndProject."""
    plan = _plan(spark, "sql_shipping_priority")
    assert "TakeOrderedAndProject" in plan
    assert re.search(r"PushedFilters:.*LessThan\(o_orderdate", plan)
    assert re.search(r"PushedFilters:.*GreaterThan\(l_shipdate", plan)
    assert re.search(r"PushedFilters:.*EqualTo\(c_mktsegment,BUILDING\)", plan)


def test_semantic_dedup_pair_join_keys_on_cell(spark):
    """The in-cell pair stage must be an equi-join keyed on the cell
    (the SemDeDup blocker) — never an uncapped cartesian of the
    vectors. Since r12 the join is SALTED (guide §2.5 hot keys: K cells
    cap the pair-enumeration stage at K busy tasks), so the accepted
    key shape is [cell] or [cell, _salt]. The only nested-loop join
    allowed is the K-bounded broadcast centroid fanout (its build side
    is a BroadcastExchange of the centroid agg)."""
    plan = _plan(spark, "dedup_semantic_pairs")
    assert "CartesianProduct" not in plan
    assert re.search(r"SortMergeJoin.*\[cell#\d+", plan) or \
        re.search(r"BroadcastHashJoin.*\[cell#\d+", plan) or \
        re.search(r"Left keys \[[12]\]: \[cell#\d+(L?, _salt#\d+)?\]", plan), plan


def test_ewma_single_window_pass(spark):
    """All 10 EWMA lags must share ONE window pass over ONE user-key
    exchange — per-lag windows would sort the stream 10 times."""
    plan = _plan(spark, "feature_ewma")
    assert len(re.findall(r"\(\d+\) Window(?!GroupLimit)", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_repetition_hof_half_is_shuffle_free(spark):
    """The duplicate-n-gram fractions are per-row HOF projections; only
    the modal-bigram half may shuffle (groupBy + window + spine join,
    all hashed on doc_id)."""
    import pyspark.sql.functions as F
    from spark_streaming_kafka_bucket_counter_spark.functions.text import tokens
    from spark_streaming_kafka_bucket_counter_spark.operators.quality import (
        repetition_columns,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table

    docs = load_table(spark, SF_DIR, "documents")
    cols = repetition_columns(F.col("text"), tok=tokens(F.col("text")))
    df = docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert not re.findall(r"\(\d+\) Exchange", buf.getvalue())


def test_topn_cap_single_shuffle(spark):
    """Per-group cap: one Exchange (hash on the group column) + one
    window pass — a second exchange would mean the rank recomputed the
    partitioning."""
    plan = _plan(spark, "sample_topn_per_source")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_centroid_training_single_shuffle(spark):
    """Distributed centroid training: posexplode -> partial agg -> ONE
    exchange keyed (label, dim) -> final agg. A second exchange would
    mean the partial combiner was lost and vectors hit the wire."""
    plan = _plan(spark, "embedding_centroids")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "HashAggregate" in plan


def test_quantization_is_shuffle_free(spark):
    """int8 quantization is a pure per-row projection."""
    plan = _plan(spark, "embedding_quantize")
    assert not re.findall(r"\(\d+\) Exchange", plan)


def test_sliding_count_single_shuffle(spark):
    """Hopping windows must keep the tumbling plan's shape: window
    expansion happens map-side BEFORE the partial aggregate, so exactly
    one Exchange (the final hash shuffle) appears."""
    plan = _plan(spark, "bucket_count_sliding")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "HashAggregate" in plan


def test_brute_force_topk_broadcasts_the_bounded_query_side(spark):
    """sim_topk_cosine's nested-loop join (non-equi: cand != query) must
    broadcast the BOUNDED side — the vec_id < 10 query set — with the
    bound pushed into its parquet scan. Pinned so an AQE/planner flip to
    broadcasting the data-sized candidate side (or a CartesianProduct)
    can't slip in silently."""
    plan = _plan(spark, "sim_topk_cosine")
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) == 1
    assert "CartesianProduct" not in plan
    # resolve the scan node nested under BroadcastExchange in the tree,
    # then assert ITS details carry the query bound as a pushed filter
    lines = plan.splitlines()
    bx = next(i for i, l in enumerate(lines) if "BroadcastExchange (" in l)
    scan_id = None
    for l in lines[bx + 1 :]:
        if not l.strip() or l.strip().startswith("("):  # details section
            break
        m = re.search(r"Scan parquet\s*\((\d+)\)", l)
        if m:
            scan_id = m.group(1)
            break
    assert scan_id, plan
    details = plan.split(f"({scan_id}) Scan parquet", 1)[1]
    m = re.search(r"PushedFilters: \[([^\]]*)\]", details)
    assert m and "LessThan(vec_id,10)" in m.group(1), plan


def test_range_join_never_plans_pairwise_nested_loop(spark):
    """The prefix-sum range count may only use nested-loop joins for
    1-row broadcast scalars (the bucket-range metadata cross join) —
    never a cartesian of intervals x points, and no row-at-a-time
    Python."""
    plan = _plan(spark, "range_join_ship_activity")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the window pass partitioned by time bucket is the core of the
    # prefix construction — it must survive optimization
    assert "Window" in plan


def test_multiprobe_is_single_equijoin_no_dedup(spark):
    """Multi-probe LSH: one equi-join on (bucket = probe); pairs match
    exactly one probe key so no distinct/dedup aggregation may appear
    after the join."""
    plan = _plan(spark, "sim_lsh_multiprobe")
    assert "CartesianProduct" not in plan
    joins = re.findall(r"\(\d+\) (?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    assert len(joins) == 1, plan


def test_chunker_is_shuffle_free(spark):
    """Document chunking is a pure per-row projection (tokenize ->
    strided slices -> posexplode): any Exchange is a regression."""
    plan = _plan(spark, "text_chunks")
    assert not re.findall(r"\(\d+\) Exchange", plan)


def test_bm25_topk_avoids_global_window_sort(spark):
    """BM25 ranking must plan as TakeOrderedAndProject (distributed
    per-partition heaps), never a single-partition global-sort window
    over all matched documents."""
    plan = _plan(spark, "search_bm25_topk")
    assert "TakeOrderedAndProject" in plan


def test_salted_join_matches_plain_join_and_widens_key(spark):
    """salted_join must (a) return exactly the plain join's rows under
    duplicate keys on BOTH sides, (b) keep left-join null semantics,
    (c) join on the widened (key, salt) pair, and (d) never leak the
    salt column."""
    import pytest

    from spark_streaming_kafka_bucket_counter_spark.operators.joins import salted_join

    fact = spark.createDataFrame(
        [(1, "a1"), (1, "a2"), (1, "a3"), (2, "b1"), (9, "orphan")],
        "k long, fv string",
    )
    dim = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k long, dv string"
    )
    plain = {tuple(r) for r in fact.join(dim, ["k"]).collect()}
    salted = salted_join(fact, dim, ["k"], salt_buckets=4)
    assert "_salt" not in salted.columns
    assert {tuple(r) for r in salted.collect()} == plain
    # duplicate keys both sides: 3 fact x 2 dim = 6 pairs for k=1
    assert len([r for r in salted.collect() if r["k"] == 1]) == 6

    left = salted_join(fact, dim, ["k"], salt_buckets=4, how="left")
    orphans = [r for r in left.collect() if r["k"] == 9]
    assert len(orphans) == 1 and orphans[0]["dv"] is None

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # the physical join key actually widened

    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], salt_buckets=1)


def test_classify_quality_is_shuffle_free_codegen(spark):
    """The hashed linear classifier is a map-only projection: zero
    exchanges, no Python eval anywhere (pure codegen fold)."""
    plan = _plan(spark, "classify_quality_linear")
    assert not re.findall(r"\(\d+\) Exchange", plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_random_projection_is_shuffle_free(spark):
    """Sign random projection must run at scan speed: zero exchanges."""
    plan = _plan(spark, "embedding_random_projection")
    assert not re.findall(r"\(\d+\) Exchange", plan)


def test_boilerplate_no_forced_corpus_broadcast(spark):
    """The gram-docfreq side is corpus-derived (unbounded), so the
    operator must not carry an explicit broadcast() hint on it — the
    planner may still COST-choose a broadcast when the measured
    aggregate is small (it does at sf0.001), but that choice scales
    with stats. Proof of no hard hint: with auto-broadcast disabled,
    NO broadcast join may remain (a F.broadcast() hint would override
    the threshold and still plan as BroadcastHashJoin)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, "boilerplate_flags")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "gram" in plan
    assert "BroadcastHashJoin" not in plan


def test_bpe_pair_counts_uses_distributed_topk(spark):
    """Top-50 pairs must plan as TakeOrderedAndProject (distributed
    top-k), never a global Sort of the full pair aggregate; the rank
    window runs on the <=50 survivors only."""
    plan = _plan(spark, "bpe_pair_counts")
    assert "TakeOrderedAndProject" in plan


def test_knn_graph_is_bucket_equijoin(spark):
    """The kNN graph BUILD joins on the LSH bucket key (hash equi-join)
    — never a nested-loop/cartesian candidate generation. Pinned on the
    operator directly: since round 6 the `knn_graph_lsh` catalog query
    serves the per-dataset memoized artifact (its own plan is a
    checkpoint Scan ExistingRDD, shared with graph_communities_lpa), so
    the build-side plan must be inspected at the operator level."""
    import contextlib
    import io

    from spark_streaming_kafka_bucket_counter_spark.operators import similarity as S
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    df = S.knn_graph(emb, "vec_id", "embedding", top_k=3, planes=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "bucket" in plan
    # and the catalog query really is the shared memoized artifact
    assert "ExistingRDD" in _plan(spark, "knn_graph_lsh")


def test_entity_match_joins_on_block_key(spark):
    """Blocked ER must candidate-generate via the block-key equi-join —
    no cartesian/nested-loop pairing, and the levenshtein verify stays
    inside the join filter (no materialized pair set)."""
    plan = _plan(spark, "entity_match_parts")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan.lower()


def test_trending_single_count_shuffle(spark):
    """Trending = ONE partial-agg exchange on (bucket, type) + the
    bucket-partitioned rank window (which reuses that partitioning or
    adds at most one more exchange) — never a global sort."""
    plan = _plan(spark, "trending_by_bucket")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    # exactly ONE Window operator (the rank; WindowGroupLimit pushdown
    # nodes don't count) — a second would mean a running-frame pass
    # sneaked in
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1


def test_dsir_single_vocab_shuffle(spark):
    """DSIR builds target+corpus distributions in ONE conditional-agg
    pass: the token groupBy must appear once (plus the doc-side agg and
    the tiny totals agg) — a second corpus-wide token shuffle means the
    two distributions were computed in separate passes."""
    plan = _plan(spark, "dsir_importance")
    # token-keyed exchanges: hashpartitioning on _tok
    tok_exchanges = len(re.findall(r"hashpartitioning\(_tok", plan))
    assert tok_exchanges <= 2, plan  # vocab agg + occ-vocab join reuse


def test_curation_stack_no_python_and_no_cartesian(spark):
    """The composed curation stack stays fully JVM-side (no Python eval
    stages) and joins only on doc_id / derived keys (no cartesian)."""
    plan = _plan(spark, "corpus_curation_stack")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_sorted_neighborhood_rank_is_distributed(spark):
    """The global sort rank must come from bucket-partitioned windows +
    a broadcast offset join — the only single-partition window allowed
    is the #buckets-sized cumulative sum (its input is an aggregate,
    bounded by distinct name prefixes, not by rows)."""
    plan = _plan(spark, "entity_match_sorted")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the row-level rank window is partitioned by the bucket key
    assert re.search(r"row_number\(\).*partitionBy", plan.replace("\n", " ")) or "_bkt" in plan


def test_volume_shipping_broadcasts_nations(spark):
    """Q7 flavor: both nation dims broadcast; the fact chain must not
    sort-merge against a 25-row dimension."""
    plan = _plan(spark, "sql_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2


def test_bootstrap_single_group_shuffle(spark):
    """The bootstrap's replicate dimension must ride the SAME
    (group, b) partial-agg shuffle — the explode multiplies map output,
    never adds an extra corpus-wide exchange per replicate. The budget
    is B-INDEPENDENT: r12's conditional scan fan-out (one small-input
    repartition ahead of the explode, a no-op at scale) is the +1; any
    growth WITH the replicate count would be the regression this pin
    exists to catch."""
    plan = _plan(spark, "bootstrap_value_ci")
    # rep agg + base agg + join align + the r12 small-input fan-out
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 4
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_returned_item_ranking_pushes_filter_and_topk(spark):
    """Q10 flavor: the returnflag filter must reach the lineitem scan
    and the top-20 must plan as TakeOrderedAndProject."""
    plan = _plan(spark, "sql_returned_item_ranking")
    assert re.search(r"PushedFilters:.*EqualTo\(l_returnflag,R\)", plan)
    assert "TakeOrderedAndProject" in plan


def test_unpivot_is_shuffle_free(spark):
    """The melt expands rows map-side — any Exchange means the reshape
    stopped being a pure projection."""
    plan = _plan(spark, "unpivot_order_flags")
    assert not re.findall(r"\(\d+\) Exchange", plan)


def test_trained_cell_assignment_is_arrow_map_only(spark):
    """The trained-cell IVFADC chain's assignment must be the map-only
    Arrow stage (broadcast numpy centroids), not an inline k x dim
    codegen expression (optimizer seconds per run, the 64KB-trap shape)
    and not a join/shuffle of the vector set."""
    plan = _plan(spark, "sim_ivfpq_trained_cells")
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    # the only exchanges are the rank window's hash partitioning and
    # broadcast sides; assignment itself must not shuffle the vector set
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 4
    assert "CartesianProduct" not in plan


def test_probe_frontier_shares_one_assignment(spark):
    """One ranked assignment at max(nprobe) serves every frontier row —
    the plan must not re-run per-nprobe cell assignment as separate
    Arrow stages over the full vector set beyond the probe variants."""
    plan = _plan(spark, "sim_ivfpq_probe_frontier")
    assert "CartesianProduct" not in plan or "BroadcastNestedLoop" in plan


def test_span_trim_no_python_and_doc_partitioned_windows(spark):
    """dedup_span_trim (r12): no row-at-a-time Python anywhere (the whole
    trim is census + window functions + array reassembly in codegen),
    every window pass partitions on the doc id (per-task state = one
    document's strided positions, never corpus-sized), and no cartesian
    product sneaks in."""
    plan = _plan(spark, "dedup_span_trim")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    # every Window's partition spec carries the doc id
    for spec in re.findall(r"Window \[[^\]]*partitionBy=\[([^\]]*)\]", plan):
        assert "doc_id" in spec, plan


def test_opq_rotation_stage_is_arrow_map_only(spark):
    """pq.rotate_vectors must plan as a single Arrow map stage (no
    shuffle, no row-at-a-time Python): the rotation rides the scan."""
    import numpy as np

    from spark_streaming_kafka_bucket_counter_spark.operators.pq import rotate_vectors
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    df = rotate_vectors(emb, "vec_id", "embedding", np.eye(64))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
