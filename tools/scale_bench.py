#!/usr/bin/env python3
"""Scale-curve spot bench: the bench headliners + the expensive tail, at
generator-sf0.1 AND generator-sf1 (tools/gen_scale.py data, 10x rows).

The per-round bench (bench.py, driver sf0.1 data) can't see a plan whose
cost grows superlinearly — every round measures one scale. This runner
measures the SAME query at two scales of the SAME generator and records
the ratio; ~<=10x on 10x data = scale-safe, >>10x = a plan bug (or a
fixed-cost floor finally being exceeded — SCALE.md interprets each).

Writes BENCH_sf1.json: {"queries": {name: {"sf01": s, "sf1": s,
"ratio": r}}, "totals": {...}}. Run: python3 tools/scale_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_streaming_kafka_bucket_counter_spark.plans import queries as catalog
from spark_streaming_kafka_bucket_counter_spark.session import get_spark

# bench.py CORE (the round-over-round headliners) + the bench-tail
# queries VERDICT r4's plan audit called out as the expensive five
QUERIES = [
    "bucket_count_epoch",
    "bucket_count_multikey",
    "bucket_count_iso",
    "json_decode_count",
    "merged_count_by_type",
    "sql_join_revenue_by_nation",
    "sql_topk_orders",
    "retention_recent_batches",
    "dedup_minhash_lsh",
    "sim_ivf_topk",
    "corpus_curation_stack",
    "dedup_clusters",
    "dedup_drop_near_duplicates",
    "streaming_click_purchase_join",
    "graph_pagerank",
    "curation_report",
    # round 7 (VERDICT r6 ask #5): the media-codec and ingest paths —
    # Python-heavy Arrow stages whose scale behavior (the _fanout width
    # fix, splittable WARC byte-range reads, gzip-member parallelism)
    # only a 10x media run proves
    "multimodal_jpeg_stats",
    "multimodal_jpeg_progressive",
    "multimodal_gif_frames",
    "audio_frame_features",
    "ingest_warc_roundtrip",
    "ingest_warc_record_types",
    # round 8: the new charset rungs ride the WARC read; CMYK decode,
    # the crawled-graph PageRank and the line-dedup batch operator join
    # the curve (standing rule: new rows join the sf1 curve each round)
    "ingest_warc_charsets",
    "multimodal_jpeg_cmyk",
    "web_graph_pagerank",
    "curation_line_dedup",
    # round 9 (standing rule: new rows join the curve): the
    # segmented-then-merged BM25 index — build cost includes the merge
    # rewrite, query cost must stay posting-list-bounded — and the
    # lossless JPEG roundtrip (pure-Python predictive codec: the one
    # Arrow stage whose per-row cost is precision-dependent)
    "search_bm25_merged_topk",
    "multimodal_jpeg_lossless",
    "multimodal_jpeg_arith",
    "multimodal_jpeg_12bit",
    # round 9 (cont.): the PQ family — training is an iterative
    # fixed-cost loop (2 Lloyd rounds over broadcast centroids), encode
    # is the map-only Arrow kernel whose cost is the one that scales
    # with N, and IVFADC's query cost must stay cell-bounded
    "sim_pq_codes",
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    # round 10 (standing rule): the trained-cell family — k-means cell
    # training is the new iterative fixed-cost stage, the Arrow argmin
    # assignment is the one whose cost scales with N, the persisted
    # trained index must stay cell-pruned, and the probe frontier's
    # cost tracks total candidate pairs across its three nprobe rows
    "sim_ivfpq_trained_cells",
    "sim_ivfpq_trained_index_topk",
    "sim_ivfpq_probe_frontier",
    # round 11 (standing rule): the operating-point query rides the
    # frontier chain plus 1-row broadcast reductions (its delta over
    # probe_frontier must be scale-flat), and the target-trained
    # backoff LM is two vocab-bounded shuffles + two left joins whose
    # cost scales with the doc pair count
    "sim_ivfpq_operating_point",
    "text_bigram_backoff",
    # the char-window ExactSubstr census: a ~len/stride window fan-out
    # whose one window-key shuffle must scale with corpus characters
    "dedup_char_spans",
    # round 12 (standing rule): the span TRIM adds per-doc window
    # functions + segment reassembly on top of the census — its delta
    # over dedup_char_spans must stay doc-bounded; the OPQ 2x2x2 eval
    # is 2x the trained 2x2 plus one dim-row aggregate (eval harness,
    # not a serving path)
    "dedup_span_trim",
    "sim_opq_recall_eval",
]

# Non-catalog timing lanes: deployment forms whose oracle twin can't
# exist (DuckDB has no xxhash64) but whose SCALE behavior is the point —
# the r12 hashed-key census (8-byte window keys on both census shuffles
# vs the raw ~40-char strings the oracle form ships). Parity with the
# raw form is pytest-pinned (test_char_census_hash_keys_parity); this
# lane records the wire-size win in BENCH_sf1.json / SCALE.md.


def _census_hashed(spark, sf_dir):
    from spark_streaming_kafka_bucket_counter_spark.operators.dedup import (
        substring_dup_spans,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table

    return substring_dup_spans(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        hash_keys=True,
    )


def _trim_hashed(spark, sf_dir):
    from spark_streaming_kafka_bucket_counter_spark.operators.dedup import (
        trim_duplicate_spans,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table

    return trim_duplicate_spans(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        min_doc_len=20, hash_keys=True,
    )


EXTRAS = {
    "dedup_char_spans_hashed": _census_hashed,
    "dedup_span_trim_hashed": _trim_hashed,
}

SCALES = {
    "sf01": "/tmp/ssbc_scale/gen-sf0.1",
    "sf1": "/tmp/ssbc_scale/gen-sf1",
}


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from tools.gen_scale import generate

    for sf, d in (("0.1", SCALES["sf01"]), ("1.0", SCALES["sf1"])):
        if not os.path.exists(os.path.join(d, "_GENERATED")):
            print(f"generating sf={sf} -> {d}", flush=True)
            generate(float(sf), d)

    spark = get_spark(app_name="ssbc-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict[str, float]] = {}
    for scale, sf_dir in SCALES.items():
        # per-scale warmups, mirroring bench.py (JVM/codegen + Arrow pool)
        _force(catalog.QUERIES["bucket_count_epoch"](spark, sf_dir))
        _force(catalog.QUERIES["sim_ivf_topk"](spark, sf_dir))
        for name in QUERIES + list(EXTRAS):
            fn = EXTRAS.get(name) or catalog.QUERIES[name]
            passes = []
            for _ in range(2):
                t0 = time.time()
                _force(fn(spark, sf_dir))
                passes.append(time.time() - t0)
            # warm = min-of-2 (the steady-state number, like bench.py);
            # cold = first pass — for memoized/cached artifacts (CC label
            # memo, on-disk index caches) cold is where the BUILD cost
            # lives, so the scale curve of the build is cold's ratio
            rec = out.setdefault(name, {})
            rec[scale] = round(min(passes), 3)
            rec[f"{scale}_cold"] = round(passes[0], 3)
            print(f"{scale} {name} warm={min(passes):.2f}s cold={passes[0]:.2f}s",
                  flush=True)

    for name, rec in out.items():
        rec["ratio"] = round(rec["sf1"] / max(rec["sf01"], 1e-9), 2)
        rec["ratio_cold"] = round(
            rec["sf1_cold"] / max(rec["sf01_cold"], 1e-9), 2
        )
    totals = {
        "sf01": round(sum(r["sf01"] for r in out.values()), 2),
        "sf1": round(sum(r["sf1"] for r in out.values()), 2),
    }
    totals["ratio"] = round(totals["sf1"] / totals["sf01"], 2)
    rec = {
        "metric": "scale_curve_gen_sf0.1_to_sf1",
        "unit": "sec",
        "generator": "tools/gen_scale.py seed=42",
        "queries": out,
        "totals": totals,
    }
    with open(os.path.join(REPO, "BENCH_sf1.json"), "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
