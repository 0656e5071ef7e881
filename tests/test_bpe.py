"""Distributed BPE trainer: parity against the pure-Python textbook
implementation, merge-fold edge cases, and inference application."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.operators.bpe import (
    _merge_fold,
    bpe_apply,
    bpe_train,
    bpe_train_reference,
)
from tests.conftest import SF_DIR


def test_merge_fold_greedy_non_overlapping(spark):
    df = spark.createDataFrame(
        [(1, ["x", "x", "x", "x"]), (2, ["x", "x", "x"]), (3, ["a", "b", "a"])],
        "id long, sym array<string>",
    )
    out = {
        r["id"]: r["m"]
        for r in df.select("id", _merge_fold(F.col("sym"), "x", "x").alias("m")).collect()
    }
    assert out[1] == ["xx", "xx"]  # pairs 1-2 and 3-4, never the middle
    assert out[2] == ["xx", "x"]
    assert out[3] == ["a", "b", "a"]  # no (x,x) present


def test_merge_fold_does_not_chain_fresh_merges(spark):
    # merging (a, b): "a b b" -> [ab, b], NOT [ab b] -> the fresh "ab"
    # must not then consume the following b via last=="ab"
    df = spark.createDataFrame([(1, ["a", "b", "b"])], "id long, sym array<string>")
    (row,) = df.select(_merge_fold(F.col("sym"), "a", "b").alias("m")).collect()
    assert row["m"] == ["ab", "b"]


def test_bpe_train_matches_reference_on_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe_train(docs, "text", n_merges=8)
    want = bpe_train_reference(texts, n_merges=8)
    assert got == want
    # merges are (a, b, weighted_count) with positive counts
    assert all(cnt > 0 and a and b for a, b, cnt in got)


def test_bpe_train_deterministic_tiebreak(spark):
    # "ab" and "cd" both appear twice; (a,b) < (c,d) lexicographically
    df = spark.createDataFrame(
        [(1, "ab ab cd cd")], "id long, text string"
    )
    merges = bpe_train(df, "text", n_merges=2)
    assert merges[0][:2] == ("a", "b")
    assert merges[1][:2] == ("c", "d")


def test_bpe_apply_shuffle_free_and_consistent(spark):
    df = spark.createDataFrame([(1, "abab ab"), (2, "")], "id long, text string")
    merges = bpe_train(df, "text", n_merges=3)
    out = bpe_apply(df, "text", merges)
    plan_df = out  # inference must add no exchanges
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    import re

    assert not re.findall(r"\(\d+\) Exchange", buf.getvalue())
    rows = {r["id"]: r for r in out.collect()}
    # tokenization round-trips the characters of each word in order
    assert "".join(rows[1]["bpe_tokens"]) == "ababab"
    assert rows[1]["bpe_len"] < len("ababab")  # merges actually applied
    assert rows[2]["bpe_tokens"] == [] and rows[2]["bpe_len"] == 0


def test_bpe_train_matches_reference_on_random_corpus(spark):
    """Seeded random corpus (adversarial: tiny alphabet -> many ties and
    repeated-char runs, the overlap-prone cases) must match the
    textbook trainer exactly, merges AND counts."""
    import random

    rng = random.Random(20260814)
    texts = [
        " ".join(
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(120)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    assert bpe_train(df, "text", n_merges=6) == bpe_train_reference(texts, n_merges=6)


def test_bpe_save_load_roundtrip_and_apply_parity(spark, tmp_path):
    from spark_streaming_kafka_bucket_counter_spark.operators.bpe import (
        bpe_load,
        bpe_save,
    )

    df = spark.createDataFrame(
        [(1, "banana band bandana"), (2, "ban ban banana")], "id long, text string"
    )
    merges = bpe_train(df, "text", n_merges=5)
    path = str(tmp_path / "bpe_merges")
    bpe_save(spark, merges, path)
    loaded = bpe_load(spark, path)
    assert loaded == merges
    # applying the loaded artifact equals applying the in-memory merges
    a = bpe_apply(df, "text", merges).select("id", "bpe_tokens").collect()
    b = bpe_apply(df, "text", loaded).select("id", "bpe_tokens").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
