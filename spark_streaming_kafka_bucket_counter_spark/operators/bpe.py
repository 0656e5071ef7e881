"""Distributed BPE tokenizer training (byte-pair-encoding merges).

The scalable shape — the insight that makes BPE trainable on a 100 TB
corpus — is that training never needs the corpus after ONE pass: it
collapses to the (distinct word, frequency) table, which is vocabulary-
sized (Heaps' law: ~sqrt of corpus tokens), and every merge round runs
on that small table only. So:

  corpus --ONE shuffle--> word-freq table --k merge rounds, each a
  vocab-sized explode+agg--> ordered merge list

Each round: explode adjacent symbol pairs weighted by word frequency,
take the most frequent pair (count desc, pair asc tie-break — a total
order, so training is fully deterministic), rewrite every word's symbol
sequence with that pair merged (greedy left-to-right, the standard BPE
application order), `localCheckpoint` to stop plan growth. The only
driver-side data is ONE (pair, count) row per round — scalar, like the
k-means centroid collect.

The merge rewrite is a single Catalyst ``aggregate`` fold with an
array accumulator implementing greedy non-overlapping replacement:
append each symbol, but when the last appended symbol is `a` and the
incoming is `b`, pop and push `a||b`. Because the pushed merged symbol
``a||b`` can never equal `a` (b is non-empty), a freshly merged token
is never half of another merge in the same round — exactly BPE's
non-overlap rule (e.g. pair (x,x) on "x x x x" -> [xx, xx], on
"x x x" -> [xx, x]).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _merge_fold(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b."""
    merged = a + b
    empty = F.array().cast("array<string>")
    return F.aggregate(
        sym,
        empty,
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """The ONE corpus pass: (word, freq) with each word pre-split into
    its character symbols. Everything after this is vocab-sized."""
    words = df.select(F.explode(tokens(F.col(text_col))).alias("word"))
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("sym", F.split(F.col("word"), ""))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges over the corpus; returns the
    ordered merge list [(a, b, weighted_pair_count), ...].

    Deterministic: ties break by pair string ascending. Stops early if
    no adjacent pair remains (fully merged vocabulary).
    """
    vocab = word_freq_table(df, text_col).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.when(
                    F.size("sym") >= 2,
                    F.zip_with(
                        F.slice("sym", 1, F.size("sym") - 1),
                        F.slice("sym", 2, F.size("sym") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((a, b, int(cnt)))
        vocab = vocab.withColumn("sym", _merge_fold(F.col("sym"), a, b))
        # cut lineage each round so the plan stays one-round deep
        vocab = vocab.localCheckpoint(eager=False)
    return merges


def bpe_apply(
    df: DataFrame, text_col: str, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Tokenize text with a trained merge list: per-row, shuffle-free
    (the inference pass — at scale this is the map-only step that runs
    over the full corpus, while training ran on the vocab table).
    Appends ``bpe_tokens array<string>`` and ``bpe_len``."""
    sym = F.transform(
        tokens(F.col(text_col)), lambda w: F.split(w, "")
    )
    # apply merges in training order within each word
    def _apply_word(word_sym: Column) -> Column:
        out = word_sym
        for a, b, _ in merges:
            out = _merge_fold(out, a, b)
        return out

    merged = F.flatten(F.transform(sym, _apply_word))
    return df.withColumn("bpe_tokens", merged).withColumn(
        "bpe_len", F.size("bpe_tokens").cast("long")
    )


def bpe_train_reference(
    texts: list[str], n_merges: int = 10
) -> list[tuple[str, str, int]]:
    """Pure-Python reference implementation (test parity only): the
    textbook word-freq BPE trainer with identical tie-breaking."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                wf[w] += 1
    vocab = {w: list(w) for w in wf}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc = Counter()
        for w, sym in vocab.items():
            f = wf[w]
            for x, y in zip(sym, sym[1:]):
                pc[(x, y)] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        for w, sym in vocab.items():
            out: list[str] = []
            for x in sym:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def bpe_save(spark, merges: list[tuple[str, str, int]], path: str) -> None:
    """Persist a trained merge list as a tiny parquet artifact (rank,
    a, b, cnt) — the tokenizer analog of the IVF/BM25 persisted
    indexes: train once on a sample, apply corpus-wide forever. The
    artifact is rank-ordered; application order IS the contract."""
    rows = [(i, a, b, cnt) for i, (a, b, cnt) in enumerate(merges)]
    df = spark.createDataFrame(rows, "rank long, a string, b string, cnt long")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def bpe_load(spark, path: str) -> list[tuple[str, str, int]]:
    """Load a merge list saved by :func:`bpe_save`, in training order.

    The merge table is vocabulary-bounded (kilobytes), so the collect
    is a fixed-size artifact read, not a data-path collect."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["a"], r["b"], int(r["cnt"])) for r in rows]
