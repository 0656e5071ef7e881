"""Extension queries: training-data pipeline operators (dedup, similarity,
text analysis, multimodal) with DuckDB oracles.

Registered into the same catalog as the reference-parity queries; see
plans/queries.py for the cross-engine determinism rules. The DuckDB SQL
here is generated from the same constants (stopword lists, hash recipes,
thresholds) as the Spark plans via functions/text.py's ``*_sql`` helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from .queries import _t, query

# ---------------------------------------------------------------------------
# Shared oracle SQL fragments (one source of truth for the DuckDB side)
# ---------------------------------------------------------------------------

_TOK = X.tokens_sql("text")
_DOC_SHINGLES = f"""
  tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
  sh AS (SELECT doc_id,
                CASE WHEN len(t) >= 3
                     THEN list_transform(generate_series(1, len(t) - 2),
                                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                     ELSE [] END AS shingles
         FROM tok),
  ds AS (SELECT DISTINCT doc, shingle
         FROM (SELECT doc_id AS doc, unnest(shingles) AS shingle FROM sh))
"""

_JACCARD_FROM_DS = """
  sizes AS (SELECT doc, COUNT(*) AS n FROM ds GROUP BY doc),
  inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
            FROM ds a JOIN ds b USING (shingle)
            WHERE a.doc < b.doc
            GROUP BY 1, 2),
  jac AS (SELECT doc_a, doc_b, n_common, sa.n AS size_a, sb.n AS size_b,
                 CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
          FROM inter
          JOIN sizes sa ON inter.doc_a = sa.doc
          JOIN sizes sb ON inter.doc_b = sb.doc)
"""

# zero-norm vectors are excluded (WHERE dot(v,v) > 0) — mirrors the
# operators' nonzero_vectors entry guard: no cosine direction, not a
# neighbor candidate (edge-case sweep finding)
_EMB_DOUBLE = (
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings "
    "WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0)"
)
from ..operators.similarity import COSINE_AB_SQL as _COSINE_AB  # one shared cosine oracle twin


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_QUALITY_SQL_COLS = ",\n       ".join(
    f"{sql} AS {name}" for name, sql in X.quality_sql("text").items()
)


@query(
    "text_quality",
    f"SELECT doc_id,\n       {_QUALITY_SQL_COLS}\nFROM documents",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char/punctuation/stopword quality metrics per document."""
    docs = _t(spark, sf_dir, "documents").withColumn("_tok", X.tokens(F.col("text")))
    cols = X.quality_columns(F.col("text"), tok=F.col("_tok"))
    return docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])


_LANGID_SQL_COLS = ",\n       ".join(
    f"{sql} AS {name}" for name, sql in X.langid_sql("text").items()
)


@query(
    "text_langid",
    f"SELECT doc_id, lang AS lang_declared,\n       {_LANGID_SQL_COLS}\nFROM documents",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID vs the declared lang column."""
    docs = _t(spark, sf_dir, "documents").withColumn("_tok", X.tokens(F.col("text")))
    cols = X.langid_columns(F.col("text"), tok=F.col("_tok"))
    return docs.select(
        "doc_id", F.col("lang").alias("lang_declared"), *[c.alias(n) for n, c in cols.items()]
    )


@query(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           {X.md5_fingerprint_sql('text')} AS md5_fp,
           {X.rolling_fingerprint_sql('text')} AS roll_fp
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (md5-of-normalized) + rolling (position-weighted token hash)
    document fingerprints."""
    docs = _t(spark, sf_dir, "documents").withColumn("_tok", X.tokens(F.col("text")))
    return docs.select(
        "doc_id",
        X.md5_fingerprint(F.col("text")).alias("md5_fp"),
        X.rolling_fingerprint(F.col("text"), tok=F.col("_tok")).alias("roll_fp"),
    )


@query(
    "text_token_count",
    f"""
    SELECT doc_id,
           {X.token_count_ws_sql('text')} AS n_ws_tokens,
           {X.token_count_bpe_sql('text')} AS n_bpe_tokens
    FROM documents
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token accounting: whitespace tokens + BPE-ish regex
    pre-tokenizer matches (the LLM-token-count proxy)."""
    docs = _t(spark, sf_dir, "documents").withColumn("_tok", X.tokens(F.col("text")))
    return docs.select(
        "doc_id",
        X.token_count_ws(F.col("text"), tok=F.col("_tok")).alias("n_ws_tokens"),
        X.token_count_bpe(F.col("text")).alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    f"""
    SELECT {X.md5_fingerprint_sql('text')} AS fingerprint,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized-text hash (hash-groupBy)."""
    return D.exact_duplicates(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "dedup_char_spans",
    f"""
    WITH {D.substring_dup_spans_sql('documents', 'doc_id', 'text')}
    SELECT * FROM ss
    """,
)
def q_dedup_char_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHARACTER-window duplicated-span census (r11): 40-char windows at
    stride 10, corpus-wide occurrence counts, per-doc dup_ppm of windows
    seen >= 2 times. Complements `dedup_substring_spans` (the TOKEN-span
    census in operators/spans.py) on two axes the paper's suffix-array
    pass measures: character granularity (whitespace/punctuation runs
    count — tokenization can't hide a copied span) and SAME-DOC repeats
    (internal boilerplate is duplication too; the token op counts only
    cross-document spans). All exact integers; one window-key shuffle."""
    return D.substring_dup_spans(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query(
    "dedup_span_trim",
    f"""
    WITH {D.trim_duplicate_spans_sql('documents', 'doc_id', 'text', min_doc_len=20)}
    SELECT * FROM td
    """,
)
def q_dedup_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span TRIM (r12) — the transform behind the
    `dedup_char_spans` census (Lee et al. 2022's actual dedup step):
    windows seen >= 2 times corpus-wide coalesce into maximal per-doc
    spans (gaps-and-islands, no UDF), the spans are cut, segments
    reassemble in order, and docs trimmed below 20 chars are dropped
    (fully-boilerplate docs are not worth training on). Output is the
    trimmed text itself plus exact cut accounting."""
    return D.trim_duplicate_spans(
        _t(spark, sf_dir, "documents"), "doc_id", "text", min_doc_len=20
    )


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH {_DOC_SHINGLES}, {_JACCARD_FROM_DS}
    SELECT doc_a, doc_b, n_common, size_a, size_b, jaccard
    FROM jac WHERE jaccard >= 0.5
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard >= 0.5 (inverted-index join)."""
    return D.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=3, threshold=0.5
    )


@query(
    "dedup_containment_pairs",
    f"""
    WITH {_DOC_SHINGLES},
    _cp_sizes AS (SELECT doc, COUNT(*) AS n FROM ds GROUP BY doc),
    _cp_inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
                  FROM ds a JOIN ds b USING (shingle)
                  WHERE a.doc < b.doc
                  GROUP BY 1, 2),
    _cp_both AS (SELECT doc_a, doc_b, n_common, sa.n AS size_a, sb.n AS size_b
                 FROM _cp_inter
                 JOIN _cp_sizes sa ON _cp_inter.doc_a = sa.doc
                 JOIN _cp_sizes sb ON _cp_inter.doc_b = sb.doc),
    _cp_dir AS (
      SELECT doc_a, doc_b, n_common, size_a, size_b,
             CAST(n_common AS DOUBLE) / size_a AS containment
      FROM _cp_both
      UNION ALL
      SELECT doc_b AS doc_a, doc_a AS doc_b, n_common,
             size_b AS size_a, size_a AS size_b,
             CAST(n_common AS DOUBLE) / size_b AS containment
      FROM _cp_both
    )
    SELECT doc_a, doc_b, n_common, size_a, size_b, containment
    FROM _cp_dir WHERE containment >= 0.75
    """,
)
def q_dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED sub-document duplication: shingle containment
    |A∩B|/|A| >= 0.75 with doc_a the contained side — the asymmetric
    complement of Jaccard (a paragraph pasted into a long page scores
    ~1 here but near 0 on Jaccard). Same single inverted-index join;
    both directions projected without a second join."""
    return D.containment_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=3, threshold=0.75
    )


@query(
    "dedup_drop_contained",
    f"""
    WITH {_DOC_SHINGLES},
    _dc_sizes AS (SELECT doc, COUNT(*) AS n FROM ds GROUP BY doc),
    _dc_inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
                  FROM ds a JOIN ds b USING (shingle)
                  WHERE a.doc < b.doc
                  GROUP BY 1, 2),
    _dc_both AS (SELECT doc_a, doc_b, n_common, sa.n AS size_a, sb.n AS size_b
                 FROM _dc_inter
                 JOIN _dc_sizes sa ON _dc_inter.doc_a = sa.doc
                 JOIN _dc_sizes sb ON _dc_inter.doc_b = sb.doc),
    _dc_dropped AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM _dc_both
        WHERE CAST(n_common AS DOUBLE) / size_a >= 0.75
          AND (size_b > size_a OR (size_b = size_a AND doc_b < doc_a))
        UNION ALL
        SELECT doc_b AS doc_id FROM _dc_both
        WHERE CAST(n_common AS DOUBLE) / size_b >= 0.75
          AND (size_a > size_b OR (size_a = size_b AND doc_a < doc_b))
      )
    )
    SELECT d.doc_id, d.source, d.lang
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM _dc_dropped x WHERE x.doc_id = d.doc_id)
    """,
)
def q_dedup_drop_contained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end containment dedup: the corpus minus every doc
    (near-)contained in a strictly larger doc (equal sizes keep the min
    id — the exact-dedup rule). One inverted-index pass + one anti-join."""
    from ..operators._cache import adopt_lifetime

    kept = D.drop_contained_docs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=3, threshold=0.75
    )
    # the projection wraps the operator result — adopt it so the
    # persisted shingle set survives to execution (r13 persist audit)
    return adopt_lifetime(kept.select("doc_id", "source", "lang"), kept)


# Affine MinHash family (one md5-derived 32-bit base hash per shingle,
# then sig_j = MIN((A_j*h + B_j) % P)) — mirrors operators/dedup.py
_MINHASH_HS = (
    "hs AS (SELECT doc, CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS h FROM ds)"
)
_SIG_COLS = ", ".join(
    f"MIN(({a} * h + {b}) % {D.MINHASH_P}) AS sig_{j}"
    for j, (a, b) in enumerate(D.minhash_params(8))
)


@query(
    "dedup_minhash_signatures",
    f"""
    WITH {_DOC_SHINGLES}, {_MINHASH_HS}
    SELECT doc, {_SIG_COLS} FROM hs GROUP BY doc
    """,
)
def q_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-hash MinHash signatures (seeded-md5 min over 3-gram shingles)."""
    return D.minhash_signatures(
        _t(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=8, k=3
    )


_BAND0 = (
    "md5(CAST(sig_0 AS VARCHAR) || '|' || CAST(sig_1 AS VARCHAR) || '|' || "
    "CAST(sig_2 AS VARCHAR) || '|' || CAST(sig_3 AS VARCHAR))"
)
_BAND1 = (
    "md5(CAST(sig_4 AS VARCHAR) || '|' || CAST(sig_5 AS VARCHAR) || '|' || "
    "CAST(sig_6 AS VARCHAR) || '|' || CAST(sig_7 AS VARCHAR))"
)


@query(
    "dedup_minhash_lsh",
    f"""
    WITH {_DOC_SHINGLES}, {_JACCARD_FROM_DS}, {_MINHASH_HS},
    sig AS (SELECT doc, {_SIG_COLS} FROM hs GROUP BY doc),
    banded AS (SELECT doc, {_BAND0} AS band_0, {_BAND1} AS band_1 FROM sig),
    cand AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b
      FROM banded a JOIN banded b ON a.band_0 = b.band_0 WHERE a.doc < b.doc
      UNION
      SELECT a.doc AS doc_a, b.doc AS doc_b
      FROM banded a JOIN banded b ON a.band_1 = b.band_1 WHERE a.doc < b.doc
    )
    SELECT jac.doc_a, jac.doc_b, n_common, size_a, size_b, jaccard
    FROM cand JOIN jac ON cand.doc_a = jac.doc_a AND cand.doc_b = jac.doc_b
    WHERE jaccard >= 0.5
    """,
)
def verified_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-verified near-dup pair set (8 hashes, 2 bands, k=3,
    jaccard >= 0.5) — built once per (session, dataset) and shared by
    ``dedup_minhash_lsh`` and the connected-components label memo in
    ``plans/analytics.py`` (one banded-join pipeline instead of two)."""
    from ._memo import dataset_memo

    return dataset_memo(
        spark, sf_dir, "lsh_pairs:h8:b2:k3:t0.5",
        lambda: D.minhash_lsh_pairs(
            _t(spark, sf_dir, "documents"), "doc_id", "text",
            num_hashes=8, bands=2, k=3, threshold=0.5,
        ),
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates (2 bands x 4 rows) verified by exact
    Jaccard; the pair frame is memoized per dataset (see
    :func:`verified_lsh_pairs`)."""
    return verified_lsh_pairs(spark, sf_dir)


_H16 = X.token_hash16_sql("token")
_VOTES = ", ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{b}" for b in range(16)
)
_SIMHASH_VAL = " + ".join(f"(CASE WHEN v_{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))


@query(
    "dedup_simhash",
    f"""
    WITH tok AS (SELECT doc, token
                 FROM (SELECT doc_id AS doc, unnest({_TOK}) AS token FROM documents)),
    h AS (SELECT doc, {_H16} AS h FROM tok),
    votes AS (SELECT doc, {_VOTES} FROM h GROUP BY doc)
    SELECT doc, CAST({_SIMHASH_VAL} AS BIGINT) AS simhash FROM votes
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signatures over the token multiset."""
    return D.simhash_signatures(_t(spark, sf_dir, "documents"), "doc_id", "text", bits=16)


@query(
    "dedup_simhash_pairs_legacy16",
    f"""
    WITH tok AS (SELECT doc, token
                 FROM (SELECT doc_id AS doc, unnest({_TOK}) AS token FROM documents)),
    h AS (SELECT doc, {_H16} AS h FROM tok),
    votes AS (SELECT doc, {_VOTES} FROM h GROUP BY doc),
    sig AS (SELECT doc, CAST({_SIMHASH_VAL} AS BIGINT) AS simhash FROM votes),
    s AS (SELECT doc, simhash, simhash // 256 AS hi, simhash % 256 AS lo FROM sig),
    cand AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, a.simhash AS sim_a, b.simhash AS sim_b
      FROM s a JOIN s b ON a.hi = b.hi WHERE a.doc < b.doc
      UNION
      SELECT a.doc AS doc_a, b.doc AS doc_b, a.simhash AS sim_a, b.simhash AS sim_b
      FROM s a JOIN s b ON a.lo = b.lo WHERE a.doc < b.doc
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
    """,
)
def q_dedup_simhash_pairs_legacy16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEGACY 16-bit SimHash near-dup pairs (half-signature pigeonhole
    candidates, exact hamming verify). Kept as an oracle pin only: the
    256-value band buckets grow candidates ~N^2/256 and the pigeonhole
    guarantee covers hamming <= 1. The primary `dedup_simhash_pairs` is
    the 64-bit banded version (full recall hamming <= 3, 2^16-cardinality
    band keys)."""
    return D.simhash_near_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", bits=16, max_hamming=3
    )


# 64-bit SimHash: 4 independent 16-bit part-hashes from one md5 per token,
# 64 bit-vote sums, parts double as the LSH bands (full recall, hamming<=3).
_H64 = {k: X.token_hash16_at_sql("token", k) for k in range(D.SIMHASH64_PARTS)}
_VOTES64 = ", ".join(
    f"SUM(CASE WHEN (h{k} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{k}_{b}"
    for k in range(D.SIMHASH64_PARTS)
    for b in range(16)
)
_PARTS64 = ", ".join(
    "CAST("
    + " + ".join(f"(CASE WHEN v_{k}_{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    + f" AS BIGINT) AS p{k}"
    for k in range(D.SIMHASH64_PARTS)
)
_HAMMING64 = " + ".join(
    f"bit_count(xor(a.p{k}, b.p{k}))" for k in range(D.SIMHASH64_PARTS)
)
_BAND_MATCH64 = " OR ".join(f"a.p{k} = b.p{k}" for k in range(D.SIMHASH64_PARTS))


_SIMHASH64_ORACLE = f"""
    WITH tok AS (SELECT doc, token
                 FROM (SELECT doc_id AS doc, unnest({_TOK}) AS token FROM documents)),
    h AS (SELECT doc, {', '.join(f'{sql} AS h{k}' for k, sql in _H64.items())} FROM tok),
    votes AS (SELECT doc, {_VOTES64} FROM h GROUP BY doc),
    sig AS (SELECT doc, {_PARTS64} FROM votes)
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST({_HAMMING64} AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON ({_BAND_MATCH64}) AND a.doc < b.doc
    WHERE {_HAMMING64} <= 3
    """


@query("dedup_simhash_pairs", _SIMHASH64_ORACLE)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs — the PRIMARY name, 64-bit banded: 4x16-bit
    pigeonhole bands (FULL recall for hamming <= 3, band-key cardinality
    2^16 so candidate growth stays linear at corpus scale), exact hamming
    verify over the parts. The superseded 16-bit recipe survives as
    `dedup_simhash_pairs_legacy16`."""
    return D.simhash64_near_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


@query("dedup_simhash64_pairs", _SIMHASH64_ORACLE)
def q_dedup_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias of `dedup_simhash_pairs` (kept so the round-2 CORRECTNESS /
    bench name continues to resolve)."""
    return q_dedup_simhash_pairs(spark, sf_dir)


@query(
    "dedup_embedding_cosine",
    f"""
    WITH {_EMB_DOUBLE}
    SELECT * FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COSINE_AB} AS cosine
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    ) WHERE cosine >= 0.4
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: exact all-pairs cosine >= 0.4 via the
    DISTRIBUTED blocked grid (no driver-side vector materialization)."""
    return S.cosine_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.4
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "sim_topk_cosine",
    f"""
    WITH {_EMB_DOUBLE},
    scored AS (
      SELECT b.vec_id AS query_id, a.vec_id AS cand_id, {_COSINE_AB} AS cosine
      FROM e a JOIN e b ON b.vec_id < 10 AND a.vec_id <> b.vec_id
    )
    SELECT query_id, cand_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
)
def q_sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors vec_id < 10."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.cosine_topk(
        emb,
        "vec_id",
        "embedding",
        query_df=emb.filter(F.col("vec_id") < 10),
        top_k=5,
    )


_BUCKET_SQL = " + ".join(f"(CASE WHEN v[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)" for i in range(8))


@query(
    "sim_lsh_bucketed",
    f"""
    WITH {_EMB_DOUBLE},
    kb AS (SELECT vec_id, v, CAST({_BUCKET_SQL} AS BIGINT) AS bucket FROM e)
    SELECT * FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COSINE_AB} AS cosine
      FROM kb a JOIN kb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.3
    """,
)
def q_sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bucketed LSH near-neighbor pairs (the scale path: same-bucket
    candidates only, cosine >= 0.3)."""
    return S.cosine_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        threshold=0.3,
        bucketed=True,
        planes=8,
    )


_COS = (
    "ROUND(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


# shared by sim_ivf_topk (direct path) and sim_ivf_index_topk (persisted
# index) — the two Spark plans are pytest-pinned to identical output, so
# one oracle serves both.
_IVF_TOPK_SQL = f"""
    WITH {_EMB_DOUBLE},
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
    scored AS (
      SELECT e.vec_id AS id, e.v, cent.cid,
             {_COS.format(a='e.v', b='cent.cv')} AS sim
      FROM e CROSS JOIN cent),
    ranked AS (
      SELECT id, v, cid,
             row_number() OVER (PARTITION BY id ORDER BY sim DESC, cid) AS rn
      FROM scored),
    cand AS (SELECT id AS cand_id, v AS cand_v, cid FROM ranked WHERE rn = 1),
    probe AS (SELECT id AS query_id, v AS query_v, cid
              FROM ranked WHERE rn <= 2 AND id < 10),
    pair AS (
      SELECT p.query_id, c.cand_id,
             {_COS.format(a='p.query_v', b='c.cand_v')} AS cosine
      FROM probe p JOIN cand c ON p.cid = c.cid AND c.cand_id <> p.query_id)
    SELECT query_id, cand_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS BIGINT) AS rank
    FROM pair QUALIFY rank <= 5
    """


@query("sim_ivf_topk", _IVF_TOPK_SQL)
def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (16 deterministic seed cells, nprobe=2) for
    query vectors vec_id < 10 — the partition-pruned ANN scale path."""
    return S.ivf_topk(
        _t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        query_ids_below=10,
        n_centroids=16,
        nprobe=2,
        top_k=5,
    )


@query("sim_ivf_index_topk", _IVF_TOPK_SQL)
def q_sim_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same IVF top-5 answered from the PERSISTED index — the serving
    flow a real deployment hits first: build once into a centroid-
    partitioned parquet layout (cached per sf_dir), then probe nprobe=2
    cells per query with partition pruning on cid, so query cost is
    ~nprobe/n_centroids of the corpus regardless of snapshot size.
    Oracle-identical to the direct path by construction."""
    from ..sources.files import cached_index_dir

    emb = _t(spark, sf_dir, "embeddings")
    idx = cached_index_dir(
        "ivf", sf_dir, "c16",
        lambda p: S.ivf_build_index(emb, "vec_id", "embedding", p, n_centroids=16),
        layout_version=S.IVF_LAYOUT_VERSION,
    )
    return S.ivf_query_index(
        spark, idx, emb.filter(F.col("vec_id") < 10),
        "vec_id", "embedding", nprobe=2, top_k=5,
    )


@query(
    "sim_ivf_recall_eval",
    f"""
    WITH {_EMB_DOUBLE},
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
    scored AS (
      SELECT e.vec_id AS id, e.v, cent.cid,
             {_COS.format(a='e.v', b='cent.cv')} AS sim
      FROM e CROSS JOIN cent),
    ranked AS (
      SELECT id, v, cid,
             row_number() OVER (PARTITION BY id ORDER BY sim DESC, cid) AS rn
      FROM scored),
    cand AS (SELECT id AS cand_id, v AS cand_v, cid FROM ranked WHERE rn = 1),
    probe AS (SELECT id AS query_id, v AS query_v, cid
              FROM ranked WHERE rn <= 2 AND id < 10),
    pair AS (
      SELECT p.query_id, c.cand_id,
             {_COS.format(a='p.query_v', b='c.cand_v')} AS cosine
      FROM probe p JOIN cand c ON p.cid = c.cid AND c.cand_id <> p.query_id),
    ivf AS (
      SELECT query_id, cand_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM pair QUALIFY rank <= 5),
    bf AS (
      SELECT qe.vec_id AS query_id, ce.vec_id AS cand_id,
             row_number() OVER (PARTITION BY qe.vec_id
                                ORDER BY {_COS.format(a='qe.v', b='ce.v')} DESC,
                                         ce.vec_id) AS rn
      FROM e qe JOIN e ce ON ce.vec_id <> qe.vec_id
      WHERE qe.vec_id < 10),
    truth AS (SELECT query_id, cand_id FROM bf WHERE rn <= 5),
    m AS (
      SELECT t.query_id, COUNT(*) AS n_true,
             SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      FROM truth t LEFT JOIN ivf i
        ON t.query_id = i.query_id AND t.cand_id = i.cand_id
      GROUP BY 1),
    r AS (SELECT query_id, n_hit * 1000000 // n_true AS recall_ppm FROM m)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(5 AS BIGINT) AS k,
           CAST(SUM(recall_ppm) // COUNT(*) AS BIGINT) AS mean_recall_ppm,
           CAST(MIN(recall_ppm) AS BIGINT) AS min_recall_ppm
    FROM r
    """,
)
def q_sim_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN TUNING LOOP (the similarity-leg mirror of
    ``dedup_lsh_eval``): recall@5 of the IVF probe (16 cells, nprobe=2)
    against brute-force exact top-5 over the same queries, in exact ppm
    integers — one row (n_queries, k, mean_recall_ppm, min_recall_ppm).
    Operationally this runs on a SAMPLE to pick (n_centroids, nprobe)
    before committing the 100 TB index build; mean tracks aggregate
    quality, min exposes the worst query (a cell-boundary victim mean
    alone would hide)."""
    from ..operators._cache import persist_for_scale, unpersist_with

    emb = _t(spark, sf_dir, "embeddings")
    # the brute-force cosine truth is consumed twice (per-query totals +
    # the hit semi-join) — without a persist each consumer re-runs the
    # full crossJoin + rank window per corpus pass (r13, guide §5;
    # persist size-gated — see persist_for_scale; lifecycle tied to the
    # returned frame per the _cache convention)
    truth = persist_for_scale(
        S.cosine_topk(
            emb, "vec_id", "embedding",
            query_df=emb.filter(F.col("vec_id") < 10), top_k=5,
        ).select("query_id", "cand_id"),
        emb,
    )
    approx = S.ivf_topk(
        emb, "vec_id", "embedding",
        query_ids_below=10, n_centroids=16, nprobe=2, top_k=5,
    ).select("query_id", "cand_id")
    per_q = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_true"))
    hits = (
        truth.join(approx, ["query_id", "cand_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    r = per_q.join(hits, "query_id", "left").select(
        F.expr("coalesce(n_hit, 0) * 1000000 div n_true").alias("recall_ppm")
    )
    out = r.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.lit(5).cast("long").alias("k"),
        F.expr("sum(recall_ppm) div count(1)").cast("long").alias("mean_recall_ppm"),
        F.min("recall_ppm").cast("long").alias("min_recall_ppm"),
    )
    return unpersist_with(out, truth)


# ---------------------------------------------------------------------------
# Product quantization (PQ / ADC) — the compressed-store ANN leg
# ---------------------------------------------------------------------------

from ..operators import pq as PQ  # noqa: E402

# the classic 4-bit fast-scan shape: 16 sub-spaces x 16 centroids over
# 4-dim slices = 8 bytes/vector (32x smaller than fp32-64d); measured on
# the synthetic (unclustered gaussian) embeddings this is the recall
# sweet spot per byte — see sim_pq_recall_eval, which IS the tuning loop
_PQ_DIM, _PQ_M, _PQ_KSUB, _PQ_ITERS = 64, 16, 16, 2


def _pq_books(spark: SparkSession, sf_dir: str):
    """Trained codebook, memoized per (session, dataset): m*ksub*dsub
    driver-side ints shared by the three PQ queries (train once, encode/
    scan/eval many — the build-once/serve-many trade the IVF index
    makes)."""
    from ._memo import dataset_memo_obj

    return dataset_memo_obj(
        spark,
        sf_dir,
        f"pq_books_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}",
        lambda: PQ.pq_train(
            _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS,
        ),
    )


def _pq_codes_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoded store (id, codes), memoized alongside the codebook —
    the ADC scan and the recall eval scan the SAME materialized codes
    the codes query emits, as a production serving path would."""
    from ._memo import dataset_memo

    return dataset_memo(
        spark,
        sf_dir,
        f"pq_codes_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}",
        lambda: PQ.pq_encode(
            _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
            _pq_books(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        ),
    )


@query(
    "sim_pq_codes",
    PQ.pq_codes_sql("embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB, _PQ_ITERS),
)
def q_sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantize the embedding store: 16 sub-space codebooks of 16
    centroids over 4-dim slices (the classic 4-bit PQ shape) trained with
    2 exact fixed-point Lloyd rounds — the kmeans_lloyd discipline per
    sub-space, all sub-spaces in ONE (sub, cid, dim)-keyed update shuffle
    per round — then every vector encoded to 16 4-bit codes by
    pure-codegen argmin over literal sub-centroids. 64-dim fp32 → 8
    bytes = a 32x smaller vector store; the oracle replays training +
    encoding bit-for-bit through unrolled CTE chains. Codes emitted CSV
    because the driver harness can't hash list cells (the
    embedding_quantize convention)."""
    out = _pq_codes_frame(spark, sf_dir)
    return out.select(
        F.col("id").alias("vec_id"),
        F.array_join(
            F.transform(F.col("codes"), lambda x: x.cast("string")), ","
        ).alias("codes_csv"),
    )


@query(
    "sim_pq_adc_topk",
    PQ.pq_adc_topk_sql("embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB, _PQ_ITERS),
)
def q_sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-5 over the PQ codes for query vectors
    vec_id < 10 (the Faiss ADC scan): per-query LUTs (m x ksub exact
    BIGINT sub-distances) broadcast against the code table, candidate
    distance = 16 element_at lookups summed in codegen — a dim-length
    dot product per candidate collapses to m table probes, which is what
    makes a 100 TB scan affordable."""
    return PQ.pq_adc_topk(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        _pq_books(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        query_max_id=10, top_k=5, codes=_pq_codes_frame(spark, sf_dir),
    )


@query(
    "sim_ivfpq_topk",
    PQ.ivfpq_topk_sql("embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB, _PQ_ITERS),
)
def q_sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Faiss IVFADC composition — IVF cells (16 deterministic
    seed centroids, nprobe=2) prune the candidate set, then survivors
    are ranked by ADC distance over their PQ CODES: the scan touches
    ~N*nprobe/n_centroids candidates at 8 bytes each, with per-query
    LUTs making every distance 16 table probes. The production 100 TB
    ANN architecture, end to end under the oracle hash gate."""
    return PQ.ivfpq_topk(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        _pq_books(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        n_centroids=16, nprobe=2, query_max_id=10, top_k=5,
        codes=_pq_codes_frame(spark, sf_dir),
    )


_IVFPQ_SQL = PQ.ivfpq_topk_sql(
    "embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB, _PQ_ITERS
)


@query("sim_ivfpq_index_topk", _IVFPQ_SQL)
def q_sim_ivfpq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same IVFADC top-5 answered from the PERSISTED index — cells
    hold 8-byte CODES instead of raw vectors (32x less scan bandwidth
    than the raw-vector IVF index), centroids + codebook ride as bounded
    metadata, reads pin one manifest snapshot. Oracle-identical to the
    direct sim_ivfpq_topk path by construction."""
    from ..sources.files import cached_index_dir

    emb = _t(spark, sf_dir, "embeddings")
    idx = cached_index_dir(
        "ivfpq", sf_dir, f"c16-m{_PQ_M}k{_PQ_KSUB}",
        lambda p: PQ.ivfpq_build_index(
            emb, "vec_id", "embedding", p,
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS, n_centroids=16,
        ),
        layout_version=PQ.IVFPQ_LAYOUT_VERSION,
    )
    return PQ.ivfpq_query_index(
        spark, idx, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, nprobe=2, top_k=5,
    )


def _pq_res_books(spark: SparkSession, sf_dir: str):
    """Residual codebook, memoized like the raw one: trained on each
    nonzero vector's exact fixed-point residual against its IVF cell."""
    from ._memo import dataset_memo_obj

    return dataset_memo_obj(
        spark,
        sf_dir,
        f"pq_res_books_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}",
        lambda: PQ.pq_train(
            PQ.residual_frame(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding"),
            "id", "rv",
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS,
            already_fixed=True,
        ),
    )


def _pq_res_codes_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._memo import dataset_memo

    return dataset_memo(
        spark,
        sf_dir,
        f"pq_res_codes_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}",
        lambda: PQ.pq_encode(
            PQ.residual_frame(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding"),
            "id", "rv", _pq_res_books(spark, sf_dir),
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, already_fixed=True,
        ),
    )


@query(
    "sim_ivfpq_residual_topk",
    PQ.ivfpq_residual_topk_sql("embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB, _PQ_ITERS),
)
def q_sim_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC over RESIDUAL codes — the faithful Faiss recipe: each
    vector's exact fixed-point residual against its cell centroid is
    what gets quantized (within a cell, residuals center near zero, so
    the same 8-byte budget spends its resolution where the data is),
    and the query's LUT is computed per probed cell against ITS
    centroid. Same oracle discipline: training, encoding, per-cell LUTs
    and the scan replay bit-for-bit in DuckDB."""
    return PQ.ivfpq_residual_topk(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        _pq_res_books(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        n_centroids=16, nprobe=2, query_max_id=10, top_k=5,
        codes=_pq_res_codes_frame(spark, sf_dir),
    )


@query(
    "sim_ivfpq_recall_eval",
    PQ.ivfpq_recall_sql("embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB, _PQ_ITERS),
)
def q_sim_ivfpq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Faiss claim, MEASURED: raw-code vs residual-code IVFADC
    recall@5 against exact fixed-point L2 over the same nonzero
    candidate universe, exact ppm integers, two rows — the residual
    variant must earn its extra moving parts in this number or be
    rejected by the tuning loop. On THIS dataset it is rightly
    rejected: the synthetic embeddings are unclustered gaussians and
    the coarse quantizer is the deterministic seed set, so cells don't
    concentrate — residuals come out LARGER than the raw vectors
    (E||x - c||^2 = 2 E||x||^2 for independent gaussians) and measure
    340k vs 140k ppm at sf0.1. That inversion is the point of shipping
    the eval: on clustered real corpora with trained coarse centroids
    the residual variant wins, and this query is how a deployment
    finds out which side of that line its data is on."""
    return PQ.ivfpq_recall_eval(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        _pq_books(spark, sf_dir), _pq_res_books(spark, sf_dir),
        dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        n_centroids=16, nprobe=2, query_max_id=10, top_k=5,
        raw_codes=_pq_codes_frame(spark, sf_dir),
        res_codes=_pq_res_codes_frame(spark, sf_dir),
    )


@query(
    "sim_pq_recall_eval",
    PQ.pq_recall_sql("embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB, _PQ_ITERS),
)
def q_sim_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the ADC scan against EXACT fixed-point squared-L2
    top-5 over the same queries, exact ppm integers (the
    sim_ivf_recall_eval convention) — the tuning-loop measurement that
    picks (m, ksub) on a sample before committing the full-corpus
    encode."""
    return PQ.pq_recall_eval(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        _pq_books(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        query_max_id=10, top_k=5, codes=_pq_codes_frame(spark, sf_dir),
    )


# round 10: trained coarse cells (Faiss's actual default — k-means IVF
# centroids instead of the deterministic seed set)
_CELL_K, _CELL_ITERS = 16, 2


def _ivf_trained_cents(spark: SparkSession, sf_dir: str):
    """Trained coarse centroids, memoized per (session, dataset): k*dim
    fixed-point ints from clustering.kmeans_lloyd — bounded metadata
    shared by the trained-cell topk and the 2x2 recall eval."""
    from ..operators.clustering import kmeans_centroids
    from ._memo import dataset_memo_obj

    return dataset_memo_obj(
        spark,
        sf_dir,
        f"ivf_trained_cents_{_CELL_K}_{_CELL_ITERS}",
        lambda: kmeans_centroids(
            _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
            k=_CELL_K, iters=_CELL_ITERS,
        ),
    )


def _pq_tres_books(spark: SparkSession, sf_dir: str):
    """Residual codebook AGAINST TRAINED CELLS — a different residual
    population than _pq_res_books' (residuals move with the cells), so
    it needs its own training pass."""
    from ._memo import dataset_memo_obj

    return dataset_memo_obj(
        spark,
        sf_dir,
        f"pq_tres_books_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}_{_CELL_K}_{_CELL_ITERS}",
        lambda: PQ.pq_train(
            PQ.trained_residual_frame(
                _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
                _ivf_trained_cents(spark, sf_dir),
            ),
            "id", "rv",
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS,
            already_fixed=True,
        ),
    )


def _pq_tres_codes_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._memo import dataset_memo

    return dataset_memo(
        spark,
        sf_dir,
        f"pq_tres_codes_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}_{_CELL_K}_{_CELL_ITERS}",
        lambda: PQ.pq_encode(
            PQ.trained_residual_frame(
                _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
                _ivf_trained_cents(spark, sf_dir),
            ),
            "id", "rv", _pq_tres_books(spark, sf_dir),
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, already_fixed=True,
        ),
    )


_IVFPQ_TRAINED_SQL = PQ.ivfpq_trained_topk_sql(
    "embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB,
    _PQ_ITERS, n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
)


@query("sim_ivfpq_trained_cells", _IVFPQ_TRAINED_SQL)
def q_sim_ivfpq_trained_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC over TRAINED coarse cells — the same raw PQ codebook and
    codes as sim_ivfpq_topk, but the cells come from integer-Lloyd
    k-means (the Faiss default coarse quantizer) with exact integer-L2
    assignment instead of the deterministic seed set. The k-means chain,
    the ranked assignment, and the ADC scan all replay bit-for-bit in
    the oracle. Cell training is a bounded offline step (k*dim ints of
    model); the serving plan is unchanged — cells prune, codes scan."""
    return PQ.ivfpq_trained_topk(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        _pq_books(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
        nprobe=2, query_max_id=10, top_k=5,
        codes=_pq_codes_frame(spark, sf_dir),
        cents=_ivf_trained_cents(spark, sf_dir),
    )


@query("sim_ivfpq_trained_index_topk", _IVFPQ_TRAINED_SQL)
def q_sim_ivfpq_trained_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained-cell IVFADC top-5 answered from the PERSISTED index
    (layout v2): the centroids table carries metric="l2e6" with the
    k-means fixed-point coordinates, and build/append/query all assign
    by exact integer squared-L2 against them — the serving path of the
    Faiss default, oracle-identical to the direct sim_ivfpq_trained_cells
    chain by construction. The cache key folds IVFPQ_LAYOUT_VERSION, the
    constant this layout change bumped (the r9 staleness fix exercising
    itself)."""
    from ..sources.files import cached_index_dir

    emb = _t(spark, sf_dir, "embeddings")
    idx = cached_index_dir(
        "ivfpq-trained", sf_dir,
        f"c{_CELL_K}i{_CELL_ITERS}-m{_PQ_M}k{_PQ_KSUB}",
        lambda p: PQ.ivfpq_build_index(
            emb, "vec_id", "embedding", p,
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS,
            n_centroids=_CELL_K, cents=_ivf_trained_cents(spark, sf_dir),
        ),
        layout_version=PQ.IVFPQ_LAYOUT_VERSION,
    )
    return PQ.ivfpq_query_index(
        spark, idx, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, nprobe=2, top_k=5,
    )


@query(
    "sim_ivfpq_probe_frontier",
    PQ.ivfpq_probe_frontier_sql(
        "embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB,
        _PQ_ITERS, n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
    ),
)
def q_sim_ivfpq_probe_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe decision table: recall@5 (exact ppm vs exact-L2
    truth) NEXT TO the candidate-pair count each setting scanned, one
    row per nprobe in {1, 2, 4}, over trained cells. nprobe is THE
    serving knob — it buys recall linearly in scan cost — and this
    frontier, run on a sample, is how a deployment places itself on
    that line (the Faiss tuning recipe). One ranked assignment at
    max(nprobe) serves all rows; everything exact integers under the
    oracle gate."""
    return PQ.ivfpq_probe_frontier(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        _pq_books(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
        probes=(1, 2, 4), query_max_id=10, top_k=5,
        codes=_pq_codes_frame(spark, sf_dir),
        cents=_ivf_trained_cents(spark, sf_dir),
    )


@query(
    "sim_ivfpq_operating_point",
    PQ.ivfpq_operating_point_sql(
        "embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB,
        _PQ_ITERS, n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
    ),
)
def q_sim_ivfpq_operating_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frontier DECISION under the oracle gate (r11): the same
    measured nprobe frontier plus ``chosen`` — true on exactly the row
    choose_default_nprobe picks (smallest nprobe within 5% of the best
    mean recall, integer basis-point rule on both engines). This is the
    value ivfpq_build_index persists into the index meta/ table as the
    serving default, so the end-to-end tuning story — measure the
    frontier, choose the point, ship it with the index — is itself
    hash-checked, not asserted."""
    frontier = PQ.ivfpq_probe_frontier(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        _pq_books(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
        probes=(1, 2, 4), query_max_id=10, top_k=5,
        codes=_pq_codes_frame(spark, sf_dir),
        cents=_ivf_trained_cents(spark, sf_dir),
    )
    return PQ.ivfpq_operating_point(frontier)


@query(
    "sim_ivfpq_trained_recall_eval",
    PQ.ivfpq_trained_recall_sql(
        "embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB,
        _PQ_ITERS, n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
    ),
)
def q_sim_ivfpq_trained_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 2x2 Faiss design experiment, measured in exact ppm:
    (raw | residual) codes x (seed | trained) cells against the same
    exact-L2 truth. r9's seed-cell eval showed residual LOSING (seed
    cells don't concentrate, so residuals come out larger than the
    vectors); this eval adds the trained-cell column that the Faiss
    default predicts flips that — and measures whether it does on THIS
    data. Measured at sf0.01: it DOES — residual loses on seed cells
    (320k vs 400k mean ppm) and wins on trained cells (280k vs 260k),
    the Faiss prediction in one table. (Trained cells trail seed cells
    in absolute recall here because balanced k-means cells over
    unclustered gaussians shrink each probe's candidate pool — the
    recall-per-scanned-byte trade the nprobe knob exists to buy back.)
    Four rows, one oracle, every chain replayed bit-for-bit."""
    return PQ.ivfpq_trained_recall_eval(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        _pq_books(spark, sf_dir), _pq_res_books(spark, sf_dir),
        _pq_tres_books(spark, sf_dir),
        dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
        nprobe=2, query_max_id=10, top_k=5,
        raw_codes=_pq_codes_frame(spark, sf_dir),
        res_codes=_pq_res_codes_frame(spark, sf_dir),
        tres_codes=_pq_tres_codes_frame(spark, sf_dir),
        cents=_ivf_trained_cents(spark, sf_dir),
    )


# round 12: OPQ — rotate before you quantize (Ge et al. 2014). The
# hash-gated catalog form uses the diagonal-parametric rotation (an
# exact-integer variance-balancing axis permutation both engines derive
# independently); the non-parametric Procrustes form lives in the
# layout-v4 index path (operators/opq.py, pytest-pinned).
from ..operators import opq as OPQ  # noqa: E402


def _opq_perm(spark: SparkSession, sf_dir: str) -> list:
    """The learned axis permutation (perm[dst] = src), memoized per
    (session, dataset): dim rows of exact-integer variance aggregates
    reach the driver, nothing else."""
    from ._memo import dataset_memo_obj

    return dataset_memo_obj(
        spark,
        sf_dir,
        f"opq_perm_{_PQ_DIM}_{_PQ_M}",
        lambda: OPQ.opq_axis_permutation(
            _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
            dim=_PQ_DIM, m=_PQ_M,
        ),
    )


def _opq_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding table in OPQ-rotated (axis-permuted) space — the
    input to the whole permuted half of the 2x2x2 eval."""
    return OPQ.apply_axis_permutation(
        _t(spark, sf_dir, "embeddings"), "embedding",
        _opq_perm(spark, sf_dir),
    )


def _opq_books(spark: SparkSession, sf_dir: str):
    """Raw codebook in rotated space. NOT a permutation of _pq_books:
    the sub-space GROUPING changes, which is the entire point of OPQ."""
    from ._memo import dataset_memo_obj

    return dataset_memo_obj(
        spark, sf_dir, f"opq_books_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}",
        lambda: PQ.pq_train(
            _opq_emb(spark, sf_dir), "vec_id", "embedding",
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS,
        ),
    )


def _opq_codes_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._memo import dataset_memo

    return dataset_memo(
        spark, sf_dir, f"opq_codes_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}",
        lambda: PQ.pq_encode(
            _opq_emb(spark, sf_dir), "vec_id", "embedding",
            _opq_books(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        ),
    )


def _opq_res_books(spark: SparkSession, sf_dir: str):
    from ._memo import dataset_memo_obj

    return dataset_memo_obj(
        spark, sf_dir, f"opq_res_books_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}",
        lambda: PQ.pq_train(
            PQ.residual_frame(_opq_emb(spark, sf_dir), "vec_id", "embedding"),
            "id", "rv",
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS,
            already_fixed=True,
        ),
    )


def _opq_res_codes_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._memo import dataset_memo

    return dataset_memo(
        spark, sf_dir, f"opq_res_codes_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}",
        lambda: PQ.pq_encode(
            PQ.residual_frame(_opq_emb(spark, sf_dir), "vec_id", "embedding"),
            "id", "rv", _opq_res_books(spark, sf_dir),
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, already_fixed=True,
        ),
    )


def _opq_cents(spark: SparkSession, sf_dir: str):
    """Trained coarse cells in rotated space (rotation changes nothing
    about L2 geometry, but the integer Lloyd rounds see permuted
    coordinates, so the cells must be retrained to match the oracle's
    permuted chain)."""
    from ..operators.clustering import kmeans_centroids
    from ._memo import dataset_memo_obj

    return dataset_memo_obj(
        spark, sf_dir, f"opq_cents_{_CELL_K}_{_CELL_ITERS}",
        lambda: kmeans_centroids(
            _opq_emb(spark, sf_dir), "vec_id", "embedding",
            k=_CELL_K, iters=_CELL_ITERS,
        ),
    )


def _opq_tres_books(spark: SparkSession, sf_dir: str):
    from ._memo import dataset_memo_obj

    return dataset_memo_obj(
        spark, sf_dir,
        f"opq_tres_books_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}_{_CELL_K}_{_CELL_ITERS}",
        lambda: PQ.pq_train(
            PQ.trained_residual_frame(
                _opq_emb(spark, sf_dir), "vec_id", "embedding",
                _opq_cents(spark, sf_dir),
            ),
            "id", "rv",
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS,
            already_fixed=True,
        ),
    )


def _opq_tres_codes_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._memo import dataset_memo

    return dataset_memo(
        spark, sf_dir,
        f"opq_tres_codes_{_PQ_M}_{_PQ_KSUB}_{_PQ_ITERS}_{_CELL_K}_{_CELL_ITERS}",
        lambda: PQ.pq_encode(
            PQ.trained_residual_frame(
                _opq_emb(spark, sf_dir), "vec_id", "embedding",
                _opq_cents(spark, sf_dir),
            ),
            "id", "rv", _opq_tres_books(spark, sf_dir),
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, already_fixed=True,
        ),
    )


@query(
    "sim_opq_recall_eval",
    OPQ.opq_recall_sql(
        "embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB,
        _PQ_ITERS, n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
    ),
)
def q_sim_opq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2x2x2 OPQ experiment (r12): the full trained 2x2 —
    (raw | residual) codes x (seed | trained) cells — run with and
    without the OPQ rotation, eight rows against the same exact-L2
    truth (orthogonal transforms preserve L2, so the base and rotated
    halves share ground truth by construction). The rotation here is
    the diagonal-parametric OPQ: dims ranked by EXACT integer variance
    and snake-drafted across sub-spaces — an orthogonal permutation
    both engines learn independently, which is what lets the whole
    experiment (learning included) ride the hash gate. The
    non-parametric Procrustes rotation ships in the layout-v4 index
    path (opq_train_rotation + ivfpq_build_index(rotation=...)),
    pinned by tests/test_opq.py."""
    from ..operators._cache import adopt_lifetime, persist_for_scale, unpersist_with

    # ONE exact-L2 truth serves BOTH halves (r13): the axis permutation
    # preserves integer squared-L2 term-for-term (rounding is
    # per-element, the sum is order-independent), so the base and
    # rotated truths are the same relation — computing it per half ran
    # the crossJoin+window pass twice for identical rows. Invariance is
    # pinned by test_opq's truth-invariance test; the persist is
    # size-gated (persist_for_scale) and its lifecycle tied to the
    # returned union per the _cache convention.
    emb = _t(spark, sf_dir, "embeddings")
    truth = persist_for_scale(
        PQ.recall_truth(emb, "vec_id", "embedding", query_max_id=10, top_k=5),
        emb,
    )
    base = PQ.ivfpq_trained_recall_eval(
        emb, "vec_id", "embedding",
        _pq_books(spark, sf_dir), _pq_res_books(spark, sf_dir),
        _pq_tres_books(spark, sf_dir),
        dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
        nprobe=2, query_max_id=10, top_k=5,
        raw_codes=_pq_codes_frame(spark, sf_dir),
        res_codes=_pq_res_codes_frame(spark, sf_dir),
        tres_codes=_pq_tres_codes_frame(spark, sf_dir),
        cents=_ivf_trained_cents(spark, sf_dir),
        truth=truth,
    )
    opq = PQ.ivfpq_trained_recall_eval(
        _opq_emb(spark, sf_dir), "vec_id", "embedding",
        _opq_books(spark, sf_dir), _opq_res_books(spark, sf_dir),
        _opq_tres_books(spark, sf_dir),
        dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
        nprobe=2, query_max_id=10, top_k=5,
        raw_codes=_opq_codes_frame(spark, sf_dir),
        res_codes=_opq_res_codes_frame(spark, sf_dir),
        tres_codes=_opq_tres_codes_frame(spark, sf_dir),
        cents=_opq_cents(spark, sf_dir),
        truth=truth,
    )
    result = base.select(F.lit("base").alias("rot"), "*").unionAll(
        opq.select(F.lit("opq").alias("rot"), "*")
    )
    # the halves' own persists (seed assignment + trained pairs) are
    # lifecycle-tied to `base`/`opq`, which this union does NOT
    # reference on the Python side — adopt them so those caches
    # survive until the union executes (r13 persist audit)
    adopt_lifetime(result, base, opq)
    return unpersist_with(result, truth)


@query(
    "sim_opq_trained_index_topk",
    OPQ.opq_trained_topk_sql(
        "embeddings", "vec_id", "embedding", _PQ_DIM, _PQ_M, _PQ_KSUB,
        _PQ_ITERS, n_centroids=_CELL_K, cell_iters=_CELL_ITERS,
    ),
)
def q_sim_opq_trained_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving through a ROTATED layout-v4 index, end-to-end under the
    hash gate (r12): the learned axis permutation — an orthogonal
    rotation matrix — is persisted by ivfpq_build_index into the
    index's rotation/ table; ivfpq_query_index reads it from the
    pinned snapshot and rotates the queries before probing, so the
    whole v4 geometry path (persist -> load -> apply at read) is what
    this query exercises, oracle-identical to the permuted trained
    IVFADC chain by construction. The Procrustes rotation serves the
    same path (same table, same reader) with its gain pinned in
    tests/test_opq.py — SQL can't replay an SVD, a permutation it
    can."""
    from ..sources.files import cached_index_dir

    emb = _t(spark, sf_dir, "embeddings")
    idx = cached_index_dir(
        "opq-trained", sf_dir,
        f"c{_CELL_K}i{_CELL_ITERS}-m{_PQ_M}k{_PQ_KSUB}",
        lambda p: PQ.ivfpq_build_index(
            emb, "vec_id", "embedding", p,
            dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS,
            n_centroids=_CELL_K, cents=_opq_cents(spark, sf_dir),
            rotation=OPQ.permutation_matrix(_opq_perm(spark, sf_dir)),
        ),
        layout_version=PQ.IVFPQ_LAYOUT_VERSION,
    )
    return PQ.ivfpq_query_index(
        spark, idx, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB, nprobe=2, top_k=5,
    )


# ---------------------------------------------------------------------------
# Deterministic sampling / splits
# ---------------------------------------------------------------------------

from ..operators import sampling as SP  # noqa: E402

_SPLIT_BUCKET = SP.hash_bucket_sql("doc_id", 100, "split")
_STRAT_BUCKET = SP.hash_bucket_sql("doc_id", 100, "strat")
_STRAT_RATES = {"en": 10, "zh": 100, "fr": 50}


@query(
    "sample_hash_split",
    f"""
    SELECT doc_id, {_SPLIT_BUCKET} AS bucket,
           CASE WHEN {_SPLIT_BUCKET} < 90 THEN 'train' ELSE 'eval' END AS split
    FROM documents
    """,
)
def q_sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 90/10 train-eval split via salted content-hash buckets
    (partition- and engine-independent, unlike seed-based sample())."""
    return SP.with_split(
        _t(spark, sf_dir, "documents").select("doc_id"), "doc_id", train_pct=90
    )


@query(
    "sample_stratified",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_STRAT_BUCKET} <
          CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 100 WHEN 'fr' THEN 50 ELSE 0 END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing stratified sample: 10% en, 100% zh, 50% fr —
    one filter, no shuffle."""
    return SP.stratified_sample(
        _t(spark, sf_dir, "documents").select("doc_id", "lang"),
        "doc_id",
        "lang",
        _STRAT_RATES,
        default_pct=0,
    )


@query(
    "text_quality_summary",
    f"""
    WITH q AS (SELECT lang, {X.quality_sql('text')['n_tokens']} AS n_tokens
               FROM documents)
    SELECT lang,
           COUNT(*) AS n_docs,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens,
           ROUND(quantile_cont(n_tokens, 0.5), 6)  AS p50_tokens,
           ROUND(quantile_cont(n_tokens, 0.9), 6)  AS p90_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
    FROM q GROUP BY lang
    """,
)
def q_text_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-count distribution (exact percentiles; both
    engines use the same linear-interpolation formula on exact ints, one
    final rounding as the cross-engine guard)."""
    docs = _t(spark, sf_dir, "documents").withColumn("_tok", X.tokens(F.col("text")))
    n_tokens = F.size(F.col("_tok")).cast("long")
    base = docs.select("lang", n_tokens.alias("n_tokens"))
    return base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 6).alias("p50_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.9)), 6).alias("p90_tokens"),
        F.round(F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6).alias("avg_tokens"),
    )


_Q = X.quality_sql("text")


@query(
    "curation_pipeline",
    f"""
    WITH q AS (
      SELECT doc_id, lang, text,
             {_Q['n_tokens']} AS n_tokens,
             {_Q['uniq_ratio']} AS uniq_ratio
      FROM documents),
    filtered AS (
      SELECT * FROM q WHERE n_tokens >= 10 AND uniq_ratio >= 0.3),
    kept AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY {X.md5_fingerprint_sql('text')} ORDER BY doc_id) AS _rn
        FROM filtered) WHERE _rn = 1),
    labeled AS (
      SELECT lang,
             CASE WHEN {_SPLIT_BUCKET} < 90 THEN 'train' ELSE 'eval' END AS split,
             n_tokens
      FROM kept)
    SELECT lang, split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM labeled GROUP BY 1, 2
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation flagship: quality filter -> exact dedup (keep
    min id) -> deterministic 90/10 split -> corpus stats per (lang, split).

    Composes the training-data operators into the shape a real pipeline
    runs at 100 TB: every stage is a projection/filter except one window
    (dedup keeper) and the final aggregation — two shuffles total.
    """
    from ..operators.dedup import drop_exact_duplicates

    docs = _t(spark, sf_dir, "documents").withColumn("_tok", X.tokens(F.col("text")))
    qc = X.quality_columns(F.col("text"), tok=F.col("_tok"))
    scored = docs.select(
        "doc_id", "lang", "text",
        qc["n_tokens"].alias("n_tokens"),
        qc["uniq_ratio"].alias("uniq_ratio"),
    )
    filtered = scored.filter((F.col("n_tokens") >= 10) & (F.col("uniq_ratio") >= 0.3))
    kept = drop_exact_duplicates(filtered, "doc_id", "text")
    labeled = SP.with_split(kept, "doc_id", train_pct=90)
    return labeled.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "multimodal_image_meta",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT)               AS n_bytes,
           CAST(strlen(text) % 640 + 1 AS BIGINT)     AS width,
           CAST((strlen(text) * 7) % 480 + 1 AS BIGINT) AS height,
           CAST(3 AS BIGINT)                          AS channels
    FROM documents
    """,
)
def q_multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> image metadata via Arrow mapInPandas (stub decode).

    The oracle checks the *plumbing* (bytes in, schema/values out); the
    decode itself is the deterministic stub documented in
    operators/multimodal.py.
    """
    docs = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.decode_image_meta(docs)


@query(
    "multimodal_audio_frames",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT)        AS n_bytes,
           CAST(strlen(text) // 160 AS BIGINT) AS n_frames,
           CAST(16000 AS BIGINT)               AS sample_rate
    FROM documents
    """,
)
def q_multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> fixed-size frame sampling metadata (stub)."""
    docs = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.sample_audio_frames(docs, frame_bytes=160)


@query(
    "multimodal_image_resize",
    """
    WITH m AS (
      SELECT doc_id,
             CAST(strlen(text) % 640 + 1 AS BIGINT)       AS width,
             CAST((strlen(text) * 7) % 480 + 1 AS BIGINT) AS height
      FROM documents)
    SELECT doc_id, width, height,
           GREATEST(1, width  * 256 // GREATEST(width, height, 256)) AS out_width,
           GREATEST(1, height * 256 // GREATEST(width, height, 256)) AS out_height,
           GREATEST(1, width  * 256 // GREATEST(width, height, 256))
         * GREATEST(1, height * 256 // GREATEST(width, height, 256)) * 3 AS out_bytes
    FROM m
    """,
)
def q_multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + aspect-preserving fit-resize plan (never upscales);
    integer resize math is shared with a real PIL decoder."""
    docs = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.resize_images(docs, target=256)


@query(
    "multimodal_video_frames",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT)                         AS n_bytes,
           CAST(30 AS BIGINT)                                   AS fps,
           CAST(strlen(text) % 9000 + 30 AS BIGINT)             AS n_frames_total,
           CAST((strlen(text) % 9000 + 30 - 1) // 30 + 1 AS BIGINT) AS n_sampled
    FROM documents
    """,
)
def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: every 30th frame of the stub-decoded
    stream (frame 0 always kept)."""
    docs = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.sample_video_frames(docs, stride=30)


_FEATURE_SQL_COLS = ",\n           ".join(
    f"CAST('0x' || substr(md5(text), {4 * j + 1}, 4) AS INT) / 65535.0 AS f{j}"
    for j in range(8)
)


@query(
    "multimodal_features",
    f"""
    SELECT doc_id,
           {_FEATURE_SQL_COLS}
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing: md5-derived 8-dim pseudo-embedding per
    payload (a real encoder slots into the same Arrow batch shape)."""
    docs = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.extract_features(docs, dim=8)


# Fixed left-assoc fold order keeps the doubles bit-identical across
# engines (each term is one product; the sum is 7 IEEE adds in order).
_FDOT = " + ".join(f"a.f{j} * b.f{j}" for j in range(8))
_FNORM_A = "sqrt(" + " + ".join(f"a.f{j} * a.f{j}" for j in range(8)) + ")"
_FNORM_B = "sqrt(" + " + ".join(f"b.f{j} * b.f{j}" for j in range(8)) + ")"


@query(
    "multimodal_feature_topk",
    f"""
    WITH f AS (
      SELECT doc_id,
           {_FEATURE_SQL_COLS}
      FROM documents),
    scored AS (
      SELECT a.doc_id AS query_id, b.doc_id AS cand_id,
             ROUND(({_FDOT}) / ({_FNORM_A} * {_FNORM_B}), 6) AS cosine
      FROM f a JOIN f b ON a.doc_id < 5 AND a.doc_id <> b.doc_id)
    SELECT query_id, cand_id, cosine,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 3
    """,
)
def q_multimodal_feature_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal -> similarity composition: extract pseudo-embeddings from
    the binary payloads, then brute-force cosine top-3 neighbors for query
    docs (doc_id < 5). The query side is broadcast; candidates stream."""
    docs = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    feats = M.extract_features(docs, dim=8)

    def _named(df: DataFrame, prefix: str, idc: str) -> DataFrame:
        return df.select(
            F.col("doc_id").alias(idc), *[F.col(f"f{j}").alias(f"{prefix}{j}") for j in range(8)]
        )

    q = _named(feats.filter(F.col("doc_id") < 5), "q", "query_id")
    c = _named(feats, "c", "cand_id")
    fdot = None
    qsq, csq = None, None
    for j in range(8):
        term = F.col(f"q{j}") * F.col(f"c{j}")
        fdot = term if fdot is None else fdot + term
        qt, ct = F.col(f"q{j}") * F.col(f"q{j}"), F.col(f"c{j}") * F.col(f"c{j}")
        qsq = qt if qsq is None else qsq + qt
        csq = ct if csq is None else csq + ct
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            # same 6-dp rounding guard as cosine(): raw doubles would rely
            # on bit-identical expression association across engines
            F.round(fdot / (F.sqrt(qsq) * F.sqrt(csq)), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Multi-format ingest round-trips (JSONL / CSV)
# ---------------------------------------------------------------------------

_INGEST_ORACLE = """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_text,
           CAST(SUM(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_empty_text,
           CAST(COALESCE(SUM(length(text)), 0) AS BIGINT) AS sum_chars,
           CAST(COALESCE(SUM(length(text)
                  - length(replace(text, chr(10), ''))), 0) AS BIGINT)
             AS n_newlines,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents
    GROUP BY lang
"""


def _ingest_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    from ..sources.files import export_documents_files, read_documents_files

    path = export_documents_files(spark, sf_dir, fmt)
    df = read_documents_files(spark, path, fmt)
    nl = F.expr("length(text) - length(replace(text, '\n', ''))")
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_text"),
        F.sum(F.when(F.col("text") == "", 1).otherwise(0))
        .cast("long")
        .alias("n_empty_text"),
        F.coalesce(F.sum(F.length("text")), F.lit(0))
        .cast("long")
        .alias("sum_chars"),
        F.coalesce(F.sum(nl), F.lit(0)).cast("long").alias("n_newlines"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
    )


@query("ingest_jsonl_roundtrip", _INGEST_ORACLE)
def q_ingest_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-corpus ingest parity, JSON-lines: the documents table is
    materialized as real JSONL part files (build-once fingerprinted
    cache) and read back with an EXPLICIT schema — at 100 TB schema
    inference is a full extra pass, so the reader never infers. The
    per-lang aggregate (doc counts, NULL vs '' disambiguation, char
    sums, embedded-newline counts) must hash-match the oracle computed
    straight from the parquet view, so serialization losses anywhere in
    write->read (unicode, empties, newlines) surface as a mismatch.
    Reference scope: S5/S6's JSON decode path (main.py json loads),
    re-expressed as Spark's native distributed JSONL reader."""
    return _ingest_roundtrip(spark, sf_dir, "jsonl")


@query("ingest_csv_roundtrip", _INGEST_ORACLE)
def q_ingest_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-corpus ingest parity, CSV: same gate as the JSONL twin but
    through the far trickier dialect — the pinned lossless options
    (sources/files._CSV_LOSSLESS) are load-bearing: RFC-4180 quote
    doubling via escape='"', a '\\N' null sentinel so NULL and ''
    survive as distinct values, whitespace trimming disabled both ways,
    and multiLine=true so quoted embedded newlines parse (which makes a
    CSV file non-splittable — the export writes many part files because
    file count IS the read parallelism at scale)."""
    return _ingest_roundtrip(spark, sf_dir, "csv")


@query("ingest_avro_roundtrip", _INGEST_ORACLE)
def q_ingest_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-corpus ingest parity, Avro Object Container Files: the
    documents table is exported as conformant ``.avro`` containers
    (pure-Python OCF writer over the avro_lite wire codec — magic,
    schema metadata, sync-marked deflate/null blocks, codec alternating
    per file so both decode paths run) and read back through Spark's
    ``binaryFile`` source + the container decoder, then aggregated under
    the same oracle as the JSONL/CSV twins. This extends the
    reference's Avro surface (S3/S4: Kafka-framed records,
    utils.py:341-373) to the standard FILE container — the executed
    fallback for clusters without the spark-avro module."""
    return _ingest_roundtrip(spark, sf_dir, "avro")


@query("ingest_jsonl_gz_roundtrip", _INGEST_ORACLE)
def q_ingest_jsonl_gz_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-corpus ingest parity, gzip JSONL — the dominant wire format
    for shipped corpora (.json.gz / .jsonl.gz dumps). Spark's text
    source auto-decompresses by extension, but whole-file gzip is NOT
    splittable: one .gz = one read task no matter its size, so the
    export deliberately writes 8 part files — at 100 TB the part-file
    count (or a recompress-to-zstd-frames step) IS the read
    parallelism, and this query pins that the compressed path loses
    nothing relative to the plain-JSONL twin."""
    return _ingest_roundtrip(spark, sf_dir, "jsonl_gz")


# the r8 charset fixture appends fixed CJK phrases to the id%9∈{2,5,8}
# ASCII bodies (sources/files.py: WARC_CJK_PHRASES) so the statistical
# detection rungs have real script content; every WARC oracle that sums
# body text mirrors that arithmetic with the phrases quoted literally —
# the SQL stays self-evidently in sync with the exporter's bytes
from ..sources.files import WARC_CJK_PHRASES as _CJK  # noqa: E402

_CJK_SUFFIX_CHARS = (
    f" CASE WHEN doc_id % 9 = 2 AND is_ascii AND L > 0"
    f" THEN 1 + length('{_CJK['gb18030']}')"
    f" WHEN doc_id % 9 = 5 AND is_ascii AND L > 0"
    f" THEN 1 + length('{_CJK['shift_jis']}')"
    f" WHEN doc_id % 9 = 8 AND is_ascii AND L > 0"
    f" THEN 1 + length('{_CJK['euc-kr']}')"
    f" WHEN doc_id % 9 = 3 AND is_ascii AND L > 0"
    f" THEN 1 + length('{_CJK['big5']}')"
    f" ELSE 0 END "
)
_CJK_SUFFIX_NL = (
    " CASE WHEN doc_id % 9 IN (2, 3, 5, 8) AND is_ascii AND L > 0"
    " THEN 1 ELSE 0 END "
)


@query(
    "ingest_warc_roundtrip",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             length(COALESCE(text, '')) AS L,
             COALESCE(text, '') AS t,
             strlen(COALESCE(text, '')) = length(COALESCE(text, ''))
               AS is_ascii
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(L + {_CJK_SUFFIX_CHARS}) AS BIGINT) AS sum_chars,
           CAST(SUM(L - length(replace(t, chr(10), ''))
                  + {_CJK_SUFFIX_NL}) AS BIGINT) AS n_newlines,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM d
    GROUP BY source
    """,
)
def q_ingest_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-corpus ingest parity, WARC — the container crawl corpora
    actually arrive in (Common Crawl's ~100 TB .warc.gz dumps): the
    documents table becomes member-gzipped WARC/1.0 response records
    (HTTP envelope, byte-exact Content-Length, percent-encoded source
    in the target URI) and is read back through binaryFile + the
    tolerant parser, then aggregated per source. WARC has no NULL body,
    so the pinned contract is COALESCE(text,'') on BOTH engines (a NULL
    document is an empty fetch). n_docs catches silently dropped or
    malformed records; sum_chars/n_newlines catch any byte-vs-char
    slicing error in the Content-Length handling (bodies are sliced in
    BYTES then decoded)."""
    from ..sources.files import export_documents_files, read_documents_warc

    path = export_documents_files(spark, sf_dir, "warc")
    # split_bytes small enough that every part file fans out into
    # multiple byte-range tasks: the gate exercises gzip-magic resync,
    # not just whole-file decode
    df = read_documents_warc(spark, path, split_bytes=16 * 1024)
    nl = F.expr("length(text) - length(replace(text, '\n', ''))")
    return df.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("sum_chars"),
        F.sum(nl).cast("long").alias("n_newlines"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
    )


@query(
    "ingest_warc_record_types",
    f"""
    WITH d AS (SELECT doc_id, length(COALESCE(text, '')) AS L,
                      strlen(COALESCE(text, '')) = length(COALESCE(text, ''))
                        AS is_ascii
               FROM documents)
    SELECT 'response' AS record_type,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(L + {_CJK_SUFFIX_CHARS}) AS BIGINT) AS sum_body_chars,
           CAST(COUNT(*) AS BIGINT) AS n_status,
           CAST(0 AS BIGINT) AS n_refers,
           CAST(0 AS BIGINT) AS max_malformed
    FROM d
    UNION ALL
    SELECT 'request', CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM d WHERE doc_id % 3 = 0
    UNION ALL
    SELECT 'revisit', CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT),
           CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(0 AS BIGINT)
    FROM d WHERE doc_id % 5 = 0
    UNION ALL
    SELECT 'metadata', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(19 + length(CAST(doc_id % 1000 AS VARCHAR))) AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM d WHERE doc_id % 7 = 0
    """,
)
def q_ingest_warc_record_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC full-fidelity census (round 7, r6 VERDICT ask #6): the
    export now interleaves the record types real Common Crawl segments
    carry — request records for ``id%3==0`` fetches, revisit records
    (crawl-time dedup breadcrumbs with ``WARC-Refers-To``) for
    ``id%5==0``, warc-fields metadata for ``id%7==0`` — and every
    fourth response stores its HTTP body in CHUNKED transfer framing.
    ``read_warc_records`` (splittable byte-range path) must surface all
    of them as uniform rows with zero malformed: counts per type, body
    chars (chunk framing stripped — the de-chunker under the hash
    gate), status/refers_to presence, all replayed by the oracle from
    id arithmetic. The response sums double-check that mixed-type
    interleaving and chunked bodies change NOTHING for the documents
    contract."""
    from ..sources.files import export_documents_files, read_warc_records

    path = export_documents_files(spark, sf_dir, "warc")
    df = read_warc_records(spark, path, split_bytes=16 * 1024)
    return df.groupBy("record_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.sum(F.coalesce(F.col("body_chars"), F.lit(0)))
        .cast("long")
        .alias("sum_body_chars"),
        F.count("status").cast("long").alias("n_status"),
        F.count("refers_to").cast("long").alias("n_refers"),
        F.max("n_malformed").cast("long").alias("max_malformed"),
    )


@query(
    "ingest_warc_charsets",
    f"""
    WITH d AS (
      SELECT doc_id,
             length(COALESCE(text, '')) AS L,
             strlen(COALESCE(text, '')) = length(COALESCE(text, ''))
               AS is_ascii
      FROM documents
    )
    SELECT CASE WHEN doc_id % 9 = 4 THEN 'utf-16'
                WHEN doc_id % 9 = 1 AND is_ascii AND L >= 4 THEN 'utf-16'
                WHEN doc_id % 9 = 2 AND is_ascii AND L > 0 THEN 'gb18030'
                WHEN doc_id % 9 = 3 AND is_ascii AND L > 0 THEN 'big5'
                WHEN doc_id % 9 = 5 AND is_ascii AND L > 0 THEN 'shift_jis'
                WHEN doc_id % 9 = 8 AND is_ascii AND L > 0 THEN 'euc-kr'
                WHEN doc_id % 9 = 7 AND is_ascii THEN 'cp1252'
                ELSE 'utf-8' END AS charset,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(L + {_CJK_SUFFIX_CHARS}) AS BIGINT) AS sum_chars
    FROM d
    GROUP BY 1
    """,
)
def q_ingest_warc_charsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset detection under the hash gate (round 7, extended round 8
    with the statistical rungs, round 9 with Big5 — r8 VERDICT ask #3):
    the WARC fixture ships EIGHT encoding families — BOM'd UTF-16
    undeclared (``id%9==4``), BOM-LESS UTF-16LE undeclared (``id%9==1``,
    the NUL-parity rung), gb18030 / Shift_JIS undeclared (``id%9==2`` /
    ``%9==5``, the East-Asian structural + frequency rung), cp949
    behind a LYING ``charset=latin-1`` declaration (``id%9==8`` — the
    classic mojibake page; the reader must distrust the declaration on
    multi-byte structure), Big5/cp950 behind a LYING
    ``charset=iso-8859-1`` declaration (``id%9==3`` — the
    Traditional-Chinese page whose ASCII-range trail bytes defeat the
    EUC adjacency gate; the Big5 pair-walk + traditional frequency
    anchors must beat both cp1252 and the gb18030 mis-resolve),
    ASCII declared ``windows-1252`` (``%9==7``),
    and declared UTF-8 — and ``read_warc_records``'s detection ladder
    (functions/charset.py: BOM > trusted declaration > BOM-less UTF-16
    > strict UTF-8 > East-Asian statistical > cp1252) must label every
    response correctly AND transcode the body back to the exact
    original text (sum_chars per charset catches a single mojibaked
    character anywhere, including inside chunked bodies; the CJK
    phrase lengths are quoted literally in the oracle). Real crawls
    are ~5-10% legacy encodings with a long East-Asian tail; a
    hard-coded UTF-8 reader silently corrupts all of them — this is
    the gate that prevents that."""
    from ..sources.files import export_documents_files, read_warc_records

    path = export_documents_files(spark, sf_dir, "warc")
    df = read_warc_records(spark, path, split_bytes=16 * 1024)
    return (
        df.filter(F.col("record_type") == "response")
        .groupBy("charset")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("body_chars").cast("long").alias("sum_chars"),
        )
    )


@query(
    "curation_line_dedup",
    """
    WITH src AS (
      SELECT doc_id,
             COALESCE(text, '')
               || chr(10) || 'please accept our cookie policy to continue'
               || CASE WHEN doc_id % 2 = 0
                       THEN chr(10) || 'subscribe to our newsletter for daily updates'
                       ELSE '' END
               || chr(10) || 'doc ' || CAST(doc_id AS VARCHAR)
               || ' retains its own unique trailing line'
               || chr(10) || 'ok' AS t
      FROM documents
    ),
    l AS (
      SELECT doc_id,
             unnest(string_split(t, chr(10))) AS line,
             generate_subscripts(string_split(t, chr(10)), 1) AS pos
      FROM src
    ),
    hot AS (
      SELECT line FROM l WHERE length(line) >= 12
      GROUP BY line HAVING COUNT(*) > 2
    ),
    kept AS (
      SELECT l.doc_id, l.pos, l.line
      FROM l LEFT JOIN hot USING (line) WHERE hot.line IS NULL
    )
    SELECT nl.doc_id,
           CAST(nl.n_lines AS BIGINT) AS n_lines,
           CAST(nl.n_lines - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(k.text_clean, '') AS text_clean
    FROM (SELECT doc_id, COUNT(*) AS n_lines FROM l GROUP BY doc_id) nl
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n_kept,
                      string_agg(line, chr(10) ORDER BY pos) AS text_clean
               FROM kept GROUP BY doc_id) k USING (doc_id)
    """,
)
def q_curation_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-level global dedup (round 7) — the RefinedWeb/C4 boilerplate
    cut document-level dedup cannot make. Every doc gets a shared
    cookie-banner line, half get a shared subscribe prompt, every doc
    gets a unique long trailing line and a short shared 'ok' line; the
    operator must remove exactly the corpus-hot long lines (>2
    occurrences, >=12 chars) from every document while keeping unique
    lines, short repeats, and ANY naturally repeated lines the corpus
    itself contains — the oracle replays the full frequency
    computation, not a formula, so nothing about the source text is
    assumed. ``text_clean`` puts the exact reconstructed text (original
    line order) under the hash gate. One line-frequency shuffle + one
    AQE-broadcast exclusion join + one per-doc rebuild groupBy:
    scale-safe at crawl size (see
    :func:`operators.dedup.drop_repeated_lines`)."""
    from ..operators.dedup import drop_repeated_lines

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\nplease accept our cookie policy to continue"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit("\nsubscribe to our newsletter for daily updates"),
            ).otherwise(F.lit("")),
            F.lit("\ndoc "),
            F.col("doc_id").cast("string"),
            F.lit(" retains its own unique trailing line"),
            F.lit("\nok"),
        ).alias("text"),
    )
    return drop_repeated_lines(
        docs, "doc_id", "text", min_chars=12, max_occurrences=2
    )


@query(
    "quality_repetition_signals",
    """
    WITH src AS (
      SELECT doc_id,
             COALESCE(text, '')
               || CASE WHEN doc_id % 6 = 3
                       THEN repeat(chr(10) || 'repeated filler line for spam', 4)
                       ELSE '' END AS t
      FROM documents
    ),
    l AS (
      SELECT doc_id, unnest(string_split(t, chr(10))) AS line FROM src
    ),
    pl AS (
      SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
      FROM l GROUP BY doc_id, line
    ),
    la AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_lines,
             CAST(SUM(c - 1) AS BIGINT) AS dup_line_occ,
             CAST(SUM((c - 1) * len) AS BIGINT) AS dup_line_chars
      FROM pl GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id, unnest(
               CASE WHEN len(ls) >= 2
                    THEN list_transform(generate_series(1, len(ls) - 1),
                                        i -> ls[i] || ' ' || ls[i + 1])
                    ELSE [] END) AS b
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(t), '\\s+'),
                               x -> x <> '') AS ls
            FROM src)
    ),
    pb AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
    ba AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             CAST(MAX(c) AS BIGINT) AS top_bigram_occ
      FROM pb GROUP BY doc_id
    )
    SELECT la.doc_id, la.n_lines, la.dup_line_occ, la.dup_line_chars,
           CAST(COALESCE(ba.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(ba.top_bigram_occ, 0) AS BIGINT) AS top_bigram_occ
    FROM la LEFT JOIN ba USING (doc_id)
    """,
)
def q_quality_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals (round 7):
    duplicate-line occurrence/character counts and top-bigram dominance
    — the filters that catch machine-generated and templated spam pages
    the length/stopword rules miss. Every sixth doc gets four copies of
    a filler line appended so the duplicate-line path provably fires;
    everything else measures the corpus text as-is, and the oracle
    REPLAYS the full per-doc frequency computation (lines and word
    bigrams) rather than assuming anything about the text. Exact
    integer numerators/denominators only — no float ratio crosses the
    engine boundary. Two (doc, unit)->doc groupBy ladders with map-side
    partial aggregation; no Python."""
    from ..operators.curation import repetition_signals

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 3,
                F.expr("repeat('\nrepeated filler line for spam', 4)"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return repetition_signals(docs)


@query(
    "web_link_graph",
    """
    SELECT doc_id AS src,
           'http://corpus.invalid/doc/' || CAST((doc_id * 3 + 1) % 1000 AS VARCHAR)
             || '?b=2' AS dst,
           'next ' || CAST(doc_id AS VARCHAR) AS anchor,
           CAST(1 AS BIGINT) AS is_internal
    FROM documents
    UNION ALL
    SELECT doc_id,
           'http://other.example/doc/' || CAST(doc_id % 50 AS VARCHAR),
           'other',
           CAST(0 AS BIGINT)
    FROM documents
    """,
)
def q_web_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction -> canonical link graph (round 7): every
    document's synthesized page carries one RELATIVE messy link
    (query junk + utm + fragment, resolved against the page's own URL
    via urljoin) and one absolute cross-host link (case-shifted scheme/
    host, explicit default port, trailing slash); the extractor must
    recover href + anchor text from the nav markup the TEXT extractor
    drops, and the canonicalizer (whole-stage codegen, shared with
    ``web_url_dedup``) must normalize both into the exact canonical
    URLs the oracle replays from id arithmetic. ``is_internal``
    (same-host flag — the crawl-frontier routing decision) comes from
    ``parse_url(HOST)`` on both sides of the edge. This is the feed the
    PageRank/CC/LPA graph family consumes — closing the loop from raw
    HTML to link graph. One Arrow extract stage + codegen
    normalization, no shuffle."""
    from ..functions.text import canonicalize_url
    from ..operators.htmltext import html_links

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    edges = html_links(docs)
    base_host = F.lit("corpus.invalid")
    return edges.select(
        F.col("doc_id").alias("src"),
        canonicalize_url(F.col("href")).alias("dst"),
        F.col("anchor"),
        (
            F.lower(F.try_parse_url(F.col("href"), F.lit("HOST"))) == base_host
        )
        .cast("long")
        .alias("is_internal"),
    )


from ..operators.graph import pagerank_sql as _wg_pagerank_sql  # noqa: E402

_WEB_PR_ITERS = 4
# the oracle replays the fixture's internal-link arithmetic (the same
# id rule web_link_graph's oracle pins: doc i links to (3i+1) % 1000)
_WEB_PR_EDGES = "SELECT doc_id AS src, (doc_id * 3 + 1) % 1000 AS dst FROM documents"


@query(
    "web_graph_pagerank",
    f"""
    WITH RECURSIVE {_wg_pagerank_sql(_WEB_PR_EDGES, 'src', 'dst', _WEB_PR_ITERS)}
    SELECT u AS node, r AS rank_e9 FROM pr WHERE it = {_WEB_PR_ITERS}
    """,
)
def q_web_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the CRAWLED link graph (round 8, r7 VERDICT ask
    #5): the edges come from the real raw-HTML pipeline — synthesized
    pages -> ``html_links`` outlink extraction -> codegen URL
    canonicalization -> internal-edge filter -> node id recovered from
    the canonical URL path — and then the same exact-integer fixed-
    point loop as ``graph_pagerank`` ranks them. The oracle replays
    the fixture's id arithmetic through the shared recursive-CTE twin,
    so a single mis-canonicalized href anywhere in the extraction path
    shifts a rank and trips the hash. This closes the loop
    ``q_web_link_graph``'s docstring promises: raw HTML to crawl
    frontier to graph analytics, end to end. Scale shape: one Arrow
    extract stage, then per-iteration one hash join + one groupBy-sum
    on (node) — identical to the lineitem-graph query, just fed by the
    crawler instead of the warehouse."""
    from ..functions.text import canonicalize_url
    from ..operators.graph import pagerank
    from ..operators.htmltext import html_links

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    edges = html_links(docs)
    internal = edges.filter(
        F.lower(F.try_parse_url(F.col("href"), F.lit("HOST")))
        == F.lit("corpus.invalid")
    )
    e = internal.select(
        F.col("doc_id").alias("src"),
        F.regexp_extract(
            canonicalize_url(F.col("href")), r"/doc/(\d+)", 1
        )
        .cast("long")
        .alias("dst"),
    )
    return pagerank(e, "src", "dst", iterations=_WEB_PR_ITERS)


@query("ingest_orc_roundtrip", _INGEST_ORACLE)
def q_ingest_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-corpus ingest parity, ORC — the other columnar warehouse
    format (Hive-lineage clusters standardize on it). Spark's reader is
    native and splittable with full pushdown/pruning, so unlike the
    text formats there is no dialect to pin — the query's value is the
    round-trip proof that a parquet-centric pipeline can interchange
    with ORC-based lakes losslessly."""
    return _ingest_roundtrip(spark, sf_dir, "orc")


@query("ingest_parquet_ext_roundtrip", _INGEST_ORACLE)
def q_ingest_parquet_ext_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-writer parquet interchange under the oracle gate: the
    documents table is re-materialized by an EXTERNAL writer (pyarrow,
    not Spark's parquet-java) as one directory of part files whose
    compression codec rotates zstd/gzip/snappy/lz4 per file, and
    Spark's native reader must take the mixed-codec tree in one scan
    and reproduce the per-lang aggregate hash-exactly. This is the
    100 TB lake reality the single-writer round-trips can't exercise —
    corpora land from many engines and codec policies (lz4 especially:
    pyarrow emits LZ4_RAW, the variant older parquet-java rejected),
    and a reader that silently mangles one codec's pages must show up
    as a hash mismatch, not a production surprise."""
    return _ingest_roundtrip(spark, sf_dir, "parquet_ext")


_URL_RAW_SQL = """
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
    (CASE WHEN doc_id % 3 = 0
          THEN 'WWW.EXAMPLE' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
          WHEN doc_id % 3 = 1
          THEN 'www.example' || CAST(doc_id % 7 AS VARCHAR) || '.com'
          ELSE 'example' || CAST(doc_id % 7 AS VARCHAR) || '.com' END) ||
    (CASE WHEN doc_id % 7 = 0 THEN ':8080'
          WHEN doc_id % 5 = 0
          THEN CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END
          ELSE '' END) ||
    '/Item/' || CAST(doc_id % 11 AS VARCHAR) ||
    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
    '?utm_source=feed&b=2&a=1' ||
    (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END)
"""


@query(
    "web_url_dedup",
    f"""
    WITH u AS (
      SELECT doc_id,
             {_URL_RAW_SQL} AS raw_url,
             (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
               || '://example' || CAST(doc_id % 7 AS VARCHAR) || '.com'
               || (CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END)
               || '/Item/' || CAST(doc_id % 11 AS VARCHAR)
               || '?a=1&b=2' AS canonical_url
      FROM documents
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM u GROUP BY canonical_url
    """,
)
def q_web_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup over canonicalized page identities — the step a
    crawl pipeline runs BEFORE any content dedup (variant URLs of one
    page collapse without touching the bytes). Each doc id becomes a
    deliberately messy URL (case-shifted scheme/host, optional ``www.``,
    explicit-default vs absent vs non-default ports, trailing-slash
    variants, ``utm_*`` tracking junk, fragments); the Spark side must
    PARSE and normalize the real strings via
    :func:`functions.text.canonicalize_url` (parse_url + array kernels,
    all whole-stage codegen) and group, while the oracle replays the
    canonical form straight from the id arithmetic — so every
    normalization rule (default-port strip, www strip, param sort,
    utm drop, fragment drop, slash trim) sits under the hash gate.
    ``n_variants < n_docs`` whenever distinct messy spellings collide,
    exactly the dedup win the canonicalizer exists to create. One
    shuffle, on the canonical string: scale-safe at crawl size."""
    from ..functions.text import canonicalize_url

    # build the messy URL with Spark's concat over the same CASE parts
    raw = F.expr(
        "concat("
        "CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END, '://', "
        "CASE WHEN doc_id % 3 = 0 "
        "THEN concat('WWW.EXAMPLE', CAST(doc_id % 7 AS STRING), '.COM') "
        "WHEN doc_id % 3 = 1 "
        "THEN concat('www.example', CAST(doc_id % 7 AS STRING), '.com') "
        "ELSE concat('example', CAST(doc_id % 7 AS STRING), '.com') END, "
        "CASE WHEN doc_id % 7 = 0 THEN ':8080' "
        "WHEN doc_id % 5 = 0 "
        "THEN CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END "
        "ELSE '' END, "
        "'/Item/', CAST(doc_id % 11 AS STRING), "
        "CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END, "
        "'?utm_source=feed&b=2&a=1', "
        "CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END)"
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", raw.alias("raw_url")
    )
    return (
        docs.withColumn("canonical_url", canonicalize_url(F.col("raw_url")))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("raw_url").cast("long").alias("n_variants"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
    )


@query(
    "text_nfc_normalize",
    """
    WITH f AS (
      SELECT doc_id,
             text || (CASE CAST(doc_id % 5 AS INT)
                      WHEN 0 THEN 'e' || chr(769)
                      WHEN 1 THEN chr(233)
                      WHEN 2 THEN 'x' || chr(770) || chr(803)
                      ELSE '' END) AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN s IS NULL THEN NULL
                     WHEN nfc_normalize(s) <> s THEN 1 ELSE 0 END
             AS BIGINT) AS changed,
           CAST(length(s) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(s)) AS BIGINT) AS len_nfc
    FROM f
    """,
)
def q_text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC audit (round 6): canonically-equivalent text — the
    same visible string precomposed vs decomposed vs mark-reordered —
    defeats exact-fingerprint dedup, so a corpus pipeline normalizes to
    NFC first. Each doc gets a deterministic suffix exercising the three
    interesting shapes (``e``+U+0301 composes, precomposed U+00E9 is
    already canonical, ``x``+circumflex+dot-below only REORDERS by
    combining class) and the operator reports, per doc, whether NFC
    changed the string and the codepoint lengths before/after. The
    oracle is NOT a formula replay: DuckDB's utf8proc ``nfc_normalize``
    independently normalizes the same strings, so two unrelated Unicode
    implementations (CPython unicodedata vs utf8proc) must agree on
    every document — on the edge tables that includes CJK, emoji and
    RTL text. NULL text stays NULL in both engines (``||`` and
    ``concat`` are both NULL-propagating)."""
    from ..operators.curation import nfc_normalize_stats

    # explicit escapes: decomposed/precomposed forms are visually
    # identical in source, so never write them as naked literals
    suffix_sql = (
        "CASE CAST(doc_id % 5 AS INT) "
        "WHEN 0 THEN 'e\u0301' "  # decomposed: NFC composes to U+00E9
        "WHEN 1 THEN '\u00e9' "   # precomposed: already canonical
        "WHEN 2 THEN 'x\u0302\u0323' "  # NFC only REORDERS (ccc 230>220)
        "ELSE '' END"
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"concat(text, {suffix_sql})").alias("text")
    )
    return nfc_normalize_stats(docs)


@query(
    "ingest_html_extract",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(4 + length(CAST(doc_id AS VARCHAR))
                 + CASE WHEN text IS NULL OR text = '' THEN 0
                        ELSE 1 + length(text) END) AS BIGINT)
             AS sum_extracted_chars,
           CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 0
                         ELSE 1 + length(text)
                              - length(replace(text, chr(10), '')) END)
             AS BIGINT) AS sum_extracted_newlines
    FROM documents
    GROUP BY lang
    """,
)
def q_ingest_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-content extraction under the oracle gate — the step
    between WARC ingest and text curation: every document becomes a
    deterministic page (escaped content inside <h1>/<p> blocks, PLUS
    the boilerplate an extractor must drop: a script, a stylesheet, a
    comment containing fake <p> markup, and nav-menu text outside
    content tags) and the stdlib-parser extractor must recover EXACTLY
    'Doc <id>' plus the original lines — entity decoding, inline-tag
    merging, script/comment suppression all under one hash check. The
    oracle computes the expected char/newline sums straight from the
    original text without ever seeing HTML."""
    from ..operators.htmltext import html_extract_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    stats = html_extract_stats(docs)
    return stats.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("extracted_chars").cast("long").alias("sum_extracted_chars"),
        F.sum("extracted_newlines").cast("long").alias("sum_extracted_newlines"),
    )
