"""Optimized Product Quantization (OPQ): rotate before you quantize.

PQ's quantization error depends on how the dim coordinates are grouped
into the m sub-spaces — correlated or unbalanced-variance dimensions
that straddle sub-space boundaries waste code entropy. OPQ (Ge et al.,
"Optimized Product Quantization", TPAMI 2014) learns an orthogonal
transform R and quantizes y = x @ R instead; orthogonality preserves
L2 distances, so ADC search semantics are unchanged while the codes
fit the data better. Two forms here, mirroring the paper:

1. **Non-parametric OPQ** (:func:`opq_train_rotation`): the paper's
   alternating minimization — PQ-encode under the current R, then
   solve the orthogonal Procrustes problem min_R ||X R - Y_hat||_F
   (SVD of the dim x dim scatter X^T Y_hat on the driver; the scatter
   itself is accumulated as EXACT int64 partials from fixed-point
   vectors and decoded codes, so the learned R is deterministic). This
   is the index-build form: persisted into the IVFADC tree as layout
   v4's ``rotation/`` table (pq.ivfpq_build_index) and applied by
   append/query automatically.

2. **Parametric (diagonal) OPQ** (:func:`opq_axis_permutation`): under
   the paper's parametric Gaussian model, R = eigenbasis +
   eigenvalue allocation balancing variance across sub-spaces. With a
   diagonal covariance model the eigenbasis IS the coordinate axes and
   the allocation reduces to a snake draft over per-dimension
   variances — an orthogonal PERMUTATION matrix learned in exact
   integer arithmetic, replayable bit-for-bit by the DuckDB oracle
   (:func:`opq_axis_permutation_ctes` / :func:`opq_recall_sql`). This
   is the hash-gated catalog form (`sim_opq_recall_eval`): the 2x2
   Faiss experiment — (raw | residual) codes x (seed | trained) cells —
   extended to 2x2x2 with the +-OPQ axis.

Scale shape: rotation application is a map-only Arrow matmul
(pq.rotate_vectors — no shuffle); permutation learning is ONE skinny
(dim-keyed) aggregation over exploded elements with a dim-row collect;
Procrustes learning per round costs one pq_train + one encode + one
map-only scatter stage with an n_partitions x dim^2 collect — driver
work is a 64 x 64 SVD. Nothing data-sized ever reaches the driver.

Reference scope: beyond-reference (the reference engine has no vector
search) — part of the SURVEY.md "similarity search" north star next to
pq.py / similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .pq import (
    Codebook,
    _check_dims,
    _fixed_vecs,
    _np_books,
    pq_encode,
    pq_train,
    rotate_vectors,
)

__all__ = [
    "opq_axis_permutation",
    "apply_axis_permutation",
    "permutation_matrix",
    "opq_axis_permutation_ctes",
    "opq_recall_sql",
    "opq_trained_topk_sql",
    "opq_train_rotation",
]


def _snake_sub(r: int, m: int) -> int:
    """Sub-space for variance rank ``r`` under the snake (boustrophedon)
    draft: ranks 0..m-1 go to subs 0..m-1, ranks m..2m-1 come back
    m-1..0, and so on — each sub-space ends up with dim/m dimensions
    whose variance mass is balanced (the eigenvalue-allocation goal)."""
    pos = r % m
    return pos if (r // m) % 2 == 0 else m - 1 - pos


def _perm_from_ranked(ranked_dims: list[int], dim: int, m: int) -> list[int]:
    """perm[dst] = src from the variance-descending dim order: rank r's
    dim goes to sub _snake_sub(r, m), filling each sub's slots in rank
    order. Pure function of the ranking — shared by the Spark learner
    and the pytest pins; the SQL twin applies the identical rule with
    window functions."""
    dsub = dim // m
    fill = [0] * m
    perm = [0] * dim
    for r, src in enumerate(ranked_dims):
        sub = _snake_sub(r, m)
        perm[sub * dsub + fill[sub]] = src
        fill[sub] += 1
    return perm


def opq_axis_permutation(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int,
    scale: int = 1_000_000,
) -> list[int]:
    """Learn the diagonal-parametric OPQ rotation: a permutation
    ``perm`` (perm[dst] = src) balancing per-dimension variance mass
    across the m sub-spaces via a snake draft over dims ranked by
    variance (descending, ties to the lower dim index).

    Exactness: elements snap to 1e-6 fixed point; per-dim variance is
    ranked by the EXACT integer numerator n * sum(x^2) - sum(x)^2,
    accumulated as DECIMAL(38,0) (the HUGEINT twin on the DuckDB side)
    so both engines derive the identical permutation — the property the
    `sim_opq_recall_eval` oracle gate rests on. All rows participate
    (zero vectors included: deterministic on both engines). Bounded
    driver work: the collect is dim rows of aggregates."""
    _check_dims(dim, m)
    xe = F.round(F.col("x").cast("double") * scale).cast("long")
    ex = df.select(F.posexplode(F.col(vec_col)).alias("dim", "x")).select(
        "dim", xe.alias("xe")
    )
    d = "cast(xe as decimal(38,0))"
    stats = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.expr(f"sum({d})").alias("sx"),
        F.expr(f"sum({d} * {d})").alias("sx2"),
    )
    rows = stats.collect()
    if len(rows) != dim:
        raise ValueError(
            f"opq_axis_permutation: expected {dim} dims, saw {len(rows)}"
        )
    var_num = {
        int(r["dim"]): int(r["n"]) * int(r["sx2"]) - int(r["sx"]) ** 2
        for r in rows
    }
    ranked = sorted(range(dim), key=lambda s: (-var_num[s], s))
    return _perm_from_ranked(ranked, dim, m)


def apply_axis_permutation(
    df: DataFrame, vec_col: str, perm: list[int]
) -> DataFrame:
    """``vec_col`` replaced by its permuted form (element dst takes the
    source element perm[dst]) — a static projection, no UDF, no
    shuffle; the element type rides through unchanged."""
    permuted = F.array(*[F.col(vec_col).getItem(int(s)) for s in perm])
    return df.withColumn(vec_col, permuted)


def permutation_matrix(perm: list[int]):
    """The permutation as an orthogonal rotation matrix under the
    row-vector convention (y = x @ P takes element dst from source
    perm[dst]) — the bridge from the oracle-replayable permutation to
    the layout-v4 index path: ``ivfpq_build_index(rotation=
    permutation_matrix(perm))`` persists it like any Procrustes
    rotation, and ``rotate_vectors`` applies it identically to
    :func:`apply_axis_permutation` (pytest-pinned)."""
    import numpy as np

    dim = len(perm)
    if sorted(perm) != list(range(dim)):
        raise ValueError(f"not a permutation of 0..{dim - 1}: {perm}")
    P = np.zeros((dim, dim), dtype=np.float64)
    for dst, src in enumerate(perm):
        P[src, dst] = 1.0
    return P


def opq_axis_permutation_ctes(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int,
    scale: int = 1_000_000,
    out: str = "opqv",
) -> list[str]:
    """DuckDB twin of learn+apply: CTEs computing the identical
    variance ranking (HUGEINT exact), snake allocation (window
    functions), and the permuted table ``{out}`` with the same
    (id_col, vec_col) shape as ``table`` — drop-in input for any of
    pq.py's oracle chains."""
    dsub = dim // m
    return [
        f"""opq_el AS (SELECT r.i AS dim,
           CAST(ROUND(CAST({vec_col}[CAST(r.i + 1 AS INT)] AS DOUBLE)
                      * {scale}) AS BIGINT) AS xe
         FROM {table} CROSS JOIN range(0, {dim}) r(i))""",
        """opq_var AS (SELECT dim,
           CAST(COUNT(*) AS HUGEINT) * SUM(CAST(xe AS HUGEINT) * xe)
             - SUM(CAST(xe AS HUGEINT)) * SUM(CAST(xe AS HUGEINT)) AS var_num
         FROM opq_el GROUP BY 1)""",
        """opq_rk AS (SELECT dim,
           row_number() OVER (ORDER BY var_num DESC, dim) - 1 AS r
         FROM opq_var)""",
        f"""opq_sub AS (SELECT dim, r,
           CASE WHEN (r // {m}) % 2 = 0 THEN r % {m}
                ELSE {m} - 1 - (r % {m}) END AS sub
         FROM opq_rk)""",
        f"""opq_perm AS (SELECT dim AS src,
           sub * {dsub} + row_number() OVER (PARTITION BY sub ORDER BY r) - 1
             AS dst
         FROM opq_sub)""",
        # MATERIALIZED is load-bearing, not a hint: DuckDB 1.0 INLINES
        # plain CTEs, so every one of the trained-recall chain's ~15+
        # references to the permuted table would re-expand the whole
        # permutation subtree (a multi-million-row aggregate) into an
        # already-huge plan — the multiplicative blowup OOM'd the
        # allocator at gen-sf0.1 (r12 sweep). Materialized, each
        # reference reads one ~N x dim temp table and the permuted
        # half costs the same as the base half.
        f"""{out} AS MATERIALIZED (SELECT e.{id_col},
           list(e.{vec_col}[CAST(p.src + 1 AS INT)] ORDER BY p.dst)
             AS {vec_col}
         FROM {table} e CROSS JOIN opq_perm p GROUP BY 1)""",
    ]


def opq_recall_sql(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    scale: int = 1_000_000,
    n_centroids: int = 16,
    cell_iters: int = 2,
    nprobe: int = 2,
    query_max_id: int = 10,
    top_k: int = 5,
) -> str:
    """DuckDB twin of the 2x2x2 eval: the full trained-recall chain
    (pq.ivfpq_trained_recall_sql — all four (raw|residual) x
    (seed|trained) chains plus exact truth) run TWICE, once on the raw
    table and once on the axis-permuted ``opqv`` CTE, each half inside
    its own nested WITH (names can repeat), tagged by the ``rot``
    column. The permutation CTEs sit in the outer WITH so both the
    learning and the application replay bit-for-bit."""
    from .pq import ivfpq_trained_recall_sql

    perm_ctes = ",\n    ".join(
        opq_axis_permutation_ctes(table, id_col, vec_col, dim, m, scale)
    )
    base = ivfpq_trained_recall_sql(
        table, id_col, vec_col, dim, m, ksub, iters, scale,
        n_centroids, cell_iters, nprobe, query_max_id, top_k,
    )
    opq = ivfpq_trained_recall_sql(
        "opqv", id_col, vec_col, dim, m, ksub, iters, scale,
        n_centroids, cell_iters, nprobe, query_max_id, top_k,
    )
    return f"""
    WITH {perm_ctes}
    SELECT 'base' AS rot, t.* FROM ({base}) t
    UNION ALL
    SELECT 'opq' AS rot, t.* FROM ({opq}) t
    """


def opq_trained_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    scale: int = 1_000_000,
    n_centroids: int = 16,
    cell_iters: int = 2,
    nprobe: int = 2,
    query_max_id: int = 10,
    top_k: int = 5,
) -> str:
    """DuckDB twin of serving through a layout-v4 ROTATED index: the
    axis permutation learned + applied in CTEs, then the full
    trained-cell IVFADC chain (train, encode, assign, probe, ADC) over
    the permuted vectors — exactly what ivfpq_build_index(rotation=P) +
    ivfpq_query_index compute, since the persisted rotation is applied
    to data at build and to queries at read."""
    from .pq import ivfpq_trained_topk_sql

    perm_ctes = ",\n    ".join(
        opq_axis_permutation_ctes(table, id_col, vec_col, dim, m, scale)
    )
    inner = ivfpq_trained_topk_sql(
        "opqv", id_col, vec_col, dim, m, ksub, iters, scale,
        n_centroids, cell_iters, nprobe, query_max_id, top_k,
    )
    return f"""
    WITH {perm_ctes}
    SELECT * FROM ({inner})
    """


def opq_train_rotation(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    ksub: int = 16,
    pq_iters: int = 2,
    opq_iters: int = 3,
    scale: int = 1_000_000,
):
    """Non-parametric OPQ (Ge et al. 2014, Algorithm 2): alternate
    (a) train + encode a PQ codebook on the rotated vectors y = x @ R,
    (b) re-solve R as the orthogonal Procrustes optimum
    min_R ||X R - Y_hat||_F = U V^T from the SVD of the dim x dim
    scatter G = X^T Y_hat. Returns the learned orthogonal R (float64
    numpy, row-vector convention) — feed it to
    ``pq.ivfpq_build_index(rotation=R)``, which retrains the codebook
    under the final R and persists both (layout v4).

    Determinism + scale: the scatter is accumulated as EXACT int64
    per-partition partials over fixed-point vectors and decoded codes
    (x_e6 * yhat_e6 <= 4e12 per term — safe far past 1e6 rows per
    partition), summed as unbounded Python ints on the driver, so G is
    exact and order-independent; pq_train is already deterministic;
    numpy's LAPACK SVD of the same 64x64 G gives the same R. Driver
    memory: n_partitions x dim^2 longs plus the codebook — bounded."""
    import numpy as np

    _check_dims(dim, m)
    if opq_iters < 1:
        raise ValueError(f"opq_iters must be >= 1: {opq_iters}")
    dsub = dim // m
    R = np.eye(dim, dtype=np.float64)
    raw = _fixed_vecs(df, id_col, vec_col, scale)
    for _ in range(opq_iters):
        rot = rotate_vectors(df, id_col, vec_col, R)
        books = pq_train(rot, id_col, vec_col, dim, m, ksub, pq_iters, scale)
        codes = pq_encode(rot, id_col, vec_col, books, dim, m, ksub, scale)
        G = _scatter_int(raw, codes, books, dim, m, ksub, dsub)
        U, _, Vt = np.linalg.svd(G.astype(np.float64))
        R = U @ Vt
    return R


def _scatter_int(raw: DataFrame, codes: DataFrame, books: Codebook,
                 dim: int, m: int, ksub: int, dsub: int):
    """Exact integer scatter G = X^T Y_hat: fixed-point raw vectors
    joined to their codes, decoded against the codebook, outer products
    accumulated per Arrow batch in int64 and summed driver-side in
    unbounded Python ints (order-independent => deterministic)."""
    import numpy as np

    C = _np_books(books, m, ksub, dsub)  # (m, ksub, dsub) int64

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array([np.asarray(x, dtype=np.int64) for x in pdf["v"]])
            Cd = np.array(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )
            Y = np.concatenate([C[s][Cd[:, s]] for s in range(m)], axis=1)
            G = X.T @ Y  # (dim, dim) exact int64
            yield pd.DataFrame({"g": [G.reshape(-1)]})

    parts = (
        raw.join(codes, "id")
        .select("v", "codes")
        .mapInPandas(kernel, "g array<long>")
        .collect()
    )
    total = [0] * (dim * dim)
    for r in parts:
        for i, v in enumerate(r["g"]):
            total[i] += int(v)
    return np.array(total, dtype=object).reshape(dim, dim)
