"""OPQ operator pins (operators/opq.py + the layout-v4 rotation path in
operators/pq.py).

The 2x2x2 catalog query `sim_opq_recall_eval` hash-matches its DuckDB
twin in the driver sim; these pin what the oracle can't see: the snake
allocation rule, permutation orthogonality / L2 invariance, the
Procrustes rotation's orthogonality + determinism + measured gain on an
anisotropic construction, and the v4 index round-trip (rotation
persisted at build, applied identically by append and query).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka_bucket_counter_spark.operators import opq as OPQ
from spark_streaming_kafka_bucket_counter_spark.operators import pq as PQ
from spark_streaming_kafka_bucket_counter_spark.sources.files import load_table
from tests.conftest import SF_DIR
from tests.oracle_harness import spark_signature

DIM, M, KSUB = 64, 16, 16


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_snake_allocation_rule():
    """Rank r -> sub-space: forward on even blocks, reversed on odd
    ones; every sub ends with exactly dim/m slots, best ranks spread
    one-per-sub."""
    m = 4
    assert [OPQ._snake_sub(r, m) for r in range(8)] == [0, 1, 2, 3, 3, 2, 1, 0]
    perm = OPQ._perm_from_ranked(list(range(8)), dim=8, m=4)
    # dsub=2: sub 0 gets ranks {0, 7}, sub 1 {1, 6}, sub 2 {2, 5}, sub 3 {3, 4}
    assert perm == [0, 7, 1, 6, 2, 5, 3, 4]
    assert sorted(perm) == list(range(8))  # a true permutation


def test_axis_permutation_learned_from_variance(spark):
    """Dims with descending variance d0 > d1 > d2 > d3 at m=2, dim=4:
    snake puts ranks {0, 3} in sub 0 and {1, 2} in sub 1 — high- and
    low-variance dims pair up instead of clustering."""
    rows = [
        (i, [float(8 * v), float(4 * v), float(2 * v), float(v)])
        for i, v in enumerate([-2, -1, 0, 1, 2])
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    perm = OPQ.opq_axis_permutation(df, "vec_id", "embedding", dim=4, m=2)
    assert perm == [0, 3, 1, 2]
    out = OPQ.apply_axis_permutation(df, "embedding", perm).collect()
    by_id = {r["vec_id"]: r["embedding"] for r in out}
    assert by_id[4] == [16.0, 2.0, 8.0, 4.0]

    with pytest.raises(ValueError, match="not divisible"):
        OPQ.opq_axis_permutation(df, "vec_id", "embedding", dim=4, m=3)


def test_axis_permutation_preserves_exact_l2(spark, emb):
    """A permutation is orthogonal: exact fixed-point squared-L2
    between any two vectors is bit-identical before and after."""
    perm = OPQ.opq_axis_permutation(emb, "vec_id", "embedding", DIM, M)
    assert sorted(perm) == list(range(DIM))
    rot = OPQ.apply_axis_permutation(emb, "embedding", perm)

    def pair_dists(df):
        v = PQ._fixed_vecs(df.filter(F.col("vec_id") < 8), "vec_id", "embedding", 1_000_000)
        a = v.select(F.col("id").alias("ia"), F.col("v").alias("va"))
        b = v.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
        d = F.aggregate(
            F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        )
        return sorted(
            a.crossJoin(b).select("ia", "ib", d.alias("d")).collect(),
            key=lambda r: (r["ia"], r["ib"]),
        )

    assert [r["d"] for r in pair_dists(emb)] == [r["d"] for r in pair_dists(rot)]


def test_recall_truth_invariant_under_axis_permutation(spark, emb):
    """The r13 shared-truth optimization's load-bearing property: the
    exact-L2 recall truth (pq.recall_truth — nonzero universe, fixed
    point, top-k per query, ties to lower cand_id) is the SAME RELATION
    on the base table and on its axis-permuted form, because rounding
    is per-element and the integer squared-L2 sum is order-independent.
    This is what lets sim_opq_recall_eval compute ONE truth for both
    halves of the 2x2x2."""
    perm = OPQ.opq_axis_permutation(emb, "vec_id", "embedding", DIM, M)
    rot = OPQ.apply_axis_permutation(emb, "embedding", perm)
    t_base = sorted(
        map(tuple, PQ.recall_truth(emb, "vec_id", "embedding").collect())
    )
    t_rot = sorted(
        map(tuple, PQ.recall_truth(rot, "vec_id", "embedding").collect())
    )
    assert t_base == t_rot
    assert len(t_base) > 0


def _aniso_df(spark, n=64, dim=16, seed=7):
    """Anisotropic construction where natural-order PQ is maximally
    wasteful at m=4 (dsub=4): ALL the variance lives in dims 0..3 —
    natural grouping gives sub-space 0 the entire signal (16 centroids
    for a 4-dim dense cloud) and three all-noise sub-spaces; variance-
    balanced allocation spreads the 4 hot dims one per sub-space, each
    quantized alongside near-constant dims."""
    rng = np.random.default_rng(seed)
    X = np.zeros((n, dim))
    X[:, :4] = rng.normal(0.0, 0.1, size=(n, 4))
    X[:, 4:] = rng.normal(0.0, 0.002, size=(n, dim - 4))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _mean_recall(df, dim, m, ksub):
    books = PQ.pq_train(df, "vec_id", "embedding", dim, m, ksub, iters=2)
    row = PQ.pq_recall_eval(
        df, "vec_id", "embedding", books, dim, m, ksub,
        query_max_id=8, top_k=5,
    ).collect()[0]
    return row["mean_recall_ppm"]


def test_axis_permutation_improves_recall_on_anisotropic(spark):
    """The measured-gain pin for the catalog rotation: on the
    anisotropic construction, variance-balanced grouping must beat
    natural order."""
    df = _aniso_df(spark)
    base = _mean_recall(df, dim=16, m=4, ksub=8)
    perm = OPQ.opq_axis_permutation(df, "vec_id", "embedding", dim=16, m=4)
    rot = _mean_recall(
        OPQ.apply_axis_permutation(df, "embedding", perm), dim=16, m=4, ksub=8
    )
    assert rot > base, (base, rot)


def test_procrustes_rotation_orthogonal_deterministic_and_gains(spark):
    """The non-parametric OPQ learner: R orthogonal (R R^T = I within
    float eps), bit-identical across two runs (the exact-integer
    scatter makes it so), and at least as good as the axis permutation
    on the anisotropic construction (Procrustes searches a superset of
    rotations)."""
    df = _aniso_df(spark)
    R1 = OPQ.opq_train_rotation(df, "vec_id", "embedding", dim=16, m=4,
                                ksub=8, pq_iters=2, opq_iters=2)
    R2 = OPQ.opq_train_rotation(df, "vec_id", "embedding", dim=16, m=4,
                                ksub=8, pq_iters=2, opq_iters=2)
    assert np.array_equal(R1, R2)
    assert np.allclose(R1 @ R1.T, np.eye(16), atol=1e-9)
    base = _mean_recall(df, dim=16, m=4, ksub=8)
    rot = _mean_recall(
        PQ.rotate_vectors(df, "vec_id", "embedding", R1), dim=16, m=4, ksub=8
    )
    assert rot > base, (base, rot)

    with pytest.raises(ValueError, match="opq_iters"):
        OPQ.opq_train_rotation(df, "vec_id", "embedding", dim=16, m=4,
                               ksub=8, opq_iters=0)


def test_index_roundtrip_rotation_layout_v4(spark, emb, tmp_path):
    """Layout v4 round-trip: the build persists the rotation, meta says
    v4, the reader loads + applies it — so querying the rotated index
    equals querying a rotation-free index built over PRE-rotated
    vectors (the build's own path), and an appended duplicate vector
    is retrieved through the rotation."""
    from spark_streaming_kafka_bucket_counter_spark.sources.manifest import (
        latest_manifest, manifest_read,
    )

    R = OPQ.opq_train_rotation(
        emb, "vec_id", "embedding", DIM, m=M, ksub=KSUB, opq_iters=1
    )
    idx = str(tmp_path / "opqidx")
    PQ.ivfpq_build_index(
        emb, "vec_id", "embedding", idx, dim=DIM, m=M, ksub=KSUB,
        n_centroids=16, rotation=R,
    )
    snap = latest_manifest(idx)
    assert any(f.startswith("rotation/") for f in snap["files"])
    meta = {
        r["key"]: r["value"]
        for r in manifest_read(spark, idx, "meta", snapshot=snap).collect()
    }
    assert meta["layout_version"] == 4
    back = PQ._load_rotation(spark, idx, snap)
    assert np.array_equal(back, np.asarray(R, dtype=np.float64))

    q = emb.filter(F.col("vec_id") < 5)
    served = PQ.ivfpq_query_index(
        spark, idx, q, "vec_id", "embedding", dim=DIM, m=M, ksub=KSUB,
        nprobe=2, top_k=3,
    )
    pre = PQ.rotate_vectors(emb, "vec_id", "embedding", R)
    idx2 = str(tmp_path / "preidx")
    PQ.ivfpq_build_index(
        pre, "vec_id", "embedding", idx2, dim=DIM, m=M, ksub=KSUB,
        n_centroids=16,
    )
    direct = PQ.ivfpq_query_index(
        spark, idx2, PQ.rotate_vectors(q, "vec_id", "embedding", R),
        "vec_id", "embedding", dim=DIM, m=M, ksub=KSUB, nprobe=2, top_k=3,
    )
    assert spark_signature(served) == spark_signature(direct)

    # append rides the persisted rotation: a clone of vector 3 appended
    # under a new id must surface as 3's nearest neighbor
    clone = emb.filter(F.col("vec_id") == 3).withColumn(
        "vec_id", F.lit(990_000).cast("long")
    )
    PQ.ivfpq_append_index(
        spark, clone, "vec_id", "embedding", idx, dim=DIM, m=M, ksub=KSUB
    )
    after = PQ.ivfpq_query_index(
        spark, idx, emb.filter(F.col("vec_id") == 3), "vec_id", "embedding",
        dim=DIM, m=M, ksub=KSUB, nprobe=2, top_k=1,
    ).collect()
    assert after and after[0]["cand_id"] == 990_000

    with pytest.raises(ValueError, match="rotation must be"):
        PQ.ivfpq_build_index(
            emb, "vec_id", "embedding", str(tmp_path / "bad"), dim=DIM,
            m=M, ksub=KSUB, rotation=np.eye(8),
        )


def test_permutation_matrix_matches_axis_permutation(spark, emb):
    """The bridge pin: rotate_vectors under permutation_matrix(perm)
    must produce bit-identical vectors to apply_axis_permutation(perm)
    after the fixed-point snap (multiplying by an exact 0/1 matrix
    reorders float64 values exactly) — this is what lets the
    `sim_opq_trained_index_topk` oracle replay the v4 rotation path as
    a list reorder."""
    perm = OPQ.opq_axis_permutation(emb, "vec_id", "embedding", DIM, M)
    P = OPQ.permutation_matrix(perm)
    assert np.allclose(P @ P.T, np.eye(DIM))
    a = PQ._fixed_vecs(
        OPQ.apply_axis_permutation(emb, "embedding", perm),
        "vec_id", "embedding", 1_000_000,
    )
    b = PQ._fixed_vecs(
        PQ.rotate_vectors(emb, "vec_id", "embedding", P),
        "vec_id", "embedding", 1_000_000,
    )
    assert spark_signature(a) == spark_signature(b)

    with pytest.raises(ValueError, match="not a permutation"):
        OPQ.permutation_matrix([0, 0, 1])
