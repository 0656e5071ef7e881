"""Per-dataset artifact memo for catalog queries that share expensive
intermediates (the DataFrame analog of the on-disk index cache in
``sources/files.py``).

Several catalog queries need the SAME derived artifact — the
LSH-verified near-dup pair set feeds ``dedup_minhash_lsh`` AND the
connected-components label map behind ``dedup_clusters`` /
``dedup_drop_near_duplicates``. The inputs are static per sf_dir
(driver-generated parquet), so building the artifact once per
(session, dataset) and reusing the materialized frame is the same
build-once/serve-many trade the IVF/BM25/LSH disk caches make — it
changes cost, never results (every query still hash-matches its oracle
independently).

Mechanics: the builder's result is materialized with an EAGER
``localCheckpoint`` (cuts lineage AND stores the rows executor-local)
and the builder's own frame is dropped immediately so its
``unpersist_with`` finalizers release any loop-internal caches. Entries
for other (session, dataset) pairs are evicted on insert — the bench
loop and the external driver harness both walk one dataset per session, so one
live generation bounds executor storage.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MEMO: dict[tuple[int, str, str], DataFrame] = {}


def dataset_memo(
    spark: SparkSession, sf_dir: str, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the memoized artifact for (session, sf_dir, key), building
    and materializing it on first use."""
    k = (id(spark), os.path.abspath(sf_dir), key)
    df = _MEMO.get(k)
    if df is None:
        res = build()
        df = res.localCheckpoint(eager=True)
        del res  # finalizers release the builder's persisted intermediates
        for stale in [x for x in _MEMO if x[:2] != k[:2]]:
            del _MEMO[stale]
        _MEMO[k] = df
    return df
