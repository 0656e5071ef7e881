"""Cache lifecycle helper: tie ``persist()``-ed intermediates to the
lifetime of the DataFrame they feed.

Operators that persist an intermediate (inverted index, candidate set,
normalized projection) return a *lazy* DataFrame, so they cannot
unpersist inline — the consumer hasn't run yet. Leaving the cache around
leaks executor storage memory across catalog invocations in a long-lived
session (bench loop, serving endpoint). The fix: a ``weakref.finalize``
on the returned DataFrame — when the caller drops the result (CPython
refcounting makes that prompt), every registered intermediate is
unpersisted. Unpersisting a DataFrame whose plan is re-executed later is
safe (Spark just recomputes), so an early GC can cost time, never
correctness.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def _unpersist_quiet(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        # JVM already gone (interpreter shutdown) or session stopped.
        pass


def unpersist_with(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist each ``cached`` DataFrame when ``result`` is GC'd."""
    for c in cached:
        weakref.finalize(result, _unpersist_quiet, c)
    return result


def _noop(parents: tuple) -> None:
    pass


def persist_for_scale(df: DataFrame, source: DataFrame) -> DataFrame:
    """``df.persist()`` gated on input scale: skipped when ``source``
    is a provably-small file scan, applied otherwise.

    Measured r13 (interleaved persist-on/off A/B at sf0.1/local[32],
    table in SCALE.md): on a small input every one of these persists
    LOSES 0.1-0.9 s per query — the cached subtree executes without AQE
    (static shuffle partitions, no coalescing) and the InMemoryRelation
    build adds a materialization pass, while recomputing the subtree
    per consumer is an O(one-split) pass that whole-stage codegen makes
    nearly free. At real input scale the same persist saves whole
    corpus passes per consumer, so removing it outright would be a
    local-only "win" that breaks the 100 TB design — hence a gate on
    the same driver-side file-metadata smallness test fan_out_scan
    uses (unknown-size sources persist: at scale that is the safe
    side). ``SPARK_GRAFT_FORCE_PERSIST=1`` forces the persist (plan
    evidence, tests). Callers keep their ``unpersist_with``
    registration unconditionally — unpersisting a never-persisted
    frame is a no-op."""
    import os

    from ..sources.files import provably_small_scan

    if os.environ.get("SPARK_GRAFT_FORCE_PERSIST") == "1":
        return df.persist()
    if provably_small_scan(source):
        return df
    return df.persist()


def adopt_lifetime(child: DataFrame, *parents: DataFrame) -> DataFrame:
    """Keep each ``parent`` frame alive until ``child`` is GC'd.

    A derived DataFrame (``parent.select(...)``, a join on it, a union)
    does NOT hold a Python reference to the frame it was built from —
    only the JVM plan survives — so any persist whose lifecycle
    :func:`unpersist_with` tied to the parent is unpersisted the moment
    the parent's last Python reference drops (CPython refcounting: at
    the wrapping function's ``return``), BEFORE the derived result ever
    executes. The cache then serves nothing and every consumer
    recomputes the subtree (found by the r13 persist audit: 6 catalog
    paths — the OPQ halves, hybrid RRF's BM25 leg, golden-records' CC
    edges, the two decontaminate reports, drop_contained's pair set —
    silently executed uncached this way).

    The fix: the child adopts the parents — a ``weakref.finalize`` on
    the child holds them strongly; when the child is GC'd the no-op
    callback releases them and their own unpersist finalizers fire.
    Same leak-safety as unpersist_with, caches actually serve."""
    weakref.finalize(child, _noop, parents)
    return child
