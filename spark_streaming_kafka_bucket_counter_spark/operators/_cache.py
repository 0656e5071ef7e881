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
