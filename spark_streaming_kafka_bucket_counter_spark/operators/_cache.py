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
