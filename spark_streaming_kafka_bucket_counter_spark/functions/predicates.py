"""Comparator predicate algebra (reference parity: F1-F11).

The reference's ``DumpTable`` family evaluates a tiny conjunction algebra
row-at-a-time in Python (``audit_utils/models.py:811-928``, comparators at
``models.py:1037-1106``): eq / range / erange / gte / gt / lte / lt plus an
``eval``-based ``custom:`` escape hatch.

Spark-first: each comparator becomes a Column expression; a parameter dict
folds into one ANDed filter that Catalyst pushes down to the parquet scan.
The ``custom:`` comparator maps to ``F.expr`` (Spark SQL boolean), replacing
``eval`` (models.py:1104-1106) with a parsed, injection-free expression.

Reference edge semantics preserved:
- rows missing a field are excluded (models.py:865-869) — in Spark a null
  comparison is null, which ``filter`` drops; explicit for ``custom``.
- empty parameter dict on the per-field variant yields an EMPTY result
  (models.py:913-914), not the full table.
- ``range`` is inclusive with ``None`` meaning unbounded on that side
  (models.py:1070-1078); ``erange`` is exclusive (models.py:1080-1086).
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _range(col: Column, lo: Any, hi: Any, inclusive: bool) -> Column:
    conds: list[Column] = []
    if lo is not None:
        conds.append(col >= lo if inclusive else col > lo)
    if hi is not None:
        conds.append(col <= hi if inclusive else col < hi)
    if not conds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, conds)


def _unpack(args: Any) -> tuple[Any, Any]:
    lo, hi = args if isinstance(args, (list, tuple)) else (args, None)
    return lo, hi


# NB comparator argument order follows the reference exactly:
# ``comparison(a, b)`` receives a = the PARAMETER, b = the ROW value
# (models.py:828-831 "the `a` argument comes from the dict_params and the
# `b` argument is the entry from the table"). So ``gt`` with param 2
# keeps rows WHERE 2 > row_value — i.e. column < param — as pinned by the
# DumpTable doctest (models.py:847-858: gt({'count': 2}) -> count=1 row).
COMPARATORS: dict[str, Callable[[Column, Any], Column]] = {
    "eq": lambda col, v: col == F.lit(v),
    "range": lambda col, args: _range(col, *_unpack(args), inclusive=True),
    "erange": lambda col, args: _range(col, *_unpack(args), inclusive=False),
    "gte": lambda col, v: F.lit(v) >= col,
    "gt": lambda col, v: F.lit(v) > col,
    "lte": lambda col, v: F.lit(v) <= col,
    "lt": lambda col, v: F.lit(v) < col,
}


def parse_comparison(name: str) -> Callable[[Column, Any], Column]:
    """Comparator-name resolution (F10; models.py:1037-1064).

    ``custom:<sql_boolean>`` returns a builder that ignores (col, value)
    and parses the expression with Spark SQL — the safe ``eval``
    replacement (F11).
    """
    if name.startswith("custom:"):
        sql = name[len("custom:"):]
        return lambda col, v: F.expr(sql)
    try:
        return COMPARATORS[name]
    except KeyError as exc:
        raise ValueError(f"unknown comparator {name!r}") from exc


def general_select(
    df: DataFrame, params: dict[str, Any], comparison: str | Callable[[Column, Any], Column] = "eq"
) -> DataFrame:
    """One comparator applied across all (field, value) params, ANDed (F1)."""
    fn = parse_comparison(comparison) if isinstance(comparison, str) else comparison
    if not params:
        return df
    cond = reduce(lambda a, b: a & b, [fn(F.col(k), v) for k, v in params.items()])
    return df.filter(cond)


def c_general_select(df: DataFrame, params: dict[str, tuple[str, Any]]) -> DataFrame:
    """Per-field comparator selection (F2; models.py:874-928).

    ``params = {field: (comparator_name, args)}``. Empty params -> empty
    result, preserving models.py:913-914.
    """
    if not params:
        return df.limit(0)
    conds = [parse_comparison(name)(F.col(field), args) for field, (name, args) in params.items()]
    return df.filter(reduce(lambda a, b: a & b, conds))


def zone_conjuncts(params: dict[str, tuple[str, Any]]) -> list[tuple]:
    """Translate a per-field comparator spec (the c_general_select /
    HTTP-route shape: ``{field: (comparator_name, args)}``) into
    ``(col, op, value)`` conjuncts for manifest zone-map file pruning
    (:func:`~..sources.manifest.files_matching`).

    The reference comparators compare PARAM vs ROW (models.py:930-952):
    ``gte(v)`` keeps rows with ``v >= col`` i.e. ``col <= v`` — so the
    zone ops here are the INVERSE of the names. Anything the zone maps
    can't reason about (``custom:`` SQL, unknown names, None-bounded
    range sides) contributes no conjunct — pruning silently degrades to
    scanning, never to a wrong skip."""
    inverse = {"eq": "=", "gte": "<=", "gt": "<", "lte": ">=", "lt": ">"}
    out: list[tuple] = []
    for field, (name, args) in params.items():
        if name in ("range", "erange"):
            lo, hi = _unpack(args)
            ge, le = (">=", "<=") if name == "range" else (">", "<")
            if lo is not None:
                out.append((field, ge, lo))
            if hi is not None:
                out.append((field, le, hi))
        elif name in inverse and not isinstance(args, (list, tuple, dict)):
            out.append((field, inverse[name], args))
    return out


# F3-F9 convenience wrappers mirroring the reference method names AND
# their param-vs-row comparison direction (models.py:930-952): e.g.
# ``select_gt(df, {'count': 2})`` keeps rows with count < 2.
def select(df: DataFrame, params: dict[str, Any]) -> DataFrame:
    return general_select(df, params, "eq")


def select_range(df: DataFrame, params: dict[str, Sequence[Any]]) -> DataFrame:
    return general_select(df, params, "range")


def select_gte(df: DataFrame, params: dict[str, Any]) -> DataFrame:
    return general_select(df, params, "gte")


def select_gt(df: DataFrame, params: dict[str, Any]) -> DataFrame:
    return general_select(df, params, "gt")


def select_lte(df: DataFrame, params: dict[str, Any]) -> DataFrame:
    return general_select(df, params, "lte")


def select_lt(df: DataFrame, params: dict[str, Any]) -> DataFrame:
    return general_select(df, params, "lt")
