"""Query catalog: named queries + their DuckDB oracle SQL.

Each query is registered with ``@register(name, oracle=...)``; the
driver contract (``__spark_entry__.py``) exposes the registry via
``queries()`` / ``oracle_sql()``. A ``None`` oracle means the operator
is not SQL-expressible (streaming/stateful/approximate) and gets the
driver's weaker rows-only check.

Determinism contract (hash-compared against DuckDB): every aggregate
over doubles goes through integer scaling (functions.cents), every
LIMIT/top-k carries a total deterministic ORDER BY, and column aliases
match the oracle exactly.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Query", "REGISTRY", "register", "load_all"]

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}

_MODULES = (
    "relational",
    "subqueries",
    "windows",
    "dedup",
    "text",
    "similarity",
    "pipeline",
    "streaming",
    "multimodal",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _MODULES:
        try:
            importlib.import_module(f"{__name__}.{mod}")
        except ModuleNotFoundError as e:
            # Allow partial builds while modules land incrementally.
            if f"queries.{mod}" not in str(e):
                raise
    return REGISTRY
