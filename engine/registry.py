"""Single source of truth for the driver contract.

Every query key from SURVEY.md §2 registers here via the ``@register``
decorator; ``__spark_entry__.py`` re-exports ``all_queries()`` /
``all_oracles()``. Keys registered without SQL get the driver's weaker
rows-only check (non-SQL-expressible ops: LSH, k-means, true streaming).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: modules that register queries (imported lazily so a bug in one module
#: doesn't take down the whole contract surface while developing).
#:
#: ORDER MATTERS for driver verification: the driver's correctness sweep
#: checks a fixed-size PREFIX of the registration order each round.
#: Round 1 verified the relational family (CORRECTNESS_r01.json green);
#: the not-yet-driver-checked families are registered first so the next
#: sweep window covers them, relational last (already verified, and
#: still covered by the builder's own pre-flight in tests/test_oracle.py).
_MODULES = (
    "engine.supplier",
    "engine.functions_sql",
    "engine.udfs",
    "engine.orders_port",
    "engine.kmeans",
    "engine.summary",
    "engine.text",
    "engine.similarity",
    "engine.multimodal",
    "engine.streaming",
    "engine.relational",
)

_loaded = False


def register(name: str, sql: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _load() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(ORACLES)
