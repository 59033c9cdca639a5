"""Query registry — the driver-contract surface.

Every implemented operator row from SURVEY.md §2 registers here as a
``QueryDef``: a ``(spark, sf_dir) -> DataFrame`` callable plus (when
SQL-expressible) the equivalent DuckDB oracle SQL.  The driver runs
both at sf0.01 and hash-compares row values, so every query obeys:

- alias every computed column identically in Spark and SQL;
- round floating outputs to 6 decimals in BOTH engines;
- deterministic output (unique tiebreakers, no engine randomness);
- scalar output columns only (no arrays/structs in checked results).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QueryDef"] = {}


@dataclass(frozen=True)
class QueryDef:
    key: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key {key!r}")
        REGISTRY[key] = QueryDef(key, fn, oracle)
        return fn

    return deco


_MODULES = (
    "relational",
    "windows",
    "aggregates",
    "ml",
    "llm",
    "events",
    "udfs",
    "analytics",
)


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side effect: fills REGISTRY)."""
    for m in _MODULES:
        importlib.import_module(f"big_data_fknn_spark.queries.{m}")
    return REGISTRY
