"""Query registry: the declared-query contract (SURVEY.md §2B).

Every engine operator exposed to the driver is registered here as a named
builder ``(spark, sf_dir) -> DataFrame`` plus, when the semantics are
SQL-expressible, a DuckDB oracle SQL string. The driver hash-compares the two
at sf0.01 (row count + schema + order-insensitive value hash), so:

  * every computed column is aliased identically in builder and oracle;
  * money aggregates go through DECIMAL(18,2) per row (summation-order-proof)
    and are cast to DOUBLE at the end on both sides;
  * every LIMIT / top-k has a unique-key tiebreak.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import.
_QUERY_MODULES = (
    "omnidata_etl_spark.queries.scans",
    "omnidata_etl_spark.queries.projections",
    "omnidata_etl_spark.queries.joins",
    "omnidata_etl_spark.queries.aggregations",
    "omnidata_etl_spark.queries.windows",
    "omnidata_etl_spark.queries.sorts",
    "omnidata_etl_spark.queries.setops",
    "omnidata_etl_spark.queries.reshape",
    "omnidata_etl_spark.queries.tpch",
    "omnidata_etl_spark.queries.tpch_extended",
    "omnidata_etl_spark.queries.subqueries",
    "omnidata_etl_spark.queries.scalar_fns",
    "omnidata_etl_spark.queries.events",
    "omnidata_etl_spark.queries.text",
    "omnidata_etl_spark.queries.dedup",
    "omnidata_etl_spark.queries.similarity",
    "omnidata_etl_spark.queries.multimodal",
    "omnidata_etl_spark.queries.streaming",
    "omnidata_etl_spark.queries.quality",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    tags: tuple[str, ...]


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def query(name: str, *, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a declared query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
