"""Named-query registry: the engine's public query surface.

Every operator from SURVEY §2 is exposed as a named query
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI-SQL
oracle string the driver runs through DuckDB. The pair IS the correctness
contract: same column names, same values.

Determinism rules for oracle-matched queries (both engines):
* Aggregate numerics through exact DECIMAL intermediates (double addition is
  order-dependent under parallelism; decimal addition is not), then cast the
  final column to DOUBLE so both engines materialize the same value/type.
* Cast timestamps used as group keys to DATE (or format to strings).
* Alias every computed column identically in DataFrame code and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a named query with its optional SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip(), tuple(tags))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module (side effect: registration) and return specs."""
    # Local import to avoid circulars; each module registers on import.
    from ssg_etl_spark.plans import (  # noqa: F401
        analytics_pack,
        events_pack,
        functions_pack,
        llm_pack,
        merge_pack,
        relational,
        sources_pack,
    )

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle}
