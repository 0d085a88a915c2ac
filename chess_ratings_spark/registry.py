"""Query/oracle registry — the single source of truth for the driver
contract (``__spark_entry__.queries()`` / ``oracle_sql()``).

Each operator declared in SURVEY.md §2 registers exactly one named query
(a ``(spark, sf_dir) -> DataFrame`` callable) and, when SQL-expressible,
one DuckDB oracle SQL string over the same parquet tables. Registration
happens at import time of ``chess_ratings_spark.plans``.

Determinism rules every registered query must follow (the driver hash
compare is exact):
- alias every computed column identically in Spark and SQL;
- round order-dependent float aggregates (sum/avg over many rows) to a
  fixed scale on BOTH sides — per-row IEEE arithmetic is bit-exact across
  engines, but reduction order is not;
- DuckDB type quirks: ``sum(INTEGER)`` is HUGEINT (cast to BIGINT),
  ``count`` is BIGINT on both; avoid returning raw TIMESTAMP where a
  formatted string or epoch integer works.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a driver-facing query under SURVEY §2's ID."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
