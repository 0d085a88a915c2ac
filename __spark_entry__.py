"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``chess_ratings_spark/``; this module only exposes
its query/oracle registry to the driver. See SURVEY.md §2 for the
operator inventory each registered name maps to.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import chess_ratings_spark.plans  # noqa: E402,F401  (populates the registry)
from chess_ratings_spark import registry  # noqa: E402
from chess_ratings_spark.plans.relational import flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue per region + top customer per region: scan → broadcast star
    join → hash agg → window top-k → sort, in one plan.
    """
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return registry.oracles()
