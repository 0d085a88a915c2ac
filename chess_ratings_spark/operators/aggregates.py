"""Aggregation operators (SURVEY.md §2.5).

All built on Spark's HashAggregateExec (partial map-side combine +
final), which is the right 100 TB shape automatically: only the partial
aggregates shuffle, never raw rows. The helpers here standardize the
alias discipline the oracle-hash contract needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def money(c: Column | str, scale: int = 2) -> Column:
    """Round an order-dependent float aggregate to a fixed scale.

    Per-row IEEE arithmetic is bit-exact across engines; *reduction
    order* is not (Spark sums per-partition then merges). Rounding the
    final aggregate makes Spark and the DuckDB oracle agree exactly.
    """
    return F.round(c if isinstance(c, Column) else F.col(c), scale)


def grouped(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.groupBy(*keys).agg(*aggs)


def unique_check(df: DataFrame, key: str) -> DataFrame:
    """Duplicate-key report: the reference's patito ``unique=True``
    constraint (chess_ratings_data_model.py:12) as an aggregation —
    groupBy(key) + having count>1, never per-row Python."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Subtotal hierarchy (region→nation→grand total) via ROLLUP."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def pivot_agg(
    df: DataFrame,
    key: str,
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Wide layout. Passing explicit `pivot_values` matters at scale: it
    skips the extra distinct-values job AND keeps the plan static."""
    return df.groupBy(key).pivot(pivot_col, list(pivot_values)).agg(agg)
