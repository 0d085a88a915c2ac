"""Window / sort / top-k operators (SURVEY.md §2.6).

Monthly-snapshot data makes lag/as-of/top-k the domain's defining query
shapes. Every helper takes explicit total-order tie-breakers — a top-k
with ties is non-deterministic and breaks exact-hash comparison, and at
scale non-determinism also breaks retried-task idempotence.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rn_name: str = "rn",
) -> DataFrame:
    """Top-k per group: row_number over (group, order) then filter ≤ k.

    Physical shape: one shuffle on `group`, sort within partitions; at
    scale Spark pushes a per-partition top-k (WindowGroupLimit) below
    the shuffle so only k rows per group per mapper move.
    """
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rn_name, F.row_number().over(w)).filter(F.col(rn_name) <= k)


def lag_delta(
    df: DataFrame,
    key: Sequence[str],
    order: Sequence[Column],
    value: str,
    out: str = "delta",
) -> DataFrame:
    """Period-over-period delta per key: value - lag(value)."""
    w = Window.partitionBy(*key).orderBy(*order)
    return df.withColumn(out, F.col(value) - F.lag(value).over(w))


def running_agg(
    df: DataFrame,
    key: Sequence[str],
    order: Sequence[Column],
    value: str,
    out: str = "running",
) -> DataFrame:
    """Cumulative sum with an explicit rows frame (unbounded→current)."""
    w = (
        Window.partitionBy(*key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value).over(w))


def global_topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    each partition keeps k rows, the driver merges k·p rows, no global
    sort materializes. The scale-safe way to answer 'top 100 of 10^11'."""
    return df.orderBy(*order).limit(k)
