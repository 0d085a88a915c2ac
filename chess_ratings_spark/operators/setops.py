"""Set operators + exact dedup (SURVEY.md §2.6).

The at-rest dataset in the reference IS a union of monthly snapshot
files (ingest_web_to_gcs.py:231-232 materializes it file-by-file);
``union_snapshots`` is that operation done engine-side, with
allowMissingColumns mirroring the reference's add-missing-columns
normalization (ingest_web_to_gcs.py:26-37).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def union_snapshots(*dfs: DataFrame) -> DataFrame:
    """Stack snapshots by column name, NULL-filling absent columns."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def dedup_exact(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Drop exact duplicates. With `keys`, arbitrary survivor — fine when
    duplicates are true replicas. Use `dedup_keep_first` when survivor
    identity matters (deterministic, hence retry-safe at scale)."""
    return df.dropDuplicates(list(keys) if keys else None)


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """Deterministic keep-first dedup: row_number over an explicit total
    order within each key group; survivor is rn==1."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
