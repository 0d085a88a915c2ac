"""Table-maintenance verbs a training-data lake needs beyond the
reference's surface: MERGE-style upsert (Delta/Iceberg ``MERGE INTO``
semantics without the table format) and deterministic hash-based
sampling (reproducible data splits with no RNG state anywhere).

Scale shapes:
- merge_upsert is ONE full-outer shuffle join on the key — the same
  physical core a lakehouse MERGE compiles to; on a real deployment the
  target side is partition-pruned/bucketed so only touched files join.
- hash sampling is a stateless per-row expression (md5 prefix → bucket)
  — no sampleBy seed/partitioning sensitivity, no reservoir state; the
  same row always lands in the same split on any cluster layout, which
  is what makes train/test splits reproducible at 100 TB.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, key: str, update_cols: Sequence[str]
) -> DataFrame:
    """MERGE INTO semantics: rows matched on `key` take the source's
    values for `update_cols` (including explicit NULLs — presence is
    decided by the join, not coalesce), unmatched source rows insert,
    unmatched target rows persist."""
    t = target.alias("t")
    s = source.alias("s")
    matched = F.col(f"s.{key}").isNotNull()
    out_cols = [F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key)]
    for c in target.columns:
        if c == key:
            continue
        if c in update_cols:
            out_cols.append(
                F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer").select(*out_cols)


def merge_upsert_evolve(
    target: DataFrame, source: DataFrame, key: str, update_cols: Sequence[str]
) -> DataFrame:
    """MERGE ... WITH SCHEMA EVOLUTION semantics (the Delta/Spark-4
    automatic-evolution contract): columns present only in the SOURCE
    are added to the merged schema, with pre-existing target rows
    taking NULL for them; matched rows then update source-only columns
    like any other update column. The target is widened IN-PLAN
    (typed NULL literals — pure projection, no data rewrite; on a
    manifest-log table the old files simply lack the column, exactly
    Parquet schema-merge semantics) before the single full-outer
    merge join."""
    new_cols = [
        (f.name, f.dataType)
        for f in source.schema.fields
        if f.name not in target.columns
    ]
    widened = target
    for name, dtype in new_cols:
        widened = widened.withColumn(name, F.lit(None).cast(dtype))
    return merge_upsert(
        widened,
        source,
        key,
        update_cols=list(update_cols) + [n for n, _ in new_cols],
    )


def hash_bucket(col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, n_buckets): first 8
    hex chars of md5(string(col)) as an integer, mod n_buckets. md5 is
    bit-identical everywhere (unlike xxhash64 seeds or sampleBy RNG),
    so the same row buckets identically in Spark, DuckDB, or a bash
    pipeline — the property that makes data splits auditable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint") % n_buckets


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rates_pct: Mapping[str, int],
    default_pct: int = 5,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash
    bucket < the stratum's percentage. Adds `__bucket`/`__rate` for
    callers that aggregate acceptance stats instead of filtering."""
    rate = F.lit(default_pct)
    for k, v in rates_pct.items():
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    return df.withColumn("__bucket", hash_bucket(key_col)).withColumn("__rate", rate)
