"""Parquet IO (SURVEY.md §2.1).

The reference lands one hand-named parquet object per (period, format)
with a GCS existence check for idempotence (ingest_web_to_gcs.py:55-57,
150-174, 189-193). Spark-native replacement: a partitioned parquet
table where partition semantics subsume file naming, listing and
skip-if-exists — `partitionBy(game_format, period_year, period_month)`
plus save modes. Dynamic partition overwrite gives per-partition
idempotent re-runs without touching sibling partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PARTITION_COLS = ("game_format", "period_year", "period_month")


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Vectorized columnar scan; Catalyst pushes filters/projections into
    the reader and prunes partitions from the directory layout."""
    return spark.read.parquet(path)


def sink_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def sink_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = PARTITION_COLS,
    mode: str = "ignore",
) -> None:
    """Partitioned sink with reference-equivalent idempotence.

    mode="ignore"    ≡ the reference's skip-if-exists backfill guard
                       (ingest_web_to_gcs.py:189-193) — whole-table level.
    mode="overwrite" + dynamic partitionOverwriteMode ≡ re-ingest one
                       month without clobbering the rest of the lake.
    """
    writer = df.write.partitionBy(*partition_cols).mode(mode)
    if mode == "overwrite":
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def list_partitions(spark: SparkSession, path: str) -> DataFrame:
    """src_listing — enumerate written partitions from the files
    themselves (ingest_web_to_gcs.py:166-174's GCS list call, done with
    the table's own partition columns via input_file_name)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .select(*[F.col(c) for c in PARTITION_COLS], F.input_file_name().alias("file"))
        .groupBy(*PARTITION_COLS)
        .agg(F.count(F.lit(1)).alias("n_rows"), F.countDistinct("file").alias("n_files"))
    )
