"""The chess-ratings ingest pipeline, re-expressed Spark-first.

Reference: /root/reference/prefect/flows/ingest_web_to_gcs.py — a
Polars lazy pipeline (:98-127) between an XML source (:61-74) and a
partitioned parquet sink (:138-163). Here it is a library of pure
DataFrame→DataFrame functions; the whole preprocess is one Catalyst
plan (projection renames + null backfill + recodes fused into a single
scan-project stage, no intermediate materialization).

Intentional deviations from the reference, recorded in SURVEY.md §2:
- `birth_year`: the reference casts a 4-digit year int through
  pl.Datetime and extracts `.dt.year()`, which reinterprets it as an
  epoch offset (≈1970) — a bug. We implement the intent: 0 → NULL,
  otherwise keep the integer year (ingest_web_to_gcs.py:118).
- the sink writes the *cleaned* frame; the reference uploads the raw
  one by mistake (ingest_web_to_gcs.py:200 vs :196-199).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chess_ratings_spark.functions import scalar
from chess_ratings_spark.models import FideRatings

#: ingest_web_to_gcs.py:107-115 — raw FIDE XML names → canonical names.
RENAMES = {
    "fideid": "fide_id",
    "name": "player_name",
    "country": "fide_federation",
    "games": "game_count",
    "birthday": "birth_year",
}

#: chess_ratings_data_model.py:12-26 — declared model columns that may be
#: absent in raw monthly files and must be backfilled as typed NULLs
#: (foa_title is missing before ~2017; ingest_web_to_gcs.py:26-37).
#: Derived from the SAME declaration validation runs on (models.py):
#: a column added to the model is automatically backfilled here.
REQUIRED_NULLABLE = {
    name: f.dtype for name, f in FideRatings.fields().items() if f.backfill
}

#: ingest_web_to_gcs.py:120 — sex recode F/M → 0/1 tinyint.
SEX_CODES = {"F": 0, "M": 1}


def rename_raw(df: DataFrame) -> DataFrame:
    """proj_rename — bulk canonical rename (ingest_web_to_gcs.py:107-115)."""
    return df.withColumnsRenamed(RENAMES)


def normalize_schema(df: DataFrame) -> DataFrame:
    """proj_add_missing — typed-NULL backfill (ingest_web_to_gcs.py:26-37)."""
    return scalar.add_missing_columns(df, REQUIRED_NULLABLE)


def recode(df: DataFrame) -> DataFrame:
    """fn_recode_map + fn_replace_null + the birth_year intent fix
    (ingest_web_to_gcs.py:118-120)."""
    return df.withColumns(
        {
            "sex": scalar.recode_map("sex", SEX_CODES),
            "birth_year": scalar.sentinel_to_null("birth_year", 0).cast("int"),
        }
    )


def stamp_period(df: DataFrame, year: int, month: int, game_format: str) -> DataFrame:
    """proj_lit — provenance literals (ingest_web_to_gcs.py:122-123) plus
    the partition dimension (game_format, utils/game_format.py:4-7)."""
    return df.withColumns(
        {
            "period_year": F.lit(year).cast("int"),
            "period_month": F.lit(month).cast("int"),
            "game_format": F.lit(game_format),
        }
    )


def preprocess(df: DataFrame, year: int, month: int, game_format: str) -> DataFrame:
    """The full preprocess_ratings_data pipeline
    (ingest_web_to_gcs.py:98-127) as one composed lazy plan, conformed
    to the declared FideRatings model (column order + dtypes) — the
    declarative twin of the reference's validate-after-preprocess step;
    still a single scan-project stage under Catalyst."""
    stamped = stamp_period(
        recode(normalize_schema(rename_raw(df))), year, month, game_format
    )
    return FideRatings.conform(stamped, extra=("game_format",))
