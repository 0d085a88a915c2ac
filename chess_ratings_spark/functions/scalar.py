"""Scalar column functions (SURVEY.md §2.3) — Tier R re-expressions.

Every function here is a pure Column expression (JVM-side, codegen'd,
zero Python on the row path), mirroring a transform the reference does
with Polars expressions in ingest_web_to_gcs.py:98-127 or utils/.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: utils/dates.py:7-24 — numeric month -> 3-letter code lookup table.
MONTH_CODES = ("jan", "feb", "mar", "apr", "may", "jun",
               "jul", "aug", "sep", "oct", "nov", "dec")


def recode_map(col: Column | str, mapping: Mapping[str, int], dtype: str = "tinyint") -> Column:
    """Dictionary recode (sex "F"->0, "M"->1; ingest_web_to_gcs.py:120)
    as a chained CASE WHEN — constant-folded by Catalyst."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        expr = F.when(c == k, v) if expr is None else expr.when(c == k, v)
    return expr.cast(dtype)


def sentinel_to_null(col: Column | str, sentinel) -> Column:
    """Sentinel -> NULL (birth year 0; ingest_web_to_gcs.py:118)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(sentinel))


def month_code(col: Column | str) -> Column:
    """1-12 -> "jan".."dec" via an array-literal lookup
    (utils/dates.py:7-24's list-index in expression form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.array(*[F.lit(m) for m in MONTH_CODES]), c.cast("int"))


def two_digit_year(col: Column | str) -> Column:
    """str(year)[-2:] (ingest_web_to_gcs.py:55-57 file naming)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c.cast("string"), -2, 2)


def ratings_url(game_format: Column, year: Column, month: Column) -> Column:
    """Deterministic FIDE download URL (ingest_web_to_gcs.py:40-52):
    https://ratings.fide.com/download/{fmt}_{mon}{yy}frl_xml.zip"""
    return F.concat(
        F.lit("https://ratings.fide.com/download/"),
        game_format,
        F.lit("_"),
        month_code(month),
        two_digit_year(year),
        F.lit("frl_xml.zip"),
    )


def ratings_file_name(game_format: Column, year: Column, month: Column) -> Column:
    """Canonical at-rest object name (ingest_web_to_gcs.py:55-57)."""
    return F.concat(
        game_format, F.lit("_"), month_code(month), two_digit_year(year), F.lit("frl_xml")
    )


def federation_valid(col: Column | str) -> Column:
    """(?i)^[A-Z]{3}$ federation-code check
    (chess_ratings_data_model.py:14; anchored — patito fullmatches)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"(?i)^[A-Z]{3}$")


def month_range(start: Column, end: Column) -> Column:
    """Month-start date sequence between two dates inclusive
    (utils/dates.py:27-30's pl.date_range(interval='1mo'))."""
    return F.sequence(F.trunc(start, "month"), F.trunc(end, "month"), F.expr("interval 1 month"))


def add_missing_columns(df, required: Mapping[str, str]):
    """Schema normalization: add absent columns as typed NULLs
    (ingest_web_to_gcs.py:26-37 — foa_title is missing in early files)."""
    present = set(df.columns)
    to_add = {c: F.lit(None).cast(t) for c, t in required.items() if c not in present}
    return df.withColumns(to_add) if to_add else df


def json_get(col: Column | str, key: str) -> Column:
    """Extract a scalar from a JSON-string column (events.props)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{key}")
