"""Concrete data models — the reference's patito models, declared once
and reused by ingest (schema conform), validation (val_constraints),
and the uniqueness check.

Reference: chess_ratings_data_model.py:9-31 (class ChessRating). The
field order, optionality, bounds, regex and unique flag mirror that
model; dtypes are the Spark equivalents of the reference's
(pl.Int8 → tinyint; plain int ratings arrive as bigint from the
fixture and stay bigint). The reference bounds period_year and
birth_year by ``date.today().year`` — a wall-clock call that makes the
constraint set nondeterministic across runs, so models here pin the
year explicitly (CURRENT_YEAR), same intent, reproducible plans.
"""

from __future__ import annotations

from chess_ratings_spark.datamodel import DataModel, Field

#: chess_ratings_data_model.py:25,30 use date.today().year; pinned for
#: deterministic registered plans (see module docstring).
CURRENT_YEAR = 2026


class FideRatings(DataModel):
    """One monthly FIDE rating row after preprocess."""

    fide_id = Field("bigint", nullable=False, unique=True)
    player_name = Field("string")
    fide_federation = Field(
        "string", regex=r"(?i)[A-Z]{3}", check_prefix="federation"
    )
    sex = Field("tinyint", isin=(0, 1))
    title = Field("string", backfill=True)
    w_title = Field("string", backfill=True)
    o_title = Field("string", backfill=True)
    foa_title = Field("string", backfill=True)
    rating = Field("bigint", nullable=False)
    game_count = Field("bigint", nullable=False)
    k = Field("bigint", nullable=False)
    birth_year = Field("int", ge=1900, le=CURRENT_YEAR)
    flag = Field("string", backfill=True)
    period_year = Field("int", nullable=False, ge=2000, le=CURRENT_YEAR)
    period_month = Field("int", nullable=False, ge=1, le=12)
