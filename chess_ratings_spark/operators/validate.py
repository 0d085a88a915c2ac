"""Constraint-check operator (SURVEY.md §2.7) — the reference's patito
validation (ingest_web_to_gcs.py:130-135, chess_ratings_data_model.py:9-31)
re-expressed as ONE aggregation pass.

A constraint is (name, violation_predicate Column). The checker builds a
single select of `sum(case when violated then 1 else 0)` per constraint —
one scan, one partial+final agg, no per-row Python, no N passes — then
unpivots to a (constraint, violations) report. At 100 TB this is the only
shape that works: constraint count does not multiply scan count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chess_ratings_spark.functions import scalar


def violations_report(df: DataFrame, constraints: dict[str, Column]) -> DataFrame:
    """One-pass violations count per named constraint predicate.

    `constraints` maps name -> Column that is TRUE when the row VIOLATES.
    Returns (constraint string, violations bigint), one row per constraint.
    """
    counts = df.agg(
        *[
            F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(name)
            for name, pred in constraints.items()
        ]
    )
    # unpivot the single row to (constraint, violations)
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("constraint"), F.col(name).alias("violations"))
            for name in constraints
        ]
    )
    return counts.select(F.explode(pairs).alias("kv")).select("kv.constraint", "kv.violations")


def fide_constraints(current_year: int) -> dict[str, "F.Column"]:
    """The patito ChessRating model's row constraints as violation
    predicates — now DERIVED from the declarative ``FideRatings`` model
    (models.py), the single place the schema + constraints live
    (chess_ratings_data_model.py:12-31).

    ``current_year`` is REQUIRED and must equal the model's pinned
    ``CURRENT_YEAR``: a wall-clock default would make the constraint
    set nondeterministic across runs."""
    from chess_ratings_spark.models import CURRENT_YEAR, FideRatings

    if current_year != CURRENT_YEAR:
        raise ValueError(
            f"constraint year {current_year} != model CURRENT_YEAR "
            f"{CURRENT_YEAR}; edit models.CURRENT_YEAR to rebound"
        )
    return FideRatings.violation_predicates()


def assert_unique(df: DataFrame, key: str) -> DataFrame:
    """Uniqueness as a two-scalar aggregate: count(*) vs count(distinct).
    (chess_ratings_data_model.py:12 unique=True.)"""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(key).alias("n_keys"),
        (F.count(F.lit(1)) == F.countDistinct(key)).alias("is_unique"),
    )
