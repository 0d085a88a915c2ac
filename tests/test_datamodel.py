"""Declarative DataModel API: compile-to-plan semantics.

Mirrors the reference's patito usage (chess_ratings_data_model.py:9-31
declares; ingest_web_to_gcs.py:130-135 validates after preprocess) —
here the model also drives schema conformance, so declare-once is
actually exercised from two directions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chess_ratings_spark.datamodel import DataModel, Field
from chess_ratings_spark.models import FideRatings


class Mini(DataModel):
    pk = Field("bigint", nullable=False, unique=True)
    code = Field("string", regex=r"[A-Z]{2}")
    grade = Field("int", isin=(1, 2, 3))
    score = Field("double", ge=0.0, le=1.0)
    note = Field("string", backfill=True)


def test_constraint_names_and_order(spark):
    names = list(Mini.violation_predicates())
    assert names == [
        "pk_not_null",
        "code_pattern",
        "grade_domain",
        "score_range",
    ]


def test_validate_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "AB", 1, 0.5, None),
            (None, "xy", 9, -0.1, None),  # 4 violations in one row
            (3, None, None, None, None),  # NULLs violate nothing here
        ],
        "pk long, code string, grade int, score double, note string",
    )
    got = {r["constraint"]: r["violations"] for r in Mini.validate(df).collect()}
    assert got == {
        "pk_not_null": 1,
        "code_pattern": 1,
        "grade_domain": 1,
        "score_range": 1,
    }


def test_regex_fullmatches(spark):
    # patito fullmatches: a 3-char string must NOT satisfy the 2-char
    # pattern by substring match
    df = spark.createDataFrame([("ABC",), ("AB",)], "code string")
    pred = dict(Mini.fields()["code"].violation_checks())["code_pattern"]
    got = [r[0] for r in df.select(pred).collect()]
    assert got == [True, False]


def test_conform_backfills_casts_orders(spark):
    df = spark.createDataFrame(
        [(1, "0.25", 2, "AB", "x")],
        "pk long, score string, grade int, code string, extra string",
    )
    out = Mini.conform(df, extra=("extra",))
    assert out.columns == ["pk", "code", "grade", "score", "note", "extra"]
    row = out.collect()[0]
    assert row["score"] == 0.25 and row["note"] is None
    assert dict(out.dtypes)["score"] == "double"


def test_conform_missing_required_raises(spark):
    df = spark.createDataFrame([(1,)], "pk long")
    with pytest.raises(ValueError, match="missing required"):
        Mini.conform(df)


def test_check_unique(spark):
    dup = spark.createDataFrame([(1,), (1,), (2,)], "pk long")
    row = Mini.check_unique(dup).collect()[0]
    assert (row["key"], row["n_rows"], row["n_keys"], row["is_unique"]) == (
        "pk",
        3,
        2,
        False,
    )


def test_fide_model_matches_legacy_constraint_set(spark):
    """The model-compiled FIDE constraints must cover every hand-rolled
    predicate name from the pre-model implementation (plus the two
    required-period not-null checks it omitted)."""
    names = set(FideRatings.violation_predicates())
    legacy = {
        "fide_id_not_null",
        "rating_not_null",
        "game_count_not_null",
        "k_not_null",
        "federation_pattern",
        "sex_domain",
        "birth_year_range",
        "period_year_range",
        "period_month_range",
    }
    assert legacy <= names
    assert names - legacy == {"period_year_not_null", "period_month_not_null"}
    assert FideRatings.unique_keys() == ["fide_id"]


def test_fide_model_conform_is_preprocess_schema(spark):
    """ingest.preprocess output must BE the declared model schema (plus
    the game_format partition dim) — declare-once, enforced in the
    pipeline itself."""
    from chess_ratings_spark import ingest

    raw = spark.createDataFrame(
        [(10, "A", "GER", "M", 2000, 20, 10, 1990, "i")],
        "fideid long, name string, country string, sex string, "
        "rating long, games long, k long, birthday long, flag string",
    )
    out = ingest.preprocess(raw, 2024, 6, "standard")
    assert out.columns == list(FideRatings.fields()) + ["game_format"]
    dt = dict(out.dtypes)
    for name, f in FideRatings.fields().items():
        assert dt[name] == f.dtype, name
