"""Property-based spot checks (SURVEY.md §5.2): operator laws on
arbitrary small inputs via hypothesis. Spark jobs are slow per-example,
so examples are capped low — these are law checks, not fuzzing."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chess_ratings_spark import ingest
from chess_ratings_spark.functions import scalar
from chess_ratings_spark.operators import setops

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # key
        st.sampled_from(["F", "M", "x", None]),  # sex-ish
        st.integers(min_value=0, max_value=2030),  # birthday with 0 sentinel
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(data=rows)
def test_recode_then_null_semantics(spark, data):
    """recode_map maps declared keys, NULLs everything else; sentinel 0
    → NULL — for every input row."""
    df = spark.createDataFrame(data, "k long, sex string, birthday long")
    out = df.select(
        "k",
        "sex",
        "birthday",
        scalar.recode_map("sex", ingest.SEX_CODES).alias("code"),
        scalar.sentinel_to_null("birthday", 0).alias("by"),
    ).collect()
    for r in out:
        expected = {"F": 0, "M": 1}.get(r.sex)
        assert r.code == expected
        assert r.by == (None if r.birthday == 0 else r.birthday)


@SLOW
@given(data=rows)
def test_dedup_idempotent(spark, data):
    """op(op(x)) == op(x) for deterministic keep-first dedup."""
    df = spark.createDataFrame(data, "k long, sex string, birthday long")
    order = [F.col("sex").asc_nulls_last(), F.col("birthday")]
    once = setops.dedup_keep_first(df, keys=["k"], order=order)
    twice = setops.dedup_keep_first(once, keys=["k"], order=order)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.select("k").distinct().count() == once.count()


@SLOW
@given(data=rows)
def test_union_missing_columns_commutes_with_backfill(spark, data):
    """unionByName(allowMissingColumns) ≡ add-missing-columns-then-union
    (the reference's schema normalization, ingest_web_to_gcs.py:26-37)."""
    full = spark.createDataFrame(data, "k long, sex string, birthday long")
    partial = full.drop("sex")
    from collections import Counter

    a = setops.union_snapshots(full, partial)
    b = full.unionByName(
        scalar.add_missing_columns(partial, {"sex": "string"}).select(
            "k", "sex", "birthday"
        )
    )
    assert Counter(map(tuple, a.collect())) == Counter(map(tuple, b.collect()))


@SLOW
@given(y=st.integers(min_value=2000, max_value=2099), m=st.integers(min_value=1, max_value=12))
def test_month_code_and_url_total(spark, y, m):
    """month_code is total on 1-12 and the URL embeds exactly the
    two-digit year + code (ingest_web_to_gcs.py:40-57)."""
    df = spark.createDataFrame([(y, m)], "y int, m int")
    r = df.select(
        scalar.month_code("m").alias("code"),
        scalar.ratings_url(F.lit("blitz"), F.col("y"), F.col("m")).alias("url"),
    ).collect()[0]
    assert r.code == scalar.MONTH_CODES[m - 1]
    assert r.url == f"https://ratings.fide.com/download/blitz_{r.code}{str(y)[-2:]}frl_xml.zip"
