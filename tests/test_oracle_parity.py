"""Differential test: every registered query with an oracle must match
DuckDB exactly at sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

import chess_ratings_spark.plans  # noqa: F401
from chess_ratings_spark.registry import REGISTRY

from .conftest import SF_SMOKE, compare_frames

ORACLE_IDS = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_IDS = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_IDS)
def test_oracle_parity(spark, ducks, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMOKE)
    compare_frames(df, ducks(SF_SMOKE), q.oracle, qname=name)


@pytest.mark.parametrize("name", ROWS_ONLY_IDS)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
