"""geo_grid_join invariants: the grid-bucketed radius join must (a)
return exactly the naive quadratic answer (capture proof: cell side 16
>= radius 8 makes the 3x3 replication complete), and (b) carry NO
cartesian/nested-loop join in the physical plan — the entire point of
grid bucketing is that the radius join runs as an equi-join whose
candidate count scales with local density, not |L| x |R|."""

from __future__ import annotations

import chess_ratings_spark.plans  # noqa: F401
from chess_ratings_spark.registry import REGISTRY

from .conftest import SF_CORRECT, SF_SMOKE


def test_grid_join_equals_naive_theta_join(spark):
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.plans.geo import _points

    ev = tables.load(spark, SF_CORRECT, "events")
    s = _points(ev, "store")
    p = _points(ev, "probe")
    naive = (
        s.crossJoin(p)
        .withColumn(
            "d2",
            (F.col("sx") - F.col("px")) * (F.col("sx") - F.col("px"))
            + (F.col("sy") - F.col("py")) * (F.col("sy") - F.col("py")),
        )
        .filter(F.col("d2") <= 64)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.coalesce(F.sum("d2"), F.lit(0)).cast("bigint").alias("sum_dist2"),
            F.countDistinct("sid").alias("n_stores_matched"),
            F.countDistinct("pid").alias("n_probes_matched"),
        )
        .collect()[0]
    )
    grid = REGISTRY["geo_grid_join"].fn(spark, SF_CORRECT).collect()[0]
    assert grid.asDict() == naive.asDict()
    assert grid["n_pairs"] > 0, "fixture yields no pairs - test is vacuous"


def test_grid_join_plan_is_equi_join(spark):
    df = REGISTRY["geo_grid_join"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
