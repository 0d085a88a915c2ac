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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

#: coordinates biased toward a dense 48x48 box (pairs within r=8
#: actually occur, and cell borders at 16/32/48 get exercised) with
#: occasional far-field points
_coord = st.one_of(st.integers(0, 47), st.integers(0, 999))
_pts = st.lists(st.tuples(_coord, _coord), min_size=0, max_size=40)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stores=_pts, probes=_pts)
def test_grid_capture_is_complete_on_random_points(spark, stores, probes):
    """Property: for ARBITRARY point sets (hypothesis shrinks toward
    cell borders and coincident points), the 3x3-replicated grid
    equi-join finds exactly the pairs the O(n^2) reference finds —
    the cell-side>=radius capture proof, tested rather than trusted."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables

    s = tables.local_table(
        spark,
        [(i, x, y) for i, (x, y) in enumerate(stores)],
        [("sid", "bigint"), ("sx", "bigint"), ("sy", "bigint")],
    )
    p = tables.local_table(
        spark,
        [(i, x, y) for i, (x, y) in enumerate(probes)],
        [("pid", "bigint"), ("px", "bigint"), ("py", "bigint")],
    )
    rep = s.withColumn(
        "dxy",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ),
    ).select(
        "sid", "sx", "sy",
        (
            (F.expr("sx div 16") + F.col("dxy.dx")) * 64
            + (F.expr("sy div 16") + F.col("dxy.dy"))
        ).alias("cell"),
    )
    pr = p.withColumn("cell", F.expr("(px div 16) * 64 + (py div 16)"))
    d2 = (F.col("sx") - F.col("px")) * (F.col("sx") - F.col("px")) + (
        F.col("sy") - F.col("py")
    ) * (F.col("sy") - F.col("py"))
    grid = {
        (r.sid, r.pid)
        for r in rep.join(pr, "cell").filter(d2 <= 64).select("sid", "pid").collect()
    }
    naive = {
        (i, j)
        for i, (sx, sy) in enumerate(stores)
        for j, (px, py) in enumerate(probes)
        if (sx - px) ** 2 + (sy - py) ** 2 <= 64
    }
    assert grid == naive


# -- geo_knn_join (round 11): exact kNN via grid-ring expansion --------


def test_knn_join_equals_naive_quadratic(spark):
    """The grid-ring kNN must reproduce the naive cartesian-then-rank
    reference exactly at fixture scale (census compare, all columns)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.plans.geo import _K, _points

    ev = tables.load(spark, SF_CORRECT, "events")
    s = _points(ev, "store")
    p = _points(ev, "probe")
    d2 = (F.col("sx") - F.col("px")) * (F.col("sx") - F.col("px")) + (
        F.col("sy") - F.col("py")
    ) * (F.col("sy") - F.col("py"))
    rank = Window.partitionBy("pid").orderBy("d2", "sid")
    naive = (
        p.crossJoin(s)
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= _K)
        .withColumn(
            "is_kth", F.col("rn") == F.max("rn").over(Window.partitionBy("pid"))
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("pid").alias("n_probes_matched"),
            F.countDistinct("sid").alias("n_stores_used"),
            F.coalesce(F.sum("d2"), F.lit(0)).cast("bigint").alias("sum_d2"),
            F.coalesce(F.sum(F.when(F.col("is_kth"), F.col("d2"))), F.lit(0))
            .cast("bigint")
            .alias("sum_kth_d2"),
        )
        .collect()[0]
    )
    got = REGISTRY["geo_knn_join"].fn(spark, SF_CORRECT).collect()[0]
    assert got.asDict() == naive.asDict()
    assert got["n_pairs"] > 0, "fixture yields no pairs - test is vacuous"


def test_knn_join_plan_is_equi_join(spark):
    """Every round's join (the returned plan unions all of them) must
    be an equi-join on the cell key — no cartesian, no nested loop."""
    df = REGISTRY["geo_knn_join"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stores=_pts, probes=_pts)
def test_knn_join_exact_on_random_points(spark, stores, probes):
    """Property: for ARBITRARY point sets — coincident points (distance
    ties exercising the (d2, sid) tiebreak), fewer than k stores (the
    full-cover round must emit the partial list), empty sides — the
    grid-ring kNN returns exactly the quadratic reference's pair set."""
    from chess_ratings_spark import tables
    from chess_ratings_spark.operators.joins import knn_join_grid

    s = tables.local_table(
        spark,
        [(i, x, y) for i, (x, y) in enumerate(stores)],
        [("sid", "bigint"), ("sx", "bigint"), ("sy", "bigint")],
    )
    p = tables.local_table(
        spark,
        [(i, x, y) for i, (x, y) in enumerate(probes)],
        [("pid", "bigint"), ("px", "bigint"), ("py", "bigint")],
    )
    got = {
        (r.pid, r.sid, r.d2, r.rn)
        for r in knn_join_grid(p, s, k=3, side=16, n_cells=64).collect()
    }
    want = set()
    for j, (px, py) in enumerate(probes):
        ranked = sorted(
            (((sx - px) ** 2 + (sy - py) ** 2), i)
            for i, (sx, sy) in enumerate(stores)
        )
        for rn, (d2, i) in enumerate(ranked[:3], start=1):
            want.add((j, i, d2, rn))
    assert got == want


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    stores=_pts,
    probes=_pts,
    side=st.sampled_from([5, 16, 40, 333]),
    k=st.integers(1, 4),
)
def test_knn_side_is_pure_performance_knob(spark, stores, probes, side, k):
    """The doc claims any cell side returns the identical exact answer
    (production tunes it from density stats without re-validating).
    Pin that: arbitrary sides and k against the quadratic reference."""
    from chess_ratings_spark import tables
    from chess_ratings_spark.operators.joins import knn_join_grid

    n_cells = 1000 // side + 1
    s = tables.local_table(
        spark,
        [(i, x, y) for i, (x, y) in enumerate(stores)],
        [("sid", "bigint"), ("sx", "bigint"), ("sy", "bigint")],
    )
    p = tables.local_table(
        spark,
        [(i, x, y) for i, (x, y) in enumerate(probes)],
        [("pid", "bigint"), ("px", "bigint"), ("py", "bigint")],
    )
    got = {
        (r.pid, r.sid, r.d2, r.rn)
        for r in knn_join_grid(p, s, k=k, side=side, n_cells=n_cells).collect()
    }
    want = set()
    for j, (px, py) in enumerate(probes):
        ranked = sorted(
            (((sx - px) ** 2 + (sy - py) ** 2), i)
            for i, (sx, sy) in enumerate(stores)
        )
        for rn, (d2, i) in enumerate(ranked[:k], start=1):
            want.add((j, i, d2, rn))
    assert got == want
