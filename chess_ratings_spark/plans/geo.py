"""Spatial/radius joins as grid-bucketed EQUI-joins.

A radius join ("all pairs within distance r") is a theta join, and a
naive theta join is a cartesian product — the one physical shape that
never survives scale. The standard distributed answer (Sedona/Magellan
and every LSH-adjacent blocking scheme) is grid bucketing: snap points
to cells of side >= r, replicate ONE side to its 3x3 cell neighborhood,
equi-join on the cell id, and apply the exact distance predicate on the
(bounded) candidate pairs. Candidates per probe are bounded by local
density x 9 cells — never by table size — and the join is a plain
shuffled hash/SMJ on one BIGINT key, so AQE, partial aggregation and
skew handling all apply as usual.

Points are derived deterministically from fixture columns (integer LCG
mixes of event_id on a 1000x1000 grid) so the DuckDB oracle replays the
identical geometry and the match set is exact, not approximate: with
cell side 16 > r = 8, any pair within r differs by at most one cell per
axis, so the 9-cell replication provably captures every qualifying pair
(tests/test_geo.py asserts the physical plan carries no
BroadcastNestedLoopJoin/CartesianProduct — the point of the pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chess_ratings_spark import tables
from chess_ratings_spark.registry import register

#: grid geometry: 1000x1000 integer space, cell side 16 (>= radius 8,
#: the capture-proof precondition), 64 cells per axis in the cell-id mix
_SIDE = 16
_R2 = 64  # radius 8, squared


def _points(df: DataFrame, kind: str) -> DataFrame:
    """Deterministic integer coordinates from event_id — two distinct
    LCG-style mixes so the two point sets are uncorrelated. BIGINT-safe
    (event_id * 69621 stays far below 2^63 at any fixture sf)."""
    if kind == "store":
        return df.filter(F.col("event_type") == "signup").select(
            F.col("event_id").alias("sid"),
            F.expr("(event_id * 48271) % 1000").alias("sx"),
            F.expr("((event_id + 7) * 16807) % 1000").alias("sy"),
        )
    return df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.expr("(event_id * 69621) % 1000").alias("px"),
        F.expr("((event_id + 3) * 48271) % 1000").alias("py"),
    )


@register(
    "geo_grid_join",
    oracle="""
    WITH s AS (
      SELECT event_id AS sid,
             (event_id * 48271) % 1000 AS sx,
             ((event_id + 7) * 16807) % 1000 AS sy
      FROM events WHERE event_type = 'signup'
    ),
    p AS (
      SELECT event_id AS pid,
             (event_id * 69621) % 1000 AS px,
             ((event_id + 3) * 48271) % 1000 AS py
      FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
      -- the oracle is the NAIVE theta join: the grid join must return
      -- exactly the pairs the quadratic reference produces
      SELECT sid, pid,
             (sx - px) * (sx - px) + (sy - py) * (sy - py) AS d2
      FROM s, p
      WHERE abs(sx - px) <= 8 AND abs(sy - py) <= 8
        AND (sx - px) * (sx - px) + (sy - py) * (sy - py) <= 64
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(coalesce(sum(d2), 0) AS BIGINT) AS sum_dist2,
           CAST(count(DISTINCT sid) AS BIGINT) AS n_stores_matched,
           CAST(count(DISTINCT pid) AS BIGINT) AS n_probes_matched
    FROM pairs
    """,
    doc="Radius join (all signup/purchase point pairs within Euclidean "
    "distance 8 on a derived 1000x1000 integer grid) executed as a "
    "grid-bucketed EQUI-join: stores replicate to their 3x3 cell "
    "neighborhood (bounded 9x fan-out of ONE side), probes join on "
    "the single BIGINT cell id, and the exact distance predicate "
    "filters the bounded candidate set. Cell side 16 >= radius 8 "
    "makes the 9-cell capture provably complete, so the result "
    "equals the oracle's naive quadratic theta join exactly. The "
    "physical plan is a plain shuffled join on the cell key — no "
    "BroadcastNestedLoopJoin, no CartesianProduct (plan-asserted in "
    "tests/test_geo.py): candidates scale with local density, not "
    "with |left| x |right|.",
    tags=("geo", "join", "scale", "events"),
)
def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    stores = _points(ev, "store")
    probes = _points(ev, "probe")
    # one side replicates to its 9-cell neighborhood; 64 cells per axis
    # pack (cx, cy) into one BIGINT key so the join has a single
    # shuffle column
    rep = stores.withColumn(
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
        "sid",
        "sx",
        "sy",
        (
            (F.expr("sx div 16") + F.col("dxy.dx")) * 64
            + (F.expr("sy div 16") + F.col("dxy.dy"))
        ).alias("cell"),
    )
    pr = probes.withColumn(
        "cell", F.expr("(px div 16) * 64 + (py div 16)")
    )
    pairs = (
        rep.join(pr, "cell")
        .withColumn(
            "d2",
            (F.col("sx") - F.col("px")) * (F.col("sx") - F.col("px"))
            + (F.col("sy") - F.col("py")) * (F.col("sy") - F.col("py")),
        )
        .filter(F.col("d2") <= _R2)
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum("d2"), F.lit(0)).cast("bigint").alias("sum_dist2"),
        F.countDistinct("sid").alias("n_stores_matched"),
        F.countDistinct("pid").alias("n_probes_matched"),
    )


#: kNN query shape: 3 nearest signup points per purchase point
_K = 3


@register(
    "geo_knn_join",
    oracle=f"""
    WITH s AS (
      SELECT event_id AS sid,
             (event_id * 48271) % 1000 AS sx,
             ((event_id + 7) * 16807) % 1000 AS sy
      FROM events WHERE event_type = 'signup'
    ),
    p AS (
      SELECT event_id AS pid,
             (event_id * 69621) % 1000 AS px,
             ((event_id + 3) * 48271) % 1000 AS py
      FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
      -- the oracle is the NAIVE quadratic kNN: rank every store per
      -- probe; the grid-ring join must reproduce it bit-for-bit
      SELECT pid, sid,
             (sx - px) * (sx - px) + (sy - py) * (sy - py) AS d2,
             row_number() OVER (
               PARTITION BY pid
               ORDER BY (sx - px) * (sx - px) + (sy - py) * (sy - py), sid
             ) AS rn
      FROM p CROSS JOIN s
    ),
    topk AS (SELECT * FROM cand WHERE rn <= {_K}),
    flagged AS (
      SELECT *, rn = max(rn) OVER (PARTITION BY pid) AS is_kth FROM topk
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT pid) AS BIGINT) AS n_probes_matched,
           CAST(count(DISTINCT sid) AS BIGINT) AS n_stores_used,
           CAST(coalesce(sum(d2), 0) AS BIGINT) AS sum_d2,
           CAST(coalesce(sum(CASE WHEN is_kth THEN d2 END), 0) AS BIGINT)
             AS sum_kth_d2
    FROM flagged
    """,
    doc="EXACT k-nearest-neighbor join (3 nearest signup points per "
    "purchase point) via iterative grid-ring expansion "
    "(operators/joins.knn_join_grid): round i replicates only the "
    "still-UNRESOLVED probes to their (2i+1)^2-cell block (half-width "
    "doubling, clamped to the grid) and equi-joins on one BIGINT cell "
    "id; a probe is done when its kth candidate lies within i*side — "
    "points outside the block are provably farther, the radius join's "
    "capture proof applied per ring. Every round is an equi-join + "
    "one keyed window; no CartesianProduct, no BroadcastNestedLoop "
    "(plan-asserted in tests/test_geo.py). Unresolved probes decay "
    "geometrically when the cell side matches the typical kNN "
    "distance, and the side is a pure performance knob — any value "
    "yields the identical exact answer (the oracle replays the naive "
    "quadratic kNN and must hash-match). Ties broken (d2, sid): "
    "deterministic across engines, partition layouts, and rounds.",
    tags=("geo", "join", "scale", "events"),
)
def geo_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from chess_ratings_spark.operators.joins import knn_join_grid

    ev = tables.load(spark, sf_dir, "events")
    pairs = knn_join_grid(
        _points(ev, "probe"), _points(ev, "store"), k=_K, side=_SIDE, n_cells=64
    )
    is_kth = F.col("rn") == F.max("rn").over(Window.partitionBy("pid"))
    return pairs.withColumn("is_kth", is_kth).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("pid").alias("n_probes_matched"),
        F.countDistinct("sid").alias("n_stores_used"),
        F.coalesce(F.sum("d2"), F.lit(0)).cast("bigint").alias("sum_d2"),
        F.coalesce(F.sum(F.when(F.col("is_kth"), F.col("d2"))), F.lit(0))
        .cast("bigint")
        .alias("sum_kth_d2"),
    )
