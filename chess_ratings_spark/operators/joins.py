"""Join operators (SURVEY.md §2.4).

The reference performs no relational join — its only product-shaped op is
the backfill cross product (``ingest_web_to_gcs.py:231``). This module
supplies the join surface any analytics engine over the star schema
needs, each expressed so Catalyst picks the right physical strategy:

- equi joins: plain ``df.join`` → AQE chooses broadcast/SMJ/SHJ;
- dimension joins: explicit ``F.broadcast`` on true small dims — at
  100 TB the fact side never shuffles for a 25-row nation table;
- as-of join: no native Spark physical op; implemented union-tag +
  window ``last(ignorenulls)`` — a single shuffle on the join key, no
  per-row Python (cf. the pd.merge_asof-per-group alternative, which
  breaks on groups that exceed one Arrow batch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame, right: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Plain equi join; Catalyst/AQE picks broadcast vs shuffle strategy."""
    return left.join(right, on=on, how=how)


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Fact ⋈ small dimension with an explicit broadcast hint.

    Broadcast keeps the (possibly 100 TB) fact side shuffle-free: the dim
    is replicated to every executor and the join runs map-side.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — rows of `left` with a match in `right` (no right columns)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of `left` without a match in `right`."""
    return left.join(right, on=on, how="left_anti")


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cartesian product — only sane when at least one side is tiny
    (the reference's formats × months backfill enumeration)."""
    return left.crossJoin(right)


def theta_join(left: DataFrame, right: DataFrame, cond: Column, how: str = "inner") -> DataFrame:
    """Non-equi predicate join. Without an equi prefix Catalyst falls back
    to broadcast-nested-loop; callers joining two big sides should add a
    blocking/banding key first (see similarity.py for the pattern)."""
    return left.join(right, on=cond, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (backward) per key.

    Union-tag implementation: stack both sides on (key, ts), then a
    window ``last(value, ignorenulls=True)`` ordered by (ts, side)
    carries the most recent right-side values forward onto left rows.
    One shuffle on `key`, sort within partitions — the same physical
    shape a native as-of operator would need. Ties (right_ts == left_ts)
    match, mirroring DuckDB ``ASOF JOIN`` (>=) semantics: the right side
    sorts before the left at equal timestamps via the side tag.

    ``direction="forward"`` flips the traversal (descending ts, right
    still before left at equal ts), yielding the EARLIEST right row
    with ``right_ts >= left_ts`` — DuckDB ``ASOF`` with ``<=``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown as-of direction: {direction}")
    lcols = left.columns
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}") for v in value_cols],
    )
    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    )
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_l.unionByName(tagged_r).select(
        "*", *[F.last(f"__v_{v}", ignorenulls=True).over(w).alias(v) for v in value_cols]
    )
    return filled.filter(F.col("__side") == 1).select(*lcols, *value_cols)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Nearest-as-of join: for each left row, the right row minimizing
    ``|right_ts - left_ts|`` per key, ties broken BACKWARD (the
    at-or-before match) — the sensor-alignment semantics backward and
    forward each get only half right. Timestamps must be numeric
    (pass epoch micros/nanos) so the tie-break compares exact
    integers, and the right side must be unique per (key, ts)
    (pre-aggregate duplicates, as the registered query does) — equal-
    ts right rows would otherwise be ordered arbitrarily within the
    window sort.

    ONE union-tag pass: the same keyed sort serves a backward
    ``last(ignorenulls)`` window (unbounded preceding → current) and a
    forward ``first(ignorenulls)`` window (next row → unbounded
    following), so BOTH candidates cost a single shuffle — two
    separate as-of joins would shuffle twice and join again. Right
    rows sort before left at equal ts, so an equal-ts match lands in
    the backward window with lag 0 and wins every tie.

    Output: left columns + chosen ``value_cols`` + ``asof_direction``
    ('backward' | 'forward' | 'none') + ``asof_lag`` (nonnegative, in
    the caller's ts unit; NULL when unmatched).
    """
    lcols = left.columns
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[
            F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}")
            for v in value_cols
        ],
        F.lit(None).cast(left.schema[left_ts].dataType).alias("__rts"),
    )
    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
        F.col(right_ts).alias("__rts"),
    )
    order = [F.col("__ts"), F.col("__side")]
    w_b = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    sel = [
        "*",
        F.last("__rts", ignorenulls=True).over(w_b).alias("__bts"),
        F.first("__rts", ignorenulls=True).over(w_f).alias("__fts"),
    ]
    for v in value_cols:
        sel.append(F.last(f"__v_{v}", ignorenulls=True).over(w_b).alias(f"__b_{v}"))
        sel.append(F.first(f"__v_{v}", ignorenulls=True).over(w_f).alias(f"__f_{v}"))
    rows = (
        tagged_l.unionByName(tagged_r).select(*sel).filter(F.col("__side") == 1)
    )
    back = F.col("__fts").isNull() | (
        F.col("__bts").isNotNull()
        & ((F.col("__ts") - F.col("__bts")) <= (F.col("__fts") - F.col("__ts")))
    )
    none = F.col("__bts").isNull() & F.col("__fts").isNull()
    out_vals = [
        F.when(back, F.col(f"__b_{v}")).otherwise(F.col(f"__f_{v}")).alias(v)
        for v in value_cols
    ]
    direction = (
        F.when(none, F.lit("none"))
        .when(back, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("asof_direction")
    )
    lag = (
        F.when(none, F.lit(None).cast("bigint"))
        .when(back, F.col("__ts") - F.col("__bts"))
        .otherwise(F.col("__fts") - F.col("__ts"))
        .cast("bigint")
        .alias("asof_lag")
    )
    return rows.select(*lcols, *out_vals, direction, lag)


def knn_join_grid(
    probes: DataFrame,
    stores: DataFrame,
    k: int,
    side: int,
    n_cells: int,
) -> DataFrame:
    """EXACT k-nearest-neighbor join via iterative grid-ring expansion
    — the kNN complement to the radius join in ``plans/geo.py``, and
    the same reason for existing: a naive kNN join is a cartesian
    product ranked per probe, the one shape that never survives scale.

    ``probes`` carries (pid, px, py), ``stores`` (sid, sx, sy); integer
    coordinates on a ``side * n_cells`` square. Returns the exact k
    nearest stores per probe as (pid, sid, d2, rn), rn 1..k ordered by
    (d2, sid) — deterministic under distance ties, so an oracle can
    replay the quadratic reference bit-for-bit.

    Round ``i`` (half-widths doubling 1, 2, 4, ... then the full-cover
    width ``n_cells - 1``) replicates each UNRESOLVED probe to the
    (2i+1)^2 cells of its block — clamped to the grid, so the final
    round degrades to "every cell" and termination is unconditional —
    and equi-joins on the packed BIGINT cell id. A probe is DONE when
    its k-th candidate satisfies ``d2 <= (i * side)^2``: any point
    outside the block differs by at least ``i*side + 1`` on some axis
    (coords are integers and the block spans ``i`` whole cells beyond
    the probe's own), so no unseen store can beat an in-block candidate
    at or under that radius — the same capture proof as the radius
    join, per ring. Every join in every round is an equi-join on one
    BIGINT key; no CartesianProduct, no BroadcastNestedLoopJoin.

    Scale posture (the 100 TB question): replication cost is
    ``sum_i (2i+1)^2 * |unresolved_i|`` and ``unresolved`` decays
    geometrically when ``side`` is of the order of the typical k-NN
    distance — at uniform density most probes resolve at i=1 (9x on
    one side, exactly the radius join's constant). ``side`` is a pure
    PERFORMANCE knob: any value returns the identical exact answer, so
    production picks it from density stats without re-validating
    results. Per-round state is cut with eager localCheckpoints (the
    graph-operator loop hygiene); the driver reads one boolean per
    round (isEmpty), never data.
    """
    d2 = (F.col("sx") - F.col("px")) * (F.col("sx") - F.col("px")) + (
        F.col("sy") - F.col("py")
    ) * (F.col("sy") - F.col("py"))
    # one narrow (sid, sx, sy, cell) frame, materialized once: every
    # ring round equi-joins against it, and without the checkpoint each
    # round would re-run the caller's whole store lineage (parquet scan
    # + filters) just to rebuild the same cell ids
    cells = stores.select(
        "sid",
        "sx",
        "sy",
        (
            F.expr(f"sx div {side}") * n_cells + F.expr(f"sy div {side}")
        ).alias("cell"),
    ).localCheckpoint(eager=True)
    todo = probes.select(
        "pid",
        "px",
        "py",
        F.expr(f"px div {side}").alias("cx"),
        F.expr(f"py div {side}").alias("cy"),
    )
    full = n_cells - 1
    widths: list[int] = []
    w_ = 1
    while w_ < full:
        widths.append(w_)
        w_ *= 2
    widths.append(full)

    rank = Window.partitionBy("pid").orderBy("d2", "sid")
    contribs: list[DataFrame] = []
    for i in widths:
        rep = (
            todo.withColumn(
                "ncx",
                F.explode(
                    F.sequence(
                        F.greatest(F.col("cx") - i, F.lit(0)),
                        F.least(F.col("cx") + i, F.lit(n_cells - 1)),
                    )
                ),
            )
            .withColumn(
                "ncy",
                F.explode(
                    F.sequence(
                        F.greatest(F.col("cy") - i, F.lit(0)),
                        F.least(F.col("cy") + i, F.lit(n_cells - 1)),
                    )
                ),
            )
            .select(
                "pid",
                "px",
                "py",
                (F.col("ncx") * n_cells + F.col("ncy")).alias("cell"),
            )
        )
        topk = (
            rep.join(cells, "cell")
            .withColumn("d2", d2)
            .withColumn("rn", F.row_number().over(rank))
            .filter(F.col("rn") <= k)
            .select("pid", "sid", "d2", "rn")
        )
        if i == full:  # block = whole grid: everyone remaining is done
            contribs.append(topk)
            break
        # done-detection rides the rank window's own exchange+sort: a
        # second pid-partitioned window over the filtered top-k rows
        # (count of candidates, k-th distance) needs no new Exchange —
        # the rows are already hashed and sorted by pid — so the old
        # per-round groupBy(pid) agg job and the separate semi-joined
        # contribution checkpoint collapse into this ONE materialized
        # frame
        caps = Window.partitionBy("pid")
        flagged = (
            topk.withColumn("nc", F.count(F.lit(1)).over(caps))
            .withColumn("kth", F.max("d2").over(caps))
            .withColumn(
                "is_done",
                (F.col("nc") == k) & (F.col("kth") <= (i * side) ** 2),
            )
            .select("pid", "sid", "d2", "rn", "is_done")
            .localCheckpoint(eager=True)
        )
        contribs.append(
            flagged.filter("is_done").select("pid", "sid", "d2", "rn")
        )
        done = flagged.filter("is_done").select("pid")
        nxt = todo.join(done, "pid", "left_anti").localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        todo = nxt
    out = contribs[0]
    for c in contribs[1:]:
        out = out.unionByName(c)
    return out
