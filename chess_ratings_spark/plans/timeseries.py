"""Time-series operators: resampling into OHLC bars and calendar
gap-fill with linear interpolation.

Both are staples of a telemetry/metrics engine that the rest of the
registry did not yet cover: ``ts_resample_ohlc`` is downsampling
(irregular events -> fixed-width bars with order-sensitive open/close
picks made deterministic), ``ts_gapfill_interpolate`` is upsampling
(sparse daily series -> dense calendar spine with the holes filled by
exact integer linear interpolation).

Scale notes (100 TB posture): both plans are one keyed shuffle each —
OHLC is a single groupBy over (event_type, bucket) with the open/close
picks expressed as window row-numbers over the SAME partitioning (no
second shuffle: the window and the aggregation share
(event_type, bucket) clustering); gap-fill's spine is generated
per-key with ``sequence()`` (rows ~= span_days x n_keys, never a
cross-join against a global calendar), and the prev/next scans are
windows over the same per-key partitioning as the spine join. Neither
plan collects anything to the driver.

Determinism: open/close are row picks, not sums — made exact by the
(ts, event_id) total order (event_id is unique); sums are on the
centi-integer grid; interpolation is integer arithmetic with
truncating division (Spark ``div`` == DuckDB ``//``, verified in
tests/test_grid_agreement.py's division bridge) — both sides compute
bit-identical BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chess_ratings_spark import tables
from chess_ratings_spark.registry import register

#: 6-hour bars, expressed in epoch microseconds (engine-portable:
#: Spark `tables._MICROS_FROM_NTZ` (zone-free) == DuckDB `epoch_us(ts)`).
_BAR_US = 6 * 3600 * 1_000_000


@register(
    "ts_resample_ohlc",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             epoch_us(ts) // {_BAR_US} AS bar,
             CAST(floor(value * 100) AS BIGINT) AS vc,
             row_number() OVER (
               PARTITION BY event_type, epoch_us(ts) // {_BAR_US}
               ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (
               PARTITION BY event_type, epoch_us(ts) // {_BAR_US}
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type,
           CAST(bar AS BIGINT) AS bar,
           CAST(max(CASE WHEN rn_a = 1 THEN vc END) AS BIGINT) AS open,
           CAST(max(vc) AS BIGINT) AS high,
           CAST(min(vc) AS BIGINT) AS low,
           CAST(max(CASE WHEN rn_d = 1 THEN vc END) AS BIGINT) AS close,
           CAST(count(*) AS BIGINT) AS volume,
           CAST(sum(vc) AS BIGINT) AS amount
    FROM base
    GROUP BY event_type, bar
    ORDER BY event_type, bar
    """,
    doc="Downsample irregular events into fixed 6-hour OHLC bars per "
    "event_type: open/close are the first/last value in (ts, event_id) "
    "order (the unique event_id breaks ts ties, so the order-sensitive "
    "picks are total-order deterministic), high/low/volume/amount are "
    "plain aggregates on the centi grid. One shuffle: the row-number "
    "windows and the groupBy share the (event_type, bar) clustering, "
    "so Spark plans a single Exchange reused by both operators. This "
    "is the metrics-downsampling verb (Prometheus-style rollup / "
    "candlestick bars) the registry lacked.",
    tags=("timeseries", "window", "events"),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.expr(
            f"{tables._MICROS_FROM_NTZ.format(ts='ts')} div {_BAR_US}"
        ).alias("bar"),
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    w = Window.partitionBy("event_type", "bar")
    base = base.withColumn(
        "rn_a", F.row_number().over(w.orderBy(F.col("ts").asc(), F.col("event_id").asc()))
    ).withColumn(
        "rn_d", F.row_number().over(w.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
    )
    return (
        base.groupBy("event_type", "bar")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("vc"))).alias("open"),
            F.max("vc").alias("high"),
            F.min("vc").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("vc"))).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.sum("vc").alias("amount"),
        )
        .orderBy("event_type", "bar")
    )


@register(
    "ts_gapfill_interpolate",
    oracle="""
    WITH per AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS vc
      FROM events WHERE user_id % 97 = 0
      GROUP BY event_type, CAST(ts AS DATE)
    ), span AS (
      SELECT event_type, min(d) AS mn, max(d) AS mx FROM per GROUP BY event_type
    ), spine AS (
      SELECT event_type,
             CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
      FROM span
    ), j AS (
      SELECT sp.event_type, sp.d, p.vc
      FROM spine sp LEFT JOIN per p USING (event_type, d)
    ), f AS (
      SELECT event_type, d, vc,
             last_value(vc IGNORE NULLS) OVER w_p AS prev_v,
             last_value(CASE WHEN vc IS NOT NULL THEN d END IGNORE NULLS)
               OVER w_p AS prev_d,
             first_value(vc IGNORE NULLS) OVER w_n AS next_v,
             first_value(CASE WHEN vc IS NOT NULL THEN d END IGNORE NULLS)
               OVER w_n AS next_d
      FROM j
      WINDOW w_p AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_n AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type,
           strftime(d, '%Y-%m-%d') AS day,
           CAST(coalesce(vc,
             (prev_v * date_diff('day', d, next_d)
              + next_v * date_diff('day', prev_d, d))
             // date_diff('day', prev_d, next_d)) AS BIGINT) AS value_centi,
           (vc IS NULL) AS interpolated
    FROM f ORDER BY event_type, day
    """,
    doc="Calendar gap-fill with linear interpolation: the user_id%97 "
    "slice of events has real multi-day holes per event_type (12-22 "
    "missing days at sf0.01); a per-key date spine is generated with "
    "sequence(min_d, max_d) — per-key spans, never a global-calendar "
    "cross join — observed daily centi-sums are left-joined on, and "
    "each hole is filled by exact integer linear interpolation "
    "between its nearest observed neighbors (prev/next located by "
    "IGNORE NULLS running windows; both endpoints always exist "
    "because the span ends are observed). The weighted-average "
    "numerator and the truncating division are pure BIGINT arithmetic "
    "on both engines (Spark div == DuckDB //), so interpolated values "
    "are bit-exact, not float-close.",
    tags=("timeseries", "window", "events"),
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    per = (
        ev.filter(F.col("user_id") % 97 == 0)
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("vc"))
    )
    spine = (
        per.groupBy("event_type")
        .agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("d"),
        )
    )
    j = spine.join(per, ["event_type", "d"], "left")
    w_p = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("vc").isNotNull(), F.col("d"))
    f = (
        j.withColumn("prev_v", F.last("vc", ignorenulls=True).over(w_p))
        .withColumn("prev_d", F.last(obs_d, ignorenulls=True).over(w_p))
        .withColumn("next_v", F.first("vc", ignorenulls=True).over(w_n))
        .withColumn("next_d", F.first(obs_d, ignorenulls=True).over(w_n))
    )
    interp = F.expr(
        "(prev_v * datediff(next_d, d) + next_v * datediff(d, prev_d))"
        " div datediff(next_d, prev_d)"
    )
    return f.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("vc"), interp).cast("bigint").alias("value_centi"),
        F.col("vc").isNull().alias("interpolated"),
    ).orderBy("event_type", "day")


@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH per AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS vs
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), span AS (
      SELECT event_type, min(d) AS mn, max(d) AS mx FROM per GROUP BY event_type
    ), spine AS (
      SELECT event_type,
             CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
      FROM span
    ), j AS (
      SELECT sp.event_type, sp.d, coalesce(p.vs, 0) AS vs
      FROM spine sp LEFT JOIN per p USING (event_type, d)
    ), t AS (
      SELECT event_type, d, vs,
             sum(vs) OVER w7 AS trend7,
             count(*) OVER w7 AS cnt7
      FROM j
      WINDOW w7 AS (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT event_type,
           CAST(date_diff('day', DATE '1970-01-01', d) % 7 AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(7 * vs - trend7) AS BIGINT) AS det_sum,
           CAST((sum(7 * vs - trend7) * 1000)
                // (7 * count(*)) AS BIGINT) AS seasonal_centi_e3
    FROM t WHERE cnt7 = 7
    GROUP BY event_type, dow ORDER BY event_type, dow
    """,
    doc="Classical seasonal decomposition, the additive "
    "moving-average form: daily centi-volume per event_type on a "
    "dense calendar spine (absent days are true zeros, not holes), "
    "trend = centered 7-day rolling sum (interior days only — the "
    "cnt7=7 guard drops the 3-day edges where the frame is "
    "truncated), detrended residual scaled to stay integral "
    "(det = 7*x - trend7, i.e. 7x the deviation from the rolling "
    "mean), and the weekly seasonal profile as the per-(type, "
    "weekday) mean of det, emitted exactly on an e3 grid by the "
    "verified truncating-division bridge (negative residuals "
    "truncate identically in both engines). Weekday is the "
    "engine-portable epoch-day mod 7 (0 = Thursday), never the "
    "engines' differing dayofweek conventions. Plan shape: one "
    "(type, day) aggregation, a per-key spine (no global-calendar "
    "cross join), one window partition per type reused by sum and "
    "count, one tiny final aggregation — at 100 TB the raw scan "
    "reduces to ~365 rows per type-year before anything windowed "
    "runs.",
    tags=("timeseries", "window", "statistics", "events"),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    per = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("vs"))
    spine = (
        per.groupBy("event_type")
        .agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("d"),
        )
    )
    j = spine.join(per, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce(F.col("vs"), F.lit(0)).alias("vs")
    )
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    t = j.select(
        "event_type",
        "d",
        "vs",
        F.sum("vs").over(w7).alias("trend7"),
        F.count(F.lit(1)).over(w7).alias("cnt7"),
    ).filter(F.col("cnt7") == 7)
    det = t.select(
        "event_type",
        (F.expr("datediff(d, DATE '1970-01-01')") % 7).cast("int").alias("dow"),
        (F.lit(7) * F.col("vs") - F.col("trend7")).alias("det"),
    )
    return (
        det.groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("det").cast("bigint").alias("det_sum"),
        )
        .selectExpr(
            "event_type",
            "dow",
            "n_days",
            "det_sum",
            "CAST((det_sum * 1000) div (7 * n_days) AS BIGINT)"
            " AS seasonal_centi_e3",
        )
        .orderBy("event_type", "dow")
    )


@register(
    "ts_changepoint",
    oracle="""
    WITH per AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS vs
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), c AS (
      SELECT event_type, d, vs,
             sum(vs) OVER w AS prefix,
             row_number() OVER w AS t,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(vs) OVER (PARTITION BY event_type) AS s
      FROM per
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS UNBOUNDED PRECEDING)
    ), scored AS (
      SELECT event_type, d, t, n, s, prefix,
             abs(n * prefix - t * s) AS score
      FROM c WHERE t < n
    ), best AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY score DESC, d) AS rk
      FROM scored
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           d AS cp_day,
           CAST(t AS BIGINT) AS cp_index,
           CAST(score AS BIGINT) AS cusum_abs,
           CAST((prefix * 1000) // t AS BIGINT) AS mean_before_e3,
           CAST(((s - prefix) * 1000) // (n - t) AS BIGINT) AS mean_after_e3
    FROM best WHERE rk = 1 ORDER BY event_type
    """,
    doc="CUSUM changepoint localization per series — WHERE did the "
    "level shift, the follow-up question to val_distribution_drift's "
    "and agg_ks_test's DID it shift. Exact integers end-to-end: daily "
    "centi-sums, the scaled cumulative deviation C_t = n*prefix_t - "
    "t*S (the textbook CUSUM of (x_i - mean) times n, which clears "
    "the division), changepoint = argmax |C_t| over interior split "
    "points (t < n; ties to the earliest day), and before/after level "
    "means by exact e3 truncating division. Plan: one (type, day) "
    "aggregation, then ONE window clustering per type feeds the "
    "cumulative sum, the row index, n, S, and the final argmax pick — "
    "a single Exchange after the daily rollup; at 100 TB the raw scan "
    "reduces to ~365 rows per type-year before any window runs. "
    "Cross-checked against numpy cumsum/argmax in "
    "tests/test_independent_refs.py.",
    tags=("timeseries", "statistics", "events"),
)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    per = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("vs"))
    w_ord = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_full = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = per.select(
        "event_type",
        "d",
        F.sum("vs").over(w_ord).alias("prefix"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("d")).alias("t"),
        F.count(F.lit(1)).over(w_full).alias("n"),
        F.sum("vs").over(w_full).alias("s"),
    ).filter(F.col("t") < F.col("n"))
    scored = c.withColumn(
        "score", F.abs(F.col("n") * F.col("prefix") - F.col("t") * F.col("s"))
    )
    best = scored.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("score"), "d")
        ),
    ).filter(F.col("rk") == 1)
    return best.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n_days",
        "d AS cp_day",
        "CAST(t AS BIGINT) AS cp_index",
        "CAST(score AS BIGINT) AS cusum_abs",
        "CAST((prefix * 1000) div t AS BIGINT) AS mean_before_e3",
        "CAST(((s - prefix) * 1000) div (n - t) AS BIGINT) AS mean_after_e3",
    ).orderBy("event_type")


_LTOB_BUCKETS = 24


@register(
    "ts_downsample_ltob",
    oracle=f"""
    WITH pts AS (
      SELECT event_type, event_id,
             epoch_us(ts) AS x,
             CAST(floor(value * 100) AS BIGINT) AS y
      FROM events
    ), ordered AS (
      SELECT event_type, event_id, x, y,
             row_number() OVER w AS t,
             count(*) OVER (PARTITION BY event_type) AS n,
             lag(x) OVER w AS xp, lag(y) OVER w AS yp,
             lead(x) OVER w AS xn, lead(y) OVER w AS yn
      FROM pts
      WINDOW w AS (PARTITION BY event_type ORDER BY x, event_id)
    ), area AS (
      SELECT event_type, event_id, x, y,
             CAST(((t - 1) * {_LTOB_BUCKETS}) // n AS INT) AS bucket,
             abs((xp - xn) * (y - yp) - (xp - x) * (yn - yp)) AS a2
      FROM ordered WHERE xp IS NOT NULL AND xn IS NOT NULL
    ), pick AS (
      SELECT event_type, bucket, x, y, a2,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY a2 DESC, x, event_id) AS rk
      FROM area
    )
    SELECT event_type, bucket, CAST(x AS BIGINT) AS epoch_us,
           y AS value_centi, CAST(a2 AS BIGINT) AS area2
    FROM pick WHERE rk = 1 ORDER BY event_type, bucket
    """,
    doc="LTOB time-series downsampling (largest-triangle-one-bucket, "
    "Steinarsson 2013 — the standard visualization downsampler family "
    "LTTB belongs to): each series is split into equal-COUNT buckets "
    "and each bucket keeps the point with the largest triangle area "
    "against its immediate neighbors — the point whose removal would "
    "deform the rendered line most. LTOB rather than LTTB "
    "deliberately: LTTB's triangle uses the PREVIOUSLY SELECTED "
    "point, a sequential dependency that cannot distribute; LTOB's "
    "fixed-neighbor triangle is one window pass, embarrassingly "
    "parallel, and is the documented practical fallback at scale. "
    "Exact integers: x = epoch microseconds (timestampdiff bridge), "
    "y on the centi grid, area as the |cross product| of BIGINTs "
    "(doubled area — no halving, stays integral), ties broken by "
    "(x, event_id). One window clustering per series computes the "
    "row index, the series length, both neighbors, and the bucket "
    "assignment ((t-1)*B div n: equal-count, engine-portable); the "
    "per-bucket argmax shares the same partitioning.",
    tags=("timeseries", "window", "events"),
)
def ts_downsample_ltob(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        "event_id",
        F.expr(tables._MICROS_FROM_NTZ.format(ts="ts")).alias("x"),
        F.floor(F.col("value") * 100).cast("bigint").alias("y"),
    )
    w = Window.partitionBy("event_type").orderBy("x", "event_id")
    w_full = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ordered = pts.select(
        "event_type",
        "event_id",
        "x",
        "y",
        F.row_number().over(w).alias("t"),
        F.count(F.lit(1)).over(w_full).alias("n"),
        F.lag("x").over(w).alias("xp"),
        F.lag("y").over(w).alias("yp"),
        F.lead("x").over(w).alias("xn"),
        F.lead("y").over(w).alias("yn"),
    )
    area = ordered.filter(
        F.col("xp").isNotNull() & F.col("xn").isNotNull()
    ).select(
        "event_type",
        "event_id",
        "x",
        "y",
        F.expr(f"CAST(((t - 1) * {_LTOB_BUCKETS}) div n AS INT)").alias("bucket"),
        F.abs(
            (F.col("xp") - F.col("xn")) * (F.col("y") - F.col("yp"))
            - (F.col("xp") - F.col("x")) * (F.col("yn") - F.col("yp"))
        ).alias("a2"),
    )
    w_pick = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("a2"), "x", "event_id"
    )
    return (
        area.withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "bucket",
            F.col("x").cast("bigint").alias("epoch_us"),
            F.col("y").alias("value_centi"),
            F.col("a2").cast("bigint").alias("area2"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "ts_max_drawdown",
    oracle="""
    WITH seq AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ), dd AS (
      SELECT event_type, ts, event_id, vc,
             max(vc) OVER w AS peak,
             max(vc) OVER w - vc AS drawdown
      FROM seq
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ), best AS (
      SELECT event_type, peak, drawdown, vc AS trough,
             epoch_us(ts) AS at_epoch_us,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY drawdown DESC, ts, event_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM dd
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_points,
           CAST(drawdown AS BIGINT) AS max_drawdown_centi,
           CAST(peak AS BIGINT) AS peak_centi,
           CAST(trough AS BIGINT) AS trough_centi,
           CAST(at_epoch_us AS BIGINT) AS at_epoch_us
    FROM best WHERE rk = 1 ORDER BY event_type
    """,
    doc="Maximum drawdown per series — the risk metric every "
    "monitoring/finance pipeline wants from a value stream: the "
    "largest peak-to-trough fall in (ts, event_id) order. One window "
    "clustering per series: a running max (cumulative frame) gives "
    "the peak-so-far, drawdown = peak - value, and the per-series "
    "argmax row pick (earliest on ties) shares the same "
    "partitioning. All integers on the centi grid; the trough "
    "timestamp rides out as epoch micros via the verified "
    "timestampdiff/epoch_us bridge.",
    tags=("timeseries", "window", "statistics", "events"),
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_full = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dd = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    ).select(
        "event_type",
        "ts",
        "event_id",
        "vc",
        F.max("vc").over(w).alias("peak"),
        (F.max("vc").over(w) - F.col("vc")).alias("drawdown"),
        F.count(F.lit(1)).over(w_full).alias("n"),
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.desc("drawdown"), "ts", "event_id"
    )
    return (
        dd.withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .selectExpr(
            "event_type",
            "CAST(n AS BIGINT) AS n_points",
            "CAST(drawdown AS BIGINT) AS max_drawdown_centi",
            "CAST(peak AS BIGINT) AS peak_centi",
            "CAST(vc AS BIGINT) AS trough_centi",
            tables._MICROS_FROM_NTZ.format(ts="ts") + " AS at_epoch_us",
        )
        .orderBy("event_type")
    )


@register(
    "ts_ewma_forecast",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS vc
      FROM events
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    terms AS (
      SELECT d.event_type,
             d.day + o.off AS tday,
             d.vc * (CAST(1 AS BIGINT) << (15 - o.off)) AS term
      FROM daily d
      CROSS JOIN (SELECT unnest(range(0, 16)) AS off) o
    )
    SELECT t.event_type,
           CAST(t.tday AS BIGINT) AS day,
           CAST(sum(t.term) AS BIGINT) AS ewma_x65536
    FROM terms t
    JOIN (SELECT DISTINCT event_type, day FROM daily) g
      ON g.event_type = t.event_type AND g.day = t.tday
    GROUP BY t.event_type, t.tday
    """,
    doc="Per-key EWMA level / 1-step-ahead forecast in exact fixed "
    "point: the alpha=1/2 recurrence s_t = (x_t + s_{t-1}) / 2 "
    "unrolled to its geometric sum and truncated at 16 terms (weights "
    "below 2^-16 dropped EXACTLY, not rounded), then scaled by 2^16 "
    "so every term x_{t-i} * 2^(15-i) is a BIGINT — no float "
    "reduction anywhere, so Spark and the oracle agree bit-for-bit "
    "(the registry's order-dependent-float rule engineered away "
    "rather than rounded away). Missing days contribute zero, the "
    "convention of gap-skipping EWMA over sparse dailies. "
    "Shape: daily aggregate (ONE keyed shuffle with map-side "
    "combine, raw rows -> n_keys x n_days rows), then the 16-term "
    "convolution as an offset-explode + re-aggregate ON THE DAILY "
    "TABLE — the fan-out multiplies rows that are already ~6 orders "
    "of magnitude smaller than the corpus at 100 TB, never the raw "
    "scan. Emitted days are semi-joined back to observed (key, day) "
    "pairs so the output spine never outruns the data.",
    tags=("timeseries", "window", "events"),
)
def ts_ewma_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_date(cast(ts as date))").cast("bigint").alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("vc")
    )
    terms = daily.withColumn(
        "off", F.explode(F.sequence(F.lit(0), F.lit(15)))
    ).select(
        "event_type",
        (F.col("day") + F.col("off")).alias("tday"),
        F.expr("vc * (cast(1 as bigint) << (15 - off))").alias("term"),
    )
    observed = daily.select("event_type", F.col("day").alias("tday")).distinct()
    return (
        terms.join(observed, ["event_type", "tday"], "inner")
        .groupBy("event_type", "tday")
        .agg(F.sum("term").cast("bigint").alias("ewma_x65536"))
        .select(
            "event_type",
            F.col("tday").cast("bigint").alias("day"),
            "ewma_x65536",
        )
    )


@register(
    "ts_holt_linear",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS vc
      FROM events
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    terms AS (
      SELECT d.event_type,
             d.day + o.k AS tday,
             CASE WHEN o.k <= 10
                  THEN d.vc * (CAST(1 AS BIGINT) << (10 - o.k))
                  ELSE CAST(0 AS BIGINT) END AS t1,
             d.vc * (least(o.k, 20 - o.k) + 1)
                  * (CAST(1 AS BIGINT) << (20 - o.k)) AS t2
      FROM daily d
      CROSS JOIN (SELECT unnest(range(0, 21)) AS k) o
    ),
    sm AS (
      SELECT t.event_type, t.tday,
             sum(t.t1) AS s1, sum(t.t2) AS s2
      FROM terms t
      JOIN (SELECT DISTINCT event_type, day FROM daily) g
        ON g.event_type = t.event_type AND g.day = t.tday
      GROUP BY t.event_type, t.tday
    )
    SELECT event_type,
           CAST(tday AS BIGINT) AS day,
           CAST(s1 AS BIGINT) AS s1_x1024,
           CAST(s2 AS BIGINT) AS s2_x1048576,
           CAST(3 * s1 * 1024 - 2 * s2 AS BIGINT) AS forecast_x1048576
    FROM sm
    """,
    doc="Brown's double exponential smoothing (Holt linear-trend "
    "forecast, alpha=1/2) in exact fixed point — the trend-aware "
    "sibling of ts_ewma_forecast. The second smoothing is the SAME "
    "truncated dyadic kernel applied to the first, so its 21-term "
    "weights have the closed form (min(k, 20-k)+1) * 2^(20-k) — "
    "verified by direct kernel convolution in tests — and every term "
    "is a BIGINT at scale 2^10 (s1) / 2^20 (s2). Brown's recurrences "
    "at alpha=1/2 give level = 2*s1 - s2 and trend = s1 - s2, so the "
    "one-step forecast is 3*s1 - 2*s2, emitted at the common 2^20 "
    "scale — no float reduction anywhere, Spark and DuckDB bit-equal. "
    "Shape matches the EWMA entry: ONE keyed daily aggregate "
    "(map-side combine), then the convolution fans out on the daily "
    "table (~6 orders smaller than the corpus at 100 TB), computing "
    "BOTH smoothings in a single explode + re-aggregate; emitted days "
    "semi-join back to observed (key, day) pairs.",
    tags=("timeseries", "window", "events"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_date(cast(ts as date))").cast("bigint").alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("vc")
    )
    terms = daily.withColumn(
        "k", F.explode(F.sequence(F.lit(0), F.lit(20)))
    ).select(
        "event_type",
        (F.col("day") + F.col("k")).alias("tday"),
        F.expr(
            "CASE WHEN k <= 10 THEN vc * (cast(1 as bigint) << (10 - k))"
            " ELSE cast(0 as bigint) END"
        ).alias("t1"),
        F.expr(
            "vc * (least(k, 20 - k) + 1) * (cast(1 as bigint) << (20 - k))"
        ).alias("t2"),
    )
    observed = daily.select("event_type", F.col("day").alias("tday")).distinct()
    sm = (
        terms.join(observed, ["event_type", "tday"], "inner")
        .groupBy("event_type", "tday")
        .agg(F.sum("t1").alias("s1"), F.sum("t2").alias("s2"))
    )
    return sm.select(
        "event_type",
        F.col("tday").cast("bigint").alias("day"),
        F.col("s1").cast("bigint").alias("s1_x1024"),
        F.col("s2").cast("bigint").alias("s2_x1048576"),
        (F.lit(3) * F.col("s1") * F.lit(1024) - F.lit(2) * F.col("s2"))
        .cast("bigint")
        .alias("forecast_x1048576"),
    )
