"""Analytics surface completion: statistical aggregates, distribution
windows, deterministic list aggregation, conditional scalar suite, and
date/interval arithmetic.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf resolves stringized hints here)
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chess_ratings_spark import tables
from chess_ratings_spark.registry import register


@register(
    "agg_stats",
    oracle="""
    SELECT o_orderpriority,
           round(stddev_samp(o_totalprice), 4) AS sd,
           round(var_samp(o_totalprice), 2) AS var,
           round(corr(o_totalprice, o_custkey), 6) AS price_cust_corr,
           round(covar_samp(o_totalprice, o_custkey), 2) AS cov
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Statistical aggregates (stddev/variance/correlation/covariance)"
    " — co-moment accumulation is reduction-order dependent, hence "
    "rounded on both sides like every other multi-row aggregate.",
    tags=("agg",),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var"),
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("price_cust_corr"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("cov"),
    )


@register(
    "win_percent_cume",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 9) AS pr,
           round(cume_dist() OVER w, 9) AS cd
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution windows percent_rank/cume_dist over a total order "
    "(tie-broken by key so both are deterministic).",
    tags=("window",),
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned exact rewrite of the global distribution
    window. A naive ``Window.orderBy(...)`` with no partition funnels
    EVERY row through one reducer for the total sort — the one plan
    shape that cannot survive a 100x scale-up. Instead:

    1. P-quantile boundaries of the sort value are computed once
       (map-side-combined sketch aggregate; P-1 scalars to the driver)
       and embedded as LITERALS in a monotone bucket expression — the
       partition id is a pure function of the row, NOT of a sampled
       range shuffle, so every branch that recomputes the lineage
       derives identical ids (``repartitionByRange`` +
       ``spark_partition_id`` would re-sample per branch with a
       different seed and could disagree with its own counts branch);
    2. ``row_number`` per bucket ranks each partition independently
       (one hash shuffle, P parallel sorts of ~n/P rows);
    3. per-bucket counts (a P-row aggregate) become cumulative
       offsets via a window over that TINY frame, broadcast back;
    4. global rank = offset + local rank — exact because the
       (o_totalprice, o_orderkey) tie-break makes the order total, so
       percent_rank == (rn-1)/(n-1) and cume_dist == rn/n with no
       plateau corrections, computing the same double division the
       native functions evaluate. Equal-value rows share a bucket
       (boundary compare is on the value alone), so bucket order is
       globally monotone and skewed values cost at worst one hot
       bucket — the same cost any order-preserving partitioner pays."""
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    nparts = max(2, spark.sparkContext.defaultParallelism)
    qs = [i / nparts for i in range(1, nparts)]
    row = o.select(
        F.percentile_approx("o_totalprice", qs, 10_000).alias("b")
    ).first()
    bounds = sorted(set(row["b"] or []))
    pid_expr = F.lit(0)
    for b in bounds:
        pid_expr = pid_expr + (F.col("o_totalprice") > F.lit(b)).cast("int")
    bucketed = o.withColumn("_pid", pid_expr)
    w_local = Window.partitionBy("_pid").orderBy("o_totalprice", "o_orderkey")
    local = bucketed.withColumn("_lrn", F.row_number().over(w_local))
    counts = bucketed.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_all).alias("_n"),
    )
    rn = F.col("_off") + F.col("_lrn")
    return local.join(F.broadcast(offsets), "_pid").select(
        "o_orderkey",
        F.round(
            F.when(F.col("_n") == 1, F.lit(0.0)).otherwise(
                (rn - 1) / (F.col("_n") - 1)
            ),
            9,
        ).alias("pr"),
        F.round(rn / F.col("_n"), 9).alias("cd"),
    )


@register(
    "agg_collect_list",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list(n_name ORDER BY n_name), '|') AS names,
           CAST(len(list(n_name)) AS INT) AS n
    FROM nation GROUP BY n_regionkey
    """,
    doc="List aggregation made deterministic: collect_list carries no "
    "order guarantee (partition arrival order), so sort_array pins it; "
    "emitted string-joined so the oracle compares scalars, not "
    "engine-specific list renderings.",
    tags=("agg",),
)
def agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = tables.load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("names"),
        F.size(F.collect_list("n_name")).cast("int").alias("n"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           least(o_totalprice, 100000.0) AS capped,
           greatest(o_totalprice, 1000.0) AS floored,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'low' END AS band,
           if(o_orderpriority = '1-URGENT', 1, 0) AS is_urgent
    FROM orders
    """,
    doc="Conditional scalar suite: coalesce/nullif/least/greatest/"
    "CASE/if — all codegen'd branches, no shuffle.",
    tags=("scalar",),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.least("o_totalprice", F.lit(100_000.0)).alias("capped"),
        F.greatest("o_totalprice", F.lit(1_000.0)).alias("floored"),
        F.when(F.col("o_totalprice") >= 200_000, "high")
        .when(F.col("o_totalprice") >= 50_000, "mid")
        .otherwise("low")
        .alias("band"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


@register(
    "fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
             AS days_since_epoch_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(dayofweek(o_orderdate) AS INT) AS dow
    FROM orders
    """,
    doc="Date arithmetic: day offsets, day diffs, month-end, "
    "day-of-week. DuckDB dayofweek is 0=Sunday vs Spark dayofweek "
    "1=Sunday — Spark side subtracts 1 to the common convention.",
    tags=("scalar",),
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int").alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
    )


@register(
    "fn_map_ops",
    oracle="""
    WITH per_seg AS (
      SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey,
           CAST(count(*) AS INT) AS n_segments,
           max(CASE WHEN c_mktsegment = 'BUILDING' THEN n END) AS building_cnt,
           CAST(sum(n) AS BIGINT) AS total_customers,
           CAST(count(*) FILTER (WHERE n >= 10) AS INT) AS n_big_segments,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs_csv
    FROM per_seg GROUP BY c_nationkey
    """,
    doc="MapType surface: build map<segment,count> per nation "
    "(map_from_entries over a sorted entry array, so map iteration "
    "order is deterministic), then query it with element_at / "
    "map_filter / map_keys / map_values + aggregate — the oracle "
    "states the equivalent relational facts.",
    tags=("scalar", "map"),
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    per_seg = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = per_seg.groupBy("c_nationkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("c_mktsegment", "n")))
        ).alias("seg_counts")
    )
    return m.select(
        "c_nationkey",
        F.size(F.map_keys("seg_counts")).alias("n_segments"),
        F.element_at("seg_counts", F.lit("BUILDING")).alias("building_cnt"),
        F.aggregate(
            F.map_values("seg_counts"),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("total_customers"),
        F.size(F.map_filter("seg_counts", lambda k, v: v >= 10)).alias(
            "n_big_segments"
        ),
        F.concat_ws(",", F.map_keys("seg_counts")).alias("segs_csv"),
    )


@register(
    "fn_struct_array",
    oracle="""
    WITH h AS (
      SELECT o_custkey,
             list(o_totalprice ORDER BY o_orderdate, o_orderkey) AS prices,
             min(o_orderdate) AS first_dt,
             max(o_orderdate) AS last_dt,
             CAST(count(*) AS INT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, n_orders,
           strftime(first_dt, '%Y-%m-%d %H:%M:%S') AS first_date,
           strftime(last_dt, '%Y-%m-%d %H:%M:%S') AS last_date,
           round(list_sum(prices), 2) AS total_spend,
           CAST(len(list_filter(prices, x -> x > 150000)) AS INT) AS n_big
    FROM h
    """,
    doc="Array-of-struct surface: per-customer order history as a "
    "sorted array<struct> (array_sort over collect_list gives a "
    "deterministic fold order, which is what makes the double sum "
    "oracle-checkable), queried with element_at(±1) field access, "
    "transform+aggregate, and filter on struct fields.",
    tags=("scalar", "struct"),
)
def fn_struct_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    hist = o.groupBy("o_custkey").agg(
        F.array_sort(
            F.collect_list(F.struct("o_orderdate", "o_orderkey", "o_totalprice"))
        ).alias("hist")
    )
    ts_fmt = "yyyy-MM-dd HH:mm:ss"
    return hist.select(
        "o_custkey",
        F.size("hist").alias("n_orders"),
        F.date_format(F.element_at("hist", 1)["o_orderdate"], ts_fmt).alias(
            "first_date"
        ),
        F.date_format(F.element_at("hist", -1)["o_orderdate"], ts_fmt).alias(
            "last_date"
        ),
        F.round(
            F.aggregate(
                F.transform("hist", lambda x: x["o_totalprice"]),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            2,
        ).alias("total_spend"),
        F.size(
            F.filter("hist", lambda x: x["o_totalprice"] > 150000)
        ).alias("n_big"),
    )


@register(
    "agg_mode",
    oracle="""
    SELECT l_returnflag, mode_qty, cnt FROM (
      SELECT l_returnflag, l_quantity AS mode_qty,
             CAST(count(*) AS BIGINT) AS cnt,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY count(*) DESC, l_quantity) AS rn
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ) WHERE rn = 1 ORDER BY l_returnflag
    """,
    doc="Deterministic mode per group: value-count + row_number with an "
    "explicit (count DESC, value) tie-break — the native mode() "
    "aggregate in both engines leaves ties unspecified, so the "
    "deterministic formulation IS the operator. Two shuffles on "
    "narrowing keys; the window partition is the tiny flag domain.",
    tags=("agg",),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = tables.load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", F.col("l_quantity").alias("mode_qty")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("cnt").desc(), "mode_qty")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", "mode_qty", "cnt")
        .orderBy("l_returnflag")
    )


@register(
    "agg_corr_cov",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(stddev_samp(l_discount), 6) AS std_discount,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Second-moment statistics per group: Pearson correlation, "
    "sample covariance, stddev, regression slope — single grouped "
    "pass, partial co-moments merged associatively (the 100 TB "
    "map-side-combine shape). Co-moment reduction order differs "
    "across engines by ~1e-12 relative, so results are rounded "
    "to a scale that absorbs it.",
    tags=("agg",),
)
def agg_corr_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_discount"), 6).alias("std_discount"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
                "slope_price_qty"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_hll_merge",
    oracle="""
    SELECT event_type AS scope,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS within_bound
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS scope,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS within_bound
    FROM events
    """,
    doc="Two-phase distinct-count sketching: an HLL sketch per "
    "event_type (hll_sketch_agg), then a global hll_union_agg merge — "
    "the mergeable-sketch pattern that replaces exact countDistinct "
    "at 100 TB (partials combine map-side; the merge moves bytes, "
    "not rows). The estimate is engine-specific (Spark's DataSketches "
    "HLL vs DuckDB's), so it is not a result column; the plan instead "
    "emits within_bound = |estimate-exact|/exact ≤ 5% per scope AND "
    "for the global merge, which the oracle pins to true — a sketch "
    "or merge that drifts hash-mismatches.",
    tags=("agg", "events"),
)
def agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    per = per_type.select(
        F.col("event_type").alias("scope"),
        F.hll_sketch_estimate("sk").alias("estimate"),
        "exact_users",
    )
    glob = (
        per_type.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(ev.agg(F.countDistinct("user_id").alias("exact_users")))
        .select(
            F.lit("ALL").alias("scope"),
            F.hll_sketch_estimate("sk").alias("estimate"),
            "exact_users",
        )
    )
    both = per.unionByName(glob)
    err = F.abs(F.col("estimate") - F.col("exact_users")) / F.col("exact_users")
    return both.select(
        "scope", "exact_users", (err <= 0.05).alias("within_bound")
    ).orderBy("scope")


@register(
    "fn_bitwise_ops",
    oracle="""
    SELECT event_id,
           event_id & 255 AS masked,
           (event_id & 255) << 3 AS shifted,
           xor(event_id & 255, 170) AS xored,
           CAST(bit_count(event_id & 255) AS INT) AS popcount
    FROM events WHERE event_id % 17 = 0 ORDER BY event_id
    """,
    doc="Bitwise expression suite: AND-mask, left shift, XOR, "
    "population count — pure codegen'd integer expressions (the mask "
    "keeps shifts overflow-free so 64-bit semantics agree across "
    "engines).",
    tags=("fn", "events"),
)
def fn_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    masked = F.col("event_id").bitwiseAND(F.lit(255))
    return (
        ev.filter(F.col("event_id") % 17 == 0)
        .select(
            "event_id",
            masked.alias("masked"),
            F.shiftleft(masked, 3).cast("long").alias("shifted"),
            masked.bitwiseXOR(F.lit(170)).alias("xored"),
            F.bit_count(masked).cast("int").alias("popcount"),
        )
        .orderBy("event_id")
    )


@register(
    "anomaly_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type, round(avg(value), 6) AS mu,
             round(stddev_samp(value), 6) AS sd
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type, value, round((value - mu) / sd, 4) AS z
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE abs((value - mu) / sd) > 3
    ORDER BY event_id
    """,
    doc="Z-score anomaly gate: per-type mean/stddev (rounded to 6dp on "
    "both sides so the threshold cut is reduction-order-proof), then "
    "a broadcast stats join flags |z|>3 rows — one aggregate pass + "
    "one map-side join, the streaming-friendly outlier shape.",
    tags=("analytics", "events"),
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs((F.col("value") - F.col("mu")) / F.col("sd")) > 3)
        .select("event_id", "event_type", "value", z.alias("z"))
        .orderBy("event_id")
    )


@register(
    "win_time_rolling",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS cnt_1h,
           round(sum(value) OVER w, 2) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
                 RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    doc="Rolling one-hour window per user over event time: RANGE frame "
    "on the epoch-nanos column (integer offsets — RANGE over "
    "timestamps with sub-day intervals is the classic cross-engine "
    "trap, and PySpark's rangeBetween rejects non-integer offsets). "
    "Peers at equal ts are included by RANGE semantics in both "
    "engines, so ties are deterministic without a row tie-break.",
    tags=("window", "events"),
)
def win_time_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    frame = (
        "OVER (PARTITION BY user_id ORDER BY ts_ns "
        "RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)"
    )
    return ev.selectExpr(
        "event_id",
        "user_id",
        f"CAST(count(*) {frame} AS BIGINT) AS cnt_1h",
        f"round(sum(value) {frame}, 2) AS sum_1h",
    ).orderBy("event_id")


@register(
    "agg_histogram",
    oracle="""
    SELECT l_returnflag, CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT l_returnflag,
             CASE WHEN l_extendedprice < 0.0 THEN 0
                  WHEN l_extendedprice >= 120000.0 THEN 13
                  ELSE CAST(floor(l_extendedprice / 10000.0) AS INT) + 1 END
               AS bucket
      FROM lineitem
    ) GROUP BY l_returnflag, bucket ORDER BY l_returnflag, bucket
    """,
    doc="Fixed-bin histogram per group: 12 equal bins on [0, 120000), "
    "underflow 0 / overflow 13, with the bucket arithmetic written "
    "explicitly (floor of scaled value) so both engines compute "
    "bit-identical bin edges (DuckDB has no width_bucket) — one "
    "grouped count, the distribution-profile shape that runs "
    "map-side-combined at any scale.",
    tags=("agg",),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            F.when(F.col("l_extendedprice") < 0.0, 0)
            .when(F.col("l_extendedprice") >= 120000.0, 13)
            .otherwise(F.floor(F.col("l_extendedprice") / 10000.0).cast("int") + 1)
            .cast("int")
            .alias("bucket"),
        )
        .groupBy("l_returnflag", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag", "bucket")
    )


@register(
    "udf_grouped_trend",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, epoch_ns(ts) / 86400000000000.0), 6)
             AS slope_per_day,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE user_id % 5 = 0 GROUP BY user_id
    HAVING count(*) >= 3 ORDER BY user_id
    """,
    doc="Grouped-map UDF showcase (applyInPandas, the batch twin of the "
    "streaming state path): per-user value-vs-time OLS slope computed "
    "with the closed-form co-moment formula in numpy, checked against "
    "DuckDB's regr_slope to 6dp. Exists to verify the Arrow "
    "grouped-map path against SQL-verifiable semantics — the "
    "equivalent column expression (regr_slope) is the production "
    "route; Python earns its place only when the per-group logic "
    "outgrows SQL (this is the harness that proves the boundary is "
    "sound when it does).",
    tags=("udf", "events"),
)
def udf_grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a deterministic 1-in-5 user subset: applyInPandas invokes Python
    # once per GROUP, so group count — not row count — is the cost
    # driver (measured ~5 s for ~4k groups at sf0.1); the showcase
    # needs the Arrow path exercised, not every user
    ev = (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("user_id") % 5 == 0)
        .select("user_id", "ts_ns", "value")
    )

    def trend(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        x = pdf["ts_ns"].to_numpy(dtype=np.float64) / 86_400_000_000_000.0
        y = pdf["value"].to_numpy(dtype=np.float64)
        mx, my = x.mean(), y.mean()
        denom = ((x - mx) ** 2).sum()
        slope = float(((x - mx) * (y - my)).sum() / denom) if denom > 0 else float("nan")
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "slope_per_day": [round(slope, 6)], "n": [n]}
        )

    out = ev.groupBy("user_id").applyInPandas(
        trend, schema="user_id bigint, slope_per_day double, n bigint"
    )
    return out.filter(F.col("n") >= 3).orderBy("user_id")


@register(
    "udf_vector_norm",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings ORDER BY vec_id
    """,
    doc="Vectorized scalar UDF showcase (pandas_udf over Arrow "
    "batches): embedding L2 norms via one numpy matvec per batch, "
    "rounded to 6dp because numpy's pairwise summation and the SQL "
    "left fold differ in reduction order (the in-expr F.aggregate "
    "route is bit-exact and is what the similarity operators use — "
    "this query exists to pin the Arrow scalar path against an "
    "oracle).",
    tags=("udf", "embeddings"),
)
def udf_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2(emb: pd.Series) -> pd.Series:
        import numpy as np

        m = np.vstack(emb.to_numpy()).astype(np.float64)
        return pd.Series(np.round(np.sqrt((m * m).sum(axis=1)), 6))

    e = tables.load(spark, sf_dir, "embeddings")
    return e.select("vec_id", l2("embedding").alias("l2_norm")).orderBy("vec_id")


@register(
    "agg_countmin_heavyhitters",
    oracle="""
    WITH js AS (SELECT unnest(range(0, 4)) AS j),
    pairs AS (
      SELECT j,
             ('0x' || substr(md5('cm' || CAST(j AS VARCHAR) || ':'
                 || CAST(e.user_id AS VARCHAR)), 1, 8))::UBIGINT % 1024
               AS bucket
      FROM events e, js
    ), sketch AS (
      SELECT j, bucket, count(*) AS c FROM pairs GROUP BY j, bucket
    ), keys AS (
      SELECT user_id, count(*) AS true_count FROM events GROUP BY user_id
    ), cand AS (
      SELECT k.user_id, k.true_count, j,
             ('0x' || substr(md5('cm' || CAST(j AS VARCHAR) || ':'
                 || CAST(k.user_id AS VARCHAR)), 1, 8))::UBIGINT % 1024
               AS bucket
      FROM keys k, js
    ), est AS (
      SELECT c2.user_id, any_value(c2.true_count) AS true_count,
             min(s.c) AS est
      FROM cand c2 JOIN sketch s USING (j, bucket)
      GROUP BY c2.user_id
    )
    SELECT user_id, CAST(est AS BIGINT) AS est_count,
           CAST(true_count AS BIGINT) AS true_count,
           est >= true_count AS overestimate_ok,
           CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (ORDER BY est DESC, user_id) AS rnk
          FROM est)
    WHERE rnk <= 10 ORDER BY rnk
    """,
    doc="Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005): "
    "a d=4 x w=1024 counter matrix built as ONE grouped aggregation "
    "(event x hash-row explode -> groupBy (row, bucket)), so the "
    "sketch is mergeable across partitions/days by cell-wise integer "
    "add — the always-on frequency monitor that costs O(d*w) memory "
    "per shard regardless of key cardinality, where exact per-key "
    "counts at 10^9 keys would not fit. Point estimate = min over the "
    "d salted-md5 bucket counters; the CM guarantee est >= true is "
    "asserted per reported key (overestimate_ok), and the top-10 by "
    "estimate is checked against exact counts the oracle recomputes "
    "with the identical hash math. The candidate probe here is the "
    "exact key set (fixture-scale falsifiability); at 100 TB "
    "candidates come from per-partition top-k pre-aggregation, and "
    "the sketch answers point queries without rescanning history. "
    "All-integer, layout-independent, bit-equal md5 on both engines.",
    tags=("agg", "sketch", "events"),
)
def agg_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    D, W = 4, 1024
    ev = tables.load(spark, sf_dir, "events")
    js = F.explode(F.array(*[F.lit(i) for i in range(D)])).alias("j")

    def bucket(uid_col: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cm"),
                            F.col("j").cast("string"),
                            F.lit(":"),
                            F.col(uid_col).cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % W
        )

    pairs = ev.select("user_id", js).withColumn("bucket", bucket("user_id"))
    sketch = pairs.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))
    keys = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    cand = keys.select("user_id", "true_count", js).withColumn(
        "bucket", bucket("user_id")
    )
    est = (
        cand.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id")
        .agg(
            F.any_value("true_count").alias("true_count"),
            F.min("c").alias("est"),
        )
    )
    wr = Window.orderBy(F.col("est").desc(), "user_id")
    return (
        est.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 10)
        .select(
            "user_id",
            F.col("est").cast("bigint").alias("est_count"),
            F.col("true_count").cast("bigint").alias("true_count"),
            (F.col("est") >= F.col("true_count")).alias("overestimate_ok"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("rnk")
    )


@register(
    "fn_try_arith",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ), r AS (
      SELECT CASE WHEN user_id % 5 = 0 THEN NULL
                  ELSE vc / (user_id % 5) END AS safe_div,
             CASE WHEN event_id % 2 = 1 THEN NULL
                  ELSE 9223372036854775807 END AS safe_add,
             TRY_CAST(CASE WHEN event_id % 3 = 0
                           THEN CAST(event_id AS VARCHAR)
                           ELSE event_type END AS BIGINT) AS safe_cast
      FROM t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE safe_div IS NULL) AS BIGINT)
             AS n_div_null,
           CAST(count(*) FILTER (WHERE safe_add IS NULL) AS BIGINT)
             AS n_overflow_null,
           CAST(count(*) FILTER (WHERE safe_cast IS NULL) AS BIGINT)
             AS n_cast_null,
           CAST(sum(safe_cast) AS BIGINT) AS cast_sum,
           CAST(sum(CAST(floor(safe_div * 100) AS BIGINT)) AS BIGINT)
             AS div_centi_sum
    FROM r
    """,
    doc="ANSI-mode error-safe arithmetic surface: try_divide (NULL on "
    "/0 instead of a job-killing SparkArithmeticException), try_add "
    "(NULL on BIGINT overflow instead of wraparound or abort), "
    "try_cast (NULL on malformed input) — the functions that make a "
    "100 TB job survive the one poisoned row in partition 9 317 "
    "without losing ANSI's correctness guarantees everywhere else. "
    "The oracle replays the SEMANTICS (CASE-guarded division, "
    "overflow predicate, TRY_CAST) rather than the function names, "
    "so the null census and the fixed-point sum over the surviving "
    "divisions pin the behavior exactly. All-NULL-safe aggregates.",
    tags=("fn", "events"),
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    t = ev.select(
        "event_id", "user_id", "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    r = t.select(
        F.try_divide("vc", F.col("user_id") % 5).alias("safe_div"),
        F.try_add(
            F.lit(9223372036854775807).cast("bigint"),
            F.col("event_id") % 2,
        ).alias("safe_add"),
        F.when(
            F.col("event_id") % 3 == 0, F.col("event_id").cast("string")
        )
        .otherwise(F.col("event_type"))
        .try_cast("bigint")
        .alias("safe_cast"),
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("safe_div").isNull(), 1)).alias("n_div_null"),
        F.count(F.when(F.col("safe_add").isNull(), 1)).alias(
            "n_overflow_null"
        ),
        F.count(F.when(F.col("safe_cast").isNull(), 1)).alias("n_cast_null"),
        F.sum("safe_cast").cast("bigint").alias("cast_sum"),
        F.sum(F.floor(F.col("safe_div") * 100).cast("bigint"))
        .cast("bigint")
        .alias("div_centi_sum"),
    )


@register(
    "agg_distribution_shape",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100) AS HUGEINT) AS vc
      FROM lineitem
    ), g AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) AS DOUBLE) AS nd,
             CAST(sum(vc) AS DOUBLE) AS d1,
             CAST(sum(vc * vc) AS DOUBLE) AS d2,
             CAST(sum(vc * vc * vc) AS DOUBLE) AS d3,
             CAST(sum((vc * vc) * (vc * vc)) AS DOUBLE) AS d4
      FROM t GROUP BY l_returnflag
    ), r AS (
      SELECT l_returnflag, n,
             d1 / nd AS mu, d2 / nd AS r2, d3 / nd AS r3, d4 / nd AS r4
      FROM g
    ), m AS (
      SELECT l_returnflag, n,
             r2 - mu * mu AS m2,
             r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
             r4 - 4 * mu * r3 + 6 * mu * mu * r2
                - 3 * mu * mu * mu * mu AS m4
      FROM r
    )
    SELECT l_returnflag, n,
           CAST(floor(m3 / (m2 * sqrt(m2)) * 1e6) AS BIGINT) AS skew_g1_e6,
           CAST(floor((m4 / (m2 * m2) - 3) * 1e6) AS BIGINT) AS kurt_g2_e6
    FROM m ORDER BY l_returnflag
    """,
    doc="Distribution-shape aggregates (3rd/4th standardized moments) "
    "— the drift monitors that catch a data-quality change mean/"
    "stddev miss (a price column going bimodal or heavy-tailed keeps "
    "its mean). Emitted on the repo's integer-grid discipline instead "
    "of round(float, 6) (the round-7 verdict's last float-parity "
    "nit): prices land on an exact centi grid, the four power sums "
    "\u03a3vc..\u03a3vc\u2074 accumulate EXACTLY (decimal(38,0) in Spark, "
    "HUGEINT in DuckDB \u2014 layout-independent by construction, no "
    "float reduction anywhere), and both engines then evaluate the "
    "TEXTUALLY IDENTICAL g1 = m3/m2^1.5, g2 = m4/m2\u00b2-3 expression "
    "over those exact sums using only IEEE-deterministic ops (+,-,*,"
    "/,sqrt are correctly rounded; no pow, no libm transcendentals), "
    "flooring to an e6 BIGINT grid. tests/test_grid_agreement.py "
    "certifies the fixture domains sit far from every floor "
    "boundary. Still one partial+final HashAggregate pass, mergeable "
    "across partitions like any co-moment.",
    tags=("agg", "lineitem"),
)
def agg_distribution_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    t = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100)
        .cast("decimal(38,0)")
        .alias("vc"),
    )
    g = t.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s1"),
        F.sum(F.col("vc") * F.col("vc")).alias("s2"),
        F.sum(F.col("vc") * F.col("vc") * F.col("vc")).alias("s3"),
        F.sum(
            (F.col("vc") * F.col("vc")) * (F.col("vc") * F.col("vc"))
        ).alias("s4"),
    )
    return (
        g.selectExpr(
            "l_returnflag",
            "n",
            "CAST(n AS DOUBLE) AS nd",
            "CAST(s1 AS DOUBLE) AS d1",
            "CAST(s2 AS DOUBLE) AS d2",
            "CAST(s3 AS DOUBLE) AS d3",
            "CAST(s4 AS DOUBLE) AS d4",
        )
        .selectExpr(
            "l_returnflag", "n",
            "d1 / nd AS mu", "d2 / nd AS r2", "d3 / nd AS r3", "d4 / nd AS r4",
        )
        .selectExpr(
            "l_returnflag", "n",
            "r2 - mu * mu AS m2",
            "r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3",
            "r4 - 4 * mu * r3 + 6 * mu * mu * r2"
            " - 3 * mu * mu * mu * mu AS m4",
        )
        .selectExpr(
            "l_returnflag", "n",
            "CAST(floor(m3 / (m2 * sqrt(m2)) * 1e6) AS BIGINT)"
            " AS skew_g1_e6",
            "CAST(floor((m4 / (m2 * m2) - 3) * 1e6) AS BIGINT)"
            " AS kurt_g2_e6",
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_hll_setops",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click'),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS exact_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS exact_b,
           CAST((SELECT count(*) FROM
                 (SELECT * FROM a UNION SELECT * FROM b)) AS BIGINT)
             AS exact_union,
           CAST((SELECT count(*) FROM
                 (SELECT * FROM a INTERSECT SELECT * FROM b)) AS BIGINT)
             AS exact_inter,
           true AS union_within_bound,
           true AS inter_within_bound
    """,
    doc="Sketch set algebra on HLL: distinct clickers (A) and "
    "purchasers (B) sketched in ONE aggregation pass "
    "(hll_sketch_agg over CASE-filtered keys — no second scan), "
    "|A\\u222aB| from the lossless sketch union (hll_union), and "
    "|A\\u2229B| by inclusion-exclusion est_a + est_b - est_union — the "
    "only intersection HLL admits, with additive error ~3\\u03b5|A\\u222aB| "
    "instead of relative error (the documented DataSketches "
    "caveat). This is the audience-overlap query every 100 TB event "
    "store answers from pre-aggregated per-segment sketches: "
    "partials merge map-side, the final union moves kilobytes, and "
    "no row-level intersection join ever runs. Estimates are "
    "engine-specific so the emitted columns are the EXACT counts "
    "(recomputed in-plan next to the sketches) plus bound "
    "certificates: union estimate within 5% relative, intersection "
    "within 10% of the union size (the additive-error yardstick). "
    "The oracle recomputes the exact set algebra and pins both "
    "bounds true.",
    tags=("agg", "sketch", "events"),
)
def agg_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    in_a = F.when(F.col("event_type") == "click", F.col("user_id"))
    in_b = F.when(F.col("event_type") == "purchase", F.col("user_id"))
    in_ab = F.when(
        F.col("event_type").isin("click", "purchase"), F.col("user_id")
    )
    g = ev.agg(
        F.hll_sketch_agg(in_a).alias("ska"),
        F.hll_sketch_agg(in_b).alias("skb"),
        F.countDistinct(in_a).alias("exact_a"),
        F.countDistinct(in_b).alias("exact_b"),
        F.countDistinct(in_ab).alias("exact_union"),
    )
    est = g.select(
        "exact_a",
        "exact_b",
        "exact_union",
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union")).alias(
            "exact_inter"
        ),
        F.hll_sketch_estimate("ska").alias("est_a"),
        F.hll_sketch_estimate("skb").alias("est_b"),
        F.hll_sketch_estimate(F.hll_union("ska", "skb")).alias("est_union"),
    )
    return est.select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_inter",
        (
            F.abs(F.col("est_union") - F.col("exact_union"))
            / F.col("exact_union")
            <= 0.05
        ).alias("union_within_bound"),
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_union"))
                - F.col("exact_inter")
            )
            / F.col("exact_union")
            <= 0.10
        ).alias("inter_within_bound"),
    )


@register(
    "udf_arrow_scalar",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)
                    + 7 * (length(text)
                           - length(replace(text, 'e', '')))) AS BIGINT)
             AS score_sum
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="Arrow-optimized Python UDF (Spark 4, SPARK-40307: "
    "udf(useArrow=True)) — the fourth and newest Python-function "
    "flavor after pandas scalar (udf_vector_norm), pandas grouped-agg "
    "(udf_grouped_trend), and UDTF (udtf_doc_chunks): per-row Python "
    "semantics with Arrow-batch transfer instead of pickle, ~2x the "
    "old row-serializer throughput while keeping the plain-function "
    "programming model. The function is exact integer math "
    "(chars + 7x'e'-count) so the oracle replays it with no float "
    "grid; the aggregate keeps output bounded. The engine's hot paths "
    "still avoid per-row Python entirely — this query pins the API "
    "surface, not a recommended pattern.",
    tags=("udf", "documents", "spark4"),
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("bigint", useArrow=True)
    def score(text: str) -> int:
        return len(text) + 7 * text.count("e")

    d = tables.load(spark, sf_dir, "documents")
    return (
        d.select("lang", score("text").alias("s"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("s").alias("score_sum"))
        .orderBy("lang")
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_merged
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Bitmap aggregates (Spark 3.5, SPARK-44094: "
    "bitmap_bucket_number / bitmap_bit_position / "
    "bitmap_construct_agg / bitmap_or_agg / bitmap_count) — EXACT "
    "mergeable distinct counting, the precise counterpart to "
    "agg_approx_distinct's HLL: per (group, 32k-bucket) fixed-size "
    "bitmaps OR-merge losslessly, so exact distinct counts compose "
    "across partitions, shards, and incremental batches the way only "
    "approximate sketches otherwise do (count(DISTINCT) itself is "
    "NOT mergeable — you cannot add two distinct counts). Proven "
    "in-query: n_users computes the direct bitmap path, "
    "n_users_merged rebuilds per-(user_id%4)-shard partial bitmaps "
    "and OR-merges them — both must equal the plain COUNT DISTINCT "
    "the oracle states. At 100 TB this is the daily-active-users "
    "rollup pattern: store per-day bitmaps, OR them for any date "
    "range, count exactly — no rescan.",
    tags=("agg", "events", "sketch"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.load(spark, sf_dir, "events").createOrReplaceTempView(
        "crs_bm_events"
    )
    return spark.sql(
        """
        WITH direct AS (
          SELECT event_type, bitmap_bucket_number(user_id) AS bkt,
                 bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          FROM crs_bm_events
          GROUP BY event_type, bitmap_bucket_number(user_id)
        ), d AS (
          SELECT event_type, CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_users
          FROM direct GROUP BY event_type
        ), part AS (
          SELECT event_type, user_id % 4 AS shard,
                 bitmap_bucket_number(user_id) AS bkt,
                 bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          FROM crs_bm_events
          GROUP BY event_type, user_id % 4, bitmap_bucket_number(user_id)
        ), merged AS (
          SELECT event_type, bkt, bitmap_or_agg(bm) AS bm
          FROM part GROUP BY event_type, bkt
        ), m AS (
          SELECT event_type,
                 CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_users_merged
          FROM merged GROUP BY event_type
        )
        SELECT d.event_type, d.n_users, m.n_users_merged
        FROM d JOIN m USING (event_type)
        ORDER BY event_type
        """
    )


@register(
    "agg_entropy_gini",
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(count(*) AS HUGEINT) AS c
      FROM documents GROUP BY source, lang
    ), t AS (
      SELECT source, lang, c,
             CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1e6)
                  AS BIGINT) AS clnc_e6
      FROM c
    ), g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_langs,
             CAST(sum(c) AS HUGEINT) AS n,
             CAST(sum(c * c) AS HUGEINT) AS sum_c2,
             CAST(sum(clnc_e6) AS BIGINT) AS sum_clnc_e6
      FROM t GROUP BY source
    )
    SELECT source, n_langs, CAST(n AS BIGINT) AS n,
           CAST(((n * n - sum_c2) * 1000000) // (n * n) AS BIGINT)
             AS gini_e6,
           CAST(floor((ln(CAST(n AS DOUBLE))
                       - (CAST(sum_clnc_e6 AS DOUBLE) / 1e6)
                         / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
             AS entropy_e6
    FROM g ORDER BY source
    """,
    doc="Categorical distribution-balance aggregates per corpus source: "
    "Gini impurity 1 - Σp² and Shannon entropy of the language mix "
    "— the label-balance monitors a training-data pipeline runs "
    "before mixing sources (a source whose language entropy collapses "
    "is a scraper regression mean/count monitors miss). Gini is EXACT "
    "integer arithmetic end-to-end: (n² - Σc²)·10⁶ "
    "floor-divided by n² on decimal(38,0)/HUGEINT (both engines' "
    "integral division truncates toward zero = floor for the "
    "non-negative domain), overflow-safe past 10¹⁹ rows per group. "
    "Entropy needs ln (transcendental), so it follows the repo's "
    "floor-grid discipline (DESIGN.md 'Oracle-parity rules'): each "
    "c·ln(c) term is floored to an e6 BIGINT grid PER GROUP ROW "
    "(exact, layout-independent integer sum across the lang "
    "dimension), then H = ln(n) - Σterm/n is evaluated as the "
    "textually identical IEEE expression in both engines and floored "
    "to e6. tests/test_grid_agreement.py covers the c·ln(c) domain. "
    "One partial+final HashAggregate pair per level; mergeable across "
    "partitions (counts then moments), no holistic state.",
    tags=("agg", "documents", "quality"),
)
def agg_entropy_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    t = c.withColumn(
        "clnc_e6",
        F.floor(
            F.col("c").cast("double")
            * F.log(F.col("c").cast("double"))
            * F.lit(1e6)
        ).cast("bigint"),
    )
    g = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        F.sum("clnc_e6").cast("bigint").alias("sum_clnc_e6"),
    )
    return (
        g.selectExpr(
            "source",
            "n_langs",
            "CAST(n AS BIGINT) AS n",
            "CAST((n * n - sum_c2) * 1000000 div (n * n) AS BIGINT)"
            " AS gini_e6",
            "CAST(floor((ln(CAST(n AS DOUBLE))"
            " - (CAST(sum_clnc_e6 AS DOUBLE) / 1e6)"
            " / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS entropy_e6",
        )
        .orderBy("source")
    )


@register(
    "win_median_rolling",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, ts,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ), w AS (
      SELECT event_id, user_id, vc,
             list_sort(list(vc) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS frame
      FROM t
    )
    SELECT event_id, user_id, vc,
           CAST(len(frame) AS INT) AS n_frame,
           frame[CAST((len(frame) + 1) // 2 AS INT)]
             + frame[CAST((len(frame) + 2) // 2 AS INT)] AS med2_centi
    FROM w ORDER BY event_id
    """,
    doc="Exact rolling median over a 7-row trailing frame per user — "
    "the robust-location window mean-based rolling stats can't give "
    "(one outlier tick drags a rolling mean for 7 rows; the median "
    "shrugs it off). Spark has no holistic window aggregate, so the "
    "bounded frame is materialized explicitly: collect_list over "
    "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW (≤7 elements — state "
    "is O(frame), NOT O(partition)), array_sort, then lower+upper "
    "middle summed on the centi grid (med2 = 2·median stays integral "
    "for even frames — no float division anywhere). DuckDB replays "
    "with its native list() window aggregate and 1-based extracts. "
    "Ties are harmless (sorted duplicates), and the (ts, event_id) "
    "order key makes the frame itself deterministic. One window "
    "shuffle on user_id; at 100 TB this is the same single exchange "
    "any per-entity rolling stat costs, and the frame bound keeps "
    "per-row state constant — it never degrades into the "
    "collect-the-whole-partition antipattern.",
    tags=("window", "events"),
)
def win_median_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables.load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    framed = e.withColumn("frame", F.array_sort(F.collect_list("vc").over(w)))
    return (
        framed.selectExpr(
            "event_id",
            "user_id",
            "vc",
            "CAST(size(frame) AS INT) AS n_frame",
            "element_at(frame, CAST((size(frame) + 1) div 2 AS INT))"
            " + element_at(frame, CAST((size(frame) + 2) div 2 AS INT))"
            " AS med2_centi",
        )
        .orderBy("event_id")
    )


@register(
    "ml_normal_equations",
    oracle="""
    WITH t AS (
      SELECT CAST(l_quantity AS HUGEINT) AS x1,
             CAST(floor(l_discount * 100) AS HUGEINT) AS x2,
             CAST(floor(l_extendedprice) AS HUGEINT) AS y
      FROM lineitem
    ), s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
             sum(x2 * x2) AS s22,
             sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
             sum(y * y) AS syy
      FROM t
    ), d AS (
      SELECT n, sy, s1y, s2y, syy,
        n  * (s11 * s22 - s12 * s12)
          - s1 * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s12 - s11 * s2) AS det,
        sy * (s11 * s22 - s12 * s12)
          - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y) AS det0,
        n  * (s1y * s22 - s12 * s2y)
          - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2) AS det1,
        n  * (s11 * s2y - s1y * s12)
          - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2) AS det2
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST((det0 * 1000000) // det AS BIGINT) AS beta0_e6,
           CAST((det1 * 1000000) // det AS BIGINT) AS beta1_e6,
           CAST((det2 * 1000000) // det AS BIGINT) AS beta2_e6,
           CAST(floor((1.0 - (CAST(syy AS DOUBLE)
                   - (CAST(det0 AS DOUBLE) * CAST(sy AS DOUBLE)
                      + CAST(det1 AS DOUBLE) * CAST(s1y AS DOUBLE)
                      + CAST(det2 AS DOUBLE) * CAST(s2y AS DOUBLE))
                     / CAST(det AS DOUBLE))
                  / (CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                       / CAST(n AS DOUBLE))) * 1e6) AS BIGINT) AS r2_e6
    FROM d
    """,
    doc="Exact closed-form multiple linear regression (2 features + "
    "intercept) by the normal equations: price ~ quantity + discount "
    "over lineitem. The distributed part is ONE partial+final "
    "aggregate computing the 10 Gram sums (n, Σx, Σxx', Σxy, Σy²) — "
    "the textbook 'sufficient statistics' reduction, mergeable across "
    "any sharding, which is why this pattern (not gradient descent) "
    "is the 100 TB answer when d is small: one pass, one shuffle of "
    "10 numbers per partition. The 3x3 solve itself happens IN-PLAN "
    "on the 1-row aggregate via Cramer determinants evaluated in "
    "EXACT integer arithmetic (decimal(38,0) / HUGEINT; features on "
    "integer grids keep every minor exact, magnitudes ≲1e33 at sf0.1 "
    "— 38-digit headroom; at petabyte row counts the same sums feed "
    "the float path instead). β coefficients land on an e6 grid by "
    "exact integer truncating division (Spark div ≡ DuckDB // — both "
    "truncate toward zero including the negative discount "
    "coefficient, the bridge verified in DESIGN.md). R² is the one "
    "float output: evaluated from the SAME exact integers by a "
    "textually identical +,-,*,/ expression (IEEE-deterministic, no "
    "libm), e6-floored. ml_linear_trend_exact is the d=1 special "
    "case; ml_gd_classifier covers the iterative regime.",
    tags=("ml", "lineitem"),
)
def ml_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    t = li.selectExpr(
        "CAST(l_quantity AS DECIMAL(38,0)) AS x1",
        "CAST(floor(l_discount * 100) AS DECIMAL(38,0)) AS x2",
        "CAST(floor(l_extendedprice) AS DECIMAL(38,0)) AS y",
    )
    s = t.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.expr("x1 * x1")).alias("s11"),
        F.sum(F.expr("x1 * x2")).alias("s12"),
        F.sum(F.expr("x2 * x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x1 * y")).alias("s1y"),
        F.sum(F.expr("x2 * y")).alias("s2y"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    d = s.selectExpr(
        "n", "sy", "s1y", "s2y", "syy",
        "n  * (s11 * s22 - s12 * s12)"
        " - s1 * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s12 - s11 * s2) AS det",
        "sy * (s11 * s22 - s12 * s12)"
        " - s1 * (s1y * s22 - s12 * s2y)"
        " + s2 * (s1y * s12 - s11 * s2y) AS det0",
        "n  * (s1y * s22 - s12 * s2y)"
        " - sy * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s2y - s1y * s2) AS det1",
        "n  * (s11 * s2y - s1y * s12)"
        " - s1 * (s1 * s2y - s1y * s2)"
        " + sy * (s1 * s12 - s11 * s2) AS det2",
    )
    return d.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST((det0 * 1000000) div det AS BIGINT) AS beta0_e6",
        "CAST((det1 * 1000000) div det AS BIGINT) AS beta1_e6",
        "CAST((det2 * 1000000) div det AS BIGINT) AS beta2_e6",
        "CAST(floor((1.0 - (CAST(syy AS DOUBLE)"
        " - (CAST(det0 AS DOUBLE) * CAST(sy AS DOUBLE)"
        " + CAST(det1 AS DOUBLE) * CAST(s1y AS DOUBLE)"
        " + CAST(det2 AS DOUBLE) * CAST(s2y AS DOUBLE))"
        " / CAST(det AS DOUBLE))"
        " / (CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
        " / CAST(n AS DOUBLE))) * 1e6) AS BIGINT) AS r2_e6",
    )


@register(
    "agg_weighted_percentile",
    oracle="""
    WITH t AS (
      SELECT l_returnflag AS g,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS vc,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ), d AS (
      SELECT g, vc, CAST(sum(w) AS BIGINT) AS w FROM t GROUP BY g, vc
    ), c AS (
      SELECT g, vc, w,
             CAST(sum(w) OVER (PARTITION BY g ORDER BY vc
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
             CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS totw
      FROM d
    )
    SELECT g AS l_returnflag, max(totw) AS total_weight,
           CAST(min(CASE WHEN 2 * cumw >= totw THEN vc END) AS BIGINT)
             AS wmedian_centi,
           CAST(min(CASE WHEN 10 * cumw >= 9 * totw THEN vc END) AS BIGINT)
             AS wp90_centi
    FROM c GROUP BY g ORDER BY l_returnflag
    """,
    doc="Exact WEIGHTED percentiles per group (weight = quantity — the "
    "'median price per UNIT SOLD, not per order line' question; "
    "agg_percentiles is the unweighted twin, agg_sketch_quantiles "
    "the approximate one). Definition: smallest value whose "
    "cumulative weight reaches q x total — evaluated entirely in "
    "exact integer arithmetic (2·cumw >= totw and 10·cumw >= 9·totw "
    "cross-multiplications; no float q, no interpolation, no "
    "boundary ambiguity). Shape: pre-aggregate to DISTINCT (group, "
    "value) pairs first — the same value-compression that makes the "
    "cumulative window linear in distinct prices rather than rows — "
    "then one cumulative-sum window sharing the groupBy's "
    "clustering, then a conditional-min fold. Two shuffles total "
    "(value agg + final group fold) at any scale; mergeable the way "
    "any rank-pick on pre-compressed value counts is.",
    tags=("agg", "lineitem"),
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("vc"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    d = t.groupBy("g", "vc").agg(F.sum("w").cast("bigint").alias("w"))
    wcum = (
        Window.partitionBy("g")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = d.select(
        "g",
        "vc",
        F.sum("w").over(wcum).cast("bigint").alias("cumw"),
        F.sum("w").over(Window.partitionBy("g")).cast("bigint").alias("totw"),
    )
    return (
        c.groupBy("g")
        .agg(
            F.max("totw").alias("total_weight"),
            F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("vc")))
            .cast("bigint")
            .alias("wmedian_centi"),
            F.min(
                F.when(10 * F.col("cumw") >= 9 * F.col("totw"), F.col("vc"))
            )
            .cast("bigint")
            .alias("wp90_centi"),
        )
        .selectExpr(
            "g AS l_returnflag", "total_weight", "wmedian_centi", "wp90_centi"
        )
        .orderBy("l_returnflag")
    )


@register(
    "win_cumulative_distinct",
    oracle="""
    WITH f AS (
      SELECT event_type, user_id,
             min(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY event_type, user_id
    ), d AS (
      SELECT event_type, first_day,
             CAST(count(*) AS BIGINT) AS new_users
      FROM f GROUP BY event_type, first_day
    )
    SELECT event_type, strftime(first_day, '%Y-%m-%d') AS day,
           new_users,
           CAST(sum(new_users) OVER (PARTITION BY event_type
                                     ORDER BY first_day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_users
    FROM d ORDER BY event_type, day
    """,
    doc="Cumulative DISTINCT count over time — the discovery-curve / "
    "audience-saturation query (how many unique users has each "
    "event type ever seen, by day). A naive per-day COUNT(DISTINCT "
    "... ) OVER cumulative frame is a holistic window (no engine "
    "merges distinct states across frames cheaply); the exact "
    "linear-cost rewrite is first-occurrence attribution: each "
    "(type, user) contributes once at its min-date (one hash agg), "
    "daily new-user counts (second agg, same key prefix), then a "
    "plain cumulative SUM window — distinct-counting reduced to "
    "mergeable aggregates + one running total. Day boundaries on "
    "the NTZ wall-clock date (zone-proof on both engines). At "
    "100 TB this is two shuffles on (type, user) / (type, day) and "
    "a tiny windowed frame — the same plan any retention system "
    "ships.",
    tags=("window", "agg", "events"),
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables.load(spark, sf_dir, "events")
    f = e.groupBy("event_type", "user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    d = f.groupBy("event_type", "first_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("first_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.select(
            "event_type",
            F.date_format("first_day", "yyyy-MM-dd").alias("day"),
            "new_users",
            F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "agg_ks_test",
    oracle="""
    WITH t AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS vc,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events WHERE event_type IN ('click', 'purchase')
    ), g AS (
      SELECT vc, sum(ia) AS ca, sum(1 - ia) AS cb FROM t GROUP BY vc
    ), c AS (
      SELECT vc,
             sum(ca) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS cuma,
             sum(cb) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS cumb
      FROM g
    ), tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(cb) AS BIGINT) AS n_b FROM g
    ), d AS (
      SELECT vc, abs(cuma * n_b - cumb * n_a) AS dd FROM c, tot
    ), mx AS (SELECT max(dd) AS ks_num FROM d)
    SELECT tot.n_a, tot.n_b,
           CAST((mx.ks_num * 1000000) // (tot.n_a * tot.n_b) AS BIGINT)
             AS ks_e6,
           (SELECT CAST(min(vc) AS BIGINT) FROM d, mx
            WHERE d.dd = mx.ks_num) AS ks_at_centi
    FROM tot, mx
    """,
    doc="Exact two-sample Kolmogorov-Smirnov distance between the "
    "click and purchase value distributions — the distribution-drift "
    "test statisticians actually quote (val_distribution_drift's PSI "
    "is binned; KS is the sup-norm over the EXACT empirical CDFs). "
    "All integer: values on the centi grid, per-value counts for each "
    "side in ONE hash aggregation (conditional sums — no second "
    "scan), cumulative counts by one ordered window over the DISTINCT "
    "value domain (bounded by the grid, NOT by row count — at 100 TB "
    "the raw table shuffles once into per-value counts and the "
    "window runs over <=10^6 domain rows), and the statistic as the "
    "max of |cuma*n_b - cumb*n_a| — the cross-multiplied form that "
    "avoids any fraction until the final e6 truncating division "
    "(Spark div == DuckDB //, verified bridge). Emits the argmax "
    "value too (min such value: deterministic under plateau ties). "
    "Totals/max/argmax are all in-plan 1-row broadcasts, nothing is "
    "collected.",
    tags=("agg", "statistics", "events"),
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    t = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
        (F.col("event_type") == "click").cast("bigint").alias("ia"),
    )
    g = t.groupBy("vc").agg(
        F.sum("ia").cast("bigint").alias("ca"),
        F.sum(F.lit(1) - F.col("ia")).cast("bigint").alias("cb"),
    )
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "vc",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    tot = g.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    d = c.crossJoin(F.broadcast(tot)).select(
        "vc",
        F.abs(F.col("cuma") * F.col("n_b") - F.col("cumb") * F.col("n_a")).alias("dd"),
    )
    # max + plateau-argmax in ONE aggregation: struct max orders by dd
    # then by -vc, so the winner carries the SMALLEST vc among ties —
    # the separate max-then-filter-then-min formulation recomputed the
    # grouped/windowed chain twice (measured 20 Exchanges in the plan)
    best = d.agg(
        F.max(
            F.struct(F.col("dd").alias("dd"), (-F.col("vc")).alias("nvc"))
        ).alias("m")
    )
    return (
        tot.crossJoin(F.broadcast(best))
        .selectExpr(
            "n_a",
            "n_b",
            "CAST((m.dd * 1000000) div (n_a * n_b) AS BIGINT) AS ks_e6",
            "CAST(-m.nvc AS BIGINT) AS ks_at_centi",
        )
    )


@register(
    "agg_autocorr",
    oracle="""
    WITH base AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ), st AS (
      SELECT event_type, ts, event_id, vc,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(vc) OVER (PARTITION BY event_type) AS s1
      FROM base
    ), nu AS (
      SELECT event_type, CAST(n AS BIGINT) AS n,
             CAST(n * vc - s1 AS HUGEINT) AS nu,
             lag(CAST(n * vc - s1 AS HUGEINT), 1) OVER w AS nu1,
             lag(CAST(n * vc - s1 AS HUGEINT), 7) OVER w AS nu7
      FROM st
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type, n,
           CAST((sum(nu * nu1) * 1000000) // sum(nu * nu) AS BIGINT)
             AS acf1_e6,
           CAST((sum(nu * nu7) * 1000000) // sum(nu * nu) AS BIGINT)
             AS acf7_e6
    FROM nu GROUP BY event_type, n ORDER BY event_type
    """,
    doc="Exact lag-1 / lag-7 autocorrelation of each event_type's "
    "value series in (ts, event_id) order. The mean-centered products "
    "are made integer by working with nu_t = n*x_t - sum(x) (the "
    "deviation scaled by n): acf_k = sum(nu_t * nu_{t-k}) / "
    "sum(nu_t^2) is the textbook estimator with the n^2 scale "
    "cancelling, computed entirely in DECIMAL(38,0)/HUGEINT (nu ~ "
    "1e11, products ~1e22, sums ~1e26 — exact in both engines' "
    "wide-integer types) and floored to e6 by the verified truncating "
    "division bridge. Plan: one window partition per event_type "
    "computes n and s1 (unbounded frame) and the two lags over the "
    "SAME (event_type) clustering — a single Exchange feeds all "
    "window operators and the final aggregation. Lag nulls at series "
    "heads drop out of the sums identically in both engines.",
    tags=("agg", "statistics", "timeseries", "events"),
)
def agg_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    w_full = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_ord = Window.partitionBy("event_type").orderBy("ts", "event_id")
    nu_expr = (
        F.count(F.lit(1)).over(w_full) * F.col("vc")
        - F.sum("vc").over(w_full)
    ).cast("decimal(38,0)")
    nu = base.select(
        "event_type",
        F.count(F.lit(1)).over(w_full).cast("bigint").alias("n"),
        nu_expr.alias("nu"),
        F.lag(nu_expr, 1).over(w_ord).alias("nu1"),
        F.lag(nu_expr, 7).over(w_ord).alias("nu7"),
    )
    return (
        nu.groupBy("event_type", "n")
        .agg(
            F.sum(F.col("nu") * F.col("nu1")).alias("num1"),
            F.sum(F.col("nu") * F.col("nu7")).alias("num7"),
            F.sum(F.col("nu") * F.col("nu")).alias("den"),
        )
        .selectExpr(
            "event_type",
            "n",
            "CAST((num1 * 1000000) div den AS BIGINT) AS acf1_e6",
            "CAST((num7 * 1000000) div den AS BIGINT) AS acf7_e6",
        )
        .orderBy("event_type")
    )


@register(
    "win_skyline_2d",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS grp,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_centi,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(count(*) AS BIGINT) AS n_dup
      FROM lineitem GROUP BY 1, 2, 3
    ), sc AS (
      SELECT grp, price_centi, qty, n_dup,
             max(qty) OVER (PARTITION BY grp ORDER BY price_centi
                            RANGE BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS best_cheaper,
             max(qty) OVER (PARTITION BY grp, price_centi) AS best_equal
      FROM pts
    )
    SELECT grp, price_centi, qty, n_dup
    FROM sc
    WHERE (best_cheaper IS NULL OR qty > best_cheaper) AND qty = best_equal
    ORDER BY grp, price_centi
    """,
    doc="2-D skyline (Pareto frontier) — the classic non-dominated-"
    "points operator from the DB literature (Borzsony/Kossmann/"
    "Stocker 2001), here per returnflag minimizing price and "
    "maximizing quantity: a point survives iff nothing is both "
    "cheaper-or-equal and bigger-or-equal with one strict. The naive "
    "formulation is a quadratic NOT EXISTS self-join; the 2-D case "
    "collapses to ONE window pass over distinct points: on the "
    "frontier iff qty exceeds the best qty at any strictly lower "
    "price (a value-RANGE frame ending at 1 PRECEDING — frame "
    "semantics identical in both engines) and qty is the best among "
    "its own exact price (equal-price duplicates dominate each "
    "other). Pre-compression to distinct (group, price, qty) with "
    "counts keeps the window input bounded by the value grid, and "
    "the whole plan is one shuffle on the group key. Cross-checked "
    "against a quadratic brute-force dominance scan in pytest.",
    tags=("window", "analytics", "lineitem"),
)
def win_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    pts = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("price_centi"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_dup"))
    w_cheaper = (
        Window.partitionBy("grp")
        .orderBy("price_centi")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # best-at-equal-price as a RANGE frame [0, 0] over the SAME
    # (grp)/price ordering — identical row set to the old
    # partitionBy(grp, price_centi) window (all rows of the group at
    # exactly this price), but both window functions now share one
    # exchange + sort instead of paying a second (grp, price) exchange
    # (guide §2.4: same-keyed operations share one exchange)
    w_equal = (
        Window.partitionBy("grp").orderBy("price_centi").rangeBetween(0, 0)
    )
    sc = pts.select(
        "grp",
        "price_centi",
        "qty",
        "n_dup",
        F.max("qty").over(w_cheaper).alias("best_cheaper"),
        F.max("qty").over(w_equal).alias("best_equal"),
    )
    return (
        sc.filter(
            (F.col("best_cheaper").isNull() | (F.col("qty") > F.col("best_cheaper")))
            & (F.col("qty") == F.col("best_equal"))
        )
        .select("grp", "price_centi", "qty", "n_dup")
        .orderBy("grp", "price_centi")
    )


@register(
    "fn_hash_suite",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT
                 ('0x' || substr(md5(text), 1, 8))::UBIGINT % 64)
                AS BIGINT) AS md5_buckets,
           CAST(sum(('0x' || substr(md5(text), 1, 8))::UBIGINT)
                AS BIGINT) AS md5_head_sum,
           CAST(sum(('0x' || substr(sha256(text), 1, 8))::UBIGINT)
                AS BIGINT) AS sha256_head_sum
    FROM documents GROUP BY source ORDER BY source
    """,
    doc="Cryptographic-hash surface pin: md5 and sha-256 are "
    "BIT-EQUAL across Spark and DuckDB (lowercase hex of the standard "
    "digest), and the first-8-hex-digits -> BIGINT bridge "
    "(Spark conv(substring(hex,1,8),16,10) == DuckDB "
    "('0x'||substr(hex,1,8))::UBIGINT) is the exact integer the "
    "repo's entire salted-sampling family rides on — this query "
    "makes that bridge a first-class driver-checked fact rather "
    "than an implicit dependency of 20 other queries. Per source: "
    "distinct md5 buckets mod 64 (occupancy), plus head sums for "
    "both digests. Everything per-row deterministic; the sums are "
    "exact BIGINT (500 x 2^32 max ~ 2e12).",
    tags=("fn", "documents"),
)
def fn_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    md5_head = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
    sha_head = F.conv(
        F.substring(F.sha2(F.col("text"), 256), 1, 8), 16, 10
    ).cast("bigint")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct(md5_head % 64).cast("bigint").alias("md5_buckets"),
            F.sum(md5_head).cast("bigint").alias("md5_head_sum"),
            F.sum(sha_head).cast("bigint").alias("sha256_head_sum"),
        )
        .orderBy("source")
    )


@register(
    "agg_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), trans AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ), tot AS (
      SELECT prev_type, sum(n) AS row_total FROM trans GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, t.n,
           CAST((t.n * 1000000) // o.row_total AS BIGINT) AS p_e6
    FROM trans t JOIN tot o USING (prev_type)
    ORDER BY t.prev_type, t.next_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences — the user-behavior model every funnel/churn analysis "
    "starts from: lag() over the (user, ts, event_id) total order "
    "pairs each event with its predecessor, one hash aggregation "
    "counts (prev, next) cells, and row-normalized probabilities "
    "land exactly on an e6 grid by the truncating-division bridge. "
    "Plan: the lag window and nothing else touches raw rows (one "
    "user-key shuffle); the matrix is |types|^2 <= 25 cells, so the "
    "normalizing join is broadcast-sized. The event-level census "
    "(win_event_pattern) answers 'does this PATTERN occur'; this "
    "answers 'what happens NEXT from each state'.",
    tags=("agg", "statistics", "events"),
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = trans.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        trans.join(F.broadcast(tot), "prev_type")
        .selectExpr(
            "prev_type",
            "next_type",
            "n",
            "CAST((n * 1000000) div row_total AS BIGINT) AS p_e6",
        )
        .orderBy("prev_type", "next_type")
    )


#: floor(log10(1 + 1/d) * 1e6) for d = 1..9, precomputed ONCE in
#: Python and embedded as literals in BOTH engines' texts — no
#: transcendental evaluated inside either engine.
_BENFORD_E6 = (301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757)

#: leading digit of a positive BIGINT via magnitude bands — pure
#: integer CASE, identical text in Spark and DuckDB (no log10, no
#: string formatting, both of which differ across engines)
_LEAD_DIGIT_SQL = """CASE
  WHEN pc < 10 THEN pc
  WHEN pc < 100 THEN pc // 10
  WHEN pc < 1000 THEN pc // 100
  WHEN pc < 10000 THEN pc // 1000
  WHEN pc < 100000 THEN pc // 10000
  WHEN pc < 1000000 THEN pc // 100000
  WHEN pc < 10000000 THEN pc // 1000000
  WHEN pc < 100000000 THEN pc // 10000000
  WHEN pc < 1000000000 THEN pc // 100000000
  ELSE pc // 1000000000 END"""


@register(
    "agg_benford_deviation",
    oracle=f"""
    WITH v AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS pc
      FROM orders WHERE o_totalprice > 0
    ), d AS (
      SELECT CAST({_LEAD_DIGIT_SQL} AS INT) AS digit,
             CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY 1
    ), e AS (
      SELECT unnest(range(1, 10)) AS digit,
             unnest({list(_BENFORD_E6)}) AS expected_e6
    ), tot AS (SELECT sum(n) AS total FROM d)
    SELECT e.digit, CAST(coalesce(d.n, 0) AS BIGINT) AS n,
           CAST((coalesce(d.n, 0) * 1000000) // tot.total AS BIGINT)
             AS observed_e6,
           CAST(e.expected_e6 AS BIGINT) AS expected_e6,
           CAST(abs((coalesce(d.n, 0) * 1000000) // tot.total
                    - e.expected_e6) AS BIGINT) AS abs_dev_e6
    FROM e LEFT JOIN d ON e.digit = d.digit, tot
    ORDER BY e.digit
    """,
    doc="Benford's-law first-digit audit over order totals — the "
    "classic fabricated-data / data-quality screen: leading-digit "
    "frequencies vs log10(1 + 1/d). Engine-exact by construction: "
    "the leading digit comes from pure-integer magnitude bands on "
    "the centi grid (no per-row log10 or float formatting, both of "
    "which can differ across engines), observed shares land on the "
    "e6 grid by the truncating-division bridge, and the expected "
    "Benford proportions are PRECOMPUTED e6 literals embedded in "
    "both texts — no transcendental evaluated in either engine (the "
    "same discipline as the ln/pow floor-grid family). One hash "
    "aggregation over the scan; the 9-digit expected table is a "
    "literal dimension. TPC-H prices are uniform-ish, so large "
    "deviations are EXPECTED here — the query reports the deviation "
    "profile, it does not assert conformance.",
    tags=("agg", "statistics", "validation", "orders"),
)
def agg_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    lead_digit = _LEAD_DIGIT_SQL.replace("//", "div")
    d = (
        o.filter(F.col("o_totalprice") > 0)
        .select(F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("pc"))
        .selectExpr(f"CAST({lead_digit} AS INT) AS digit")
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    e = tables.local_table(
        spark,
        [(i + 1, exp) for i, exp in enumerate(_BENFORD_E6)],
        [("digit", "int"), ("expected_e6", "bigint")],
    )
    tot = d.agg(F.sum("n").alias("total"))
    return (
        e.join(d, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "digit",
            "CAST(coalesce(n, 0) AS BIGINT) AS n",
            "CAST((coalesce(n, 0) * 1000000) div total AS BIGINT)"
            " AS observed_e6",
            "expected_e6",
            "CAST(abs((coalesce(n, 0) * 1000000) div total - expected_e6)"
            " AS BIGINT) AS abs_dev_e6",
        )
        .orderBy("digit")
    )


def _pca_round_sql(r: int) -> str:
    """One power-iteration round: w = C' v, renormalize to the e6 grid
    by the max-|entry| truncating division."""
    return f"""w{r} AS MATERIALIZED (
      SELECT cov.i, sum(cov.c * v{r - 1}.v) AS w
      FROM cov JOIN v{r - 1} ON cov.j = v{r - 1}.i
      GROUP BY cov.i
    ), m{r} AS MATERIALIZED (
      SELECT max(abs(w)) AS m FROM w{r}
    ), v{r} AS MATERIALIZED (
      SELECT w{r}.i, (w{r}.w * 1000000) // m{r}.m AS v
      FROM w{r}, m{r}
    )"""


def _pca_census_sql(r: int) -> str:
    return f"""
      SELECT CAST({r} AS INT) AS round,
             CAST((SELECT i FROM v{r}
                   ORDER BY abs(v) DESC, i LIMIT 1) AS INT) AS top_dim,
             CAST((SELECT v FROM v{r}
                   ORDER BY abs(v) DESC, i LIMIT 1) AS BIGINT) AS top_val_e6,
             CAST((SELECT sum(v * i) FROM v{r}) AS BIGINT) AS fp"""


_PCA_ROUNDS = 3


@register(
    "ml_pca_power",
    oracle="""
    WITH el AS MATERIALIZED (
      SELECT vec_id, u.i AS i,
             CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT)
               AS ve6
      FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) AS u
    ), dims AS MATERIALIZED (
      SELECT i, sum(ve6) AS s, count(*) AS n FROM el GROUP BY i
    ), g AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j,
             CAST(sum(a.ve6 * b.ve6) AS HUGEINT) AS g
      FROM el a JOIN el b ON a.vec_id = b.vec_id
      GROUP BY a.i, b.i
    ), cov AS MATERIALIZED (
      SELECT g.i, g.j,
             CAST(di.n AS HUGEINT) * di.n * g.g
             - CAST(di.n AS HUGEINT) * di.s * dj.s AS c
      FROM g JOIN dims di ON g.i = di.i JOIN dims dj ON g.j = dj.i
    ), v0 AS MATERIALIZED (
      SELECT unnest(range(1, 65)) AS i, CAST(1000000 AS HUGEINT) AS v
    ), """
    + ", ".join(_pca_round_sql(r) for r in range(1, _PCA_ROUNDS + 1))
    + """
    SELECT * FROM ("""
    + " UNION ALL ".join(_pca_census_sql(r) for r in range(1, _PCA_ROUNDS + 1))
    + """
    ) ORDER BY round
    """,
    doc="PCA by power iteration — the dimensionality-reduction member "
    "of the ML family (regression: ml_normal_equations, "
    "classification: ml_gd_classifier, clustering: "
    "ml_kmedians_embed), made engine-exact end-to-end: the raw Gram "
    "G = X^T X is ONE mergeable (i, j)-keyed BIGINT sum over a "
    "vec_id-keyed self-join (products <= 4e12 — stays on the "
    "codegen'd integer path; the first formulation multiplied "
    "decimal(38,0) across the full n x 64^2 fanout and benched "
    "12.6 s vs ~5 s now), lifted to the centered "
    "C' = n^2*G - n*S_i*S_j in decimal on the 4096-row matrix only "
    "(C' = n^2 * Cov; scale factors cancel in the eigenvector), "
    "and each of 3 power rounds is a "
    "64x64 broadcast matrix-vector product renormalized to the e6 "
    "grid by max-|entry| truncating division — all in "
    "decimal(38,0)/HUGEINT (measured magnitudes: |C'| <= 1.4e20, "
    "|w| <= 1.8e26, rescale product <= 1.8e32 — 6 digits of "
    "headroom). Emits per round the dominant dimension, its e6 "
    "loading, and the full-vector fingerprint sum(v_i * i): the "
    "census shows the iterate settling (top_dim stabilizes by round "
    "2 on the fixture). Rounds unroll as MATERIALIZED CTEs in the "
    "oracle (the kcore lesson); numpy object-integer power iteration "
    "cross-checks in pytest.",
    tags=("ml", "embeddings", "statistics"),
)
def ml_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables.load(spark, sf_dir, "embeddings")
    # el feeds three consumers (dims and both sides of the Gram
    # self-join) — checkpoint the narrow exploded grid once instead of
    # three scan+explode passes (guide §3.3)
    el = (
        e.select("vec_id", F.posexplode("embedding").alias("p", "vf"))
        .select(
            "vec_id",
            (F.col("p") + 1).cast("int").alias("i"),
            F.floor(F.col("vf").cast("double") * 1000000).cast("bigint").alias("ve6"),
        )
        .localCheckpoint(eager=True)
    )
    dims = el.groupBy("i").agg(
        F.sum("ve6").alias("s"), F.count(F.lit(1)).alias("n")
    )
    # Gram in pure BIGINT (x products <= 4e12, row sums <= 8e15 at the
    # registered scales — whole-stage-codegen'd), then the centered
    # C' = n^2*G - n*S_i*S_j lift in decimal on the 4096-row matrix
    # only: the first formulation multiplied decimals across the full
    # n x 64^2 fanout and benched 12.6 s; this one is ~3 s.
    a = el.select("vec_id", F.col("i").alias("ai"), F.col("ve6").alias("ax"))
    b = el.select("vec_id", F.col("i").alias("bj"), F.col("ve6").alias("bx"))
    g = (
        a.join(b, "vec_id")
        .groupBy(F.col("ai").alias("i"), F.col("bj").alias("j"))
        .agg(F.sum(F.col("ax") * F.col("bx")).alias("g"))
    )
    di = dims.select(
        F.col("i").alias("si"), F.col("s").alias("s_i"), "n"
    )
    dj = dims.select(F.col("i").alias("sj"), F.col("s").alias("s_j"))
    cov = (
        g.join(F.broadcast(di), F.col("i") == F.col("si"))
        .join(F.broadcast(dj), F.col("j") == F.col("sj"))
        .select(
            "i",
            "j",
            (
                F.col("n").cast("decimal(38,0)")
                * F.col("n").cast("decimal(38,0)")
                * F.col("g").cast("decimal(38,0)")
                - F.col("n").cast("decimal(38,0)")
                * F.col("s_i").cast("decimal(38,0)")
                * F.col("s_j").cast("decimal(38,0)")
            ).alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    v = tables.local_table(
        spark,
        [(i, 1_000_000) for i in range(1, 65)],
        [("vi", "int"), ("v", "decimal(38,0)")],
    )
    out = None
    for r in range(1, _PCA_ROUNDS + 1):
        w = (
            cov.join(F.broadcast(v), F.col("j") == F.col("vi"))
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
        )
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = (
            w.crossJoin(F.broadcast(m))
            .selectExpr(
                "i AS vi",
                "CAST((w * 1000000) div m AS decimal(38,0)) AS v",
            )
            .localCheckpoint(eager=True)
        )
        top = (
            v.orderBy(F.abs(F.col("v")).desc(), "vi")
            .limit(1)
            .select(
                F.col("vi").cast("int").alias("top_dim"),
                F.col("v").cast("bigint").alias("top_val_e6"),
            )
        )
        census = (
            v.agg(
                F.sum(F.col("v") * F.col("vi")).cast("bigint").alias("fp")
            )
            .crossJoin(F.broadcast(top))
            .select(
                F.lit(r).cast("int").alias("round"),
                "top_dim",
                "top_val_e6",
                "fp",
            )
        )
        out = census if out is None else out.unionByName(census)
    assert out is not None
    return out.orderBy("round")


@register(
    "agg_gini_concentration",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT rev,
             row_number() OVER (ORDER BY rev, o_custkey) AS rk,
             count(*) OVER () AS n,
             sum(rev) OVER () AS tot
      FROM per
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           CAST(max(tot) AS BIGINT) AS total_rev_centi,
           CAST((2 * sum(CAST(rk AS HUGEINT) * rev) * 1000000)
                // (CAST(max(n) AS HUGEINT) * max(tot))
                - ((max(n) + 1) * 1000000) // max(n)
                AS BIGINT) AS gini_e6
    FROM ranked
    """,
    doc="Gini coefficient of revenue concentration across customers — "
    "the Lorenz-curve inequality metric (who earns the revenue), "
    "distinct from agg_entropy_gini's Gini IMPURITY (how mixed are "
    "labels). Exact rank formulation G = 2*sum(i*x_(i))/(n*sum(x)) - "
    "(n+1)/n over the (rev, custkey) total order: one per-customer "
    "rollup, one global rank window, one aggregation; both divisions "
    "land on the e6 grid by the truncating bridge applied to the SAME "
    "cross-multiplied integers in both engines (HUGEINT/decimal(38,0) "
    "for rank*rev sums ~ 1e17 and the n*tot product). At 100 TB the "
    "global rank is the one total-order step — the standard "
    "range-partitioned sort, over per-customer rollups, not raw rows.",
    tags=("agg", "statistics", "orders"),
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias("rev")
    )
    w_rank = Window.orderBy("rev", "o_custkey")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per.select(
        "rev",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("rev").over(w_all).alias("tot"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.max("tot").cast("bigint").alias("total_rev_centi"),
        F.sum(F.col("rk").cast("decimal(38,0)") * F.col("rev")).alias("rksum"),
    ).selectExpr(
        "n_customers",
        "total_rev_centi",
        "CAST((2 * rksum * 1000000)"
        " div (CAST(n_customers AS decimal(38,0)) * total_rev_centi)"
        " - ((n_customers + 1) * 1000000) div n_customers AS BIGINT)"
        " AS gini_e6",
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(floor(sqrt(list_sum(list_transform(
                  embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                ))) * 1000000) AS BIGINT) AS norm_micro
    FROM embeddings ORDER BY vec_id
    """,
    doc="mapInArrow (SPARK-37227): the zero-copy batch path — the "
    "transform receives pyarrow RecordBatches directly, no "
    "Arrow->pandas materialization (mapInPandas' hidden cost on wide "
    "array columns), completing the Python execution matrix the repo "
    "pins (row UDF / pandas UDF / mapInPandas / applyInPandas[WithState] "
    "/ UDTF / mapInArrow). Per-row L2 norms over the 64-dim embedding "
    "column are computed on the ListArray's raw values buffer: one "
    "vectorized float64 square, one np.add.reduceat over the list "
    "offsets — chosen over np.sum/pairwise reduction DELIBERATELY: "
    "reduceat adds strictly left-to-right, the SAME order DuckDB's "
    "list_sum uses, so with per-element float32->float64 casts on both "
    "sides every double is bit-identical and floor(sqrt(x)*1e6) is "
    "hash-exact (sqrt is IEEE correctly-rounded in both engines). "
    "Null rows are refused loudly (the offset-segment reduction "
    "assumes dense lists); ZERO-LENGTH rows degrade gracefully to "
    "norm_micro = NULL — DuckDB's list_sum([]) answer — by excluding "
    "their zero-width segments from the reduceat index (round-14 "
    "ADVICE). At 100 TB this is the shape for vectorized feature "
    "extraction over embedding/tensor columns: executor-local batch "
    "compute, no Python-object row materialization, output bounded "
    "to scalars per row.",
    tags=("udf", "embeddings", "spark4"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def batches(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            lst = batch.column("embedding")
            if lst.null_count:
                raise AssertionError(
                    "udf_map_in_arrow: null embedding rows — the "
                    "offset-segment reduction assumes dense lists"
                )
            offsets = np.asarray(lst.offsets)
            lens = offsets[1:] - offsets[:-1]
            vals = np.asarray(lst.values.cast(pa.float64()))
            sq = vals * vals
            # Strictly sequential per-segment sums (NOT np.sum's
            # pairwise tree): must match DuckDB list_sum's order.
            # Zero-length rows (round-14 ADVICE: don't hard-assert)
            # are excluded from the reduceat index — an empty segment
            # occupies zero width in the values buffer, so reduceat
            # over only the non-empty starts still sums each segment
            # exactly, left-to-right, and every start stays strictly
            # inside the buffer (no trailing IndexError). Empty rows
            # emit norm_micro = NULL, DuckDB's list_sum([]) answer.
            nonempty = lens > 0
            starts = offsets[:-1][nonempty]
            seg_sums = (
                np.add.reduceat(sq, starts) if len(starts) else np.zeros(0)
            )
            norms = np.zeros(len(lens), dtype="int64")
            norms[nonempty] = np.floor(
                np.sqrt(seg_sums) * 1_000_000
            ).astype("int64")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("vec_id"),
                    pa.array(lens.astype("int32")),
                    pa.array(norms, mask=~nonempty),
                ],
                ["vec_id", "dim", "norm_micro"],
            )

    return emb.mapInArrow(
        batches, "vec_id bigint, dim int, norm_micro bigint"
    ).orderBy("vec_id")
