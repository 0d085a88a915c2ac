"""Analytics surface completion: statistical aggregates, distribution
windows, deterministic list aggregation, conditional scalar suite, and
date/interval arithmetic.
"""

from __future__ import annotations

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
    o = tables.load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
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
