"""TPC-H-shaped composite queries adapted to the driver's star schema —
breadth demonstrations that compose the §2 operators into the classic
analytics patterns (multi-join + agg + top-k, EXISTS, conditional agg,
share-of-total). IDs: q3/q4/q5/q6/q12/q14 analogues.

The fixture schema lacks some TPC-H columns (no o_orderdate filter
ranges that match spec, no p_type 'PROMO%' values guaranteed), so
predicates are adapted to the generated data while keeping each query's
structural shape intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chess_ratings_spark import tables
from chess_ratings_spark.operators.aggregates import money
from chess_ratings_spark.registry import register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           round(sum({_REV}), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join, segment + date predicates pushed "
    "to each scan, grouped revenue, global top-10 (TakeOrdered).",
    tags=("tpch",),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp_ntz")
    )
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp_ntz")
    )
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money(F.sum(F.expr(_REV))).alias("revenue"))
    )
    return (
        j.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated subquery as a left-semi "
    "join (orders with any line shipped after the order date).",
    tags=("tpch",),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q5_local_supplier",
    oracle=f"""
    SELECT n_name, round(sum({_REV}), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way star join with the local-supplier "
    "predicate (customer and supplier share a nation), region-filtered "
    "via broadcast dims.",
    tags=("tpch",),
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    )
    return j.groupBy("n_name").agg(money(F.sum(F.expr(_REV))).alias("revenue"))


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate; every predicate "
    "in PushedFilters, no shuffle at all (single global agg).",
    tags=("tpch",),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: join + conditional aggregation (CASE inside "
    "sum) splitting counts by priority class.",
    tags=("tpch",),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = o.join(li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate))
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END), 2) AS promo_revenue_x100,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    doc="TPC-H Q14 shape: share-of-total via conditional sum over a "
    "broadcast part join (promo share numerator/denominator split to "
    "keep each aggregate independently rounded).",
    tags=("tpch",),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.col("p_type").like("PROMO%")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        money(100.0 * F.sum(F.when(promo, rev).otherwise(0.0))).alias("promo_revenue_x100"),
        money(F.sum(rev)).alias("total_revenue"),
    )


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(CAST(sum(l_quantity) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(sum(l_extendedprice) / count(*), 6) AS avg_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: the canonical wide scan-agg — one pass, six "
    "aggregates per (returnflag, linestatus), date predicate pushed to "
    "the parquet scan. Averages stated as explicit sum/count divisions "
    "and rounded on both engines (accumulation order differs).",
    tags=("tpch",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        money(F.sum("l_extendedprice")).alias("sum_base_price"),
        money(F.sum(disc_price)).alias("sum_disc_price"),
        money(F.sum(charge)).alias("sum_charge"),
        F.round(F.sum("l_quantity").cast("double") / n, 6).alias("avg_qty"),
        F.round(F.sum("l_extendedprice") / n, 6).alias("avg_price"),
        n.cast("bigint").alias("count_order"),
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))
                          - CAST(l_quantity AS BIGINT)
                            * CAST(round(p_retailprice * 100) AS BIGINT) * 10)
                      AS BIGINT) / 10000.0, 2) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE contains(p_name, 'a')
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H Q9 shape: 5-way star join (two broadcast dims, two "
    "fact-side equi joins), profit per (nation, order-year). The "
    "fixture has no partsupp, so supply cost is stood in by 10% of "
    "retail price. Profit aggregates in EXACT fixed-point (1e-4 money "
    "units as BIGINT — prices/discounts are 2dp, so the summand is an "
    "integer): the sum is order-independent, immune to the float-"
    "accumulation cent-boundary splits that plague cross-engine money "
    "comparison, and how an engine should do money at 100 TB anyway.",
    tags=("tpch",),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part").filter(F.col("p_name").contains("a")).select(
        "p_partkey", "p_retailprice"
    )
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = tables.load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ext_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_pct = F.round(F.col("l_discount") * 100).cast("bigint")
    retail_c = F.round(F.col("p_retailprice") * 100).cast("bigint")
    profit_e4 = ext_c * (100 - disc_pct) - F.col("l_quantity").cast("bigint") * retail_c * 10
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit_e4) / 10000.0, 2).alias("profit"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left join with a join-level predicate (the "
    "comment-filter stand-in excludes urgent orders), per-customer "
    "order counts incl. zero, then the distribution of those counts — "
    "two cascaded aggs, the second over a tiny key space.",
    tags=("tpch",),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer").select("c_custkey")
    o = tables.load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    j = c.join(
        o,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left",
    )
    per_cust = j.groupBy("c_custkey").agg(
        F.count("o_orderkey").cast("bigint").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
