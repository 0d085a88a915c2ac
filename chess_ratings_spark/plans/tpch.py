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


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name, p_partkey,
           p_brand, unit_cost
    FROM part
    JOIN supply ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND unit_cost = (
        SELECT min(unit_cost) FROM supply s2 WHERE s2.l_partkey = p_partkey
      )
    ORDER BY acctbal DESC, n_name, s_name, p_partkey LIMIT 20
    """,
    doc="TPC-H Q2 shape (no partsupp fixture: the supply relation is "
    "derived as min unit sell price per (part, supplier) from "
    "lineitem — min of per-row divisions is order-independent, so "
    "cross-engine exact). Correlated min subquery picks each part's "
    "cheapest EUROPE supplier; 4-way dim join broadcast; top-20 by "
    "account balance.",
    tags=("tpch",),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = tables.load(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey"), F.col("l_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    # Correlated-min as a window over the already-aggregated supply
    # relation: one extra exchange on l_partkey instead of the previous
    # second groupBy + equi-join back (two shuffles + a join). At 100 TB
    # supply is |parts|x|suppliers|-bounded, far smaller than lineitem,
    # so the window's sort-within-partition is cheap relative to the
    # saved shuffle.
    supply = supply.withColumn(
        "best_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    )
    p = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        p.join(supply, supply.l_partkey == p.p_partkey)
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .join(s, s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "unit_cost",
        )
        .orderBy(F.col("acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_region, cust_region, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE ((r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
          OR (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1998-12-31 00:00:00'
    )
    GROUP BY supp_region, cust_region, l_year
    """,
    doc="TPC-H Q7 shape: directional geography-pair volume by ship "
    "year — double dim-chain join (nation→region on both the "
    "supplier and customer sides, all broadcast), disjunctive pair "
    "predicate, 3-level group. Region pairs instead of the spec's "
    "nation pair: the sf0.001 fixture has 10 suppliers over 25 "
    "nations, so any fixed nation pair is vacuous at smoke scale "
    "while 5 regions keep every SF non-empty (6 groups at all SFs).",
    tags=("tpch",),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = tables.load(spark, sf_dir, "supplier")
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1998-12-31 00:00:00").cast("timestamp_ntz"),
        )
    )
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    g1 = n.join(r, n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("nk1"), F.col("r_name").alias("supp_region")
    )
    g2 = n.join(r, n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("nk2"), F.col("r_name").alias("cust_region")
    )
    j = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(g1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(g2), F.col("c_nationkey") == F.col("nk2"))
        .filter(
            ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
            | ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
        )
    )
    return (
        j.select(
            "supp_region",
            "cust_region",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_region", "cust_region", "l_year")
        .agg(money(F.sum("volume")).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                                ELSE 0 END), 2)
                 / round(sum(volume), 2), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_5's market share of PROMO-part revenue "
    "sold into ASIA per order year — 7-table star join, conditional "
    "aggregation, share-of-total. Both sums are rounded to cents "
    "before the division so the share is reduction-order-proof.",
    tags=("tpch",),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tables.load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("nrk"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    j = (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(r), F.col("nrk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    agg = j.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(0.0)),
            2,
        ).alias("nat"),
        F.round(F.sum("volume"), 2).alias("tot"),
    )
    return agg.select("o_year", F.round(F.col("nat") / F.col("tot"), 6).alias("mkt_share"))


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2)
             AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue in "
    "a half-year window — date + flag predicates pushed to the scans, "
    "broadcast nation, grouped revenue, global top-k.",
    tags=("tpch",),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = tables.load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = tables.load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money(F.sum(F.expr(_REV))).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q11_important_values",
    oracle="""
    WITH value_by_part AS (
      SELECT l_partkey, round(sum(l_extendedprice), 2) AS part_value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM value_by_part
    WHERE part_value > (
      SELECT round(sum(part_value) * 2.0 / count(*), 2) FROM value_by_part
    )
    ORDER BY part_value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape (no partsupp fixture: per-part value derived "
    "from NATION_3 suppliers' lineitem revenue): grouped value vs a "
    "scalar-subquery threshold of 2x the mean per-part value "
    "(scale-free: a fixed fraction of total goes vacuous as the part "
    "count grows with SF). Group sums are "
    "rounded to cents before both the total and the comparison, so "
    "the threshold cut is reduction-order-proof.",
    tags=("tpch",),
)
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    vbp = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(money(F.sum("l_extendedprice")).alias("part_value"))
    )
    thresh = vbp.agg(F.round(F.sum("part_value") * 2.0 / F.count(F.lit(1)), 2).alias("t"))
    return (
        vbp.join(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("t"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum({_REV}), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: quarterly revenue per supplier as a reused "
    "subplan (the spec's CREATE VIEW), max-revenue supplier(s) via a "
    "scalar-subquery equality. Revenue is rounded to cents before the "
    "max/equality so the winner is reduction-order-proof.",
    tags=("tpch",),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money(F.sum(F.expr(_REV))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = tables.load(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_parts_supplier_count",
    oracle="""
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT)
             AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) supply
    JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    doc="TPC-H Q16 shape (no partsupp fixture: distinct (part, "
    "supplier) pairs derived from lineitem): distinct-supplier count "
    "per part attribute bucket, NOT IN anti-join against "
    "negative-balance suppliers (the comment-filter stand-in).",
    tags=("tpch",),
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = tables.load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < 0.5 * (
        SELECT avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 shape: lost-revenue estimate for below-half-average "
    "order quantities of one brand — correlated per-part avg "
    "(quantities are small integers, so the double sum is exact and "
    "the threshold cross-engine deterministic), single global "
    "aggregate. Spark side computes the per-part average via a "
    "grouped subplan + broadcast join rather than a correlated "
    "rescan.",
    tags=("tpch",),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(o_totalprice, 2) AS totalprice,
           sum(l_quantity) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 120
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """,
    doc="TPC-H Q18 shape: customers with large-volume orders — IN "
    "subquery over a grouped HAVING (left-semi join in Spark), "
    "quantity sums are exact integer-valued doubles, top-100 by "
    "order price.",
    tags=("tpch",),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 120)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                      F.col("l_orderkey") == F.col("big_key"), "left_semi"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT round(sum({_REV}), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunctive brand/size/quantity predicate "
    "triples over the part join — the OR-of-ANDs pattern Catalyst "
    "must keep join-side-separable (part predicates prune the "
    "broadcast side; quantity bounds stay on the fact scan).",
    tags=("tpch",),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(money(F.sum(F.expr(_REV))).alias("revenue"))


@register(
    "q20_promotion_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    ), part_total AS (
      SELECT l_partkey AS pk, sum(qty) AS total_qty FROM shipped GROUP BY 1
    )
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    JOIN shipped ON l_suppkey = s_suppkey
    JOIN part_total ON pk = l_partkey
    WHERE qty > 0.5 * total_qty
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 shape (no partsupp fixture: availability derived "
    "from shipped quantities): suppliers in a nation group who moved "
    "more than half of a PROMO part's 1997 volume — nested grouped "
    "aggregate + fraction-of-total threshold + semi-join-style "
    "DISTINCT projection. Quantities are exact integer-valued "
    "doubles, so the 0.5× threshold is cross-engine deterministic.",
    tags=("tpch",),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    p = tables.load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("total_qty")
    )
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    return (
        shipped.join(part_total, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ), per_order AS (
      SELECT l_orderkey, count(*) AS ns, sum(late) AS nl
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per_supp
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE late = 1 AND ns > 1 AND nl = 1
    GROUP BY s_name, n_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
    doc="TPC-H Q21 shape (no l_receiptdate fixture: 'kept waiting' is "
    "shipping >90 days after order date): for finalized orders, the "
    "sole-late supplier among multiple suppliers — the "
    "EXISTS/NOT-EXISTS pair rewritten as one grouped pass computing "
    "per-order supplier and late-supplier counts (equivalent: s late "
    "∧ ns>1 ∧ late set = {s}), then counted per supplier. One "
    "shuffle on orderkey replaces two correlated rescans — the "
    "100 TB-friendly form.",
    tags=("tpch",),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = tables.load(spark, sf_dir, "lineitem")
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("ns"), F.sum("late").alias("nl")
    )
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    return (
        per_supp.join(per_order, "l_orderkey")
        .filter((F.col("late") == 1) & (F.col("ns") > 1) & (F.col("nl") == 1))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT c_custkey, c_acctbal, c_nationkey % 10 AS cntrycode
      FROM customer WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
    ), cutoff AS (
      SELECT round(avg(c_acctbal), 2) AS avg_bal FROM eligible
      WHERE c_acctbal > 0.0
    )
    SELECT CAST(cntrycode AS INT) AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM eligible, cutoff
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    doc="TPC-H Q22 shape (no c_phone fixture: country code is "
    "c_nationkey % 10): above-average-balance customers in selected "
    "codes with no orders since 2000 (every fixture customer has "
    "some order, so the spec's bare NOT EXISTS would be vacuous) — "
    "scalar avg subquery (rounded to cents "
    "before the comparison, reduction-order-proof) + NOT EXISTS "
    "anti-join, grouped per code.",
    tags=("tpch",),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    eligible = c.filter((F.col("c_nationkey") % 10).isin(1, 2, 3, 4, 5)).select(
        "c_custkey", "c_acctbal", (F.col("c_nationkey") % 10).alias("cntrycode")
    )
    cutoff = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    o = (
        tables.load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        eligible.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, eligible.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("cntrycode").cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
