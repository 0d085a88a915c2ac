"""Relational core queries (SURVEY.md §2.1/§2.4/§2.5/§2.6 — scans,
joins, aggregations, windows, sorts, set ops) over the star schema.

Each query is the idiomatic Spark plan for its operator: filters and
projections sit directly on the scan (Catalyst pushes them into the
parquet reader), dimension joins broadcast, aggregates hash with
map-side partials, top-k uses window-group-limit / TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chess_ratings_spark import tables
from chess_ratings_spark.operators import joins, windows
from chess_ratings_spark.operators.aggregates import money
from chess_ratings_spark.registry import register

# ---------------------------------------------------------------------------
# Scans (§2.1)
# ---------------------------------------------------------------------------


@register(
    "src_parquet_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 45.0
    """,
    doc="Parquet scan with projection + predicate; both reach the reader "
    "(ReadSchema/PushedFilters). Reference at-rest format: "
    "ingest_web_to_gcs.py:145,159-161.",
    tags=("tier-r", "scan"),
)
def src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") >= 45.0).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# Joins (§2.4)
# ---------------------------------------------------------------------------


@register(
    "join_equi_inner",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Fact-fact equi join (lineitem ⋈ orders) + hash agg; Catalyst/AQE "
    "picks SMJ or SHJ on the shuffled key.",
    tags=("join",),
)
def join_equi_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    j = joins.equi_join(li, o.withColumnRenamed("o_orderkey", "l_orderkey"), on="l_orderkey")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT r_name,
           round(sum(o_totalprice), 2) AS total_spend,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Star join with broadcast dims: the orders fact never shuffles "
    "for the 25-row nation / 5-row region tables.",
    tags=("join",),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    cust_region = joins.broadcast_join(
        joins.broadcast_join(c, n, on=[c.c_nationkey == n.n_nationkey]).select(
            "c_custkey", "n_regionkey"
        ),
        r,
        on=[F.col("n_regionkey") == r.r_regionkey],
    ).select("c_custkey", "r_name")
    j = joins.broadcast_join(o, cust_region, on=[o.o_custkey == F.col("c_custkey")])
    return j.groupBy("r_name").agg(
        money(F.sum("o_totalprice")).alias("total_spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "join_outer",
    oracle="""
    SELECT c_custkey,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    doc="Left outer join keeping customers with no orders (count=0).",
    tags=("join",),
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    j = joins.equi_join(
        c, o.withColumnRenamed("o_custkey", "c_custkey"), on="c_custkey", how="left"
    )
    return j.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_orders"),
        money(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total_spend"),
    )


@register(
    "join_semi_anti",
    oracle="""
    SELECT 'with_orders' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'without_orders' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="Semi + anti join cohort counts (EXISTS / NOT EXISTS).",
    tags=("join",),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    semi = joins.semi_join(c, o, on="c_custkey").agg(F.count(F.lit(1)).alias("n_customers"))
    anti = joins.anti_join(c, o, on="c_custkey").agg(F.count(F.lit(1)).alias("n_customers"))
    return semi.select(F.lit("with_orders").alias("cohort"), "n_customers").unionAll(
        anti.select(F.lit("without_orders").alias("cohort"), "n_customers")
    )


@register(
    "join_cross_params",
    oracle="""
    SELECT f.game_format, m.y AS period_year, m.m AS period_month
    FROM (SELECT unnest(['standard','rapid','blitz']) AS game_format) f
    CROSS JOIN (
      SELECT CAST(year(d) AS INT) AS y, CAST(month(d) AS INT) AS m
      FROM (SELECT unnest(generate_series(DATE '2023-11-01', DATE '2024-02-01',
                                          INTERVAL 1 MONTH)) AS d)
    ) m
    """,
    doc="The reference's backfill enumeration (itertools.product at "
    "ingest_web_to_gcs.py:231) as a data-side cross join of formats × "
    "months (fn_date_range × enum dim).",
    tags=("tier-r", "join"),
)
def join_cross_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.functions import scalar

    formats = tables.local_table(
        spark,
        [("standard",), ("rapid",), ("blitz",)],
        [("game_format", "string")],
    )
    months = (
        spark.range(1)
        .select(
            F.explode(
                scalar.month_range(F.lit("2023-11-01").cast("date"), F.lit("2024-02-01").cast("date"))
            ).alias("d")
        )
        .select(
            F.year("d").cast("int").alias("period_year"),
            F.month("d").cast("int").alias("period_month"),
        )
    )
    return joins.cross_join(formats, months)


@register(
    "join_theta_range",
    oracle="""
    SELECT b.bucket_name, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders o
    JOIN (VALUES ('small', 0.0, 50000.0),
                 ('medium', 50000.0, 150000.0),
                 ('large', 150000.0, 1e18)) AS b(bucket_name, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.bucket_name
    """,
    doc="Non-equi band join: orders priced into value bands. Tiny band "
    "dim ⇒ broadcast-nested-loop is the right plan; a big-big range "
    "join would get a band-bucket equi prefix first.",
    tags=("join",),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    bands = tables.local_table(
        spark,
        [("small", 0.0, 50_000.0), ("medium", 50_000.0, 150_000.0), ("large", 150_000.0, 1e18)],
        [("bucket_name", "string"), ("lo", "double"), ("hi", "double")],
    )
    j = joins.theta_join(
        o,
        F.broadcast(bands),
        cond=(o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
    )
    return j.groupBy("bucket_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money(F.sum("o_totalprice")).alias("total_spend"),
    )


# ---------------------------------------------------------------------------
# Aggregations (§2.5)
# ---------------------------------------------------------------------------


@register(
    "agg_hash_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-side filter + grouped sums/avgs/count; "
    "HashAggregate with map-side partials.",
    tags=("agg",),
)
def agg_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(F.sum(disc_price)).alias("sum_disc_price"),
            money(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="count(distinct) per group — expand+two-phase agg under the hood.",
    tags=("agg",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_rollup_cube",
    oracle="""
    SELECT r_name, n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP subtotal hierarchy region→nation→grand total "
    "(Expand + hash agg; NULL-filled subtotal rows).",
    tags=("agg",),
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    j = joins.broadcast_join(
        joins.broadcast_join(c, n, on=[c.c_nationkey == n.n_nationkey]),
        r,
        on=[F.col("n_regionkey") == r.r_regionkey],
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money(F.sum("c_acctbal")).alias("total_acctbal"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot to wide layout with explicit pivot values (no extra "
    "distinct-scan job; plan stays static).",
    tags=("agg",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.aggregates import pivot_agg

    li = tables.load(spark, sf_dir, "lineitem")
    piv = pivot_agg(li, "l_returnflag", "l_linestatus", ["O", "F"], F.sum("l_quantity"))
    return piv.select(
        "l_returnflag", money(F.col("O")).alias("O"), money(F.col("F")).alias("F")
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 2) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` ≡ "
    "DuckDB quantile_cont). approx_percentile is the 100 TB variant; "
    "exact keeps the oracle hash-checkable.",
    tags=("agg",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        money(F.percentile("o_totalprice", F.lit(0.5))).alias("p50"),
        money(F.percentile("o_totalprice", F.lit(0.9))).alias("p90"),
        money(F.percentile("o_totalprice", F.lit(0.99))).alias("p99"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           true AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="HLL++ approximate distinct (the 100 TB path for cardinality). "
    "The estimate itself is engine-specific, so it is not a result "
    "column; instead the plan computes approx AND exact side by side "
    "and emits within_bound = |approx-exact|/exact ≤ 3·rsd, which the "
    "oracle pins to true — a drifting sketch hash-mismatches. The raw "
    "estimate value is additionally bounded in pytest.",
    tags=("agg",),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    # rsd=0.05, not 0.01: under grouped distinct-expand, a high-precision
    # HLL (16k registers) merged per expanded row is ~30× slower for no
    # benefit at this cardinality (measured 42s -> 1.2s at sf0.1).
    rsd = 0.05
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    err = F.abs(F.col("approx_orders") - F.col("exact_orders")) / F.col("exact_orders")
    return agg.select(
        "l_returnflag", "exact_orders", (err <= 3 * rsd).alias("within_bound")
    )


@register(
    "agg_unique_check",
    oracle="""
    SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n_rows
    FROM orders GROUP BY o_custkey HAVING count(*) > 1
    """,
    doc="The reference's patito unique=True constraint "
    "(chess_ratings_data_model.py:12) as a duplicate-key report.",
    tags=("tier-r", "agg", "validation"),
)
def agg_unique_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.aggregates import unique_check

    o = tables.load(spark, sf_dir, "orders")
    return unique_check(o, "o_custkey").withColumnRenamed("o_custkey", "key")


# ---------------------------------------------------------------------------
# Windows / sort / top-k / set ops (§2.6)
# ---------------------------------------------------------------------------


@register(
    "win_rank_topk",
    oracle="""
    SELECT * FROM (
      SELECT n_name, c_custkey, round(c_acctbal, 2) AS acctbal,
             CAST(row_number() OVER (PARTITION BY n_name
                                     ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rn <= 3
    """,
    doc="Top-3 customers by balance per nation; total-order tie-break on "
    "c_custkey keeps the result deterministic.",
    tags=("window",),
)
def win_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    j = joins.broadcast_join(c, n, on=[c.c_nationkey == n.n_nationkey])
    top = windows.topk_per_group(
        j.select("n_name", "c_custkey", "c_acctbal"),
        group=["n_name"],
        order=[F.col("c_acctbal").desc(), F.col("c_custkey")],
        k=3,
    )
    return top.select(
        "n_name", "c_custkey", money(F.col("c_acctbal")).alias("acctbal"), "rn"
    )


@register(
    "win_lag_delta",
    oracle="""
    SELECT user_id, month_start, monthly_value,
           round(monthly_value - lag(monthly_value) OVER (
               PARTITION BY user_id ORDER BY month_start), 2) AS delta
    FROM (
      SELECT user_id, strftime(date_trunc('month', ts), '%Y-%m-%d') AS month_start,
             round(sum(value), 2) AS monthly_value
      FROM events GROUP BY user_id, date_trunc('month', ts)
    )
    """,
    doc="Period-over-period delta per user (monthly snapshots → lag), the "
    "reference domain's defining shape (rating drift per player).",
    tags=("window",),
)
def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    monthly = (
        ev.groupBy("user_id", F.date_trunc("month", "ts").alias("mstart"))
        .agg(money(F.sum("value")).alias("monthly_value"))
        .select(
            "user_id",
            F.date_format("mstart", "yyyy-MM-dd").alias("month_start"),
            "monthly_value",
        )
    )
    out = windows.lag_delta(
        monthly,
        key=["user_id"],
        order=[F.col("month_start")],
        value="monthly_value",
        out="delta",
    )
    return out.withColumn("delta", money(F.col("delta")))


@register(
    "win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
    doc="Running total per customer with an explicit ROWS frame.",
    tags=("window",),
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    out = windows.running_agg(
        o,
        key=["o_custkey"],
        order=[F.col("o_orderdate"), F.col("o_orderkey")],
        value="o_totalprice",
        out="running_spend",
    )
    return out.select("o_custkey", "o_orderkey", money(F.col("running_spend")).alias("running_spend"))


@register(
    "win_ntile_rank",
    oracle="""
    SELECT c_custkey,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="rank/dense_rank/ntile ladder over a global total order.",
    tags=("window",),
)
def win_ntile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = tables.load(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@register(
    "sort_order",
    oracle="""
    SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS total,
           CAST(row_number() OVER (
             ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey) AS BIGINT) AS pos
    FROM orders
    """,
    doc="Global multi-key stable sort; verified via an explicit rank "
    "column since the hash compare is order-insensitive.",
    tags=("sort",),
)
def sort_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = tables.load(spark, sf_dir, "orders")
    w = Window.orderBy(
        F.col("o_orderpriority").asc(), F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        money(F.col("o_totalprice")).alias("total"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    ).orderBy("pos")


@register(
    "limit_topk_global",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Global top-10: TakeOrderedAndProject — k rows per partition to "
    "the driver, no global sort.",
    tags=("sort",),
)
def limit_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    top = windows.global_topk(o, order=[F.col("o_totalprice").desc(), F.col("o_orderkey")], k=10)
    return top.select("o_orderkey", money(F.col("o_totalprice")).alias("total"))


@register(
    "set_union",
    oracle="""
    SELECT k, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY k
    """,
    doc="unionByName stack of two snapshot slices (the at-rest dataset in "
    "the reference IS a union of monthly files).",
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.setops import union_snapshots

    o = tables.load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return union_snapshots(a, b).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="Customers present in both order-status cohorts (INTERSECT "
    "distinct semantics).",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.setops import intersect_rows

    o = tables.load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return intersect_rows(a, b)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="Customers who disappeared between cohorts (EXCEPT distinct).",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.distinct().exceptAll(b.distinct())


@register(
    "dedup_exact",
    oracle="""
    SELECT o_custkey, o_orderstatus, o_orderkey AS first_orderkey
    FROM (
      SELECT o_custkey, o_orderstatus, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    doc="Deterministic keep-first exact dedup on a key (row_number over "
    "an explicit total order — retry-safe, unlike dropDuplicates).",
    tags=("setop", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.setops import dedup_keep_first

    o = tables.load(spark, sf_dir, "orders")
    out = dedup_keep_first(
        o,
        keys=["o_custkey", "o_orderstatus"],
        order=[F.col("o_orderdate"), F.col("o_orderkey")],
    )
    return out.select("o_custkey", "o_orderstatus", F.col("o_orderkey").alias("first_orderkey"))


# ---------------------------------------------------------------------------
# Flagship (entry smoke): the Phase-0 spine — scan, broadcast star join,
# hash agg, window top-k, order.
# ---------------------------------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per region + each region's top customer by revenue.

    Exercises scan→broadcast join→hash agg→window→sort in one plan.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")

    cust_region = (
        joins.broadcast_join(c, n, on=[c.c_nationkey == n.n_nationkey])
        .select("c_custkey", "c_name", "n_regionkey")
        .join(F.broadcast(r), on=[F.col("n_regionkey") == r.r_regionkey])
        .select("c_custkey", "c_name", "r_name")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # customer grows with the fact tables — no broadcast hint; AQE picks
    # broadcast at small sf and sort-merge at scale.
    per_customer = (
        li.join(o.select("o_orderkey", "o_custkey"), on=[li.l_orderkey == F.col("o_orderkey")])
        .join(cust_region, on=[F.col("o_custkey") == cust_region.c_custkey])
        .groupBy("r_name", "c_custkey", "c_name")
        .agg(money(F.sum(revenue)).alias("customer_revenue"))
    )
    top = windows.topk_per_group(
        per_customer,
        group=["r_name"],
        order=[F.col("customer_revenue").desc(), F.col("c_custkey")],
        k=1,
    )
    region_rev = per_customer.groupBy("r_name").agg(
        money(F.sum("customer_revenue")).alias("region_revenue")
    )
    return (
        region_rev.join(
            top.select("r_name", "c_custkey", "c_name", "customer_revenue"), on="r_name"
        )
        .orderBy("r_name")
        .select(
            "r_name",
            "region_revenue",
            F.col("c_custkey").alias("top_custkey"),
            F.col("c_name").alias("top_customer"),
            F.col("customer_revenue").alias("top_customer_revenue"),
        )
    )
