"""Spark 4 SQL-surface tier: the language features Spark 4 added that
change how an analytics engine is USED — recursive CTEs (iteration in
pure SQL), the VARIANT semi-structured type (typed JSON without a
schema), SQL pipe syntax (|> composition), and collated string
semantics (case-insensitivity as a type property, not a function
call). Each query proves the feature against a DuckDB oracle that
replays the same semantics through that engine's equivalents, so the
feature demos carry the same exact-hash bar as every other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chess_ratings_spark import tables
from chess_ratings_spark.registry import register


def _register_events_view(spark: SparkSession, sf_dir: str, name: str) -> None:
    tables.load(spark, sf_dir, "events").createOrReplaceTempView(name)


@register(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT s_suppkey AS start, s_suppkey AS cur, 0 AS depth
      FROM supplier
      UNION ALL
      SELECT start, CAST(floor(cur / 7.0) AS BIGINT) AS cur, depth + 1
      FROM chain WHERE cur > 0
    ), final AS (
      SELECT start, max(depth) - 1 AS depth FROM chain GROUP BY start
    )
    SELECT CAST(depth AS INT) AS depth,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(start) AS BIGINT) AS key_checksum
    FROM final GROUP BY depth ORDER BY depth
    """,
    doc="Recursive CTE (Spark 4.0, SPARK-24497): the org-chart/BOM walk "
    "SQL could not express before — each supplier key climbs its "
    "parent chain (parent = floor(k/7), root 0) until exhaustion, and "
    "the recursion DEPTH per key is aggregated into a per-level "
    "census. Depth is a genuine fixpoint computation (the engine "
    "iterates the recursive step until the working set empties), not "
    "a closed-form rewrite; DuckDB runs the IDENTICAL recursive SQL "
    "text (floor-division spelled portably), so both engines must "
    "agree on every iteration. At scale each recursive step is one "
    "self-join of the frontier — the same shape as the hand-unrolled "
    "PageRank/LPA loops, now engine-managed.",
    tags=("sql", "spark4", "supplier"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.load(spark, sf_dir, "supplier").createOrReplaceTempView(
        "crs_s4_supplier"
    )
    out = spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT s_suppkey AS start, s_suppkey AS cur, 0 AS depth
          FROM crs_s4_supplier
          UNION ALL
          SELECT start, CAST(floor(cur / 7.0) AS BIGINT) AS cur, depth + 1
          FROM chain WHERE cur > 0
        ), final AS (
          SELECT start, max(depth) - 1 AS depth FROM chain GROUP BY start
        )
        SELECT CAST(depth AS INT) AS depth,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(start) AS BIGINT) AS key_checksum
        FROM final GROUP BY depth ORDER BY depth
        """
    )
    spark.catalog.dropTempView("crs_s4_supplier")
    return out


@register(
    "fn_variant_json",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
             AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(count(*) FILTER (
             WHERE json_extract_string(props, '$.missing') IS NULL
           ) AS BIGINT) AS n_missing_path
    FROM events GROUP BY 1 ORDER BY k_bucket
    """,
    doc="The VARIANT semi-structured type (Spark 4.0): events.props "
    "parses ONCE into a typed variant value (parse_json), then "
    "variant_get extracts typed paths without re-tokenizing the "
    "string per path — the open-schema JSON answer that replaces "
    "per-path get_json_object string scans (fn_json_get is the "
    "old-style twin) and underlies the shredded-storage path at "
    "scale. Missing paths yield typed NULLs (n_missing_path counts "
    "them: all rows). The oracle replays through DuckDB's JSON "
    "extraction — the values, not the storage representation, are "
    "the contract.",
    tags=("scalar", "spark4", "events"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"))
    return (
        v.select(
            F.try_variant_get("v", "$.k", "bigint").alias("k"),
            F.try_variant_get("v", "$.missing", "bigint").alias("miss"),
        )
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.count(F.when(F.col("miss").isNull(), 1)).alias(
                "n_missing_path"
            ),
        )
        .orderBy("k_bucket")
    )


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS value_centi
    FROM events
    WHERE user_id % 3 = 0
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="SQL pipe syntax (Spark 4.0, |>): the same "
    "filter -> aggregate -> order pipeline written as left-to-right "
    "pipe stages (FROM events |> WHERE ... |> AGGREGATE ... GROUP BY "
    "... |> ORDER BY), which must compile to the IDENTICAL logical "
    "plan and therefore the identical hash as the classic nested "
    "form the oracle states. Pipe syntax matters operationally: "
    "pipelines compose top-to-bottom like DataFrame code, so "
    "generated/templated SQL appends stages instead of rewriting "
    "nesting.",
    tags=("sql", "spark4", "events"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_events_view(spark, sf_dir, "crs_s4_events")
    out = spark.sql(
        """
        FROM crs_s4_events
        |> WHERE user_id % 3 = 0
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS value_centi
           GROUP BY event_type
        |> SELECT event_type, n, value_centi
        |> ORDER BY event_type
        """
    )
    spark.catalog.dropTempView("crs_s4_events")
    return out


@register(
    "fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 3 = 0 THEN upper(event_type)
                  WHEN event_id % 3 = 1 THEN event_type
                  ELSE upper(substr(event_type, 1, 1))
                         || substr(event_type, 2) END AS label,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    )
    SELECT lower(label) AS label_ci,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT label) AS BIGINT) AS n_case_variants,
           CAST(sum(vc) AS BIGINT) AS value_centi
    FROM mixed GROUP BY 1 ORDER BY label_ci
    """,
    doc="Collated string semantics (Spark 4.0): a deliberately "
    "case-mangled label column (UPPER / original / Capitalized by "
    "event_id mod 3) is grouped under COLLATE UTF8_LCASE — "
    "case-insensitivity as a property of the comparison, so GROUP "
    "BY / joins / DISTINCT fold case variants WITHOUT rewriting "
    "every predicate through lower() (and, at scale, without losing "
    "stats/pruning on a derived column). The collated group count, "
    "the per-group case-variant census (counted under the default "
    "binary collation), and the fixed-point sum must match the "
    "oracle's explicit lower() replay.",
    tags=("scalar", "spark4", "events"),
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    # capitalize-first spelled explicitly (NOT initcap): initcap
    # uppercases every word, the oracle's substr form only the first
    # character — identical on today's single-word event types, but a
    # latent divergence under fixture regeneration
    label = (
        F.when(F.col("event_id") % 3 == 0, F.upper("event_type"))
        .when(F.col("event_id") % 3 == 1, F.col("event_type"))
        .otherwise(
            F.concat(
                F.upper(F.substring("event_type", 1, 1)),
                F.expr("substring(event_type, 2)"),
            )
        )
    )
    mixed = ev.select(
        label.alias("label"),
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    return (
        mixed.groupBy(
            F.lower(F.expr("label COLLATE UTF8_LCASE")).alias("label_ci")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("label").alias("n_case_variants"),
            F.sum("vc").cast("bigint").alias("value_centi"),
        )
        .orderBy("label_ci")
    )


@register(
    "scan_metadata_columns",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           true AS all_files_contiguous,
           true AS row_index_total_check,
           true AS file_names_parquet,
           true AS file_sizes_positive
    FROM lineitem
    """,
    doc="Hidden file-metadata columns (_metadata.file_path / "
    "file_name / file_size / row_index — SPARK-37273): the lineage "
    "and debugging surface a 100 TB scan needs (which physical file "
    "produced this row; where inside it) without any join against a "
    "listing. The query groups by _metadata.file_path and certifies "
    "the contract in-plan: within every file row_index runs "
    "contiguously 0..count-1 (min = 0, max = count-1, distinct = "
    "count), per-file counts sum back to the table count, every "
    "file_name ends in .parquet, every file_size is positive. The "
    "oracle pins the row count and all certificates true — it "
    "cannot see Spark's metadata struct, but the certificates are "
    "engine-verifiable facts about ANY correct parquet scan, which "
    "is exactly what makes them safe to hash. Metadata columns are "
    "populated by the scan itself (constant per split), so the plan "
    "is one FileScan + one partial/final aggregate — no extra pass.",
    tags=("scan", "spark4", "lineitem"),
)
def scan_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per_file = li.groupBy(F.col("_metadata.file_path").alias("fp")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("_metadata.row_index").alias("mn"),
        F.max("_metadata.row_index").alias("mx"),
        F.countDistinct("_metadata.row_index").alias("nd"),
        F.min("_metadata.file_name").alias("fname"),
        F.min("_metadata.file_size").alias("fsize"),
    )
    return per_file.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.every(
            (F.col("mn") == 0)
            & (F.col("mx") == F.col("cnt") - 1)
            & (F.col("nd") == F.col("cnt"))
        ).alias("all_files_contiguous"),
        (F.sum(F.col("mx") + 1) == F.sum("cnt")).alias(
            "row_index_total_check"
        ),
        F.every(F.col("fname").endswith(".parquet")).alias(
            "file_names_parquet"
        ),
        F.every(F.col("fsize") > 0).alias("file_sizes_positive"),
    )


@register(
    "sql_udf_create_function",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    r AS (
      SELECT CASE WHEN user_id % 3 = 0 THEN 'gold'
                  WHEN user_id % 3 = 1 THEN 'silver'
                  ELSE 'bronze' END AS band,
             vc + vc // 10 AS fee,
             (user_id % 3 + 1) * (user_id % 3 + 2) // 2 AS lat
      FROM ev
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(fee) AS BIGINT) AS fee_sum,
           CAST(sum(lat) AS BIGINT) AS lat_sum
    FROM r GROUP BY band
    """,
    doc="SQL UDFs (Spark 4, SPARK-46057 family): reusable logic "
    "declared IN SQL — a scalar CREATE TEMPORARY FUNCTION "
    "(fee = vc + vc div 10, integer-exact) and a TABLE function "
    "(RETURNS TABLE ... explode(sequence(1, k))) consumed via "
    "LATERAL — no Python on any row path: SQL UDFs inline into the "
    "plan as catalyst expressions / lateral subqueries, so they keep "
    "whole-stage codegen and cost nothing vs hand-inlined exprs "
    "(unlike Python UDFs, which serialize). The oracle replays the "
    "function BODIES inline (the lateral sum of 1..k collapses to "
    "k(k+1)/2), so the hash equality certifies the UDF layer is pure "
    "sugar over the same semantics.",
    tags=("sql", "spark4", "events"),
)
def sql_udf_create_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_events_view(spark, sf_dir, "crs_s4_udf_events")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION crs_fee(vc BIGINT) "
        "RETURNS BIGINT RETURN vc + vc div 10"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION crs_band(u BIGINT) "
        "RETURNS STRING RETURN CASE WHEN u % 3 = 0 THEN 'gold' "
        "WHEN u % 3 = 1 THEN 'silver' ELSE 'bronze' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION crs_steps(k INT) "
        "RETURNS TABLE(i INT) RETURN SELECT explode(sequence(1, k)) AS i"
    )
    return spark.sql(
        """
        WITH ev AS (
          SELECT event_id, user_id,
                 CAST(floor(value * 100) AS BIGINT) AS vc
          FROM crs_s4_udf_events
        ),
        lat AS (
          SELECT e.event_id, sum(s.i) AS lat
          FROM ev e, LATERAL crs_steps(CAST(e.user_id % 3 + 1 AS INT)) s
          GROUP BY e.event_id
        ),
        r AS (
          SELECT crs_band(e.user_id) AS band, crs_fee(e.vc) AS fee, l.lat
          FROM ev e JOIN lat l
            ON e.event_id = l.event_id
        )
        SELECT band,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(fee) AS BIGINT) AS fee_sum,
               CAST(sum(lat) AS BIGINT) AS lat_sum
        FROM r GROUP BY band
        """
    )


@register(
    "fn_xml_parse",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_order
    FROM orders GROUP BY o_orderstatus
    """,
    doc="XML as a first-class format (Spark 4.0, SPARK-44265 built-in "
    "XML): each order row is serialized with to_xml(struct(...)) and "
    "parsed back with from_xml under a DECLARED schema, then "
    "aggregated; the oracle aggregates the ORIGINAL parquet, so a "
    "hash-match proves the serialize->parse loop is lossless "
    "(Java double<->string text round-trips are exact, dates travel "
    "as ISO strings). This is the remaining text format after "
    "CSV/JSON (formats.py) — the reference ingests FIDE XML "
    "(reference prefect/flows/ingest_web_to_gcs.py:70-90), and this "
    "is that parse expressed as a vectorized JVM expression instead "
    "of a Python loop: at 100 TB the XML decode runs inside "
    "whole-stage codegen, no UDF.",
    tags=("scalar", "spark4", "orders", "formats"),
)
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.aggregates import money

    o = tables.load(spark, sf_dir, "orders")
    xml = o.select(
        F.to_xml(
            F.struct(
                "o_orderkey",
                "o_orderstatus",
                "o_totalprice",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            )
        ).alias("x")
    )
    parsed = xml.select(
        F.from_xml(
            "x",
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE,"
            " o_orderdate STRING",
        ).alias("o")
    ).select("o.*")
    return parsed.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        money(F.sum("o_totalprice")).alias("total"),
        F.min("o_orderdate").alias("first_order"),
    )


@register(
    "sql_session_variables",
    oracle="""
    WITH thr AS (
      SELECT floor(max(o_totalprice)) / 2 AS t FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_big,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_centi
    FROM orders, thr
    WHERE o_totalprice > thr.t
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="SQL session variables + EXECUTE IMMEDIATE (Spark 4.0, "
    "SPARK-42849/SPARK-44293): DECLARE VARIABLE holds a data-derived "
    "scalar (SET VAR ... = scalar subquery — the threshold never "
    "touches the Python driver), and the query template runs through "
    "EXECUTE IMMEDIATE with a ? placeholder (injection-safe "
    "parameterization) plus IDENTIFIER() binding the table name from "
    "a string — the templated-SQL surface generated pipelines need. "
    "The oracle replays the same threshold as a scalar subquery; "
    "floor(max)/2 is exact IEEE arithmetic on both engines.",
    tags=("sql", "spark4", "orders"),
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView("crs_s4v_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE crs_min_total DOUBLE DEFAULT 0.0")
    spark.sql(
        "SET VAR crs_min_total ="
        " (SELECT floor(max(o_totalprice)) / 2 FROM crs_s4v_orders)"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n_big,
                  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                    AS total_centi
           FROM IDENTIFIER(?)
           WHERE o_totalprice > ?
           GROUP BY o_orderpriority
           ORDER BY o_orderpriority'
          USING 'crs_s4v_orders', crs_min_total
        """
    )


@register(
    "join_lateral_topk",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.price
    FROM customer c, LATERAL (
      SELECT o_orderkey, round(o_totalprice, 2) AS price
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_custkey % 50 = 0
    ORDER BY c_custkey, o_orderkey
    """,
    doc="Correlated LATERAL subquery join (SPARK-34382): per-customer "
    "top-2 orders expressed as a lateral dependent subquery with "
    "ORDER BY + LIMIT — the SQL-standard spelling of the "
    "top-k-per-group pattern win_rank_topk expresses with windows. "
    "Catalyst decorrelates the lateral into a ranked join (no "
    "per-customer re-execution); the (o_totalprice DESC, o_orderkey) "
    "total order makes the LIMIT pick deterministic. DuckDB runs the "
    "IDENTICAL lateral SQL text, so both engines must agree on every "
    "decorrelation corner (customers with <2 or 0 orders).",
    tags=("join", "sql", "spark4", "orders", "customer"),
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.load(spark, sf_dir, "customer").createOrReplaceTempView(
        "crs_lat_customer"
    )
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView(
        "crs_lat_orders"
    )
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.price
        FROM crs_lat_customer c, LATERAL (
          SELECT o_orderkey, round(o_totalprice, 2) AS price
          FROM crs_lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey % 50 = 0
        ORDER BY c_custkey, o_orderkey
        """
    )


@register(
    "fn_interval_arith",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           strftime(min(o_orderdate + INTERVAL 1 MONTH),
                    '%Y-%m-%d %H:%M:%S') AS first_due,
           strftime(max(o_orderdate + INTERVAL 36 HOUR),
                    '%Y-%m-%d %H:%M:%S') AS last_grace,
           strftime(max(last_day(CAST(o_orderdate AS DATE))),
                    '%Y-%m-%d') AS last_eom,
           CAST(count(DISTINCT date_trunc('quarter', o_orderdate))
                AS BIGINT) AS n_quarters
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="ANSI interval arithmetic as first-class types: year-month "
    "intervals clamp at month ends (Jan 31 + 1 MONTH = Feb 29 — "
    "verified identical clamping in both engines), day-time "
    "intervals shift exact wall-clock microseconds, last_day / "
    "date_trunc('quarter') give the calendar-boundary verbs every "
    "billing/retention pipeline needs. All computed on NTZ "
    "timestamps so no session-timezone dependence exists (the "
    "hostile-tz driver sim proves it); rendered as strings for "
    "hashing. The month-DIFF verb is deliberately absent: Spark "
    "timestampdiff(MONTH) counts full elapsed months while DuckDB "
    "date_diff('month') counts boundary crossings — an "
    "engine-portability trap documented here instead of shipped.",
    tags=("scalar", "orders", "datetime"),
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables.load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderpriority",
            F.expr("o_orderdate + INTERVAL 1 MONTH").alias("due"),
            F.expr("o_orderdate + INTERVAL 36 HOUR").alias("grace"),
            F.last_day(F.col("o_orderdate").cast("date")).alias("eom"),
            F.date_trunc("quarter", "o_orderdate").alias("q"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.date_format(F.min("due"), "yyyy-MM-dd HH:mm:ss").alias("first_due"),
            F.date_format(F.max("grace"), "yyyy-MM-dd HH:mm:ss").alias("last_grace"),
            F.date_format(F.max("eom"), "yyyy-MM-dd").alias("last_eom"),
            F.countDistinct("q").alias("n_quarters"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "fn_tz_convert",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           strftime(min(timezone('America/New_York', timezone('UTC', ts))),
                    '%Y-%m-%d %H:%M:%S') AS first_ny,
           strftime(max(timezone('Asia/Kolkata', timezone('UTC', ts))),
                    '%Y-%m-%d %H:%M:%S') AS last_kolkata,
           strftime(max(timezone('Australia/Eucla', timezone('UTC', ts))),
                    '%Y-%m-%d %H:%M:%S') AS last_eucla
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Explicit timezone conversion as a COLUMN function "
    "(convert_timezone, SPARK-38195) — wall-clock math that never "
    "consults the session timezone, which is the only way timestamp "
    "logic survives a driver whose session zone is arbitrary (the "
    "hostile-tz sim runs America/New_York): events' NTZ instants "
    "(UTC wall clock by fixture convention) are converted to New "
    "York, Kolkata (+5:30), and Eucla (+8:45) — the sub-hour offsets "
    "that break any code assuming whole-hour zones. DuckDB replays "
    "via the two-step timezone(zone, timezone(src, ts)) composition, "
    "verified datetime-equal per value (both engines read the same "
    "IANA tzdb); outputs render as strings so the hash compares wall "
    "clocks, not instants.",
    tags=("scalar", "spark4", "events", "datetime"),
)
def fn_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")

    def conv(zone: str):
        return F.convert_timezone(F.lit("UTC"), F.lit(zone), F.col("ts"))

    return (
        ev.select(
            "event_type",
            conv("America/New_York").alias("ny"),
            conv("Asia/Kolkata").alias("kk"),
            conv("Australia/Eucla").alias("eu"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.date_format(F.min("ny"), "yyyy-MM-dd HH:mm:ss").alias("first_ny"),
            F.date_format(F.max("kk"), "yyyy-MM-dd HH:mm:ss").alias("last_kolkata"),
            F.date_format(F.max("eu"), "yyyy-MM-dd HH:mm:ss").alias("last_eucla"),
        )
        .orderBy("event_type")
    )


@register(
    "sql_exec_immediate",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Dynamic SQL the injection-safe way (Spark 4 surface): the "
    "query TEXT arrives as a session variable, the table name binds "
    "through IDENTIFIER(:tbl) (catalog-validated identifier, not "
    "string splicing) and the filter value through a named parameter "
    "marker :status — EXECUTE IMMEDIATE ... USING supplies both. "
    "This is the metadata-driven-pipeline primitive (one parameterized "
    "statement fanned across N tables/filters) without the injection "
    "surface string-formatted SQL has. Parameters bind in the "
    "ANALYZED plan, so Catalyst still sees a constant — the filter "
    "pushes down exactly as if it were literal text. The oracle "
    "replays the fully-resolved statement.",
    tags=("spark4", "sql", "orders"),
)
def sql_exec_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    view = f"crs_ei_orders_{uuid.uuid4().hex[:8]}"
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView(view)
    try:
        spark.sql("DECLARE OR REPLACE VARIABLE crs_ei_stmt STRING")
        spark.sql(
            "SET VARIABLE crs_ei_stmt = "
            "'SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(o_totalprice), 2) AS total "
            "FROM IDENTIFIER(:tbl) WHERE o_orderstatus = :status "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority'"
        )
        out = spark.sql(
            "EXECUTE IMMEDIATE crs_ei_stmt USING ? AS tbl, ? AS status",
            args=[view, "F"],
        )
        # materialize before the view is dropped
        return tables.local_table(
            spark,
            [tuple(r) for r in out.collect()],
            [
                ("o_orderpriority", "string"),
                ("n", "bigint"),
                ("total", "double"),
            ],
        )
    finally:
        spark.catalog.dropTempView(view)


@register(
    "sql_scripting",
    oracle="""
    WITH ks AS (SELECT unnest(range(0, 40)) AS k),
    cnt AS (
      SELECT ks.k, CAST(CAST(1 AS BIGINT) << ks.k AS BIGINT) AS th,
             (SELECT count(*) FROM orders o
              WHERE o.o_totalprice > (CAST(1 AS BIGINT) << ks.k)) AS n
      FROM ks
    ), pick AS (
      SELECT * FROM cnt WHERE n < 10 ORDER BY k LIMIT 1
    )
    SELECT CAST(k AS INT) AS iterations,
           CAST(th AS BIGINT) AS threshold,
           CAST(n AS BIGINT) AS n_above
    FROM pick
    """,
    doc="Spark 4 SQL scripting (SPARK-48338, compound statements): a "
    "BEGIN..END block with DECLAREd variables and a WHILE loop whose "
    "condition is a scalar subquery over data — the threshold doubles "
    "until fewer than 10 orders exceed it (an exponential-search "
    "probe, the canonical procedural-SQL shape that previously "
    "required a driver-language loop). Engine-side control flow: "
    "state lives in session variables, nothing round-trips through "
    "Python. Scale shape (round-12 verdict #6 — the WHILE previously "
    "re-aggregated the orders scan every pass, ~20 full scans at "
    "100 TB): all 40 candidate-threshold counts are precomputed in "
    "ONE scan (a log2-bucket histogram — ≤40 groups — with exact "
    "suffix-sum reconstruction), loaded into ARRAY session variables "
    "by two scalar-subquery SETs, and the WHILE condition probes pure "
    "variable state — per-iteration cost is the scripting engine's "
    "statement floor, not data. The oracle "
    "replays the loop DECLARATIVELY: the smallest k in 0..39 with "
    "count(price > 2^k) < 10 — a generate_series probe of the same "
    "exact integer thresholds (1<<k is bit-identical in both "
    "engines), which also documents the semantics the loop must "
    "satisfy (first crossing, not any crossing).",
    tags=("sql", "spark4", "orders"),
)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    view = f"crs_scr_probe_{uuid.uuid4().hex[:8]}"
    # ONE scan computes every candidate count, as a log2-bucket
    # histogram (b = floor(log2(price)) — ≤40 groups, trivial codegen;
    # the first-draft 40-conditional-sum aggregate spent ~4 s compiling
    # its generated code) plus the exact-power-of-two counts, since
    # bucket k holds [2^k, 2^(k+1)) but the contract is STRICTLY above
    # 2^k. Boundary safety: prices have 0.01 granularity, so the gap to
    # any 2^k is >> one ulp of log2 — floor can't mis-bucket. The
    # suffix sums n(k) = Σ_{b>k} n_b + (n_k − eq_k) fold over ≤40
    # collected buckets on the driver (bounded metadata, not data).
    hist = (
        tables.load(spark, sf_dir, "orders")
        .select("o_totalprice")
        .filter("o_totalprice > 0")  # 2^k >= 1 outcounts non-positives
        .select(
            F.floor(F.log2("o_totalprice")).cast("int").alias("b"),
            "o_totalprice",
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_b"),
            F.sum(
                F.when(
                    F.col("o_totalprice") == F.pow(F.lit(2.0), F.col("b")), 1
                ).otherwise(0)
            ).alias("eq_b"),
        )
        .collect()
    )
    cnt = {int(r["b"]): (int(r["n_b"]), int(r["eq_b"])) for r in hist}
    probe_rows = []
    for k in range(40):
        above = sum(n for b, (n, _) in cnt.items() if b > k)
        nk, ek = cnt.get(k, (0, 0))
        probe_rows.append((k, 1 << k, above + nk - ek))
    tables.local_table(
        spark,
        probe_rows,
        [("k", "int"), ("th", "bigint"), ("n", "bigint")],
    ).createOrReplaceTempView(view)
    try:
        # The probe counts load ONCE into ARRAY session variables via
        # scalar subqueries (array_sort(array_agg(struct)) pins the
        # k-order — array_agg alone has no ordering contract); the
        # WHILE condition then evaluates pure variable state. Measured
        # per-statement floor: a condition that references a view costs
        # ~0.35 s warm vs ~0.1 s for a variable-only expression, so a
        # ~18-iteration loop lands at ~1.9 s warm instead of ~6 s.
        out = spark.sql(
            f"""
            BEGIN
              DECLARE ns ARRAY<BIGINT>;
              DECLARE ths ARRAY<BIGINT>;
              DECLARE kv INT DEFAULT 0;
              SET ns = (SELECT transform(array_sort(array_agg(struct(k, n))),
                                         s -> s.n) FROM {view});
              SET ths = (SELECT transform(array_sort(array_agg(struct(k, th))),
                                          s -> s.th) FROM {view});
              -- kv < 39 bounds the probe walk inside the 40-element
              -- arrays (r13 ADVICE): unreachable at realistic price
              -- domains, but the failure mode is now an explicit
              -- loop exit instead of an out-of-range element_at
              WHILE kv < 39 AND element_at(ns, kv + 1) >= 10 DO
                SET kv = kv + 1;
              END WHILE;
              SELECT CAST(kv AS INT) AS iterations,
                     element_at(ths, kv + 1) AS threshold,
                     element_at(ns, kv + 1) AS n_above;
            END
            """
        )
        return tables.local_table(
            spark,
            [tuple(r) for r in out.collect()],
            [
                ("iterations", "int"),
                ("threshold", "bigint"),
                ("n_above", "bigint"),
            ],
        )
    finally:
        spark.catalog.dropTempView(view)


@register(
    "agg_approx_topk",
    oracle="""
    SELECT 'event_type' AS src, event_type AS item,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'o_orderpriority' AS src, o_orderpriority AS item,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="approx_top_k (Spark 4.1, SPARK-49981): heavy-hitter sketch as "
    "a BUILT-IN aggregate — the JVM/codegen answer to the repo's "
    "hand-rolled count-min heavy-hitters (agg_countmin_heavyhitters, "
    "which keeps its planted-falsifier bound check; this entry covers "
    "the engine surface). Called with k and maxItemsTracked both "
    "ABOVE the column's distinct cardinality, the sketch degenerates "
    "to exact counts of every value — which makes the whole result "
    "SQL-oracle-checkable as a plain GROUP BY, no approximation "
    "tolerance needed, while still exercising the sketch "
    "accumulate/merge path across partitions. Two sketches (events."
    "event_type, orders.o_orderpriority) exploded to (src, item, n) "
    "rows. At 100 TB the sketch path is the point: constant state "
    "per partition, one merge, no full shuffle of the grouped keys.",
    tags=("agg", "spark4", "sketch", "events", "orders"),
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    o = tables.load(spark, sf_dir, "orders")
    ev.createOrReplaceTempView("crs_atk_events")
    o.createOrReplaceTempView("crs_atk_orders")
    out = spark.sql(
        """
        SELECT src, x.item AS item, x.count AS n FROM (
          SELECT 'event_type' AS src,
                 explode(approx_top_k(event_type, 50, 10000)) AS x
          FROM crs_atk_events
          UNION ALL
          SELECT 'o_orderpriority' AS src,
                 explode(approx_top_k(o_orderpriority, 50, 10000)) AS x
          FROM crs_atk_orders
        )
        """
    )
    spark.catalog.dropTempView("crs_atk_events")
    spark.catalog.dropTempView("crs_atk_orders")
    return out


@register(
    "agg_theta_setops",
    oracle="""
    WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT
      CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view_users,
      CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_users,
      CAST((SELECT count(*) FROM (SELECT user_id FROM v UNION
                                  SELECT user_id FROM p)) AS BIGINT)
        AS n_view_or_purchase,
      CAST((SELECT count(*) FROM (SELECT user_id FROM v INTERSECT
                                  SELECT user_id FROM p)) AS BIGINT)
        AS n_view_and_purchase,
      CAST((SELECT count(*) FROM (SELECT user_id FROM v EXCEPT
                                  SELECT user_id FROM p)) AS BIGINT)
        AS n_view_only,
      CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
        AS n_any_users
    """,
    doc="Theta sketches with FULL set algebra (Spark 4.1 DataSketches "
    "surface: theta_sketch_agg / theta_union_agg / theta_union / "
    "theta_intersection / theta_difference) — the capability HLL "
    "cannot express: intersections and differences of distinct sets "
    "computed entirely in sketch domain. Per-event_type sketches of "
    "user_id build in one combinable aggregation (KB-sized partials, "
    "map-side merged); a second tiny agg unions the per-type sketches "
    "into view/purchase/all; pairwise set ops then answer 'viewed AND "
    "purchased', 'viewed but never purchased' without touching rows "
    "again. At 100 TB this is the saved-sketch rollup: per-day per-type "
    "sketches persist as bytes, any later set-algebra question is "
    "sketch-sized work. lgK=14 (16384 entries) keeps every sketch in "
    "the EXACT regime at driver scale (<=15k distinct users through "
    "sf1), so the SQL oracle pins exact values; beyond the regime the "
    "estimate degrades to its published ~1/sqrt(2^lgK) error, "
    "deterministically (hash-threshold sampling, no RNG).",
    tags=("agg", "sketch", "spark4", "events"),
)
def agg_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id, 14)").alias("sk")
    )
    row = sk.agg(
        F.expr(
            "theta_union_agg(CASE WHEN event_type = 'view' THEN sk END, 14)"
        ).alias("vsk"),
        F.expr(
            "theta_union_agg(CASE WHEN event_type = 'purchase' THEN sk END, 14)"
        ).alias("psk"),
        F.expr("theta_union_agg(sk, 14)").alias("ask"),
    )
    # coalesce: theta_union_agg over an all-NULL side (an sf missing
    # an event_type entirely) yields a NULL sketch -> NULL estimate,
    # while the oracle's count(DISTINCT) of an empty set is 0 — the
    # empty set IS zero, say so
    est = "CAST(round(coalesce(theta_sketch_estimate({}), 0.0)) AS BIGINT)"
    return row.select(
        F.expr(est.format("vsk")).alias("n_view_users"),
        F.expr(est.format("psk")).alias("n_purchase_users"),
        F.expr(est.format("theta_union(vsk, psk)")).alias("n_view_or_purchase"),
        F.expr(est.format("theta_intersection(vsk, psk)")).alias(
            "n_view_and_purchase"
        ),
        F.expr(est.format("theta_difference(vsk, psk)")).alias("n_view_only"),
        F.expr(est.format("ask")).alias("n_any_users"),
    )


@register(
    "agg_kll_quantile_merge",
    oracle="""
    WITH e AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS vc FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(quantile_disc(vc, 0.10) AS BIGINT) AS q10,
           CAST(quantile_disc(vc, 0.50) AS BIGINT) AS q50,
           CAST(quantile_disc(vc, 0.90) AS BIGINT) AS q90,
           CAST(quantile_disc(vc, 1.00) AS BIGINT) AS q100,
           CAST(round((CAST((SELECT count(*) FROM e WHERE vc <= 5000)
                             AS DOUBLE) / count(*)) * 1000000)
                AS BIGINT) AS rank_5000_ppm
    FROM e
    """,
    doc="Mergeable KLL quantile sketches (Spark 4.1 DataSketches "
    "surface: kll_sketch_agg_bigint partials + kll_merge_agg_bigint "
    "rollup + get_quantile / get_rank / get_n): per-event_type "
    "sketches build independently in one combinable aggregation, and "
    "a second agg MERGES the sketch bytes into the global "
    "distribution — global quantiles without re-scanning rows, the "
    "incremental-analytics shape percentile_approx (agg_sketch_"
    "quantiles) cannot express because its buffers are not exposed "
    "as persistable/mergeable values. k=65535 (the format maximum) "
    "keeps driver-scale inputs (10k rows at sf0.01) in the EXACT "
    "regime where get_quantile equals DuckDB's quantile_disc "
    "order-statistic bit-for-bit (verified at every probed point) "
    "and get_rank is the exact inclusive rank; past ~65k rows KLL "
    "compacts via RANDOMIZED sampling — still mergeable with "
    "published error, but values are no longer run-deterministic, "
    "which is why the oracle regime is pinned. vc = floor(value*100) "
    "keeps the sketched domain integer-exact.",
    tags=("agg", "sketch", "spark4", "events"),
)
def agg_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    parts = ev.groupBy("event_type").agg(
        F.expr("kll_sketch_agg_bigint(vc, 65535)").alias("sk")
    )
    merged = parts.agg(F.expr("kll_merge_agg_bigint(sk, 65535)").alias("sk"))
    q = "kll_sketch_get_quantile_bigint(sk, {})"
    return merged.select(
        F.expr("kll_sketch_get_n_bigint(sk)").alias("n_rows"),
        F.expr(q.format("0.10")).alias("q10"),
        F.expr(q.format("0.50")).alias("q50"),
        F.expr(q.format("0.90")).alias("q90"),
        F.expr(q.format("1.00")).alias("q100"),
        F.expr(
            "CAST(round(kll_sketch_get_rank_bigint(sk, 5000) * 1000000)"
            " AS BIGINT)"
        ).alias("rank_5000_ppm"),
    )


@register(
    "udtf_analyze_polymorphic",
    oracle="""
    SELECT doc_id,
           split_part(text, ' ', 1) AS w1,
           split_part(text, ' ', 2) AS w2,
           split_part(text, ' ', 3) AS w3,
           split_part(text, ' ', 4) AS w4,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
    FROM documents
    """,
    doc="Polymorphic Python UDTF (SPARK-44503: static analyze()): the "
    "output SCHEMA is computed at plan time from the call's constant "
    "argument — leading_words(text, 4) resolves to columns w1..w4 + "
    "n_tokens before any data moves, the surface udtf_doc_chunks "
    "(static returnType) cannot express. The UDTF pads short "
    "documents with '' to match SQL split_part semantics, so the "
    "DuckDB oracle is a plain split_part projection. Consumed via "
    "SQL LATERAL join over documents; row-at-a-time Python remains "
    "the documented slow path (the expression twin for real width-N "
    "extraction is a split+getItem projection) — this entry covers "
    "the analyze-time-schema API, as the §2.9 UDF/UDTF family does "
    "per surface.",
    tags=("udtf", "spark4", "documents", "text"),
)
def udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class LeadingWords:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value < 1:
                raise ValueError("n must be a positive integer literal")
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"w{i + 1}", StringType())
            return AnalyzeResult(schema=schema.add("n_tokens", IntegerType()))

        def eval(self, text: str, n: int):
            toks = (text or "").split(" ")
            yield tuple(
                toks[i] if i < len(toks) else "" for i in range(n)
            ) + (len(toks),)

    spark.udtf.register("crs_leading_words", LeadingWords)
    d = tables.load(spark, sf_dir, "documents")
    d.createOrReplaceTempView("crs_poly_docs")
    out = spark.sql(
        """
        SELECT d.doc_id, f.w1, f.w2, f.w3, f.w4, f.n_tokens
        FROM crs_poly_docs d, LATERAL crs_leading_words(d.text, 4) f
        """
    )
    spark.catalog.dropTempView("crs_poly_docs")
    return out
