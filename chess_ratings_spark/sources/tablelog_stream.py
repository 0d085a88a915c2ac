"""Python streaming DataSource over the TableLog change feed — the
source half of the lakehouse streaming story (``stream_sink_tablelog``
is the sink half): Structured Streaming consumes a manifest-log table
INCREMENTALLY, exactly like Delta's streaming source / Iceberg's
incremental scan.

Offset model (the part that makes it a real streaming source, not a
poll loop): an offset is ``{"version": N}`` — the log's commit version
IS the stream position. Each micro-batch covers ``(start, end]``
versions; ``partitions(start, end)`` diffs the manifests driver-side
(tiny JSON metadata) and emits one :class:`InputPartition` per added
data file (inserts) and per (prior-file × new delete-vector) pair
(deletes), skipping ``data_change=false`` commits (OPTIMIZE churn) —
so the executors read exactly the changed bytes, never a snapshot.
``read`` runs executor-side on pyarrow.

Restart semantics are Structured Streaming's standard contract: the
CHECKPOINT owns the offsets, and a restarted query resumes after the
versions its checkpoint recorded (tests/test_streaming.py proves no
re-emission across an availableNow restart). ``commit(end)``
additionally persists a source-side bookmark consulted by
``initialOffset`` so a checkpoint-LESS fresh query can skip history
already consumed by a long-running predecessor; measured API fact:
Spark only invokes commit() as later batches retire offsets, so a
single short availableNow run ends before any commit call — the
checkpoint, not the bookmark, is the durable position.

Rows carry ``(..., _change_type, _commit_version)`` like
``TableLog.changes_between`` — this source is its streaming twin, and
the two are value-checked against each other in the registered query.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

BOOKMARK = "_stream_bookmark.json"


class CdfPartition(InputPartition):
    def __init__(self, version: int, kind: str, data_file: str, dv_file: str | None):
        self.version = version
        self.kind = kind
        self.data_file = data_file
        self.dv_file = dv_file


class TableLogCdfReader(DataSourceStreamReader):
    def __init__(self, base: str, key_col: str, columns: list[str]) -> None:
        self.base = Path(base)
        self.log_dir = self.base / "_log"
        self.key_col = key_col
        self.columns = columns

    # -- offsets ----------------------------------------------------------

    def _versions(self) -> list[int]:
        return sorted(int(p.stem) for p in self.log_dir.glob("*.json"))

    def _manifest(self, v: int) -> dict:
        return json.loads((self.log_dir / f"{v:020d}.json").read_text())

    def initialOffset(self) -> dict:
        bm = self.base / BOOKMARK
        if bm.exists():
            return json.loads(bm.read_text())
        return {"version": -1}

    def latestOffset(self) -> dict:
        vs = self._versions()
        return {"version": vs[-1] if vs else -1}

    def commit(self, end: dict) -> None:
        (self.base / BOOKMARK).write_text(json.dumps(end))

    # -- batch planning (driver: manifest metadata only) -------------------

    def _files_of(self, m: dict) -> set[str]:
        """A manifest's file set under either protocol: inline full
        list, or the union of its referenced shard files (shard reads
        are tiny local JSON — metadata, same cost class as the
        manifest itself). rewrite_manifests compactions change the
        shard layout but never this set, and are data_change=false
        anyway, so the feed emits nothing for them."""
        if not m.get("sharded"):
            return set(m["files"])
        out: set[str] = set()
        for s in m.get("manifest_shards", []):
            out.update(json.loads(Path(s).read_text())["files"])
        return out

    def partitions(self, start: dict, end: dict):
        parts: list[CdfPartition] = []
        sv, ev = start["version"], end["version"]
        prev_files: set[str] = set()
        prev_dvs: set[str] = set()
        prev_scoped: set[str] = set()
        if sv >= 0:
            m = self._manifest(sv)
            prev_files = self._files_of(m)
            prev_dvs = set(m.get("delete_vectors", []))
            prev_scoped = set(m.get("delete_vectors_scoped", []))
        for v in range(max(sv, -1) + 1, ev + 1):
            m = self._manifest(v)
            files = self._files_of(m)
            dvs = set(m.get("delete_vectors", []))
            scoped = set(m.get("delete_vectors_scoped", []))
            if m.get("data_change", True):
                for f in sorted(files - prev_files):
                    parts.append(CdfPartition(v, "insert", f, None))
                for f in sorted(prev_files - files):
                    # a data-change commit that DROPS files (RESTORE /
                    # overwrite) logically deletes their rows: plan a
                    # whole-file delete partition (dv_file=None), matching
                    # changes_between's removed-file branch — without
                    # this, a streaming replica silently diverges from
                    # the source across a RESTORE. (OPTIMIZE also drops
                    # files but is data_change=false.)
                    parts.append(CdfPartition(v, "delete", f, None))
                for dv in sorted(dvs - prev_dvs):
                    for f in sorted(prev_files):
                        parts.append(CdfPartition(v, "delete", f, dv))
                for dv in sorted(scoped - prev_scoped):
                    # FILE-SCOPED (file, key) pairs (MOR UPDATE/MERGE):
                    # the masked OLD versions are the commit's deletes
                    # (its appended files already fed as inserts above).
                    # One partition per (prior file, pair artifact);
                    # executors skip files the artifact doesn't name —
                    # the driver keeps touching only file names.
                    for f in sorted(prev_files):
                        parts.append(CdfPartition(v, "delete-scoped", f, dv))
            prev_files, prev_dvs, prev_scoped = files, dvs, scoped
        return parts or [CdfPartition(ev, "empty", "", None)]

    # -- executor-side read -----------------------------------------------

    def read(self, partition: CdfPartition):
        """Executor-side read, Arrow-batch fast path: yield
        ``pyarrow.RecordBatch`` objects (columns reordered to the
        DECLARED schema, feed columns appended as constant arrays), so
        rows cross into the JVM as Arrow buffers instead of pickled
        Python tuples. Measured on a 1M-row 3-col feed into a noop
        sink (warm, local[8]): 1.62 s vs 1.92 s row-yield — ~2x on
        the marginal data path once the ~1.3 s fixed micro-batch cost
        is subtracted, and the gap widens with row width since the
        arrow path never materializes Python objects. Falls back to
        row-at-a-time tuples only if the declared columns do not
        match the file (never in the committed usage)."""
        if partition.kind == "empty":
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        if partition.kind == "delete-scoped":
            # read the (tiny) pairs artifact FIRST: a scoped DV names
            # only the files its update touched, so most of the
            # (prior file × artifact) partitions the planner emits
            # return here without ever opening their data file —
            # otherwise one MOR update on a 10k-file table would cost
            # 10k full data-file reads to discard 9,998 of them
            import pyarrow.compute as pc

            pairs = pq.read_table(partition.dv_file)
            pairs = pairs.filter(
                pc.equal(pairs["_dv_file"], partition.data_file)
            )
            if pairs.num_rows == 0:
                return

        tbl = pq.read_table(partition.data_file)
        if partition.kind == "delete" and partition.dv_file is not None:
            # DV-delete: only the file's rows matching the delete-vector
            # keys; a removed-file delete (dv_file=None) emits the whole
            # file as deletes.
            import pyarrow.compute as pc

            keys = pq.read_table(partition.dv_file)[self.key_col]
            mask = pc.is_in(tbl[self.key_col], value_set=keys.combine_chunks())
            tbl = tbl.filter(mask)
        elif partition.kind == "delete-scoped":
            # scoped-pair delete: only the pairs naming THIS file bite
            # (pairs for other files are other partitions' work; pairs
            # for dropped files are inert — snapshot_mor's semantics);
            # `pairs` was pre-filtered above, before the data read
            import pyarrow.compute as pc

            key_cols = [c for c in pairs.column_names if c != "_dv_file"]
            if len(key_cols) == 1:
                mask = pc.is_in(
                    tbl[key_cols[0]],
                    value_set=pairs[key_cols[0]].combine_chunks(),
                )
            else:
                doomed = set(zip(*(pairs[c].to_pylist() for c in key_cols)))
                mask = pa.array(
                    [
                        t in doomed
                        for t in zip(*(tbl[c].to_pylist() for c in key_cols))
                    ],
                    pa.bool_(),
                )
            tbl = tbl.filter(mask)
        ct = "insert" if partition.kind == "insert" else "delete"
        if set(self.columns) == set(tbl.column_names):
            n = tbl.num_rows
            arrays = [tbl[c].combine_chunks() for c in self.columns]
            arrays.append(pa.array([ct] * n, pa.string()))
            arrays.append(pa.array([partition.version] * n, pa.int32()))
            out = pa.table(
                arrays, names=[*self.columns, "_change_type", "_commit_version"]
            )
            yield from out.to_batches(max_chunksize=8192)
            return
        for row in zip(*(tbl[c].to_pylist() for c in tbl.column_names)):
            yield (*row, ct, partition.version)


class TableLogCdfSource(DataSource):
    """``spark.readStream.format("crs_tablelog_cdf")
    .option("path", base).option("schema", ddl).load()``"""

    @classmethod
    def name(cls) -> str:
        return "crs_tablelog_cdf"

    def schema(self) -> str:
        base = self.options["schema"]
        return f"{base}, _change_type string, _commit_version int"

    def streamReader(self, schema) -> TableLogCdfReader:
        cols = [
            f.strip().split()[0]
            for f in self.options["schema"].split(",")
            if f.strip()
        ]
        return TableLogCdfReader(
            self.options["path"], self.options.get("key_col", "event_id"), cols
        )
