"""Python DataSource WRITER (Spark 4, SPARK-45065 user-defined data
sources): a JSONL sink with a two-phase commit — the writer half of the
API surface ``sources/http_xml.py`` covers for reads.

Protocol (the same shape as every production sink, FileFormatWriter
included):

1. ``write(iterator)`` runs ONCE PER TASK on executors: each task
   streams its partition to a uniquely-named ``part-*.jsonl`` file and
   returns a :class:`WriterCommitMessage` naming the file and its row
   count. Task files are invisible to readers until committed.
2. The driver collects all commit messages and calls ``commit``: the
   manifest (file list + counts) is published with an exclusive-create
   open — the SAME atomic CAS primitive as ``operators/tablelog.py``,
   so a reader resolves either the full committed set or nothing.
   ``abort`` unlinks the orphaned task files instead.

A crashed/speculated task therefore leaves at most an uncommitted
``part-*`` file that manifest-resolved readers never see — exactly-once
publish semantics from at-least-once task attempts. At 100 TB the data
path is per-task streaming on executors; the driver handles only one
small message per task.
"""

from __future__ import annotations

import dataclasses
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST_NAME = "_MANIFEST.json"
EPOCH_PREFIX = "_epoch_"


def _publish_exclusive(path: str, payload: str) -> None:
    """Atomic full-content exclusive publish — the same CAS primitive
    as operators/tablelog.py's try_commit: serialize to an unadvertised
    temp file, then hard-link to the published name. link(2) fails
    EEXIST if the name is taken, and the name appears WITH its full
    content in one step. A plain ``open(path, "x")`` + write is not
    enough: the name becomes visible empty at create, and a concurrent
    ``read_manifest``/``read_epoch_manifests`` poll can read the torn
    window as a JSONDecodeError (the tablelog round-9 soak caught
    exactly this). Raises FileExistsError like ``open("x")`` did, so
    callers' replay/conflict handling is unchanged."""
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".pub_")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        os.link(tmp, path)  # EEXIST -> FileExistsError, name taken
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


@dataclasses.dataclass
class JsonlCommit(WriterCommitMessage):
    path: str
    n_rows: int


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, path: str, columns: list[str]) -> None:
        self.path = path
        self.columns = columns

    def write(self, iterator) -> JsonlCommit:
        os.makedirs(self.path, exist_ok=True)
        # task-temp + rename: a task that dies mid-write leaves only a
        # ``.tmp-*`` file that neither the manifest nor readers ever
        # reference (it produced no commit message for abort() to see);
        # the rename publishes the task file atomically on task success
        token = uuid.uuid4().hex
        tmp = os.path.join(self.path, f".tmp-{token}")
        fname = os.path.join(self.path, f"part-{token}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.columns, list(row)))))
                fh.write("\n")
                n += 1
        os.replace(tmp, fname)
        return JsonlCommit(path=fname, n_rows=n)

    def commit(self, messages) -> None:
        entries = sorted(
            ({"path": m.path, "n_rows": m.n_rows} for m in messages if m is not None),
            key=lambda e: e["path"],
        )
        payload = json.dumps(
            {"files": entries, "n_tasks": len(entries)}, indent=0
        )
        _publish_exclusive(os.path.join(self.path, MANIFEST_NAME), payload)

    def abort(self, messages) -> None:
        # Measured API fact (Spark 4.1 local): on job failure the Python
        # runner delivers ``[None, ...]`` here — successful tasks'
        # commit messages are NOT passed through, so per-message
        # unlinking is a no-op. Scrub the directory instead: without a
        # published manifest everything in it is uncommitted; if an
        # earlier job already published one (``mode("append")`` into a
        # used dir would have failed the exclusive-create anyway), its
        # files are kept.
        import glob

        keep: set[str] = set()
        mpath = os.path.join(self.path, MANIFEST_NAME)
        if os.path.exists(mpath):
            with open(mpath) as fh:
                keep = {f["path"] for f in json.load(fh)["files"]}
        # .pub_* mkstemp leftovers (crash between mkstemp and link in
        # _publish_exclusive) are never referenced by a manifest, so
        # unconditional unlink is safe (r13 ADVICE)
        for pat in ("part-*.jsonl", ".tmp-*", ".pub_*"):
            for f in glob.glob(os.path.join(self.path, pat)):
                if f not in keep:
                    try:
                        os.unlink(f)
                    except OSError:
                        pass


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming half of the manifest protocol (Spark 4
    ``DataSourceStreamWriter``): ``write`` stages one ``part-*`` file
    per task per micro-batch exactly like the batch writer; ``commit``
    publishes ``_epoch_<batchId>.json`` naming that batch's files.

    Exactly-once comes from IDEMPOTENT per-epoch commits, the contract
    Structured Streaming demands of every sink: after a driver crash
    the engine replays the last unacknowledged micro-batch with the
    SAME batchId, so a commit that finds its epoch manifest already
    published must treat the replay's freshly staged files as
    duplicates and unlink them instead of double-publishing. Readers
    resolve the union of epoch manifests — replayed/aborted/crashed
    task files are never visible. The driver-side cost is one small
    message per task per batch; the data path stays on executors."""

    def __init__(self, path: str, columns: list[str]) -> None:
        self.path = path
        self.columns = columns

    def write(self, iterator) -> JsonlCommit:
        os.makedirs(self.path, exist_ok=True)
        # same task-temp + rename publish as the batch writer: a task
        # death mid-write leaves only an unreferenced ``.tmp-*``
        token = uuid.uuid4().hex
        tmp = os.path.join(self.path, f".tmp-{token}")
        fname = os.path.join(self.path, f"part-{token}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.columns, list(row)))))
                fh.write("\n")
                n += 1
        os.replace(tmp, fname)
        return JsonlCommit(path=fname, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        entries = sorted(
            ({"path": m.path, "n_rows": m.n_rows} for m in messages if m is not None),
            key=lambda e: e["path"],
        )
        mpath = os.path.join(self.path, f"{EPOCH_PREFIX}{batchId}.json")
        payload = json.dumps(
            {"batch_id": batchId, "files": entries, "n_tasks": len(entries)},
            indent=0,
        )
        try:
            _publish_exclusive(mpath, payload)  # atomic CAS publish
        except FileExistsError:
            # epoch replay after a crash: the batch is already
            # committed — drop the duplicate staging, don't republish
            for e in entries:
                try:
                    os.unlink(e["path"])
                except OSError:
                    pass

    def abort(self, messages, batchId: int) -> None:
        # same measured API fact as the batch writer's abort: messages
        # arrive as [None, ...] on failure — scrub everything in the
        # dir that no published epoch manifest references
        import glob

        keep: set[str] = set()
        for m in glob.glob(os.path.join(self.path, f"{EPOCH_PREFIX}*.json")):
            with open(m) as fh:
                keep.update(f["path"] for f in json.load(fh)["files"])
        # .pub_* mkstemp leftovers (crash between mkstemp and link in
        # _publish_exclusive) are never referenced by a manifest, so
        # unconditional unlink is safe (r13 ADVICE)
        for pat in ("part-*.jsonl", ".tmp-*", ".pub_*"):
            for f in glob.glob(os.path.join(self.path, pat)):
                if f not in keep:
                    try:
                        os.unlink(f)
                    except OSError:
                        pass


class JsonlManifestSink(DataSource):
    """``df.write.format("crs_jsonl_sink").option("path", dir).save()``
    (batch, ``_MANIFEST.json``) and
    ``df.writeStream.format("crs_jsonl_sink")`` (streaming,
    ``_epoch_<batchId>.json`` per micro-batch) — one DataSource
    completing the Python DataSource write matrix."""

    @classmethod
    def name(cls) -> str:
        return "crs_jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlManifestWriter:
        return JsonlManifestWriter(
            self.options["path"], [f.name for f in schema.fields]
        )

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(
            self.options["path"], [f.name for f in schema.fields]
        )


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        return json.load(fh)


def read_epoch_manifests(path: str) -> list[dict]:
    """All published epoch manifests, in batchId order."""
    import glob

    out = []
    for m in glob.glob(os.path.join(path, f"{EPOCH_PREFIX}*.json")):
        with open(m) as fh:
            out.append(json.load(fh))
    return sorted(out, key=lambda d: d["batch_id"])
