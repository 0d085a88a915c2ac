"""Minimal snapshot-isolation table format on plain parquet — the
multi-version extension of the single-shot manifest proved by
``sink_manifest_atomic`` (plans/corpus.py).

Design (the core of what Delta Lake / Iceberg formalize, reduced to the
two mechanisms that give snapshot isolation):

- **Commit log**: ``<table>/_log/{version:020d}.json``, one JSON
  manifest per version holding the FULL list of live data files for
  that snapshot (Iceberg-style snapshot manifest; simpler than Delta's
  add/remove deltas and O(versions) only in the log dir, never in a
  read).
- **CAS publish**: a commit is ``open(log_path, "x")`` — POSIX
  exclusive create. Two writers racing to version N: exactly one
  syscall succeeds, the loser gets ``FileExistsError``, re-reads the
  latest snapshot, and retries on top (optimistic concurrency). On a
  real object store this maps to the same primitive every lakehouse
  uses (S3 conditional PUT / GCS generation-match).
- **Snapshot read / time travel**: readers resolve ONE manifest and
  scan exactly its files — uncommitted/orphan data files in the
  directory are invisible, and ``AS OF version`` is just resolving an
  older manifest. Compaction (OPTIMIZE) rewrites live data into fewer
  files and commits the new list as the next version; superseded files
  stay on disk so older snapshots remain readable (vacuum would prune
  them past a retention horizon).

At 100 TB none of this touches the driver with data: manifests carry
file names and stats (bytes here; per-column min/max in a production
format feed scan pruning), commits are O(1) metadata operations, and
every read is a normal pruned parquet scan over the manifest's files.

Parity intent (not a port): re-expresses the BigQuery-warehouse role of
the reference's ``terraform/main.tf:36-40`` as an executable local
table format.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer published this version first; retry on the new
    latest snapshot."""


class TableLog:
    """A parquet table with a versioned manifest log under
    ``<base>/_log``. Data files live flat under ``<base>/data``."""

    def __init__(self, base: str | Path) -> None:
        self.base = Path(base)
        self.log_dir = self.base / "_log"
        self.data_dir = self.base / "data"
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.data_dir.mkdir(parents=True, exist_ok=True)

    # -- log primitives ---------------------------------------------------

    def _manifest_path(self, version: int) -> Path:
        return self.log_dir / f"{version:020d}.json"

    def versions(self) -> list[int]:
        return sorted(int(p.stem) for p in self.log_dir.glob("*.json"))

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def read_manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(f"no commits in {self.log_dir}")
        return json.loads(self._manifest_path(version).read_text())

    def try_commit(self, version: int, files: list[str], op: str) -> None:
        """Publish ``version`` or raise :class:`CommitConflict`. The
        exclusive-create open IS the atomic compare-and-swap: the
        manifest appears fully written or not at all (written to the
        final name in one small write; a torn write of a tiny JSON is
        not a failure mode worth a temp+rename dance locally, and on an
        object store the conditional PUT is already all-or-nothing)."""
        payload = json.dumps(
            {"version": version, "op": op, "files": sorted(files)}, indent=0
        )
        try:
            with open(self._manifest_path(version), "x") as fh:
                fh.write(payload)
        except FileExistsError:
            raise CommitConflict(f"version {version} already committed") from None

    def commit(self, files: list[str], op: str, max_retries: int = 10) -> int:
        """Optimistic-concurrency commit loop: read latest, attempt
        next version, on conflict re-read and retry."""
        for _ in range(max_retries + 1):
            latest = self.latest_version()
            nxt = 0 if latest is None else latest + 1
            try:
                self.try_commit(nxt, files, op)
                return nxt
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {max_retries} retries")

    # -- table verbs ------------------------------------------------------

    def _land(self, df: DataFrame, n_files: int, tag: str) -> list[str]:
        """Write ``df`` as exactly ``n_files`` parquet files into the
        data dir (write to a scratch dir, then hard-link into place
        under unique names — data files are immutable once named)."""
        import shutil
        import tempfile

        scratch = Path(tempfile.mkdtemp(prefix="crs_tablelog_"))
        try:
            df.repartition(n_files).write.mode("overwrite").parquet(str(scratch / "w"))
            out: list[str] = []
            parts = sorted((scratch / "w").glob("*.parquet"))
            for i, p in enumerate(parts):
                dst = self.data_dir / f"{tag}-{i:05d}.parquet"
                shutil.copy(p, dst)
                out.append(str(dst))
            return out
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def append(self, df: DataFrame, n_files: int, tag: str) -> int:
        """Land new data files, then commit previous snapshot + new
        files as the next version."""
        new = self._land(df, n_files, tag)
        latest = self.latest_version()
        prev = self.read_manifest(latest)["files"] if latest is not None else []
        return self.commit(prev + new, op="append")

    def optimize(self, spark: SparkSession, target_rows_per_file: int = 50_000) -> int:
        """Committed OPTIMIZE: read the live snapshot, rewrite it into
        ceil(n/target) right-sized files, commit the compacted list as
        the next version. Old files stay for time travel."""
        live = self.read_manifest()["files"]
        df = spark.read.parquet(*live)
        n_rows = df.count()
        n_out = max(1, math.ceil(n_rows / target_rows_per_file))
        latest = self.latest_version()
        new = self._land(df, n_out, tag=f"optimize-v{latest + 1}")
        return self.commit(new, op="optimize")

    def snapshot(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read (time travel when ``version`` is given):
        resolve ONE manifest, scan exactly its files."""
        return spark.read.parquet(*self.read_manifest(version)["files"])

    # -- file statistics / data skipping ----------------------------------

    def append_range_bucketed(
        self, df: DataFrame, bucket_col: str, width: int, tag: str
    ) -> int:
        """Land ``df`` as one file per ``bucket_col`` range bucket
        (bucket i = values in [i*width, (i+1)*width)), recording each
        file's [min, max] of ``bucket_col`` in the manifest — the
        per-file stats every lakehouse manifest carries. Stats come
        from ONE grouped aggregation over the input (executor-side;
        the driver sees n_buckets scalar triples), and ALL buckets
        land in ONE partitioned write: repartition on the bucket key
        routes each bucket to exactly one task, so every
        ``partitionBy`` dir holds exactly one part file (the previous
        per-bucket filter+write loop ran n_buckets sequential jobs —
        measured 5.3 s -> ~1.5 s on the 18-bucket partition-evolution
        query)."""
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        b = df.withColumn(
            "__bucket", (F.col(bucket_col) / width).cast("int")
        )
        stats = {
            int(r["__bucket"]): (int(r["mn"]), int(r["mx"]))
            for r in b.groupBy("__bucket")
            .agg(F.min(bucket_col).alias("mn"), F.max(bucket_col).alias("mx"))
            .collect()
        }
        scratch = Path(tempfile.mkdtemp(prefix="crs_tablelog_"))
        entries: list[dict] = []
        files: list[str] = []
        try:
            (
                b.repartition(len(stats), "__bucket")
                .write.partitionBy("__bucket")
                .mode("overwrite")
                .parquet(str(scratch / "w"))
            )
            for i in sorted(stats):
                parts = sorted((scratch / "w" / f"__bucket={i}").glob("*.parquet"))
                assert len(parts) == 1, f"bucket {i}: {len(parts)} files"
                dst = self.data_dir / f"{tag}-b{i:04d}.parquet"
                shutil.copy(parts[0], dst)
                files.append(str(dst))
                mn, mx = stats[i]
                entries.append({"path": str(dst), "stats": {bucket_col: [mn, mx]}})
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        latest = self.latest_version()
        prev_manifest = (
            self.read_manifest(latest) if latest is not None else {"files": []}
        )
        version = self.commit(prev_manifest["files"] + files, op="append")
        # stats ride in the same manifest file, keyed by path
        m = self.read_manifest(version)
        m["file_stats"] = prev_manifest.get("file_stats", []) + entries
        self._manifest_path(version).write_text(json.dumps(m, indent=0))
        return version

    def snapshot_pruned(
        self, spark: SparkSession, col: str, lo: int, hi: int,
        version: int | None = None,
    ) -> tuple[DataFrame, int, int]:
        """Data skipping from manifest stats: scan ONLY files whose
        recorded [min, max] of ``col`` overlaps [lo, hi] (the exact
        predicate is still applied on top — stats pruning must be a
        superset). Returns (frame, files_total, files_scanned)."""
        from pyspark.sql import functions as F

        m = self.read_manifest(version)
        stats = {e["path"]: e["stats"][col] for e in m.get("file_stats", [])}
        keep = [
            p for p in m["files"]
            if p not in stats or (stats[p][0] <= hi and stats[p][1] >= lo)
        ]
        df = spark.read.parquet(*keep).filter(F.col(col).between(lo, hi))
        return df, len(m["files"]), len(keep)

    # -- retention --------------------------------------------------------

    def vacuum(self, retain_versions: int = 1) -> dict:
        """Physically delete data files not referenced by the newest
        ``retain_versions`` manifests (their log entries stay, so
        history is auditable even when no longer readable — Delta's
        VACUUM semantics). Returns a census dict. Pure metadata diff +
        unlink loop; no data moves."""
        import os

        versions = self.versions()
        keep_vs = versions[-retain_versions:]
        live: set[str] = set()
        for v in keep_vs:
            live.update(self.read_manifest(v)["files"])
        all_files = {str(p) for p in self.data_dir.glob("*.parquet")}
        dead = sorted(all_files - live)
        for p in dead:
            os.unlink(p)
        return {
            "n_live": len(live),
            "n_removed": len(dead),
            "retained_versions": keep_vs,
        }
