"""Batch Python DataSource over a TableLog table — the third face of
the DataSource API surface (``tablelog_stream`` is the streaming
reader, ``jsonl_sink`` the two-phase-commit writer): a manifest-log
table readable through the STANDARD reader API,

    spark.read.format("crs_tablelog").option("path", base)
         .option("schema", ddl)[.option("version", n)].load()

with time travel as a plain reader option and merge-on-read semantics
applied inside the source (readers see live rows; the delete-vector
mechanics stay an implementation detail — exactly Delta's contract).

Planning is driver-side manifest metadata only: one
:class:`InputPartition` per data file (shard references resolved for
sharded manifests), each carrying the delete-vector paths of its
version so executors apply the anti-filter where the rows are read;
file-scoped pair artifacts are pre-grouped by the files they name (one
tiny single-column read per artifact, at plan time), so each partition
opens only the artifacts that can mask its rows.
``read`` yields Arrow RecordBatches reordered to the declared schema —
rows cross the Python/JVM boundary as Arrow buffers, never pickled
tuples (same measured ~2x marginal-path win as the streaming twin)."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class TableLogFilePartition(InputPartition):
    def __init__(
        self,
        data_file: str,
        dv_files: list[str],
        scoped_dv_files: list[str] | None = None,
    ):
        self.data_file = data_file
        self.dv_files = dv_files
        # FILE-SCOPED (file, key) pair artifacts (the round-11 MOR
        # UPDATE/MERGE mask) — applied per-partition where only the
        # pairs naming THIS file bite
        self.scoped_dv_files = scoped_dv_files or []


class TableLogBatchReader(DataSourceReader):
    def __init__(
        self, base: str, key_col: str, columns: list[str], version: int | None
    ) -> None:
        self.base = Path(base)
        self.key_col = key_col
        self.columns = columns
        self.version = version
        self.pushed: list = []

    def _maybe_push_filters(self, filters):
        """Filter pushdown (Spark 4.1 Python DataSource API): record
        the comparison filters we can evaluate against the manifest's
        per-file [min, max] stats, then hand EVERY filter back to
        Spark — stats skipping is a SUPERSET (a kept file may still
        hold non-matching rows), so the exact predicate must stay in
        the plan, exactly like parquet min/max row-group skipping.
        ``partitions()`` then plans only files whose recorded interval
        can satisfy all pushed comparisons."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        supported = (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )
        for f in filters:
            if isinstance(f, supported) and len(f.attribute) == 1:
                self.pushed.append(f)
            yield f

    def _stats_admit(self, stats: dict) -> bool:
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in self.pushed:
            col = f.attribute[0]
            if col not in stats:
                continue
            mn, mx = stats[col]
            v = f.value
            ok = (
                (mn <= v <= mx)
                if isinstance(f, EqualTo)
                else mx > v
                if isinstance(f, GreaterThan)
                else mx >= v
                if isinstance(f, GreaterThanOrEqual)
                else mn < v
                if isinstance(f, LessThan)
                else mn <= v
            )
            if not ok:
                return False
        return True

    def _manifest(self) -> dict:
        log_dir = self.base / "_log"
        v = self.version
        if v is None:
            vs = sorted(int(p.stem) for p in log_dir.glob("*.json"))
            if not vs:
                raise FileNotFoundError(f"no commits in {log_dir}")
            v = vs[-1]
        return json.loads((log_dir / f"{v:020d}.json").read_text())

    def partitions(self):
        m = self._manifest()
        if m.get("sharded"):
            files: list[str] = []
            for s in m.get("manifest_shards", []):
                files.extend(json.loads(Path(s).read_text())["files"])
            files.sort()
        else:
            files = m["files"]
        stats = {e["path"]: e["stats"] for e in m.get("file_stats", [])}
        if self.pushed:
            files = [
                f
                for f in files
                if f not in stats or self._stats_admit(stats[f])
            ]
        dvs = list(m.get("delete_vectors", []))
        scoped = list(m.get("delete_vectors_scoped", []))
        # Pre-group scoped pair artifacts by the files they name
        # (round-11 ADVICE): planning reads ONLY each artifact's
        # _dv_file column, once, driver-side — so a table with many
        # stacked MOR commits costs O(artifacts) tiny reads at plan
        # time instead of O(files x artifacts) re-reads inside every
        # partition, and a partition whose file no artifact names
        # skips the DV machinery entirely.
        by_file: dict[str, list[str]] = {}
        if scoped:
            import pyarrow.parquet as pq

            for dv in scoped:
                for f in set(
                    pq.read_table(dv, columns=["_dv_file"])
                    .column("_dv_file")
                    .to_pylist()
                ):
                    by_file.setdefault(f, []).append(dv)
        return [
            TableLogFilePartition(f, dvs, by_file.get(f, [])) for f in files
        ]

    def read(self, partition: TableLogFilePartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.data_file)
        for dv in partition.dv_files:
            keys = pq.read_table(dv)[self.key_col]
            mask = pc.is_in(tbl[self.key_col], value_set=keys.combine_chunks())
            tbl = tbl.filter(pc.invert(mask))
        for dv in partition.scoped_dv_files:
            # scoped pairs mask (file, key): planning already grouped
            # artifacts by the files they name, so every artifact here
            # has pairs for THIS file — but one artifact can name many
            # files, so the per-file filter still applies (exactly
            # snapshot_mor's join semantics, applied per partition)
            pairs = pq.read_table(dv)
            pairs = pairs.filter(
                pc.equal(pairs["_dv_file"], partition.data_file)
            )
            if pairs.num_rows == 0:
                continue
            key_cols = [c for c in pairs.column_names if c != "_dv_file"]
            if len(key_cols) == 1:
                mask = pc.is_in(
                    tbl[key_cols[0]],
                    value_set=pairs[key_cols[0]].combine_chunks(),
                )
                tbl = tbl.filter(pc.invert(mask))
            else:
                # composite keys: Arrow hash anti-join (is_in has no
                # struct kernel in this pyarrow) — vectorized, replaces
                # the former Python to_pylist tuple-set loop. The join
                # does not guarantee row order, so carry a row index
                # and restore file order after.
                idx = pa.array(range(tbl.num_rows), pa.int64())
                doomed = pa.table(
                    {c: pairs[c].combine_chunks() for c in key_cols}
                )
                tbl = (
                    tbl.append_column("__crs_row_idx", idx)
                    .join(doomed, keys=key_cols, join_type="left anti")
                    .sort_by("__crs_row_idx")
                    .drop_columns(["__crs_row_idx"])
                )
        if set(self.columns) == set(tbl.column_names):
            out = pa.table(
                [tbl[c].combine_chunks() for c in self.columns],
                names=list(self.columns),
            )
            yield from out.to_batches(max_chunksize=8192)
            return
        for row in zip(*(tbl[c].to_pylist() for c in tbl.column_names)):
            yield row


class TableLogPushdownReader(TableLogBatchReader):
    """Batch reader variant that OPTS IN to Spark 4.1 Python-source
    filter pushdown (gated engine-side behind
    ``spark.sql.python.filterPushdown.enabled`` because planning calls
    into Python; merely DEFINING pushFilters trips the gate, so the
    plain reader does not carry the method at all). Selected via
    ``.option("pushdown", "true")``."""

    def pushFilters(self, filters):
        return self._maybe_push_filters(filters)


class TableLogBatchSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crs_tablelog"

    def schema(self) -> str:
        return self.options["schema"]

    def reader(self, schema) -> TableLogBatchReader:
        cols = [
            f.strip().split()[0]
            for f in self.options["schema"].split(",")
            if f.strip()
        ]
        v = self.options.get("version")
        cls = (
            TableLogPushdownReader
            if self.options.get("pushdown", "false").lower() == "true"
            else TableLogBatchReader
        )
        return cls(
            self.options["path"],
            self.options.get("key_col", "event_id"),
            cols,
            int(v) if v is not None else None,
        )
