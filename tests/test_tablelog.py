"""TableLog (operators/tablelog.py) commit-protocol invariants: CAS
conflict on racing writers, optimistic retry, orphan-file invisibility,
and snapshot stability across OPTIMIZE."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from chess_ratings_spark.operators.tablelog import CommitConflict, TableLog


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="crs_tablelog_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _tiny(spark, n=20, tag=0):
    return spark.range(n).select(
        (F.col("id") + 1000 * tag).alias("k"), F.lit(tag).alias("tag")
    )


def test_cas_conflict_and_retry(base, spark):
    log = TableLog(base)
    f1 = log._land(_tiny(spark, tag=1), n_files=1, tag="a")
    log.try_commit(0, f1, op="append")
    # a second writer racing to version 0 must lose, atomically
    with pytest.raises(CommitConflict):
        log.try_commit(0, f1, op="append")
    # the optimistic commit loop retries onto version 1
    f2 = log._land(_tiny(spark, tag=2), n_files=1, tag="b")
    v = log.commit(f1 + f2, op="append")
    assert v == 1
    assert log.versions() == [0, 1]
    # losing writer did not corrupt version 0's manifest
    assert log.read_manifest(0)["files"] == sorted(f1)


def test_orphan_files_invisible_to_snapshot(base, spark):
    log = TableLog(base)
    log.append(_tiny(spark, n=30, tag=1), n_files=2, tag="good")
    # a crashed writer's uncommitted file lands in the data dir
    orphan_src = log._land(_tiny(spark, n=99, tag=7), n_files=1, tag="scratch")
    Path(orphan_src[0]).rename(log.data_dir / "part-orphan.parquet")
    snap = log.snapshot(spark)
    assert snap.count() == 30  # orphan invisible
    naive = spark.read.parquet(str(log.data_dir))
    assert naive.count() > 30  # directory listing would see it


def test_optimize_preserves_content_and_history(base, spark):
    log = TableLog(base)
    for t in range(3):
        log.append(_tiny(spark, n=40, tag=t), n_files=4, tag=f"t{t}")
    assert len(log.read_manifest()["files"]) == 12
    before = {r.k for r in log.snapshot(spark).collect()}
    v = log.optimize(spark, target_rows_per_file=1_000)
    assert v == 3
    assert len(log.read_manifest()["files"]) == 1
    assert {r.k for r in log.snapshot(spark).collect()} == before
    # pre-OPTIMIZE snapshot still readable through the superseded files
    old = log.snapshot(spark, version=2)
    assert {r.k for r in old.collect()} == before
    assert len(set(old.inputFiles())) == 12


def test_stats_pruning_is_superset_and_exact(base, spark):
    log = TableLog(base)
    df = spark.range(80).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    log.append_range_bucketed(df, "k", width=10, tag="r")
    pruned, total, scanned = log.snapshot_pruned(spark, "k", 25, 44)
    assert total == 8
    assert scanned == 3  # buckets [20,30), [30,40), [40,50)
    got = sorted(r.k for r in pruned.collect())
    assert got == list(range(25, 45))  # exact filter still applied on top


def test_vacuum_keeps_live_drops_history(base, spark):
    log = TableLog(base)
    for t in range(2):
        log.append(_tiny(spark, n=30, tag=t), n_files=3, tag=f"t{t}")
    log.optimize(spark, target_rows_per_file=1_000)
    census = log.vacuum(retain_versions=1)
    assert census["n_removed"] == 6
    assert census["n_live"] == 1
    assert log.snapshot(spark).count() == 60  # live snapshot intact
    assert log.versions() == [0, 1, 2]  # log stays auditable
    with pytest.raises(Exception):
        log.snapshot(spark, version=0).count()  # history physically gone
