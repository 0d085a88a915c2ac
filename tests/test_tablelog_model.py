"""Model-based test of the TableLog commit protocol: random sequences
of table verbs (full-list append, sharded append, MOR delete,
OPTIMIZE, rewrite_manifests) are applied both to a real TableLog and
to a trivial in-memory model (a list of (version, live-key-set)
snapshots). After the sequence, the table's live merge-on-read state
must equal the model's final set, and time travel to EVERY recorded
version must reproduce that version's model set — across protocol
mixes and delete/compact interleavings no hand-written scenario
enumerates.

Protocol constraint honored by the generator: a single table uses ONE
append protocol (full-list or sharded, chosen per example) because the
two rebases carry different payload shapes; deletes/OPTIMIZE/compact
interleave freely where defined (OPTIMIZE reads m["files"], so it runs
on full-list tables; rewrite_manifests on sharded ones).
"""

from __future__ import annotations

from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chess_ratings_spark.operators.tablelog import TableLog

# op vocabulary: ("append", lo, hi) appends keys [lo, hi);
# ("delete", m) MOR-deletes live keys k where k % 5 == m;
# ("optimize"/"compact",) are metadata/layout verbs — model no-ops.
_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 9)),
        st.tuples(st.just("delete"), st.integers(0, 4)),
        st.tuples(st.just("maint"), st.just(0)),
    ),
    min_size=2,
    max_size=6,
)


@pytest.mark.parametrize("protocol", ["full", "sharded"])
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_tablelog_matches_model(spark, tmp_path_factory, protocol, ops):
    base = tmp_path_factory.mktemp("mdl")
    log = TableLog(base / "t")
    dv_dir = base / "dv"
    dv_dir.mkdir(exist_ok=True)

    model: set[int] = set()
    history: list[tuple[int, frozenset[int]]] = []
    n_dv = 0
    appended_any = False

    def live_df(version=None):
        m = log.read_manifest(version)
        df = log.snapshot(spark, version)
        for dv in m.get("delete_vectors", []):
            df = df.join(
                F.broadcast(spark.read.parquet(dv)), "k", "left_anti"
            )
        return df

    for i, (kind, arg) in enumerate(ops):
        if kind == "append":
            lo = arg * 20 + i * 200
            keys = set(range(lo, lo + 20))
            df = spark.range(lo, lo + 20).select(F.col("id").alias("k"))
            if protocol == "full":
                v = log.append(df, n_files=2, tag=f"a{i}")
            else:
                v = log.append_manifest_sharded(df, n_files=2, tag=f"a{i}")
            model |= keys
            appended_any = True
        elif kind == "delete" and appended_any:
            doomed = {k for k in model if k % 5 == arg}
            if not doomed:
                continue
            n_dv += 1
            p = str(dv_dir / f"d{n_dv}")
            spark.createDataFrame(
                [(k,) for k in sorted(doomed)], "k bigint"
            ).coalesce(1).write.parquet(p)
            m = log.read_manifest()
            extra = {
                "delete_vectors": m.get("delete_vectors", []) + [p]
            }
            if m.get("sharded"):
                extra.update(
                    {"manifest_shards": m["manifest_shards"], "sharded": True}
                )
            v = log.commit(m["files"], op="delete-mor", extra=extra)
            model -= doomed
        elif kind == "maint" and appended_any:
            if protocol == "full":
                v = log.optimize(spark, target_rows_per_file=1_000_000)
            else:
                v = log.compact_shards()
        else:
            continue
        history.append((v, frozenset(model)))

    if not history:
        return
    # final live state == model
    assert {r.k for r in live_df().collect()} == model
    # EVERY recorded version time-travels to its model set
    for v, expected in history:
        assert {r.k for r in live_df(v).collect()} == set(expected), (
            f"version {v} diverged from model"
        )
