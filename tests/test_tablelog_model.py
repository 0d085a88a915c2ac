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
# ("maint",) is a layout verb — full-list OPTIMIZE or sharded
#   compaction (round 11: sharded "maint" alternates between
#   rewrite_manifests and the r10 data-file _optimize_sharded, so the
#   state machine covers both sharded maintenance paths);
# ("update", m) is a COW value rewrite of keys k % 7 == m (round 11:
#   key-preserving, so the live-set model is unchanged — what it tests
#   is that the file swap through update_cow never loses or duplicates
#   rows across delete/optimize interleavings and stays time-travelable);
# ("umor", m) is the MOR twin via file-scoped delete vectors
#   (update_mor, round 11): old versions masked by (file, k) pairs,
#   identical rows re-appended — also a live-set no-op, exercising
#   pair survival through deletes/COW and materialization by OPTIMIZE;
# ("merge", m) is a MOR MERGE (merge_mor, round 11): source = the live
#   keys k % 7 == m re-asserted (masks their old versions, appends
#   identical ones — live-set no-op) PLUS 5 brand-new keys (the model
#   gains them), all in one commit — exercising mixed update+insert
#   upserts interleaved with deletes/COW/OPTIMIZE and time travel over
#   the resulting scoped-DV stacks;
# ("mfull", a) is the THREE-clause MERGE (round 12,
#   merge_mor(delete_unmatched=...)): source re-asserts live keys
#   k % 7 == a//5 and inserts 5 fresh keys, while the clause
#   "k % 5 == a%5" reaps unmatched live keys — the model loses the
#   doomed set and gains the inserts in ONE commit, interleaved with
#   every other verb and time-traveled like the rest;
# ("race", m) runs the protocol's layout verb with a CONCURRENT append
#   injected between its manifest read and its commit (the
#   OPTIMIZE-vs-append rebase): the append's keys enter the model, and
#   the rebase must carry them — a lost-update here is exactly the bug
#   class the round-10 verdict asked the state machine to cover.
# All maintenance verbs are model no-ops for the live set.
_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 9)),
        st.tuples(st.just("delete"), st.integers(0, 4)),
        st.tuples(st.just("maint"), st.integers(0, 1)),
        st.tuples(st.just("update"), st.integers(0, 6)),
        st.tuples(st.just("umor"), st.integers(0, 6)),
        st.tuples(st.just("merge"), st.integers(0, 6)),
        st.tuples(st.just("mfull"), st.integers(0, 34)),
        st.tuples(st.just("race"), st.integers(0, 9)),
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
        # snapshot_mor applies BOTH DV kinds (global key lists and the
        # round-11 file-scoped pairs the "umor" op attaches)
        return log.snapshot_mor(spark, version)

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
            if "delete_vectors_scoped" in m:  # carry umor's pairs
                extra["delete_vectors_scoped"] = m["delete_vectors_scoped"]
            if m.get("sharded"):
                extra.update(
                    {"manifest_shards": m["manifest_shards"], "sharded": True}
                )
            v = log.commit(m["files"], op="delete-mor", extra=extra)
            model -= doomed
        elif kind == "maint" and appended_any:
            if protocol == "full":
                v = log.optimize(spark, target_rows_per_file=1_000_000)
            elif arg == 0:
                v = log.compact_shards()
            else:  # sharded DATA-file compaction (r10 verb)
                v = log.optimize(spark, target_rows_per_file=1_000_000)
        elif kind == "update" and appended_any and protocol == "full":
            # COW rewrite, key-preserving (identity assignment — the
            # model's frames carry only `k`): live set unchanged, but
            # the file swap must not lose/duplicate rows or break
            # time travel across delete/optimize interleavings
            v = log.update_cow(
                spark, f"k % 7 = {arg}", {"k": "k"}
            )["version"]
        elif kind == "umor" and appended_any and protocol == "full":
            # MOR rewrite (round-11 scoped-DV path), key-preserving:
            # old versions masked by (file, k) pairs, identical rows
            # re-appended — live set unchanged, but the masks must
            # survive deletes/COW and be materialized by OPTIMIZE
            res = log.update_mor(spark, f"k % 7 = {arg}", {"k": "k"}, ["k"])
            if res["n_matched"] == 0:
                continue  # no commit happened
            v = res["version"]
        elif kind == "merge" and appended_any and protocol == "full":
            # MOR MERGE: re-assert k % 7 == arg (masked + re-appended,
            # live-set no-op) and insert 5 fresh keys in one commit
            upd = sorted(k for k in model if k % 7 == arg)
            lo = 200_000 + arg * 20 + i * 200
            ins = list(range(lo, lo + 5))
            src = spark.createDataFrame(
                [(k,) for k in upd + ins], "k bigint"
            )
            res = log.merge_mor(spark, src, ["k"])
            assert res["n_updated"] == len(upd)
            assert res["n_inserted"] == len(ins)
            v = res["version"]
            model |= set(ins)
        elif kind == "mfull" and appended_any and protocol == "full":
            # 3-clause MERGE: upsert k % 7 == um + 5 inserts, and the
            # delete-unmatched clause reaps k % 5 == dm among the
            # UNMATCHED live keys — one commit, one scoped-DV artifact
            um, dm = arg // 5, arg % 5
            upd = sorted(k for k in model if k % 7 == um)
            lo = 300_000 + arg * 20 + i * 200
            ins = list(range(lo, lo + 5))
            src = spark.createDataFrame(
                [(k,) for k in upd + ins], "k bigint"
            )
            doomed = {k for k in model if k % 7 != um and k % 5 == dm}
            res = log.merge_mor(
                spark, src, ["k"], delete_unmatched=f"k % 5 = {dm}"
            )
            assert res["n_updated"] == len(upd)
            assert res["n_inserted"] == len(ins)
            assert res["n_deleted"] == len(doomed)
            v = res["version"]
            model = (model - doomed) | set(ins)
        elif kind == "race" and appended_any:
            lo = 100_000 + arg * 20 + i * 200
            raced_keys = set(range(lo, lo + 20))
            rdf = spark.range(lo, lo + 20).select(
                F.col("id").alias("k"), F.lit(99).alias("tag")
            )
            orig = log.try_commit
            state = {"raced": False}

            def racy(version, files, op, extra=None, *, _rdf=rdf, _i=i):
                if not state["raced"] and op == "optimize":
                    state["raced"] = True
                    if protocol == "full":
                        log.append(_rdf, n_files=1, tag=f"race{_i}")
                    else:
                        log.append_manifest_sharded(
                            _rdf, n_files=1, tag=f"race{_i}"
                        )
                return orig(version, files, op, extra)

            log.try_commit = racy
            try:
                v = log.optimize(spark, target_rows_per_file=1_000_000)
            finally:
                log.try_commit = orig
            model |= raced_keys  # the rebase must carry the racer
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


# branch/restore vocabulary: main appends, MOR deletes, RESTORE to a
# random earlier version, branch staging (fork-on-first-use + append),
# and publish (fast-forward where main is unmoved since the fork, else
# a REQUIRED CommitConflict).
_branch_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 9)),
        st.tuples(st.just("delete"), st.integers(0, 4)),
        st.tuples(st.just("restore"), st.integers(0, 9)),
        st.tuples(st.just("branch"), st.integers(0, 9)),
        st.tuples(st.just("publish"), st.just(0)),
    ),
    min_size=3,
    max_size=8,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_branch_ops)
def test_tablelog_branch_restore_matches_model(spark, tmp_path_factory, ops):
    """Model-based check of the round-8 verbs: RESTORE must land main
    exactly on the chosen historical set, branch staging must never
    leak into main, fast-forward publish must land exactly the staged
    set, a diverged-fork publish must raise CommitConflict and leave
    main untouched, and EVERY main version (including post-restore and
    post-publish ones) must time-travel to its recorded model set."""
    from chess_ratings_spark.operators.tablelog import CommitConflict

    base = tmp_path_factory.mktemp("brmdl")
    log = TableLog(base / "t")
    dv_dir = base / "dv"
    dv_dir.mkdir(exist_ok=True)

    model: set[int] = set()
    history: list[tuple[int, frozenset[int]]] = []
    branch = None  # (TableLog handle, model set, fork main-version)
    n_dv = 0
    n_br = 0

    def live_df(lg, version=None):
        m = lg.read_manifest(version)
        df = lg.snapshot(spark, version)
        for dv in m.get("delete_vectors", []):
            df = df.join(
                F.broadcast(spark.read.parquet(dv)), "k", "left_anti"
            )
        return df

    for i, (kind, arg) in enumerate(ops):
        if kind == "append":
            lo = arg * 20 + i * 200
            keys = set(range(lo, lo + 20))
            v = log.append(
                spark.range(lo, lo + 20).select(F.col("id").alias("k")),
                n_files=2,
                tag=f"a{i}",
            )
            model |= keys
            history.append((v, frozenset(model)))
        elif kind == "delete" and history:
            doomed = {k for k in model if k % 5 == arg}
            if not doomed:
                continue
            n_dv += 1
            p = str(dv_dir / f"d{n_dv}")
            spark.createDataFrame(
                [(k,) for k in sorted(doomed)], "k bigint"
            ).coalesce(1).write.parquet(p)
            m = log.read_manifest()
            v = log.commit(
                m["files"],
                op="delete-mor",
                extra={"delete_vectors": m.get("delete_vectors", []) + [p]},
            )
            model -= doomed
            history.append((v, frozenset(model)))
        elif kind == "restore" and history:
            tgt_v, tgt_set = history[arg % len(history)]
            v = log.restore(tgt_v)
            model = set(tgt_set)
            history.append((v, frozenset(model)))
        elif kind == "branch" and history:
            if branch is None:
                n_br += 1
                br = log.create_branch(f"b{n_br}")
                branch = [br, set(model), log.latest_version()]
            lo = 100_000 + arg * 20 + i * 200
            keys = set(range(lo, lo + 20))
            branch[0].append(
                spark.range(lo, lo + 20).select(F.col("id").alias("k")),
                n_files=2,
                tag=f"b{i}",
            )
            branch[1] |= keys
            # staging must be invisible to main
            assert {r.k for r in live_df(log).collect()} == model
        elif kind == "publish" and branch is not None:
            br, br_model, fork_v = branch
            if log.latest_version() == fork_v:
                v = log.fast_forward(br, "staged")
                model = set(br_model)
                history.append((v, frozenset(model)))
            else:
                with pytest.raises(CommitConflict):
                    log.fast_forward(br, "staged")
                # a rejected publish must leave main untouched
                assert {r.k for r in live_df(log).collect()} == model
            branch = None

    if not history:
        return
    assert {r.k for r in live_df(log).collect()} == model
    for v, expected in history:
        assert {r.k for r in live_df(log, v).collect()} == set(expected), (
            f"main version {v} diverged from model"
        )


# checkpoint vocabulary (sharded protocol, where checkpoints matter):
# appends, rewrite_manifests compactions, RESTOREs to random earlier
# versions (both rewrite the shard list, invalidating checkpoints),
# and checkpoint writes at arbitrary points. Invariant after EVERY op:
# resolve_files_via_checkpoint returns exactly resolve_files' set —
# used_checkpoint may flip false (stale), correctness never flips.
_ckpt_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 9)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("restore"), st.integers(0, 9)),
        st.tuples(st.just("checkpoint"), st.just(0)),
    ),
    min_size=3,
    max_size=8,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ckpt_ops)
def test_checkpoint_resolution_always_matches_full_walk(
    spark, tmp_path_factory, ops
):
    """Model-based check of the round-9 checkpoint path: across random
    interleavings of sharded appends, rewrite_manifests, RESTOREs and
    checkpoint writes, checkpointed resolution must return the exact
    full-walk file inventory at every step (falling back silently when
    a manifest rewrite staled the checkpoint), and the live snapshot
    must equal the key-set model — a stale checkpoint may cost shard
    reads, never rows."""
    from chess_ratings_spark.operators.tablelog import CommitConflict

    base = tmp_path_factory.mktemp("ckmdl")
    log = TableLog(base / "t")
    model: set[int] = set()
    history: list[tuple[int, frozenset[int]]] = []
    appended_any = False

    for i, (kind, arg) in enumerate(ops):
        if kind == "append":
            lo = arg * 20 + i * 200
            df = spark.range(lo, lo + 20).select(F.col("id").alias("k"))
            v = log.append_manifest_sharded(df, n_files=2, tag=f"a{i}")
            model |= set(range(lo, lo + 20))
            appended_any = True
        elif kind == "compact" and appended_any:
            v = log.compact_shards()
        elif kind == "restore" and history:
            v_to, m_to = history[arg % len(history)]
            v = log.restore(v_to)
            model = set(m_to)
        elif kind == "checkpoint" and appended_any:
            log.write_checkpoint(spark)  # sidecar: no version, no entry
            continue
        else:
            continue
        history.append((v, frozenset(model)))
        files, census = log.resolve_files_via_checkpoint(spark)
        assert files == log.resolve_files(), (
            f"op {i} ({kind}): checkpointed inventory diverged"
        )
        assert {r.k for r in spark.read.parquet(*files).collect()} == model


# COW UPDATE vs a pure-Python model on arbitrary key sets, bucket
# widths and predicate ranges: the stats-overlap file targeting must
# (a) produce exactly the model's post-update rows, (b) rewrite
# exactly the buckets whose ACTUAL [min,max] overlaps the range, and
# (c) leave v0 time travel byte-intact.
_keys = st.lists(st.integers(0, 99), min_size=1, max_size=60)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=_keys,
    width=st.sampled_from([5, 10, 25]),
    lo=st.integers(0, 99),
    span=st.integers(0, 40),
)
def test_update_cow_matches_model(spark, tmp_path_factory, keys, width, lo, span):
    hi = min(99, lo + span)
    base = tmp_path_factory.mktemp("cow")
    log = TableLog(base / "t")
    df = spark.createDataFrame([(k, 0) for k in keys], "k bigint, v bigint")
    log.append_range_bucketed(df, "k", width, tag="b")

    res = log.update_cow(
        spark, f"k BETWEEN {lo} AND {hi}", {"v": "v + 1000"},
        prune_col="k", prune_lo=lo, prune_hi=hi,
    )
    # (a) logical result == model (multiset: duplicate keys all update)
    expected = sorted((k, 1000 if lo <= k <= hi else 0) for k in keys)
    got = sorted((r.k, r.v) for r in log.snapshot(spark).collect())
    assert got == expected
    # (b) rewritten files == buckets whose actual range overlaps
    buckets = {}
    for k in keys:
        b = k // width
        mn, mx = buckets.get(b, (k, k))
        buckets[b] = (min(mn, k), max(mx, k))
    overlap = sum(1 for mn, mx in buckets.values() if mn <= hi and mx >= lo)
    assert res["files_rewritten"] == overlap
    assert res["files_carried"] == len(buckets) - overlap
    assert res["n_matched"] == sum(1 for k in keys if lo <= k <= hi)
    # (c) v0 intact
    assert sorted((r.k, r.v) for r in log.snapshot(spark, 0).collect()) == sorted(
        (k, 0) for k in keys
    )
