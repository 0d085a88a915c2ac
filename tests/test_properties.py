"""Property-based spot checks (SURVEY.md §5.2): operator laws on
arbitrary small inputs via hypothesis. Spark jobs are slow per-example,
so examples are capped low — these are law checks, not fuzzing."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chess_ratings_spark import ingest
from chess_ratings_spark.functions import scalar
from chess_ratings_spark.operators import setops

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # key
        st.sampled_from(["F", "M", "x", None]),  # sex-ish
        st.integers(min_value=0, max_value=2030),  # birthday with 0 sentinel
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(data=rows)
def test_recode_then_null_semantics(spark, data):
    """recode_map maps declared keys, NULLs everything else; sentinel 0
    → NULL — for every input row."""
    df = spark.createDataFrame(data, "k long, sex string, birthday long")
    out = df.select(
        "k",
        "sex",
        "birthday",
        scalar.recode_map("sex", ingest.SEX_CODES).alias("code"),
        scalar.sentinel_to_null("birthday", 0).alias("by"),
    ).collect()
    for r in out:
        expected = {"F": 0, "M": 1}.get(r.sex)
        assert r.code == expected
        assert r.by == (None if r.birthday == 0 else r.birthday)


@SLOW
@given(data=rows)
def test_dedup_idempotent(spark, data):
    """op(op(x)) == op(x) for deterministic keep-first dedup."""
    df = spark.createDataFrame(data, "k long, sex string, birthday long")
    order = [F.col("sex").asc_nulls_last(), F.col("birthday")]
    once = setops.dedup_keep_first(df, keys=["k"], order=order)
    twice = setops.dedup_keep_first(once, keys=["k"], order=order)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.select("k").distinct().count() == once.count()


@SLOW
@given(data=rows)
def test_union_missing_columns_commutes_with_backfill(spark, data):
    """unionByName(allowMissingColumns) ≡ add-missing-columns-then-union
    (the reference's schema normalization, ingest_web_to_gcs.py:26-37)."""
    full = spark.createDataFrame(data, "k long, sex string, birthday long")
    partial = full.drop("sex")
    from collections import Counter

    a = setops.union_snapshots(full, partial)
    b = full.unionByName(
        scalar.add_missing_columns(partial, {"sex": "string"}).select(
            "k", "sex", "birthday"
        )
    )
    assert Counter(map(tuple, a.collect())) == Counter(map(tuple, b.collect()))


@SLOW
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)), min_size=1, max_size=12
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40), st.integers(0, 99)),
        max_size=12,
    ),
)
def test_asof_join_matches_brute_force(spark, left, right):
    """asof_join == the quadratic reference: per left row, the value of
    the latest right row with ts' <= ts on the same key (ties match)."""
    from chess_ratings_spark.operators.joins import asof_join

    rmap = {(k, t): v for k, t, v in right}  # unique (key, ts) per side
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "id long, k long, ts long"
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rmap.items()], "k long, ts long, v long"
    )
    out = {
        r.id: r.v
        for r in asof_join(
            ldf, rdf, key="k", left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        eligible = [(t2, v) for (k2, t2), v in rmap.items() if k2 == k and t2 <= t]
        expected = max(eligible)[1] if eligible else None
        assert out[i] == expected


@SLOW
@given(
    missing=st.sets(st.sampled_from(["sex", "birthday"]), max_size=2),
    data=rows,
)
def test_add_missing_commutes_on_random_schemas(spark, missing, data):
    """For ANY subset of dropped columns, unionByName(allowMissing) ≡
    add-missing-then-union — randomized-schema generalization of the
    fixed-schema test above."""
    from collections import Counter

    full = spark.createDataFrame(data, "k long, sex string, birthday long")
    partial = full.drop(*missing)
    a = setops.union_snapshots(full, partial)
    required = {"sex": "string", "birthday": "long"}
    b = full.unionByName(
        scalar.add_missing_columns(partial, {c: required[c] for c in missing}).select(
            "k", "sex", "birthday"
        )
    )
    assert Counter(map(tuple, a.collect())) == Counter(map(tuple, b.collect()))


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=4, max_size=10).map(" ".join),
        min_size=2,
        max_size=10,
    ),
    dup_of=st.integers(min_value=0, max_value=9),
)
def test_lsh_dedup_is_idempotent(spark, texts, dup_of):
    """Removing the right side of every verified near-dup pair leaves a
    corpus on which the SAME LSH pipeline finds zero pairs — dedup at
    the LSH layer is a fixpoint after one application (signatures are
    per-doc and deterministic, so a subset can't grow new candidates)."""
    from chess_ratings_spark.operators.similarity import verified_jaccard_pairs

    docs = list(texts)
    docs.append(docs[dup_of % len(docs)] + " a")  # planted near-dup
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    pairs = verified_jaccard_pairs(df, tau=0.6).collect()
    drop = {r.doc_b for r in pairs}
    survivors = df.filter(~F.col("doc_id").isin(drop))
    again = verified_jaccard_pairs(survivors, tau=0.6).collect()
    assert again == []


@SLOW
@given(y=st.integers(min_value=2000, max_value=2099), m=st.integers(min_value=1, max_value=12))
def test_month_code_and_url_total(spark, y, m):
    """month_code is total on 1-12 and the URL embeds exactly the
    two-digit year + code (ingest_web_to_gcs.py:40-57)."""
    df = spark.createDataFrame([(y, m)], "y int, m int")
    r = df.select(
        scalar.month_code("m").alias("code"),
        scalar.ratings_url(F.lit("blitz"), F.col("y"), F.col("m")).alias("url"),
    ).collect()[0]
    assert r.code == scalar.MONTH_CODES[m - 1]
    assert r.url == f"https://ratings.fide.com/download/blitz_{r.code}{str(y)[-2:]}frl_xml.zip"


texts_strategy = st.lists(
    st.lists(
        st.sampled_from("alpha beta gamma delta eps zeta eta theta".split()),
        min_size=1,
        max_size=40,
    ).map(" ".join),
    min_size=1,
    max_size=12,
)


@SLOW
@given(texts=texts_strategy)
def test_chunking_covers_every_token(spark, texts):
    """Width-32/stride-24 chunking laws on arbitrary corpora: chunk
    index contiguity from 0, (n_chunks-1)*stride + last_len == tokens,
    and every non-final chunk is full-width (min(32, remaining))."""
    df = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, n_chars long",
    )
    chunks = df.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(floor((size(split(text, ' ')) - 1) / 24) as int)), "
                "i -> slice(split(text, ' '), i * 24 + 1, 32))"
            )
        ).alias("chunk_idx", "chunk"),
    ).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    for i, t in enumerate(texts):
        n_tokens = len(t.split(" "))
        got = sorted(by_doc[i])
        assert [c[0] for c in got] == list(range(len(got)))
        assert (len(got) - 1) * 24 + len(got[-1][1]) == n_tokens
        for idx, chunk in got:
            assert len(chunk) == min(32, n_tokens - idx * 24)


@SLOW
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=60, unique=True)
)
def test_hash_split_partitions_the_keyspace(spark, keys):
    """md5 hash-split laws: buckets are disjoint, complete, and stable
    under corpus growth (a subset's assignment never changes)."""
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    c = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(c <= "b", "train").when(c <= "d", "val").otherwise("test")
    assign = {r.doc_id: r.split for r in df.select("doc_id", split.alias("split")).collect()}
    assert set(assign) == set(keys)
    half = keys[: max(1, len(keys) // 2)]
    sub = spark.createDataFrame([(k,) for k in half], "doc_id long")
    assign_sub = {
        r.doc_id: r.split for r in sub.select("doc_id", split.alias("split")).collect()
    }
    assert all(assign[k] == assign_sub[k] for k in half)


@SLOW
@given(
    arrs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd", ""]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_max_multiplicity_matches_naive(spark, arrs):
    """The sorted-run fold equals the naive O(distinct x n) definition
    for every array (including empty -> 0 and repeated empty strings) —
    the law that justified the ~50x rewrite of the Gopher top-count."""
    from chess_ratings_spark.operators.text import max_multiplicity

    df = spark.createDataFrame([(i, a) for i, a in enumerate(arrs)], "i long, arr array<string>")
    naive = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(F.col("arr")),
                lambda x: F.size(F.filter(F.col("arr"), lambda y: y == x)),
            )
        ),
        F.lit(0),
    )
    rows = df.select(max_multiplicity(F.col("arr")).alias("fast"), naive.alias("slow")).collect()
    for r in rows:
        assert r.fast == r.slow


@SLOW
@given(
    toks=st.lists(st.sampled_from(["a", "b", "cc", "d"]), min_size=0, max_size=15),
    width=st.integers(min_value=2, max_value=3),
)
def test_sliding_concat_matches_per_position_definition(spark, toks, width):
    """sliding_concat (shifted-slice zip_with fold) equals the literal
    per-position definition [join(toks[i:i+w]) for i] — the law behind
    the 6x n-gram hot-path rewrite. min_size=0 deliberately covers
    len(toks) < width, where the clamped n_out must yield [] rather
    than a negative-length slice error."""
    from chess_ratings_spark.operators.text import sliding_concat

    df = spark.createDataFrame([(toks,)], "arr array<string>")
    got = df.select(sliding_concat(F.col("arr"), width).alias("g")).collect()[0]["g"]
    want = [" ".join(toks[i : i + width]) for i in range(max(0, len(toks) - width + 1))]
    assert got == want


ops = st.lists(
    st.sampled_from(["append_a", "append_b", "optimize"]),
    min_size=1,
    max_size=4,
)


import pytest as _pytest


@_pytest.mark.parametrize("backend", ["local", "objectstore"])
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seq=ops)
def test_tablelog_snapshot_isolation_under_op_sequences(spark, backend, seq):
    """Snapshot-isolation law: for ANY sequence of appends/OPTIMIZEs,
    (a) every version's snapshot content is exactly the multiset of
    rows appended up to that version (OPTIMIZE changes files, never
    content), and (b) re-reading an old version after later ops
    returns what it returned when it was latest. Parametrized over the
    local link(2) backend AND the conditional-PUT object-store
    emulation (round 15) — the law must be backend-independent, which
    is the substance of the DESIGN.md object-store mapping."""
    import shutil
    import tempfile

    from chess_ratings_spark.operators.tablelog import TableLog

    from .test_tablelog import ObjectStoreLog

    base = tempfile.mkdtemp(prefix="crs_tablelog_prop_")
    try:
        log = TableLog(base) if backend == "local" else ObjectStoreLog(base)
        tag_rows = {
            "append_a": [(i, "a") for i in range(5)],
            "append_b": [(100 + i, "b") for i in range(3)],
        }
        expected: list[tuple] = []
        per_version: dict[int, list[tuple]] = {}
        nth = 0
        for op in seq:
            if op == "optimize":
                if log.latest_version() is None:
                    continue  # nothing to compact yet
                v = log.optimize(spark, target_rows_per_file=1000)
            else:
                nth += 1
                rows_ = [(k + 1000 * nth, t) for k, t in tag_rows[op]]
                df = spark.createDataFrame(rows_, "k long, tag string")
                v = log.append(df, n_files=2, tag=f"{op}{nth}")
                expected = expected + rows_
            per_version[v] = list(expected)
        for v, want in per_version.items():
            got = sorted((r.k, r.tag) for r in log.snapshot(spark, v).collect())
            assert got == sorted(want), f"version {v}"
    finally:
        shutil.rmtree(base, ignore_errors=True)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    rights=st.lists(st.integers(0, 50), min_size=0, max_size=8),
)
def test_asof_nearest_matches_bruteforce(spark, lefts, rights):
    """asof_join_nearest vs a Python brute force on one key: for every
    left ts, the chosen right row must minimize |delta| with ties
    going backward (at-or-before), lag must be the winning |delta|,
    and unmatched rows must report direction 'none'."""
    from chess_ratings_spark.operators.joins import asof_join_nearest

    rset = sorted(set(rights))
    left = spark.createDataFrame(
        [(i, 7, t) for i, t in enumerate(lefts)], "lid int, k int, ts bigint"
    )
    right = spark.createDataFrame(
        [(7, t, t * 10) for t in rset], "k int, ts bigint, val bigint"
    )
    got = {
        r["lid"]: (r["val"], r["asof_direction"], r["asof_lag"])
        for r in asof_join_nearest(
            left, right, key="k", left_ts="ts", right_ts="ts",
            value_cols=["val"],
        ).collect()
    }
    for i, t in enumerate(lefts):
        if not rset:
            assert got[i] == (None, "none", None)
            continue
        back = max((r for r in rset if r <= t), default=None)
        fwd = min((r for r in rset if r >= t), default=None)
        if back is not None and (fwd is None or t - back <= fwd - t):
            assert got[i] == (back * 10, "backward", t - back)
        else:
            assert got[i] == (fwd * 10, "forward", fwd - t)


_wall_ts = st.datetimes(
    min_value=__import__("datetime").datetime(1970, 1, 2),
    max_value=__import__("datetime").datetime(2100, 1, 1),
)


@SLOW
@given(walls=st.lists(_wall_ts, min_size=1, max_size=12))
def test_micros_from_ntz_matches_python_everywhere(spark, walls):
    """tables._MICROS_FROM_NTZ must equal the pure-python epoch micros
    for ARBITRARY wall times — including DST-gap walls — under a DST
    session zone (round-10 fix: timestampdiff on NTZ operands consults
    the session zone inside spring-forward gaps)."""
    import datetime as dt

    from chess_ratings_spark import tables

    df = spark.createDataFrame(
        [(w,) for w in walls], schema="ts timestamp_ntz"
    ).select(F.expr(tables._MICROS_FROM_NTZ.format(ts="ts")).alias("us"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = sorted(r.us for r in df.collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    want = sorted(
        int((w - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1))
        for w in walls
    )
    assert got == want


ragged_embeddings = st.lists(
    st.lists(
        st.floats(
            min_value=-100.0,
            max_value=100.0,
            allow_nan=False,
            width=32,
        ),
        min_size=0,  # empties allowed anywhere, incl. trailing
        max_size=7,
    ),
    min_size=1,
    max_size=20,
)


@SLOW
@given(embs=ragged_embeddings)
def test_map_in_arrow_norms_match_duckdb_on_ragged_lists(spark, embs):
    """The mapInArrow L2-norm kernel is bit-identical to DuckDB's
    left-to-right list_sum on ARBITRARY ragged float32 lists — the
    empty-segment exclusion (round-14 ADVICE) must hold wherever the
    empties land, and non-empty segments adjacent to them must keep
    the exact reduceat sums."""
    import duckdb

    import chess_ratings_spark.plans  # noqa: F401
    from chess_ratings_spark.plans.analytics import udf_map_in_arrow
    from chess_ratings_spark.registry import REGISTRY

    import pathlib
    import tempfile

    with tempfile.TemporaryDirectory(prefix="crs_prop_mia_") as d:
        spark.createDataFrame(
            [(i, e) for i, e in enumerate(embs)],
            "vec_id long, embedding array<float>",
        ).write.parquet(d + "/embeddings.parquet")
        got = [
            (r.vec_id, r.dim, r.norm_micro)
            for r in udf_map_in_arrow(spark, d).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet/*.parquet')"
        )
        want = [
            tuple(r)
            for r in con.execute(REGISTRY["udf_map_in_arrow"].oracle).fetchall()
        ]
        con.close()
    assert got == want
