"""Unit tests for operator semantics that the oracle can't fully pin
down: LSH-vs-brute-force equality, as-of tie handling, dedup
determinism (SURVEY.md §5.2)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from chess_ratings_spark.operators import joins, setops, similarity

from .conftest import SF_SMOKE


def test_signbit_lsh_equals_brute_force(spark):
    """sim_join_threshold's LSH candidates + exact verify must equal the
    brute-force all-pairs answer. The driver fixture has no cos≥0.9
    pairs (max pairwise ≈ 0.48), so recall mechanics are proven on
    constructed vectors with planted near-duplicates."""
    import math

    def unit(seed: int) -> list[float]:
        # deterministic pseudo-random unit vector
        vals = [math.sin(seed * 131 + j * 17.0) for j in range(64)]
        n = math.sqrt(sum(v * v for v in vals))
        return [v / n for v in vals]

    rows = []
    for i in range(30):
        rows.append((i, unit(i)))
    # planted near-dups: tiny perturbation of vectors 3 and 7
    for j, base in ((100, 3), (101, 7)):
        v = unit(base)
        v[0] += 0.01
        rows.append((j, v))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    lsh = {
        (r.id_a, r.id_b): r.cos
        for r in similarity.signbit_lsh_pairs(e, tau=0.9).collect()
    }
    a, b = e.alias("a"), e.alias("b")
    brute = {
        (r.id_a, r.id_b): r.cos
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            similarity.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
        )
        .filter(F.col("cos") >= 0.9)
        .collect()
    }
    assert lsh == brute
    assert {(3, 100), (7, 101)} <= set(brute)


def test_sim_join_threshold_empty_on_fixture(spark):
    """On the raw driver fixture (max pairwise cosine ≈ 0.48) the τ=0.9
    threshold join must return exactly nothing — and so must brute
    force, keeping the two in agreement."""
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert similarity.signbit_lsh_pairs(e, tau=0.9).count() == 0


def test_sim_join_threshold_planted_corpus_matches_brute_force(spark):
    """The REGISTERED sim_join_threshold corpus (fixture + planted
    near-dups) must be non-vacuous and exactly equal brute force: one
    pair per planted vector, nothing else."""
    from chess_ratings_spark.plans.llm_tier import _with_planted_neardups

    e = _with_planted_neardups(spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet"))
    lsh = {
        (r.id_a, r.id_b): round(r.cos, 12)
        for r in similarity.signbit_lsh_pairs(e, tau=0.9).collect()
    }
    a, b = e.alias("a"), e.alias("b")
    brute = {
        (r.id_a, r.id_b): round(r.cos, 12)
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            similarity.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
        )
        .filter(F.col("cos") >= 0.9)
        .collect()
    }
    assert lsh == brute
    assert len(lsh) > 0
    # every planted copy pairs with its source and sits at cos ≈ 0.999+
    assert all(id_b == id_a + 10_000_000 for id_a, id_b in lsh)
    assert all(c > 0.99 for c in lsh.values())


def test_minhash_lsh_equals_inverted_index(spark):
    """MinHash-LSH verified pairs == exact inverted-index jaccard pairs."""
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    lsh = {
        (r.doc_a, r.doc_b)
        for r in similarity.verified_jaccard_pairs(d, tau=0.8).collect()
    }
    sh = similarity.shingle_sets(d)
    ex = sh.select("doc_id", "n_sh", F.explode("sh").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    exact = {
        (r.doc_a, r.doc_b)
        for r in common.filter(
            F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            >= 0.8
        ).collect()
    }
    assert lsh == exact
    assert len(exact) > 0, "fixture should contain planted near-dup documents"


def test_verified_jaccard_broadcast_fallback(spark):
    """broadcast_limit=0 forces the plain shuffle-join verify path; it
    must produce exactly the broadcast path's answer (the guard changes
    physical strategy, never results)."""
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    key = lambda rows: {(r.doc_a, r.doc_b): round(r.jaccard, 12) for r in rows}  # noqa: E731
    via_broadcast = key(similarity.verified_jaccard_pairs(d, tau=0.8).collect())
    via_shuffle = key(
        similarity.verified_jaccard_pairs(d, tau=0.8, broadcast_limit=0).collect()
    )
    assert via_broadcast == via_shuffle
    assert len(via_broadcast) > 0


def test_asof_join_tie_and_null_semantics(spark):
    """Equal timestamps match (>=); rows before any right row get NULL;
    latest-not-future row wins."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    left = spark.createDataFrame(
        [(1, 1, ts(0)), (2, 1, ts(10)), (3, 1, ts(25)), (4, 2, ts(5))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(1, ts(10), 100.0), (1, ts(20), 200.0), (2, ts(50), 900.0)],
        "user_id long, ts timestamp_ntz, v double",
    )
    out = {
        r.event_id: r.v
        for r in joins.asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 200.0, 4: None}


def test_dedup_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b", 3.0), (1, "a", 2.0), (1, "a", 1.0), (2, "z", 9.0)],
        "k long, s string, v double",
    )
    out = setops.dedup_keep_first(df, keys=["k"], order=[F.col("s"), F.col("v")])
    rows = {(r.k): (r.s, r.v) for r in out.collect()}
    assert rows == {1: ("a", 1.0), 2: ("z", 9.0)}


def test_union_missing_columns_null_fill(spark):
    a = spark.createDataFrame([(1, "x")], "id long, extra string")
    b = spark.createDataFrame([(2,)], "id long")
    out = setops.union_snapshots(a, b).orderBy("id").collect()
    assert [r.extra for r in out] == ["x", None]


def test_connected_components_chain_triangle_pair(spark):
    """Label propagation must find true components on shapes that need
    transitivity: a 4-chain (1-2-3-4), a triangle (10,11,12), and an
    isolated pair (20,21)."""
    from chess_ratings_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_path_graph_worst_case_diameter(spark):
    """20 chained pairs (a 21-node path graph — worst-case diameter for
    label propagation) must converge within the default max_iter for
    BOTH variants, with every node labeled by the path minimum."""
    from chess_ratings_spark.operators.graph import (
        connected_components,
        connected_components_twostar,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 21)], "doc_a long, doc_b long"
    )
    want = {n: 1 for n in range(1, 22)}
    got_lp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got_lp == want
    got_ts = {
        r.node: r.component
        for r in connected_components_twostar(pairs).collect()
    }
    assert got_ts == want


def test_twostar_matches_label_propagation_on_random_graph(spark):
    """Property check: on a random sparse graph the two-star contraction
    and label propagation must produce identical component labelings."""
    import random

    from chess_ratings_spark.operators.graph import (
        connected_components,
        connected_components_twostar,
    )

    rng = random.Random(7)
    edges = sorted(
        {
            tuple(sorted(rng.sample(range(100), 2)))
            for _ in range(60)
        }
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got_lp = {r.node: r.component for r in connected_components(pairs).collect()}
    got_ts = {
        r.node: r.component
        for r in connected_components_twostar(pairs).collect()
    }
    assert got_ts == got_lp


def test_auto_band_plan_growth_bounds():
    """The corpus-adaptive sign-LSH plan must (a) keep predicted
    background candidates within the per-vector budget at every scale,
    (b) keep the true-pair miss probability under target, and (c) grow
    r monotonically with n (measured 1/10/50x table in DESIGN.md)."""
    import math

    from chess_ratings_spark.operators.similarity import auto_band_plan

    tau, bg, target_miss, cand_per_n = 0.9, 0.53, 0.005, 8.0
    p = 1 - math.acos(tau) / math.pi
    prev_r = 0
    for n in [2_020, 20_200, 101_000, 1_000_000, 100_000_000]:
        n_bits, b = auto_band_plan(n, tau)
        r = n_bits // b
        assert r >= prev_r, f"r shrank at n={n}"
        prev_r = r
        # background collisions: b bands x n^2/2 x bg^r
        bg_cands = b * n * n / 2 * bg**r
        assert bg_cands <= cand_per_n * n * 1.01, f"budget blown at n={n}"
        miss = (1 - p**r) ** b
        assert miss <= target_miss, f"miss {miss:.4f} at n={n}"
    # fixture scale keeps the measured-good floor plan
    assert auto_band_plan(2_020, tau) == (16 * 61, 61)


def test_simhash_chunk_blocking_is_exact_for_budget():
    """Pigeonhole guarantee: any 64-bit pair within hamming ≤ 6 shares
    at least one identical chunk under the 7-chunk layout — including
    spreads that defeat the old 4×16 blocking (bits touching all 4
    quarters)."""
    import random

    from chess_ratings_spark.operators.similarity import _simhash_chunk_layout

    layout = _simhash_chunk_layout(6)
    assert len(layout) == 7
    assert sum(w for _, w in layout) == 64

    rng = random.Random(0)
    for trial in range(500):
        h = rng.randint(1, 6)
        bits = rng.sample(range(64), h)
        a = rng.getrandbits(64)
        b = a
        for bit in bits:
            b ^= 1 << bit
        assert any(
            (a >> off) & ((1 << w) - 1) == (b >> off) & ((1 << w) - 1)
            for off, w in layout
        ), f"trial {trial}: hamming-{h} pair missed by every chunk"


def test_simhash_finds_planted_near_dups(spark):
    """The planted ~0.99-jaccard doc pairs must also be close in
    simhash space (hamming <= 6 with default chunking)."""
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pairs = similarity.simhash_near_pairs(d, max_hamming=6).collect()
    assert len(pairs) > 0
    assert all(r.hamming <= 6 for r in pairs)


def test_ivf_recall_and_determinism(spark):
    """IVF at the default geometry (k-means seeds, 6-of-32 probes,
    rep=3 corpus replication) must clear the certified 0.75 recall@5
    floor on the near-uniform fixture and be exactly deterministic."""
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 100 == 0)
    ivf1 = {(r.qid, r.cid, r.rank) for r in similarity.ivf_topk(e, q, k=5).collect()}
    ivf2 = {(r.qid, r.cid, r.rank) for r in similarity.ivf_topk(e, q, k=5).collect()}
    assert ivf1 == ivf2
    bf = {(r.qid, r.cid) for r in similarity.brute_force_topk(q, e, k=5).collect()}
    recall = len({(a, b) for a, b, _ in ivf1} & bf) / len(bf)
    assert recall >= 0.75


def test_capped_shingle_index_prunes_hot_key_keeps_true_pairs(spark):
    """A boilerplate shingle shared by every document must be dropped
    by the df cap (killing its quadratic join bucket), while a planted
    near-dup pair — whose overlap rides on informative shingles —
    survives with its capped-universe Jaccard intact."""
    boiler = "click here to subscribe"
    rows = [(i, f"unique{i} token{i} filler{i} more{i} {boiler}") for i in range(40)]
    rows.append((100, "alpha beta gamma delta epsilon zeta " + boiler))
    rows.append((101, "alpha beta gamma delta epsilon zeta " + boiler))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = similarity.shingle_sets(docs)
    capped = similarity.capped_shingle_index(sh, df_cap=10)
    postings = capped.collect()
    # the two shingles fully inside the boilerplate run (df=42) must be
    # dropped; boundary shingles like "more7 click here" are per-doc
    # unique (df<=2) and survive — the cap only kills the hot keys
    hot = {r.s for r in postings} & {"click here to", "here to subscribe"}
    assert hot == set()
    pair = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .collect()
    )
    assert {(r.da, r.db) for r in pair} == {(100, 101)}
    r = pair[0]
    assert r.inter / (r.na + r.nb - r.inter) == 1.0  # identical over capped universe


def test_kmeans_cells_shape_and_convergence(spark):
    """The k-means quantizer keeps exactly n_cells unit seeds of the
    embedding dimensionality, and training tightens the cells: mean
    best-cosine to the nearest seed must not decrease vs the init."""
    import numpy as np

    from chess_ratings_spark.operators.similarity import kmeans_cells

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.vstack(e.select("embedding").toPandas()["embedding"].to_numpy())
    X = X / np.linalg.norm(X, axis=1, keepdims=True)

    init = kmeans_cells(e, n_cells=8, iters=0)
    trained = kmeans_cells(e, n_cells=8, iters=3)
    assert trained.shape == (8, X.shape[1])
    assert np.allclose(np.linalg.norm(trained, axis=1), 1.0)
    assert (X @ trained.T).max(1).mean() >= (X @ init.T).max(1).mean()


def test_distribution_shape_matches_builtin_moments(spark):
    """The exact-power-sum g1/g2 (agg_distribution_shape) must agree
    with Spark's builtin skewness/kurtosis on the same centi-grid
    values to well under one e6 grid cell — guards the central-moment
    expansion against algebra slips."""
    import chess_ratings_spark.plans  # noqa: F401
    from chess_ratings_spark.registry import REGISTRY

    got = {
        r.l_returnflag: r
        for r in REGISTRY["agg_distribution_shape"].fn(spark, SF_SMOKE).collect()
    }
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    ref = {
        r.l_returnflag: r
        for r in li.select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100).alias("vc"),
        )
        .groupBy("l_returnflag")
        .agg(F.skewness("vc").alias("g1"), F.kurtosis("vc").alias("g2"))
        .collect()
    }
    assert set(got) == set(ref) and len(got) == 3
    for flag, row in got.items():
        assert abs(row.skew_g1_e6 - ref[flag].g1 * 1e6) < 1.0, flag
        assert abs(row.kurt_g2_e6 - ref[flag].g2 * 1e6) < 1.0, flag


def test_merge_upsert_evolve_widens_and_updates(spark):
    """WITH SCHEMA EVOLUTION contract: source-only columns are added to
    the merged schema; untouched target rows read NULL, matched rows
    take the source value (including explicit NULL), inserts land
    fully populated."""
    from chess_ratings_spark.operators import maintenance

    t = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, seg string, bal double",
    )
    s = spark.createDataFrame(
        [(2, "B", 200.0, "GOLD"), (4, "D", 0.0, None)],
        "k int, seg string, bal double, tier string",
    )
    out = maintenance.merge_upsert_evolve(
        t, s, key="k", update_cols=["seg", "bal"]
    )
    assert out.columns == ["k", "seg", "bal", "tier"]
    rows = {r["k"]: (r["seg"], r["bal"], r["tier"]) for r in out.collect()}
    assert rows == {
        1: ("a", 10.0, None),      # untouched: NULL for the new column
        2: ("B", 200.0, "GOLD"),   # matched: updated incl. evolved col
        3: ("c", 30.0, None),
        4: ("D", 0.0, None),       # insert with explicit NULL tier
    }


def test_normal_equations_match_numpy_lstsq(spark):
    """The Cramer-determinant solve must agree with an independent
    numpy least-squares fit on the same fixture — guards against a
    shared formula error the Spark/DuckDB textual-twin oracle cannot
    see (both engines would be identically wrong)."""
    import numpy as np

    from chess_ratings_spark.plans.analytics import ml_normal_equations
    from .conftest import SF_SMOKE

    row = ml_normal_equations(spark, SF_SMOKE).collect()[0]
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).toPandas()
    x1 = li["l_quantity"].to_numpy(dtype=np.float64)
    x2 = np.floor(li["l_discount"].to_numpy(dtype=np.float64) * 100)
    y = np.floor(li["l_extendedprice"].to_numpy(dtype=np.float64))
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    got = np.array(
        [row["beta0_e6"], row["beta1_e6"], row["beta2_e6"]], dtype=np.float64
    ) / 1e6
    # truncating e6 grid => within 1e-6 absolute of the float solve
    # plus the lstsq solver's own tolerance on this conditioning
    assert np.allclose(got, beta, atol=1e-4), (got, beta)
    resid = y - X @ beta
    sst = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float((resid**2).sum()) / sst
    assert abs(row["r2_e6"] / 1e6 - r2) < 1e-4


def test_rolling_median_matches_pandas(spark):
    """win_median_rolling vs pandas' rolling median on the same
    fixture: med2 must equal 2x the rolling(7, min_periods=1) median
    of the centi values for every row of a sampled user."""
    import numpy as np

    from chess_ratings_spark.plans.analytics import win_median_rolling
    from .conftest import SF_SMOKE

    out = win_median_rolling(spark, SF_SMOKE).toPandas()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    ev["vc"] = np.floor(ev["value"] * 100).astype("int64")
    for uid in sorted(ev["user_id"].unique())[:5]:
        g = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
        exp = (
            g["vc"].rolling(7, min_periods=1).median() * 2
        ).to_numpy()
        got = (
            out[out["user_id"] == uid]
            .sort_values("event_id")
            .set_index("event_id")
            .loc[g["event_id"]]["med2_centi"]
            .to_numpy()
        )
        assert np.array_equal(got.astype("float64"), exp), uid


def test_kcore_peel_total_collapse(spark):
    """kcore_peel must survive the fixpoint degenerating to EMPTY: a k
    above every degree peels everything in round 1 and every later
    round runs degree/semi-joins over zero-row frames."""
    from chess_ratings_spark import tables
    from chess_ratings_spark.operators.graph import kcore_peel

    edges = tables.local_table(
        spark,
        [(1, 2), (2, 3), (3, 4)],  # a path: max degree 2
        [("src", "bigint"), ("dst", "bigint")],
    )
    out = {r["round"]: r for r in kcore_peel(edges, k=3, rounds=3).collect()}
    assert set(out) == {1, 2, 3}
    for r in (1, 2, 3):
        assert (out[r]["n_nodes"], out[r]["n_edges"]) == (0, 0), r


def test_kcore_peel_stable_core(spark):
    """A clique IS its own k-core for k = size-1: nothing peels and
    the census is constant from round 1."""
    from itertools import combinations

    from chess_ratings_spark import tables
    from chess_ratings_spark.operators.graph import kcore_peel

    nodes = list(range(1, 6))
    edges = tables.local_table(
        spark,
        list(combinations(nodes, 2)),
        [("src", "bigint"), ("dst", "bigint")],
    )
    out = kcore_peel(edges, k=4, rounds=2).collect()
    for r in out:
        assert (r["n_nodes"], r["n_edges"]) == (5, 10)


def test_map_in_arrow_empty_embeddings_degrade_to_null(spark, tmp_path):
    """Round-14 ADVICE: zero-length embedding rows must not hard-fail
    the mapInArrow norm kernel. Mid-batch AND trailing empties emit
    dim=0 / norm_micro=NULL — exactly DuckDB's list_sum([]) answer —
    while non-empty rows keep the bit-exact reduceat result."""
    import duckdb

    import chess_ratings_spark.plans  # noqa: F401
    from chess_ratings_spark.registry import REGISTRY

    rows = [
        (1, [3.0, 4.0]),
        (2, []),  # mid-batch empty
        (3, [1.5, -2.25, 0.5]),
        (4, []),  # trailing empty (the old reduceat IndexError case)
    ]
    fixture = str(tmp_path / "doctored")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(fixture + "/embeddings.parquet")

    got = [
        (r.vec_id, r.dim, r.norm_micro)
        for r in REGISTRY["udf_map_in_arrow"].fn(spark, fixture).collect()
    ]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{fixture}/embeddings.parquet/*.parquet')"
    )
    want = [tuple(r) for r in con.execute(
        REGISTRY["udf_map_in_arrow"].oracle
    ).fetchall()]
    assert got == want
    assert got[1][1:] == (0, None) and got[3][1:] == (0, None)
