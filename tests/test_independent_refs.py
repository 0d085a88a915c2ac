"""Independent-reference cross-checks for round-8 analytics queries.

The registry's DuckDB oracles are textual twins of the Spark plans —
they prove both engines compute the SAME thing, not that the thing is
RIGHT. These tests recompute each result with an unrelated
implementation (numpy expansion, pandas brute force, pure-Python BPE)
so a shared derivation error would be caught. Same pattern as
test_normal_equations_match_numpy_lstsq / test_rolling_median_matches_pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from chess_ratings_spark import tables

from .conftest import SF_SMOKE


def test_weighted_percentile_matches_numpy_inverted_cdf(spark):
    """agg_weighted_percentile's cumulative-threshold picks must equal
    numpy's inverted-CDF percentiles on the weight-EXPANDED value list
    (each value repeated l_quantity times) — a definitionally different
    route to the same lower weighted median / p90."""
    from chess_ratings_spark.plans.analytics import agg_weighted_percentile

    out = {
        r["l_returnflag"]: r
        for r in agg_weighted_percentile(spark, SF_SMOKE).collect()
    }
    li = (
        tables.load(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    li["vc"] = np.floor(li["l_extendedprice"].astype(float) * 100).astype(
        "int64"
    )
    li["w"] = li["l_quantity"].astype("int64")
    assert set(out) == set(li["l_returnflag"].unique())
    for flag, g in li.groupby("l_returnflag"):
        expanded = np.repeat(g["vc"].to_numpy(), g["w"].to_numpy())
        row = out[flag]
        assert row["total_weight"] == int(g["w"].sum())
        assert row["wmedian_centi"] == int(
            np.percentile(expanded, 50, method="inverted_cdf")
        ), flag
        assert row["wp90_centi"] == int(
            np.percentile(expanded, 90, method="inverted_cdf")
        ), flag


def test_entropy_gini_match_numpy(spark):
    """agg_entropy_gini vs the textbook definitions computed directly
    from probabilities: H = -sum(p ln p), Gini-Simpson = 1 - sum(p^2).
    The plan's algebra (ln n - sum(c ln c)/n; (n^2-sum c^2)/n^2) is a
    different factorization; floors truncate downward by < ~2e-6."""
    from chess_ratings_spark.plans.analytics import agg_entropy_gini

    out = {r["source"]: r for r in agg_entropy_gini(spark, SF_SMOKE).collect()}
    d = (
        tables.load(spark, SF_SMOKE, "documents")
        .select("source", "lang")
        .toPandas()
    )
    for source, g in d.groupby("source"):
        c = g["lang"].value_counts().to_numpy().astype(float)
        p = c / c.sum()
        h = float(-(p * np.log(p)).sum())
        gini = float(1.0 - (p * p).sum())
        row = out[source]
        assert row["n_langs"] == len(c)
        assert row["n"] == int(c.sum())
        # floor/trunc grids only ever round DOWN (all terms positive);
        # the float reference itself can sit ~1 ulp below the exact
        # rational the plan truncates, hence the tiny negative slack
        assert -1e-9 <= gini - row["gini_e6"] / 1e6 < 2e-6, source
        assert abs(row["entropy_e6"] / 1e6 - h) < 1e-5, source


def test_ohlc_matches_pandas_groupby(spark):
    """ts_resample_ohlc vs a pandas groupby over the same 6h buckets:
    open/close picked by idxmin/idxmax over the (ts, event_id) order,
    high/low/volume/amount as plain per-group reductions."""
    from chess_ratings_spark.plans.timeseries import _BAR_US, ts_resample_ohlc

    out = ts_resample_ohlc(spark, SF_SMOKE).toPandas()
    ev = tables.load(spark, SF_SMOKE, "events").toPandas()
    ev["vc"] = np.floor(ev["value"].astype(float) * 100).astype("int64")
    ev["bar"] = (
        ev["ts"].astype("datetime64[us]").astype("int64") // _BAR_US
    )
    ev = ev.sort_values(["ts", "event_id"]).reset_index(drop=True)
    exp_rows = {}
    for (et, bar), g in ev.groupby(["event_type", "bar"]):
        exp_rows[(et, int(bar))] = (
            int(g["vc"].iloc[0]),
            int(g["vc"].max()),
            int(g["vc"].min()),
            int(g["vc"].iloc[-1]),
            len(g),
            int(g["vc"].sum()),
        )
    got_rows = {
        (r.event_type, int(r.bar)): (
            int(r.open),
            int(r.high),
            int(r.low),
            int(r.close),
            int(r.volume),
            int(r.amount),
        )
        for r in out.itertuples()
    }
    assert got_rows == exp_rows


def test_cumulative_distinct_matches_bruteforce_pandas(spark):
    """win_cumulative_distinct's first-occurrence-attribution rewrite vs
    the literal definition: for each output (type, day), the number of
    distinct users seen in events of that type with date <= day."""
    from chess_ratings_spark.plans.analytics import win_cumulative_distinct

    out = win_cumulative_distinct(spark, SF_SMOKE).toPandas()
    ev = tables.load(spark, SF_SMOKE, "events").toPandas()
    ev["day"] = ev["ts"].to_numpy().astype("datetime64[D]")
    for r in out.itertuples():
        day = np.datetime64(r.day)
        sub = ev[ev["event_type"] == r.event_type]
        assert r.cum_users == sub[sub["day"] <= day]["user_id"].nunique(), (
            r.event_type,
            r.day,
        )
        prior = sub[sub["day"] < day]["user_id"]
        assert r.new_users == r.cum_users - prior.nunique()


def test_gapfill_interpolation_matches_numpy_interp(spark):
    """ts_gapfill_interpolate: observed days must carry the raw daily
    sums untouched; interpolated days must sit within one centi of the
    float np.interp line between their observed neighbors (the plan's
    integer truncating division is the only divergence source)."""
    from chess_ratings_spark.plans.timeseries import ts_gapfill_interpolate

    out = ts_gapfill_interpolate(spark, SF_SMOKE).toPandas()
    ev = tables.load(spark, SF_SMOKE, "events").toPandas()
    ev = ev[ev["user_id"] % 97 == 0].copy()
    ev["vc"] = np.floor(ev["value"].astype(float) * 100).astype("int64")
    ev["day"] = ev["ts"].to_numpy().astype("datetime64[D]").astype(str)
    per = ev.groupby(["event_type", "day"])["vc"].sum()
    n_interp_checked = 0
    for et, g in out.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        days = g["day"].to_numpy().astype("datetime64[D]").astype("int64")
        # spine is a dense daily calendar between observed endpoints
        assert (np.diff(days) == 1).all(), et
        obs_mask = ~g["interpolated"].to_numpy()
        assert not g["interpolated"].iloc[0] and not g["interpolated"].iloc[-1]
        for r in g[obs_mask].itertuples():
            assert r.value_centi == int(per[(et, r.day)]), (et, r.day)
        line = np.interp(
            days, days[obs_mask], g["value_centi"].to_numpy()[obs_mask]
        )
        diff = np.abs(g["value_centi"].to_numpy() - line)
        assert (diff[~obs_mask] < 1.0 + 1e-9).all(), et
        n_interp_checked += int((~obs_mask).sum())
    assert n_interp_checked > 0  # the %97 slice must actually have holes


def _python_bpe(words: dict[str, int], k: int) -> list[tuple[str, str]]:
    """Train k BPE merges with plain dicts: count OVERLAPPING adjacent
    symbol pairs weighted by word frequency, take (count desc, pair
    string 'a b' asc), merge greedily left-to-right (non-overlapping)."""
    vocab = {tuple(w): f for w, f in words.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + f
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))[0]
        merges.append(best)
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_encode_matches_pure_python(spark):
    """text_bpe_encode vs a dict-based pure-Python BPE: train the same
    3 merges on the full corpus vocabulary, apply them in order to the
    held-out slice, compare the per-source fertility census."""
    import re

    from chess_ratings_spark.plans.training import text_bpe_encode

    out = {r["source"]: r for r in text_bpe_encode(spark, SF_SMOKE).collect()}
    d = (
        tables.load(spark, SF_SMOKE, "documents")
        .select("doc_id", "source", "text")
        .toPandas()
    )
    word_re = re.compile(r"^[a-z]+$")
    freq: dict[str, int] = {}
    for t in d["text"]:
        for w in t.lower().split(" "):
            if word_re.match(w):
                freq[w] = freq.get(w, 0) + 1
    merges = _python_bpe(freq, 3)

    held = d[d["doc_id"] % 10 == 7]
    exp: dict[str, list[int]] = {}
    for r in held.itertuples():
        for w in r.text.lower().split(" "):
            if not word_re.match(w):
                continue
            syms = list(w)
            for a, b in merges:
                out_syms: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out_syms.append(a + b)
                        i += 2
                    else:
                        out_syms.append(syms[i])
                        i += 1
                syms = out_syms
            acc = exp.setdefault(r.source, [0, 0, 0])
            acc[0] += 1
            acc[1] += len(w)
            acc[2] += len(syms)
    assert set(out) == set(exp)
    for source, (n_words, n_chars, n_tokens) in exp.items():
        row = out[source]
        assert (
            row["n_words"],
            row["n_chars"],
            row["n_tokens"],
        ) == (n_words, n_chars, n_tokens), source
        assert row["tokens_per_char_e6"] == n_tokens * 1_000_000 // n_chars


def test_ks_test_matches_numpy_ecdf(spark):
    """agg_ks_test vs the ECDF route: sorted per-side samples,
    searchsorted step functions over the union grid, sup-norm of the
    cross-multiplied difference. The plan derives the same statistic
    through grouped counts + a cumulative window — a shared derivation
    error (off-by-one in the CDF step side, wrong argmax tie rule)
    would show up here."""
    from chess_ratings_spark.plans.analytics import agg_ks_test

    row = agg_ks_test(spark, SF_SMOKE).collect()[0]
    ev = (
        tables.load(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .toPandas()
    )
    a = np.sort(
        np.floor(
            ev.loc[ev["event_type"] == "click", "value"].to_numpy() * 100
        ).astype("int64")
    )
    b = np.sort(
        np.floor(
            ev.loc[ev["event_type"] == "purchase", "value"].to_numpy() * 100
        ).astype("int64")
    )
    grid = np.union1d(a, b)
    fa = np.searchsorted(a, grid, side="right").astype("int64")
    fb = np.searchsorted(b, grid, side="right").astype("int64")
    diff = np.abs(fa * len(b) - fb * len(a))
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))
    assert row["ks_e6"] == int(diff.max()) * 1_000_000 // (len(a) * len(b))
    # grid ascends, argmax returns the FIRST max -> the minimal value,
    # matching the oracle's min(vc) plateau tie rule
    assert row["ks_at_centi"] == int(grid[int(np.argmax(diff))])


def test_autocorr_matches_numpy(spark):
    """agg_autocorr vs the float-space textbook estimator: mean-center
    in numpy, acf_k = sum(d[k:]*d[:-k]) / sum(d*d). The plan works in
    scaled integers (nu = n*x - s1) where the n^2 cancels; agreement
    within the e6 truncation proves the integerization is faithful."""
    from chess_ratings_spark.plans.analytics import agg_autocorr

    out = {r["event_type"]: r for r in agg_autocorr(spark, SF_SMOKE).collect()}
    ev = (
        tables.load(spark, SF_SMOKE, "events")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
    )
    ev["vc"] = np.floor(ev["value"].astype(float) * 100).astype("int64")
    assert set(out) == set(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"])
        x = g["vc"].to_numpy(dtype=float)
        d = x - x.mean()
        den = float((d * d).sum())
        row = out[et]
        assert row["n"] == len(x)
        for k, col in ((1, "acf1_e6"), (7, "acf7_e6")):
            approx = float((d[k:] * d[:-k]).sum()) / den * 1e6
            assert abs(row[col] - approx) <= 2, (et, k, row[col], approx)


def test_kcore_matches_python_peel(spark):
    """graph_kcore vs an imperative Counter-based peel over the same
    bipartite edge set — set/dict machinery instead of joins, so a
    relational slip (semi-join on one endpoint only, degree counted
    per-multiedge) cannot pass both routes."""
    from collections import Counter

    from chess_ratings_spark.plans.corpus import (
        _KCORE_K,
        _KCORE_ROUNDS,
        graph_kcore,
    )

    out = {r["round"]: r for r in graph_kcore(spark, SF_SMOKE).collect()}
    assert set(out) == set(range(1, _KCORE_ROUNDS + 1))
    o = (
        tables.load(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_custkey")
        .toPandas()
    )
    li = (
        tables.load(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_quantity")
        .toPandas()
    )
    li = li[li["l_quantity"] <= 2]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    edges = set(
        zip((j["o_custkey"] * 2).tolist(), (j["l_suppkey"] * 2 + 1).tolist())
    )
    for r in range(1, _KCORE_ROUNDS + 1):
        deg: Counter = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        alive = {n for n, c in deg.items() if c >= _KCORE_K}
        edges = {(a, b) for a, b in edges if a in alive and b in alive}
        assert (out[r]["n_nodes"], out[r]["n_edges"]) == (
            len(alive),
            len(edges),
        ), r


def test_seasonal_decompose_matches_pandas_rolling(spark):
    """ts_seasonal_decompose vs pandas reindex + rolling(center=True):
    a different spine construction (date_range reindex vs sequence
    explode) and a different trend engine (pandas rolling vs a Spark
    window frame). Checks counts, exact integer det sums, and the
    toward-zero e3 division."""
    from chess_ratings_spark.plans.timeseries import ts_seasonal_decompose

    out = {
        (r["event_type"], r["dow"]): r
        for r in ts_seasonal_decompose(spark, SF_SMOKE).collect()
    }
    ev = (
        tables.load(spark, SF_SMOKE, "events")
        .select("event_type", "ts", "value")
        .toPandas()
    )
    ev["d"] = pd.to_datetime(ev["ts"]).dt.normalize()
    ev["vc"] = np.floor(ev["value"].astype(float) * 100).astype("int64")
    got: set = set()
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("d")["vc"].sum()
        idx = pd.date_range(daily.index.min(), daily.index.max(), freq="D")
        daily = daily.reindex(idx, fill_value=0)
        trend7 = daily.rolling(7, center=True).sum()
        mask = trend7.notna()
        det = (7 * daily[mask] - trend7[mask].astype("int64")).to_numpy()
        dow = (
            (daily.index[mask] - pd.Timestamp("1970-01-01")).days % 7
        ).to_numpy()
        for dw in np.unique(dow):
            s = int(det[dow == dw].sum())
            n = int((dow == dw).sum())
            row = out[(et, int(dw))]
            got.add((et, int(dw)))
            assert row["n_days"] == n
            assert row["det_sum"] == s
            q = abs(s) * 1000 // (7 * n)
            assert row["seasonal_centi_e3"] == (q if s >= 0 else -q)
    assert set(out) == got


def test_pq_adc_matches_numpy_pq(spark):
    """sim_pq_adc vs a full numpy PQ implementation: sign-bit buckets,
    per-dim lower-median centroids (present buckets only), integer
    argmin encode with smaller-code ties, LUT-based ADC, top-100
    shortlist, exact rerank to top-10, recall vs brute-force truth.
    Array machinery instead of joins/windows end-to-end — and asserts
    the codes fingerprint, so a drifted ENCODING (not just a lucky
    recall) fails."""
    from chess_ratings_spark.plans.llm_tier import sim_pq_adc

    row = sim_pq_adc(spark, SF_SMOKE).collect()[0]
    emb = (
        tables.load(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb["vec_id"].to_numpy()
    X = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1e6
    ).astype(np.int64)
    m, dims = 16, 4
    codes = np.zeros((len(X), m), dtype=np.int64)
    cents: list[dict] = []
    fingerprint = 0
    for s in range(m):
        sub = X[:, s * dims : (s + 1) * dims]
        b = np.zeros(len(sub), dtype=np.int64)
        for i in range(4):
            b = b * 2 + (sub[:, i] >= 0)
        cent = {}
        for j in np.unique(b):
            rows_j = sub[b == j]
            # lower median per dim with (value, vec_id) ordering: the
            # vec_id tiebreak never changes WHICH value is picked
            cent[int(j)] = np.sort(rows_j, axis=0)[(len(rows_j) + 1) // 2 - 1]
        cents.append(cent)
        for r in range(len(sub)):
            best = min(
                (int(((sub[r] - c) ** 2).sum()), j) for j, c in cent.items()
            )
            codes[r, s] = best[1]
        fingerprint += int(codes[:, s].sum()) * (s + 1)
    qmask = ids % 100 == 0
    qids = ids[qmask]
    hits = tot = 0
    for qi, qv in zip(qids, X[qmask]):
        ed = ((X - qv) ** 2).sum(axis=1)
        order = np.lexsort((ids, ed))
        truth = set(list(int(ids[j]) for j in order if ids[j] != qi)[:10])
        adist = np.zeros(len(X), dtype=np.int64)
        for s in range(m):
            lut = {
                j: int(((qv[s * dims : (s + 1) * dims] - c) ** 2).sum())
                for j, c in cents[s].items()
            }
            adist += np.array([lut[int(c)] for c in codes[:, s]])
        order = np.lexsort((ids, adist))
        short = [j for j in order if ids[j] != qi][:100]
        rr = np.lexsort((ids[short], ed[short]))
        picks = [int(ids[short[j]]) for j in rr][:10]
        hits += len(set(picks) & truth)
        tot += 10
    assert row["n_queries"] == len(qids)
    assert row["n_results"] == tot
    assert row["hits"] == hits
    assert row["recall_e6"] == hits * 1_000_000 // tot
    assert row["codes_fingerprint"] == fingerprint
    assert row["n_codes"] == len(X) * m
    assert row["recall_e6"] >= 850_000  # measured 0.94-0.96; floor w/ margin


def test_changepoint_matches_numpy_cusum(spark):
    """ts_changepoint vs numpy: daily sums via pandas groupby, CUSUM
    via np.cumsum, split point via argmax over |n*prefix - t*S| at
    interior t (first index on ties), level means via integer
    division."""
    from chess_ratings_spark.plans.timeseries import ts_changepoint

    out = {r["event_type"]: r for r in ts_changepoint(spark, SF_SMOKE).collect()}
    ev = (
        tables.load(spark, SF_SMOKE, "events")
        .select("event_type", "ts", "value")
        .toPandas()
    )
    ev["d"] = pd.to_datetime(ev["ts"]).dt.normalize()
    ev["vc"] = np.floor(ev["value"].astype(float) * 100).astype("int64")
    assert set(out) == set(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("d")["vc"].sum().sort_index()
        vs = daily.to_numpy()
        n = len(vs)
        s = int(vs.sum())
        prefix = np.cumsum(vs)
        t = np.arange(1, n + 1)
        score = np.abs(n * prefix - t * s)[: n - 1]
        i = int(np.argmax(score))  # first max = earliest day on ties
        row = out[et]
        assert row["n_days"] == n
        assert str(row["cp_day"]) == str(daily.index[i].date())
        assert row["cp_index"] == i + 1
        assert row["cusum_abs"] == int(score[i])
        pb, cp = int(prefix[i]), i + 1
        qb = abs(pb) * 1000 // cp
        assert row["mean_before_e3"] == (qb if pb >= 0 else -qb)
        pa = s - pb
        qa = abs(pa) * 1000 // (n - cp)
        assert row["mean_after_e3"] == (qa if pa >= 0 else -qa)


def test_kmedians_matches_numpy(spark):
    """ml_kmedians_embed vs a numpy Lloyd loop: sign-bit seed,
    per-dim lower-median centroids over each cluster's members, exact
    integer L2^2 argmin with smaller-cluster ties — array reductions
    instead of joins/windows. Asserts the full per-round census
    including the assignment fingerprint."""
    from chess_ratings_spark.plans.training import (
        _KMED_ROUNDS,
        ml_kmedians_embed,
    )

    out = {r["round"]: r for r in ml_kmedians_embed(spark, SF_SMOKE).collect()}
    assert set(out) == set(range(1, _KMED_ROUNDS + 1))
    emb = (
        tables.load(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb["vec_id"].to_numpy()
    X = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1e6
    ).astype(np.int64)
    c = (X[:, 0] >= 0) * 4 + (X[:, 1] >= 0) * 2 + (X[:, 2] >= 0) * 1
    for r in range(1, _KMED_ROUNDS + 1):
        cents = {}
        for j in np.unique(c):
            rows_j = X[c == j]
            cents[int(j)] = np.sort(rows_j, axis=0)[(len(rows_j) + 1) // 2 - 1]
        dists = np.full(len(X), np.iinfo(np.int64).max)
        newc = np.zeros(len(X), dtype=np.int64)
        for j in sorted(cents):
            dj = ((X - cents[j]) ** 2).sum(axis=1)
            better = dj < dists  # strict: ties keep the smaller j
            newc[better] = j
            dists[better] = dj[better]
        c = newc
        row = out[r]
        assert row["n_clusters"] == len(np.unique(c))
        assert row["n_vecs"] == len(X)
        assert row["inertia"] == int(dists.sum())
        assert row["assign_fp"] == int((ids * (c + 1)).sum())
    # Lloyd monotonicity sanity on this fixture: refining helped
    assert out[_KMED_ROUNDS]["inertia"] <= out[1]["inertia"]


def test_phash_near_dup_matches_numpy(spark):
    """mm_phash_near_dup vs an independent numpy dHash + dict-bucket
    band join: the Spark side goes PPM-bytes -> production decoder ->
    hash; this reference skips the codec entirely (pixel plane ->
    hash), so an encode/decode slip changes the Spark result but not
    this one."""
    from chess_ratings_spark.operators.multimodal import (
        dhash64,
        phash_pixel_plane,
    )
    from chess_ratings_spark.plans.extras import mm_phash_near_dup

    row = mm_phash_near_dup(spark, SF_SMOKE).collect()[0]
    ids = [
        r["doc_id"]
        for r in tables.load(spark, SF_SMOKE, "documents")
        .select("doc_id")
        .collect()
    ]
    hs = {d: dhash64(phash_pixel_plane(d % 50, d // 50)) for d in ids}
    from collections import defaultdict

    buckets = defaultdict(list)
    for d, (lo, hi) in hs.items():
        for k in range(8):
            h = lo if k < 4 else hi
            buckets[(k, (h >> (8 * (k % 4))) & 255)].append(d)
    cand = set()
    for bucket in buckets.values():
        bucket = sorted(bucket)
        for i in range(len(bucket)):
            for j in range(i + 1, len(bucket)):
                cand.add((bucket[i], bucket[j]))
    n_pairs = n_same = ham_tot = 0
    for a, b in cand:
        ham = bin(hs[a][0] ^ hs[b][0]).count("1") + bin(
            hs[a][1] ^ hs[b][1]
        ).count("1")
        if ham <= 6:
            n_pairs += 1
            ham_tot += ham
            n_same += a % 50 == b % 50
    assert row["n_images"] == len(ids)
    assert row["sum_h_lo"] == sum(v[0] for v in hs.values())
    assert row["sum_h_hi"] == sum(v[1] for v in hs.values())
    assert (row["n_pairs"], row["n_same_base"], row["hamming_total"]) == (
        n_pairs,
        n_same,
        ham_tot,
    )
    assert row["n_pairs"] > 0 and row["n_same_base"] == row["n_pairs"]


def test_skyline_matches_bruteforce_dominance(spark):
    """win_skyline_2d vs the quadratic dominance definition applied
    literally over distinct points: survive iff no other point is
    cheaper-or-equal AND bigger-or-equal with one strict."""
    from chess_ratings_spark.plans.analytics import win_skyline_2d

    out = {
        (r["grp"], r["price_centi"], r["qty"]): r["n_dup"]
        for r in win_skyline_2d(spark, SF_SMOKE).collect()
    }
    li = (
        tables.load(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    li["p"] = np.floor(li["l_extendedprice"].astype(float) * 100).astype(
        "int64"
    )
    li["q"] = li["l_quantity"].astype("int64")
    expected = {}
    for grp, g in li.groupby("l_returnflag"):
        counts = g.groupby(["p", "q"]).size()
        pts = list(counts.index)
        for p, q in pts:
            dominated = any(
                p2 <= p and q2 >= q and (p2 < p or q2 > q) for p2, q2 in pts
            )
            if not dominated:
                expected[(grp, p, q)] = int(counts[(p, q)])
    assert out == expected
    assert len(out) > 0


def test_ltob_matches_numpy(spark):
    """ts_downsample_ltob vs a direct numpy LTOB: sort, bucket by
    (t-1)*B//n, triangle areas from array slices, per-bucket argmax
    with (area desc, x, event_id) ties."""
    from chess_ratings_spark.plans.timeseries import (
        _LTOB_BUCKETS,
        ts_downsample_ltob,
    )

    out = {
        (r["event_type"], r["bucket"]): (
            r["epoch_us"],
            r["value_centi"],
            r["area2"],
        )
        for r in ts_downsample_ltob(spark, SF_SMOKE).collect()
    }
    ev = (
        tables.load(spark, SF_SMOKE, "events")
        .selectExpr(
            "event_type",
            "event_id",
            "timestampdiff(MICROSECOND,"
            " cast('1970-01-01 00:00:00' as timestamp_ntz), ts) AS x",
            "CAST(floor(value * 100) AS BIGINT) AS y",
        )
        .toPandas()
    )
    expected = {}
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["x", "event_id"]).reset_index(drop=True)
        n = len(g)
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        eid = g["event_id"].to_numpy()
        best: dict = {}
        for i in range(1, n - 1):
            a2 = abs(
                (x[i - 1] - x[i + 1]) * (y[i] - y[i - 1])
                - (x[i - 1] - x[i]) * (y[i + 1] - y[i - 1])
            )
            b = (i * _LTOB_BUCKETS) // n  # t-1 == i (0-based interior)
            key = (-a2, x[i], eid[i])
            if b not in best or key < best[b][0]:
                best[b] = (key, (int(x[i]), int(y[i]), int(a2)))
        for b, (_, val) in best.items():
            expected[(et, int(b))] = val
    assert out == expected


def test_pca_power_matches_python_bigints(spark):
    """ml_pca_power vs arbitrary-precision Python-int power iteration:
    exact Gram matrix from scaled deviations, three rounds of C@v with
    toward-zero e6 renormalization — no engine arithmetic shared."""
    from chess_ratings_spark.plans.analytics import _PCA_ROUNDS, ml_pca_power

    out = {r["round"]: r for r in ml_pca_power(spark, SF_SMOKE).collect()}
    emb = (
        tables.load(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    Xf = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1e6
    ).astype(np.int64)
    X = [[int(v) for v in row] for row in Xf]
    n, d = len(X), 64
    S = [sum(row[i] for row in X) for i in range(d)]
    NU = [[n * row[i] - S[i] for i in range(d)] for row in X]
    C = [
        [sum(r[i] * r[j] for r in NU) for j in range(d)] for i in range(d)
    ]
    v = [10**6] * d

    def tdiv(x, y):  # toward-zero division, matching div/'//' bridge
        q = abs(x) * 10**6 // y
        return q if x >= 0 else -q

    for rnd in range(1, _PCA_ROUNDS + 1):
        w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        v = [tdiv(x, mx) for x in w]
        top = min(range(d), key=lambda i: (-abs(v[i]), i))
        row = out[rnd]
        assert row["top_dim"] == top + 1
        assert row["top_val_e6"] == v[top]
        assert row["fp"] == sum(v[i] * (i + 1) for i in range(d))


def test_bfs_layers_matches_python_sets(spark):
    """graph_bfs_layers vs an imperative set-based BFS over the same
    sparsified bipartite edges and seed rule."""
    from chess_ratings_spark.plans.corpus import _BFS_ROUNDS, graph_bfs_layers

    out = {r["dist"]: r["n_nodes"] for r in graph_bfs_layers(spark, SF_SMOKE).collect()}
    o = (
        tables.load(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_custkey")
        .toPandas()
    )
    li = (
        tables.load(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_quantity")
        .toPandas()
    )
    li = li[li["l_quantity"] <= 2]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    edges = set(
        zip((j["o_custkey"] * 2).tolist(), (j["l_suppkey"] * 2 + 1).tolist())
    )
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    frontier = {a for a, _ in edges if (a // 2) % 40 == 0}
    visited = set(frontier)
    expected = {0: len(frontier)}
    for d in range(1, _BFS_ROUNDS + 1):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        nxt -= visited
        expected[d] = len(nxt)
        visited |= nxt
        frontier = nxt
    assert out == expected
    assert expected[0] > 0 and max(expected.values()) > expected[0]


def test_max_drawdown_matches_numpy(spark):
    """ts_max_drawdown vs numpy cummax: drawdown series, argmax with
    earliest-row ties."""
    from chess_ratings_spark.plans.timeseries import ts_max_drawdown

    out = {r["event_type"]: r for r in ts_max_drawdown(spark, SF_SMOKE).collect()}
    ev = (
        tables.load(spark, SF_SMOKE, "events")
        .selectExpr(
            "event_type",
            "event_id",
            "timestampdiff(MICROSECOND,"
            " cast('1970-01-01 00:00:00' as timestamp_ntz), ts) AS x",
            "CAST(floor(value * 100) AS BIGINT) AS vc",
        )
        .toPandas()
    )
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["x", "event_id"]).reset_index(drop=True)
        vc = g["vc"].to_numpy()
        peak = np.maximum.accumulate(vc)
        dd = peak - vc
        i = int(np.argmax(dd))  # first max = earliest
        row = out[et]
        assert row["n_points"] == len(g)
        assert row["max_drawdown_centi"] == int(dd[i])
        assert row["peak_centi"] == int(peak[i])
        assert row["trough_centi"] == int(vc[i])
        assert row["at_epoch_us"] == int(g["x"].iloc[i])


def test_gini_concentration_matches_float_formula(spark):
    """agg_gini_concentration vs the float Lorenz formula on sorted
    per-customer revenues (within the two e6 truncations)."""
    from chess_ratings_spark.plans.analytics import agg_gini_concentration

    row = agg_gini_concentration(spark, SF_SMOKE).collect()[0]
    o = (
        tables.load(spark, SF_SMOKE, "orders")
        .select("o_custkey", "o_totalprice")
        .toPandas()
    )
    o["rc"] = np.floor(o["o_totalprice"].astype(float) * 100).astype("int64")
    per = o.groupby("o_custkey")["rc"].sum().sort_values(kind="stable")
    x = per.to_numpy(dtype=float)
    n = len(x)
    gini = 2.0 * ((np.arange(1, n + 1) * x).sum()) / (n * x.sum()) - (
        n + 1
    ) / n
    assert row["n_customers"] == n
    assert row["total_rev_centi"] == int(per.sum())
    assert abs(row["gini_e6"] / 1e6 - gini) < 3e-6
    assert 0 <= row["gini_e6"] <= 1_000_000


def test_ewma_forecast_matches_pure_python_recurrence(spark):
    """ts_ewma_forecast computes the alpha=1/2 EWMA as a 16-term
    geometric sum scaled 2^16; the independent reference here runs the
    actual RECURRENCE s_t = (x_t + s_{t-1}) / 2 in exact rational
    arithmetic (python Fraction) over the zero-filled daily series and
    truncates to the same 16-term horizon — a definitionally different
    route (sequential recurrence vs unrolled convolution) to the same
    BIGINTs."""
    from fractions import Fraction

    from chess_ratings_spark.plans.timeseries import ts_ewma_forecast

    out = {
        (r["event_type"], r["day"]): r["ewma_x65536"]
        for r in ts_ewma_forecast(spark, SF_SMOKE).collect()
    }
    ev = (
        tables.load(spark, SF_SMOKE, "events")
        .selectExpr(
            "event_type",
            "unix_date(cast(ts as date)) AS day",
            "CAST(floor(value * 100) AS BIGINT) AS vc",
        )
        .toPandas()
    )
    daily = ev.groupby(["event_type", "day"])["vc"].sum()
    got_keys = set()
    for etype, g in daily.groupby(level=0):
        days = {int(d): int(v) for (_, d), v in g.items()}
        for t in days:
            # exact recurrence over the 16-day window ending at t,
            # zero-filled gaps, s_0 = 0 before the window
            s = Fraction(0)
            for d in range(t - 15, t + 1):
                s = (Fraction(days.get(d, 0)) + s) / 2
            expected = s * (1 << 16)
            assert expected.denominator == 1  # 16 halvings of ints x 2^16
            key = (etype, t)
            got_keys.add(key)
            assert out[key] == int(expected), key
    assert got_keys == set(out), "query emitted days the reference lacks"


def test_merge_mor_matches_pure_python_upsert(spark, tmp_path):
    """lake_merge_mor's census oracle is a logical replay in SQL; this
    recomputes the end state with a pure-Python dict upsert over the
    collected fixture rows — an unrelated route that would catch a
    shared derivation error in both the verb and its oracle (which
    rows count as updates vs inserts, what the post-merge sum is)."""
    from pyspark.sql import functions as F

    from chess_ratings_spark.operators.tablelog import TableLog

    ev = (
        tables.load(spark, SF_SMOKE, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
        )
    )
    rows = ev.collect()
    table = {r["event_id"]: r.asDict() for r in rows}
    n0 = len(table)

    # the registered query's exact source recipe, replayed in Python
    updates, inserts = {}, {}
    for r in rows:
        if r["event_type"] == "view" and r["user_id"] % 15 == 2:
            d = r.asDict()
            d["vc"] += 5000
            updates[d["event_id"]] = d
        if r["event_type"] == "purchase" and r["user_id"] % 15 == 3:
            d = r.asDict()
            d["event_id"] += 100_000_000
            d["vc"] += 7
            inserts[d["event_id"]] = d
    for k, d in {**updates, **inserts}.items():
        table[k] = d  # dict upsert IS merge semantics

    log = TableLog(tmp_path / "t")
    log.append_range_bucketed(ev, "user_id", 25, tag="base")
    src_updates = ev.filter(
        "event_type = 'view' AND user_id % 15 = 2"
    ).withColumn("vc", F.col("vc") + 5000)
    src_inserts = ev.filter(
        "event_type = 'purchase' AND user_id % 15 = 3"
    ).select(
        (F.col("event_id") + 100_000_000).alias("event_id"),
        "user_id",
        "event_type",
        (F.col("vc") + 7).alias("vc"),
    )
    res = log.merge_mor(spark, src_updates.unionByName(src_inserts), ["event_id"])
    assert res["n_updated"] == len(updates)
    assert res["n_inserted"] == len(inserts)

    got = {
        r["event_id"]: (r["user_id"], r["event_type"], r["vc"])
        for r in log.snapshot_mor(spark).collect()
    }
    want = {
        k: (d["user_id"], d["event_type"], d["vc"]) for k, d in table.items()
    }
    assert got == want
    assert len(got) == n0 + len(inserts)


def test_merge_full_matches_pure_python_three_clause(spark, tmp_path):
    """lake_merge_full's census oracle is a logical replay in SQL; this
    recomputes the end state with pure-Python dict semantics — upsert
    plus a dict sweep for the WHEN NOT MATCHED BY SOURCE clause — an
    unrelated route that would catch a shared derivation error between
    the verb and its oracle (which unmatched rows the clause dooms,
    what the post-merge content is)."""
    from pyspark.sql import functions as F

    from chess_ratings_spark.operators.tablelog import TableLog

    ev = (
        tables.load(spark, SF_SMOKE, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
        )
    )
    rows = ev.collect()
    table = {r["event_id"]: r.asDict() for r in rows}

    updates, inserts = {}, {}
    for r in rows:
        if r["event_type"] == "view" and r["user_id"] % 15 == 2:
            d = r.asDict()
            d["vc"] += 5000
            updates[d["event_id"]] = d
        if r["event_type"] == "purchase" and r["user_id"] % 15 == 3:
            d = r.asDict()
            d["event_id"] += 100_000_000
            d["vc"] += 7
            inserts[d["event_id"]] = d
    src_keys = set(updates) | set(inserts)
    # the three clauses in dict form: upsert, then sweep unmatched
    doomed = [
        k
        for k, d in table.items()
        if k not in src_keys
        and d["event_type"] == "click"
        and d["user_id"] % 10 == 4
    ]
    for k in doomed:
        del table[k]
    for k, d in {**updates, **inserts}.items():
        table[k] = d

    log = TableLog(tmp_path / "t")
    log.append_range_bucketed(ev, "user_id", 25, tag="base")
    src_updates = ev.filter(
        "event_type = 'view' AND user_id % 15 = 2"
    ).withColumn("vc", F.col("vc") + 5000)
    src_inserts = ev.filter(
        "event_type = 'purchase' AND user_id % 15 = 3"
    ).select(
        (F.col("event_id") + 100_000_000).alias("event_id"),
        "user_id",
        "event_type",
        (F.col("vc") + 7).alias("vc"),
    )
    res = log.merge_mor(
        spark,
        src_updates.unionByName(src_inserts),
        ["event_id"],
        delete_unmatched="event_type = 'click' AND user_id % 10 = 4",
    )
    assert res["n_updated"] == len(updates)
    assert res["n_inserted"] == len(inserts)
    assert res["n_deleted"] == len(doomed)

    got = {
        r["event_id"]: (r["user_id"], r["event_type"], r["vc"])
        for r in log.snapshot_mor(spark).collect()
    }
    want = {
        k: (d["user_id"], d["event_type"], d["vc"]) for k, d in table.items()
    }
    assert got == want


def test_holt_linear_matches_pure_python_convolution(spark):
    """ts_holt_linear's closed-form weights and the registered plan are
    both checked against an unrelated route: (a) the 21-term closed
    form (min(k,20-k)+1)*2^(20-k) must equal the direct convolution of
    the 11-term dyadic kernel with itself, and (b) the Spark result at
    SF_SMOKE must equal a pure-Python dict replay of daily-aggregate ->
    double convolution -> 3*s1 - 2*s2 over the collected fixture."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    # (a) closed form == composed kernel
    a = [1 << (10 - i) for i in range(11)]
    w = [0] * 21
    for i in range(11):
        for j in range(11):
            w[i + j] += a[i] * a[j]
    assert w == [(min(k, 20 - k) + 1) * (1 << (20 - k)) for k in range(21)]

    # (b) fixture replay
    ev = tables.load(spark, SF_SMOKE, "events")
    daily = defaultdict(int)
    for r in ev.select(
        "event_type",
        F.expr("unix_date(cast(ts as date))").cast("bigint").alias("day"),
        F.floor(F.col("value") * 100).cast("bigint").alias("vc"),
    ).collect():
        daily[(r.event_type, r.day)] += r.vc
    want = {}
    for (et, day) in daily:
        s1 = sum(
            a[i] * daily.get((et, day - i), 0) for i in range(11)
        )
        s2 = sum(
            w[k] * daily.get((et, day - k), 0) for k in range(21)
        )
        want[(et, day)] = (s1, s2, 3 * s1 * 1024 - 2 * s2)

    import chess_ratings_spark.plans  # noqa: F401
    from chess_ratings_spark.registry import REGISTRY

    got = {
        (r.event_type, r.day): (r.s1_x1024, r.s2_x1048576, r.forecast_x1048576)
        for r in REGISTRY["ts_holt_linear"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
