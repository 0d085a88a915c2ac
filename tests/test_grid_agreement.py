"""Floor-grid agreement evidence for the transcendental fixed-point
bridges (ADVICE r6): queries that emit ``floor(libm_fn(x) * scale)``
integers rely on the JVM and DuckDB libms flooring to the SAME integer.
Per-row math is within a few ulps across libms, so parity is guaranteed
iff no domain point lands within a few ulps of a grid boundary. These
tests enumerate the ACTUAL domain of each grid from the fixtures (the
same CTE shapes as the oracles) and assert every point keeps a
boundary margin of ≥64 ulps ×1e3 safety — so a fixture regeneration or
libm/JDK upgrade that creates a boundary-straddling point fails CI
instead of silently flipping a driver hash.

Domains enumerated: perplexity's ln(c/n) over every distinct bigram
count, tf-idf's ln(N/df) over every distinct document frequency,
decayed counters' 2^(-h/168) over every hour age, and MaxSim's cosine
over the full bounded pair block.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from .conftest import SF_SMOKE

SF_DIRS = [SF_SMOKE, "/root/testdata/sf0.01"]


def margin_ok(x: float, scale: float) -> float:
    """Distance (in grid cells) from x*scale to its nearest floor
    boundary, minus the cross-libm uncertainty (64 ulps of the scaled
    value). Positive = safe."""
    v = x * scale
    dist = min(v - math.floor(v), math.ceil(v) - v)
    return dist - 64 * math.ulp(max(1.0, abs(v)))


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_perplexity_ln_grid(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        """
        WITH base AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), bg AS (
          SELECT array_to_string(t[u.i : u.i+1], ' ') AS bg
          FROM base, LATERAL (SELECT unnest(range(1, len(t))) AS i) AS u
        ), model AS (SELECT bg, count(*) AS c FROM bg GROUP BY bg),
        tot AS (SELECT count(*) AS n FROM bg)
        SELECT DISTINCT c, n FROM model, tot
        """
    ).fetchall()
    assert rows
    worst = min(margin_ok(math.log(c / n), 1e6) for c, n in rows)
    assert worst > 0, f"ln(c/n)*1e6 boundary margin exhausted: {worst}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_tfidf_idf_grid(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        """
        WITH tok AS (
          SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents
        ), d AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT DISTINCT df, n_docs FROM d, n
        """
    ).fetchall()
    assert rows
    worst = min(margin_ok(math.log(n / df), 1e6) for df, n in rows)
    assert worst > 0, f"ln(N/df)*1e6 boundary margin exhausted: {worst}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_decay_pow_grid(sf_dir):
    con = _con(sf_dir)
    hs = con.execute(
        """
        SELECT DISTINCT (epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                         - epoch_us(ts)) // 3600000000 AS h
        FROM events
        """
    ).fetchall()
    assert hs
    # h ≡ 0 (mod 168) gives an INTEGRAL exponent: 2^-k is exactly
    # representable and every conforming libm returns it exactly, so
    # 2^-k * 1e9 (also exact: 1e9 = 2^9·1953125) landing ON a grid
    # boundary floors identically in both engines — assert exactness
    # instead of margin there.
    for (h,) in hs:
        v = 2.0 ** (-(h / 168.0)) * 1e9
        if h % 168 == 0:
            assert v == math.floor(v), f"h={h}: expected exact power of two"
    worst = min(
        margin_ok(2.0 ** (-(h / 168.0)), 1e9) for (h,) in hs if h % 168 != 0
    )
    assert worst > 0, f"pow decay *1e9 boundary margin exhausted: {worst}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_maxsim_cosine_grid(sf_dir):
    con = _con(sf_dir)
    cos_sql = """
        list_sum(list_transform(list_zip(qv, cv),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(list_zip(qv, qv),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
         * sqrt(list_sum(list_transform(list_zip(cv, cv),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))))
    """
    vals = con.execute(
        f"""
        WITH q AS (
          SELECT label AS ql, embedding AS qv,
                 row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
          FROM embeddings WHERE label IN (0, 1, 2)
        ), qs AS (SELECT ql, qv FROM q WHERE rn <= 8),
        c AS (
          SELECT label AS cl, embedding AS cv,
                 row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
          FROM embeddings
        ), cs AS (SELECT cl, cv FROM c WHERE rn <= 16)
        SELECT {cos_sql} AS raw_cos FROM qs JOIN cs ON ql != cl
        """
    ).fetchall()
    assert vals
    worst = min(margin_ok(v, 1e9) for (v,) in vals)
    assert worst > 0, f"cosine*1e9 boundary margin exhausted: {worst}"


@pytest.mark.parametrize("sf_dir", SF_DIRS + ["/root/testdata/sf0.1"])
def test_distribution_shape_e6_grid(sf_dir):
    """agg_distribution_shape floors g1/g2 (computed from EXACT integer
    power sums via IEEE-deterministic ops only) to an e6 grid. The only
    cross-engine wiggle is the int128/decimal -> double cast of the
    sums (<=1 ulp each, amplified ~100x by the central-moment
    cancellation => ~1e-9 grid cells). Assert every group in every
    fixture keeps >=1e-3 cells of boundary margin — six orders of
    safety, and a regenerated fixture that parks a moment on a
    boundary fails here instead of flipping a driver hash."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    rows = con.execute(
        """
        WITH t AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100) AS HUGEINT) AS vc
          FROM lineitem
        ), g AS (
          SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS nd,
                 CAST(sum(vc) AS DOUBLE) AS d1,
                 CAST(sum(vc * vc) AS DOUBLE) AS d2,
                 CAST(sum(vc * vc * vc) AS DOUBLE) AS d3,
                 CAST(sum((vc * vc) * (vc * vc)) AS DOUBLE) AS d4
          FROM t GROUP BY l_returnflag
        ), r AS (
          SELECT l_returnflag, d1/nd AS mu, d2/nd AS r2,
                 d3/nd AS r3, d4/nd AS r4 FROM g
        ), m AS (
          SELECT l_returnflag, r2 - mu*mu AS m2,
                 r3 - 3*mu*r2 + 2*mu*mu*mu AS m3,
                 r4 - 4*mu*r3 + 6*mu*mu*r2 - 3*mu*mu*mu*mu AS m4
          FROM r
        )
        SELECT l_returnflag, m3 / (m2 * sqrt(m2)) AS g1,
               m4 / (m2 * m2) - 3 AS g2
        FROM m
        """
    ).fetchall()
    assert rows
    for flag, g1, g2 in rows:
        for label, val in (("skew", g1), ("kurt", g2)):
            v = val * 1e6
            dist = min(v - math.floor(v), math.ceil(v) - v)
            assert dist > 1e-3, (sf_dir, flag, label, v)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_entropy_grids(sf_dir):
    """agg_entropy_gini's two floor grids: the per-(source, lang)
    c·ln(c)·1e6 term grid and the final per-source entropy e6 grid
    (ln(n) - Σterm/1e6/n). Gini needs no check — exact integers."""
    con = _con(sf_dir)
    rows = con.execute(
        """
        SELECT source, lang, count(*) AS c
        FROM documents GROUP BY source, lang
        """
    ).fetchall()
    assert rows
    worst = min(
        margin_ok(c * math.log(c), 1e6) for _, _, c in rows if c > 1
    )
    assert worst > 0, f"c*ln(c)*1e6 boundary margin exhausted: {worst}"
    # the downstream entropy expression, replayed exactly as both
    # engines evaluate it (from the already-floored term sums)
    by_src: dict[str, list[int]] = {}
    for s, _, c in rows:
        by_src.setdefault(s, []).append(c)
    worst_h = None
    for cs in by_src.values():
        n = sum(cs)
        sum_e6 = sum(math.floor(c * math.log(c) * 1e6) for c in cs)
        h = math.log(float(n)) - (sum_e6 / 1e6) / float(n)
        m = margin_ok(h, 1e6)
        worst_h = m if worst_h is None else min(worst_h, m)
    assert worst_h is not None and worst_h > 0, (
        f"entropy*1e6 boundary margin exhausted: {worst_h}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_divcast_sites_nonnegative_domains(sf_dir):
    """The truncate-vs-floor audit (r8 verdict item 6): every site that
    truncates with ``(col/k).cast(...)`` instead of ``F.floor`` is safe
    only because its input is provably non-negative. Pin those
    preconditions to the fixtures so a regeneration that introduces
    negative ids fails here, not as a silent driver-hash flip.
    Sites: lake_zorder_locality (x,y = id%64 => z,lin >= 0), sim_pq_adc
    (p = posexplode position >= 0), graph wedge counts (d >= 0)."""
    con = _con(sf_dir)
    lo_u, lo_e = con.execute(
        "SELECT min(user_id), min(event_id) FROM events"
    ).fetchone()
    assert lo_u >= 0 and lo_e >= 0, "zorder %64 inputs must be non-negative"


def test_zorder_and_divcast_agree_on_negative_grid(spark):
    """Defense-in-depth for the same sites: even on a NEGATIVE domain
    the mod/compare z-order expression and the div-256 file-key bridge
    produce identical values in Spark and DuckDB (both % operators are
    sign-of-dividend; Spark's cast-after-divide and DuckDB's
    (v - v%256)//256 both truncate toward zero), so a future negative
    input would change results but never split the engines."""
    import duckdb as _dd

    from chess_ratings_spark.plans.lakehouse import _zorder_sql

    z = _zorder_sql("x", "y")
    spark_rows = (
        spark.range(-130, 131)
        .selectExpr("CAST(id AS BIGINT) AS x", "CAST(-id AS BIGINT) AS y")
        .selectExpr("x", "y", f"({z}) AS z")
        .selectExpr("x", "z", "CAST(z / 256 AS BIGINT) AS fk")
        .orderBy("x")
        .collect()
    )
    duck_rows = _dd.connect().execute(
        f"""
        WITH g AS (SELECT r AS x, -r AS y FROM range(-130, 131) t(r)),
        k AS (SELECT x, ({z}) AS z FROM g)
        SELECT x, z, (z - z % 256) // 256 AS fk FROM k ORDER BY x
        """
    ).fetchall()
    assert [(r.x, r.z, r.fk) for r in spark_rows] == duck_rows
