"""Near-duplicate detection and vector similarity (SURVEY.md §2.9).

The 100 TB design constraint shapes everything here: no O(n²) pair
enumeration ever materializes. Candidates come from LSH band keys
(MinHash bands for Jaccard, sign-bit bands for cosine), so the only
wide operation is an equi-join on band keys; exact verification then
runs on the (tiny) candidate set. All hashing is xxhash64 — JVM-side,
codegen'd, seeded per hash function via an extra literal column.

MinHash recall math (why the verified output is effectively exact):
with r rows/band and b bands, P(candidate | jaccard=j) = 1-(1-j^r)^b.
At r=4, b=32 and j ≥ 0.8, miss probability ≤ (1-0.8^4)^32 ≈ 3e-9 — so
"LSH candidates + exact-jaccard filter" equals the brute-force answer
up to negligible probability, which is what makes the DuckDB oracle
(inverted-index exact join) a fair check rather than a lucky one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHINGLE_WIDTH = 3
N_HASHES = 128
N_BANDS = 32  # -> 4 rows per band


def shingles(col: Column | str, width: int = SHINGLE_WIDTH) -> Column:
    """Distinct word w-shingles as an array column (pure exprs; see
    text.sliding_concat for the O(n·w) expansion)."""
    from chess_ratings_spark.operators.text import sliding_concat, tokens

    return F.array_distinct(sliding_concat(tokens(col), width))


def shingle_sets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingles array, n_shingles) — docs shorter than the
    shingle width drop out (no shingles to compare)."""
    return (
        docs.select("doc_id", shingles(text_col).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("n_sh", F.size("sh"))
    )


def capped_shingle_index(sh: DataFrame, df_cap: int) -> DataFrame:
    """Inverted shingle index with a document-frequency cap: shingles
    appearing in more than `df_cap` documents are dropped BEFORE any
    self-join, and per-doc set sizes are recounted over the capped
    universe, so downstream Jaccard is exact over informative shingles.

    Why: an inverted-index similarity self-join is quadratic in
    per-shingle document frequency — one boilerplate shingle shared by
    d documents contributes d(d-1)/2 join rows, so a single hot key
    ("the quick brown…") can dominate the whole shuffle at corpus
    scale. Capping df bounds every join key at df_cap(df_cap-1)/2
    pairs, making worst-case candidate volume linear in corpus size.

    Recall effect (bounded, by construction): only overlap carried by
    shingles with df > df_cap is lost — the least discriminative
    evidence there is. A pair disappears entirely only when EVERY
    shared shingle is hot, i.e. pure-boilerplate overlap, which is
    exactly what near-dup detection should not count. The fixture df
    maximum (25 at sf0.1) is far below the default cap, so capped and
    uncapped answers coincide there; the cap binds only under hot-key
    stress (see tests and scripts/scale_evidence.py).

    Output: (doc_id, s, n_sh) — one row per surviving posting, n_sh =
    capped set size. Plan shape: explode → groupBy(s) count → semi
    join keep-keys → per-doc size via count window. Two shuffles (one
    on shingle, one on doc_id), both with map-side partials where
    applicable; no driver state.
    """
    from pyspark.sql import Window

    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    keep = (
        ex.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("s")
    )
    capped = ex.join(keep, "s")
    return capped.withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )


_MINHASH_A = np.random.default_rng(7).integers(
    1, 2**63, size=N_HASHES, dtype=np.uint64
) | np.uint64(1)
_MINHASH_B = np.random.default_rng(8).integers(0, 2**63, size=N_HASHES, dtype=np.uint64)


def minhash_signatures(sh: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, sig array<bigint>[n_hashes]).

    Each shingle STRING is hashed once JVM-side (xxhash64, codegen'd);
    the k hash functions are an odd-multiplier affine family over that
    8-byte long, evaluated as one numpy (n_shingles × k) matmul-min in
    an Arrow-batched pandas UDF. The k-column grouped-min alternative
    works but codegen-scales badly (measured 1.5× slower at k=128 —
    and the gap grows with k); the signatures are blocking only, so
    the hash family needn't match any oracle — the exact-jaccard
    verify supplies correctness. No shuffle at all: signatures are
    computed per-row from the shingle array.
    """
    a, b = _MINHASH_A[:n_hashes], _MINHASH_B[:n_hashes]

    @F.pandas_udf("array<long>")
    def sig_udf(hashed: pd.Series) -> pd.Series:
        out = []
        for h in hashed:
            x = np.asarray(h, dtype=np.int64).view(np.uint64)
            m = x[:, None] * a[None, :] + b[None, :]  # uint64 wrap ≡ mod 2^64
            out.append(m.min(axis=0).view(np.int64))
        return pd.Series(out)

    hashed = sh.select(
        "doc_id", F.transform("sh", lambda s: F.xxhash64(s)).alias("hs")
    )
    return hashed.select("doc_id", sig_udf("hs").alias("sig"))


def band_keys(sigs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band_id, key) LSH band-key rows — the unit of both the
    all-pairs self-join (:func:`lsh_candidate_pairs`) and the
    INCREMENTAL probe (``dedup_incremental_minhash``: this frame,
    persisted for the historical corpus, IS the stored dedup index a
    daily batch probes by equi-join). Band key = xxhash64 of the
    band's signature slice."""
    r = N_HASHES // n_bands
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(*[F.element_at("sig", b * r + i + 1) for i in range(r)]).alias(
                            "key"
                        ),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_id", "bk.key")


def lsh_candidate_pairs(sigs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs via band-key equi-join.

    The self-join shuffles on (band_id, key) — never on raw pairs.
    """
    bands = band_keys(sigs, n_bands)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


#: Candidate-pair count above which verified_jaccard_pairs stops
#: broadcasting and falls back to a plain shuffle join. 2M pairs of two
#: longs ≈ 32 MB serialized — comfortably under executor broadcast
#: budgets; beyond that a driver-side broadcast build is the OOM risk,
#: not the win.
BROADCAST_CANDIDATE_LIMIT = 2_000_000


def verified_jaccard_pairs(
    docs: DataFrame,
    tau: float,
    text_col: str = "text",
    broadcast_limit: int = BROADCAST_CANDIDATE_LIMIT,
    sh: DataFrame | None = None,
    cands: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup join: candidates by banding, then EXACT
    jaccard on shingle sets; emit pairs with jaccard >= tau.

    ``sh`` / ``cands``: optionally precomputed (cached) shingle-set and
    LSH-candidate frames — the candidate pairs are τ-independent, so
    callers running several dedup variants over the same corpus share
    one shingle materialization and one band join instead of repeating
    them per query.
    """
    if sh is None:
        sh = shingle_sets(docs, text_col).cache()
    # Size-guarded broadcast of the candidate pairs: when they number
    # O(near-dup pairs) — far below the corpus — broadcasting keeps the
    # heavy shingle arrays from shuffling for the verify joins (measured
    # 2.7× on the full pipeline). The count() materializes the cached
    # candidate frame once (statistics-driven planning, same idea as
    # AQE); a pathological corpus whose bands flood the candidate set
    # degrades to a plain shuffle join instead of OOMing the driver.
    if cands is None:
        cands = lsh_candidate_pairs(minhash_signatures(sh)).cache()
    cj = F.broadcast(cands) if cands.count() <= broadcast_limit else cands
    ja = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("n_a"))
    jb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("n_sh").alias("n_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.col("n_a") + F.col("n_b")).cast("double") - F.size(
        F.array_intersect("sh_a", "sh_b")
    )
    return (
        ja.join(cj, "doc_a")
        .join(jb, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= tau)
    )


# ---------------------------------------------------------------------------
# SimHash (bit-signature near-dup for text)
# ---------------------------------------------------------------------------


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash bigint): majority vote per bit over token hashes.

    Tokens are hashed once JVM-side (xxhash64, codegen'd); the 64-bit
    majority vote is a numpy unpack-and-sum per row in an Arrow-batched
    pandas UDF — no shuffle at all (the earlier explode → 64-column
    grouped-sum formulation shuffles and codegen-scales badly; this
    produces bit-identical signatures since the per-token hash is
    unchanged: bit i set iff strictly more than half the token hashes
    have bit i set)."""
    shifts = np.arange(64, dtype=np.uint64)

    @F.pandas_udf("long")
    def sig_udf(hashed: pd.Series) -> pd.Series:
        out = np.empty(len(hashed), dtype=np.int64)
        for i, h in enumerate(hashed):
            x = np.asarray(h, dtype=np.int64).view(np.uint64)
            ones = ((x[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
            bits = (2 * ones > len(x)).astype(np.uint64)
            out[i] = (bits << shifts).sum(dtype=np.uint64).view(np.int64) if len(x) else 0
        return pd.Series(out)

    hashed = docs.select(
        "doc_id",
        F.transform(F.split(F.col(text_col), " "), lambda t: F.xxhash64(t)).alias("hs"),
    )
    return hashed.select("doc_id", sig_udf("hs").alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def _simhash_chunk_layout(max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) of max_hamming+1 chunks covering 64 bits — the
    pigeonhole count: h differing bits cannot touch h+1 chunks' worth of
    disjoint positions, so ≥1 chunk is identical for any pair within
    hamming ≤ h. EXACT recall, not a heuristic."""
    n = max_hamming + 1
    base, extra = divmod(64, n)
    layout, off = [], 0
    for i in range(n):
        w = base + (1 if i < extra else 0)
        layout.append((off, w))
        off += w
    return layout


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash: block on max_hamming+1 disjoint bit
    chunks (pigeonhole ⇒ any pair within the hamming budget shares ≥1
    identical chunk — exact recall), then verify exact hamming on the
    candidates. Narrower chunks than the old fixed 4×16 layout mean
    denser buckets, but the verify is still per-candidate and the join
    still shuffles on (chunk_id, chunk), never raw pairs."""
    sigs = simhash_signatures(docs)
    layout = _simhash_chunk_layout(max_hamming)
    # chunks feeds BOTH sides of the blocking self-join: without
    # materialization Catalyst re-expands the signature pandas UDF
    # (token hash + 64-bit majority vote over the whole corpus) once
    # per side. The frame is narrow (4 small ints per chunk row), so
    # one eager checkpoint halves the UDF work (guide §3.3/§4.4).
    chunks = (
        sigs.select(
            "doc_id",
            "simhash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("chunk_id"),
                            F.shiftright("simhash", off)
                            .bitwiseAND(F.lit((1 << w) - 1))
                            .alias("chunk"),
                        )
                        for c, (off, w) in enumerate(layout)
                    ]
                )
            ).alias("ck"),
        )
        .select("doc_id", "simhash", "ck.chunk_id", "ck.chunk")
        .localCheckpoint(eager=True)
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return cands.select(
        "doc_a", "doc_b", hamming64(F.col("sig_a"), F.col("sig_b")).alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Vector similarity (embeddings)
# ---------------------------------------------------------------------------


def dot_double(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ with per-element double casts, left-fold order — bit-exact
    against DuckDB's list_sum(list_transform(list_zip(...))) (verified
    empirically), so cosine queries need no rounding."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column | str) -> Column:
    return F.sqrt(dot_double(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return dot_double(ca, cb) / (norm2(ca) * norm2(cb))


def brute_force_topk(
    queries: DataFrame, candidates: DataFrame, k: int
) -> DataFrame:
    """Exact top-k cosine neighbors: broadcast the (small) query set
    against the candidate table, per-pair cosine, window top-k.

    At 100 TB the candidate side streams partition-parallel while the
    query block is replicated — the baseline every ANN variant is
    measured against.
    """
    from chess_ratings_spark.operators.windows import topk_per_group

    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    c = candidates.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    pairs = c.join(F.broadcast(q), F.col("qid") != F.col("cid")).select(
        "qid", "cid", cosine("qv", "cv").alias("cos")
    )
    return topk_per_group(
        pairs, group=["qid"], order=[F.col("cos").desc(), F.col("cid")], k=k, rn_name="rank"
    )


def auto_band_plan(
    n: int,
    tau: float,
    target_miss: float = 0.005,
    bg_agree: float = 0.53,
    cand_per_n: float = 8.0,
) -> tuple[int, int]:
    """Size sign-LSH bands (bits-per-band r, band count b) to the CORPUS
    SIZE, not just the threshold.

    Scale evidence (scripts/scale_evidence.py, sf0.1 embeddings inflated
    10×): with fixed r=16/b=64 the candidate count is quadratic with a
    small constant — 3,995 pairs at n=2,020 → 405,666 at n=20,200
    (ratio vs n(n-1)/2 constant at ~0.002). The background term is
    structural: two UNRELATED mean-centered vectors agree per bit w.p.
    ~0.5, so each band contributes ~n²/2 · bg^r collisions. Keeping
    that O(n) requires r to grow with log2(n); b is then re-solved so
    the miss probability for a TRUE pair at τ stays under target_miss
    (per-band match p(τ)^r with p(τ) = 1 - arccos(τ)/π, miss =
    (1-p^r)^b). Fixed point in a few iterations; floors keep the
    fixture-scale plan at the measured-good r=16.

    bg_agree=0.53 (not 0.5) reflects the measured residual correlation
    after mean-centering (405k observed vs 199k predicted at 0.5).
    """
    import math

    p = 1 - math.acos(tau) / math.pi
    r, b = 16, 64
    for _ in range(8):
        pr = p**r
        b = max(16, math.ceil(math.log(target_miss) / math.log(1 - pr)))
        # Background collisions ≈ b · n²/2 · bg^r; keeping them ≤ cand_per_n·n
        # solves to r ≥ log(n·b / (2·cand_per_n)) / log(1/bg_agree).
        r_new = max(
            16,
            math.ceil(
                math.log(n * b / (2 * cand_per_n)) / math.log(1 / bg_agree)
            ),
        )
        if r_new == r:
            break
        r = r_new
    return r * b, b


def signbit_candidates(
    vectors: DataFrame,
    n_bits: int = 1024,
    n_bands: int = 64,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs from random-hyperplane sign-LSH
    banding — the blocking stage of ``signbit_lsh_pairs``, public so the
    scale-evidence harness can measure candidate volume separately from
    the exact-cosine verify.

    Hyperplanes are pseudo-random but deterministic: plane p's component
    j = zero-mean xxhash64(p, j). Physical shape mirrors
    simhash_signatures: posexplode components → grouped sums (one pass,
    map-side combine — NOT nested aggregate() expressions, which are a
    codegen blowup measured at ~100× slower). Candidates are distinct
    ID pairs from the band equi-join; exact cosine runs once per
    distinct pair after joining embeddings back.

    Components are MEAN-CENTERED before hashing: corpora whose
    components share a positive mean give every pair cos≈0.3-0.5, which
    biases the sign bits and floods the band buckets with false
    candidates (measured ~2M candidates on 2k vectors uncentered vs
    ~150k centered). Centering rebalances the bits — near-identical
    vectors stay near-identical after centering, so recall for true
    near-dups is preserved; the exact-cosine filter runs on the
    ORIGINAL vectors.

    Bit computation is Arrow-vectorized (pandas UDF, numpy matmul
    against a seeded plane matrix): the bits are approximate BLOCKING —
    correctness comes from the exact-cosine verify — and the pure-expr
    alternative (n_bits grouped hash-sums) measured ~6 s of codegen-
    bound aggregation for what numpy does in milliseconds. The mean
    vector is estimated from a deterministic 512-row sample collected
    to the driver — statistics, not data, so the no-driver-collect rule
    doesn't apply, and a sample suffices because the mean only
    rebalances blocking bits.

    Band sizing (r = n_bits/n_bands bits per key) is driven by the
    corpus's BACKGROUND correlation, not just the target τ: with
    typical inter-vector cos ≈ 0.3–0.45, short keys make every band
    bucket dense and the candidate join quadratic in bucket size
    (measured: r=8/b=16 → ~1M pre-distinct candidates on 2k vectors;
    r=16/b=64 → ~140k, 3× faster end-to-end, while keeping miss
    probability at τ=0.9 under 0.4%: (1-0.857^16)^64).
    """
    r = n_bits // n_bands
    sample = np.vstack(
        vectors.orderBy("vec_id")
        .limit(512)
        .select("embedding")
        .toPandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    dim = sample.shape[1]
    mu = sample.mean(axis=0)
    planes = np.random.default_rng(42).standard_normal((dim, n_bits))

    @F.pandas_udf("array<long>")
    def band_keys(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy()) - mu  # (batch, dim), centered
        bits = (m @ planes) > 0  # (batch, n_bits)
        weights = 1 << np.arange(r)
        chunks = bits.reshape(len(bits), n_bands, r) @ weights  # r-bit ints
        # key encodes (band_id << r) | chunk so one array joins flat
        keys = (np.arange(n_bands)[None, :] << r) | chunks
        return pd.Series(list(keys.astype(np.int64)))

    bands = vectors.select(
        "vec_id", F.explode(band_keys("embedding")).alias("key")
    ).withColumn("band_id", F.shiftright("key", r))
    a, b = bands.alias("a"), bands.alias("b")
    # key embeds band_id in its high bits, so the equi-join on key alone
    # co-locates band buckets in one shuffle
    cands = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    return cands


def signbit_lsh_pairs(
    vectors: DataFrame,
    tau: float,
    n_bits: int | None = None,
    n_bands: int | None = None,
) -> DataFrame:
    """All-pairs cosine ≥ tau: sign-LSH banded blocking
    (``signbit_candidates``) + exact cosine verify on the ORIGINAL
    vectors, once per distinct candidate pair.

    When band parameters are not given they are sized to the corpus via
    ``auto_band_plan`` (one count() — a cheap id-column scan): fixed
    bands leave an n²·bg^r background-collision term that 10×-scale
    measurement showed dominating candidate volume. The count is exact
    where an approximation would do — acceptable because blocking cost
    itself dwarfs one columnar count."""
    if n_bits is None or n_bands is None:
        n_bits, n_bands = auto_band_plan(max(vectors.count(), 2), tau)
    cands = signbit_candidates(vectors, n_bits=n_bits, n_bands=n_bands)
    ea = vectors.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    eb = vectors.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        cands.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", cosine("va", "vb").alias("cos"))
        .filter(F.col("cos") >= tau)
    )


def _cell_topn(df: DataFrame, seeds_np: "np.ndarray", id_out: str, n: int) -> DataFrame:
    """Assign each vector to its `n` nearest seed cells ENTIRELY
    map-side: the seed matrix (n_cells × dim, bounded driver state —
    same discipline as the 512-vector LSH plane sample above) rides
    in an Arrow pandas_udf closure and the assignment is one numpy
    matmul + lexsort per batch. No shuffle, no window — a previous
    crossJoin+window formulation spent a full sort-shuffle of
    |corpus|×n_cells rows per assignment, and a pure higher-order-
    function rewrite evaluated interpreted at ~1 ms/vector; the Arrow
    path is ~3 orders faster per batch.

    Tie-break: lexsort on (cell_id asc) within (−cos asc), matching
    the window ordering (cos desc, cell_id asc) it replaces. Output:
    one row per (vector, assigned cell) plus the vector itself for
    the downstream exact-cosine join.
    """
    mat = seeds_np / np.linalg.norm(seeds_np, axis=1, keepdims=True)
    k = min(n, mat.shape[0])

    @F.pandas_udf("array<int>")
    def topn_cells(emb: pd.Series) -> pd.Series:
        x = np.vstack(emb.to_numpy()).astype(np.float64)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        sim = x @ mat.T  # (batch, n_cells)
        cells = np.arange(sim.shape[1])
        out = []
        for row in sim:
            order = np.lexsort((cells, -row))[:k]
            out.append(order.astype(np.int32))
        return pd.Series(out)

    return df.select(
        F.col("vec_id").alias(id_out),
        "embedding",
        F.explode(topn_cells("embedding")).alias("cell_id"),
    )


def kmeans_cells(
    vectors: DataFrame, n_cells: int, iters: int = 3
) -> "np.ndarray":
    """Spherical k-means coarse quantizer: assignment runs distributed
    (the Arrow matmul of ``_cell_topn``), the Lloyd update is a
    DataFrame job (groupBy(cell, pos) over posexplode(embedding) →
    per-component mean), and only the bounded seed state (n_cells ×
    dim floats) ever touches the driver — one n_cells×dim-row
    aggregate collect per round, the same bounded-scalar contract as
    the LSH plane sample.

    Init: the n_cells smallest vec_ids (deterministic). Cosine is
    scale-invariant so means need no renormalisation for assignment
    (we normalise anyway for numeric stability); cells that lose all
    members keep their previous seed, so cell count is stable.
    Returns the seed matrix ordered by cell id (float64).
    """
    init = (
        vectors.orderBy("vec_id")
        .limit(n_cells)
        .select("embedding")
        .toPandas()["embedding"]
        .to_numpy()
    )
    seeds = np.vstack(init).astype(np.float64)
    seeds /= np.linalg.norm(seeds, axis=1, keepdims=True)
    for _ in range(iters):
        assigned = _cell_topn(vectors, seeds, "vec_id", 1)
        means = (
            assigned.select("cell_id", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = seeds.copy()
        acc: dict[int, np.ndarray] = {}
        for r in means:
            acc.setdefault(r.cell_id, np.zeros(seeds.shape[1]))[r.pos] = r.m
        for cid, vec in acc.items():
            norm = np.linalg.norm(vec)
            if norm > 0:
                new[cid] = vec / norm
        seeds = new
    return seeds


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int = 6,
    n_cells: int = 32,
    rep: int = 3,
    kmeans_iters: int = 3,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search with a
    k-means coarse quantizer and corpus-side replication.

    Coarse quantizer: ``kmeans_cells`` — `kmeans_iters` Lloyd rounds run
    as DataFrame jobs (assign = broadcast-seed join + argmax cosine,
    update = groupBy cell + posexplode component mean), seeded from the
    n_cells smallest vec_ids for determinism. Every corpus vector is
    indexed under its `rep` nearest cells (closure/replication
    clustering, as in SPANN): on near-uniform data a true neighbor
    sitting just across a Voronoi boundary is the dominant recall
    loss, and replication recovers it without raising nprobe. Queries
    probe their `nprobe` nearest cells; exact cosine runs only inside
    probed cells, then duplicates from multi-assignment are collapsed
    before the final top-k window.

    Measured on the synthetic near-uniform fixture embeddings (the
    hard case — no cluster structure for the quantizer to exploit):
    recall@5 = 0.96 (sf0.01) / 0.89 (sf0.1) at the defaults, vs
    0.44/0.48 for the previous first-n-seeds quantizer at the same
    18.75% probe fraction (nprobe/n_cells = 6/32 ≡ 3/16). ~46% of the
    corpus is scored per query (probe fraction × rep, uniform data);
    on clustered real-world embeddings the same geometry scans far
    less because replicas concentrate in adjacent cells.

    Scale shape: each Lloyd round is ONE corpus scan ending in a
    bounded n_cells×dim collect (seed state only — the same bounded
    contract as the LSH plane sample); cell assignment is map-side
    (``_cell_topn`` — Arrow matmul against the in-closure seed
    matrix, zero shuffles); the search join is an equi-join on cell
    id. Nothing unbounded ever reaches the driver.
    """
    from chess_ratings_spark.operators.windows import topk_per_group

    seeds = kmeans_cells(vectors, n_cells=n_cells, iters=kmeans_iters)
    corpus_cells = _cell_topn(vectors, seeds, "cid", rep)
    query_cells = _cell_topn(queries, seeds, "qid", nprobe)
    pairs = query_cells.alias("q").join(
        corpus_cells.alias("c"),
        (F.col("q.cell_id") == F.col("c.cell_id")) & (F.col("q.qid") != F.col("c.cid")),
    ).select(
        "qid", "cid", cosine(F.col("q.embedding"), F.col("c.embedding")).alias("cos")
    ).dropDuplicates(["qid", "cid"])
    return topk_per_group(
        pairs, group=["qid"], order=[F.col("cos").desc(), F.col("cid")], k=k, rn_name="rank"
    )


def label_centroids(vectors: DataFrame, dims: int = 64) -> DataFrame:
    """Per-label centroid via posexplode + (label, pos) mean — the
    embedding-column aggregation pattern (mm_embedding_col)."""
    comp = vectors.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    return comp.groupBy("label", "pos").agg(
        F.avg(F.col("v").cast("double")).alias("mean_component"),
        F.count(F.lit(1)).alias("n"),
    )
