"""Training-data-pipeline queries: the operations a 100 TB LLM data
pipeline runs between raw crawl and tokenized shards — deterministic
corpus splitting, quality gating (Gopher-style rules), benchmark
contamination checks, normalization, chunking, and embedding-level
near-dup removal. All are column-expression plans (no Python on the row
path) except where vectors force an Arrow-batched UDF, and every
blocking step is an equi-join on a derived key — nothing is O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chess_ratings_spark import tables
from chess_ratings_spark.operators import similarity
from chess_ratings_spark.operators import text as text_ops
from chess_ratings_spark.registry import register

# ---------------------------------------------------------------------------
# Deterministic corpus split (train/val/test)
# ---------------------------------------------------------------------------


@register(
    "sample_hash_split",
    oracle="""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd'
                THEN 'val' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY split ORDER BY split
    """,
    doc="Deterministic train/val/test split by content-independent key "
    "hash: first md5 hex digit of the doc id buckets 12/2/2 of 16. "
    "Hash-based splits survive re-runs and late-arriving data "
    "(membership is a pure function of the key, never of row order "
    "or sampling state) — the only split discipline that works when "
    "the corpus is rebuilt incrementally at 100 TB. md5 is bit-equal "
    "across engines, so the oracle is exact.",
    tags=("training", "sample", "documents"),
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    c = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(c <= "b", "train").when(c <= "d", "val").otherwise("test").alias("split")
    )
    return (
        d.groupBy(split)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


@register(
    "sample_weighted_mix",
    oracle="""
    WITH t AS (
      SELECT lang, n_chars,
             substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 1) AS h,
             CASE WHEN lang = 'en' THEN 'f'
                  WHEN lang IN ('fr', 'de') THEN '7'
                  ELSE '3' END AS cutoff
      FROM documents
    )
    SELECT lang,
           CASE WHEN lang = 'en' THEN 1.0
                WHEN lang IN ('fr', 'de') THEN 0.5
                ELSE 0.25 END AS weight,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE h <= cutoff) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(n_chars) FILTER (WHERE h <= cutoff), 0) AS BIGINT)
             AS kept_chars
    FROM t GROUP BY lang, weight ORDER BY lang
    """,
    doc="Domain-weighted corpus mixing — the op that turns raw corpora "
    "into a training mixture: per-language sampling rates (en 1.0, "
    "fr/de 0.5, es/zh 0.25) applied as a deterministic hash-threshold "
    "on a salted doc-id md5 (first hex digit ≤ cutoff ⇒ keep; 16ths "
    "give exact rate fractions). Same discipline as sample_hash_split: "
    "membership is a pure function of the key, so the mix is stable "
    "under re-runs, repartitioning, and incremental corpus rebuilds — "
    "the only way a 100 TB mixture stays reproducible. Pure column "
    "expressions into one 5-group aggregate; the oracle replays the "
    "identical md5 math (bit-equal across engines).",
    tags=("training", "sample", "documents"),
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    cutoff = (
        F.when(F.col("lang") == "en", "f")
        .when(F.col("lang").isin("fr", "de"), "7")
        .otherwise("3")
    )
    weight = (
        F.when(F.col("lang") == "en", 1.0)
        .when(F.col("lang").isin("fr", "de"), 0.5)
        .otherwise(0.25)
    )
    h = F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 1
    )
    kept = h <= cutoff
    return (
        d.groupBy("lang", weight.alias("weight"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept.cast("bigint")).alias("n_kept"),
            F.coalesce(
                F.sum(F.when(kept, F.col("n_chars"))), F.lit(0)
            ).cast("bigint").alias("kept_chars"),
        )
        .orderBy("lang")
    )


@register(
    "sample_global_shuffle",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS key
      FROM documents
    )
    SELECT substr(key, 1, 1) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(arg_min(doc_id, key) AS BIGINT) AS first_doc,
           CAST(arg_max(doc_id, key) AS BIGINT) AS last_doc
    FROM t GROUP BY shard ORDER BY shard
    """,
    doc="Global training-data shuffle + sharding: every epoch-ready "
    "corpus needs its documents in an order UNCORRELATED with crawl/"
    "source order, stable across re-runs. Shuffle key = md5 of the "
    "salted doc id (content-independent, bit-equal across engines); "
    "shard = first hex digit (16 shards). At 100 TB this is "
    "repartitionByRange on the key + sortWithinPartitions — ONE "
    "shuffle, no global sort, and late-arriving docs land in the same "
    "shard position on rebuild. The result proves per-shard balance "
    "and the shuffle-order endpoints (min_by/max_by on the key) so a "
    "wrong ordering, not just a wrong partition count, hash-mismatches.",
    tags=("training", "sample", "documents"),
)
def sample_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    t = d.select("doc_id", "n_chars", key.alias("key"))
    return (
        t.groupBy(F.substring("key", 1, 1).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min_by("doc_id", "key").alias("first_doc"),
            F.max_by("doc_id", "key").alias("last_doc"),
        )
        .orderBy("shard")
    )


@register(
    "sample_quality_buckets",
    oracle="""
    WITH s AS (
      SELECT n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER () AS n
      FROM documents
    ), q AS (
      SELECT max(CASE WHEN rn = CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1
                      THEN n_chars END) AS q1,
             max(CASE WHEN rn = CAST(floor(0.50 * (n - 1)) AS BIGINT) + 1
                      THEN n_chars END) AS q2,
             max(CASE WHEN rn = CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1
                      THEN n_chars END) AS q3
      FROM s
    )
    SELECT CAST(1 + CASE WHEN n_chars > q1 THEN 1 ELSE 0 END
                  + CASE WHEN n_chars > q2 THEN 1 ELSE 0 END
                  + CASE WHEN n_chars > q3 THEN 1 ELSE 0 END AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents, q
    GROUP BY bucket ORDER BY bucket
    """,
    doc="Curriculum / quality binning: bucket documents into quartiles "
    "of a quality signal (n_chars here) by BOUNDARY ASSIGNMENT, not "
    "ntile — three quartile scalars are computed once and broadcast, "
    "then every document is assigned by three comparisons, so the "
    "assignment stage (the one that touches all 100 TB) is "
    "embarrassingly parallel with no global sort. The boundary job "
    "here is an exact discrete lower-bracket rank pick over the single "
    "quality column (identical float-free index math both engines — "
    "what makes the oracle exact); at production scale that one-column "
    "pass swaps to percentile_approx's mergeable sketch, changing only "
    "the boundary values' precision, never the assignment shape. Ties "
    "at a boundary go to the lower bucket on BOTH engines.",
    tags=("training", "sample", "documents"),
)
def sample_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = tables.load(spark, sf_dir, "documents")
    s = d.select(
        "n_chars",
        F.row_number()
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    q = s.agg(
        *[
            F.max(
                F.when(
                    F.col("rn")
                    == (F.floor(F.lit(p) * (F.col("n") - 1)) + 1),
                    F.col("n_chars"),
                )
            ).alias(name)
            for p, name in [(0.25, "q1"), (0.50, "q2"), (0.75, "q3")]
        ]
    )
    bucket = (
        F.lit(1)
        + (F.col("n_chars") > F.col("q1")).cast("int")
        + (F.col("n_chars") > F.col("q2")).cast("int")
        + (F.col("n_chars") > F.col("q3")).cast("int")
    ).alias("bucket")
    return (
        d.crossJoin(F.broadcast(q))
        .groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Quality gate (Gopher-style rules)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "to", "and")


@register(
    "filter_gopher_rules",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             length(replace(text, ' ', ''))
               * 1.0 / len(string_split(text, ' ')) AS mean_wlen,
             (SELECT max(c) FROM (
                SELECT count(*) AS c
                FROM unnest(string_split(text, ' ')) AS t(w) GROUP BY w))
               * 1.0 / len(string_split(text, ' ')) AS rep_ratio,
             len(list_intersect(string_split(text, ' '),
                 ['the', 'a', 'of', 'to', 'and'])) > 0 AS has_stop
      FROM documents
    ), v AS (
      SELECT doc_id,
             n_words < 20 OR n_words > 80 AS v_word_count,
             mean_wlen < 2.0 OR mean_wlen > 12.0 AS v_mean_word_len,
             rep_ratio > 0.2 AS v_repetition,
             NOT has_stop AS v_stopword
      FROM m
    )
    SELECT rule, violations FROM (
      SELECT 'word_count' AS rule,
             CAST(count(*) FILTER (v_word_count) AS BIGINT) AS violations, 0 AS ord
      FROM v
      UNION ALL SELECT 'mean_word_len',
             CAST(count(*) FILTER (v_mean_word_len) AS BIGINT), 1 FROM v
      UNION ALL SELECT 'repetition',
             CAST(count(*) FILTER (v_repetition) AS BIGINT), 2 FROM v
      UNION ALL SELECT 'stopword',
             CAST(count(*) FILTER (v_stopword) AS BIGINT), 3 FROM v
      UNION ALL SELECT 'kept',
             CAST(count(*) FILTER (NOT (v_word_count OR v_mean_word_len
                     OR v_repetition OR v_stopword)) AS BIGINT), 4 FROM v
    ) ORDER BY ord
    """,
    doc="Gopher-style document quality gate (Rae et al. 2021 §A1.1 "
    "rules re-expressed as column predicates): word-count bounds, "
    "mean word length bounds, max-repetition ratio, stopword "
    "presence. One scan computes every rule as a boolean column; the "
    "output is the per-rule violation census plus the kept count — "
    "the shape a 100 TB filter job reports before dropping rows. The "
    "repetition ratio (top token frequency / tokens) is a "
    "distinct-count over each doc's token array, computed in-expr "
    "with no shuffle.",
    tags=("training", "text", "documents"),
)
def filter_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    mean_wlen = F.length(F.regexp_replace("text", " ", "")) * F.lit(1.0) / n_words
    # Sorted-run fold, not the O(distinct x n) interpreted-HOF scan —
    # measured ~50x faster at sf0.1 (see operators/text.max_multiplicity).
    top_freq = text_ops.max_multiplicity(toks)
    rep_ratio = top_freq * F.lit(1.0) / n_words
    has_stop = F.arrays_overlap(toks, F.array(*[F.lit(w) for w in _STOPWORDS]))
    v = d.select(
        ((n_words < 20) | (n_words > 80)).alias("v_word_count"),
        ((mean_wlen < 2.0) | (mean_wlen > 12.0)).alias("v_mean_word_len"),
        (rep_ratio > 0.2).alias("v_repetition"),
        (~has_stop).alias("v_stopword"),
    )
    agg = v.agg(
        *[
            F.sum(F.col(c).cast("long")).alias(c)
            for c in ("v_word_count", "v_mean_word_len", "v_repetition", "v_stopword")
        ],
        F.sum(
            (
                ~(
                    F.col("v_word_count")
                    | F.col("v_mean_word_len")
                    | F.col("v_repetition")
                    | F.col("v_stopword")
                )
            ).cast("long")
        ).alias("kept"),
    )
    pairs = F.array(
        F.struct(F.lit("word_count").alias("rule"), F.col("v_word_count").alias("violations")),
        F.struct(F.lit("mean_word_len").alias("rule"), F.col("v_mean_word_len").alias("violations")),
        F.struct(F.lit("repetition").alias("rule"), F.col("v_repetition").alias("violations")),
        F.struct(F.lit("stopword").alias("rule"), F.col("v_stopword").alias("violations")),
        F.struct(F.lit("kept").alias("rule"), F.col("kept").alias("violations")),
    )
    return agg.select(F.explode(pairs).alias("kv")).select("kv.rule", "kv.violations")


# ---------------------------------------------------------------------------
# Benchmark contamination (n-gram overlap)
# ---------------------------------------------------------------------------


@register(
    "contamination_ngram",
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(list_transform(
               range(1, len(string_split(text, ' ')) - 2),
               i -> array_to_string(string_split(text, ' ')[i:i+3], ' '))) AS g
      FROM documents
    ), bench AS (
      SELECT DISTINCT g FROM sh WHERE doc_id % 25 = 0
    )
    SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_shared
    FROM sh
    WHERE g IN (SELECT g FROM bench) AND doc_id % 25 <> 0
    GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Benchmark-contamination check: flag corpus documents sharing "
    "any 4-gram with a held-out benchmark set (stand-in: doc_id%25). "
    "Shingles explode linearly, the benchmark shingle set is DISTINCT "
    "and broadcast, and matching is one equi-join on the shingle — "
    "the standard decontamination shape (GPT-3 appendix C) with no "
    "all-pairs comparison anywhere. At 100 TB the benchmark side is "
    "tiny and static, so the broadcast is unconditionally safe.",
    tags=("training", "text", "documents"),
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(similarity.shingles("text", width=4)).alias("g")
    )
    bench = sh.filter(F.col("doc_id") % 25 == 0).select("g").distinct()
    return (
        sh.filter(F.col("doc_id") % 25 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Normalization + chunking
# ---------------------------------------------------------------------------


@register(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(
                 lower('  ' || upper(substr(text, 1, 20)) || ' !! ' || text
                       || ' ?? '),
                 '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash,
           CAST(length(trim(regexp_replace(regexp_replace(
                 lower('  ' || upper(substr(text, 1, 20)) || ' !! ' || text
                       || ' ?? '),
                 '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS INT) AS n_chars_norm
    FROM documents ORDER BY doc_id
    """,
    doc="Text normalization pass: lowercase, strip non-alphanumerics, "
    "collapse runs of spaces, trim — over a deliberately dirtied "
    "input (upper-cased prefix + punctuation padding spliced around "
    "the fixture text) so each step is falsifiable; the md5 of the "
    "normalized form pins the exact output byte-for-byte against the "
    "oracle. Pure codegen expressions, no UDF.",
    tags=("training", "text", "documents"),
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit("  "),
        F.upper(F.substring("text", 1, 20)),
        F.lit(" !! "),
        F.col("text"),
        F.lit(" ?? "),
    )
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(dirty), "[^a-z0-9 ]", ""), " +", " ")
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("int").alias("n_chars_norm"),
    ).orderBy("doc_id")


@register(
    "doc_chunk_split",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST(len(toks[i * 24 + 1 : i * 24 + 32]) AS INT) AS n_tokens,
           md5(array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' ')) AS chunk_hash
    FROM w, unnest(range(0, CAST(floor((n - 1) / 24) AS BIGINT) + 1)) AS t(i)
    ORDER BY doc_id, chunk_idx
    """,
    doc="Context-window chunking: split each document into 32-token "
    "chunks with stride 24 (8-token overlap), the pre-tokenization "
    "shard shape. The chunk list is built per-row with "
    "sequence+slice (linear in tokens, no shuffle) and exploded; "
    "chunk md5 pins exact content. Final chunks may be short — the "
    "slice length is part of the checked output.",
    tags=("training", "text", "documents"),
)
def doc_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    chunks = F.expr(
        "transform(sequence(0, cast(floor((size(split(text, ' ')) - 1) / 24) as int)), "
        "i -> slice(split(text, ' '), i * 24 + 1, 32))"
    )
    return (
        d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size("chunk").cast("int").alias("n_tokens"),
            F.md5(F.concat_ws(" ", "chunk")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "udtf_doc_chunks",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST(len(toks[i * 24 + 1 : i * 24 + 32]) AS INT) AS n_tokens,
           md5(array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' ')) AS chunk_hash
    FROM w, unnest(range(0, CAST(floor((n - 1) / 24) AS BIGINT) + 1)) AS t(i)
    ORDER BY doc_id, chunk_idx
    """,
    doc="The UDF/UDAF/UDTF API surface, part 3 (SURVEY §2.9): "
    "doc_chunk_split's context-window chunking re-expressed as a "
    "registered Python UDTF consumed via SQL LATERAL join — one input "
    "row fans out to N chunk rows from imperative Python, the shape "
    "built-in generators can't express when the per-row logic is "
    "genuinely procedural (a real tokenizer, a parser). Same "
    "width-32/stride-24 rule and the same oracle as doc_chunk_split, "
    "so the UDTF path is value-checked against the pure-expression "
    "twin's contract. UDTFs are the slow path (Python worker per "
    "partition, row-at-a-time yield) — the expression twin remains "
    "the 100 TB plan; this entry exists to cover the API, exactly as "
    "udf_vector_norm (pandas UDF) and udf_grouped_trend (grouped-agg "
    "UDAF) do.",
    tags=("training", "text", "documents", "udtf"),
)
def udtf_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk_hash string")
    class DocChunks:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            n = len(toks)
            for k, s in enumerate(range(0, max(1, n), 24)):
                chunk = toks[s : s + 32]
                yield (
                    k,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    spark.udtf.register("crs_doc_chunks", DocChunks)
    d = tables.load(spark, sf_dir, "documents")
    d.createOrReplaceTempView("crs_udtf_docs")
    out = spark.sql(
        """
        SELECT d.doc_id, f.chunk_idx, f.n_tokens, f.chunk_hash
        FROM crs_udtf_docs d, LATERAL crs_doc_chunks(d.text) f
        ORDER BY doc_id, chunk_idx
        """
    )
    spark.catalog.dropTempView("crs_udtf_docs")
    return out


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup removal
# ---------------------------------------------------------------------------


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 10000000 AS vec_id,
             list_transform(embedding,
               (x, i) -> CAST(CAST(x AS DOUBLE) + (((i - 1) % 7) - 3) * 0.001 AS FLOAT)) AS embedding
      FROM embeddings WHERE vec_id % 100 = 0
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(list_zip(a.embedding, a.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
             * sqrt(list_sum(list_transform(list_zip(b.embedding, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))) >= 0.9
    )
    SELECT id_b AS dropped_id, min(id_a) AS kept_id
    FROM pairs GROUP BY id_b ORDER BY dropped_id
    """,
    doc="Embedding-cosine near-dup removal: drop every vector that has "
    "a smaller-id neighbor at cosine ≥ 0.9 and report (dropped, "
    "kept-representative) — the min-id survivor rule, a well-defined "
    "deterministic policy that needs no iterative clustering. "
    "Candidates come from sign-bit LSH banding (equi-join on band "
    "keys, no O(n²)); exact cosine verifies each candidate. Corpus = "
    "embeddings + planted near-identical copies (the fixture alone "
    "has no pair above cos≈0.48); the oracle brute-forces the same "
    "corpus.",
    tags=("training", "similarity", "embeddings"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.plans.llm_tier import _with_planted_neardups

    e = tables.load(spark, sf_dir, "embeddings")
    # signbit_lsh_pairs consumes its input 5 ways (count for band
    # sizing, the 512-row mean sample, the band pass, and both sides of
    # the exact-cosine verify join) — checkpoint the planted union once
    # instead of re-running scan+union+transform per consumer (16
    # parquet scans in the round-15 before-plan)
    corpus = _with_planted_neardups(e).localCheckpoint(eager=True)
    pairs = similarity.signbit_lsh_pairs(corpus, tau=0.9)
    return (
        pairs.groupBy(F.col("id_b").alias("dropped_id"))
        .agg(F.min("id_a").alias("kept_id"))
        .orderBy("dropped_id")
    )


# ---------------------------------------------------------------------------
# Corpus statistics: distinctive terms (TF-IDF)
# ---------------------------------------------------------------------------


@register(
    "text_idf_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), df_t AS (
      SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY token
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT lang, tok.token,
             round(count(*) * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
      FROM tok JOIN df_t ON tok.token = df_t.token, n
      GROUP BY lang, tok.token, df, n_docs
    )
    SELECT lang, token, score, CAST(rnk AS INT) AS rnk FROM (
      SELECT lang, token, score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score DESC, token) AS rnk
      FROM scored
    ) WHERE rnk <= 5 ORDER BY lang, rnk
    """,
    doc="Distinctive vocabulary per language: corpus-frequency TF × "
    "ln(N/df) IDF, top-5 per lang with a (score, token) tie-break. "
    "One scan of documents: per-(token, doc) counts collapse to "
    "per-(token, lang) tf/doc-counts, token-level df is a window sum "
    "over that vocab-sized frame (no re-scan self-join), and N is a "
    "1-row in-plan aggregate broadcast-cross-joined — no separate "
    "count() driver action. Scores are integer counts × a log whose "
    "last-ulp engine variation is absorbed by round(6). The shape "
    "generalizes to per-domain vocabulary drift reports at corpus "
    "scale.",
    tags=("training", "text", "documents"),
)
def text_idf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = tables.load(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
    # one token shuffle; (token, doc_id) is unique after this (a doc has
    # one lang), so df per token = count of rows, tf per lang = sum(c)
    per_doc = tok.groupBy("token", "lang", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    lt = per_doc.groupBy("token", "lang").agg(
        F.sum("c").alias("tf"), F.count(F.lit(1)).alias("df_lang")
    )
    wt = Window.partitionBy("token")
    scored = (
        lt.withColumn("df", F.sum("df_lang").over(wt))
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "token", "score", F.col("rnk").cast("int").alias("rnk"))
        .orderBy("lang", "rnk")
    )


# ---------------------------------------------------------------------------
# End-to-end corpus preparation capstone
# ---------------------------------------------------------------------------


@register(
    "corpus_prepare",
    oracle="""
    WITH m AS (
      SELECT doc_id, text, n_chars,
             len(string_split(text, ' ')) AS n_words,
             length(replace(text, ' ', ''))
               * 1.0 / len(string_split(text, ' ')) AS mean_wlen,
             (SELECT max(c) FROM (
                SELECT count(*) AS c
                FROM unnest(string_split(text, ' ')) AS t(w) GROUP BY w))
               * 1.0 / len(string_split(text, ' ')) AS rep_ratio,
             len(list_intersect(string_split(text, ' '),
                 ['the', 'a', 'of', 'to', 'and'])) > 0 AS has_stop
      FROM documents
    ), kept AS (
      SELECT doc_id, text, n_chars FROM m
      WHERE n_words BETWEEN 20 AND 80 AND mean_wlen BETWEEN 2.0 AND 12.0
        AND rep_ratio <= 0.2 AND has_stop
    ), sh AS (
      SELECT doc_id,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                            FOR i IN range(1, len(t) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM kept)
    ), ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh
    ), dup AS (
      SELECT DISTINCT b.doc_id
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
      HAVING CAST(count(*) AS DOUBLE)
               / (a.n_sh + b.n_sh - count(*)) >= 0.8
    ), final AS (
      SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM dup)
    )
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd'
                THEN 'val' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM final GROUP BY split ORDER BY split
    """,
    doc="End-to-end corpus preparation capstone — the full pre-training "
    "data path in one plan: Gopher-rule quality gate → MinHash-LSH "
    "near-dup removal at τ=0.8 (smaller-id survivor rule, LSH "
    "candidates + exact-jaccard verify, computed on the kept subset) "
    "→ deterministic md5 train/val/test split → per-split token "
    "census. Every stage is the already-verified operator; the "
    "capstone checks they compose without re-materialization. The "
    "oracle replays the identical pipeline in SQL (brute-force "
    "inverted-index dedup).",
    tags=("training", "text", "dedup", "documents"),
)
def corpus_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    mean_wlen = F.length(F.regexp_replace("text", " ", "")) * F.lit(1.0) / n_words
    # Sorted-run fold, not the O(distinct x n) interpreted-HOF scan —
    # measured ~50x faster at sf0.1 (see operators/text.max_multiplicity).
    top_freq = text_ops.max_multiplicity(toks)
    has_stop = F.arrays_overlap(toks, F.array(*[F.lit(w) for w in _STOPWORDS]))
    # the quality gate (with its sorted-run max_multiplicity fold) feeds
    # three consumers (both semi-join sides of the dup restriction and
    # the final census); checkpoint so it runs once (guide §3.3)
    kept = (
        d.filter(
            n_words.between(20, 80)
            & (mean_wlen >= 2.0)
            & (mean_wlen <= 12.0)
            & (top_freq * F.lit(1.0) / n_words <= 0.2)
            & has_stop
        )
        .select("doc_id", "text", "n_chars")
        .localCheckpoint(eager=True)
    )
    # Reuse the SESSION-SHARED verified pair graph (llm_tier's cache,
    # already serving both CC variants + keep_representatives) instead
    # of building a second minhash pipeline over the kept subset:
    # jaccard is pairwise, so full-corpus pairs restricted to kept x
    # kept ARE the kept-subset pairs — identical result, one pipeline
    # fill per session instead of two (measured ~2-3s off this query).
    from chess_ratings_spark.plans.llm_tier import shared_verified_pairs

    kept_ids = kept.select("doc_id")
    dup = (
        shared_verified_pairs(spark, sf_dir, tau=0.8)
        .join(kept_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(kept_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    final = kept.join(dup, "doc_id", "left_anti")
    c = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(c <= "b", "train").when(c <= "d", "val").otherwise("test").alias("split")
    )
    return (
        final.groupBy(split)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("split")
    )


@register(
    "dedup_exact_hash",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 40 = 0
    ), h AS (
      SELECT doc_id, sha256(text) AS content_hash FROM corpus
    ), g AS (
      SELECT content_hash, min(doc_id) AS keeper,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM h GROUP BY content_hash
    )
    SELECT CAST(count(*) AS BIGINT) AS n_distinct_contents,
           CAST(sum(n_copies) AS BIGINT) AS n_docs,
           CAST(sum(n_copies - 1) AS BIGINT) AS n_exact_dups,
           CAST(max(n_copies) AS INT) AS max_copies
    FROM g
    """,
    doc="Exact content dedup by cryptographic hash (the first pass of "
    "every dedup cascade — byte-identical copies drop before any "
    "LSH): sha256(text) group-by with min-id keeper, reported as the "
    "dedup census. The corpus unions byte-identical copies of every "
    "40th document (the fixture has only NEAR-dups, so the exact "
    "census would otherwise be unfalsifiable). The hash group-by shuffles 32-byte digests, not "
    "documents — at 100 TB the shuffle moves ~0.03% of corpus bytes. "
    "sha256 is bit-equal across engines, so the oracle is exact.",
    tags=("training", "dedup", "documents"),
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(planted)
    g = (
        corpus.select(F.sha2("text", 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_distinct_contents"),
        F.sum("n_copies").alias("n_docs"),
        F.sum(F.col("n_copies") - 1).alias("n_exact_dups"),
        F.max("n_copies").cast("int").alias("max_copies"),
    )


def _bpe_iter_sql(k: int) -> str:
    """One unrolled BPE iteration k (CTEs p{k}/t{k}/w{k} over w{k-1})."""
    return f"""
    p{k} AS (
      SELECT unnest(list_transform(range(1, len(syms)),
                    i -> syms[i] || ' ' || syms[i+1])) AS pair, freq
      FROM (SELECT string_split(regexp_replace(rep, '^<|>$', '', 'g'), '><')
                     AS syms, freq
            FROM w{k - 1})
    ), t{k} AS (
      SELECT string_split(pair, ' ')[1] AS a,
             string_split(pair, ' ')[2] AS b, cnt
      FROM (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
            FROM p{k} GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1)
    ), w{k} AS (
      SELECT replace(rep, '<' || a || '><' || b || '>',
                     '<' || a || b || '>') AS rep, freq
      FROM w{k - 1}, t{k}
    ), s{k} AS (
      SELECT {k} AS step, a AS merge_a, b AS merge_b, a || b AS merged,
             cnt AS pair_count,
             (SELECT CAST(sum(freq * len(string_split(
                  regexp_replace(rep, '^<|>$', '', 'g'), '><'))) AS BIGINT)
              FROM w{k}) AS corpus_symbols_after
      FROM t{k}
    )"""


@register(
    "text_bpe_merges",
    oracle="""
    WITH w0 AS (
      SELECT regexp_replace(word, '(.)', '<\\1>', 'g') AS rep, freq FROM (
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS word
          FROM documents
        ) WHERE regexp_matches(word, '^[a-z]+$') GROUP BY word)
    ),"""
    + ",".join(_bpe_iter_sql(k) for k in (1, 2, 3))
    + """
    SELECT CAST(step AS INT) AS step, merge_a, merge_b, merged,
           pair_count, corpus_symbols_after
    FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
          UNION ALL SELECT * FROM s3)
    ORDER BY step
    """,
    doc="BPE tokenizer training as DataFrame jobs (Sennrich et al. "
    "2016): 3 greedy merge iterations over the corpus word-frequency "
    "table. Each iteration is (a) adjacent-symbol pair counts — one "
    "explode + grouped sum, weighted by word frequency, the shape "
    "that scales because it runs over the VOCABULARY (distinct "
    "words), not the corpus; (b) argmax pair with (count desc, pair "
    "asc) tie-break — a 1-row TakeOrdered broadcast back; (c) the "
    "greedy non-overlapping left-to-right merge, executed as a "
    "LITERAL string replace over the bracketed symbol encoding "
    "'<s><y><m>' — '<' anchors every match to a symbol start (no "
    "mid-symbol false hits), and literal replace() is left-to-right "
    "non-overlapping in BOTH engines, which IS the BPE merge rule — "
    "no regex, no UDF, no driver loop over words. The per-step "
    "chosen merge, its count, and the corpus symbol total after "
    "applying it are all exact integers; the oracle unrolls the same "
    "3 iterations as chained CTEs. Vocabulary state is "
    "localCheckpoint'd between iterations (vocab-sized, "
    "executor-resident) so lineage stays linear in K, exactly the "
    "graph-loop hygiene used by PageRank/CC.",
    tags=("training", "text", "documents"),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.text import sliding_concat

    d = tables.load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.regexp_replace("word", "(.)", "<$1>").alias("rep"), "freq")
    )
    cur = words.localCheckpoint(eager=True)  # vocab-sized, executor-side
    steps = []
    for step in (1, 2, 3):
        syms = F.split(F.regexp_replace("rep", "^<|>$", ""), "><")
        pairs = cur.select(F.explode(sliding_concat(syms, 2)).alias("pair"), "freq")
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "pair")
            .limit(1)
            .select(
                F.split("pair", " ")[0].alias("a"),
                F.split("pair", " ")[1].alias("b"),
                "pair_count",
            )
        )
        nxt = (
            cur.crossJoin(F.broadcast(top))
            .select(
                F.expr(
                    "replace(rep, '<' || a || '><' || b || '>',"
                    " '<' || a || b || '>')"
                ).alias("rep"),
                "freq",
            )
            .localCheckpoint(eager=True)
        )
        sym_total = nxt.select(
            F.sum(
                F.col("freq")
                * F.size(F.split(F.regexp_replace("rep", "^<|>$", ""), "><"))
            )
            .cast("bigint")
            .alias("corpus_symbols_after")
        )
        steps.append(
            top.crossJoin(sym_total).select(
                F.lit(step).cast("int").alias("step"),
                F.col("a").alias("merge_a"),
                F.col("b").alias("merge_b"),
                F.concat("a", "b").alias("merged"),
                "pair_count",
                "corpus_symbols_after",
            )
        )
        cur = nxt
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out.orderBy("step")


@register(
    "ml_gd_classifier",
    oracle="""
    WITH f AS (
      SELECT CAST(floor(value * 100) AS BIGINT) % 256 AS x,
             CASE WHEN event_type IN ('purchase', 'signup')
                  THEN 1 ELSE 0 END AS y
      FROM events
    ),
    g1 AS (
      SELECT CAST(sum(x * (h - y * 1048576)) AS BIGINT) AS gw,
             CAST(sum(h - y * 1048576) AS BIGINT) AS gb,
             CAST(sum((h - y * 1048576) * (h - y * 1048576)) AS BIGINT)
               AS loss,
             CAST(count(*) AS BIGINT) AS n
      FROM (SELECT x, y,
                   (least(greatest(x * 0 + 0, -2097152), 2097152)
                    + 2097152) // 4 AS h
            FROM f)
    ),
    p1 AS (SELECT 0 - gw // (n * 65536) AS w,
                  0 - gb // (n * 256) AS b, loss FROM g1),
    g2 AS (
      SELECT CAST(sum(x * (h - y * 1048576)) AS BIGINT) AS gw,
             CAST(sum(h - y * 1048576) AS BIGINT) AS gb,
             CAST(sum((h - y * 1048576) * (h - y * 1048576)) AS BIGINT)
               AS loss,
             CAST(count(*) AS BIGINT) AS n,
             max(w) AS w, max(b) AS b
      FROM (SELECT f.x, f.y, p1.w, p1.b,
                   (least(greatest(f.x * p1.w + p1.b, -2097152), 2097152)
                    + 2097152) // 4 AS h
            FROM f, p1)
    ),
    p2 AS (SELECT w - gw // (n * 65536) AS w,
                  b - gb // (n * 256) AS b, loss FROM g2),
    g3 AS (
      SELECT CAST(sum(x * (h - y * 1048576)) AS BIGINT) AS gw,
             CAST(sum(h - y * 1048576) AS BIGINT) AS gb,
             CAST(sum((h - y * 1048576) * (h - y * 1048576)) AS BIGINT)
               AS loss,
             CAST(count(*) AS BIGINT) AS n,
             max(w) AS w, max(b) AS b
      FROM (SELECT f.x, f.y, p2.w, p2.b,
                   (least(greatest(f.x * p2.w + p2.b, -2097152), 2097152)
                    + 2097152) // 4 AS h
            FROM f, p2)
    ),
    p3 AS (SELECT w - gw // (n * 65536) AS w,
                  b - gb // (n * 256) AS b, loss FROM g3)
    SELECT 1 AS step, CAST(w AS BIGINT) AS w, CAST(b AS BIGINT) AS b,
           loss FROM p1
    UNION ALL SELECT 2, CAST(w AS BIGINT), CAST(b AS BIGINT), loss FROM p2
    UNION ALL SELECT 3, CAST(w AS BIGINT), CAST(b AS BIGINT), loss FROM p3
    ORDER BY step
    """,
    doc="Distributed iterative model training as DataFrame jobs: 3 "
    "full-batch gradient-descent steps on a hard-sigmoid classifier "
    "(h = clamp(z/4 + 1/2, 0, 1), purchase/signup as the positive "
    "class), ENTIRELY in exact integer fixed point (scale 2^20, "
    "truncating `div` for the learning-rate steps, clamp before "
    "shift keeps every intermediate in [0, 4S]) — no libm anywhere, "
    "so both engines replay bit-identical parameter trajectories "
    "and the driver hash pins all three (w, b, pre-update loss) "
    "rows. The hard sigmoid is the piecewise-RATIONAL surrogate "
    "that makes a nonlinear-classifier GD exactly oracle-able "
    "where exp/sigmoid floor-grids would gamble on 1.8M boundary "
    "draws per run. Unlike the closed-form ml_linear_trend_exact, "
    "the clamp makes each gradient data-dependent on the current "
    "parameters, so every step is a genuine distributed pass: "
    "parameters ride as a broadcast 1-row frame (BPE's in-plan "
    "scalar pattern), each iteration is one crossJoin + "
    "partial/final aggregate over events, and localCheckpoint "
    "truncates lineage between steps — no driver-side data, loss "
    "strictly decreasing (asserted in pytest). At 100 TB this is "
    "the shape of any sufficient-statistics-free training loop: "
    "per-step cost = one scan + one combinable aggregate.",
    tags=("ml", "iterative", "events"),
)
def ml_gd_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    S = 1 << 20
    LRW = 1 << 16
    LRB = 1 << 8
    ev = tables.load(spark, sf_dir, "events")
    feats = ev.selectExpr(
        "CAST(floor(value * 100) AS BIGINT) % 256 AS x",
        "CAST(CASE WHEN event_type IN ('purchase', 'signup')"
        " THEN 1 ELSE 0 END AS BIGINT) AS y",
    )
    params = tables.local_table(
        spark, [(0, 0)], [("w", "bigint"), ("b", "bigint")]
    )
    steps = []
    for step in (1, 2, 3):
        j = feats.crossJoin(F.broadcast(params)).selectExpr(
            "x",
            "y",
            "w",
            "b",
            f"(least(greatest(x * w + b, {-2 * S}), {2 * S}) + {2 * S})"
            " div 4 AS h",
        )
        a = j.groupBy("w", "b").agg(
            F.sum(F.expr(f"x * (h - y * {S})")).alias("gw"),
            F.sum(F.expr(f"h - y * {S}")).alias("gb"),
            F.sum(F.expr(f"(h - y * {S}) * (h - y * {S})")).alias("loss"),
            F.count(F.lit(1)).alias("n"),
        )
        new = a.selectExpr(
            f"w - (gw div (n * {LRW})) AS w",
            f"b - (gb div (n * {LRB})) AS b",
            "loss",
        ).localCheckpoint()
        steps.append(
            new.selectExpr(f"{step} AS step", "w", "b", "loss")
        )
        params = new.select("w", "b")
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out.orderBy("step")


@register(
    "train_pack_sequences",
    oracle="""
    WITH d AS (
      SELECT source, doc_id,
             CAST(length(text) - length(replace(text, ' ', '')) + 1
                  AS BIGINT) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    )
    SELECT source,
           CAST((cum - n_tok) // 256 AS BIGINT) AS block_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE (cum - 1) // 256 > (cum - n_tok) // 256)
                AS BIGINT) AS n_spanning,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM c GROUP BY source, block_id
    """,
    doc="GPT-style sequence packing census (concat-and-chunk, the "
    "dominant pretraining batch layout): within each source shard, "
    "documents are concatenated in deterministic doc_id order and cut "
    "into fixed 256-token training blocks; each doc's block is "
    "derived from its exclusive running token total (block_id = "
    "prefix_sum // L), and a doc SPANS a block boundary when its "
    "first and last token land in different blocks — the rows a "
    "packer must either split or mask across the attention boundary. "
    "Packing is PARTITIONED BY SOURCE, which is the scale-honest "
    "shape: a global concat order would funnel the prefix sum through "
    "one reducer, while per-shard packing (what real pipelines do — "
    "shards are the unit of data loading) keeps the window shuffle "
    "keyed on source and each shard's running sum independent. Token "
    "counts are whitespace counts replayed exactly by the oracle; "
    "output is the per-(source, block) fill census: docs starting in "
    "the block, boundary-spanners, and tokens contributed.",
    tags=("training", "documents", "packing"),
)
def train_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    L = 256
    d = tables.load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("bigint")
        .alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.groupBy(
            "source",
            F.floor((F.col("cum") - F.col("n_tok")) / L)
            .cast("bigint")
            .alias("block_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (
                    F.floor((F.col("cum") - 1) / L)
                    > F.floor((F.col("cum") - F.col("n_tok")) / L)
                ).cast("bigint")
            ).alias("n_spanning"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


@register(
    "sample_epoch_reshuffle",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)), 1, 1) AS s0,
             substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 1) AS s1
      FROM documents
    ),
    u AS (
      SELECT 0 AS epoch, s0 AS shard, n_chars, s0 <> s1 AS moved FROM t
      UNION ALL
      SELECT 1, s1, n_chars, s0 <> s1 FROM t
    )
    SELECT CAST(epoch AS INT) AS epoch, shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(*) FILTER (WHERE moved) AS BIGINT) AS n_moved
    FROM u GROUP BY 1, 2
    """,
    doc="Per-epoch reshuffle — multi-epoch training needs a DIFFERENT "
    "document permutation each epoch (same order twice overfits "
    "batch statistics) that is still deterministic per (epoch, doc) "
    "so a preempted run resumes identically: shard_e(doc) = first "
    "hex digit of md5('epoch{e}:' || doc_id), content-independent "
    "and seedable without moving or re-reading any data (the epoch "
    "salt changes the key, not the corpus). The census proves both "
    "properties: per-shard balance within each epoch AND n_moved "
    "(docs whose epoch-0 and epoch-1 shards differ — expected "
    "15/16 of the corpus), so an implementation that forgot the "
    "salt (identical permutations, n_moved = 0) hash-mismatches. "
    "Pure projection + one grouped agg; at 100 TB the assignment "
    "rides the shard write as repartitionByRange on the epoch key, "
    "exactly like sample_global_shuffle.",
    tags=("training", "sample", "documents"),
)
def sample_epoch_reshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def shard(e: int):
        return F.substring(
            F.md5(F.concat(F.lit(f"epoch{e}:"), F.col("doc_id").cast("string"))),
            1,
            1,
        )

    t = d.select(
        "doc_id", "n_chars", shard(0).alias("s0"), shard(1).alias("s1")
    )
    u = t.select(
        F.lit(0).alias("epoch"),
        F.col("s0").alias("shard"),
        "n_chars",
        (F.col("s0") != F.col("s1")).alias("moved"),
    ).unionByName(
        t.select(
            F.lit(1).alias("epoch"),
            F.col("s1").alias("shard"),
            "n_chars",
            (F.col("s0") != F.col("s1")).alias("moved"),
        )
    )
    return u.groupBy(F.col("epoch").cast("int").alias("epoch"), "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.col("moved").cast("bigint")).alias("n_moved"),
    )


@register(
    "train_collate_batches",
    oracle="""
    WITH d AS (
      SELECT source, doc_id,
             least(CAST(length(text) - length(replace(text, ' ', '')) + 1
                        AS BIGINT), 128) AS l
      FROM documents
    ),
    arrival AS (
      SELECT source, l,
             (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)
               // 8 AS batch_id
      FROM d
    ),
    bylen AS (
      SELECT source, l,
             (row_number() OVER (PARTITION BY source ORDER BY l DESC, doc_id)
               - 1) // 8 AS batch_id
      FROM d
    ),
    u AS (
      SELECT 'arrival' AS strategy, * FROM arrival
      UNION ALL
      SELECT 'sorted', * FROM bylen
    ),
    u2 AS (
      SELECT *, max(l) OVER (PARTITION BY strategy, source, batch_id) AS lmb
      FROM u
    )
    SELECT strategy, source, CAST(batch_id AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(max(l) AS BIGINT) AS l_max,
           CAST(sum(lmb - l) AS BIGINT) AS pad_tokens
    FROM u2 GROUP BY strategy, source, batch_id
    """,
    doc="Batch collation census — the pad-waste accounting that "
    "motivates length-bucketed batching, the last data decision "
    "before tensors: docs are collated 8 per batch (per source "
    "shard, token lengths capped at L=128) under two strategies — "
    "arrival order (doc_id) vs length-sorted — and each batch "
    "reports rows, its max length (the padded width), and "
    "pad_tokens = sum(l_max - l), the tokens burned as padding. "
    "Sorting by length makes within-batch lengths homogeneous, so "
    "total pad collapses (asserted in pytest); everything is window "
    "math partitioned by (strategy, source) — no UDF, no global "
    "funnel, and the oracle replays the identical expressions.",
    tags=("training", "documents", "packing"),
)
def train_collate_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = tables.load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.least(
            (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                + 1
            ).cast("bigint"),
            F.lit(128),
        ).alias("l"),
    )

    def batched(order_cols, strategy):
        w = Window.partitionBy("source").orderBy(*order_cols)
        return d.select(
            F.lit(strategy).alias("strategy"),
            "source",
            "l",
            F.floor((F.row_number().over(w) - 1) / 8)
            .cast("bigint")
            .alias("batch_id"),
        )

    u = batched([F.col("doc_id")], "arrival").unionByName(
        batched([F.col("l").desc(), F.col("doc_id")], "sorted")
    )
    wb = Window.partitionBy("strategy", "source", "batch_id")
    return (
        u.withColumn("l_max_b", F.max("l").over(wb))
        .groupBy("strategy", "source", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("l").alias("l_max"),
            F.sum(F.col("l_max_b") - F.col("l")).alias("pad_tokens"),
        )
    )


@register(
    "dedup_semdedup",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 10000000 AS vec_id,
             list_transform(embedding,
               (x, i) -> CAST(CAST(x AS DOUBLE) + (((i - 1) % 7) - 3) * 0.001 AS FLOAT)) AS embedding
      FROM embeddings WHERE vec_id % 100 = 0
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(list_zip(a.embedding, a.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
             * sqrt(list_sum(list_transform(list_zip(b.embedding, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))) >= 0.9
    )
    SELECT CAST(count(DISTINCT id_b) AS BIGINT) AS n_true_dropped,
           true AS drops_subset_ok,
           true AS recall_ok
    FROM pairs
    """,
    doc="SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic "
    "dedup that makes the pair search tractable by CLUSTERING first — "
    "k-means cells over the embedding corpus (operators/similarity.py"
    "::kmeans_cells, the same coarse quantizer as sim_ann_ivf), then "
    "exact pairwise cosine ONLY within each cell via a per-cluster "
    "numpy matmul in applyInPandas (cluster sizes are bounded at "
    "~192 by scaling n_cells with |corpus|, so per-group work is "
    "O(192²·d) regardless of total scale — the O(n²/k) shape that "
    "makes embedding dedup feasible at 100 TB where the global "
    "pairwise is impossible). Drop rule: any vector with a smaller-id "
    "within-cell neighbor at cos ≥ 0.9. Certified against the GLOBAL "
    "exact near-dup truth (the LSH-banded pair finder "
    "dedup_embedding_cosine already brute-force-verifies): every "
    "SemDeDup drop must be a true near-dup (drops_subset_ok — "
    "within-cell pairs are exact-cosine-verified, so clustering can "
    "only lose pairs, never invent them) and it must recover ≥90% of "
    "the true drop set (recall_ok; the loss mode is a near-dup pair "
    "straddling a Voronoi boundary). The oracle brute-forces the "
    "planted-neardup corpus for the exact n_true_dropped and pins "
    "both certifications.",
    tags=("training", "similarity", "embeddings", "dedup"),
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from chess_ratings_spark.plans.llm_tier import _with_planted_neardups

    tau = 0.9
    e = tables.load(spark, sf_dir, "embeddings")
    # the planted-neardup union is consumed ~9 times (count, k-means
    # init + 2 Lloyd rounds, cell assignment, LSH band pass, and the
    # two exact-verify joins of signbit_lsh_pairs) — without
    # materialization each consumer re-scans parquet and re-runs the
    # union+transform lineage (20 scans in the round-15 before-plan).
    # One checkpoint of the O(n·d) input collapses that (guide §3.3).
    corpus = _with_planted_neardups(e).localCheckpoint(eager=True)
    n = corpus.count()  # bounded 1-row scalar: sizes the cell count
    n_cells = max(16, n // 192)
    # 2 Lloyd rounds: recall was 1.0 at 1/2/3 rounds on both fixture
    # generations (the planted pairs sit at cos≈0.999, far inside any
    # cell), and each extra round is one full corpus scan + seed collect
    seeds = similarity.kmeans_cells(corpus, n_cells=n_cells, iters=2)
    cells = similarity._cell_topn(corpus, seeds, "vec_id", 1)

    def cell_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                                 "id_b": np.array([], dtype=np.int64)})
        x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        sim = x @ x.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sim[iu, ju] >= tau
        a, b = ids[iu[hit]], ids[ju[hit]]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)}
        )

    sem_pairs = (
        cells.select("vec_id", "cell_id", "embedding")
        .groupBy("cell_id")
        .applyInPandas(cell_pairs, "id_a bigint, id_b bigint")
    )
    sem_drops = (
        sem_pairs.select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("in_s", F.lit(1))
    )
    true_drops = (
        similarity.signbit_lsh_pairs(corpus, tau=tau)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("in_t", F.lit(1))
    )
    # one action over a full-outer membership join: both pipelines run
    # exactly once (the sim_ann_ivf pattern)
    return sem_drops.join(true_drops, "vec_id", "full").agg(
        F.count("in_t").cast("bigint").alias("n_true_dropped"),
        (
            F.count(F.when(F.col("in_t").isNull() & F.col("in_s").isNotNull(), 1))
            == 0
        ).alias("drops_subset_ok"),
        (F.count("in_s") >= F.ceil(F.count("in_t") * 0.9)).alias("recall_ok"),
    )


@register(
    "text_bpe_encode",
    oracle="""
    WITH w0 AS (
      SELECT regexp_replace(word, '(.)', '<\\1>', 'g') AS rep, freq FROM (
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS word
          FROM documents
        ) WHERE regexp_matches(word, '^[a-z]+$') GROUP BY word)
    ),"""
    + ",".join(_bpe_iter_sql(k) for k in (1, 2, 3))
    + """
    , h0 AS (
      SELECT source, regexp_replace(word, '(.)', '<\\1>', 'g') AS rep,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(strlen(word) AS BIGINT) AS nch
      FROM (
        SELECT source, unnest(string_split(lower(text), ' ')) AS word
        FROM documents WHERE doc_id % 10 = 7
      ) WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY source, word
    ), h1 AS (
      SELECT source, replace(rep, '<' || a || '><' || b || '>',
                             '<' || a || b || '>') AS rep, freq, nch
      FROM h0, t1
    ), h2 AS (
      SELECT source, replace(rep, '<' || a || '><' || b || '>',
                             '<' || a || b || '>') AS rep, freq, nch
      FROM h1, t2
    ), h3 AS (
      SELECT source, replace(rep, '<' || a || '><' || b || '>',
                             '<' || a || b || '>') AS rep, freq, nch
      FROM h2, t3
    )
    SELECT source,
           CAST(sum(freq) AS BIGINT) AS n_words,
           CAST(sum(freq * nch) AS BIGINT) AS n_chars,
           CAST(sum(freq * len(string_split(
               regexp_replace(rep, '^<|>$', '', 'g'), '><'))) AS BIGINT)
             AS n_tokens,
           CAST((sum(freq * len(string_split(
               regexp_replace(rep, '^<|>$', '', 'g'), '><'))) * 1000000)
               // sum(freq * nch) AS BIGINT) AS tokens_per_char_e6
    FROM h3 GROUP BY source ORDER BY source
    """,
    doc="BPE tokenizer APPLICATION — the other half of text_bpe_merges: "
    "the 3 merges trained on the full corpus vocabulary are applied, "
    "in training order, to a held-out slice (doc_id % 10 = 7), and "
    "the per-source fertility census (words, characters, tokens, "
    "tokens-per-char on an exact e6 grid) comes back. This is the "
    "every-pretraining-pipeline question 'what does the tokenizer do "
    "to MY data': encode runs at (source, word)-vocabulary "
    "granularity — the same literal-replace merge rule as training "
    "(left-to-right non-overlapping in both engines, '<' anchoring "
    "every match to a symbol start) applied via 1-row broadcast joins "
    "(one per merge, K=3), so the corpus is never exploded to "
    "characters and the merge table never shuffles anything. The "
    "oracle re-derives the SAME merges with the training CTE chain, "
    "then replays the encode — so a drifted merge order, a "
    "wrong-order application, or an overlapping-replace divergence "
    "all hash-mismatch. At 100 TB: train on the vocab once, encode "
    "is an embarrassingly parallel map with a K-row broadcast — the "
    "exact production shape.",
    tags=("training", "text", "documents"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chess_ratings_spark.operators.text import sliding_concat

    d = tables.load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.regexp_replace("word", "(.)", "<$1>").alias("rep"), "freq")
    )
    cur = words.localCheckpoint(eager=True)
    tops = []
    for _step in (1, 2, 3):
        syms = F.split(F.regexp_replace("rep", "^<|>$", ""), "><")
        pairs = cur.select(F.explode(sliding_concat(syms, 2)).alias("pair"), "freq")
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "pair")
            .limit(1)
            .select(
                F.split("pair", " ")[0].alias("a"),
                F.split("pair", " ")[1].alias("b"),
            )
            .localCheckpoint(eager=True)  # pin the learned merge (1 row)
        )
        tops.append(top)
        cur = (
            cur.crossJoin(F.broadcast(top))
            .select(
                F.expr(
                    "replace(rep, '<' || a || '><' || b || '>',"
                    " '<' || a || b || '>')"
                ).alias("rep"),
                "freq",
            )
            .localCheckpoint(eager=True)
        )
    held = (
        d.filter(F.col("doc_id") % 10 == 7)
        .select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(
            "source",
            F.regexp_replace("word", "(.)", "<$1>").alias("rep"),
            "freq",
            F.length("word").cast("bigint").alias("nch"),
        )
    )
    for top in tops:
        held = held.crossJoin(F.broadcast(top)).select(
            "source",
            F.expr(
                "replace(rep, '<' || a || '><' || b || '>',"
                " '<' || a || b || '>')"
            ).alias("rep"),
            "freq",
            "nch",
        )
    toks = F.size(F.split(F.regexp_replace("rep", "^<|>$", ""), "><")).cast(
        "bigint"
    )
    return (
        held.withColumn("ntok", toks)
        .groupBy("source")
        .agg(
            F.sum("freq").cast("bigint").alias("n_words"),
            F.sum(F.col("freq") * F.col("nch")).cast("bigint").alias("n_chars"),
            F.sum(F.col("freq") * F.col("ntok")).cast("bigint").alias("n_tokens"),
        )
        .selectExpr(
            "source", "n_words", "n_chars", "n_tokens",
            "CAST((n_tokens * 1000000) div n_chars AS BIGINT)"
            " AS tokens_per_char_e6",
        )
        .orderBy("source")
    )


_KMED_ORACLE = """
    WITH el AS MATERIALIZED (
      SELECT vec_id, u.i AS i,
             CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT)
               AS ve6
      FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) AS u
    ), a0 AS MATERIALIZED (
      SELECT vec_id,
             CAST(sum(CASE WHEN ve6 >= 0 THEN
               CASE i WHEN 1 THEN 4 WHEN 2 THEN 2 WHEN 3 THEN 1 ELSE 0 END
             ELSE 0 END) AS INT) AS c
      FROM el GROUP BY vec_id
    ), {rounds}
    SELECT * FROM ({census}) ORDER BY round
"""


def _kmed_round_sql(r: int) -> str:
    return f"""cent{r} AS MATERIALIZED (
      SELECT c, i, ve6 AS ce6 FROM (
        SELECT a.c, el.i, el.ve6,
               row_number() OVER (PARTITION BY a.c, el.i
                                  ORDER BY el.ve6, el.vec_id) AS rn,
               count(*) OVER (PARTITION BY a.c, el.i) AS cnt
        FROM el JOIN a{r - 1} a USING (vec_id)
      ) WHERE rn * 2 = cnt + (cnt % 2)
    ), a{r} AS MATERIALIZED (
      SELECT vec_id, c, dist FROM (
        SELECT el.vec_id, cc.c,
               sum((el.ve6 - cc.ce6) * (el.ve6 - cc.ce6)) AS dist,
               row_number() OVER (PARTITION BY el.vec_id
                 ORDER BY sum((el.ve6 - cc.ce6) * (el.ve6 - cc.ce6)),
                          cc.c) AS rn
        FROM el JOIN cent{r} cc ON el.i = cc.i
        GROUP BY el.vec_id, cc.c
      ) WHERE rn = 1
    )"""


def _kmed_census_sql(r: int) -> str:
    return f"""
      SELECT CAST({r} AS INT) AS round,
             CAST(count(DISTINCT c) AS BIGINT) AS n_clusters,
             CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(dist) AS BIGINT) AS inertia,
             CAST(sum(vec_id * (c + 1)) AS BIGINT) AS assign_fp
      FROM a{r}"""


_KMED_ROUNDS = 2


@register(
    "ml_kmedians_embed",
    oracle=_KMED_ORACLE.format(
        rounds=", ".join(_kmed_round_sql(r) for r in range(1, _KMED_ROUNDS + 1)),
        census=" UNION ALL ".join(
            _kmed_census_sql(r) for r in range(1, _KMED_ROUNDS + 1)
        ),
    ),
    doc="Iterative k-medians clustering over the full 64-dim "
    "embeddings — the distributed Lloyd loop made engine-exact: "
    "deterministic sign-bit seeding (dims 1-3 -> 8 clusters), then "
    "per round a per-(cluster, dim) lower-median centroid (exact "
    "integer rank pick on the e6 grid — the float-mean centroid is "
    "the one step of real k-means that cannot be replayed across "
    "engines, and k-MEDIANS is the standard robust variant that can) "
    "and an exact integer L2^2 argmin reassignment (ties to the "
    "smaller cluster id). Emits the per-round census: non-empty "
    "clusters, total inertia (decreasing 476e12 -> 472e12 on the "
    "fixture), and an assignment fingerprint pinning every label. "
    "Plan per round: one (vec_id)-keyed join + one (cluster, dim) "
    "window for centroids, one broadcast of the <=512-row codebook "
    "for reassignment — the same loop hygiene (eager localCheckpoint, "
    "unpersist) as the graph fixed-point family. The oracle unrolls "
    "rounds as MATERIALIZED chained CTEs (same pattern as "
    "graph_kcore). Complements ml_gd_classifier (iterative on "
    "scalars) and sim_pq_adc (one-shot median codebooks per "
    "subspace).",
    tags=("ml", "embeddings", "similarity"),
)
def ml_kmedians_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = tables.load(spark, sf_dir, "embeddings")
    el = (
        e.select("vec_id", F.posexplode("embedding").alias("p", "vf"))
        .select(
            "vec_id",
            (F.col("p") + 1).cast("int").alias("i"),
            F.floor(F.col("vf").cast("double") * 1000000)
            .cast("bigint")
            .alias("ve6"),
        )
        .localCheckpoint(eager=True)
    )
    bit = F.expr(
        "CASE WHEN ve6 >= 0 THEN"
        " CASE i WHEN 1 THEN 4 WHEN 2 THEN 2 WHEN 3 THEN 1 ELSE 0 END"
        " ELSE 0 END"
    )
    assign = el.groupBy("vec_id").agg(F.sum(bit).cast("int").alias("c"))
    w_med = Window.partitionBy("c", "i").orderBy("ve6", "vec_id")
    w_cnt = Window.partitionBy("c", "i")
    out = None
    for r in range(1, _KMED_ROUNDS + 1):
        cent = (
            el.join(assign, "vec_id")
            .select(
                "c",
                "i",
                "ve6",
                F.row_number().over(w_med).alias("rn"),
                F.count(F.lit(1)).over(w_cnt).alias("cnt"),
            )
            .filter(F.col("rn") * 2 == F.col("cnt") + F.col("cnt") % 2)
            .select(
                F.col("c").alias("cc"),
                F.col("i").alias("ci"),
                F.col("ve6").alias("ce6"),
            )
        )
        sq = (F.col("ve6") - F.col("ce6")) * (F.col("ve6") - F.col("ce6"))
        # argmin via two-level hash aggregation instead of a sort
        # window: lexicographic (dist, cc) packs losslessly into ONE
        # bigint (dist <= 64 * (2e6)^2 = 2.56e14 on the e6 grid, cc is
        # 3 bits from the sign-bit seeding, so dist*8+cc < 2^63), and
        # min() over it is exactly the orderBy(dist, cc)
        # row_number()==1 pick. A struct-ordered min/min_by falls back
        # to SortAggregate; the packed bigint keeps HashAggregate with
        # partial map-side collapse of the k candidate rows per vec
        # before the exchange — no sort at all (guide §2.3)
        nxt = (
            el.join(F.broadcast(cent), F.col("i") == F.col("ci"))
            .select("vec_id", "cc", sq.alias("sq"))
            .groupBy("vec_id", "cc")
            .agg(F.sum("sq").alias("dist"))
            .groupBy("vec_id")
            .agg(
                F.min(F.col("dist") * 8 + F.col("cc")).alias("m")
            )
            .select(
                "vec_id",
                (F.col("m") % 8).cast("int").alias("c"),
                F.expr("m div 8").cast("bigint").alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
        census = nxt.agg(
            F.lit(r).cast("int").alias("round"),
            F.countDistinct("c").cast("bigint").alias("n_clusters"),
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("dist").cast("bigint").alias("inertia"),
            F.sum(F.col("vec_id") * (F.col("c") + 1))
            .cast("bigint")
            .alias("assign_fp"),
        )
        out = census if out is None else out.unionByName(census)
        if assign is not el and assign.is_cached:
            assign.unpersist()
        assign = nxt
    assert out is not None
    return out.orderBy("round")
