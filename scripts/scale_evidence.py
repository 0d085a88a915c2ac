"""Dedup scale evidence: run the near-dup pipelines on a corpus
inflated 10-50x beyond sf0.1 and measure how candidate volume and wall
time actually scale — confirming (or falsifying) the band-sizing math
argued in the operator docstrings.

Inflation preserves the fixture's internal near-dup structure while
keeping copies disjoint in similarity space, so truth scales linearly
with the corpus (the honest regime for an LSH blocker; naive
duplication would make every copy a true near-dup of its source and
turn the workload quadratic by construction):

- documents: copy c prefixes every WORD with ``c{c}~`` — every
  3-word shingle changes, so cross-copy Jaccard is exactly 0 while
  intra-copy Jaccard is untouched.
- embeddings: copy c cyclically shifts the 64 components by c
  positions — cosine between two shifted vectors equals the original
  pair's cosine, while cross-copy cosine is that of unrelated
  near-uniform vectors (<< tau).

Prints one JSON line per (op, factor) with n, candidate pairs,
candidate ratio vs n(n-1)/2, verified pairs, and stage wall times.
Usage: python scripts/scale_evidence.py [factors...]  (default 1 10 50)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"


def inflate_documents(d, factor: int):
    from pyspark.sql import functions as F

    copies = []
    for c in range(factor):
        tagged = d.select(
            (F.col("doc_id") + c * 100_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "), lambda w: F.concat(F.lit(f"c{c}~"), w)
                ),
                " ",
            ).alias("text"),
        )
        copies.append(tagged)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def inflate_embeddings(e, factor: int, dim: int = 64):
    from pyspark.sql import functions as F

    copies = []
    for c in range(factor):
        shift = c % dim
        emb = (
            F.col("embedding")
            if shift == 0
            else F.concat(
                F.slice("embedding", shift + 1, dim - shift),
                F.slice("embedding", 1, shift),
            )
        )
        copies.append(
            e.select(
                (F.col("vec_id") + c * 100_000_000).alias("vec_id"),
                emb.alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def run_minhash(spark, factor: int) -> dict:
    from chess_ratings_spark import tables
    from chess_ratings_spark.operators import similarity

    d = inflate_documents(
        tables.load(spark, SF_DIR, "documents").select("doc_id", "text"), factor
    )
    n = d.count()
    t0 = time.perf_counter()
    sh = similarity.shingle_sets(d).cache()
    sigs = similarity.minhash_signatures(sh)
    cands = similarity.lsh_candidate_pairs(sigs).cache()
    n_cands = cands.count()
    t_cand = time.perf_counter() - t0
    t0 = time.perf_counter()
    verified = similarity.verified_jaccard_pairs(d, tau=0.8, sh=sh, cands=cands)
    n_pairs = verified.count()
    t_verify = time.perf_counter() - t0
    sh.unpersist()
    cands.unpersist()
    all_pairs = n * (n - 1) / 2
    return {
        "op": "dedup_near_minhash",
        "factor": factor,
        "n": n,
        "candidates": n_cands,
        "cand_ratio_vs_n2": round(n_cands / all_pairs, 9),
        "verified_pairs": n_pairs,
        "secs_candidates": round(t_cand, 2),
        "secs_verify": round(t_verify, 2),
    }


def run_signbit(spark, factor: int) -> dict:
    from chess_ratings_spark import tables
    from chess_ratings_spark.operators import similarity
    from chess_ratings_spark.plans.llm_tier import _with_planted_neardups

    e = inflate_embeddings(
        tables.load(spark, SF_DIR, "embeddings").select("vec_id", "embedding", "label"),
        factor,
    )
    e = _with_planted_neardups(e).cache()
    n = e.count()
    n_bits, n_bands = similarity.auto_band_plan(n, 0.9)
    t0 = time.perf_counter()
    n_cands = similarity.signbit_candidates(e, n_bits=n_bits, n_bands=n_bands).count()
    t_cand = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_pairs = similarity.signbit_lsh_pairs(e, tau=0.9).count()
    t_total = time.perf_counter() - t0
    e.unpersist()
    all_pairs = n * (n - 1) / 2
    return {
        "op": "dedup_embedding_cosine",
        "factor": factor,
        "n": n,
        "band_bits": n_bits // n_bands,
        "n_bands": n_bands,
        "candidates": n_cands,
        "cand_ratio_vs_n2": round(n_cands / all_pairs, 9),
        "verified_pairs": n_pairs,
        "secs_candidates": round(t_cand, 2),
        "secs_block_and_verify": round(t_total, 2),
    }


def run_semdedup(spark, factor: int) -> dict:
    """Candidate-volume census for dedup_semdedup (plans/training.py):
    cluster-then-dedup must keep the within-cell pair count linear in n
    (cell size is bounded by scaling n_cells with |corpus|), and the
    cluster blocking must not lose planted pairs (recall vs the
    signbit-LSH global truth)."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.operators import similarity
    from chess_ratings_spark.plans.llm_tier import _with_planted_neardups

    e = inflate_embeddings(
        tables.load(spark, SF_DIR, "embeddings").select("vec_id", "embedding", "label"),
        factor,
    )
    corpus = _with_planted_neardups(e).cache()
    n = corpus.count()
    n_cells = max(16, n // 192)
    t0 = time.perf_counter()
    seeds = similarity.kmeans_cells(corpus, n_cells=n_cells, iters=2)
    t_kmeans = time.perf_counter() - t0
    t0 = time.perf_counter()
    cells = similarity._cell_topn(corpus, seeds, "vec_id", 1)
    sizes = cells.groupBy("cell_id").agg(F.count(F.lit(1)).alias("c"))
    stats = sizes.agg(
        F.max("c").alias("mx"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
    ).collect()[0]
    t_assign = time.perf_counter() - t0
    # actual drop sets: within-cell exact pairs (the SemDeDup path) vs
    # the global signbit-LSH truth
    import numpy as np
    import pandas as pd

    def cell_pairs(pdf):
        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_b": np.array([], dtype=np.int64)})
        x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        s = x @ x.T
        iu, ju = np.triu_indices(len(ids), k=1)
        m = s[iu, ju] >= 0.9
        return pd.DataFrame({"id_b": np.maximum(ids[iu[m]], ids[ju[m]])})

    sem_drops = (
        cells.select("vec_id", "cell_id", "embedding")
        .groupBy("cell_id")
        .applyInPandas(cell_pairs, "id_b bigint")
        .distinct()
        .count()
    )
    truth = similarity.signbit_lsh_pairs(corpus, tau=0.9).select("id_b").distinct().count()
    corpus.unpersist()
    all_pairs = n * (n - 1) / 2
    return {
        "op": "dedup_semdedup",
        "factor": factor,
        "n": n,
        "n_cells": n_cells,
        "max_cell": int(stats["mx"]),
        "within_cell_pairs": int(stats["pairs"]),
        "pairs_ratio_vs_n2": round(float(stats["pairs"]) / all_pairs, 9),
        "true_drops": truth,
        "semdedup_drops": sem_drops,
        "recall": round(sem_drops / truth, 4) if truth else None,
        "secs_kmeans": round(t_kmeans, 2),
        "secs_assign_census": round(t_assign, 2),
    }


def run_substr(spark, factor: int) -> dict:
    """Stage census for dedup_substring_spans (plans/corpus.py) on the
    inflated corpus: the c{c}~ word prefixes guarantee zero cross-copy
    duplicate 8-grams, so duplicated spans (and removed tokens) must
    scale LINEARLY with the factor while the dup-hash join stays an
    equi-join — the claim in the operator docstring."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables

    K = 8
    d = inflate_documents(
        tables.load(spark, SF_DIR, "documents").select("doc_id", "text"), factor
    )
    toks = F.split(F.col("text"), " ")
    base = d.select("doc_id", toks.alias("t"), F.size(toks).alias("n_tok")).cache()
    n_docs = base.count()
    t0 = time.perf_counter()
    starts = F.when(
        F.col("n_tok") >= K, F.sequence(F.lit(0), F.col("n_tok") - K)
    ).otherwise(F.array().cast("array<int>"))
    wins = base.select(
        "doc_id",
        F.explode(starts).alias("wstart"),
        F.md5(F.concat_ws(" ", F.slice(F.col("t"), F.col("wstart") + 1, K))).alias("h"),
    ).cache()
    n_wins = wins.count()
    dups = wins.groupBy("h").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") >= 2)
    n_dups = dups.count()
    t_index = time.perf_counter() - t0
    t0 = time.perf_counter()
    covered = (
        wins.join(dups.select("h"), "h")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("wstart"), F.col("wstart") + K - 1)).alias("pos"),
        )
        .distinct()
    )
    n_covered = covered.count()
    t_cover = time.perf_counter() - t0
    wins.unpersist()
    base.unpersist()
    return {
        "op": "dedup_substring_spans",
        "factor": factor,
        "n_docs": n_docs,
        "n_windows": n_wins,
        "dup_hashes": n_dups,
        "tokens_removed": n_covered,
        "secs_index": round(t_index, 2),
        "secs_cover": round(t_cover, 2),
    }


def run_lines(spark, factor: int) -> dict:
    """Stage census for dedup_lines_corpus: distinct segments and
    removed occurrences must both scale linearly under the
    prefix-disjoint inflation (no cross-copy segment collisions)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from chess_ratings_spark import tables

    W = 10
    d = inflate_documents(
        tables.load(spark, SF_DIR, "documents").select("doc_id", "text"), factor
    )
    toks = F.split(F.col("text"), " ")
    n_seg = F.ceil(F.size(toks) / F.lit(float(W))).cast("int")
    t0 = time.perf_counter()
    segs = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i * W + 1, W)),
            )
        ).alias("seg_idx", "seg"),
    )
    w = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    ranked = segs.withColumn("rn", F.row_number().over(w)).cache()
    n_occ = ranked.count()
    n_removed = ranked.filter(F.col("rn") > 1).count()
    t_all = time.perf_counter() - t0
    ranked.unpersist()
    return {
        "op": "dedup_lines_corpus",
        "factor": factor,
        "seg_occurrences": n_occ,
        "removed_occurrences": n_removed,
        "secs": round(t_all, 2),
    }


def run_containment(spark, factor: int) -> dict:
    """Candidate census for sim_containment_join: the capped inverted
    index must keep pair-candidate volume linear under prefix-disjoint
    inflation (copies share no shingles, so cross-copy candidates are
    exactly zero and found containments scale 1:1 with copies)."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.operators import similarity

    d = inflate_documents(
        tables.load(spark, SF_DIR, "documents").select("doc_id", "text"), factor
    )
    frags = d.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 10_000_000_000).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 1, 15), " ").alias("text"),
    )
    corpus = d.unionByName(frags)
    t0 = time.perf_counter()
    ex = similarity.capped_shingle_index(
        similarity.shingle_sets(corpus), df_cap=128
    ).cache()
    n_postings = ex.count()
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("ca"),
            F.col("b.doc_id").alias("cb"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .cache()
    )
    n_cand = cand.count()
    n_contained = cand.filter(
        (F.col("inter") * 10 >= 9 * F.col("n_a")) & (F.col("n_a") < F.col("n_b"))
    ).count()
    hottest = (
        ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df")).collect()[0][0]
    )
    t_all = time.perf_counter() - t0
    ex.unpersist()
    cand.unpersist()
    return {
        "op": "sim_containment_join",
        "factor": factor,
        "postings": n_postings,
        "candidate_pairs": n_cand,
        "contained_found": n_contained,
        "max_shingle_df": int(hottest),
        "secs": round(t_all, 2),
    }


def run_jaccard_neighbors(spark, factor: int) -> dict:
    """Candidate census for graph_jaccard_neighbors: shared-neighbor
    pair generation is sum-over-witnesses of d(w) choose 2, so the
    d<=64 witness cap must keep candidate volume linear under
    prefix-disjoint inflation (copies form disjoint subgraphs — the
    verified pair graph, its degrees, and hence the capped pair
    volume all scale 1:1 with copies)."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.operators import similarity

    d = inflate_documents(
        tables.load(spark, SF_DIR, "documents").select("doc_id", "text"), factor
    )
    t0 = time.perf_counter()
    pairs = similarity.verified_jaccard_pairs(d, tau=0.8)
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
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d")).cache()
    n_edges = e.count()
    capped_out = deg.filter(F.col("d") > 64).count()
    hottest = deg.agg(F.max("d")).collect()[0][0] or 0
    # candidate volume the witness join actually generates
    adjc = adj.join(deg.filter(F.col("d") <= 64), "node").select("node", "nbr")
    wit_deg = adjc.groupBy("nbr").agg(F.count(F.lit(1)).alias("dw"))
    n_cand = int(
        wit_deg.agg(
            F.sum(F.col("dw") * (F.col("dw") - 1) / 2).cast("bigint")
        ).collect()[0][0]
        or 0
    )
    deg.unpersist()
    t_all = time.perf_counter() - t0
    return {
        "op": "graph_jaccard_neighbors",
        "factor": factor,
        "edges": int(n_edges),
        "candidate_pairs": n_cand,
        "max_degree": int(hottest),
        "capped_witnesses": int(capped_out),
        "secs": round(t_all, 2),
    }


def run_countmin(spark, factor: int) -> dict:
    """Sketch-size census for agg_countmin_heavyhitters: inflating
    events factor-x (duplicated rows, same keys -> per-key counts scale
    exactly x f) must leave the sketch at <= d*w = 4096 cells, keep the
    est >= true guarantee on every reported key, and scale the top-1
    estimate exactly linearly."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.registry import REGISTRY

    ev = tables.load(spark, SF_DIR, "events").select("user_id")
    copies = spark.range(factor).select(F.col("id").alias("c"))
    inflated = ev.crossJoin(copies).select("user_id")
    D, W = 4, 1024
    js = F.explode(F.array(*[F.lit(i) for i in range(D)])).alias("j")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cm"), F.col("j").cast("string"), F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ), 1, 8,
            ), 16, 10,
        ).cast("bigint") % W
    )
    t0 = time.perf_counter()
    pairs = inflated.select("user_id", js).withColumn("bucket", bucket)
    sketch = pairs.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c")).cache()
    n_cells = sketch.count()
    keys = inflated.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    cand = keys.select("user_id", "true_count", js).withColumn("bucket", bucket)
    est = (
        cand.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.any_value("true_count").alias("tc"), F.min("c").alias("est"))
    )
    stats = est.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.count(F.when(F.col("est") < F.col("tc"), 1)).alias("n_underest"),
        F.max("est").alias("top_est"),
    ).collect()[0]
    t_all = time.perf_counter() - t0
    sketch.unpersist()
    return {
        "op": "agg_countmin_heavyhitters",
        "factor": factor,
        "n_rows": 100_000 * factor,
        "sketch_cells": int(n_cells),
        "n_keys": int(stats["n_keys"]),
        "underestimates": int(stats["n_underest"]),
        "top_estimate": int(stats["top_est"]),
        "secs": round(t_all, 2),
    }


def run_pagerank(spark, factor: int) -> dict:
    """Fixed-point PageRank on `factor` disjoint copies of the purchase
    graph (node ids offset per copy — component structure and ranks
    replicate exactly, so per-iteration cost must scale linearly in
    edges and the top rank must be IDENTICAL across factors; any
    deviation is a blocker/skew bug)."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.operators.graph import pagerank_fixedpoint

    o = tables.load(spark, SF_DIR, "orders")
    li = tables.load(spark, SF_DIR, "lineitem")
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    copies = base
    if factor > 1:
        copies = base.crossJoin(
            spark.range(factor).select(F.col("id").alias("c"))
        ).select(
            (F.col("src") + F.col("c") * 10_000_000).alias("src"),
            (F.col("dst") + F.col("c") * 10_000_000).alias("dst"),
        )
    copies = copies.localCheckpoint(eager=True)
    n_edges = copies.count()
    t0 = time.perf_counter()
    ranks = pagerank_fixedpoint(copies, iters=10)
    top = ranks.agg(
        {"rank": "max"}
    ).collect()[0][0]
    secs = round(time.perf_counter() - t0, 2)
    copies.unpersist()
    return {
        "op": "graph_pagerank",
        "factor": factor,
        "n_edges": n_edges,
        "top_rank_e6": top,
        "secs_10_iters": secs,
    }


def run_perplexity(spark, factor: int) -> dict:
    """Census for text_perplexity_filter's model equi-join under
    inflation: the c{c}~ word prefixes make each copy's bigram
    vocabulary disjoint, so the model (distinct bigrams) must grow
    linearly and the per-bigram document frequency distribution stays
    fixed — the model-side join key never gets hotter with corpus
    growth, which is the operator's scale claim."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.operators.text import sliding_concat

    d = inflate_documents(
        tables.load(spark, SF_DIR, "documents").select("doc_id", "text"), factor
    )
    t0 = time.perf_counter()
    bg = d.select(
        "doc_id", F.explode(sliding_concat(F.split("text", " "), 2)).alias("bg")
    ).cache()
    n_occ = bg.count()
    model = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c")).cache()
    n_model = model.count()
    max_df = model.agg(F.max("c")).collect()[0][0]
    scored = bg.join(model, "bg").groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    n_docs = scored.count()
    secs = round(time.perf_counter() - t0, 2)
    bg.unpersist()
    model.unpersist()
    return {
        "op": "text_perplexity_filter",
        "factor": factor,
        "n_docs": n_docs,
        "bigram_occurrences": n_occ,
        "model_rows": n_model,
        "max_bigram_df": max_df,
        "secs": secs,
    }


def run_ivf(spark, factor: int) -> dict:
    """ANN census for sim_ann_ivf under inflation: a FIXED query set
    (copy-0 vec_id%100==0) searches the inflated corpus. The cyclic
    component shifts keep each copy's internal geometry identical
    while cross-copy cosines sit at background, so the true top-k for
    a copy-0 query stays inside copy 0 and recall is comparable
    across factors. Measured: candidate pairs scored (query probes
    equi-joined to cell postings — the rows the exact cosine runs
    on), candidates/n per query (the probe-fraction x replication
    bound, ~0.46 on this structureless fixture at fixed
    nprobe/n_cells/rep — constant, i.e. candidates linear in n; at
    production scale n_cells grows ~sqrt(n) to shrink the fraction),
    and recall@5 vs brute force over the same inflated corpus."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.operators import similarity
    from chess_ratings_spark.operators.similarity import (
        _cell_topn,
        kmeans_cells,
    )

    e = inflate_embeddings(
        tables.load(spark, SF_DIR, "embeddings").select(
            "vec_id", "embedding", "label"
        ),
        factor,
    )
    queries = e.filter(
        (F.col("vec_id") < 100_000_000) & (F.col("vec_id") % 100 == 0)
    )
    t0 = time.perf_counter()
    n = e.count()
    nq = queries.count()
    seeds = kmeans_cells(e, n_cells=32, iters=3)
    qc = _cell_topn(queries, seeds, "qid", 6)
    cc = _cell_topn(e, seeds, "cid", 3)
    n_candidates = qc.join(cc, "cell_id").filter(
        F.col("qid") != F.col("cid")
    ).count()
    k = 5
    b = similarity.brute_force_topk(queries, e, k=k).select(
        "qid", "cid", F.lit(1).alias("ib")
    )

    def recall(nc, npb):
        a = similarity.ivf_topk(
            e, queries, k=k, nprobe=npb, n_cells=nc, rep=3
        ).select("qid", "cid", F.lit(1).alias("ia"))
        st = (
            a.join(b, ["qid", "cid"], "full")
            .agg(
                F.count("ib").alias("n_exact"),
                F.count(
                    F.when(F.col("ia").isNotNull() & F.col("ib").isNotNull(), 1)
                ).alias("hits"),
            )
            .collect()[0]
        )
        return round(st["hits"] / st["n_exact"], 3)

    r_fixed = recall(32, 6)
    # production sizing: cells ~ sqrt(n) growth, probe FRACTION constant
    nc_s = max(32, int(32 * factor ** 0.5))
    np_s = max(6, round(nc_s * 6 / 32))
    r_scaled = r_fixed if factor == 1 else recall(nc_s, np_s)
    secs = round(time.perf_counter() - t0, 2)
    return {
        "op": "sim_ann_ivf",
        "factor": factor,
        "n_vectors": n,
        "n_queries": nq,
        "candidates": n_candidates,
        "cand_per_query_over_n": round(n_candidates / (nq * n), 3),
        "recall_fixed_params": r_fixed,
        "scaled_cells_nprobe": [nc_s, np_s],
        "recall_scaled_params": r_scaled,
        "secs": secs,
    }


def run_tablelog(spark, factor: int) -> dict:
    """Lakehouse metadata growth census — the known table-format scale
    failure mode is the MANIFEST, not the data: at 100 TB a snapshot
    manifest lists O(files) entries and every commit/prune reads it.
    Simulate `factor` bucketed landings of the events fixture into one
    TableLog and measure what actually grows: manifest bytes and file
    count must be linear in landings (each entry is one path + one
    [min,max] stat), the LAST commit's wall time must stay flat
    (O(manifest) metadata, no data rewrite), and stats-prune
    selectivity for a fixed range predicate must stay constant (every
    landing covers the full event_id domain, so a 1-bucket-wide
    predicate scans exactly one file per landing: scanned/total ==
    1/n_buckets regardless of factor)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.operators.tablelog import TableLog

    ev = tables.load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    width = (int(hi) - int(lo)) // 16 + 1
    base = tempfile.mkdtemp(prefix="crs_scale_log_")
    try:
        log = TableLog(base)
        t_last = 0.0
        for c in range(factor):
            shifted = ev.select(
                (F.col("event_id")).alias("event_id"), "user_id", "value"
            )
            t0 = time.perf_counter()
            log.append_range_bucketed(shifted, "event_id", width, tag=f"c{c}")
            t_last = round(time.perf_counter() - t0, 2)
        m_path = log._manifest_path(log.latest_version())
        n_files = len(log.read_manifest()["files"])
        _, total, scanned = log.snapshot_pruned(
            spark, "event_id", int(lo), int(lo) + width - 1
        )
        return {
            "op": "tablelog_manifest",
            "factor": factor,
            "landings": factor,
            "n_files": n_files,
            "manifest_bytes": m_path.stat().st_size,
            "last_commit_secs": t_last,
            "prune_files_total": total,
            "prune_files_scanned": scanned,
            "prune_selectivity": round(scanned / total, 4),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_tablelog_sharded(spark, factor: int) -> dict:
    """Sharded-manifest twin of run_tablelog: the SAME landing sequence
    committed through append_manifest_sharded. What must change:
    manifest bytes become ~O(landings) (one shard path per landing,
    ~90 B each) instead of O(total files), and the LAST commit's
    metadata write is the constant per-landing shard (16 entries)
    regardless of how many landings precede it — the Iceberg
    manifest-list shape. Snapshot equality with the logical input is
    asserted by the registered query lake_manifest_shard; here we
    measure the growth curves the protocol claims to fix."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.operators.tablelog import TableLog

    ev = tables.load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    base = tempfile.mkdtemp(prefix="crs_scale_shard_")
    try:
        log = TableLog(base)
        t_last = 0.0
        for c in range(factor):
            t0 = time.perf_counter()
            log.append_manifest_sharded(ev, n_files=16, tag=f"c{c}")
            t_last = round(time.perf_counter() - t0, 2)
        m_path = log._manifest_path(log.latest_version())
        shard_paths = log.read_manifest()["manifest_shards"]
        last_shard = Path(shard_paths[-1])
        return {
            "op": "tablelog_manifest_sharded",
            "factor": factor,
            "landings": factor,
            "n_files": len(log.resolve_files()),
            "manifest_bytes": m_path.stat().st_size,
            "last_shard_bytes": last_shard.stat().st_size,
            "last_commit_secs": t_last,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_tablelog_checkpoint(spark, factor: int) -> dict:
    """Checkpoint vs full-walk snapshot resolution on a long sharded
    log — the metadata read path lake_checkpoint exists for. Fabricates
    250*factor landings as pure metadata (shard JSONs referencing 16
    file paths each; resolution never opens data files), then measures
    (a) resolve_files: one JSON read per shard, O(landings) metadata
    GETs; (b) resolve_files_via_checkpoint after checkpointing all but
    5 tail landings: one parquet read + 5 shard reads, O(delta) GETs.
    The file inventories must be identical. Honest local-fs finding
    (DESIGN.md): wall time does NOT show the win locally — a local
    JSON read is ~40 us while a Spark read pays ~1 s of fixed job
    cost, so the full walk is FASTER on this machine. The metric that
    transfers to 100 TB is the GET count (2495 -> 6 at factor 10):
    on an object store each shard GET is a 10-50 ms round trip, so
    the full walk is seconds-to-minutes of serialized latency while
    the checkpoint path is one columnar GET plus the tail."""
    import json as _json
    import shutil
    import tempfile

    from chess_ratings_spark.operators.tablelog import TableLog

    landings = 250 * factor
    base = tempfile.mkdtemp(prefix="crs_scale_ckpt_")
    try:
        log = TableLog(base)
        shard_dir = log.log_dir / "shards"
        shard_dir.mkdir(exist_ok=True)

        def land(i: int) -> None:
            shard = shard_dir / f"l{i:06d}.json"
            shard.write_text(_json.dumps({
                "files": [
                    f"{log.data_dir}/l{i:06d}-{j:02d}.parquet" for j in range(16)
                ]
            }))

            def rebase(prev, shard=shard):
                shards = prev.get("manifest_shards", []) if prev else []
                return [], {"manifest_shards": shards + [str(shard)],
                            "sharded": True}

            log.commit(op="append-sharded", build=rebase)

        for i in range(landings - 5):
            land(i)
        t0 = time.perf_counter()
        lc = log.write_checkpoint(spark)
        t_ckpt_write = round(time.perf_counter() - t0, 3)
        for i in range(landings - 5, landings):
            land(i)
        t0 = time.perf_counter()
        full = log.resolve_files()
        t_full = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        via, census = log.resolve_files_via_checkpoint(spark)
        t_via = round(time.perf_counter() - t0, 3)
        assert via == full and census["used_checkpoint"]
        return {
            "op": "tablelog_checkpoint",
            "factor": factor,
            "landings": landings,
            "n_files": len(full),
            "ckpt_files": lc["n_files"],
            "shards_read_via_ckpt": census["shards_read"],
            "resolve_full_secs": t_full,
            "resolve_via_ckpt_secs": t_via,
            "ckpt_write_secs": t_ckpt_write,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_skew_salt(spark, factor: int) -> dict:
    """Hottest-shuffle-partition census for join_skew_salted
    (plans/scale.py): events' 5-value event_type key hashed into 32
    reducers leaves >=27 idle and puts every hot key's full row count
    on one reducer — the stragglers that kill a 1000-executor shuffle.
    Salting the fact side with event_id%8 and exploding the dim x8
    spreads each hot key over 8 reducers. Measured here: max and
    median rows per shuffle partition for the UNsalted vs SALTED key
    at `factor` x sf0.1 — the salted max must be ~8x smaller and the
    ratio must hold as the corpus grows (skew relief is a property of
    the key layout, not the data volume)."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.plans.scale import N_SALTS

    ev = tables.load(spark, SF_DIR, "events").select("event_id", "event_type")
    if factor > 1:
        ev = ev.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
        ).drop("rep")
    t0 = time.perf_counter()

    def partition_census(df, *keys):
        return {
            int(r["p"]): int(r["n"])
            for r in df.repartition(32, *[F.col(k) for k in keys])
            .withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    plain = partition_census(ev, "event_type")
    salted = partition_census(
        ev.withColumn("salt", (F.col("event_id") % N_SALTS).cast("int")),
        "event_type",
        "salt",
    )
    secs = round(time.perf_counter() - t0, 2)

    def stats(c):
        vals = sorted(c.values())
        return {
            "busy_partitions": len(vals),
            "max_rows": vals[-1],
            "median_rows": vals[len(vals) // 2],
        }

    sp, ss = stats(plain), stats(salted)
    return {
        "op": "join_skew_salted",
        "factor": factor,
        "plain": sp,
        "salted": ss,
        "hot_relief": round(sp["max_rows"] / ss["max_rows"], 2),
        "secs": secs,
    }




def run_phash(spark, factor: int) -> dict:
    """Image-phash census under GROUP-COUNT inflation (copy c uses
    base' = base + 50*c: disjoint texture families — the web-scale
    regime where the corpus grows by NEW images).

    Measures the shipped design: group-collapse to DISTINCT
    (hash, base) + multi-index hashing (4 chunks x 16 bits, radius-1
    probe variants — exact recall for hamming <= 6 by pigeonhole).
    History, falsified by this harness: per-image 8-bit banding grew
    88x for 10x images (916k -> 80.2M candidates); group collapse
    with 8-bit chunks still 92x (380k -> 35.1M; distinct textures
    also grow with the corpus). MIH's 2^16 bucket space is the fix —
    the claim here is group candidates ~linear in copies and the
    hottest bucket bounded by texture-family structure."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.operators.multimodal import phash_hashes

    d = tables.load(spark, SF_DIR, "documents").select("doc_id")
    copies = [
        d.select((F.col("doc_id") + c * 100_000_000).alias("doc_id"))
        for c in range(factor)
    ]
    ids = copies[0]
    for c in copies[1:]:
        ids = ids.unionByName(c)
    t0 = time.time()
    with_grp = ids.select(
        "doc_id",
        ((F.col("doc_id") % 100_000_000) % 50
         + 50 * F.expr("doc_id div 100000000")).cast("bigint").alias("base"),
        F.expr("(doc_id % 100000000) div 50").cast("bigint").alias("gen"),
    )
    hashes = (
        phash_hashes(with_grp)
        .join(with_grp.select("doc_id", "base"), "doc_id")
        .localCheckpoint(eager=True)
    )
    hg = hashes.groupBy("h_lo", "h_hi", "base").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint(eager=True)

    def chunks_of(df, with_variants):
        cols = []
        for k in range(4):
            half = F.col("h_lo") if k < 2 else F.col("h_hi")
            ck = F.shiftright(half, 16 * (k % 2)).bitwiseAND(F.lit(65535))
            if with_variants:
                variants = [ck] + [
                    ck.bitwiseXOR(F.lit(1 << j)) for j in range(16)
                ]
                cols.extend(
                    F.struct(F.lit(k).alias("chunk_id"), v.alias("chunk"))
                    for v in variants
                )
            else:
                cols.append(
                    F.struct(F.lit(k).alias("chunk_id"), ck.alias("chunk"))
                )
        return df.select(
            "h_lo", "h_hi", "base", "n",
            F.explode(F.array(*cols)).alias("ck"),
        ).select("h_lo", "h_hi", "base", "n", "ck.chunk_id", "ck.chunk")

    index = chunks_of(hg, with_variants=False)
    probe = chunks_of(hg, with_variants=True)
    hot = (
        index.groupBy("chunk_id", "chunk")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    a, b = probe.alias("a"), index.alias("b")
    lex_lt = (
        (F.col("a.h_lo") < F.col("b.h_lo"))
        | ((F.col("a.h_lo") == F.col("b.h_lo"))
           & (F.col("a.h_hi") < F.col("b.h_hi")))
        | ((F.col("a.h_lo") == F.col("b.h_lo"))
           & (F.col("a.h_hi") == F.col("b.h_hi"))
           & (F.col("a.base") < F.col("b.base")))
    )
    gpairs = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & lex_lt,
        )
        .select(
            F.col("a.h_lo").alias("alo"),
            F.col("a.h_hi").alias("ahi"),
            F.col("a.base").alias("ba"),
            F.col("a.n").alias("na"),
            F.col("b.h_lo").alias("blo"),
            F.col("b.h_hi").alias("bhi"),
            F.col("b.base").alias("bb"),
            F.col("b.n").alias("nb"),
        )
        .distinct()
    )
    stats = gpairs.agg(
        F.count(F.lit(1)).alias("g_cand"),
        F.coalesce(
            F.sum(
                F.when(
                    F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))
                    + F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi")))
                    <= 6,
                    F.col("na") * F.col("nb"),
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("cross_doc_pairs"),
        F.coalesce(
            F.sum(
                F.when(
                    (
                        F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))
                        + F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi")))
                        <= 6
                    )
                    & (F.col("ba") == F.col("bb")),
                    F.col("na") * F.col("nb"),
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("cross_same_grp"),
    ).collect()[0]
    n = hashes.count()
    n_groups = hg.count()
    hashes.unpersist()
    hg.unpersist()
    return {
        "op": "phash_mih",
        "factor": factor,
        "n_images": n,
        "n_hash_groups": n_groups,
        "hottest_bucket": int(hot),
        "group_candidates": int(stats["g_cand"]),
        "cross_doc_pairs_le6": int(stats["cross_doc_pairs"]),
        "cross_same_group": int(stats["cross_same_grp"]),
        "secs": round(time.time() - t0, 1),
    }


def run_pq(spark, factor: int) -> dict:
    """PQ-ADC census under inflation with a FIXED copy-0 query set
    (same protocol as run_ivf): encode rows, ADC scan volume
    (n_queries x n codes summed per pair), and shortlist size. The
    claim: every stage is linear in n at fixed query count — encode is
    a per-vector map against a broadcast codebook, the ADC scan reads
    one 16-byte code row per (query, vector)."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables
    from chess_ratings_spark.plans.llm_tier import sim_pq_adc  # noqa: F401

    e = tables.load(spark, SF_DIR, "embeddings")
    inflated = inflate_embeddings(e, factor)
    t0 = time.time()
    el = inflated.select(
        "vec_id", F.posexplode("embedding").alias("p", "vf")
    ).select(
        "vec_id",
        (F.col("p") / 4).cast("int").alias("s"),
        (F.col("p") % 4).cast("int").alias("d"),
        F.floor(F.col("vf").cast("double") * 1000000)
        .cast("bigint")
        .alias("ve6"),
    )
    bit = F.expr(
        "CASE WHEN ve6 >= 0 THEN"
        " CASE d WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END"
        " ELSE 0 END"
    )
    from pyspark.sql import Window

    buck = el.groupBy("vec_id", "s").agg(F.sum(bit).cast("int").alias("b"))
    memb = el.join(buck, ["vec_id", "s"])
    w_med = Window.partitionBy("s", "b", "d").orderBy("ve6", "vec_id")
    w_cnt = Window.partitionBy("s", "b", "d")
    cent = (
        memb.select(
            "s", "b", "d", "ve6",
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
    )
    sq = (F.col("ve6") - F.col("ce6")) * (F.col("ve6") - F.col("ce6"))
    w_enc = Window.partitionBy("vec_id", "s").orderBy("dist", "cb")
    code = (
        memb.join(
            F.broadcast(cent),
            (F.col("s") == F.col("cs")) & (F.col("d") == F.col("cd")),
        )
        .select("vec_id", "s", "cb", sq.alias("sq"))
        .groupBy("vec_id", "s", "cb")
        .agg(F.sum("sq").alias("dist"))
        .withColumn("rn", F.row_number().over(w_enc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", F.col("cb").alias("code"))
        .localCheckpoint(eager=True)
    )
    n_codes = code.count()
    q = el.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 100_000_000)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("s").alias("qs"),
        F.col("d").alias("qd"),
        F.col("ve6").alias("qe6"),
    )
    qsq = (F.col("qe6") - F.col("ce6")) * (F.col("qe6") - F.col("ce6"))
    lut = (
        q.join(
            F.broadcast(cent),
            (F.col("qs") == F.col("cs")) & (F.col("qd") == F.col("cd")),
        )
        .select("qid", "qs", "cb", qsq.alias("sq"))
        .groupBy("qid", "qs", "cb")
        .agg(F.sum("sq").alias("pd"))
        .select("qid", F.col("qs").alias("ls"), F.col("cb").alias("lb"), "pd")
    )
    adc = (
        code.join(
            F.broadcast(lut),
            (F.col("s") == F.col("ls")) & (F.col("code") == F.col("lb")),
        )
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.count(F.lit(1)).alias("nsub"))
        .filter(F.col("nsub") == 16)
    )
    n_adc = adc.count()
    nq = q.select("qid").distinct().count()
    code.unpersist()
    return {
        "op": "pq_adc",
        "factor": factor,
        "n_vecs": n_codes // 16,
        "n_queries": nq,
        "encode_rows": n_codes,
        "adc_scored_pairs": n_adc,
        "secs": round(time.time() - t0, 1),
    }


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    from chess_ratings_spark.session import get_spark

    spark = get_spark("chess-ratings-scale-evidence")
    spark.sparkContext.setLogLevel("ERROR")
    for factor in factors:
        for fn in (run_minhash, run_signbit, run_substr, run_lines, run_containment, run_jaccard_neighbors, run_countmin, run_pagerank, run_perplexity, run_tablelog, run_tablelog_sharded, run_tablelog_checkpoint, run_skew_salt, run_ivf, run_semdedup, run_phash, run_pq):
            row = fn(spark, factor)
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
