"""Semantic tests for the training-data-pipeline tier beyond oracle
parity: sketch error bounds, split stability under repartitioning,
chunk reconstruction, and dedup-vs-brute-force equality."""

from __future__ import annotations

from pyspark.sql import functions as F

import chess_ratings_spark.plans  # noqa: F401
from chess_ratings_spark import tables
from chess_ratings_spark.registry import REGISTRY

from .conftest import SF_SMOKE


def test_hll_estimate_within_rsd(spark):
    rows = REGISTRY["agg_hll_merge"].fn(spark, SF_SMOKE).collect()
    per = {r["scope"]: r for r in rows if r["scope"] != "ALL"}
    assert per, "no per-type sketches"
    # the 5%-of-exact certification is computed in-plan; it must hold
    # on every scope including the global merge
    for r in rows:
        assert r["within_bound"], r["scope"]
        assert r["exact_users"] > 0
    glob = [r for r in rows if r["scope"] == "ALL"][0]
    exact_all = (
        tables.load(spark, SF_SMOKE, "events").agg(F.countDistinct("user_id")).first()[0]
    )
    assert glob["exact_users"] == exact_all


def test_hash_split_invariant_under_repartition(spark):
    """Split membership must be a pure function of the key: the same
    corpus at any partitioning yields identical bucket censuses."""
    base = {tuple(r) for r in REGISTRY["sample_hash_split"].fn(spark, SF_SMOKE).collect()}
    d = tables.load(spark, SF_SMOKE, "documents").repartition(13)
    c = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(c <= "b", "train").when(c <= "d", "val").otherwise("test").alias("split")
    again = {
        tuple(r)
        for r in d.groupBy(split)
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .collect()
    }
    assert base == again
    assert sum(r[1] for r in base) == tables.load(spark, SF_SMOKE, "documents").count()


def test_chunks_reconstruct_documents(spark):
    """Stride-24/width-32 chunks must cover every token: stitching
    chunk heads (first 24 tokens of each chunk, all of the last chunk)
    reproduces each document's token count exactly."""
    d = tables.load(spark, SF_SMOKE, "documents")
    chunks = REGISTRY["doc_chunk_split"].fn(spark, SF_SMOKE)
    per_doc = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    # token coverage: (n_chunks - 1) * stride + last chunk length == doc tokens
    last = chunks.join(
        chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("chunk_idx")),
        ["doc_id", "chunk_idx"],
    ).select("doc_id", F.col("n_tokens").alias("last_len"))
    joined = (
        per_doc.join(last, "doc_id")
        .join(
            d.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens_doc")),
            "doc_id",
        )
        .withColumn("covered", (F.col("n_chunks") - 1) * 24 + F.col("last_len"))
    )
    bad = joined.filter(F.col("covered") != F.col("n_tokens_doc")).count()
    assert bad == 0


def test_dedup_embedding_drops_exactly_planted_copies(spark):
    """On the planted corpus every dropped id is a planted copy and its
    keeper is its source vector (brute-force equivalence at smoke SF is
    the oracle's job; this pins the semantics of the survivor rule)."""
    rows = REGISTRY["dedup_embedding_cosine"].fn(spark, SF_SMOKE).collect()
    assert rows, "planted near-dups must produce drops"
    for r in rows:
        assert r["dropped_id"] >= 10_000_000
        assert r["kept_id"] == r["dropped_id"] - 10_000_000


def test_mode_deterministic_under_repartition(spark):
    a = [tuple(r) for r in REGISTRY["agg_mode"].fn(spark, SF_SMOKE).collect()]
    li = tables.load(spark, SF_SMOKE, "lineitem").repartition(17)
    from pyspark.sql import Window

    counts = li.groupBy("l_returnflag", F.col("l_quantity").alias("mode_qty")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("cnt").desc(), "mode_qty")
    b = [
        tuple(r)
        for r in counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", "mode_qty", "cnt")
        .orderBy("l_returnflag")
        .collect()
    ]
    assert a == b


def test_partition_pruning_certifies(spark):
    row = REGISTRY["scan_partition_pruning"].fn(spark, SF_SMOKE).collect()[0]
    assert row["pruned_ok"], dict(row.asDict())
    assert row["partitions_read"] == 1 and row["partitions_total"] > 1


def test_compaction_certifies(spark):
    row = REGISTRY["compact_small_files"].fn(spark, SF_SMOKE).collect()[0]
    assert row["compacted_ok"], dict(row.asDict())
    assert row["files_after"] < row["files_before"]


def test_dynamic_partition_pruning_certifies(spark):
    row = REGISTRY["join_dynamic_pruning"].fn(spark, SF_SMOKE).collect()[0]
    assert row["dpp_ok"], dict(row.asDict())
    assert 0 < row["partitions_read"] < row["partitions_total"]
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_runtime_bloom_certifies(spark):
    row = REGISTRY["join_runtime_bloom"].fn(spark, SF_SMOKE).collect()[0]
    assert row["bloom_in_plan"], dict(row.asDict())
    # conf restored
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") in ("false", "true")


def test_exact_hash_dedup_finds_planted_copies(spark):
    row = REGISTRY["dedup_exact_hash"].fn(spark, SF_SMOKE).collect()[0]
    assert row["n_exact_dups"] > 0
    assert row["n_docs"] - row["n_exact_dups"] == row["n_distinct_contents"]
    assert row["max_copies"] == 2


def test_observe_metrics_matches(spark):
    row = REGISTRY["observe_metrics"].fn(spark, SF_SMOKE).collect()[0]
    assert row["observed_matches"], dict(row.asDict())


def test_bpe_merge_is_greedy_nonoverlapping(spark):
    """The literal-replace merge over the bracketed encoding implements
    BPE's greedy left-to-right non-overlapping rule: 'aaaa' with merge
    (a,a) -> ['aa','aa'], 'aaa' -> ['aa','a']."""
    df = spark.createDataFrame([("<a><a><a><a>",), ("<a><a><a>",)], "rep string")
    merged = df.select(
        F.expr("replace(rep, '<a><a>', '<aa>')").alias("m")
    ).collect()
    assert [r.m for r in merged] == ["<aa><aa>", "<aa><a>"]


def test_bpe_merges_monotone_and_consistent(spark):
    rows = REGISTRY["text_bpe_merges"].fn(spark, SF_SMOKE).collect()
    assert [r.step for r in rows] == [1, 2, 3]
    # each merge removes one symbol per occurrence it merges; the pair
    # count counts OVERLAPPING adjacencies ('aaa' counts (a,a) twice)
    # while the literal replace merges left-to-right non-overlapping,
    # so the removed count is <= pair_count (equal when the winning
    # pair never overlaps itself, > 0 always since pair_count > 0)
    counts = [r.pair_count for r in rows]
    totals = [r.corpus_symbols_after for r in rows]
    assert counts[0] >= counts[1] >= counts[2] > 0
    assert 0 < totals[0] - totals[1] <= counts[1]
    assert 0 < totals[1] - totals[2] <= counts[2]
    for r in rows:
        assert r.merged == r.merge_a + r.merge_b


def test_containment_finds_planted_fragments(spark):
    rows = REGISTRY["sim_containment_join"].fn(spark, SF_SMOKE).collect()
    planted = {
        r.contained_id: r for r in rows if r.contained_id >= 20_000_000
    }
    d = tables.load(spark, SF_SMOKE, "documents")
    # sources with <=15 tokens yield a fragment equal to the whole doc,
    # which the strict |A| < |B| correctly excludes (not "contained in
    # a larger doc" — it IS the doc)
    expected = {
        r.doc_id + 20_000_000
        for r in d.filter(
            (F.col("doc_id") % 50 == 0) & (F.size(F.split("text", " ")) > 15)
        ).collect()
    }
    assert expected <= set(planted)
    for pid, r in planted.items():
        if r.container_id == pid - 20_000_000:
            assert r.inter == r.n_contained  # containment exactly 1.0


def test_countmin_never_underestimates(spark):
    rows = REGISTRY["agg_countmin_heavyhitters"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.overestimate_ok
        assert r.est_count >= r.true_count


def test_gd_classifier_loss_decreases(spark):
    """The exact fixed-point GD trajectory must actually learn: loss
    strictly decreases across the three steps and the parameters move
    (a saturated hard sigmoid or a zero learning step would flatline)."""
    rows = REGISTRY["ml_gd_classifier"].fn(spark, SF_SMOKE).collect()
    assert [r.step for r in rows] == [1, 2, 3]
    losses = [r.loss for r in rows]
    assert losses[0] > losses[1] > losses[2] > 0
    assert (rows[0].w, rows[0].b) != (rows[2].w, rows[2].b)


def test_pack_sequences_conservation(spark):
    """Packing invariants: per source, block token contributions sum to
    the shard's total token count, and the highest block_id is exactly
    (total_tokens - 1) // L — no tokens lost or double-packed."""
    from pyspark.sql import functions as F

    from chess_ratings_spark.plans.training import train_pack_sequences

    from .conftest import SF_SMOKE

    out = train_pack_sequences(spark, SF_SMOKE)
    per_src = {
        r["source"]: (int(r["tok"]), int(r["mb"]))
        for r in out.groupBy("source")
        .agg(F.sum("n_tokens").alias("tok"), F.max("block_id").alias("mb"))
        .collect()
    }
    d = tables.load(spark, SF_SMOKE, "documents").select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    truth = {
        r["source"]: (int(r["tok"]), int(r["last_tok"]))
        for r in d.groupBy("source")
        .agg(
            F.sum("n_tok").alias("tok"),
            F.max_by("n_tok", "doc_id").alias("last_tok"),
        )
        .collect()
    }
    assert {k: v[0] for k, v in per_src.items()} == {
        k: v[0] for k, v in truth.items()
    }
    # the highest block holding a doc START is where the last doc begins
    for src, (tok, mb) in per_src.items():
        total, last_tok = truth[src]
        assert mb == (total - last_tok) // 256


def test_collate_sorted_batching_reduces_padding(spark):
    """The point of length-bucketed batching: total pad_tokens under
    the length-sorted strategy must be strictly below arrival order
    (and both strategies see identical rows per (source, batch) count
    structure)."""
    from chess_ratings_spark.plans.training import train_collate_batches

    rows = train_collate_batches(spark, SF_SMOKE).collect()
    pad = {"arrival": 0, "sorted": 0}
    n = {"arrival": 0, "sorted": 0}
    for r in rows:
        pad[r["strategy"]] += r["pad_tokens"]
        n[r["strategy"]] += r["n_rows"]
    assert n["arrival"] == n["sorted"]
    assert pad["sorted"] < pad["arrival"]
