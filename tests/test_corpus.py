"""Planted-structure tests for the corpus-hygiene tier (plans/corpus.py):
the oracle-parity tests prove Spark==DuckDB; these prove both equal the
INTENDED semantics on corpora constructed so every count is derivable by
hand. Synthetic documents are written as a parquet fixture dir and the
registered query functions are pointed at it — the exact path a user
takes with their own table."""

from __future__ import annotations

import hashlib

import pandas as pd

import chess_ratings_spark.plans  # noqa: F401
from chess_ratings_spark.registry import REGISTRY

from .conftest import SF_SMOKE


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": text,
                "lang": "en",
                "source": src,
                "n_chars": len(text),
            }
            for i, (src, text) in enumerate(rows)
        ]
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def _cksum(*texts: str) -> int:
    return sum(int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in texts)


def _toks(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


def test_dedup_lines_removes_cross_doc_segment(spark, tmp_path):
    seg_a = _toks("a", 10)
    seg_b = _toks("b", 10)  # duplicated into doc 1
    seg_u = _toks("u", 10)
    seg_v = _toks("v", 10)
    docs = [
        ("srcA", " ".join(seg_a + seg_b)),  # doc 0: [A][B]
        ("srcA", " ".join(seg_b + seg_u)),  # doc 1: [B dup][U] -> keeps [U]
        ("srcB", " ".join(seg_v)),  # doc 2: untouched
    ]
    sf = _write_docs(tmp_path, docs)
    out = {r["source"]: r for r in REGISTRY["dedup_lines_corpus"].fn(spark, sf).collect()}
    a = out["srcA"]
    assert (a["n_docs"], a["n_docs_pruned"]) == (2, 1)
    assert (a["n_seg_total"], a["n_seg_kept"]) == (4, 3)
    assert a["text_checksum"] == _cksum(" ".join(seg_a + seg_b), " ".join(seg_u))
    b = out["srcB"]
    assert (b["n_docs"], b["n_docs_pruned"]) == (1, 0)
    assert b["text_checksum"] == _cksum(" ".join(seg_v))


def test_substring_spans_removes_every_occurrence(spark, tmp_path):
    shared = _toks("s", 8)  # the duplicated 8-token span
    left = _toks("l", 4)
    right = _toks("r", 4)
    docs = [
        ("srcA", " ".join(left + shared + right)),  # span at pos 4..11
        ("srcA", " ".join(shared + _toks("z", 8))),  # span at pos 0..7
        ("srcB", " ".join(_toks("q", 16))),  # clean
    ]
    sf = _write_docs(tmp_path, docs)
    out = {
        r["source"]: r for r in REGISTRY["dedup_substring_spans"].fn(spark, sf).collect()
    }
    a = out["srcA"]
    # ExactSubstr drops ALL occurrences, both docs lose the 8 tokens
    assert (a["n_docs"], a["n_docs_affected"]) == (2, 2)
    assert a["tokens_before"] == 16 + 16
    assert a["tokens_removed"] == 16
    assert a["text_checksum"] == _cksum(" ".join(left + right), " ".join(_toks("z", 8)))
    b = out["srcB"]
    assert (b["n_docs_affected"], b["tokens_removed"]) == (0, 0)


def test_repetition_stats_flags_planted_repetition(spark, tmp_path):
    # 20x the same bigram -> top2 occupies ~100% of 2-grams; and the
    # duplicated 10-token segments trip the dup-segment counter.
    spammy = "x y " * 20
    clean = " ".join(_toks("w", 40))
    sf = _write_docs(tmp_path, [("srcA", spammy.strip()), ("srcB", clean)])
    out = {
        r["source"]: r for r in REGISTRY["text_repetition_stats"].fn(spark, sf).collect()
    }
    assert out["srcA"]["n_top2_viol"] == 1
    assert out["srcA"]["n_dup_seg_docs"] == 1
    assert out["srcB"]["n_top2_viol"] == 0
    assert out["srcB"]["n_dup_seg_docs"] == 0


def test_quality_classifier_millis_match_python(spark, tmp_path):
    docs = [("srcA", "alpha beta gamma"), ("srcB", "delta epsilon")]
    sf = _write_docs(tmp_path, docs)
    rows = REGISTRY["quality_classifier_score"].fn(spark, sf).collect()

    def millis(text: str) -> int:
        total = -256
        for w in text.split(" "):
            b = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 64
            total += b * 2654435761 % 97 - 48
        return total

    by_src = {r["source"]: r for r in rows}
    for src, text in docs:
        m = millis(text)
        r = by_src[src]
        assert r["sum_millis"] == m
        assert r["min_millis"] == r["max_millis"] == m
        assert r["logit_floor"] == m // 1024


def test_scd2_history_invariants(spark):
    rows = REGISTRY["scd2_history"].fn(spark, SF_SMOKE).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for versions in by_user.values():
        versions.sort(key=lambda r: r["version"])
        assert [v["version"] for v in versions] == list(range(1, len(versions) + 1))
        assert sum(v["is_current"] for v in versions) == 1
        assert versions[-1]["is_current"] and versions[-1]["valid_to"] is None
        for prev, nxt in zip(versions, versions[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["valid_from"] <= prev["valid_to"]


def test_interval_binned_equals_brute_force(spark):
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables

    binned = REGISTRY["join_interval_binned"].fn(spark, SF_SMOKE).collect()
    o = tables.load(spark, SF_SMOKE, "orders")
    li = tables.load(spark, SF_SMOKE, "lineitem")
    epoch = F.to_date(F.lit("1970-01-01"))
    start = F.datediff(F.to_date("o_orderdate"), epoch)
    iv = o.filter(F.col("o_orderkey") % 997 == 0).select(
        F.col("o_orderkey").alias("iv_id"),
        start.alias("s"),
        (start + 14).alias("e"),
    )
    probe = li.select(
        F.datediff(F.to_date("l_shipdate"), epoch).alias("d"), "l_quantity"
    )
    brute = (
        probe.join(iv, (F.col("d") >= F.col("s")) & (F.col("d") < F.col("e")))
        .groupBy("iv_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        )
        .orderBy("iv_id")
        .collect()
    )
    assert [tuple(r) for r in binned] == [tuple(r) for r in brute]


def test_incremental_merge_is_consistent(spark):
    rows = REGISTRY["pipeline_incremental"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["count_consistent"] and r["value_consistent"]
        assert r["n_merged"] == r["n_full"]


def test_scalar_quantize_error_bound(spark):
    """SQ8 reconstruction error is bounded by the quantization step:
    per element <= (range/255/2)^2, so per vector <= 64 * that."""
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables

    rows = REGISTRY["mm_scalar_quantize"].fn(spark, SF_SMOKE).collect()
    e = tables.load(spark, SF_SMOKE, "embeddings")
    el = e.select(F.posexplode("embedding").alias("i", "v"))
    rng = el.groupBy("i").agg((F.max("v") - F.min("v")).alias("r"))
    max_range = rng.agg(F.max("r")).collect()[0][0]
    bound_per_vec_e9 = 64 * (max_range / 255.0 / 2.0) ** 2 * 1e9
    total_vecs = sum(r["n_vecs"] for r in rows)
    assert total_vecs == e.count()
    for r in rows:
        assert 0 <= r["sum_err_e9"] <= r["n_vecs"] * bound_per_vec_e9
        assert 0 <= r["sum_codes"] <= r["n_vecs"] * 64 * 255


def test_pagerank_fixedpoint_invariants(spark):
    """Integer PageRank: every rank >= the base mass (150000 e6ths);
    pure sinks (suppliers — in-links only in the bipartite purchase
    graph) hold every top slot because customer ranks never exceed the
    base (no in-edges); re-running yields bit-identical ranks."""
    rows = REGISTRY["graph_pagerank"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert all(r["rank_e6"] >= 150000 for r in rows)
    # customers have no in-edges in the bipartite purchase graph, so
    # their rank is EXACTLY the base mass; suppliers accumulate it
    assert all(r["rank_e6"] == 150000 for r in rows if r["kind"] == "customer")
    assert any(r["kind"] == "supplier" and r["rank_e6"] > 150000 for r in rows)
    ranks = [r["rank_e6"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    again = [r["rank_e6"] for r in REGISTRY["graph_pagerank"].fn(spark, SF_SMOKE).collect()]
    assert again == ranks


def test_label_propagation_separates_components(spark):
    """Two disjoint star components must converge to one label each
    (the hub's id — it is every leaf's only neighbor, and the hub sees
    a leaf-label majority of distinct labels broken by min), and the
    components' labels must differ."""
    from pyspark.sql import functions as F

    from chess_ratings_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, i) for i in range(2, 6)] + [(10, i) for i in range(11, 15)],
        "src bigint, dst bigint",
    )
    out = {r.node: r.lbl for r in label_propagation(edges, iters=4).collect()}
    comp_a = {out[n] for n in (1, 2, 3, 4, 5)}
    comp_b = {out[n] for n in (10, 11, 12, 13, 14)}
    assert len(comp_a) == 1 and len(comp_b) == 1
    assert comp_a != comp_b
