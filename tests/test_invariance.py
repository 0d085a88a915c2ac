"""Partition-layout invariance: the repo-wide determinism discipline
(integer checksums, floored fixed-point, explicit tiebreaks) claims
every query's RESULT is independent of physical execution layout. This
test measures the claim instead of asserting it: a representative slice
of the registry — every new corpus-hygiene op plus the historically
float-sensitive families (money aggs, cosine, minhash) — runs under two
adversarially different shuffle-partition settings and must collect
IDENTICAL rows, bit for bit.

(Why partitions: reduction order is a function of the exchange layout,
so any float summed across rows would flip low bits between 7 and 32
partitions — exactly the bug class the fixed-point discipline exists to
exclude.)
"""

from __future__ import annotations

import pytest

import chess_ratings_spark.plans  # noqa: F401
from chess_ratings_spark.registry import REGISTRY

from .conftest import SF_SMOKE

SLICE = [
    "dedup_lines_corpus",
    "dedup_substring_spans",
    "text_repetition_stats",
    "text_perplexity_filter",
    "quality_classifier_score",
    "mm_scalar_quantize",
    "sample_poisson_bootstrap",
    "val_distribution_drift",
    "graph_pagerank",
    "sim_maxsim_multivector",
    "graph_triangle_count",
    "q1_pricing_summary",
    "dedup_near_minhash",
    "sim_topk_cosine",
    "corpus_prepare_v2",
    "agg_decayed_counts",
    "dedup_incremental_digest",
    "join_fuzzy_editdistance",
    "ml_linear_trend_exact",
    # round 8: exact-power-sum moments and the CDF/AQE paths must be
    # layout-independent by construction
    "agg_distribution_shape",
    "lake_changes_between",
    "join_aqe_skew",
]


def _norm(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("name", SLICE)
def test_result_is_partition_invariant(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = _norm(REGISTRY[name].fn(spark, SF_SMOKE).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = _norm(REGISTRY[name].fn(spark, SF_SMOKE).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name} result depends on shuffle layout"
