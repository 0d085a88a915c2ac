"""10x wall-clock census for the slowest bench queries (round-10
verdict item 4): the dedup/ANN tier carries measured 10x/50x inflation
evidence (scripts/scale_evidence.py), but the streaming / lakehouse /
graph families' wall-clock had only the sf0.1 point. This script
materializes a 10x-inflated fixture dir and times each of the slowest
queries at 1x and 10x, so their scaling constants are pinned by
measurement too.

Inflation (one-time, into /tmp):

- ``events``: 10 copies with disjoint event_id (+c*10^9) and user_id
  (+c*100_000) spaces, timestamps UNCHANGED — same time span, 10x
  event density and 10x key cardinality, which is what a larger sf
  does to every events consumer (streaming state stores see 10x keys,
  graphs see 10x nodes, manifest landings see 10x rows per batch).
  The shift must clear max(user_id) at EVERY sf (sf0.1 has users up
  to 1499; the first cut's +1000 overlapped copies by 500 ids and
  measured ~7x cardinality with a double-density band — round-11
  review finding).
- ``documents``: GATE-PRESERVING copies — every 5th word of copy c>0
  is suffixed ``~c{c}``. This keeps corpus_prepare_v2's Gopher gate
  statistics (stopword hits, n_words, top_freq; mean word length moves
  <0.7 chars) while making every 8-gram and every 10-word segment
  contain a tagged word, so copies share NO dedup keys and survivors
  scale ~10x. (scale_evidence's prefix-every-word inflation is right
  for the Jaccard censuses but destroys stopwords — the gate filtered
  everything and the 10x run measured an empty pipeline.)
- every other table: symlinked unchanged (the queries under test do
  not scan them).

Each query runs through its REGISTRY entry exactly as the bench runs
it, with a full collect; an UNTIMED x1 warm-up run per query first
absorbs first-shape codegen/planning so the x1-vs-x10 comparison is
warm-vs-warm (without it the x10 run, always second, looked up to
~2 s faster than it is). Prints one JSON line per (query, factor) with
rows_out and wall seconds, then a summary table with the 10x/1x ratio.
A ratio near the harness floor (micro-batch machinery, fixed commit
round-trips) is the expected outcome for the streaming family — the
point is to MEASURE which queries are data-bound vs harness-bound.

Usage: python scripts/scale_bench_10x.py [query ...]  (default: the 10
slowest from BENCH_FULL.json)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"
FACTOR = int(os.environ.get("SCALE_FACTOR", "10"))
OUT_DIR = f"/tmp/crs_scale10x_v4_sf0.1x{FACTOR}"

DEFAULT_QUERIES = [
    "stream_replicate_tablelog",
    "graph_pagerank",
    "stream_join_then_window",
    "stream_state_timeout",
    "stream_ivm_groupby",
    "corpus_prepare_v2",
    "lake_manifest_shard",
    "stream_interval_join",
    "stream_session_live",
    "stream_cdf_source",
]


def materialize_inflated(spark) -> str:
    from pyspark.sql import functions as F

    from chess_ratings_spark import tables

    out = Path(OUT_DIR)
    if (out / "_READY").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    ev = tables.load(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    copies = [
        ev.select(
            (F.col("event_id") + c * 1_000_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + c * 100_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for c in range(FACTOR)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(8).write.mode("overwrite").parquet(str(out / "events.parquet"))

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = [d.select("doc_id", "text")]  # copy 0 pristine
    for c in range(1, FACTOR):
        copies.append(
            d.select(
                (F.col("doc_id") + c * 100_000_000).alias("doc_id"),
                F.array_join(
                    F.zip_with(
                        F.split("text", " "),
                        F.sequence(F.lit(0), F.size(F.split("text", " ")) - 1),
                        lambda w, i: F.when(
                            i % 5 == 4, F.concat(w, F.lit(f"~c{c}"))
                        ).otherwise(w),
                    ),
                    " ",
                ).alias("text"),
            )
        )
    docs = copies[0]
    for c in copies[1:]:
        docs = docs.unionByName(c)
    # carry the non-text columns from copy 0's source rows so schema
    # matches the fixture (corpus_prepare_v2 reads more than text)
    extra_cols = [c for c in d.columns if c not in ("doc_id", "text")]
    if extra_cols:
        src = d.select("doc_id", *extra_cols)
        docs = docs.withColumn(
            "src_id", F.col("doc_id") % 100_000_000
        ).join(src.withColumnRenamed("doc_id", "src_id"), "src_id").drop("src_id")
        if "n_chars" in extra_cols:  # suffixes lengthen text; keep honest
            docs = docs.withColumn("n_chars", F.length("text").cast("bigint"))
    docs.repartition(4).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    # embeddings: disjoint vec_id copies, vectors unchanged — 10x rows
    # through the Arrow batch path (round-13: udf_map_in_arrow census)
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ecopies = [
        e.select(
            (F.col("vec_id") + c * 100_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
        for c in range(FACTOR)
    ]
    bige = ecopies[0]
    for c in ecopies[1:]:
        bige = bige.unionByName(c)
    bige.repartition(4).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )

    for t in tables.TABLES:
        if t in ("events", "documents", "embeddings"):
            continue
        link = out / f"{t}.parquet"
        if not link.exists():
            os.symlink(f"{SF_DIR}/{t}.parquet", link)
    (out / "_READY").touch()
    return str(out)


def main() -> None:
    import chess_ratings_spark.plans  # noqa: F401
    from chess_ratings_spark.registry import REGISTRY
    from chess_ratings_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("scale-bench-10x")
    big_dir = materialize_inflated(spark)

    results = []
    for name in names:
        fn = REGISTRY[name].fn
        row = {"query": name}
        fn(spark, SF_DIR).collect()  # untimed warm-up: absorb codegen
        for factor, sf_dir in ((1, SF_DIR), (FACTOR, big_dir)):
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).collect())
            dt = time.perf_counter() - t0
            row[f"secs_x{factor}"] = round(dt, 2)
            row[f"rows_x{factor}"] = n
            print(
                json.dumps(
                    {"query": name, "factor": factor, "rows": n, "secs": round(dt, 2)}
                ),
                flush=True,
            )
        row["ratio"] = round(row[f"secs_x{FACTOR}"] / max(row["secs_x1"], 1e-9), 2)
        results.append(row)

    print("\nquery                          x1 s    x10 s   ratio")
    for r in results:
        print(
            f"{r['query']:30s} {r['secs_x1']:6.2f} {r[f'secs_x{FACTOR}']:8.2f}"
            f" {r['ratio']:7.2f}"
        )


if __name__ == "__main__":
    main()
