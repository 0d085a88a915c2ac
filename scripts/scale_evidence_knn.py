"""kNN-join scale evidence: constant-DENSITY inflation (the 100 TB
regime — more points on a proportionally bigger domain), measuring
rounds, per-round unresolved decay, candidate volume, and wall time at
1x / 10x / 50x the sf0.1 point count.

The sf-based census in DESIGN.md conflates density with size (the
fixture grid is fixed at 1000x1000, so 10x the points = 10x the
density and FEWER rounds). Here density is held at the sf0.1 fixture's
(~20k points / 1e6 cells) by scaling the domain side with sqrt(n):
at every factor the typical 3-NN distance is identical, so the claim
under test is the design one — round count is set by density alone,
and work (candidates, wall) scales LINEARLY in n at fixed density.

Points are integer-LCG mixes of a dense id range (same construction as
plans/geo._points, reseeded per side), n_cells tracks the domain so
cell side stays 16. Prints one JSON line per factor.
Usage: python scripts/scale_evidence_knn.py [factors...]  (default 1 10 50)
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BASE_N = 20_000       # sf0.1's per-side point count
BASE_SIDE = 1_000     # sf0.1's domain side
K = 3
CELL = 16


def points(spark, n: int, domain: int, kind: str):
    from pyspark.sql import functions as F

    a, b, c = (48271, 16807, 7) if kind == "store" else (69621, 48271, 3)
    ids = ("sid", "sx", "sy") if kind == "store" else ("pid", "px", "py")
    return spark.range(n).select(
        F.col("id").alias(ids[0]),
        F.expr(f"(id * {a}) % {domain}").alias(ids[1]),
        F.expr(f"((id + {c}) * {b}) % {domain}").alias(ids[2]),
    )


def run(spark, factor: int) -> dict:
    from pyspark.sql import functions as F

    from chess_ratings_spark.operators.joins import knn_join_grid

    n = BASE_N * factor
    domain = int(BASE_SIDE * math.sqrt(factor))
    n_cells = (domain // CELL) + 1
    stores = points(spark, n, domain, "store")
    probes = points(spark, n, domain, "probe")
    walls = []
    for _ in range(2):
        t0 = time.time()
        pairs = knn_join_grid(probes, stores, k=K, side=CELL, n_cells=n_cells)
        n_pairs = pairs.count()
        walls.append(time.time() - t0)
    # decay census (mirrors the operator's done rule, counts only)
    cells = stores.select(
        "sid", "sx", "sy",
        (F.expr(f"sx div {CELL}") * n_cells + F.expr(f"sy div {CELL}")).alias("cell"),
    )
    todo = probes.select(
        "pid", "px", "py",
        F.expr(f"px div {CELL}").alias("cx"),
        F.expr(f"py div {CELL}").alias("cy"),
    )
    from pyspark.sql import Window

    rank = Window.partitionBy("pid").orderBy("d2", "sid")
    d2 = (F.col("sx") - F.col("px")) * (F.col("sx") - F.col("px")) + (
        F.col("sy") - F.col("py")
    ) * (F.col("sy") - F.col("py"))
    decay, i, remaining = [], 1, n
    while remaining and i < n_cells - 1:
        rep = (
            todo.withColumn(
                "ncx",
                F.explode(F.sequence(
                    F.greatest(F.col("cx") - i, F.lit(0)),
                    F.least(F.col("cx") + i, F.lit(n_cells - 1)),
                )),
            )
            .withColumn(
                "ncy",
                F.explode(F.sequence(
                    F.greatest(F.col("cy") - i, F.lit(0)),
                    F.least(F.col("cy") + i, F.lit(n_cells - 1)),
                )),
            )
            .select("pid", "px", "py", (F.col("ncx") * n_cells + F.col("ncy")).alias("cell"))
        )
        topk = (
            rep.join(cells, "cell").withColumn("d2", d2)
            .withColumn("rn", F.row_number().over(rank))
            .filter(F.col("rn") <= K)
        )
        done = (
            topk.groupBy("pid")
            .agg(F.count(F.lit(1)).alias("nc"), F.max("d2").alias("kth"))
            .filter((F.col("nc") == K) & (F.col("kth") <= (i * CELL) ** 2))
            .select("pid")
        )
        nd = done.count()
        decay.append([i, remaining, nd])
        todo = todo.join(done, "pid", "left_anti").localCheckpoint(eager=True)
        remaining -= nd
        i *= 2
    if remaining:
        decay.append([n_cells - 1, remaining, remaining])
    return {
        "factor": factor,
        "n_per_side": n,
        "domain": domain,
        "n_pairs": n_pairs,
        "rounds": len(decay),
        "decay": decay,
        "wall_s": round(min(walls), 2),
    }


def main():
    from pyspark.sql import SparkSession

    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for f in factors:
        print(json.dumps(run(spark, f)), flush=True)


if __name__ == "__main__":
    main()
