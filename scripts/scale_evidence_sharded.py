"""Sharded-OPTIMIZE scale evidence: land N small sharded commits, then
measure snapshot resolution + scan cost before/after optimize()."""
import json, sys, time, tempfile
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from pyspark.sql import SparkSession, functions as F
from chess_ratings_spark.operators.tablelog import TableLog

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet").selectExpr(
    "event_id", "user_id", "event_type", "CAST(floor(value*100) AS BIGINT) AS vc")
N_LANDINGS = 120
base = tempfile.mkdtemp(prefix="crs_shardopt_")
log = TableLog(base)
t0 = time.time()
for i in range(N_LANDINGS):
    log.append_manifest_sharded(
        ev.filter(F.col("event_id") % N_LANDINGS == i), n_files=2, tag=f"b{i:03d}")
t_land = time.time() - t0

def probe(label):
    t = time.time()
    files = log.resolve_files()
    t_resolve = time.time() - t
    t = time.time()
    n = log.snapshot(spark).groupBy("event_type").agg(F.sum("vc")).count()
    t_scan = time.time() - t
    print(json.dumps({"stage": label, "n_files": len(files),
                      "n_shards": len(log.read_manifest().get("manifest_shards", [])),
                      "resolve_s": round(t_resolve, 3), "scan_agg_s": round(t_scan, 3)}))

probe("before")
t = time.time()
log.optimize(spark, target_rows_per_file=200_000)
t_opt = time.time() - t
probe("after")
print(json.dumps({"stage": "optimize", "wall_s": round(t_opt, 2),
                  "landings": N_LANDINGS, "land_total_s": round(t_land, 1)}))
spark.stop()
import shutil; shutil.rmtree(base, ignore_errors=True)
