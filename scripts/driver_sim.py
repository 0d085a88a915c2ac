"""Driver simulation: hostile SparkSession + DuckDB oracle compare.

Reproduces the external driver's CORRECTNESS check locally: a fresh
SparkSession with hostile config (non-UTC timezone, odd core count),
`__spark_entry__.queries()` executed at $SIM_SF_DIR (default sf0.01),
each oracle compared column-sorted / order-insensitive with normalized
values. Usage:

    python scripts/driver_sim.py [query ...]   # no args = all queries

Must end with `== ALL MATCH ==`. The latest full run is committed as
VERIFY_r2.log."""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import sys
import time
import traceback

import os
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('SIM_CORES', '7')}]"
    )
    .appName("driver-sim-r2")
    # SIM_TZ: second-configuration hardening runs use a half-hour-offset
    # zone (e.g. Asia/Kolkata) — queries must hash-match under ANY
    # session timezone, not just whole-hour western ones
    .config(
        "spark.sql.session.timeZone",
        os.environ.get("SIM_TZ", "America/New_York"),
    )
    # SIM_SHUFFLE_PARTITIONS: run the whole registry under an arbitrary
    # exchange layout — with the default-layout run, a green pass here
    # is a FULL-REGISTRY partition-invariance proof (every query equals
    # the same DuckDB answer under both layouts)
    .config(
        "spark.sql.shuffle.partitions",
        os.environ.get("SIM_SHUFFLE_PARTITIONS", "200"),
    )
    .config("spark.driver.memory", "8g")
    # SIM_CODEGEN=off: run the registry on the interpreted expression
    # path (whole-stage codegen disabled) — results must be identical;
    # divergence means a query depends on codegen-specific evaluation
    .config(
        "spark.sql.codegen.wholeStage",
        "false" if os.environ.get("SIM_CODEGEN") == "off" else "true",
    )
    # SIM_ANSI=off: legacy (non-ANSI) evaluation — overflow wraps and
    # bad casts null instead of raising. Queries must not silently
    # depend on either regime's behavior for their results.
    .config(
        "spark.sql.ansi.enabled",
        "false" if os.environ.get("SIM_ANSI") == "off" else "true",
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def norm(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


rows = entrymod.entry(spark).collect()
assert len(rows) > 0, "entry() returned no rows"
print(f"entry OK: {len(rows)} rows", flush=True)

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
_only = set(sys.argv[1:])
if _only:
    qs = {k: v for k, v in qs.items() if k in _only}
fails = []
t0 = time.time()
for i, (name, fn) in enumerate(qs.items()):
    try:
        df = fn(spark, SF)
        if name in oracles:
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            s_cols = df.columns
            if sorted(s_cols) != sorted(o_cols):
                fails.append((name, f"cols spark={sorted(s_cols)} oracle={sorted(o_cols)}"))
                continue
            from collections import Counter

            o_ord = sorted(range(len(o_cols)), key=lambda j: o_cols[j])
            s_ord = sorted(range(len(s_cols)), key=lambda j: s_cols[j])
            o_m = Counter(tuple(norm(r[j]) for j in o_ord) for r in o_rows)
            s_m = Counter(tuple(norm(r[j]) for j in s_ord) for r in df.collect())
            if s_m != o_m:
                only_s = list((s_m - o_m).items())[:2]
                only_o = list((o_m - s_m).items())[:2]
                fails.append((name, f"values spark-only={only_s} oracle-only={only_o}"))
                continue
            status = f"match ({sum(s_m.values())} rows)"
        else:
            n = df.count()
            status = f"rows-only ({n} rows)"
            if n < 0:
                fails.append((name, "negative count?!"))
        print(f"[{i + 1}/{len(qs)}] {name}: {status}", flush=True)
    except Exception:
        fails.append((name, traceback.format_exc(limit=3)))
        print(f"[{i + 1}/{len(qs)}] {name}: ERROR", flush=True)

print(f"total {time.time() - t0:.1f}s")
if fails:
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    sys.exit(1)
print("== ALL MATCH ==")
