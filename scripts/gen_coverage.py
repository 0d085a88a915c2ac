"""Regenerate COVERAGE.md from the query registry.

Usage: python scripts/gen_coverage.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import chess_ratings_spark.plans  # noqa: F401,E402
from chess_ratings_spark.registry import REGISTRY  # noqa: E402

SECTIONS = [
    ("Scans / sources / sinks (SURVEY §2.1)", ["src_", "sink_", "scan_"]),
    ("Projections / filters (§2.2)", ["proj_", "filter_", "select_"]),
    ("Scalar functions (§2.3)", ["fn_"]),
    ("Joins (§2.4)", ["join_", "geo_"]),
    ("Aggregations (§2.5)", ["agg_"]),
    ("Windows / sorts / set ops / dedup (§2.6)", ["win_", "sort_", "limit_", "set_", "dedup_exact"]),
    ("Validation (§2.7)", ["val_", "quality_", "scd2_"]),
    ("Streaming (§2.8)", ["stream_"]),
    ("LLM-data tier (§2.9 + north star)", ["text_", "dedup_", "sim_", "mm_"]),
    ("Composite / pipeline (§2.10, TPC-H shapes)", ["q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9", "pipeline_", "tier_r_", "scalar_", "unpivot_", "corpus_prepare"]),
    ("Sampling / splits", ["sample_"]),
    ("Time-series", ["ts_"]),
    ("Graph analytics", ["graph_"]),
    ("Lakehouse / maintenance / profiling", ["merge_", "compact_", "lake_", "profile_", "observe_", "anomaly_", "ml_", "funnel_", "contamination_", "doc_", "sql_", "udf_", "udtf_"]),
]


def main() -> None:
    used: set[str] = set()
    lines = [
        "# COVERAGE — registry → SURVEY §2 operator inventory",
        "",
        "Auto-generated from `chess_ratings_spark.registry` "
        "(`python scripts/gen_coverage.py`). Every ID is a "
        "`queries()` entry; `SQL` = exact-hash DuckDB oracle, `rows` = "
        "rows-only check (approximate / filesystem / live-streaming "
        "operators). Implementation docstrings carry the reference "
        "file:line citations.",
        "",
    ]
    n_sql = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    lines += [
        f"**{len(REGISTRY)} queries: {n_sql} SQL-oracle-checked, "
        f"{len(REGISTRY) - n_sql} rows-only.**",
        "",
    ]
    for title, prefixes in SECTIONS:
        ids = sorted(
            n
            for n in REGISTRY
            if n not in used and any(n.startswith(p) or n == p for p in prefixes)
        )
        if not ids:
            continue
        used.update(ids)
        lines += [f"## {title}", "", "| ID | oracle | what |", "|---|---|---|"]
        for n in ids:
            q = REGISTRY[n]
            kind = "SQL" if q.oracle is not None else "rows"
            doc = " ".join(q.doc.split())
            if len(doc) > 110:
                doc = doc[:107] + "..."
            lines.append(f"| `{n}` | {kind} | {doc} |")
        lines.append("")
    leftover = sorted(set(REGISTRY) - used)
    if leftover:
        lines += ["## Other", "", "| ID | oracle | what |", "|---|---|---|"]
        for n in leftover:
            q = REGISTRY[n]
            kind = "SQL" if q.oracle is not None else "rows"
            lines.append(f"| `{n}` | {kind} | {' '.join(q.doc.split())[:110]} |")
        lines.append("")
    (REPO / "COVERAGE.md").write_text("\n".join(lines))
    print(f"COVERAGE.md: {len(REGISTRY)} queries ({n_sql} SQL, {len(REGISTRY)-n_sql} rows)")


if __name__ == "__main__":
    main()
