"""Evidence-freshness contract (round-9 verdict item 6): the rotation
policy in registry.py must not silently decay. For every SURVEY.md §2
operator ID, the latest driver CORRECTNESS row may be at most 4 rounds
old — or the operator must be scheduled in the current driver window
(the first 50 names of queries()), which is how an aging row gets its
refresh. A never-checked §2 ID must likewise be scheduled."""

from __future__ import annotations

import json
import pathlib
import re

import chess_ratings_spark.plans  # noqa: F401
from chess_ratings_spark import registry

ROOT = pathlib.Path(__file__).resolve().parents[1]
MAX_EVIDENCE_AGE = 4


def _survey2_ids() -> set[str]:
    src = (ROOT / "SURVEY.md").read_text()
    sec2 = src[src.index("## 2. Operator inventory") : src.index("## 3. Query lifecycle")]
    ids = set(re.findall(r"^\| `([a-z0-9_]+)`", sec2, re.M))
    ids.add("val_constraints")  # declared in §2.7 prose, not a table row
    return ids


def _latest_green() -> tuple[dict[str, int], int]:
    latest: dict[str, int] = {}
    rounds = [0]
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rn = int(p.stem.split("_r")[1])
        rounds.append(rn)
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rn)
    # the round being built is one past the newest recorded evidence
    return latest, max(rounds) + 1


def test_survey2_ids_all_registered():
    ids = _survey2_ids()
    missing = sorted(ids - set(registry.REGISTRY))
    assert not missing, f"SURVEY §2 IDs without a registered query: {missing}"


def test_new_registrations_land_survey2_rows_same_round():
    """Round-11 verdict #7: the §2 inventory table must not lag the
    registry. The registry legitimately carries depth queries beyond
    §2 (TPC-H, plan-proofs, format round-trips) — that backlog is
    PINNED here by count; a new registration must either add a §2
    table row (the default for a new operator) or consciously bump
    this pin (a deliberate depth query)."""
    ids = _survey2_ids()
    non_survey2 = sorted(set(registry.REGISTRY) - ids)
    assert len(non_survey2) == 94, (
        f"registry has {len(non_survey2)} non-§2 queries (pinned: 94) — "
        "a new registration is missing its SURVEY §2 row, or bump this "
        f"pin deliberately for a depth query. Non-§2 set: {non_survey2}"
    )


def test_survey2_evidence_freshness():
    ids = _survey2_ids()
    latest, current_round = _latest_green()
    window = set(list(registry.queries())[:50])
    stale = sorted(
        n
        for n in ids
        if n not in window
        and current_round - latest.get(n, current_round) > MAX_EVIDENCE_AGE
    )
    assert not stale, (
        f"SURVEY §2 evidence older than {MAX_EVIDENCE_AGE} rounds and not "
        f"scheduled in the driver window: {stale}"
    )
    never = sorted(n for n in ids if n not in latest and n not in window)
    assert not never, f"never-driver-checked §2 IDs not scheduled: {never}"


def test_next_round_cohort_fits_window():
    """Round-11 verdict #2: manage the cohort squeeze BEFORE it lands.
    Simulate the current window going green (every windowed name gets
    this round's evidence), then check that NEXT round's mandatory
    cohort — the §2 IDs that would hit the freshness floor — fits in a
    50-slot window with headroom for new registrations. Without this,
    a >50 cohort would make the freshness test unsatisfiable a round
    too late to fix."""
    ids = _survey2_ids()
    latest, current_round = _latest_green()
    window = list(registry.queries())[:50]
    simulated = dict(latest)
    for n in window:
        simulated[n] = current_round  # assume the driver refreshes the window
    next_round = current_round + 1
    mandatory = sorted(
        n for n in ids if next_round - simulated.get(n, next_round) > MAX_EVIDENCE_AGE
    )
    # leave >=8 slots for next round's new registrations + re-checks
    assert len(mandatory) <= 42, (
        f"round-{next_round} mandatory §2 cohort is {len(mandatory)} wide — "
        f"pre-empt some of it into this round's spare slots: {mandatory}"
    )


def test_registry_coverage_survey_counts_in_lockstep():
    """Round-10 verdict #7: |registry| == COVERAGE.md's stated total ==
    COVERAGE.md's table row count == SURVEY's stated total, so a drift
    between the three documents fails fast instead of surfacing as a
    judge finding."""
    n_reg = len(registry.REGISTRY)

    cov = (ROOT / "COVERAGE.md").read_text()
    m = re.search(r"\*\*(\d+) queries: (\d+) SQL-oracle-checked", cov)
    assert m, "COVERAGE.md header total missing"
    assert int(m.group(1)) == n_reg, "COVERAGE.md stated total drifted"
    n_sql_stated = int(m.group(2))
    cov_ids = re.findall(r"^\| `([a-z0-9_]+)` \|", cov, re.M)
    assert len(cov_ids) == len(set(cov_ids)) == n_reg, (
        "COVERAGE.md row count drifted from the registry"
    )
    assert set(cov_ids) == set(registry.REGISTRY)
    n_sql = sum(1 for q in registry.REGISTRY.values() if q.oracle is not None)
    assert n_sql == n_sql_stated, "COVERAGE.md SQL-oracle count drifted"

    survey = (ROOT / "SURVEY.md").read_text()
    m = re.search(r"all\s+(\d+) registered queries carry a SQL oracle", survey)
    assert m, "SURVEY.md stated total missing"
    assert int(m.group(1)) == n_reg, "SURVEY.md stated total drifted"
