"""Pre-round-close gate: driver-sim over the never-driver-green backlog.

The round driver verifies only the first 50 `queries()` entries per
round, so a freshly added query's first real differential run would
otherwise happen AT the driver — where a red is expensive. This test
replays the driver's exact comparison (`tests/oracle_check.compare`,
the stricter local replica) over every oracle-paired query that has no
green row in any `CORRECTNESS_r*.json` yet, at the driver's sf0.01.

It is env-gated (`SPARK_GRAFT_BACKLOG=1`) because the backlog sweep is
a multi-minute job by design; the round-close checklist runs it
explicitly (see `.claude/skills/verify/SKILL.md`).
"""

from __future__ import annotations

import glob
import json
import os

import pytest

RUN = os.environ.get("SPARK_GRAFT_BACKLOG") == "1"

pytestmark = pytest.mark.skipif(
    not RUN, reason="backlog sweep is opt-in: set SPARK_GRAFT_BACKLOG=1"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_green_names() -> set[str]:
    """Queries with a green row in any driver CORRECTNESS file."""
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if row.get("match") is True or (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


def backlog_names() -> list[str]:
    from anomaly_detection_spark import queries as reg

    green = driver_green_names()
    return [n for n in reg.ORACLES if n not in green]


def test_backlog_is_green_against_oracles(spark, sf_dir_oracle):
    from anomaly_detection_spark import queries as reg
    from tests.oracle_check import compare

    names = backlog_names()
    if not names:
        import pytest
        pytest.skip("no backlog — nothing to sweep (fine after a full sweep)")
    failures = {}
    for name in names:
        try:
            df = reg.QUERIES[name](spark, sf_dir_oracle)
            problems = compare(df, reg.ORACLES[name], sf_dir_oracle)
        except Exception as exc:  # a crash is a red too
            problems = [f"exception: {exc!r}"]
        if problems:
            failures[name] = problems
    assert not failures, f"{len(failures)} backlog reds: {failures}"


def test_rows_only_backlog_returns_rows(spark, sf_dir_oracle):
    from anomaly_detection_spark import queries as reg

    green = driver_green_names()
    rows_only = [
        n for n in reg.QUERIES if n not in reg.ORACLES and n not in green
    ]
    for name in rows_only:
        assert reg.QUERIES[name](spark, sf_dir_oracle).count() >= 0, name
