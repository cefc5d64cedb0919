"""Plan-level divide scan (round-10, r9 verdict item 3, Spark side).

The suite lint (tests/test_divide_lint.py) scans ORACLE SQL text; this
script scans the SPARK side: it builds every registered non-streaming
query's DataFrame at sf0.001, renders the ANALYZED logical plan, and
reports division expressions that are not wrapped in a CASE/if guard
and do not divide by a literal.  Run in-session when a batch of new
queries lands; streaming_* queries are skipped because calling them
executes a real streaming job.

Heuristic mirror of anomaly_detection_spark.lint.needs_review_sites,
adapted to Catalyst's expression rendering:
- guarded: `CASE WHEN ... >/!=/<> ... THEN (... / ...)` or `if(...)`
  within the preceding context window;
- safe: literal denominator (incl. cast(literal)), `nullif`,
  `greatest`.

Output: one line per flagged site `name<TAB>snippet`, and a summary.
Exit code 0 always — this is the human-readable REVIEW FEED; the
pinned GATE over the same heuristic is the env-gated
``tests/test_plan_divide_lint.py`` (per-query counts vs
``tests/plan_divide_allowlist.json``).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anomaly_detection_spark import queries as reg  # noqa: E402
from anomaly_detection_spark.lint import plan_needs_review_sites  # noqa: E402
from anomaly_detection_spark.session import get_spark  # noqa: E402

# single source of truth: the lint module's plan-side heuristic
flag_plan = plan_needs_review_sites


def main() -> None:
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("divide-plan-scan", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    n_scanned = n_flagged = 0
    for name, fn in reg.QUERIES.items():
        if name.startswith("streaming_"):
            continue
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().analyzed().toString()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name}\tPLAN-BUILD-ERROR\t{type(e).__name__}: {e}")
            continue
        n_scanned += 1
        hits = flag_plan(plan)
        if hits:
            n_flagged += 1
            for h in set(hits):
                print(f"{name}\t{h}")
    print(
        f"# scanned={n_scanned} flagged_queries={n_flagged}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
