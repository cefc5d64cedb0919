"""Budget guard for the benchmark headliner set.

The r03 bench spent 145 of ~222 s on one query (``ppjoin_jaccard_pairs``)
whose *answer* was quadratic in the corpus — 7.1M pairs at sf0.1 — while
its static plan looked clean (PLANS.md showed pushdown + 3 shuffles).
EXPLAIN cannot see data-dependent output cardinality, so this test
measures it: every BENCH_QUERIES member is run at sf0.001 and sf0.01 and
must show sub-quadratic output growth.  A 10x input growth with a clean
(linear or better) operator yields at most ~10x more rows; quadratic
output yields ~100x.  The same spirit as the r02 schema-canon guard
(the nested-type assert riding ``test_query_matches_oracle``) — fail in CI before
the driver ever times the query.
"""

from __future__ import annotations

from bench import BENCH_QUERIES
from anomaly_detection_spark import queries as reg

# Absolute ceiling at sf0.01: a bench query's output is a summary, a
# top-k, or a per-entity row — never a row-per-pair blowup.  200k rows
# at sf0.01 extrapolates to ~2M at sf0.1 (already generous) and ~2G at
# the 100 TB scale the plans are written for.
MAX_ROWS_SF001 = 200_000

# Growth ceiling: 10x input may legitimately produce up to ~10x output
# (linear), plus headroom for threshold effects near the boundary.
# Quadratic growth shows up as ~100x and fails loudly.
MAX_GROWTH = 35.0

# Only police growth when the sf0.01 output is big enough for the ratio
# to be meaningful; sub-1000-row outputs cannot hurt the bench.
GROWTH_MIN_ROWS = 1_000


def test_bench_queries_registered():
    missing = [q for q in BENCH_QUERIES if q not in reg.QUERIES]
    assert not missing, missing


def test_bench_output_stays_bounded(spark, sf_dir, sf_dir_oracle):
    offenders = []
    for name in BENCH_QUERIES:
        fn = reg.QUERIES[name]
        small = fn(spark, sf_dir).count()
        big = fn(spark, sf_dir_oracle).count()
        spark.catalog.clearCache()
        if big > MAX_ROWS_SF001:
            offenders.append(f"{name}: {big} rows at sf0.01 (> {MAX_ROWS_SF001})")
        elif big >= GROWTH_MIN_ROWS and big > MAX_GROWTH * max(small, 1):
            offenders.append(
                f"{name}: superlinear output growth {small} -> {big} "
                f"({big / max(small, 1):.0f}x for a 10x input)"
            )
    assert not offenders, offenders
