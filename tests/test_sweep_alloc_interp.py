"""Planted-data semantics tests for the sweep-line peak concurrency,
largest-remainder apportionment, and daily-grid linear interpolation
queries.  The oracle differential covers engine parity; these pin the
semantics on hand-built inputs where the right answer is computed by
inspection.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from anomaly_detection_spark import queries as reg

BASE = dt.datetime(2024, 1, 1)


def _day(n):
    return BASE + dt.timedelta(days=n)


def _write(spark, d, name, rows, schema):
    t = spark.createDataFrame(rows, schema)
    pq.write_table(
        pa.Table.from_pandas(t.toPandas()),
        os.path.join(d, f"{name}.parquet"),
    )


def test_sweepline_peak_level_and_earliest_day(spark):
    d = tempfile.mkdtemp()
    # open intervals (end = max shipdate + 1 day):
    #   o1 [Jan1, Jan4)   o2 [Jan2, Jan6)   o3 [Jan5, Jan8)
    # levels: Jan1=1, Jan2=2, Jan4=1, Jan5=2, Jan6=1, Jan8=0
    # -> January peak 2, first attained Jan2
    _write(spark, d, "orders",
           [(1, 1, "O", 1.0, _day(0), "1-URGENT"),
            (2, 1, "O", 1.0, _day(1), "1-URGENT"),
            (3, 1, "O", 1.0, _day(4), "1-URGENT")],
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, "
           "o_orderpriority string")
    _write(spark, d, "lineitem",
           [(1, _day(2)), (1, _day(1)), (2, _day(4)), (3, _day(6))],
           "l_orderkey long, l_shipdate timestamp")
    out = {r.month: r for r in
           reg.QUERIES["sweepline_peak_concurrency"](spark, d).collect()}
    assert out["2024-01"].peak_open == 2
    assert out["2024-01"].peak_day == "2024-01-02"


def test_largest_remainder_sums_to_budget_with_name_tiebreak(spark):
    d = tempfile.mkdtemp()
    # three equal revenues: floor 3333 each, leftover 1 seat ->
    # remainder ties broken by nation name: ALPHA gets the +1
    _write(spark, d, "orders",
           [(i, i, "O", 0.01, _day(0), "x") for i in (1, 2, 3)],
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, "
           "o_orderpriority string")
    _write(spark, d, "customer",
           [(1, 1), (2, 2), (3, 3)],
           "c_custkey long, c_nationkey long")
    _write(spark, d, "nation",
           [(1, "ALPHA"), (2, "BETA"), (3, "GAMMA")],
           "n_nationkey long, n_name string")
    out = {r.n_name: r for r in
           reg.QUERIES["largest_remainder_allocation"](spark, d).collect()}
    assert sum(r.final_alloc for r in out.values()) == 10000
    assert all(r.floor_alloc == 3333 for r in out.values())
    assert out["ALPHA"].final_alloc == 3334
    assert out["BETA"].final_alloc == 3333


def test_linear_interpolation_exact_hits_and_midpoints(spark):
    d = tempfile.mkdtemp()
    rows = [
        # user 1: purchases exactly at midnights Jan1 (1.00) and
        # Jan3 (3.00) -> grid Jan1/Jan2/Jan3 = 100/200/300 cents
        (1, 1, _day(0), "purchase", 1.0),
        (1, 2, _day(2), "purchase", 3.0),
        # user 2: purchases at Jan1 12:00 (1.00) and Jan2 12:00
        # (1.01) -> grid Jan2 00:00 midway = 100.5 cents
        (2, 3, _day(0) + dt.timedelta(hours=12), "purchase", 1.0),
        (2, 4, _day(1) + dt.timedelta(hours=12), "purchase", 1.01),
        # noise another type, and a single-purchase user (excluded)
        (1, 5, _day(1), "view", 9.0),
        (3, 6, _day(0), "purchase", 5.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(
        pa.Table.from_pandas(ev.toPandas()),
        os.path.join(d, "events.parquet"),
    )
    out = {(r.user_id, r.grid_day): r.interp_millicents for r in
           reg.QUERIES["linear_interpolation_grid"](spark, d).collect()}
    assert out[(1, "2024-01-01")] == 100_000
    assert out[(1, "2024-01-02")] == 200_000
    assert out[(1, "2024-01-03")] == 300_000
    assert out[(2, "2024-01-02")] == 100_500
    assert not any(u == 3 for (u, _) in out)
