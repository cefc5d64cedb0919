"""Round-7 new-operator laws: Wald-Wolfowitz runs test and McNemar's
paired test — closed-form values on engineered series, plus the REAL
oracle compare on the same fixture (the driver's gate in miniature)."""

from __future__ import annotations

import datetime as dt
import math
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from anomaly_detection_spark import queries as reg
from tests.oracle_check import compare

BASE = dt.datetime(2024, 1, 1)


def _events_dir(spark, per_user):
    from pyspark.sql import functions as F

    rows = []
    eid = 0
    for uid, values in per_user.items():
        for i, v in enumerate(values):
            eid += 1
            rows.append((uid, eid, BASE + dt.timedelta(days=i), "view",
                         float(v)))
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(
        pa.Table.from_pandas(ev.toPandas()), os.path.join(d, "events.parquet")
    )
    return d


def test_runs_test_alternating_and_clustered_closed_form(spark):
    # alternating 1,9,1,9,... (10 values): median2 = 1+9 = 10 so every
    # value is off-median; runs = 10 (max), n1 = n2 = 5.
    # clustered 1x5 then 9x5: runs = 2 (min).
    # Z = (R - 6) / sqrt(2*5*5*(2*5*5-10) / (100*9)) = (R-6)/sqrt(40/9)
    d = _events_dir(spark, {
        1: [1, 9] * 5,
        2: [1] * 5 + [9] * 5,
        3: [7] * 12,            # constant: all values tie the median
    })
    out = {r["user_id"]: r for r in
           reg.QUERIES["runs_test_users"](spark, d).collect()}
    sd = math.sqrt(2 * 5 * 5 * (2 * 5 * 5 - 10) / (100.0 * 9))
    assert out[1]["runs"] == 10 and out[1]["n1"] == 5 and out[1]["n2"] == 5
    assert out[1]["z_runs"] == round((10 - 6) / sd, 6)
    assert out[2]["runs"] == 2
    assert out[2]["z_runs"] == round((2 - 6) / sd, 6)
    # constant series: every value equals the median -> nothing to test
    assert out[3]["n_used"] == 0 and out[3]["z_runs"] is None
    assert not compare(reg.QUERIES["runs_test_users"](spark, d),
                       reg.ORACLES["runs_test_users"], d)


def test_runs_test_even_split_median(spark):
    # 10 values 1..10: med2 = v[5]+v[6] = 11, no value satisfies
    # 2v = 11 (odd), so all 10 survive; monotone series -> 2 runs.
    d = _events_dir(spark, {1: list(range(1, 11))})
    row = reg.QUERIES["runs_test_users"](spark, d).collect()[0]
    assert row["n_used"] == 10 and row["runs"] == 2
    assert not compare(reg.QUERIES["runs_test_users"](spark, d),
                       reg.ORACLES["runs_test_users"], d)


def test_mcnemar_identities_sf0001(spark):
    sf = "/root/testdata/sf0.001"
    row = reg.QUERIES["mcnemar_rule_classifier"](spark, sf).collect()[0]
    n10, n01 = row["n10"], row["n01"]
    if n10 + n01 > 0:
        assert row["chi2_fp"] == ((n10 - n01) ** 2 * 1000000) // (n10 + n01)
        assert row["chi2_cc_fp"] <= row["chi2_fp"]
    else:
        assert row["chi2_fp"] is None and row["chi2_cc_fp"] is None
