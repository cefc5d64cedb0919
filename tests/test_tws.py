"""transformWithStateInPandas run-length: parity with the
applyInPandasWithState implementation over the same replay.

The TWS runtime needs ``google.protobuf`` (its state-server protocol);
this container doesn't ship it, so the parity test self-skips where
the API can't execute — the implementation is exercised wherever
protobuf exists.
"""

from __future__ import annotations

import pytest


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf (absent here)",
)

import datetime as dt
import os
import shutil
import tempfile

from pyspark.sql import types as T

from anomaly_detection_spark.streaming.rules_stream import stateful_run_length
from anomaly_detection_spark.streaming.tws import tws_run_length

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("value", T.DoubleType()),
])

ROWS = [
    # key 1: run of 3 split across batches + a late row
    (1, dt.datetime(2024, 1, 1, 0, 0), 1.0),
    (1, dt.datetime(2024, 1, 1, 0, 1), 5.0),
    (1, dt.datetime(2024, 1, 1, 0, 2), 5.0),
    (1, dt.datetime(2024, 1, 1, 0, 3), 5.0),
    (1, dt.datetime(2024, 1, 1, 0, 1, 30), 9.9),  # late → dropped
    (1, dt.datetime(2024, 1, 1, 0, 4), 7.0),
    # key 2: alternating, never flags
    (2, dt.datetime(2024, 1, 1, 0, 0), 3.0),
    (2, dt.datetime(2024, 1, 1, 0, 1), 4.0),
    (2, dt.datetime(2024, 1, 1, 0, 2), 3.0),
]


@pytest.fixture()
def replay_dir(spark):
    d = tempfile.mkdtemp()
    src = os.path.join(d, "src")
    os.makedirs(src)
    for i, chunk in enumerate([ROWS[:3], ROWS[3:6], ROWS[6:]]):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"b{i}"))
    yield src
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, op, name, src):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    out = op(stream, "user_id", "ts", "value", value_rep_lim=3)
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName(name).option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return sorted(
        tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()
    )


def test_tws_matches_apply_in_pandas_with_state(spark, replay_dir):
    old = _run(spark, stateful_run_length, "tws_old", replay_dir)
    new = _run(spark, tws_run_length, "tws_new", replay_dir)
    assert new == old
    assert len(new) == 8  # 9 rows minus the dropped late one
    flags = [r for r in new if r[4] == 1]
    assert len(flags) == 1 and flags[0][3] == 3  # run of 3 flagged once
