"""Stream-stream interval join and watermarked dedup over file
replays, differentially tested against batch equivalents."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anomaly_detection_spark.streaming.joins import stream_dedup, stream_interval_join

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("kind", T.StringType()),
])

BASE = dt.datetime(2024, 1, 1)


def _mk(eid, uid, minutes, kind):
    return (eid, uid, BASE + dt.timedelta(minutes=minutes), kind)


ROWS = [
    _mk(1, 1, 0, "error"),
    _mk(2, 1, 10, "purchase"),      # within 30m of error 1
    _mk(3, 1, 40, "purchase"),      # outside
    _mk(4, 2, 0, "error"),
    _mk(5, 2, 29, "purchase"),      # within
    _mk(6, 3, 5, "purchase"),       # no error for user 3
    _mk(7, 2, 95, "error"),
    _mk(8, 2, 100, "purchase"),     # within 30m of error 7
]


@pytest.fixture()
def replay(spark):
    d = tempfile.mkdtemp()
    src = os.path.join(d, "src")
    os.makedirs(src)
    for i, chunk in enumerate([ROWS[:4], ROWS[4:]]):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    yield src
    shutil.rmtree(d, ignore_errors=True)


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )


def _drain(spark, df, name):
    q = (
        df.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_stream_interval_join_matches_batch(spark, replay):
    s = _stream(spark, replay)
    errors = s.where(F.col("kind") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("e_ts")
    )
    purchases = s.where(F.col("kind") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"),
    )
    joined = stream_interval_join(
        errors, purchases, keys=["user_id"],
        left_ts="e_ts", right_ts="p_ts", interval_seconds=1800,
    )
    got = sorted(
        (r.error_id, r.purchase_id) for r in _drain(spark, joined, "ssj").collect()
    )
    assert got == [(1, 2), (4, 5), (7, 8)]


def test_stream_dedup_within_watermark(spark):
    d = tempfile.mkdtemp()
    src = os.path.join(d, "src")
    os.makedirs(src)
    # same event_id delivered in two consecutive micro-batches
    b1 = [_mk(1, 1, 0, "error"), _mk(2, 1, 1, "purchase")]
    b2 = [_mk(2, 1, 1, "purchase"), _mk(3, 1, 2, "view")]
    for i, chunk in enumerate([b1, b2]):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    try:
        deduped = stream_dedup(_stream(spark, src), ["event_id"], "ts")
        got = sorted(r.event_id for r in _drain(spark, deduped, "sdd").collect())
        assert got == [1, 2, 3]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_curated_ingest(spark):
    """Each microbatch is curated against the already-accepted corpus:
    exact and near copies of earlier-ingested docs are dropped, fresh
    docs are appended — including near-dups of docs accepted in a
    PREVIOUS trigger."""
    import tempfile, shutil, os
    from anomaly_detection_spark.streaming.ingest import make_curated_ingest

    d = tempfile.mkdtemp()
    src = os.path.join(d, "src")
    corpus = os.path.join(d, "corpus")
    ckpt = os.path.join(d, "ckpt")
    os.makedirs(src)

    doc_schema = "doc_id long, text string"
    base = {
        0: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        1: "one two three four five six seven eight nine ten eleven",
        2: "red orange yellow green blue indigo violet pink brown black",
    }
    b0 = [(i, t) for i, t in base.items()]
    b1 = [
        (10, "completely different words here about spark and parquet files"),
        (11, base[1]),                       # exact copy of doc 1 -> drop
        (12, base[2] + " extra"),            # near copy of doc 2 -> drop
    ]
    b2 = [
        (20, "final batch brings this genuinely novel document body text"),
        (21, b1[0][1] + " tail"),            # near copy of doc 10 (accepted in b1) -> drop
        (22, "final batch brings this genuinely novel document body text"),  # exact dup of 20 IN-batch -> drop
    ]
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows, doc_schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )

    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            make_curated_ingest(corpus, jaccard_threshold=0.5)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    shutil.rmtree(d, ignore_errors=True)
    assert got == {0, 1, 2, 10, 20}, got
