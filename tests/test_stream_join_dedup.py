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


def test_streaming_incremental_rollup(spark):
    """Three triggers of events maintain a per-user rollup state; the
    final state must equal the full GROUP BY over everything fed —
    merge == recompute, continuously."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from anomaly_detection_spark.streaming.ingest import (
        make_incremental_rollup, read_rollup_state,
    )

    d = tempfile.mkdtemp()
    src, state, ckpt = (os.path.join(d, x) for x in ("src", "state", "ckpt"))
    os.makedirs(src)
    schema = "user_id long, v long"

    batches = [
        [(1, 10), (1, 20), (2, 5)],
        [(1, 1), (3, 7), (3, 8)],
        [(2, 100), (1, 2)],
    ]
    cents = F.col("v")
    on_batch = make_incremental_rollup(
        state,
        keys=["user_id"],
        updates={"n": F.count("v"), "s": F.sum(cents),
                 "mn": F.min("v"), "mx": F.max("v")},
        merges={"n": F.sum("n"), "s": F.sum("s"),
                "mn": F.min("mn"), "mx": F.max("mx")},
    )

    stream = (
        spark.readStream.schema(schema).parquet(src)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
    )
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = stream.start()
        q.awaitTermination(120)

    got = {
        r.user_id: (r.n, r.s, r.mn, r.mx)
        for r in read_rollup_state(spark, state).collect()
    }
    all_rows = [r for b in batches for r in b]
    full = spark.createDataFrame(all_rows, schema).groupBy("user_id").agg(
        F.count("v").alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("mn"), F.max("v").alias("mx"),
    )
    want = {r.user_id: (r.n, r.s, r.mn, r.mx) for r in full.collect()}
    assert got == want
    # versioning: one state version per trigger that saw data
    import glob
    assert len(glob.glob(os.path.join(state, "v=*"))) >= 3


def test_incremental_rollup_redelivery_idempotent(spark):
    """A crashed trigger redelivers its batch with the SAME batch id;
    the stamped version directory is the transaction marker, so the
    second delivery must not double-merge."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from anomaly_detection_spark.streaming.ingest import (
        make_incremental_rollup, read_rollup_state,
    )

    state = os.path.join(tempfile.mkdtemp(), "state")
    on_batch = make_incremental_rollup(
        state, keys=["k"],
        updates={"n": F.count("v"), "s": F.sum("v")},
        merges={"n": F.sum("n"), "s": F.sum("s")},
    )
    schema = "k long, v long"
    b0 = spark.createDataFrame([(1, 10), (1, 5)], schema)
    b1 = spark.createDataFrame([(1, 100)], schema)

    on_batch(b0, 0)
    on_batch(b1, 1)
    on_batch(b1, 1)   # redelivery of batch 1 — must be a no-op
    got = {r.k: (r.n, r.s) for r in read_rollup_state(spark, state).collect()}
    assert got == {1: (3, 115)}


def test_streaming_cdc_apply_matches_batch(spark):
    """Three triggers of CDC changes maintain the current-state table;
    the final live view must equal batch cdc_apply over everything fed
    — including a delete, a later-seq resurrect, and a late lower-seq
    row that must NOT resurrect a deleted key."""
    import os
    import tempfile

    from anomaly_detection_spark.operators.upsert import cdc_apply
    from anomaly_detection_spark.streaming.ingest import (
        make_cdc_apply, read_cdc_state,
    )

    d = tempfile.mkdtemp()
    src, state, ckpt = (os.path.join(d, x) for x in ("src", "state", "ckpt"))
    os.makedirs(src)
    schema = "key long, seq long, op string, val double"

    batches = [
        [(1, 1, "I", 5.0), (2, 1, "I", 7.0)],
        [(1, 3, "U", 20.0), (2, 2, "D", 0.0), (3, 1, "I", 1.0)],
        # late lower-seq row for deleted key 2 (stays dead) +
        # higher-seq resurrect for key 2 is NOT sent; key 1 late U(2)
        [(2, 1, "U", 9.0), (1, 2, "U", 10.0)],
    ]
    on_batch = make_cdc_apply(state, ["key"], "seq")
    stream = (
        spark.readStream.schema(schema).parquet(src)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
    )
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = stream.start()
        q.awaitTermination(120)

    got = sorted(map(tuple, read_cdc_state(spark, state).collect()))
    all_rows = [r for b in batches for r in b]
    want = sorted(map(tuple, cdc_apply(
        spark.createDataFrame(all_rows, schema), ["key"], "seq"
    ).collect()))
    assert got == want
    # key 2 stays deleted; keys 1 and 3 live at their max seq
    keys = {t[0] for t in got}
    assert keys == {1, 3}


def test_stream_interval_join_outer_emits_unmatched_after_watermark(spark):
    """LEFT OUTER stream-stream interval join: the matched pair emits
    normally; an error with NO purchase in its 30-min interval emits
    with NULL right columns once the watermark proves no match can
    still arrive; a still-open left row does not emit."""
    from anomaly_detection_spark.streaming.joins import (
        stream_interval_join_outer,
    )

    d = tempfile.mkdtemp()
    src = os.path.join(d, "src")
    os.makedirs(src)
    batches = [
        [_mk(1, 1, 0, "error"), _mk(2, 1, 10, "purchase"),
         _mk(3, 2, 0, "error")],                 # u2: never matched
        [_mk(4, 9, 300, "error")],               # watermark pusher
        [_mk(5, 8, 302, "purchase")],            # extra trigger (user 8:
                                                 # right-only, never emits)
    ]
    for i, chunk in enumerate(batches):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    stream = _stream(spark, src)
    errors = stream.where(F.col("kind") == "error").select(
        F.col("event_id").alias("err_id"), "user_id",
        F.col("ts").alias("err_ts"),
    )
    purchases = stream.where(F.col("kind") == "purchase").select(
        F.col("event_id").alias("pur_id"), "user_id",
        F.col("ts").alias("pur_ts"),
    )
    out = stream_interval_join_outer(
        errors, purchases, ["user_id"], "err_ts", "pur_ts",
        interval_seconds=1800, watermark="30 minutes",
    )
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("soj").option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.err_id: (r.pur_id, r.pur_ts)
            for r in spark.sql("SELECT * FROM soj").collect()}
    assert rows[1] == (2, BASE + dt.timedelta(minutes=10))
    assert rows[3] == (None, None)   # watermark-proven unmatched
    assert 4 not in rows             # still open, must not emit
    shutil.rmtree(d, ignore_errors=True)
