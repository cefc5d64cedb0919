"""Custom Python DataSource (ticker_feed): batch determinism, partition
parallelism, and batch↔stream equivalence."""

from __future__ import annotations

import tempfile

from anomaly_detection_spark.sources.ticker_source import register


def _read(spark, **opts):
    reader = spark.read.format("ticker_feed")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_batch_shape_and_determinism(spark):
    register(spark)
    df = _read(spark, n_series=6, n_days=10, partitions=3)
    assert df.count() == 60
    assert df.rdd.getNumPartitions() == 3
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark, n_series=6, n_days=10, partitions=3).collect()))
    assert a == b
    # per-series: distinct days, monotone timestamps
    one = [r for r in a if r[0] == 1 and r[1] == 1]
    assert len(one) == 10
    assert [r[2] for r in one] == sorted(r[2] for r in one)


def test_stream_matches_batch(spark):
    register(spark)
    batch = sorted(map(tuple, _read(spark, n_series=4, n_days=6).collect()))
    stream = (
        spark.readStream.format("ticker_feed")
        .option("n_series", 4).option("n_days", 6).load()
    )
    q = (
        stream.writeStream.format("memory").queryName("ticker_stream")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from ticker_stream").collect()))
    assert got == batch
