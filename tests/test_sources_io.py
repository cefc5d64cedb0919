"""Source/sink facade round-trips (sources/io.py, SURVEY.md §2.1)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from anomaly_detection_spark.sources.io import read_source, stream_source, write_sink
from anomaly_detection_spark.sources.tables import load_table

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_lossless(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).limit(300)
    path = os.path.join(tmp_path, "ev_csv")
    write_sink(ev, path, fmt="csv")
    back = read_source(spark, path, fmt="csv", schema=EVENTS_SCHEMA)
    assert back.schema == ev.schema
    assert _rows(back) == _rows(ev)


def test_json_roundtrip_lossless(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).limit(300)
    path = os.path.join(tmp_path, "ev_json")
    write_sink(ev, path, fmt="json")
    back = read_source(spark, path, fmt="json", schema=EVENTS_SCHEMA)
    # json drops null-valued fields per row; schema-on-read restores them
    assert back.schema == ev.schema
    assert _rows(back) == _rows(ev)


def test_xml_roundtrip_lossless(spark, sf_dir, tmp_path):
    # Spark 4 ships XML natively (the former spark-xml): same
    # schema-on-read contract as csv/json through the facade
    ev = load_table(spark, "events", sf_dir).limit(300)
    path = os.path.join(tmp_path, "ev_xml")
    write_sink(ev, path, fmt="xml")
    back = read_source(spark, path, fmt="xml", schema=EVENTS_SCHEMA)
    assert back.schema == ev.schema
    assert _rows(back) == _rows(ev)


def test_csv_null_vs_empty_string(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "id bigint, s string"
    )
    path = os.path.join(tmp_path, "nulls_csv")
    write_sink(df, path, fmt="csv")
    back = read_source(spark, path, fmt="csv", schema="id bigint, s string",
                       emptyValue="")
    assert _rows(back) == _rows(df)


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    orders = load_table(spark, "orders", sf_dir)
    path = os.path.join(tmp_path, "orders_part")
    write_sink(orders, path, partition_by=["o_orderstatus"])
    statuses = [r[0] for r in orders.select("o_orderstatus").distinct().collect()]
    # hive-style layout exists
    dirs = [d for d in os.listdir(path) if d.startswith("o_orderstatus=")]
    assert sorted(dirs) == sorted(f"o_orderstatus={s}" for s in statuses)
    back = read_source(spark, path).where(F.col("o_orderstatus") == statuses[0])
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter present → non-matching directories never scanned
    assert "o_orderstatus" in plan
    expect = orders.where(F.col("o_orderstatus") == statuses[0]).count()
    assert back.count() == expect


def test_stream_source_file_drop(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).limit(500)
    src = os.path.join(tmp_path, "drop")
    write_sink(ev.repartition(4), src)  # 4 files → multiple batch splits
    stream = stream_source(spark, src, "parquet", EVENTS_SCHEMA,
                           maxFilesPerTrigger="2")
    q = (
        stream.groupBy("event_type").count()
        .writeStream.format("memory").queryName("io_stream_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["event_type"]: r["count"]
        for r in spark.sql("select * from io_stream_counts").collect()
    }
    want = {
        r["event_type"]: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    assert got == want


def test_json_permissive_corrupt_records(spark, tmp_path):
    """Production sources must capture, not crash on, malformed rows:
    PERMISSIVE mode routes bad lines to _corrupt_record."""
    path = os.path.join(tmp_path, "dirty")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        f.write('{"id": 1, "v": 10.5}\n')
        f.write('{"id": 2, "v": "not-a-number}\n')  # malformed JSON
        f.write('{"id": 3, "v": 7.25}\n')
    schema = "id bigint, v double, _corrupt_record string"
    df = read_source(spark, path, fmt="json", schema=schema,
                     mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record")
    rows = df.collect()
    good = sorted((r.id, r.v) for r in rows if r._corrupt_record is None)
    bad = [r for r in rows if r._corrupt_record is not None]
    assert good == [(1, 10.5), (3, 7.25)]
    assert len(bad) == 1 and "not-a-number" in bad[0]._corrupt_record


def test_observation_metrics_inline(spark, sf_dir):
    """`df.observe` collects audit metrics (row counts, null counts,
    sums) during the SAME action that produces the result — the
    zero-extra-pass observability hook a daily job wants."""
    from pyspark.sql import Observation

    ev = load_table(spark, "events", sf_dir)
    obs = Observation("audit")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("value").isNull()).alias("null_values"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )
    out = observed.groupBy("event_type").count()
    n_types = out.count()  # one action drives both result and metrics
    m = obs.get
    assert m["n_rows"] == ev.count()
    assert m["null_values"] == 0
    assert n_types > 0 and m["value_sum"] > 0


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Appended partitions may ADD columns (corpus metadata grows over
    time); ``mergeSchema`` reads the union schema with NULLs for the
    old partitions — the append-only evolution contract a long-lived
    100 TB dataset relies on."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(3).select("id", F.lit("a").alias("v")).write.parquet(
        p + "/day=1"
    )
    spark.range(2).select(
        "id", F.lit("b").alias("v"), F.lit(7).alias("extra")
    ).write.parquet(p + "/day=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "v", "extra", "day"}
    rows = {(r.day, r.id): r.extra for r in df.collect()}
    assert rows[(1, 0)] is None and rows[(2, 0)] == 7
    # old partitions still fully readable; counts preserved
    assert df.count() == 5
