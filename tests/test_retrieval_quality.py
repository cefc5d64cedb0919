"""BM25 retrieval, duplicated-span detection, Gopher rules, SCD2 —
planted-case unit tests (the oracle differential in test_oracle_parity
covers fixture-wide agreement; these pin the semantics on adversarial
micro-fixtures)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.dedup import duplicated_spans
from anomaly_detection_spark.pipeline.retrieval import bm25_topk
from anomaly_detection_spark.pipeline.text import gopher_quality_rules


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_term_dense_doc_first(spark):
    docs = _docs(spark, [
        (1, "spark spark spark join join filter"),
        (2, "spark join other words here padding padding padding"),
        (3, "nothing relevant at all in this document text"),
        (4, "join"),
    ])
    out = bm25_topk(docs, ["spark", "join"], k=4).collect()
    ids = [r.doc_id for r in out]
    # doc 3 has no query terms -> absent entirely
    assert 3 not in ids
    # doc 1 (dense in both terms) outranks doc 2 (diluted)
    assert ids.index(1) < ids.index(2)
    # every score positive, n_terms_hit correct
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_terms_hit == 2 and by_id[4].n_terms_hit == 1
    assert all(r.score > 0 for r in out)


def test_bm25_idf_downweights_ubiquitous_terms(spark):
    # 'common' appears everywhere, 'rare' once; equal tf within the doc
    docs = _docs(spark, [
        (1, "common rare"),
        (2, "common x"),
        (3, "common y"),
        (4, "common z"),
    ])
    out = {r.doc_id: r.score for r in bm25_topk(docs, ["common"], k=4).collect()}
    rare = {r.doc_id: r.score
            for r in bm25_topk(docs, ["rare"], k=4).collect()}
    # the rare term contributes more to doc 1 than the common term does
    assert rare[1] > out[1]


def test_duplicated_spans_planted_copy(spark):
    shared = "x" * 15 + "SHARED-SPAN-PAYLOAD-0123456789" + "y" * 15
    docs = _docs(spark, [
        (1, shared + " unique tail one"),
        (2, shared + " completely different ending two"),
        (3, "no overlap with anything else whatsoever in here ok"),
    ])
    out = duplicated_spans(docs, span_chars=40, stride=10, min_docs=2)
    rows = out.collect()
    # the planted shared prefix produces at least one cross-doc span
    assert rows and all(r.n_docs >= 2 for r in rows)
    # strided spans of the shared 60-char prefix: starts 1,11,21 fit
    assert any(r.n_occurrences >= 2 for r in rows)


def test_duplicated_spans_no_false_pairs(spark):
    docs = _docs(spark, [
        (1, "a" * 80),
        (2, "b" * 80),
    ])
    assert duplicated_spans(docs, span_chars=40, stride=10).count() == 0


def test_gopher_rules_flag_semantics(spark):
    good = ("the quick brown fox jumps over the lazy dog and that "
            "fence with a be to of have")
    docs = _docs(spark, [
        (1, good),                          # passes all rules
        (2, "too short"),                   # n_words < 5
        (3, "#" * 1 + " ### ## the a of and be to have " + "x " * 5),  # symbols
        (4, ("ab " * 50).strip()),          # no stopwords
    ])
    out = {r.doc_id: r for r in gopher_quality_rules(docs).collect()}
    assert out[1].keep is True
    assert out[2].keep is False and out[2].n_words == 2
    assert out[4].keep is False and out[4].n_stopwords == 0
    # symbol ratio computed over words
    assert out[3].symbol_ratio > 0.1 and out[3].keep is False


def test_scd2_history_runs_collapse_and_current_flag(spark):
    from anomaly_detection_spark import queries as reg
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base, "a"),
        (1, 2, base + dt.timedelta(minutes=1), "a"),
        (1, 3, base + dt.timedelta(minutes=2), "b"),
        (1, 4, base + dt.timedelta(minutes=3), "a"),
        (2, 5, base, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, event_type string"
    )
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    # write a SINGLE-FILE mini events table (load_table's layout)
    pdf = ev.withColumn("value", F.lit(1.0)).withColumn(
        "props", F.lit("{}")
    ).toPandas()
    pq.write_table(
        pa.Table.from_pandas(pdf), os.path.join(d, "events.parquet")
    )
    out = {
        (r.user_id, r.state, r.valid_from): (r.valid_to, r.n_events, r.is_current)
        for r in reg.QUERIES["scd2_user_state"](spark, d).collect()
    }
    # consecutive 'a','a' collapse into one run of 2 events
    assert out[(1, "a", base)] == (base + dt.timedelta(minutes=2), 2, False)
    # the reopened 'a' run is a NEW interval (no type-2 merge across gaps)
    assert out[(1, "a", base + dt.timedelta(minutes=3))] == (None, 1, True)
    assert out[(2, "c", base)] == (None, 1, True)


def test_round3_ops_partitioning_invariance(spark, sf_dir):
    """Results must be identical under different partitionings and row
    orders (the fixed-point quantization in bm25 and the integer/digest
    arithmetic elsewhere exist exactly for this)."""
    from anomaly_detection_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    for repart in (lambda d: d.repartition(3),
                   lambda d: d.repartition(17, "doc_id")):
        d2 = repart(docs)
        assert canon(bm25_topk(docs, ["hash", "merge"], k=10)) == canon(
            bm25_topk(d2, ["hash", "merge"], k=10)
        )
        assert canon(duplicated_spans(docs)) == canon(duplicated_spans(d2))
        assert canon(gopher_quality_rules(docs)) == canon(
            gopher_quality_rules(d2)
        )
