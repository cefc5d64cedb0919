"""Round-6 consolidation tests.

1. PPJoin's token dictionary now ranks through the distributed rank
   family — assert NO SinglePartition exchange survives anywhere in the
   returned physical plan (the r5 verdict's one `weak` entry).
2. A natural Heaps-law corpus (vocabulary grows with the corpus, Zipf
   frequencies, per-doc rare tail) through the full Xiao prefix stack,
   oracle-compared — the sf fixtures and the cyclic-vocab adversarial
   fixture never exercise the stack on a selective-prefix corpus.
3. Recursive part-file discovery for hive-partitioned directory layouts
   (events.parquet/day=.../part-*.parquet) in both the ns-timestamp
   schema sniff and the DuckDB oracle view glob, and loud failure on a
   part-less directory instead of a silently empty table.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anomaly_detection_spark import queries as reg
from tests.oracle_check import compare


def _write_docs(spark, d, docs):
    t = spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, n_chars long, source string",
    )
    pq.write_table(
        pa.Table.from_pandas(t.toPandas()), os.path.join(d, "documents.parquet")
    )


def _heaps_corpus(n_docs: int, seed: int = 42):
    """Zipf-weighted common words plus a per-doc rare tail: vocabulary
    grows ~ n^beta (Heaps' law), so prefix tokens are selective — the
    regime the Xiao stack is built for."""
    rng = random.Random(seed)
    common = [f"w{i:04d}" for i in range(400)]
    weights = [1.0 / (i + 1) for i in range(len(common))]  # Zipf
    docs = []
    for i in range(n_docs):
        words = rng.choices(common, weights=weights, k=25)
        # rare tail: 5 tokens drawn from a doc-indexed pool that grows
        # with the corpus — these are what make prefixes selective
        words += [f"r{(i * 5 + j) % (40 + n_docs * 2):05d}" for j in range(5)]
        rng.shuffle(words)
        docs.append((i, " ".join(words), "en", len(" ".join(words)), "syn"))
        if i % 9 == 0:
            # planted near-dup: drop the last two words (ties the output
            # above the 0.6 Jaccard gate so the test asserts real pairs)
            docs.append(
                (100000 + i, " ".join(words[:-2]), "en", 0, "syn")
            )
    return docs


def test_ppjoin_plan_has_no_single_partition_exchange(spark, sf_dir):
    df = reg.QUERIES["ppjoin_jaccard_pairs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # belt and braces: the logical->physical window translation too
    explained = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in explained


def test_ppjoin_xiao_stack_on_heaps_corpus(spark, monkeypatch):
    # force the prefix/length/positional stack (budget 0) on a corpus
    # whose vocabulary actually grows with the corpus
    monkeypatch.setattr(reg, "PPJOIN_BITSET_BUDGET", 0)
    docs = _heaps_corpus(120)
    d = tempfile.mkdtemp()
    _write_docs(spark, d, docs)
    out = reg.QUERIES["ppjoin_jaccard_pairs"](spark, d)
    rows = out.collect()
    planted = {r["doc_id"] for r in rows if r["doc_id"] >= 100000}
    assert len(planted) >= 10  # the planted near-dups surface
    problems = compare(out, reg.ORACLES["ppjoin_jaccard_pairs"], d)
    assert not problems, problems


def test_ppjoin_gate_agrees_with_bitset_on_heaps_corpus(spark):
    # same corpus through whatever path the natural gate picks — the
    # adaptive gate must not change answers, only plans
    docs = _heaps_corpus(120)
    d = tempfile.mkdtemp()
    _write_docs(spark, d, docs)
    problems = compare(
        reg.QUERIES["ppjoin_jaccard_pairs"](spark, d),
        reg.ORACLES["ppjoin_jaccard_pairs"], d,
    )
    assert not problems, problems


# ---------------------------------------------------------------------------
# New streaming driver rows (r5 verdict item 4)
# ---------------------------------------------------------------------------


def test_streaming_left_interval_join_matches_batch_law(spark, sf_dir):
    name = "streaming_left_interval_join_events"
    out = reg.QUERIES[name](spark, sf_dir)
    # zero-match errors must be present (the whole point of LEFT OUTER)
    assert out.where("n_purchases = 0").count() > 0
    assert not compare(out, reg.ORACLES[name], sf_dir)


def test_streaming_session_histogram_event_time_timers(spark, sf_dir):
    name = "streaming_session_histogram_events"
    out = reg.QUERIES[name](spark, sf_dir)
    assert not compare(out, reg.ORACLES[name], sf_dir)


# ---------------------------------------------------------------------------
# Hive-partitioned directory layouts
# ---------------------------------------------------------------------------


def _partitioned_events_ns(root: str) -> str:
    """events.parquet/day=YYYY-MM-DD/part-0.parquet with NANOS ts."""
    table_dir = os.path.join(root, "events.parquet")
    for day in ("2024-01-01", "2024-01-02"):
        part_dir = os.path.join(table_dir, f"day={day}")
        os.makedirs(part_dir)
        base = dt.datetime.fromisoformat(day)
        t = pa.table({
            "user_id": pa.array([1, 2], type=pa.int64()),
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array(
                [base, base + dt.timedelta(hours=1)], type=pa.timestamp("ns")
            ),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.5, 2.5], type=pa.float64()),
        })
        pq.write_table(t, os.path.join(part_dir, "part-0.parquet"))
    return table_dir


def test_nanos_sniff_recurses_into_partitioned_layout(tmp_path):
    from anomaly_detection_spark.sources.tables import _nanos_timestamp_cols

    table_dir = _partitioned_events_ns(str(tmp_path))
    assert _nanos_timestamp_cols(table_dir) == ("ts",)


def test_nanos_sniff_raises_on_partless_directory(tmp_path):
    from anomaly_detection_spark.sources.tables import _nanos_timestamp_cols

    empty = tmp_path / "events.parquet"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        _nanos_timestamp_cols(str(empty))


def test_load_table_reads_partitioned_nanos_layout(spark, tmp_path):
    from anomaly_detection_spark.sources.tables import load_table

    _partitioned_events_ns(str(tmp_path))
    df = load_table(spark, "events", str(tmp_path))
    rows = df.orderBy("event_id", "day").collect()
    assert len(rows) == 4
    assert df.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    assert rows[0]["ts"] == dt.datetime(2024, 1, 1, 0, 0, 0)


def test_oracle_view_path_recurses_and_raises(tmp_path):
    from tests.oracle_check import _view_path

    table_dir = _partitioned_events_ns(str(tmp_path))
    import duckdb

    con = duckdb.connect()
    n = con.sql(
        f"SELECT count(*) FROM '{_view_path(table_dir)}'"
    ).fetchone()[0]
    assert n == 4
    empty = tmp_path / "empty.parquet"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        _view_path(str(empty))
