"""Differential tests: every registered query vs its DuckDB oracle
(the driver's primary gate, run locally at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from anomaly_detection_spark import queries as reg
from tests.oracle_check import compare

ORACLE_NAMES = sorted(reg.ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    df = reg.QUERIES[name](spark, sf_dir)
    problems = compare(df, reg.ORACLES[name], sf_dir)
    assert not problems, f"{name}: {problems}"


def test_all_queries_run(spark, sf_dir):
    for name, fn in reg.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
        assert len(df.columns) > 0, name


def test_output_schemas_are_driver_canonicalizable(spark, sf_dir):
    """The driver loads results into pandas and sorts each column; a
    top-level array/map/struct column raises ``TypeError: unhashable
    type`` there even when the values are correct (the r02
    array_functions_per_user red row).  Serialize nested outputs
    (array_join / to_json) instead of emitting them raw."""
    from pyspark.sql import types as T

    bad = (T.ArrayType, T.MapType, T.StructType)
    offenders = [
        f"{name}.{f.name}: {f.dataType.simpleString()}"
        for name, fn in reg.QUERIES.items()
        for f in fn(spark, sf_dir).schema.fields
        if isinstance(f.dataType, bad)
    ]
    assert not offenders, offenders
