"""Local replica of the driver's duckdb-oracle comparison.

Runs a registered Spark query and its DuckDB oracle on the same
parquet tables and compares row count, schema width, and
order-insensitive values (sorted rows of stringified cells). Stricter
than the driver's hash (exact string equality per cell), so passing
here should imply passing there.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb

from anomaly_detection_spark.sources.tables import TABLES


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style stabilization: 12 significant digits
        return f"{v:.12g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def _rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(",".join(_canon(r[i]) for i in order) for r in rows)


def _view_path(p: str) -> str:
    """Spark-written datasets are DIRECTORIES of part files; DuckDB
    needs a glob for those.  Recursive so hive-partitioned layouts
    (day=.../part-*.parquet) resolve too, and loud if the glob would
    create a view over zero files (a silent empty oracle otherwise)."""
    if not os.path.isdir(p):
        return p
    import glob as _glob

    # The pattern below is handed UNESCAPED to DuckDB, so a directory
    # path containing glob metacharacters would pass the existence
    # check (escaped) yet glob differently inside DuckDB — reject
    # loudly instead of returning a silently-divergent view.
    if any(ch in p for ch in "*?["):
        raise ValueError(
            f"dataset path {p!r} contains glob metacharacters; "
            "DuckDB view patterns require a metacharacter-free path"
        )
    pattern = os.path.join(p, "**", "*.parquet")
    if not _glob.glob(os.path.join(_glob.escape(p), "**", "*.parquet"),
                      recursive=True):
        raise FileNotFoundError(f"no *.parquet part files under {p!r}")
    return pattern


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{_view_path(p)}'")
    res = con.sql(sql)
    return res.fetchall(), [d.lower() for d in res.columns]


_DUCK_TO_SPARK = {
    "TINYINT": "tinyint", "SMALLINT": "smallint", "INTEGER": "int",
    "BIGINT": "bigint", "HUGEINT": "decimal(38,0)", "FLOAT": "float",
    "DOUBLE": "double", "VARCHAR": "string", "BOOLEAN": "boolean",
    # DuckDB TIMESTAMP is timezone-naive → Spark TIMESTAMP_NTZ
    "DATE": "date", "TIMESTAMP": "timestamp_ntz", "TIMESTAMP_NS": "timestamp_ntz",
}


def _type_problems(spark_df, oracle_types, o_cols) -> list[str]:
    """Compare Spark column types against DuckDB result types (mapped)."""
    spark_types = {f.name.lower(): f.dataType.simpleString() for f in spark_df.schema}
    out = []
    for col, dt in zip(o_cols, oracle_types):
        expect = _DUCK_TO_SPARK.get(str(dt).upper())
        got = spark_types.get(col)
        if expect and got and expect != got:
            out.append(f"type[{col}]: spark={got} oracle={dt}->{expect}")
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems = []
    spark_rows = spark_df.collect()
    spark_cols = [c.lower() for c in spark_df.columns]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{_view_path(p)}'")
    res = con.sql(oracle_sql)
    o_cols = [c.lower() for c in res.columns]
    problems.extend(_type_problems(spark_df, res.types, o_cols))
    o_rows = res.fetchall()
    if len(spark_rows) != len(o_rows):
        problems.append(f"row count: spark={len(spark_rows)} oracle={len(o_rows)}")
    if sorted(spark_cols) != sorted(o_cols):
        problems.append(f"columns: spark={sorted(spark_cols)} oracle={sorted(o_cols)}")
        return problems
    s_set = _rowset([tuple(r) for r in spark_rows], spark_cols)
    o_set = _rowset(o_rows, o_cols)
    if s_set != o_set:
        diff_s = [r for r in s_set if r not in set(o_set)][:3]
        diff_o = [r for r in o_set if r not in set(s_set)][:3]
        problems.append(f"values differ; spark-only={diff_s} oracle-only={diff_o}")
    return problems
