"""Dimension enrichment via broadcast joins (SURVEY.md §2.3 J1-J7).

Reference: two inner equi-joins of the flags result to the granularity
and index-definition dim tables (``anomaly_proj_query.sql:217-220``)
and the R engine's left merges (``func.R:141-142``). Dim tables are
tiny lookup tables → always broadcast: no shuffle of the fact side,
which is the only join strategy that survives a 100 TB fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
           projection: dict[str, str] | None = None,
           how: str = "left") -> DataFrame:
    """Join ``fact`` to broadcast ``dim`` on ``fact_key = dim_key``.

    ``projection`` maps dim column → output alias (the reference's
    post-join rename step, func.R:146-150, done via aliasing up front
    so there are no join-key collision columns to clean up).
    """
    if projection:
        dim = dim.select(
            F.col(dim_key).alias("__dim_key"),
            *[F.col(src).alias(dst) for src, dst in projection.items()],
        )
    else:
        dim = dim.withColumnRenamed(dim_key, "__dim_key")
    out = fact.join(F.broadcast(dim), fact[fact_key] == F.col("__dim_key"), how)
    return out.drop("__dim_key")
