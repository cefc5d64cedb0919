"""As-of (point-in-time) join — not in the reference (SURVEY.md §2.3
notes it as the idiomatic generalization of its "previous value"
windows); Spark has no native ASOF JOIN, so this composes one from a
union + ignore-nulls window last — the single-shuffle pattern.

For each left row, attaches the newest right row with
``right_ts <= left_ts`` within the same key (backward as-of, the
``pd.merge_asof`` / DuckDB ``ASOF JOIN`` default).

Scale: ONE hash shuffle of (left ∪ right) on the key columns and one
ordered window pass — no n² candidate expansion, no broadcast
requirement on either side. Skew follows key cardinality like every
other series-keyed operator here.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Backward as-of join.

    Returns ``left``'s columns plus, for each ``p`` in
    ``payload_cols``, the value from the latest right row at or before
    the left row's timestamp (NULL if none and ``how='left'``;
    ``how='inner'`` drops unmatched left rows). ``right_ts`` itself can
    be included in ``payload_cols`` to expose the matched time.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    left_cols = left.columns

    # ALL payload columns (plus an always-true match marker) travel in
    # ONE struct that is forward-filled atomically: per-column fills
    # would let a NULL payload field bleed through from an OLDER right
    # row, stitching together fields of different right rows.  The
    # marker — not a possibly-NULL payload field — gates how='inner'.
    payload_struct = F.struct(
        F.lit(True).alias("_matched"),
        *[F.col(p).alias(p) for p in payload_cols],
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_tag"),
        payload_struct.alias("_asof_payload"),
    )
    payload_type = r.schema["_asof_payload"].dataType
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_tag"),
        F.lit(None).cast(payload_type).alias("_asof_payload"),
    )
    # align columns: right side lacks left-only columns
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.select(*l.columns)

    u = l.unionByName(r)
    # right rows sort before a left row with the same timestamp so
    # right_ts == left_ts matches (ASOF's <= semantics)
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn(
        "_asof_payload", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out = u.where(F.col("_asof_tag") == 1).select(
        *left_cols,
        *[F.col("_asof_payload").getField(p).alias(f"asof_{p}")
          for p in payload_cols],
        F.col("_asof_payload").getField("_matched").alias("_asof_matched"),
    )
    if how == "inner":
        out = out.where(F.col("_asof_matched"))
    elif how != "left":
        raise ValueError(f"unsupported how: {how}")
    return out.drop("_asof_matched")


def as_of_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join via ``cogroup().applyInPandas`` — the
    alternative physical strategy to :func:`as_of_join`'s union+window
    plan.

    Both sides shuffle ONCE on the keys; each co-group is merged with
    ``pd.merge_asof`` (sorted two-pointer, O(n+m) per key).  Choose
    this form when per-key payload width makes the union+window's
    struct forward-fill memory-heavy, or when the merge needs pandas
    semantics (tolerance windows, nearest-direction) that the window
    rewrite doesn't express; the built-in expression form wins when a
    Python stage is unwanted in the plan.  Output matches
    :func:`as_of_join` with ``how='left'``.
    """
    import pandas as pd

    keys = list(keys)
    payload_cols = list(payload_cols)
    out_fields = left.schema.fields + [
        right.schema[p] for p in payload_cols
    ]
    from pyspark.sql.types import StructType
    schema = StructType(out_fields)
    lcols = left.columns

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf):
            return pd.DataFrame(columns=lcols + payload_cols)
        lp = lpdf.sort_values(left_ts, kind="mergesort")
        if not len(rpdf):
            out = lp.copy()
            for p in payload_cols:
                out[p] = None
            return out[lcols + payload_cols]
        # prefix right-side columns so names can never collide with
        # left columns (incl. right_ts appearing in payload_cols)
        rcols = [right_ts] + [p for p in payload_cols if p != right_ts]
        rp = (
            rpdf[rcols]
            .sort_values(right_ts, kind="mergesort")
            .rename(columns={c: f"_p_{c}" for c in rcols})
        )
        merged = pd.merge_asof(
            lp, rp, left_on=left_ts, right_on=f"_p_{right_ts}"
        )
        out = merged[lcols].copy()
        for p in payload_cols:
            out[p] = merged[f"_p_{p}"]
        return out

    return (
        left.groupby(*keys)
        .cogroup(right.groupby(*keys))
        .applyInPandas(merge, schema=schema)
    )
