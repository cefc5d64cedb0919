"""Connected components over near-duplicate pair edges.

Pair-level dedup (MinHash/SimHash/embedding candidates) leaves a graph
problem: near-dup relations are pairwise, but retention decisions need
*groups* ("keep one doc per component"). This is the iterative
min-label-propagation algorithm (the core of large-star/small-star,
Kiveris et al. 2014) expressed as DataFrame joins:

  label(v) ← min(label(v), min over neighbors u of label(u))

repeated until no label changes. Each iteration is one shuffle join of
the label table with the (undirected) edge list plus a groupBy-min —
all JVM-side; the driver only checks the convergence counter, never
the data. ``localCheckpoint`` truncates lineage so the plan doesn't
grow exponentially across iterations (the standard Spark iterative-
algorithm discipline).

Iterations needed = graph diameter ≤ O(log n) for typical near-dup
blobs; ``max_iter`` bounds the worst case. At 100 TB edge scale each
round is a pair of hash joins on node id — AQE handles the (skewed)
high-degree hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is an undirected pair list; isolated nodes absent from it
    are their own components (callers union them in if needed).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            e.join(labels, e.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
                (F.coalesce("nbr_component", "component")
                 < F.col("component")).alias("_changed"),
            )
        ).localCheckpoint()
        changed = new_labels.where("_changed").count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Canonical-representative selection: within each near-dup family
    (a connected component of ``pairs``), KEEP the highest-``score_col``
    document (ties → lower id) and emit one row per REMOVED document:

        (id_col, component, kept_<id_col>, score_col, kept_<score_col>)

    This is the retention step real curation pipelines run after
    pair-level dedup — "drop near-dups, keep the longest/highest-
    quality copy" — composed from :func:`connected_components` plus a
    broadcast-free argmax.  Docs in no component (no near-dup) are
    implicitly kept and never emitted.

    Scale shape: components is the iterative part (bounded by graph
    diameter); the argmax is a map-side-combinable struct-max per
    component, and the only fact-table touch is one slim join of
    (id, score) onto the component labels.
    """
    comps = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    scored = comps.join(
        docs.select(
            F.col(id_col).alias("node"), F.col(score_col).alias("_score")
        ),
        "node",
    )
    best = scored.groupBy("component").agg(
        F.max(
            F.struct(
                F.col("_score").alias("_s"),
                (-F.col("node")).alias("_ni"),
            )
        ).alias("_m")
    ).select(
        "component",
        (-F.col("_m._ni")).alias("_kept_id"),
        F.col("_m._s").alias("_kept_score"),
    )
    return (
        scored.join(best, "component")
        .where(F.col("node") != F.col("_kept_id"))
        .select(
            F.col("node").alias(id_col),
            "component",
            F.col("_kept_id").alias(f"kept_{id_col}"),
            F.col("_score").alias(score_col),
            F.col("_kept_score").alias(f"kept_{score_col}"),
        )
    )
