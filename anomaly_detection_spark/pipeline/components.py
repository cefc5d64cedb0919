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
