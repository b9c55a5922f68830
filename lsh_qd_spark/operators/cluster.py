"""Duplicate-cluster resolution: iterative hash-min connected components.

Absent from the reference (SURVEY.md §2.9 C6) — a north-rule addition. The
verified pair list is an undirected graph; each component is a duplicate
cluster whose id is the component's minimum doc_id.

Hash-min label propagation: every vertex repeatedly adopts the minimum label
in its closed neighborhood; converges in O(component diameter) iterations
(near-dup clusters are shallow — typically ≤5). Each iteration is one join +
one aggregation; ``localCheckpoint`` truncates lineage so plans don't grow
exponentially (SURVEY.md §4 "what we must do manually").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 25,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(doc_id, cluster_id) with cluster_id = min doc_id of the component.

    ``vertices`` (single column ``doc_id``) optionally adds singleton
    vertices (clusters of size 1 — documents with no duplicate).
    """
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    verts = sym.select(F.col("src").alias("doc_id")).distinct()
    if vertices is not None:
        verts = verts.union(vertices.select("doc_id")).distinct()
    labels = verts.withColumn("label", F.col("doc_id")).localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.dst, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.where(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if n_changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("cluster_id"))
