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


def _driver_union_find(edges_pdf) -> "object":
    """Vectorized NumPy connected components for in-driver edge sets:
    hash-min label propagation with pointer jumping — O(E) NumPy work per
    pass, O(log n) passes. No Python-level per-edge loop.

    Id-type generic: ids stay in their native dtype (int64, string/object,
    …) — labels are positional indices into the sorted unique-id array, so
    "min index == min id" holds for any orderable dtype. For strings,
    NumPy's code-point order agrees with Spark's UTF-8 binary order (UTF-8
    preserves code-point order), so driver and distributed labels match."""
    import numpy as np
    import pandas as pd

    src = edges_pdf["src"].to_numpy()
    dst = edges_pdf["dst"].to_numpy()
    ids = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(ids, src)
    di = np.searchsorted(ids, dst)
    labels = np.arange(len(ids), dtype=np.int64)
    iterations = 0
    while True:
        prev = labels
        nxt = labels.copy()
        # adopt the smaller label across each edge (both directions)
        np.minimum.at(nxt, si, labels[di])
        np.minimum.at(nxt, di, labels[si])
        # pointer jumping: follow labels-of-labels (ids sorted ascending →
        # index order == id order, so min index == min id)
        nxt = np.minimum(nxt, nxt[nxt])
        iterations += 1
        if np.array_equal(nxt, prev):
            break
        labels = nxt
    return (
        pd.DataFrame({"doc_id": ids, "cluster_id": ids[labels]}),
        iterations,
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 25,
    id_a: str = "id_a",
    id_b: str = "id_b",
    driver_edge_threshold: int = 2_000_000,
    n_edges: int | None = None,
    assume_materialized: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """(doc_id, cluster_id) with cluster_id = min doc_id of the component.

    ``vertices`` (single column ``doc_id``) optionally adds singleton
    vertices (clusters of size 1 — documents with no duplicate).

    Small edge sets (≤ ``driver_edge_threshold``) short-circuit to a
    driver-side union-find: the distributed hash-min loop costs several
    shuffle rounds of fixed latency, which dominates when the graph fits in
    driver memory (the common case after Jaccard verification — edges are
    a tiny fraction of the corpus). Set the threshold to 0 to force the
    distributed path (tests do). Labels are identical either way: min
    doc_id per component.

    ``n_edges``: pass a pre-computed edge count to skip the sizing job
    entirely. When absent and the fast path is enabled, ``edges`` is
    persisted (MEMORY_AND_DISK) and counted FIRST so the sizing count and
    the subsequent collect (or distributed loop) read the materialized
    blocks — a bare call on an uncached verify plan must not execute the
    verify subplan twice. persist (not localCheckpoint) deliberately: it
    keeps lineage, so on a real cluster an executor loss just recomputes
    the lost blocks, and the blocks are explicitly unpersisted as soon as
    the edges have been consumed (collected to the driver, or folded into
    the loop's symmetrized checkpoint) — repeated bare calls (e.g. a
    streaming backend resolving clusters per batch) cannot accumulate
    storage memory. Callers whose edges are ALREADY persisted /
    checkpointed / storage-backed (the pipeline's stage store, the CLI's
    written-then-reread verified table) pass ``assume_materialized=True``
    to skip the redundant internal persist and keep the old cheap-count
    behavior.

    The iterative loop itself still uses ``localCheckpoint``: lineage
    TRUNCATION is the point there (iterated join plans grow without
    bound), accepting the documented trade-off that executor loss
    mid-loop fails the job (blocks are executor-local and the truncated
    lineage cannot recompute them) — acceptable for a minutes-scale
    batch stage; a long-running deployment that needs mid-loop fault
    tolerance should set ``spark.sparkContext.setCheckpointDir`` and swap
    in reliable ``checkpoint()`` calls.

    ``stats``: optional dict the call fills with run telemetry —
    ``path`` ("driver" | "distributed"), ``n_edges`` (when sized), and
    ``iterations`` (union-find passes or hash-min rounds). Observability
    for endurance/bench records; never affects results.
    """
    we_persisted = False
    if driver_edge_threshold > 0:
        if n_edges is None:
            if not assume_materialized:
                from pyspark import StorageLevel

                edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
                we_persisted = True
            n_edges = edges.count()
        if n_edges <= driver_edge_threshold:
            from pyspark.sql.types import StructField, StructType

            spark = edges.sparkSession
            id_type = edges.schema[id_a].dataType
            pdf = edges.select(
                F.col(id_a).alias("src"), F.col(id_b).alias("dst")
            ).toPandas()
            if we_persisted:
                edges.unpersist()
            # Only EDGES are collected — the threshold bounds them. The
            # vertex table is corpus-sized (include_singletons on a 500M-doc
            # corpus) and must never ride the driver path: singletons are
            # exactly the vertices absent from the edge labels, appended
            # distributively below with label = own id.
            if stats is not None:
                stats.update(path="driver", n_edges=n_edges, iterations=0)
            if len(pdf) == 0:
                lab = spark.createDataFrame(
                    [],
                    StructType(
                        [
                            StructField("doc_id", id_type),
                            StructField("cluster_id", id_type),
                        ]
                    ),
                )
            else:
                labels_pdf, uf_iters = _driver_union_find(pdf)
                if stats is not None:
                    stats["iterations"] = uf_iters
                # cast back to the INPUT id type: pandas round-trips int
                # ids to int64/long and the union below must not coerce
                lab = spark.createDataFrame(labels_pdf).select(
                    F.col("doc_id").cast(id_type),
                    F.col("cluster_id").cast(id_type),
                )
            if vertices is None:
                return lab
            singles = (
                vertices.select("doc_id")
                .join(F.broadcast(lab.select("doc_id")), "doc_id", "left_anti")
                .withColumn("cluster_id", F.col("doc_id").cast(id_type))
            )
            return lab.unionByName(singles)
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    # checkpoint sym BEFORE deriving verts: verts built on the raw plan
    # would re-execute the union+distinct (and the whole verified-edge
    # lineage) a second time when its own checkpoint materializes
    sym = sym.localCheckpoint(eager=True)
    if we_persisted:
        # the symmetrized checkpoint now holds everything the loop reads
        edges.unpersist()
    verts = sym.select(F.col("src").alias("doc_id")).distinct()
    if vertices is not None:
        verts = verts.union(vertices.select("doc_id")).distinct()
    labels = verts.withColumn("label", F.col("doc_id")).localCheckpoint(eager=True)

    if stats is not None:
        stats.update(path="distributed", n_edges=n_edges, iterations=0)
    converged = False
    for _it in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(
            nbr_min, labels.doc_id == nbr_min.dst, "left"
        ).select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
            (F.col("nbr_label") < F.col("label")).alias("_changed"),
        )
        # pointer jumping: adopt the label of one's label — turns the
        # one-hop-per-round min walk into O(log diameter) rounds (the
        # "short-cutting" of Shiloach-Vishkin style CC)
        parents = stepped.select(
            F.col("doc_id").alias("_pid"), F.col("label").alias("_plabel")
        )
        # lazy checkpoint: the convergence count below materializes it —
        # one job per iteration instead of two
        new_labels = (
            stepped.join(parents, stepped.label == parents._pid, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("_plabel"), F.col("label"))
                ).alias("label"),
                (
                    F.col("_changed") | (F.col("_plabel") < F.col("label"))
                ).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        n_changed = new_labels.where(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if stats is not None:
            stats["iterations"] = _it + 1
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))
