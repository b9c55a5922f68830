"""Persisted IVF-flat vector index — build-once / query-many ANN.

``operators/ann.ivf_topk`` recomputes every corpus row's cell assignment
per query run; this class materializes the assignment ONCE as a table
partitioned by ``cell``, so a query reads only its ``nprobe`` probed
cells' partitions — directory pruning on parquet, manifest pruning on
Iceberg. At 10^12 vectors a query touches ``nprobe / n_centroids`` of the
data at the METADATA level; nothing else is scanned.

Centroids are data-independent (seeded Gaussian, matching
``operators/ann.ivf_centroids``), so ``append()`` never re-clusters —
new vectors land in their cells and are immediately queryable, the same
no-rebuild insert contract as ``LSHIndex.append``.

The embedding rides INSIDE the index row: scoring reads it straight off
the pruned partitions — no second fetch join against the corpus table.
That trades storage (one embedding copy in the index) for the scan/join
the fetch-late path would need; for an index that exists to be queried
many times, that is the right trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lsh_qd_spark.operators.ann import (
    cosine_expr,
    ivf_centroids,
    make_ivf_cells_udf,
)


class IVFIndex:
    """Cell-partitioned persisted IVF-flat index over an embedding table."""

    def __init__(
        self,
        index_ref: str,
        n_centroids: int = 16,
        n_dims: int = 64,
        seed: int = 42,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ):
        self.index_ref = index_ref
        self.n_centroids = n_centroids
        self.n_dims = n_dims
        self.seed = seed
        self.id_col = id_col
        self.emb_col = emb_col
        self._cents = ivf_centroids(n_centroids, n_dims, seed)

    def _key_hash(self) -> str:
        """Compat marker payload: the fields that determine persisted cell
        assignments. A query with different centroids (n_centroids /
        n_dims / seed) would probe the WRONG cell partitions and return
        incomplete neighbors with no error — same silent-failure class the
        LSH index guards against."""
        import hashlib
        import json

        payload = json.dumps(
            {
                "n_centroids": self.n_centroids,
                "n_dims": self.n_dims,
                "seed": self.seed,
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def _assigned(self, vectors: DataFrame) -> DataFrame:
        assign_udf = make_ivf_cells_udf(self._cents, 1)
        return vectors.select(
            F.col(self.id_col).alias("vec_id"),
            F.col(self.emb_col).alias("embedding"),
            assign_udf(F.col(self.emb_col))[0].alias("cell"),
        )

    def build(self, vectors: DataFrame) -> None:
        from lsh_qd_spark.io import write_compat_meta, write_stage

        write_stage(self._assigned(vectors), self.index_ref, "overwrite", ["cell"])
        write_compat_meta(self.index_ref, self._key_hash())

    def append(self, vectors: DataFrame) -> None:
        """Insert without re-clustering (data-independent centroids)."""
        from lsh_qd_spark.io import (
            check_compat_meta,
            stage_exists,
            write_compat_meta,
            write_stage,
        )

        check_compat_meta(
            self.index_ref,
            self._key_hash(),
            what="IVF index",
            # write path: an existing unmarked index has an unknown
            # centroid seed — appending would mix cell assignments
            require_marker=stage_exists(vectors.sparkSession, self.index_ref),
        )
        write_stage(self._assigned(vectors), self.index_ref, "append", ["cell"])
        # stamp append-born indexes (first write on a fresh ref skips the
        # require_marker check above): without this, the next append —
        # and any strict reader — treats the index as unmarked and demands
        # a rebuild (same fix as LSHIndex.append)
        write_compat_meta(self.index_ref, self._key_hash())

    def rows(self, spark: SparkSession) -> DataFrame:
        from lsh_qd_spark.io import check_compat_meta, read_stage

        check_compat_meta(self.index_ref, self._key_hash(), what="IVF index")
        return read_stage(spark, self.index_ref)

    def topk(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 4,
        exclude_self: bool = True,
    ) -> DataFrame:
        """(query_id, rank, neighbor_id, cosine): top-k stored neighbors
        per query, scanning only the probed cells' partitions."""
        spark = queries.sparkSession
        probe_udf = make_ivf_cells_udf(self._cents, nprobe)
        cq = queries.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.emb_col).alias("q_emb"),
            F.explode(probe_udf(F.col(self.emb_col))).alias("cell"),
        )
        # Eager localCheckpoint: the cell-assignment kernel (an
        # O(n_queries × n_centroids) matmul + explode) is consumed TWICE —
        # the distinct-cells collect below and the broadcast join — and
        # would re-run per consumer without materialization (same pattern
        # as LSHIndex.query's probe buckets).
        cq = cq.localCheckpoint(eager=True)
        # BOUNDED driver collect (same loud-bound contract as LSHIndex's
        # shard collect): distinct probed cells ≤ n_centroids by
        # construction, regardless of query count. The isin pushes down to
        # partition pruning on the cell= directories / Iceberg manifests.
        probed = [
            r["cell"] for r in cq.select("cell").distinct().collect()
        ]
        index = self.rows(spark).where(F.col("cell").isin(probed))
        scored = (
            index.join(F.broadcast(cq), "cell")
            .where(
                ~F.col("vec_id").eqNullSafe(F.col("query_id"))
                if exclude_self
                else F.lit(True)
            )
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                cosine_expr(F.col("q_emb"), F.col("embedding")).alias(
                    "cosine"
                ),
            )
            # a vector can surface from several probed cells only if the
            # corpus row were duplicated; cell assignment is unique so no
            # dedup is needed before ranking
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cosine")
        )
