"""Approximate nearest-neighbor search over embedding columns.

The distributed re-expression of the reference's query path
(``/root/reference/lsh-qd.py:286-297``, batched form ``lsh.py:107-190``):
instead of per-query dict probes, queries and corpus are bucketed by the
same LSH and equi-joined (SURVEY.md §2.4 J1).

Two strategies:
- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  side, score JVM-side with a sequential fold (oracle-comparable), window
  rank. The baseline and the verifier for the LSH path.
- ``lsh_topk``: random-hyperplane SimHash buckets (cosine LSH) restrict the
  scored candidates to colliding buckets — the scale path: the join is an
  equi-join on (table_idx, band_key) rather than a cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_expr(a: Column, b: Column) -> Column:
    """Sequential-fold cosine (bit-identical to the DuckDB oracle twin)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(v: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    return dot / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, cosine): exact top-k by cosine."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    joined = corpus.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_expr(F.col("q_emb"), F.col(emb_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def hyperplane_coefficients(
    n_tables: int, bits_per_table: int, n_dims: int, seed: int = 42
) -> np.ndarray:
    """(n_tables * bits_per_table, d) Gaussian hyperplanes — cosine LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables * bits_per_table, n_dims))


def make_hyperplane_udf(planes: np.ndarray, bits_per_table: int):
    """embedding → array<long> of per-table sign-pattern bucket keys."""
    planes = np.ascontiguousarray(planes, dtype=np.float64)
    n_tables = planes.shape[0] // bits_per_table
    weights = (1 << np.arange(bits_per_table, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def hyperplane(emb: pd.Series) -> pd.Series:
        mats = [np.asarray(x, dtype=np.float64) for x in emb]
        if not mats:
            return pd.Series([], dtype=object)
        x = np.stack(mats)
        signs = (x @ planes.T) > 0  # (n, tables*bits)
        keys = (
            signs.reshape(len(mats), n_tables, bits_per_table) * weights
        ).sum(axis=2)
        return pd.Series([row.tolist() for row in keys.astype(np.int64)])

    return hyperplane


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_tables: int = 8,
    bits_per_table: int = 12,
    n_dims: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only bucket-colliding candidates.

    Both sides are exploded to (table_idx, band_key) and equi-joined —
    at scale this is a shuffle/broadcast hash join on narrow keys instead
    of an all-pairs cross join; recall is tuned by (n_tables, bits).
    """
    udf = make_hyperplane_udf(
        hyperplane_coefficients(n_tables, bits_per_table, n_dims, seed),
        bits_per_table,
    )

    # Explode IDS + KEYS ONLY: embedding arrays must not ride through the
    # ×n_tables posexplode/shuffle (round-1 verdict: n_tables copies of
    # every vector through the join). Embeddings are re-attached AFTER the
    # candidate dedup — the same fetch-late shape as verify_pairs for text.
    def bucketed(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.posexplode(udf(F.col(emb_col))).alias("table_idx", "band_key"),
        )

    cq = bucketed(queries, "query_id")
    cc = bucketed(corpus, "neighbor_id")
    cand = (
        cq.join(cc, ["table_idx", "band_key"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q_emb = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    c_emb = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("n_emb")
    )
    scored = (
        cand.join(F.broadcast(q_emb), "query_id")  # query side is small
        .join(c_emb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("q_emb"), F.col("n_emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
