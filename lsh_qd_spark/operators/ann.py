"""Approximate nearest-neighbor search over embedding columns.

The distributed re-expression of the reference's query path
(``/root/reference/lsh-qd.py:286-297``, batched form ``lsh.py:107-190``):
instead of per-query dict probes, queries and corpus are bucketed by the
same LSH and equi-joined (SURVEY.md §2.4 J1).

Three strategies:
- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  side, score JVM-side with a sequential fold (oracle-comparable), window
  rank. The baseline and the verifier for the approximate paths.
- ``lsh_topk``: random-hyperplane SimHash buckets (cosine LSH) restrict the
  scored candidates to colliding buckets — the scale path: the join is an
  equi-join on (table_idx, band_key) rather than a cross join.
- ``ivf_topk``: inverted-file index — every corpus vector is assigned to its
  nearest of C deterministic unit centroids (one narrow cell id per row, no
  ×tables blow-up); queries probe their nprobe nearest cells and the join is
  an equi-join on the cell id. The partition-pruning analog of a vector DB's
  IVF-flat: at 100 TB the corpus would be written partitioned/bucketed BY
  cell so a probe scans nprobe/C of the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (bit-identical to the DuckDB twin)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(v: Column) -> Column:
    """Sequential-fold L2 norm (bit-identical to the DuckDB twin)."""
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_from_norms(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine from a dot product and PRE-COMPUTED per-side norms.

    Why this exists (optimization guide §1.2 "don't compute things you
    throw away"): the all-pairs scorers evaluate cosine once per PAIR, and
    inlining ``cosine_expr`` there re-folds each vector's norm once per
    pair — O(pairs) norm folds for O(rows) distinct vectors (measured:
    2/3 of embedding_near_dup's expression time). Projecting ``norm_expr``
    per ROW before the join and dividing here computes each norm exactly
    once. Bit-identical to ``cosine_expr``: same fold producing the same
    double per vector, same ``norm_a * norm_b`` operand order, same
    try_divide NULL-on-zero semantics (the DuckDB twins divide the same
    way).

    try_divide, not `/`: under Spark 4's default ANSI mode a zero-norm
    (dead) embedding would raise DIVIDE_BY_ZERO and abort the job; the
    downstream isNotNull filters rely on NULL here, and DuckDB's `/`
    (the oracle twin) also yields NULL on a zero denominator."""
    return F.try_divide(dot, norm_a * norm_b)


def cosine_expr(a: Column, b: Column) -> Column:
    """Sequential-fold cosine (bit-identical to the DuckDB oracle twin)."""
    return cosine_from_norms(dot_expr(a, b), norm_expr(a), norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, cosine): exact top-k by cosine."""
    # norms are projected per ROW before the pair join (guide §1.2): the
    # inline cosine_expr would re-fold each side's norm once per PAIR
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm_expr(F.col(emb_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("n_emb"),
        norm_expr(F.col(emb_col)).alias("_nn"),
    )
    joined = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        cosine_from_norms(
            dot_expr(F.col("q_emb"), F.col("n_emb")),
            F.col("_qn"),
            F.col("_nn"),
        ).alias("cosine"),
    )
    # a zero-norm embedding (dead row) divides by zero -> NULL cosine;
    # exclude it rather than emit (rank, neighbor_id, NULL) filler rows
    # when a candidate set is smaller than k. SQL twins filter identically.
    scored = scored.where(F.col("cosine").isNotNull())
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
    """embedding → array<long> of per-table sign-pattern bucket keys.

    Bucket-deciding dot products here (and in ``make_ivf_cells_udf``) use
    BLAS matmul, while the DuckDB twins fold strictly left-to-right: the
    two can disagree on sign/argmax only when a true dot sits within
    accumulated rounding (~1e-13 relative) of 0 / of a tie — measure-zero
    for continuous embeddings against seeded Gaussian planes, accepted in
    exchange for vectorized assignment. (The OUTPUT cosine column, which
    is hash-compared, uses the sequential fold on both sides.)"""
    planes = np.ascontiguousarray(planes, dtype=np.float64)
    n_tables = planes.shape[0] // bits_per_table
    weights = (1 << np.arange(bits_per_table, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def hyperplane(emb: pd.Series) -> pd.Series:
        # NULL/empty embeddings hash to NULL (the signature null-guard
        # convention, functions/pstable.py — posexplode then emits no
        # bucket rows); np.stack on a mixed batch would otherwise kill
        # the whole task with a shape error
        ok = [i for i, x in enumerate(emb) if x is not None and len(x) > 0]
        rows: list = [None] * len(emb)
        if ok:
            x = np.stack(
                [np.asarray(emb.iloc[i], dtype=np.float64) for i in ok]
            )
            signs = (x @ planes.T) > 0  # (n, tables*bits)
            keys = (
                signs.reshape(len(ok), n_tables, bits_per_table) * weights
            ).sum(axis=2).astype(np.int64)
            for j, i in enumerate(ok):
                rows[i] = keys[j].tolist()
        return pd.Series(rows)

    return hyperplane


def ivf_centroids(n_centroids: int, n_dims: int, seed: int = 42) -> np.ndarray:
    """(C, d) deterministic unit centroids (seeded Gaussian, row-normalized).

    Data-independent by design: both the Spark job and the DuckDB oracle
    twin embed the same literals, and the cell layout is stable across
    corpus growth (no re-clustering on append — the property a streaming
    ingest at crawl scale needs). For unit-norm data, argmax dot ==
    argmin L2, so these are true Voronoi cells on the sphere.
    """
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, n_dims))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def make_ivf_cells_udf(centroids: np.ndarray, nprobe: int):
    """embedding → array<long> of the nprobe nearest cell ids (by centroid
    dot product, ties broken by lower cell id — matches the SQL twin's
    ORDER BY d DESC, cell ASC)."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cells(emb: pd.Series) -> pd.Series:
        # same NULL/empty guard as make_hyperplane_udf / pstable
        ok = [i for i, x in enumerate(emb) if x is not None and len(x) > 0]
        rows: list = [None] * len(emb)
        if ok:
            d = np.stack(
                [np.asarray(emb.iloc[i], dtype=np.float64) for i in ok]
            ) @ cents.T  # (n, C)
            # stable argsort on -d: equal dots keep ascending cell order
            order = np.argsort(-d, axis=1, kind="stable")[:, :nprobe]
            order = order.astype(np.int64)
            for j, i in enumerate(ok):
                rows[i] = order[j].tolist()
        return pd.Series(rows)

    return cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_dims: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an inverted-file index (IVF-flat).

    Corpus rows get ONE cell id (argmax centroid dot — nprobe=1), queries
    get their nprobe nearest cells; candidates are the equi-join on cell.
    Embeddings are fetched after candidate dedup (fetch-late, as lsh_topk).
    """
    cents = ivf_centroids(n_centroids, n_dims, seed)
    assign_udf = make_ivf_cells_udf(cents, 1)
    probe_udf = make_ivf_cells_udf(cents, nprobe)

    cc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        assign_udf(F.col(emb_col))[0].alias("cell"),
    )
    cq = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_udf(F.col(emb_col))).alias("cell"),
    )
    cand = (
        cq.join(cc, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _score_and_rank(cand, corpus, queries, k, id_col, emb_col)


def _score_and_rank(
    cand: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    emb_col: str,
) -> DataFrame:
    """Shared fetch-late scorer for the approximate paths: attach
    embeddings (+ per-row precomputed norms — guide §1.2, norms must not
    re-fold once per candidate pair) to deduped candidates, sequential-fold
    cosine, deterministic window rank."""
    q_emb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm_expr(F.col(emb_col)).alias("_qn"),
    )
    c_emb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("n_emb"),
        norm_expr(F.col(emb_col)).alias("_nn"),
    )
    scored = (
        cand.join(F.broadcast(q_emb), "query_id")  # query side is small
        .join(c_emb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms(
                dot_expr(F.col("q_emb"), F.col("n_emb")),
                F.col("_qn"),
                F.col("_nn"),
            ).alias("cosine"),
        )
    )
    # a zero-norm embedding (dead row) divides by zero -> NULL cosine;
    # exclude it rather than emit (rank, neighbor_id, NULL) filler rows
    # when a candidate set is smaller than k. SQL twins filter identically.
    scored = scored.where(F.col("cosine").isNotNull())
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


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
    return _score_and_rank(cand, corpus, queries, k, id_col, emb_col)
