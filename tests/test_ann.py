"""ANN operators: brute-force exactness + LSH recall against it."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.operators.ann import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(21)
    n, d = 500, 32
    base = rng.standard_normal((n, d)).astype(np.float32)
    # plant near-neighbors: vectors 100..109 are tiny perturbations of 0..9
    base[100:110] = base[0:10] + 0.01 * rng.standard_normal((10, d)).astype(
        np.float32
    )
    rows = [(i, base[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_brute_force_matches_numpy(emb_df, spark):
    pdf = emb_df.toPandas().sort_values("vec_id")
    x = np.stack(pdf["embedding"].to_numpy())
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    np.fill_diagonal(sims, -np.inf)
    queries = emb_df.where(F.col("vec_id") < 5)
    got = brute_force_topk(emb_df, queries, k=3).toPandas()
    for q in range(5):
        expected = np.argsort(-sims[q], kind="stable")[:3]
        mine = got[got.query_id == q].sort_values("rank")["neighbor_id"].tolist()
        assert mine == expected.tolist()


def test_planted_neighbors_rank_one(emb_df):
    queries = emb_df.where(F.col("vec_id") < 10)
    got = brute_force_topk(emb_df, queries, k=1).toPandas()
    for q in range(10):
        nb = got[got.query_id == q]["neighbor_id"].iloc[0]
        assert nb == q + 100


def test_lsh_topk_recall_vs_brute_force(emb_df):
    """The approximate path must recover ≥80% of true top-3 neighbors at
    this table/bit budget (the reference's recall methodology,
    /root/reference/experiments.py:33-54, with brute force as truth)."""
    queries = emb_df.where(F.col("vec_id") < 20)
    truth = brute_force_topk(emb_df, queries, k=3).toPandas()
    approx = lsh_topk(
        emb_df, queries, k=3, n_tables=16, bits_per_table=4, n_dims=32
    ).toPandas()
    t = set(zip(truth.query_id, truth.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(t & a) / len(t)
    assert recall >= 0.8, f"LSH ANN recall {recall}"


def test_ivf_topk_recall_and_planted(emb_df):
    """IVF-flat: planted near-identical neighbors land in the same Voronoi
    cell (cosine ≈ 1 ⇒ same argmax centroid), so recall@1 on the planted
    pairs is exact; overall top-3 recall vs brute force stays useful at
    nprobe/centroids = 6/16."""
    from lsh_qd_spark.operators.ann import ivf_topk

    queries = emb_df.where(F.col("vec_id") < 10)
    got = ivf_topk(
        emb_df, queries, k=1, n_centroids=16, nprobe=1, n_dims=32
    ).toPandas()
    planted = sum(
        got[got.query_id == q]["neighbor_id"].iloc[0] == q + 100
        for q in range(10)
    )
    assert planted == 10

    queries20 = emb_df.where(F.col("vec_id") < 20)
    truth = brute_force_topk(emb_df, queries20, k=3).toPandas()
    approx = ivf_topk(
        emb_df, queries20, k=3, n_centroids=16, nprobe=6, n_dims=32
    ).toPandas()
    t = set(zip(truth.query_id, truth.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(t & a) / len(t)
    assert recall >= 0.7, f"IVF ANN recall {recall}"


def test_zero_norm_embedding_excluded_not_fatal(spark):
    """A zero-norm (dead) embedding must not abort the job: Spark 4 runs
    ANSI mode by default, so a raw `/` in cosine would raise
    DIVIDE_BY_ZERO the moment any all-zero vector reaches top-k.
    cosine_expr uses try_divide -> NULL, the NULL rows are excluded, and
    the DuckDB twin's `/` (NULL on zero denominator) stays in parity."""
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 0.0]),  # dead row
        ],
        "vec_id long, embedding array<float>",
    )
    out = brute_force_topk(df, df.where("vec_id = 0"), k=5).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 1 in ids and 2 not in ids
    assert all(r["cosine"] is not None for r in out)
    # the dead row as the QUERY side: every cosine is NULL -> no rows,
    # not a job abort
    assert brute_force_topk(df, df.where("vec_id = 2"), k=5).collect() == []


def test_null_embedding_row_not_fatal_in_lsh_and_ivf(spark):
    """A NULL (or empty) embedding row must not abort the bucketing UDFs:
    np.stack on a mixed batch raises a shape error that kills the task.
    NULL rows hash to NULL keys and posexplode drops them — the same
    null-sig convention as functions/pstable.py."""
    from lsh_qd_spark.operators.ann import ivf_topk, lsh_topk

    rows = [(i, [float(i), 1.0, 0.5, 0.2]) for i in range(8)]
    rows.append((97, None))
    rows.append((98, []))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where("vec_id = 0")
    got = lsh_topk(df, q, k=3, n_tables=4, bits_per_table=4, n_dims=4)
    ids = {r["neighbor_id"] for r in got.collect()}
    assert ids and 97 not in ids and 98 not in ids
    got2 = ivf_topk(df, q, k=3, n_centroids=4, nprobe=4, n_dims=4)
    ids2 = {r["neighbor_id"] for r in got2.collect()}
    assert ids2 and 97 not in ids2 and 98 not in ids2
