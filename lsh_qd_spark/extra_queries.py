"""Spark-only queries: operators with no reasonable ANSI-SQL twin.

These appear in ``__spark_entry__.queries()`` WITHOUT an ``oracle_sql()``
entry — the driver records rows-only checks for them (per the contract);
their correctness is covered by dedicated pytest oracles instead
(tests/test_simhash.py, test_ann.py, test_suffix.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsh_qd_spark.functions.pstable import make_pstable_udf, pstable_coefficients
from lsh_qd_spark.functions.simhash import (
    hamming_expr,
    make_simhash_udf,
    simhash_chunks,
)
from lsh_qd_spark.functions.text import normalize_text
from lsh_qd_spark.operators.ann import lsh_topk
from lsh_qd_spark.operators.band import band_buckets
from lsh_qd_spark.operators.pairs import candidate_pairs
from lsh_qd_spark.operators.suffix import exact_overlap
from lsh_qd_spark.oracle import ORACLE_CFG, _docs, _embeddings
from lsh_qd_spark.plans.pipeline import DedupPipeline

SIMHASH_MAX_HAMMING = 6
PSTABLE_R = 4.0
SUFFIX_MIN_OVERLAP = 40
ANN_N_QUERIES = 10
ANN_TOP_K = 5


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: fingerprint → 16-bit chunk buckets →
    candidate pairs → Hamming verify (the H7 path of SURVEY.md §2.2)."""
    docs = _docs(spark, sf_dir)
    pipe = DedupPipeline(ORACLE_CFG)
    shingled = pipe.shingle(docs)
    udf = make_simhash_udf()
    fp = (
        shingled.where(F.size("shingles") > 0)
        .select("doc_id", udf(F.col("shingles")).alias("simhash"))
        .where(F.col("simhash").isNotNull())
    )
    buckets = simhash_chunks(fp)
    cand = candidate_pairs(buckets, alpha=1, max_bucket_size=100_000)
    f = fp.select(F.col("doc_id").alias("_fid"), F.col("simhash").alias("_fh"))
    return (
        cand.join(f.withColumnRenamed("_fid", "id_a"), "id_a")
        .withColumnRenamed("_fh", "h_a")
        .join(f.withColumnRenamed("_fid", "id_b"), "id_b")
        .withColumnRenamed("_fh", "h_b")
        .select(
            "id_a", "id_b", hamming_expr(F.col("h_a"), F.col("h_b")).alias("hamming")
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


def q_pstable_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-stable (E2LSH) bucketing of the embeddings table: buckets with ≥2
    vectors (the H4/H5 path; join-ready candidate structure)."""
    emb = _embeddings(spark, sf_dir)
    a, b = pstable_coefficients(num_hashes=8, n_dims=64, r=PSTABLE_R, seed=42)
    udf = make_pstable_udf(a, b, PSTABLE_R)
    sigs = emb.select(
        F.col("vec_id").alias("doc_id"), udf(F.col("embedding")).alias("sig")
    )
    buckets = band_buckets(sigs, rows_per_band=2, num_bands=4, key_mode="str")
    return (
        buckets.groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("n_vecs"), F.min("doc_id").alias("min_vec_id"))
        .where(F.col("n_vecs") >= 2)
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-accelerated cosine top-k (approximate twin of ann_cosine_topk)."""
    emb = _embeddings(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < ANN_N_QUERIES)
    return lsh_topk(
        emb, queries, k=ANN_TOP_K, n_tables=12, bits_per_table=8, n_dims=64
    )


def q_suffix_exact_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-overlap lengths (suffix-array LCS) for verified near-dup pairs."""
    from lsh_qd_spark.oracle import q_verified_pairs

    docs = _docs(spark, sf_dir).select(
        "doc_id", normalize_text(F.col("text")).alias("text_norm")
    )
    pairs = q_verified_pairs(spark, sf_dir)
    return exact_overlap(pairs, docs, min_len=SUFFIX_MIN_OVERLAP)


SPARK_ONLY_QUERIES = {
    "simhash_near_dup": q_simhash_near_dup,
    "pstable_buckets": q_pstable_buckets,
    "ann_lsh_topk": q_ann_lsh_topk,
    "suffix_exact_overlap": q_suffix_exact_overlap,
}
