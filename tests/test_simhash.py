"""SimHash kernel: locality property, banding completeness, Hamming expr."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.functions.simhash import (
    N_CHUNKS,
    hamming_expr,
    make_simhash_udf,
    simhash_bits_matrix,
    simhash_chunks,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_identical_sets_identical_hash():
    s = np.arange(100, dtype=np.int64) * 7919
    out = simhash_bits_matrix([s, s.copy()])
    assert out[0] == out[1]


def test_similar_sets_small_hamming_distance():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 2**63, size=300).astype(np.int64)
    near = base.copy()
    near[:15] = rng.integers(0, 2**63, size=15)  # 5% feature churn
    far = rng.integers(0, 2**63, size=300).astype(np.int64)
    h = simhash_bits_matrix([base, near, far])
    d_near = _hamming(int(h[0]) & (2**64 - 1), int(h[1]) & (2**64 - 1))
    d_far = _hamming(int(h[0]) & (2**64 - 1), int(h[2]) & (2**64 - 1))
    assert d_near < 10
    assert d_far > 20


def test_empty_and_none():
    out = simhash_bits_matrix([None, [], [1, 2, 3]])
    assert out[0] == 0 and out[1] == 0


def test_batch_composition_invariance():
    rng = np.random.default_rng(9)
    docs = [rng.integers(0, 2**63, size=n).astype(np.int64) for n in (5, 80, 333)]
    batch = simhash_bits_matrix(docs)
    solo = [simhash_bits_matrix([d])[0] for d in docs]
    assert list(batch) == solo


def test_chunk_banding_complete_for_radius(spark):
    """Pigeonhole: Hamming ≤ N_CHUNKS-1 ⇒ at least one equal 16-bit chunk —
    so chunk-bucket joins are a COMPLETE candidate generator at radius 3."""
    rng = np.random.default_rng(11)
    base = int(rng.integers(0, 2**63))
    # flip exactly 3 bits in distinct chunks
    other = base ^ (1 << 2) ^ (1 << 20) ^ (1 << 40)
    df = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, simhash long"
    )
    chunks = simhash_chunks(df)
    joined = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["band_idx", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .count()
    )
    assert joined >= 1


def test_hamming_expr_matches_python(spark):
    rng = np.random.default_rng(3)
    rows = [
        (int(rng.integers(-(2**62), 2**62)), int(rng.integers(-(2**62), 2**62)))
        for _ in range(50)
    ]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(hamming_expr(F.col("a"), F.col("b")).alias("h")).collect()
    for (a, b), r in zip(rows, got):
        assert r["h"] == _hamming(a & (2**64 - 1), b & (2**64 - 1))


def test_simhash_udf_matches_kernel(spark):
    rng = np.random.default_rng(4)
    docs = [rng.integers(0, 2**62, size=40).tolist() for _ in range(10)]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, shingles array<long>"
    )
    udf = make_simhash_udf()
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", udf("shingles").alias("h")).collect()
    }
    expected = simhash_bits_matrix(docs)
    for i in range(10):
        assert got[i] == int(expected[i])
