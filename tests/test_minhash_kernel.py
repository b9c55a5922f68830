"""MinHash kernel vs a NumPy oracle re-implementing the reference math
(/root/reference/lsh-qd.py:168-186) with the same coefficient draw order."""

import numpy as np
import pytest

from lsh_qd_spark.config import HASH_M, MERSENNE_P, REF_MAX_VAL, REF_P
from lsh_qd_spark.functions.minhash import (
    minhash_matrix,
    production_coefficients,
    reference_coefficients,
)


def naive_reference_signature(idxs, a, b):
    """Straight transcription of the reference per-function min
    (float-divided form, lsh-qd.py:179,184)."""
    return [min(((ai * x + bi) % REF_P) / REF_P for x in idxs) for ai, bi in zip(a, b)]


def test_reference_coefficients_draw_order():
    """Coefficients must match what the reference object draws from the
    same global seed (including the b!=a redraw)."""
    a, b = reference_coefficients(rows_per_band=3, num_bands=4, seed=42)
    np.random.seed(42)
    expected_a, expected_b = [], []
    for _ in range(12):
        ai = np.random.randint(0, REF_MAX_VAL)
        bi = ai
        while bi == ai:
            bi = np.random.randint(0, REF_MAX_VAL)
        expected_a.append(ai)
        expected_b.append(bi)
    assert a.tolist() == expected_a
    assert b.tolist() == expected_b
    assert np.all(a != b)


def test_minhash_matrix_matches_float_oracle():
    """Integer min equals float min (division by p is monotonic)."""
    rng = np.random.default_rng(7)
    a, b = reference_coefficients(2, 5, seed=1)
    docs = [rng.integers(0, 1000, size=n).tolist() for n in (1, 3, 40, 100)]
    mat = minhash_matrix(docs, a, b, REF_P, None)
    for d, doc in enumerate(docs):
        expected = naive_reference_signature(doc, a, b)
        got = mat[d] / REF_P
        assert np.allclose(got, expected)
        # argmin identity: integer signature mod p maps to the float one
        assert np.array_equal(mat[d], np.array(expected) * REF_P)


def test_minhash_matrix_empty_and_none_rows():
    a, b = production_coefficients(8, seed=3)
    mat = minhash_matrix([[], None, [5, 9]], a, b, MERSENNE_P, HASH_M)
    assert np.all(mat[0] == MERSENNE_P)
    assert np.all(mat[1] == MERSENNE_P)
    assert np.all(mat[2] < MERSENNE_P)


def test_minhash_matrix_deterministic_and_mixed_sizes():
    a, b = production_coefficients(32, seed=11)
    rng = np.random.default_rng(0)
    docs = [rng.integers(0, 2**62, size=n).tolist() for n in (1, 7, 50, 0, 200)]
    m1 = minhash_matrix(docs, a, b, MERSENNE_P, HASH_M)
    m2 = minhash_matrix(docs, a, b, MERSENNE_P, HASH_M)
    assert np.array_equal(m1, m2)
    # per-doc result independent of batch composition
    solo = minhash_matrix([docs[2]], a, b, MERSENNE_P, HASH_M)
    assert np.array_equal(m1[2], solo[0])
    assert np.all(m1[3] == MERSENNE_P)  # empty doc sentinel


def test_production_family_no_overflow_bounds():
    a, b = production_coefficients(64, seed=5)
    assert a.max() < HASH_M and a.min() >= 1
    assert b.max() < MERSENNE_P
    # worst case product fits int64
    assert int(a.max()) * (HASH_M - 1) + int(b.max()) < 2**63


def test_jaccard_minhash_estimate_property():
    """E[fraction of equal minhashes] ≈ Jaccard — the LSH property that the
    whole engine rests on (collision curve /root/reference/lsh-qd.py:453)."""
    rng = np.random.default_rng(123)
    base = rng.integers(0, 2**61, size=200, dtype=np.int64)
    # two sets sharing 150 of 200+50 distinct elements → J = 150/250 = 0.6
    set_a = base.tolist()
    set_b = base[:150].tolist() + rng.integers(0, 2**61, size=50).tolist()
    a, b = production_coefficients(512, seed=99)
    mat = minhash_matrix([set_a, set_b], a, b, MERSENNE_P, HASH_M)
    est = float(np.mean(mat[0] == mat[1]))
    true_j = len(set(set_a) & set(set_b)) / len(set(set_a) | set(set_b))
    assert est == pytest.approx(true_j, abs=0.08)
