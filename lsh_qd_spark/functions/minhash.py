"""Batched MinHash signature kernel.

The reference computes, per document and per hash function,
``min over set of ((a*x + b) mod p)`` (float-divided by ``p``, which is
monotonic and therefore irrelevant to min/equality — SURVEY.md §7), with
coefficients drawn from global NumPy state in a fixed nested order
(``/root/reference/lsh-qd.py:37-38,168-186``). Here that becomes ONE
vectorized NumPy computation per Arrow batch inside a pandas UDF — the
distributed generalization of the reference's own batching rewrite
(``/root/reference/lsh.py:65-71``). No shuffle: signature computation is a
narrow map over the shingle column.

Two coefficient families:
- ``reference_coefficients``: byte-compatible draw order with the reference
  (including the ``b != a`` redraw loop, ``lsh-qd.py:173-176``) — parity
  tests only; safe because parity inputs are small feature indices.
- ``production_coefficients``: bounds chosen so ``a*h' + b`` fits int64 with
  64-bit shingle hashes reduced mod ``HASH_M`` (see config.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lsh_qd_spark.config import HASH_M, MERSENNE_P, REF_MAX_VAL, REF_P

# shingles per cache block in minhash_matrix: 64k int64 = 512 KiB — the
# ~7 int64 temporaries of one hash pass stay inside a typical 1-4 MiB L2
_BLOCK = 65536

def reference_coefficients(
    rows_per_band: int, num_bands: int, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) arrays in the reference's draw order: bands outer, rows inner
    (list-comprehension order at /root/reference/lsh-qd.py:37-38), each draw
    ``randint(0, 2^32-1)`` with ``b`` redrawn while equal to ``a``
    (lsh-qd.py:173-176). Seeds the global NumPy RNG exactly as the parity
    harness seeds it before building the reference object.
    """
    np.random.seed(seed)
    a_list, b_list = [], []
    for _ in range(num_bands):
        for _ in range(rows_per_band):
            # explicit int64: the default bound dtype is platform int_ —
            # 32-bit on Windows/numpy 1.x, where REF_MAX_VAL overflows it
            # and randint raises before drawing. int64 IS the Linux
            # default, so the draw stream (and reference parity) is
            # unchanged where the tests run.
            a = np.random.randint(0, REF_MAX_VAL, dtype=np.int64)
            b = a
            while b == a:
                b = np.random.randint(0, REF_MAX_VAL, dtype=np.int64)
            a_list.append(a)
            b_list.append(b)
    return np.asarray(a_list, dtype=np.int64), np.asarray(b_list, dtype=np.int64)


def production_coefficients(
    num_hashes: int, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """Independent affine family sized for 64-bit shingle hashes:
    a in [1, 2^31), b in [0, MERSENNE_P). Deterministic per seed."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, HASH_M, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_matrix(
    shingle_arrays: list,
    a: np.ndarray,
    b: np.ndarray,
    p: int,
    reduce_mod: int | None,
) -> np.ndarray:
    """(n_docs, n_hashes) int64 signature matrix.

    Empty/None documents get a full-``p`` sentinel row (callers drop them —
    mirror of the reference's empty-set skip, lsh-qd.py:196-197).
    """
    n_docs = len(shingle_arrays)
    num_hashes = len(a)
    out = np.full((n_docs, num_hashes), p, dtype=np.int64)
    if n_docs == 0:
        return out
    arrays = [
        np.asarray(x, dtype=np.int64)
        for x in shingle_arrays
        if x is not None and len(x) > 0
    ]
    nonempty = np.array(
        [x is not None and len(x) > 0 for x in shingle_arrays], dtype=bool
    )
    if not arrays:
        return out
    lens = np.fromiter((len(x) for x in arrays), dtype=np.int64, count=len(arrays))
    flat = np.concatenate(arrays)
    if reduce_mod is not None:
        flat = flat % reduce_mod
    ne_offsets = np.zeros(len(arrays), dtype=np.int64)
    np.cumsum(lens[:-1], out=ne_offsets[1:])
    ne_ends = ne_offsets + lens
    reduced = np.empty((len(arrays), num_hashes), dtype=np.int64)
    # Per-hash 1-D loop: ~30x faster than the broadcasted 2-D multiply
    # (contiguous temporaries, no (n_shingles x n_hashes) materialization).
    # shift-add reduction needs nonneg inputs bounded by the config.py
    # analysis — guaranteed only after the reduce_mod pre-reduction
    mersenne = p == MERSENNE_P and reduce_mod is not None
    # Cache blocking: the kernel is memory-bound — num_hashes full passes
    # over the flat array stream ~7 temporaries' worth of DRAM traffic per
    # pass. Grouping documents into ≤ _BLOCK-shingle segments (doc-aligned)
    # keeps the working set L2-resident across the inner hash loop; ~1.7-3x
    # measured on 10k-doc batches, output bit-identical.
    start_doc = 0
    n_ne = len(arrays)
    while start_doc < n_ne:
        end_doc = start_doc
        while (
            end_doc < n_ne
            and ne_ends[end_doc] - ne_offsets[start_doc] <= _BLOCK
        ):
            end_doc += 1
        if end_doc == start_doc:
            end_doc += 1  # single document larger than the block
        seg = flat[ne_offsets[start_doc] : ne_ends[end_doc - 1]]
        seg_offsets = (
            ne_offsets[start_doc:end_doc] - ne_offsets[start_doc]
        )
        for j in range(num_hashes):
            if mersenne:
                # y < 2^31 * 2^31 + 2^61 < 2^63 (config.py bounds), so the
                # int64 product is exact and y % (2^61-1) reduces to
                # (y>>61)+(y&p) with one conditional subtract — identical
                # value to `%`, ~10% faster (no 64-bit division).
                y = seg * a[j]
                y += b[j]
                col = (y >> 61) + (y & p)
                np.subtract(col, p, out=col, where=col >= p)
            else:
                col = (seg * a[j] + b[j]) % p
            reduced[start_doc:end_doc, j] = np.minimum.reduceat(
                col, seg_offsets
            )
        start_doc = end_doc
    out[nonempty] = reduced
    return out


def make_minhash_udf(a: np.ndarray, b: np.ndarray, p: int, reduce_mod: int | None):
    """Series→Series pandas UDF: shingles array<long> → sig array<long>.

    Coefficients ride in the closure (small: 2·num_hashes int64) — Spark
    ships them once per task, not per row. Empty documents yield NULL so a
    single ``sig IS NOT NULL`` filter reproduces the reference's drop.
    """
    a = np.ascontiguousarray(a, dtype=np.int64)
    b = np.ascontiguousarray(b, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash(sh: pd.Series) -> pd.Series:
        mat = minhash_matrix(list(sh), a, b, p, reduce_mod)
        empty = np.array(
            [x is None or len(x) == 0 for x in sh], dtype=bool
        )
        rows: list = [None if e else row.tolist() for e, row in zip(empty, mat)]
        return pd.Series(rows)

    # see fast_shingle.make_text_minhash_udf: no filters on this output in
    # hot paths (filter-pushdown substitution double-evaluates the kernel)
    return minhash


def production_minhash_udf(num_hashes: int, seed: int = 42):
    a, b = production_coefficients(num_hashes, seed)
    return make_minhash_udf(a, b, MERSENNE_P, HASH_M)


def reference_minhash_udf(rows_per_band: int, num_bands: int, seed: int = 42):
    """Parity-mode UDF: reference coefficient stream, reference modulus,
    NO pre-reduction of inputs (parity inputs are small feature indices, so
    a*x fits int64 exactly as in the reference)."""
    a, b = reference_coefficients(rows_per_band, num_bands, seed)
    return make_minhash_udf(a, b, REF_P, None)
