"""SimHash — 64-bit similarity-preserving fingerprints.

Absent from the reference (SURVEY.md §2.2 H7); a north-rule addition. Two
variants share the bit-vote core:

- ``simhash_from_shingles``: text documents — each shingle hash votes its
  own 64 bits (Charikar's scheme with unweighted features). Near-identical
  shingle sets → small Hamming distance.
- ``simhash_from_embedding`` (see functions/pstable.py's sibling in
  operators/ann.py): random-hyperplane signs over a real vector — the
  cosine-LSH family.

Hamming banding: the 64-bit fingerprint splits into 4×16-bit chunks; docs
within Hamming distance 3 share at least one chunk (pigeonhole), so an
equi-join on (chunk_idx, chunk_value) is a complete candidate generator for
small radii — the SimHash analog of MinHash banding, and JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_BITS = 64
N_CHUNKS = 4
CHUNK_BITS = N_BITS // N_CHUNKS


# memory budget for the (n_shingles x 64) bit matrix per chunk (int32 cells)
_ELEM_BUDGET = 32_000_000


def simhash_bits_matrix(shingle_arrays: list) -> np.ndarray:
    """(n_docs,) int64 simhash; empty/None docs get 0 (callers filter).

    Fully vectorized: one flattened bit-unpack + ``np.add.reduceat`` per
    chunk of documents — the same batching shape as the MinHash kernel.
    """
    n = len(shingle_arrays)
    out = np.zeros(n, dtype=np.uint64)
    arrs = [
        np.asarray(x, dtype=np.int64)
        for x in shingle_arrays
        if x is not None and len(x) > 0
    ]
    if not arrs:
        return out.view(np.int64)
    nonempty = np.array(
        [x is not None and len(x) > 0 for x in shingle_arrays], dtype=bool
    )
    shifts = np.arange(N_BITS, dtype=np.uint64)
    lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=len(arrs))
    packed = np.empty(len(arrs), dtype=np.uint64)
    # chunk docs so the (total_shingles x 64) int32 matrix stays bounded
    start = 0
    while start < len(arrs):
        end, total = start, 0
        while end < len(arrs) and (total + lens[end]) * N_BITS <= _ELEM_BUDGET:
            total += lens[end]
            end += 1
        end = max(end, start + 1)
        chunk = arrs[start:end]
        clens = lens[start:end]
        flat = np.concatenate(chunk).view(np.uint64)
        # bit matrix in 8-bit slices: a single (shingles x 64) uint64
        # broadcast temporary is 8B x 64 per shingle — 4x the int32
        # matrix the budget accounts for (~512 MB transient at the cap,
        # x task threads). Slicing bounds the uint64 temporaries to
        # (shingles x 8) while writing straight into the budgeted int32.
        bits = np.empty((flat.shape[0], N_BITS), dtype=np.int32)
        for s0 in range(0, N_BITS, 8):
            sl = shifts[s0 : s0 + 8]
            bits[:, s0 : s0 + 8] = (flat[:, None] >> sl[None, :]) & np.uint64(
                1
            )
        offs = np.zeros(len(chunk), dtype=np.int64)
        np.cumsum(clens[:-1], out=offs[1:])
        ones = np.add.reduceat(bits, offs, axis=0)  # (docs, 64) count of 1s
        votes = 2 * ones - clens[:, None]  # ones minus zeros
        bitsel = (votes > 0).astype(np.uint64)
        packed[start:end] = (bitsel << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        start = end
    out[nonempty] = packed
    return out.view(np.int64)


def make_simhash_udf():
    @F.pandas_udf(T.LongType())
    def simhash(sh: pd.Series) -> pd.Series:
        vals = simhash_bits_matrix(list(sh))
        empty = [x is None or len(x) == 0 for x in sh]
        return pd.Series(
            [None if e else int(v) for e, v in zip(empty, vals)]
        )

    # see fast_shingle.make_text_minhash_udf: no filters on this output in
    # hot paths (filter-pushdown substitution double-evaluates the kernel)
    return simhash


def hamming_expr(a: Column, b: Column) -> Column:
    """Hamming distance of two 64-bit fingerprints — JVM bit_count."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_chunks(df: DataFrame, sim_col: str = "simhash") -> DataFrame:
    """(doc_id, band_idx, band_key): 16-bit chunk buckets for Hamming ≤ 3
    candidate generation (pigeonhole over 4 chunks)."""
    mask = (1 << CHUNK_BITS) - 1
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col(sim_col), i * CHUNK_BITS).bitwiseAND(
                F.lit(mask)
            )
            for i in range(N_CHUNKS)
        ]
    )
    return df.select(
        "doc_id", F.posexplode(chunks).alias("band_idx", "band_key")
    )
