"""p-stable (E2LSH) hashing for real-valued vectors.

Reference: ``pStableHash`` at ``/root/reference/lsh-qd.py:220-260`` (scalar,
``floor((x·a + b)/r)``) and its batched tensor form at
``/root/reference/lsh.py:65-105`` (one ``(l, k, d)`` matmul). Our pandas UDF
is the distributed version of that batched rewrite: per Arrow batch,
``np.floor((X @ A.T + B) / r)`` — Euclidean-distance LSH for the
``embeddings`` table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pstable_coefficients(
    num_hashes: int, n_dims: int, r: float, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """A ~ N(0,1)^(num_hashes, d); b ~ U[0, r)^(num_hashes,) — the draw of
    lsh-qd.py:238-250 done with an owned RNG (no global-state dependence)."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((num_hashes, n_dims))
    b = rng.uniform(0.0, r, size=num_hashes)
    return a, b


def make_pstable_udf(a: np.ndarray, b: np.ndarray, r: float):
    """embedding array<float> → array<long> of floor((x·a_j + b_j)/r)."""
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def pstable(emb: pd.Series) -> pd.Series:
        # NULL/empty embeddings hash to NULL (the signature null-guard
        # convention — band_buckets drops them); np.stack on a mixed batch
        # would otherwise kill the whole task with a shape error
        ok = [
            i
            for i, x in enumerate(emb)
            if x is not None and len(x) > 0
        ]
        rows: list = [None] * len(emb)
        if ok:
            x = np.stack(
                [np.asarray(emb.iloc[i], dtype=np.float64) for i in ok]
            )  # embeddings are fixed-dim
            buckets = np.floor((x @ a.T + b[None, :]) / r).astype(np.int64)
            for j, i in enumerate(ok):
                rows[i] = buckets[j].tolist()
        return pd.Series(rows)

    return pstable
