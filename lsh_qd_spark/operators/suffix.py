"""Suffix-array exact-overlap detection between candidate pairs.

Absent from the reference (SURVEY.md §2.2 H8); a north-rule addition for
exact-overlap detection (shared boilerplate, quoted passages, mirrored
articles). For each candidate pair, the longest common substring of the two
normalized texts is computed from the suffix array + LCP of the joined
string ``a + SEP + b``: the LCS is the maximum LCP between adjacent suffixes
that originate in different documents.

Spark shape: the pair table is joined back to the two texts (the same joins
as Jaccard verify) and the per-pair computation runs in an Arrow-batched
``mapInPandas`` — per-pair work is a genuinely sequential string algorithm,
so Python is the right layer (SURVEY.md §2.10), but batching amortizes
transfer. The kernel is NumPy rank-doubling (O(n log² n)) + Kasai LCP.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array by rank doubling (argsort-based), O(n log^2 n)."""
    n = len(codes)
    rank = np.asarray(codes, dtype=np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        sa = order
        tmp[sa[0]] = 0
        prev = sa[:-1]
        cur = sa[1:]
        newgrp = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        tmp[cur] = np.cumsum(newgrp)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def lcp_array(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai's algorithm: lcp[i] = LCP(suffix sa[i], suffix sa[i-1])."""
    n = len(codes)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: str, b: str) -> int:
    """Length of the longest exact substring shared by a and b."""
    if not a or not b:
        return 0
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    # shift codepoints by +2 so the separator (1) is unique and minimal
    codes = np.concatenate([ca + 2, [1], cb + 2])
    na = len(ca)
    sa = suffix_array(codes)
    lcp = lcp_array(codes, sa)
    side = sa < na  # suffix starts in a (the separator belongs to neither)
    best = 0
    for i in range(1, len(sa)):
        if side[i] != side[i - 1] and sa[i] != na and sa[i - 1] != na:
            if lcp[i] > best:
                best = int(lcp[i])
    return best


def exact_overlap(
    pairs: DataFrame,
    docs: DataFrame,
    min_len: int,
    id_col: str = "doc_id",
    text_col: str = "text_norm",
) -> DataFrame:
    """(id_a, id_b, overlap_len) for pairs sharing an exact substring of at
    least ``min_len`` characters (in normalized-text space)."""
    t = docs.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_txt"))
    joined = (
        pairs.select("id_a", "id_b")
        .join(t.withColumnRenamed("_tid", "id_a"), "id_a")
        .withColumnRenamed("_txt", "text_a")
        .join(t.withColumnRenamed("_tid", "id_b"), "id_b")
        .withColumnRenamed("_txt", "text_b")
    )

    def compute(batches):
        for pdf in batches:
            out = pdf[["id_a", "id_b"]].copy()
            out["overlap_len"] = [
                longest_common_substring(a or "", b or "")
                for a, b in zip(pdf["text_a"], pdf["text_b"])
            ]
            yield out

    result = joined.mapInPandas(
        compute, schema="id_a long, id_b long, overlap_len long"
    )
    return result.where(F.col("overlap_len") >= min_len)
