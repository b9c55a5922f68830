"""Multi-probe p-stable LSH (Lv et al., VLDB 2007) — query-side probing.

Trades tables for probes: besides its own bucket, each query also probes the
T most-promising neighboring buckets per table, ranked by boundary distance.

The reference implements this in ``/root/reference/lsh.py:254-403`` but its
``shift_perturbation_set`` / ``expand_perturbation_set`` close over the loop
variable instead of their argument (lsh.py:314-329 vs call sites 351-357),
so every generated set derives from ``{0}`` and the probing order deviates
from the paper. This implementation follows the paper's min-heap
shift/expand generation with per-coordinate validity — and is therefore
deliberately NOT bit-parity with the reference (SURVEY.md §2.6 T2); parity
claims cover the MinHash/LSH core only.

Spark shape (SURVEY.md §2.4 J3): a pandas UDF emits, per query, the base +
perturbed (band_idx, band_sig) rows; they join the corpus bucket table with
the same equi-join as the single-probe path.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lsh_qd_spark.operators.band import band_key_expr


def perturbation_sets(scores: np.ndarray, max_sets: int) -> list[list[int]]:
    """Up to ``max_sets`` valid perturbation sets (as indices into the
    score-sorted candidate list), in increasing total-score order — the
    min-heap shift/expand generation of the paper (T2 in SURVEY.md §2.6).

    ``scores[c]`` = cost of applying sorted-candidate ``c``; candidates
    ``2t`` and ``2t+1`` (pre-sort) perturb the same coordinate — validity is
    checked by the caller via the coordinate map.
    """
    order = np.argsort(scores, kind="stable")

    def total(positions: tuple[int, ...]) -> float:
        # recompute exactly (incremental add/subtract drifts in FP and can
        # flip the order of near-equal sums)
        return float(sum(scores[order[p]] for p in positions))

    out: list[list[int]] = []
    # heap entries: (total score, set of positions into `order`)
    heap: list[tuple[float, tuple[int, ...]]] = [(total((0,)), (0,))]
    seen = set()
    while heap and len(out) < max_sets:
        _, positions = heapq.heappop(heap)
        if positions in seen:
            continue
        seen.add(positions)
        out.append([int(order[p]) for p in positions])
        m = positions[-1]
        if m + 1 < len(order):
            shift = positions[:-1] + (m + 1,)
            expand = positions + (m + 1,)
            heapq.heappush(heap, (total(shift), shift))
            heapq.heappush(heap, (total(expand), expand))
    return out


def probe_keys_for_query(
    f: np.ndarray, k: int, n_probes: int
) -> list[np.ndarray]:
    """For one band: base bucket + up to ``n_probes`` perturbed buckets.

    ``f``: the k raw (un-floored) hash values of this band. Candidate
    2j = coordinate j, delta +1 (score 1-frac); 2j+1 = delta -1 (score
    frac) — the boundary-distance ordering (T1, lsh.py:284-296 semantics,
    implemented correctly).
    """
    base = np.floor(f).astype(np.int64)
    frac = f - base
    scores = np.empty(2 * k, dtype=np.float64)
    # SQUARED boundary distances (Lv et al. §4.4 score(A) = sum x_i(δ)²;
    # the reference squares too, lsh.py:300-302): a linear sum would rank
    # e.g. single {0.55} ahead of pair {0.2, 0.45} (0.55 < 0.65) where the
    # paper's expected-distance ranking puts the pair first
    # (0.2425 < 0.3025) — wrong probe order, lower per-probe recall
    scores[0::2] = (1.0 - frac) ** 2  # +1 direction
    scores[1::2] = frac**2  # -1 direction
    keys = [base]
    # generate extra sets (coordinate-validity filtered below)
    if n_probes <= 0:
        # degrade-to-single-probe: skip the heap generation entirely —
        # the loop below would build and discard ~8 perturbation sets
        # per band per query row in the hot UDF
        return keys
    for s in perturbation_sets(scores, max_sets=4 * n_probes + 8):
        # budget check BEFORE appending: checking after meant n_probes=0
        # (degrade-to-single-probe) still emitted one perturbed probe
        if len(keys) - 1 >= n_probes:
            break
        coords = [c // 2 for c in s]
        if len(set(coords)) != len(coords):
            continue  # both directions of one coordinate — invalid
        key = base.copy()
        for c in s:
            key[c // 2] += 1 if c % 2 == 0 else -1
        keys.append(key)
    return keys


def make_multiprobe_udf(
    a: np.ndarray, b: np.ndarray, r: float, k: int, l: int, n_probes: int
):
    """embedding → array<struct<band_idx int, band_sig array<long>>> of
    base + probe buckets for every band."""
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("band_idx", T.IntegerType()),
                T.StructField("band_sig", T.ArrayType(T.LongType())),
            ]
        )
    )

    @F.pandas_udf(schema)
    def multiprobe(emb: pd.Series) -> pd.Series:
        rows = []
        for v in emb:
            if v is None or len(v) == 0:
                # null/empty embedding: zero probe rows (the banding
                # null-guard convention), not a worker-killing np.stack
                # shape error
                rows.append([])
                continue
            x = np.asarray(v, dtype=np.float64)
            f = (a @ x + b) / r  # (l*k,) band-major raw hashes
            out = []
            for band in range(l):
                fb = f[band * k : (band + 1) * k]
                for key in probe_keys_for_query(fb, k, n_probes):
                    out.append((band, key.tolist()))
            rows.append(out)
        return pd.Series(rows)

    return multiprobe


def multiprobe_query_buckets(
    queries: DataFrame,
    a: np.ndarray,
    b: np.ndarray,
    r: float,
    k: int,
    l: int,
    n_probes: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    key_mode: str = "xxhash64",
) -> DataFrame:
    """(doc_id, band_idx, band_key) probe rows — drop-in query side for
    operators/query.py:query_neighbors against p-stable corpus buckets."""
    udf = make_multiprobe_udf(a, b, r, k, l, n_probes)
    exploded = queries.select(
        F.col(id_col).alias("doc_id"), F.explode(udf(F.col(emb_col))).alias("p")
    )
    return exploded.select(
        "doc_id",
        F.col("p.band_idx").alias("band_idx"),
        band_key_expr(F.col("p.band_sig"), key_mode).alias("band_key"),
    )
