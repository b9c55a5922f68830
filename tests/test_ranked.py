"""Ranked-neighbor retrieval end-to-end on the multi-annulus planted
fixture (round-1 verdict item 7): per-tier recall at each planted radius,
for both the alpha-cut container (C4) and the prefix-banded tier container
(C3), driven by the joint planner's parameters."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.functions.pstable import make_pstable_udf, pstable_coefficients
from lsh_qd_spark.operators.band import band_buckets
from lsh_qd_spark.operators.ranked import (
    ranked_neighbors_alpha,
    ranked_neighbors_tiered,
)
from lsh_qd_spark.params import _pstable_base_prob, plan_pstable_joint
from lsh_qd_spark.synth import (
    AnnulusConfig,
    generate_annulus_data,
    generate_annulus_queries,
)

CFG = AnnulusConfig(
    n_queries=50, n_data=500, n_dims=100, rs=(0.1, 0.2, 0.3),
    err_width=0.3, epsilon=0.3, seed=42,
)
POSI_RATE, FALSE_RATE = 0.99, 0.30


@pytest.fixture(scope="module")
def annulus(spark):
    queries = generate_annulus_queries(spark, CFG).cache()
    data = generate_annulus_data(spark, CFG).cache()
    truth = {
        (r["query_id"], r["vec_id"]): r["ring"]
        for r in data.select("query_id", "vec_id", "ring").collect()
    }
    return queries, data, truth


def _sigs(df, num_hashes, r):
    a, b = pstable_coefficients(num_hashes, CFG.n_dims, r, seed=42)
    udf = make_pstable_udf(a, b, r)
    return df.select(
        F.col("vec_id").alias("doc_id"), udf(F.col("embedding")).alias("sig")
    )


def _tier_recalls(rows, truth, n_tiers):
    """Per tier i: recall over planted points in rings <= i of their query,
    plus the count of retrieved background (ring -1) points."""
    got = [set() for _ in range(n_tiers)]
    for r in rows:
        got[r["tier_idx"]].add((r["query_id"], r["doc_id"]))
    recalls, fps = [], []
    for i in range(n_tiers):
        want = {k for k, ring in truth.items() if 0 <= ring <= i}
        recalls.append(len(got[i] & want) / len(want))
        # same-query background retrievals only: those are the pairs the
        # planner's false_rate bounds (cross-query pairs are farther still
        # but far more numerous; absolute counts there aren't bounded)
        fps.append(sum(1 for k in got[i] if truth.get(k) == -1))
    return recalls, fps


def test_ranked_alpha_end_to_end(annulus):
    queries, data, truth = annulus
    plan = plan_pstable_joint(
        list(CFG.rs), [r + CFG.err_width for r in CFG.rs],
        posi_rate=POSI_RATE, false_rate=FALSE_RATE, rs=(0.5,),
    )
    cs = _sigs(data, plan.k * plan.l, plan.r)
    qs = _sigs(queries, plan.k * plan.l, plan.r)
    cb = band_buckets(cs, plan.k, plan.l)
    qb = band_buckets(qs, plan.k, plan.l)
    out = ranked_neighbors_alpha(cb, qb, list(plan.alphas))
    rows = out.collect()
    recalls, fps = _tier_recalls(rows, truth, len(CFG.rs))
    for i, rec in enumerate(recalls):
        assert rec >= 0.95, f"tier {i}: recall {rec:.3f} (alphas={plan.alphas})"
    # tier sets are nested for alpha cuts
    got0 = {(r["query_id"], r["doc_id"]) for r in rows if r["tier_idx"] == 0}
    got2 = {(r["query_id"], r["doc_id"]) for r in rows if r["tier_idx"] == 2}
    assert got0 <= got2
    # background points sit >= err_width beyond the largest ball: the
    # planner bounds per-pair FP at false_rate; innermost tier ~0
    n_bg = sum(1 for ring in truth.values() if ring == -1)
    assert fps[0] <= 0.05 * n_bg
    assert fps[-1] <= (FALSE_RATE + 0.1) * n_bg


def test_ranked_tiered_end_to_end(annulus):
    queries, data, truth = annulus
    k, r = 5, 0.5
    # per-tier minimal l meeting recall at alpha=1 (vanilla container per
    # ball — RankedNeighborContainer semantics)
    ls = []
    for R in CFG.rs:
        p1 = _pstable_base_prob(R, r) ** k
        ls.append(math.ceil(math.log(1 - POSI_RATE) / math.log(1 - p1)))
    tiers = [(k, l) for l in ls]
    num_hashes = max(k * l for k, l in tiers)
    cs = _sigs(data, num_hashes, r)
    qs = _sigs(queries, num_hashes, r)
    out = ranked_neighbors_tiered(cs, qs, tiers)
    recalls, _ = _tier_recalls(out.collect(), truth, len(CFG.rs))
    for i, rec in enumerate(recalls):
        assert rec >= 0.95, f"tier {i}: recall {rec:.3f} (tiers={tiers})"
