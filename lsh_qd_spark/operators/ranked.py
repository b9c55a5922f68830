"""Ranked (multi-radius) neighbor retrieval — the end-to-end composition of
the tier machinery (SURVEY.md §2.9 C3/C4).

Distributed re-expression of the reference's two container families
(`/root/reference/lsh-qd.py:356-439`):

- ``ranked_neighbors_alpha``: ONE signature + ONE banding; tier i is an
  alpha cut of the shared (query, doc) collision counts —
  ``AlphaRankedNeighborContainer.query`` (lsh-qd.py:408-439), where the
  alphas come from the joint planner (params.plan_minhash_joint /
  plan_pstable_joint = get_k_l_alpha_* at lsh-qd.py:821-873). The
  collision-count aggregation runs ONCE; tiers are a JVM array filter —
  no per-tier shuffle.

- ``ranked_neighbors_tiered``: one flat signature, per-tier PREFIX banding
  (band.tiered_buckets) with a separately-tuned (k, l) per radius —
  ``RankedNeighborContainer.query`` (lsh-qd.py:356-390) without re-hashing:
  tier (k, l) reads hashes [0, k*l). One bucket-join per tier.

Both return (tier_idx, query_id, doc_id, n_bands) rows; tier sets are
nested for the alpha variant (larger tier ⊇ smaller) by construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsh_qd_spark.operators.band import tiered_buckets
from lsh_qd_spark.operators.query import query_neighbors


def ranked_neighbors_alpha(
    corpus_buckets: DataFrame,
    query_buckets: DataFrame,
    alphas: list[int],
    exclude_self: bool = True,
) -> DataFrame:
    """(tier_idx, query_id, doc_id, n_bands): doc qualifies for tier i iff
    it collides with the query in ≥ alphas[i] bands. ``alphas`` are ordered
    innermost ball first (largest alpha first), as the joint planner emits.
    """
    counts = query_neighbors(
        corpus_buckets, query_buckets, alpha=min(alphas), exclude_self=exclude_self
    )
    tier_arr = F.array(
        *[
            F.struct(F.lit(i).alias("tier_idx"), F.lit(int(a)).alias("alpha"))
            for i, a in enumerate(alphas)
        ]
    )
    return counts.select(
        F.explode(
            F.filter(tier_arr, lambda t: F.col("n_bands") >= t["alpha"])
        ).alias("t"),
        "query_id",
        "doc_id",
        "n_bands",
    ).select(F.col("t.tier_idx").alias("tier_idx"), "query_id", "doc_id", "n_bands")


def ranked_neighbors_tiered(
    corpus_sigs: DataFrame,
    query_sigs: DataFrame,
    tiers: list[tuple[int, int]],
    key_mode: str = "xxhash64",
    exclude_self: bool = True,
) -> DataFrame:
    """(tier_idx, query_id, doc_id, n_bands): tier i = alpha=1 collisions
    under its own (rows_per_band, num_bands) banding over a shared flat
    signature (len ≥ max k*l). ``n_bands`` counts collisions within that
    tier's banding."""
    if len(tiers) > 1:
        # each tier builds an independent banding plan over the same
        # signature DataFrame: without truncation one action re-executes
        # the (expensive, kernel-backed) signature lineage once per tier
        # per side. Eager localCheckpoint materializes signatures ONCE —
        # this is what makes tiered_buckets' "without re-hashing" true of
        # EXECUTION, not just of the plan definition.
        corpus_sigs = corpus_sigs.localCheckpoint(eager=True)
        query_sigs = query_sigs.localCheckpoint(eager=True)
    cb = tiered_buckets(corpus_sigs, tiers, key_mode)
    qb = tiered_buckets(query_sigs, tiers, key_mode)
    outs = [
        # exclude_self plumbed through (as in ranked_neighbors_alpha):
        # independent query/corpus id spaces need False or id-equal true
        # matches silently vanish from every tier
        query_neighbors(
            cb[kl], qb[kl], alpha=1, exclude_self=exclude_self
        ).withColumn("tier_idx", F.lit(i))
        for i, kl in enumerate(tiers)
    ]
    return reduce(lambda a, b: a.unionByName(b), outs).select(
        "tier_idx", "query_id", "doc_id", "n_bands"
    )
