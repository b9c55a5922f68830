"""Candidate-pair verification: exact Jaccard over shingle sets.

The reference *declares* a Jaccard-threshold filter but never implements it
(docstring at ``/root/reference/lsh-qd.py:96-101``; similarity is only
recomputed post-hoc in its eval at ``lsh-qd.py:753,789``). Here it is a
first-class stage per the north rule: join candidate pairs back to their
shingle arrays and keep pairs with Jaccard ≥ threshold.

All JVM-side: ``array_intersect``/``array_union`` on the (distinct) shingle
arrays — shingle arrays are deduplicated at creation so set semantics hold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def jaccard_expr(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element arrays (1 - the scipy
    jaccard *distance* the reference imports at lsh-qd.py:12)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def verify_pairs(
    pairs: DataFrame,
    shingle_df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
) -> DataFrame:
    """(id_a, id_b, n_bands, via_star, jaccard) for pairs meeting the
    threshold. Two equi-joins back to the shingle stage (the reference's
    point-store lookups, ``lsh-qd.py:789-790``, as real joins — sort-merge
    at scale, broadcast if the shingle side is small; left to AQE)."""
    sh = shingle_df.select(
        F.col(id_col).alias("_vid"), F.col(shingle_col).alias("_vsh")
    )
    out = (
        pairs.join(sh.withColumnRenamed("_vid", "id_a"), "id_a")
        .withColumnRenamed("_vsh", "_sh_a")
        .join(sh.withColumnRenamed("_vid", "id_b"), "id_b")
        .withColumnRenamed("_vsh", "_sh_b")
        .withColumn("jaccard", jaccard_expr(F.col("_sh_a"), F.col("_sh_b")))
        .where(F.col("jaccard") >= threshold)
        .drop("_sh_a", "_sh_b")
    )
    return out
