"""End-to-end planted-duplicate test: the pipeline must recover planted
near-dup pairs/clusters (analog of the reference's planted-truth eval,
/root/reference/experiments.py:10-54) and leave background pages alone."""

import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.config import DedupConfig
from lsh_qd_spark.plans.pipeline import DedupPipeline
from lsh_qd_spark.synth import SynthConfig, generate_pages, truth_pairs


@pytest.fixture(scope="module")
def planted(spark):
    cfg = SynthConfig(n_docs=600, seed=42)
    pages = generate_pages(spark, cfg).cache()
    truth = truth_pairs(spark, cfg).cache()
    pages.count(), truth.count()
    return cfg, pages, truth


@pytest.fixture(scope="module")
def result(spark, planted):
    _, pages, _ = planted
    dcfg = DedupConfig(
        shingle_k=5,
        rows_per_band=2,
        num_bands=16,
        jaccard_threshold=0.55,
        max_bucket_size=50,
    )
    pipe = DedupPipeline(dcfg)
    out = pipe.run(pages)
    out["verified"] = out["verified"].cache()
    out["clusters"] = out["clusters"].cache()
    return out


def test_empty_docs_dropped(planted, result):
    cfg, pages, _ = planted
    sigs = result["signatures"]
    n_nonnull = sigs.where(F.col("sig").isNotNull()).count()
    n_nonempty = pages.where(F.regexp_replace("text", r"\s+", "") != "").count()
    # the 'w1 w2' short page still has one shingle → kept
    assert n_nonnull == n_nonempty
    # empty docs carry NULL sigs and emit ZERO bucket rows (the empty-set
    # skip now happens at banding, not via a kernel-doubling filter)
    empty_ids = [
        r["doc_id"] for r in sigs.where(F.col("sig").isNull()).collect()
    ]
    if empty_ids:
        assert (
            result["buckets"].where(F.col("doc_id").isin(empty_ids)).count()
            == 0
        )


def test_recall_on_planted_pairs(planted, result):
    """Dup-pair recall ≥ 0.99 on tiers above the verify threshold —
    the north-rule gate shape at pipeline level."""
    _, _, truth = planted
    relevant = truth.where(F.col("tier") >= 0.6)
    found = result["verified"].select("id_a", "id_b")
    n_truth = relevant.count()
    n_hit = relevant.join(found, ["id_a", "id_b"]).count()
    assert n_truth > 50
    assert n_hit / n_truth >= 0.99


def test_precision_no_background_pairs(planted, result):
    """Verified pairs must all be planted pairs (background is ~orthogonal)."""
    _, _, truth = planted
    found = result["verified"].select("id_a", "id_b")
    extra = found.join(truth, ["id_a", "id_b"], "left_anti").count()
    assert extra == 0


def test_verified_jaccard_near_tier(planted, result):
    _, _, truth = planted
    joined = result["verified"].join(truth, ["id_a", "id_b"])
    bad = joined.where(F.abs(F.col("jaccard") - F.col("tier")) > 0.12).count()
    assert bad == 0


def test_cluster_assignments_match_truth(spark, planted, result):
    """Recovered components = planted clusters for tiers ≥ threshold
    (cluster_id convention: min doc_id — same as synth truth)."""
    cfg, _, _ = planted
    from lsh_qd_spark.synth import truth_clusters

    tc = truth_clusters(spark, cfg).where(F.col("tier") >= 0.75)
    got = result["clusters"].withColumnRenamed("cluster_id", "got_cluster")
    joined = tc.join(got, "doc_id", "left")
    missing = joined.where(F.col("got_cluster").isNull()).count()
    mismatched = joined.where(
        F.col("got_cluster").isNotNull()
        & (F.col("got_cluster") != F.col("cluster_id"))
    ).count()
    assert missing == 0
    # tier clusters are separated ⇒ recovered min-id label == planted label
    assert mismatched == 0


def test_boilerplate_megacluster_connected(spark, planted, result):
    """The byte-identical mega-cluster must come back as ONE component even
    though its buckets exceed max_bucket_size (star-pair path)."""
    cfg, _, _ = planted
    bstart = cfg.n_background + cfg.n_edge
    boiler_ids = list(range(bstart, bstart + cfg.n_boiler))
    got = (
        result["clusters"]
        .where(F.col("doc_id").isin(boiler_ids))
        .select("cluster_id")
        .distinct()
        .collect()
    )
    assert len(got) == 1
    assert got[0]["cluster_id"] == bstart
