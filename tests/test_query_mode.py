"""Query-mode API (the reference's AlphaLSH.query semantics, distributed)
+ alpha tiers + multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.config import DedupConfig
from lsh_qd_spark.multimodal import (
    deterministic_fake_decoder,
    extract_features,
    media_near_dup,
)
from lsh_qd_spark.operators.query import (
    alpha_tiers,
    query_neighbors,
    query_text_neighbors,
)
from lsh_qd_spark.plans.pipeline import DedupPipeline
from lsh_qd_spark.synth import SynthConfig, generate_pages


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_pages(spark, SynthConfig(n_docs=400, seed=3)).cache()


def test_query_finds_its_cluster(spark, corpus):
    """Querying with a near-dup cluster member must return its siblings."""
    cfg = SynthConfig(n_docs=400, seed=3)
    dstart = cfg.dup_start
    queries = corpus.where(F.col("doc_id") == dstart)  # cluster base member
    got = query_text_neighbors(
        corpus,
        queries,
        DedupConfig(rows_per_band=2, num_bands=16),
        jaccard_threshold=0.5,
    ).collect()
    found = {r["doc_id"] for r in got}
    assert {dstart + 1, dstart + 2} <= found
    for r in got:
        assert r["query_id"] == dstart
        assert r["jaccard"] >= 0.5


def test_query_excludes_self(spark, corpus):
    cfg = SynthConfig(n_docs=400, seed=3)
    dstart = cfg.dup_start
    queries = corpus.where(F.col("doc_id") == dstart)
    got = query_text_neighbors(corpus, queries, DedupConfig()).collect()
    assert all(r["doc_id"] != dstart for r in got)


def test_query_background_doc_finds_nothing(spark, corpus):
    queries = corpus.where(F.col("doc_id") == 5)  # background page
    got = query_text_neighbors(
        corpus, queries, DedupConfig(rows_per_band=2, num_bands=16), alpha=1
    )
    # background pages are ~orthogonal: any stray collision dies at verify
    verified = query_text_neighbors(
        corpus,
        queries,
        DedupConfig(rows_per_band=2, num_bands=16),
        jaccard_threshold=0.5,
    )
    assert verified.count() == 0


def test_alpha_tiers_nested(spark, corpus):
    pipe = DedupPipeline(DedupConfig(rows_per_band=2, num_bands=16))
    pairs = pipe.pairs(
        pipe.buckets(pipe.signatures_from_text(corpus))
    ).cache()
    tiers = alpha_tiers(pairs, [1, 4, 12])
    n1, n4, n12 = (tiers[a].count() for a in (1, 4, 12))
    assert n1 >= n4 >= n12
    assert n12 > 0  # exact-dup boiler cluster collides in all bands


def test_multimodal_feature_plumbing(spark):
    rows = [
        (1, "image", b"payload-A", "image/png", 10, 10, 0),
        (2, "image", b"payload-A", "image/png", 10, 10, 0),  # byte-dup of 1
        (3, "image", b"payload-B", "image/png", 10, 10, 0),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    feats = extract_features(media, deterministic_fake_decoder(32)).collect()
    by_id = {r["media_id"]: r["feature"] for r in feats}
    assert by_id[1] == by_id[2] != by_id[3]
    assert all(r["feat_dim"] == 32 for r in feats)


def test_multimodal_decode_stub_raises(spark):
    media = spark.createDataFrame(
        [(1, "image", b"x", "image/png", 1, 1, 0)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    with pytest.raises(NotImplementedError):
        extract_features(media, None)


def test_multimodal_near_dup_finds_byte_dups(spark):
    rows = [(i, "image", f"payload-{i % 4}".encode(), "image/png", 1, 1, 0) for i in range(12)]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    got = media_near_dup(
        media, deterministic_fake_decoder(32), cosine_threshold=0.999, dim=32
    ).collect()
    # 4 groups of 3 byte-identical payloads → 3 pairs each
    assert len(got) == 12
    for r in got:
        assert r["id_a"] % 4 == r["id_b"] % 4

def test_query_text_neighbors_honors_configured_cap(spark, corpus):
    """The candidate-id broadcast gate must read the CONFIGURED
    verify_broadcast_ids_cap, not the module constant: cap=0 forces the
    shuffled semi-join fallback, with identical results."""
    cfg = DedupConfig(rows_per_band=2, num_bands=16, jaccard_threshold=0.5)
    dstart = SynthConfig(n_docs=400, seed=3).dup_start
    queries = corpus.where(F.col("doc_id") == dstart)  # has planted siblings
    base = query_text_neighbors(
        corpus, queries, cfg, alpha=1, jaccard_threshold=0.5
    )
    capped_cfg = DedupConfig(
        rows_per_band=2,
        num_bands=16,
        jaccard_threshold=0.5,
        verify_broadcast_ids_cap=0,
    )
    capped = query_text_neighbors(
        corpus, queries, capped_cfg, alpha=1, jaccard_threshold=0.5
    )
    a = {tuple(r) for r in base.collect()}
    b = {tuple(r) for r in capped.collect()}
    assert a == b and len(a) > 0


def test_query_independent_id_spaces_keep_id_equal_matches(spark):
    """exclude_self=False: when the query table's id space is independent
    of the corpus' (decontam against an eval set numbered from 0), the
    default id-equality filter would silently drop true matches that
    happen to share an id."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(7, text), (8, "totally different words here now ok")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(7, text)], "doc_id long, text string")
    cfg = DedupConfig(rows_per_band=2, num_bands=16)
    dropped = query_text_neighbors(corpus, queries, cfg).collect()
    assert all(r["doc_id"] != 7 for r in dropped)
    kept = query_text_neighbors(
        corpus, queries, cfg, exclude_self=False
    ).collect()
    assert any(
        r["doc_id"] == 7 and r["query_id"] == 7 for r in kept
    ), "id-equal true match must survive with exclude_self=False"
