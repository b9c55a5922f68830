"""Vector utilities, evaluation harness, multi-probe, tiered banding."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.evaluate import pair_metrics, query_metrics, summarize
from lsh_qd_spark.functions.multiprobe import (
    multiprobe_query_buckets,
    perturbation_sets,
    probe_keys_for_query,
)
from lsh_qd_spark.functions.pstable import make_pstable_udf, pstable_coefficients
from lsh_qd_spark.functions.vectors import (
    l2_norm,
    min_max_normalize,
    pairwise_distance_histogram,
)
from lsh_qd_spark.operators.band import band_buckets, tiered_buckets
from lsh_qd_spark.operators.query import query_neighbors


def test_l2_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "v array<double>")
    assert df.select(l2_norm(F.col("v")).alias("n")).first()["n"] == 5.0


def test_min_max_normalize(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 5.0]), (2, [10.0, 2.5])], "id long, embedding array<double>"
    )
    out = {
        r["id"]: r["embedding"]
        for r in min_max_normalize(df).collect()
    }
    assert out[1] == [0.0, 0.5]
    assert out[2] == [1.0, 0.25]


def test_pair_metrics(spark):
    pred = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "id_a long, id_b long")
    truth = spark.createDataFrame([(1, 2), (3, 4), (7, 8)], "id_a long, id_b long")
    m = pair_metrics(pred, truth)
    assert m.n_hit == 2 and m.recall == pytest.approx(2 / 3)
    assert m.precision == pytest.approx(2 / 3)


def test_query_metrics_and_summary(spark):
    truth = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 20)], "query_id long, doc_id long"
    )
    pred = spark.createDataFrame(
        [(0, 10), (0, 99), (1, 20), (1, 21)], "query_id long, doc_id long"
    )
    m = {r["query_id"]: r for r in query_metrics(pred, truth).collect()}
    assert m[0]["recall"] == pytest.approx(0.5)
    assert m[0]["precision"] == pytest.approx(0.5)
    assert m[1]["recall"] == 1.0
    s = summarize(query_metrics(pred, truth))
    assert s["n_queries"] == 2
    assert s["avg_recall"] == pytest.approx(0.75)


def test_histogram(spark):
    pairs = spark.createDataFrame(
        [(0.05,), (0.15,), (0.17,), (0.95,)], "dist double"
    )
    h = {r["bucket"]: r["n"] for r in pairwise_distance_histogram(pairs).collect()}
    assert h == {0: 1, 1: 2, 9: 1}


def test_perturbation_sets_ordered_and_unique():
    scores = np.array([0.3, 0.7, 0.1, 0.9, 0.5, 0.2])
    sets = perturbation_sets(scores, 10)
    totals = [sum(scores[c] for c in s) for s in sets]
    assert totals == sorted(totals)
    assert len({tuple(sorted(s)) for s in sets}) == len(sets)
    assert sets[0] == [2]  # the single cheapest candidate


def test_probe_keys_valid_and_near():
    f = np.array([1.2, 3.9, -0.4])
    keys = probe_keys_for_query(f, k=3, n_probes=6)
    base = keys[0]
    assert base.tolist() == [1, 3, -1]
    for key in keys[1:]:
        assert np.abs(key - base).max() <= 1  # probes are adjacent buckets
    # uniqueness
    assert len({tuple(k) for k in keys}) == len(keys)


def test_multiprobe_improves_recall(spark):
    """With few tables, multi-probe must recover neighbors single-probe
    misses — the memory/probes trade of /root/reference/notes_from_chris.txt:3-5."""
    rng = np.random.default_rng(7)
    n, d = 400, 16
    base = rng.standard_normal((n, d))
    base[200:210] = base[0:10] + 0.05 * rng.standard_normal((10, d))
    corpus = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).cache()
    k, l, r = 2, 2, 1.0
    a, b = pstable_coefficients(k * l, d, r, seed=5)
    udf = make_pstable_udf(a, b, r)
    sigs = corpus.select(
        F.col("vec_id").alias("doc_id"), udf(F.col("embedding")).alias("sig")
    )
    cb = band_buckets(sigs, k, l).cache()
    queries = corpus.where(F.col("vec_id") < 10)
    qb_single = band_buckets(
        queries.select(
            F.col("vec_id").alias("doc_id"), udf(F.col("embedding")).alias("sig")
        ),
        k,
        l,
    )
    single = query_neighbors(cb, qb_single)
    qb_multi = multiprobe_query_buckets(
        queries, a, b, r, k, l, n_probes=8, id_col="vec_id"
    )
    multi = query_neighbors(cb, qb_multi)
    truth = {(q, q + 200) for q in range(10)}
    hit_s = {
        (r["query_id"], r["doc_id"])
        for r in single.collect()
        if (r["query_id"], r["doc_id"]) in truth
    }
    hit_m = {
        (r["query_id"], r["doc_id"])
        for r in multi.collect()
        if (r["query_id"], r["doc_id"]) in truth
    }
    assert hit_s <= hit_m
    assert len(hit_m) >= max(len(hit_s), 8)  # multiprobe ≈ full recall here


def test_tiered_buckets_prefix_property(spark):
    from lsh_qd_spark.functions.minhash import production_minhash_udf

    df = spark.createDataFrame(
        [(1, list(range(100, 160))), (2, list(range(100, 160)))],
        "doc_id long, shingles array<long>",
    )
    udf = production_minhash_udf(24, seed=1)  # enough for (2,12) and (1,8)
    sigs = df.select("doc_id", udf("shingles").alias("sig")).cache()
    tiers = tiered_buckets(sigs, [(2, 12), (1, 8)])
    assert set(tiers) == {(2, 12), (1, 8)}
    # identical docs collide in every band of every tier
    for (k, l), b in tiers.items():
        n_shared = (
            b.groupBy("band_idx", "band_key")
            .count()
            .where(F.col("count") >= 2)
            .count()
        )
        assert n_shared == l
    # cross-tier keys don't collide even on identical slice values
    all_rows = tiers[(2, 12)].union(tiers[(1, 8)])
    assert (
        all_rows.groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("x"))
        .where(F.col("x") > 2)  # >2 would mean tiers sharing a bucket key
        .count()
        == 0
    )

def test_query_metrics_set_semantics_caps_recall(spark):
    """Duplicate (query, doc) rows in pred (e.g. an ungrouped per-band
    output) must not inflate n_hit past n_truth: the reference's metric
    is an intersection of SETS, so recall is capped at 1.0."""
    truth = spark.createDataFrame(
        [(0, 10)], "query_id long, doc_id long"
    )
    pred = spark.createDataFrame(
        [(0, 10), (0, 10), (0, 10)], "query_id long, doc_id long"
    )
    m = query_metrics(pred, truth).collect()[0]
    assert m["n_hit"] == 1 and m["n_pred"] == 1
    assert m["recall"] == 1.0 and m["precision"] == 1.0


def test_min_max_normalize_survives_nan_element(spark):
    """One NaN component must not poison the global (min, max): Spark's
    max orders NaN above every double, so an unfiltered scan would make
    span=NaN and rewrite EVERY element of EVERY vector to NaN silently."""
    df = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [5.0, float("nan")])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["embedding"]
        for r in min_max_normalize(df).collect()
    }
    assert got[1] == [0.0, 1.0]
    assert got[2][0] == 0.5
    import math

    assert math.isnan(got[2][1])  # scaled NaN stays NaN, not laundered
