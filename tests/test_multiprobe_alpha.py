"""AlphaMultiProbe composition (round-1 verdict item 9): multiprobe query
buckets driven through query_neighbors(alpha>=2), checked EXACTLY against a
serial NumPy twin implementing the reference's AlphaMultiProbeLSH retrieval
semantics (/root/reference/lsh.py:405-571: a table counts toward alpha if
ANY probe hits the item's bucket) — minus its perturbation-set closure bug
(see functions/multiprobe.py docstring). Recall sanity vs planted rings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.functions.multiprobe import (
    multiprobe_query_buckets,
    probe_keys_for_query,
)
from lsh_qd_spark.functions.pstable import make_pstable_udf, pstable_coefficients
from lsh_qd_spark.operators.band import band_buckets
from lsh_qd_spark.operators.query import query_neighbors
from lsh_qd_spark.synth import (
    AnnulusConfig,
    generate_annulus_data,
    generate_annulus_queries,
)

CFG = AnnulusConfig(n_queries=12, n_data=150, n_dims=50, rs=(0.1, 0.2, 0.3))
R, K, L, N_PROBES, ALPHA = 0.5, 3, 8, 2, 2


@pytest.fixture(scope="module")
def fixture(spark):
    queries = generate_annulus_queries(spark, CFG).cache()
    data = generate_annulus_data(spark, CFG).cache()
    return queries, data


def _np_retrieved(q_pdf, d_pdf, a, b):
    """Serial twin: per (query, doc), count bands where the doc's bucket is
    among the query's probe keys; keep counts >= ALPHA."""
    out = set()
    d_ids = d_pdf["vec_id"].to_numpy()
    # corpus keys: the exact expression of make_pstable_udf
    x = np.stack([np.asarray(v, dtype=np.float64) for v in d_pdf["embedding"]])
    d_keys = np.floor((x @ a.T + b[None, :]) / R).astype(np.int64)
    for _, qrow in q_pdf.iterrows():
        qx = np.asarray(qrow["embedding"], dtype=np.float64)
        f = (a @ qx + b) / R  # the exact expression of make_multiprobe_udf
        probes = []  # per band: set of key tuples
        for band in range(L):
            fb = f[band * K : (band + 1) * K]
            probes.append(
                {tuple(key.tolist()) for key in probe_keys_for_query(fb, K, N_PROBES)}
            )
        for di, did in enumerate(d_ids):
            n = sum(
                tuple(d_keys[di, band * K : (band + 1) * K].tolist())
                in probes[band]
                for band in range(L)
            )
            if n >= ALPHA:
                out.add((int(qrow["vec_id"]), int(did)))
    return out


def test_alpha_multiprobe_matches_serial_twin(fixture):
    queries, data = fixture
    a, b = pstable_coefficients(K * L, CFG.n_dims, R, seed=42)
    sig_udf = make_pstable_udf(a, b, R)
    corpus_sigs = data.select(
        F.col("vec_id").alias("doc_id"), sig_udf(F.col("embedding")).alias("sig")
    )
    cb = band_buckets(corpus_sigs, K, L, key_mode="str")
    qb = multiprobe_query_buckets(
        queries, a, b, R, K, L, N_PROBES, key_mode="str"
    )
    got = {
        (r["query_id"], r["doc_id"])
        for r in query_neighbors(cb, qb, alpha=ALPHA).collect()
    }
    want = _np_retrieved(queries.toPandas(), data.toPandas(), a, b)
    assert got == want


def test_alpha_multiprobe_superset_of_single_probe(fixture):
    queries, data = fixture
    a, b = pstable_coefficients(K * L, CFG.n_dims, R, seed=42)
    sig_udf = make_pstable_udf(a, b, R)

    def buckets(df):
        return band_buckets(
            df.select(
                F.col("vec_id").alias("doc_id"),
                sig_udf(F.col("embedding")).alias("sig"),
            ),
            K,
            L,
            key_mode="str",
        )

    single = {
        (r["query_id"], r["doc_id"])
        for r in query_neighbors(buckets(data), buckets(queries), alpha=ALPHA).collect()
    }
    multi = {
        (r["query_id"], r["doc_id"])
        for r in query_neighbors(
            buckets(data),
            multiprobe_query_buckets(queries, a, b, R, K, L, N_PROBES, key_mode="str"),
            alpha=ALPHA,
        ).collect()
    }
    assert single <= multi  # probes only add collision opportunities
    # probing must add recall on the innermost planted ring
    truth = {
        (r["query_id"], r["vec_id"])
        for r in data.where(F.col("ring") == 0).collect()
    }
    assert len(multi & truth) >= len(single & truth)
    assert len(multi & truth) / len(truth) >= 0.8


def test_zero_probes_means_base_bucket_only():
    """n_probes=0 is the degrade-to-single-probe setting: exactly the
    base key per band, no perturbed probes (the budget check used to run
    only after appending, emitting one extra probe)."""
    import numpy as np

    from lsh_qd_spark.functions.multiprobe import probe_keys_for_query

    keys = probe_keys_for_query(np.array([1.3, 2.7]), 2, 0)
    assert len(keys) == 1
    assert keys[0].tolist() == [1, 2]
