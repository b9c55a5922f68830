"""Persisted IVF index (vector_index.py): exact parity with the one-shot
ivf_topk dataflow, no-recluster append, and partition pruning to the
probed cells in the physical plan."""

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from lsh_qd_spark.operators.ann import ivf_topk
from lsh_qd_spark.vector_index import IVFIndex

SF_DIR = "/root/testdata/sf0.01"
PARAMS = dict(n_centroids=16, n_dims=64, seed=42)


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _topk_set(df):
    return {
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["cosine"], 9))
        for r in df.collect()
    }


def test_parity_with_one_shot_ivf(spark, tmp_path):
    emb = _emb(spark).cache()
    queries = emb.where(F.col("vec_id") < 10)
    idx = IVFIndex(str(tmp_path / "ivf"), **PARAMS)
    idx.build(emb)
    got = _topk_set(idx.topk(queries, k=5, nprobe=4))
    want = _topk_set(
        ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4, n_dims=64)
    )
    assert got == want and len(got) > 0


def test_append_no_recluster(spark, tmp_path):
    emb = _emb(spark).cache()
    queries = emb.where(F.col("vec_id") < 10)
    half_a = emb.where(F.col("vec_id") % 2 == 0)
    half_b = emb.where(F.col("vec_id") % 2 == 1)
    inc = IVFIndex(str(tmp_path / "inc"), **PARAMS)
    inc.build(half_a)
    inc.append(half_b)
    full = IVFIndex(str(tmp_path / "full"), **PARAMS)
    full.build(emb)
    assert _topk_set(inc.topk(queries, k=5)) == _topk_set(
        full.topk(queries, k=5)
    )


def test_partition_pruning_to_probed_cells(spark, tmp_path):
    emb = _emb(spark).cache()
    idx = IVFIndex(str(tmp_path / "ivf"), **PARAMS)
    idx.build(emb)
    # one query vector → nprobe=2 probed cells; the index scan must carry
    # a PartitionFilters entry on `cell` (directory-level pruning), not a
    # full-table scan
    one = emb.where(F.col("vec_id") == 0)
    plan_df = idx.topk(one, k=3, nprobe=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan
    # and the filter is a finite IN list, not a catch-all
    assert "cell#" in m.group(1) and ("IN" in m.group(1) or "in(" in m.group(1)), m.group(1)


def test_append_born_ivf_index_is_marked_and_appendable(spark, tmp_path):
    """append() on a fresh ref must stamp the compat marker (the first
    write skips require_marker since no data exists yet) — otherwise the
    SECOND append finds data with no marker and demands a rebuild."""
    import json
    import os

    emb = _emb(spark)
    ref = str(tmp_path / "born_by_append")
    idx = IVFIndex(ref, **PARAMS)
    idx.append(emb.where(F.col("vec_id") < 20))
    marker = os.path.join(ref, "_compat_meta.json")
    assert os.path.exists(marker), "append-born index carries no marker"
    with open(marker) as f:
        assert json.load(f)["config_hash"] == idx._key_hash()
    idx.append(emb.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 40)))
    assert idx.rows(spark).count() == 40
