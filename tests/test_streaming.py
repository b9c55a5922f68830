"""Incremental streaming dedup: batch-1 pages indexed, batch-2 near-dups
detected against the accumulated index."""

import os

import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.config import DedupConfig
from lsh_qd_spark.streaming.incremental import IncrementalDedup
from lsh_qd_spark.synth import SynthConfig, generate_pages


def test_incremental_dedup(spark, tmp_path):
    work = str(tmp_path / "work")
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    cfg = SynthConfig(n_docs=300, seed=17)
    pages = generate_pages(spark, cfg).cache()
    dstart = cfg.dup_start

    # batch 1: everything except the last member of each dup cluster
    first = pages.where(
        (F.col("doc_id") < dstart) | ((F.col("doc_id") - dstart) % 3 != 2)
    )
    # batch 2: the held-out cluster members (guaranteed near-dups of batch 1)
    second = pages.where(
        (F.col("doc_id") >= dstart) & ((F.col("doc_id") - dstart) % 3 == 2)
    )
    first.coalesce(1).write.parquet(src + "/f1")
    inc = IncrementalDedup(
        DedupConfig(rows_per_band=2, num_bands=16, alpha=1), work
    )

    q = inc.start(spark, src + "/*")
    q.awaitTermination(120)

    # index built, no hits yet (single batch)
    assert os.path.isdir(inc.index_dir)

    second.coalesce(1).write.parquet(src + "/f2")
    q2 = inc.start(spark, src + "/*")
    q2.awaitTermination(120)

    hits = inc.hits(spark)
    held_out = [r["doc_id"] for r in second.select("doc_id").collect()]
    hit_new_docs = {r["new_doc"] for r in hits.collect()}
    # every held-out near-dup member (tier >= 0.6 shingle overlap) should
    # collide with its cluster siblings already in the index
    missing = set(held_out) - hit_new_docs
    recall = 1 - len(missing) / len(held_out)
    assert recall >= 0.95, f"missing {sorted(missing)[:5]}"
    # hits reference genuine cluster siblings
    for r in hits.limit(20).collect():
        assert (r["new_doc"] - dstart) // 3 == (r["existing_doc"] - dstart) // 3
