"""verify_pairs_text fetch-mode parity: the three candidate-text fetch
strategies (broadcast_ids / shuffle / auto with its row+bytes gates) are
execution choices only — identical verified pairs, identical jaccard."""

import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.config import DedupConfig
from lsh_qd_spark.operators.verify import verify_pairs_text
from lsh_qd_spark.plans.pipeline import DedupPipeline
from lsh_qd_spark.synth import SynthConfig, generate_pages

CFG = DedupConfig(rows_per_band=2, num_bands=16, jaccard_threshold=0.55)


@pytest.fixture(scope="module")
def fixture(spark):
    pages = generate_pages(spark, SynthConfig(n_docs=300, seed=11)).cache()
    pipe = DedupPipeline(CFG)
    cand = pipe.pairs(pipe.buckets(pipe.signatures_from_text(pages))).persist()
    assert cand.count() > 0
    return pages, cand


def _rows(df):
    return sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in df.collect()
    )


def test_fetch_modes_agree(spark, fixture):
    pages, cand = fixture
    out = {}
    for mode in ("broadcast_ids", "shuffle"):
        out[mode] = _rows(
            verify_pairs_text(
                cand, pages, CFG.jaccard_threshold, CFG.shingle_k, fetch=mode
            )
        )
    assert out["broadcast_ids"] == out["shuffle"]
    assert len(out["shuffle"]) > 0


def test_auto_bytes_cap_falls_back_to_shuffle(spark, fixture):
    """auto must refuse the broadcast when the ESTIMATED candidate-text
    bytes exceed the cap, even though the row count is tiny — and the
    shuffle fallback returns the same rows."""
    pages, cand = fixture
    ref = _rows(
        verify_pairs_text(
            cand, pages, CFG.jaccard_threshold, CFG.shingle_k,
            fetch="broadcast_ids",
        )
    )
    tiny_bytes = _rows(
        verify_pairs_text(
            cand, pages, CFG.jaccard_threshold, CFG.shingle_k,
            fetch="auto", broadcast_bytes_cap=1,
        )
    )
    tiny_rows = _rows(
        verify_pairs_text(
            cand, pages, CFG.jaccard_threshold, CFG.shingle_k,
            fetch="auto", broadcast_ids_cap=0,
        )
    )
    assert tiny_bytes == ref
    assert tiny_rows == ref


def test_unknown_fetch_mode_rejected(spark, fixture):
    pages, cand = fixture
    with pytest.raises(ValueError, match="unknown fetch mode"):
        verify_pairs_text(
            cand, pages, CFG.jaccard_threshold, CFG.shingle_k, fetch="bogus"
        )


def test_auto_fetch_estimates_candidate_bytes_not_corpus_head(spark):
    """The auto byte gate must size the broadcast from the CANDIDATES'
    texts: a corpus whose non-candidate rows are short (or whose scan head
    is short) must not green-light broadcasting long candidates, and short
    candidates must still broadcast out of a corpus that contains long
    non-candidates. Null candidate text counts as 0 bytes."""
    from lsh_qd_spark.operators.verify import _auto_fetch

    rows = [(i, "ab") for i in range(100)]
    rows += [(1000 + i, "x" * 10_000) for i in range(50)]
    docs = spark.createDataFrame(rows, "_vid long, _vtx string")
    long_ids = spark.createDataFrame(
        [(1000 + i,) for i in range(50)], "_vid long"
    )
    # 50 x ~10KB = ~500KB of candidate text > 100KB cap -> shuffle
    assert _auto_fetch(long_ids, docs, 1_000_000, 100_000) == "shuffle"
    short_ids = spark.createDataFrame([(i,) for i in range(100)], "_vid long")
    # 100 x 2B fits easily even though the corpus holds 10KB docs
    assert _auto_fetch(short_ids, docs, 1_000_000, 100_000) == "broadcast_ids"
    # row cap still gates first
    assert _auto_fetch(short_ids, docs, 10, 100_000) == "shuffle"
    # all-null candidate text: 0 bytes, broadcast is safe (the kernel sees
    # empty shingle sets)
    null_docs = spark.createDataFrame(
        [(i, None) for i in range(5)], "_vid long, _vtx string"
    )
    null_ids = spark.createDataFrame([(i,) for i in range(5)], "_vid long")
    assert _auto_fetch(null_ids, null_docs, 100, 100_000) == "broadcast_ids"
