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
    """auto must refuse the broadcast when the EXACT candidate-text bytes
    exceed the cap (→ candidate_shuffle: plain joins against the
    checkpointed candidate texts), and when the row count exceeds its cap
    (→ full shuffle) — both fallbacks return the same rows."""
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


def test_auto_fetch_measures_candidate_bytes_not_corpus_head(spark):
    """The auto byte gate must size the broadcast from the CANDIDATES'
    texts: a corpus whose non-candidate rows are short (or whose scan head
    is short) must not green-light broadcasting long candidates, and short
    candidates must still broadcast out of a corpus that contains long
    non-candidates. Over the byte cap (but under the row cap) the mode is
    candidate_shuffle and the checkpointed candidate texts are returned;
    over the row cap nothing is materialized. Null candidate text counts
    as 0 bytes."""
    from lsh_qd_spark.operators.verify import _auto_fetch

    rows = [(i, "ab") for i in range(100)]
    rows += [(1000 + i, "x" * 10_000) for i in range(50)]
    docs = spark.createDataFrame(rows, "_vid long, _vtx string")
    long_ids = spark.createDataFrame(
        [(1000 + i,) for i in range(50)], "_vid long"
    )
    # 50 x 10KB = 500KB of candidate text > 100KB cap -> join the
    # checkpointed candidate texts, don't broadcast them
    mode, tchk = _auto_fetch(long_ids, docs, 1_000_000, 100_000)
    assert mode == "candidate_shuffle"
    assert tchk is not None and tchk.count() == 50
    short_ids = spark.createDataFrame([(i,) for i in range(100)], "_vid long")
    # 100 x 2B fits easily even though the corpus holds 10KB docs
    mode, tchk = _auto_fetch(short_ids, docs, 1_000_000, 100_000)
    assert mode == "broadcast_ids"
    assert tchk is not None and tchk.count() == 100
    # row cap gates first — and nothing is checkpointed over it
    assert _auto_fetch(short_ids, docs, 10, 100_000) == ("shuffle", None)
    # all-null candidate text: 0 bytes of text (24B/row id overhead only),
    # broadcast is safe (the kernel sees empty shingle sets)
    null_docs = spark.createDataFrame(
        [(i, None) for i in range(5)], "_vid long, _vtx string"
    )
    null_ids = spark.createDataFrame([(i,) for i in range(5)], "_vid long")
    mode, _ = _auto_fetch(null_ids, null_docs, 100, 100_000)
    assert mode == "broadcast_ids"


def test_auto_fetch_logs_its_decision(spark, caplog):
    """Every auto decision is logged (the full-corpus shuffle loudly, as a
    WARNING): a production run that fell off the candidate-bounded path
    must be diagnosable from driver logs, not from physical-plan dumps."""
    import logging

    from lsh_qd_spark.operators.verify import _auto_fetch

    docs = spark.createDataFrame(
        [(i, "abcdef") for i in range(20)], "_vid long, _vtx string"
    )
    ids = spark.createDataFrame([(i,) for i in range(20)], "_vid long")
    with caplog.at_level(logging.INFO, logger="lsh_qd_spark.operators.verify"):
        _auto_fetch(ids, docs, 1_000_000, 100_000)
        _auto_fetch(ids, docs, 1_000_000, 1)
        _auto_fetch(ids, docs, 5, 100_000)
    msgs = [(r.levelname, r.getMessage()) for r in caplog.records]
    assert any(lvl == "INFO" and "fetch=broadcast_ids" in m for lvl, m in msgs)
    assert any(
        lvl == "INFO" and "fetch=candidate_shuffle" in m for lvl, m in msgs
    )
    assert any(lvl == "WARNING" and "fetch=shuffle" in m for lvl, m in msgs)
