"""Banding guards: a signature shorter than num_bands*rows_per_band must
fail the job loudly — F.slice past the array end would otherwise return the
empty array for EVERY doc and silently band the whole corpus into one
bucket per out-of-range band (corpus-wide mega-buckets, inflated n_bands).
"""

import pytest

from lsh_qd_spark.operators.band import band_buckets


def test_short_signature_fails_loudly(spark):
    sigs = spark.createDataFrame(
        [(1, list(range(8))), (2, list(range(8)))],
        "doc_id long, sig array<bigint>",
    )
    # 8 hashes banded as rows_per_band=2 x num_bands=8 needs 16
    with pytest.raises(Exception, match="shorter than"):
        band_buckets(sigs, 2, 8).collect()


def test_null_sig_passes_guard_and_emits_no_rows(spark):
    """Empty docs (null sig — the reference's empty-set skip) must not trip
    the length assert and must emit zero bucket rows."""
    sigs = spark.createDataFrame(
        [(1, None), (2, list(range(8)))], "doc_id long, sig array<bigint>"
    )
    rows = band_buckets(sigs, 2, 4).collect()
    assert len(rows) == 4
    assert {r["doc_id"] for r in rows} == {2}


def test_exact_length_signature_ok(spark):
    sigs = spark.createDataFrame(
        [(7, list(range(16)))], "doc_id long, sig array<bigint>"
    )
    rows = band_buckets(sigs, 2, 8).collect()
    assert len(rows) == 8
    assert sorted(r["band_idx"] for r in rows) == list(range(8))
