"""Suffix-array kernel: SA/LCP correctness, LCS oracle, Spark operator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.operators.suffix import (
    exact_overlap,
    lcp_array,
    longest_common_substring,
    suffix_array,
)


def _naive_sa(s: str):
    return sorted(range(len(s)), key=lambda i: s[i:])


def _naive_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@pytest.mark.parametrize(
    "s", ["banana", "mississippi", "aaaa", "abcd", "abab", "z"]
)
def test_suffix_array_matches_naive(s):
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    assert suffix_array(codes).tolist() == _naive_sa(s)


def test_lcp_matches_naive():
    s = "mississippi"
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    sa = suffix_array(codes)
    lcp = lcp_array(codes, sa)
    for i in range(1, len(s)):
        a, b = s[sa[i] :], s[sa[i - 1] :]
        expected = 0
        while (
            expected < min(len(a), len(b)) and a[expected] == b[expected]
        ):
            expected += 1
        assert lcp[i] == expected


def test_lcs_random_vs_naive():
    rng = np.random.default_rng(13)
    alphabet = "abcde"
    for _ in range(25):
        a = "".join(rng.choice(list(alphabet), size=rng.integers(1, 40)))
        b = "".join(rng.choice(list(alphabet), size=rng.integers(1, 40)))
        assert longest_common_substring(a, b) == _naive_lcs(a, b)


def test_lcs_planted_overlap():
    shared = "the quick brown fox jumps over the lazy dog"
    a = "prefix one " + shared + " suffix alpha"
    b = "other text here " + shared + " trailing"
    assert longest_common_substring(a, b) >= len(shared)


def test_lcs_edge_cases():
    assert longest_common_substring("", "abc") == 0
    assert longest_common_substring("abc", "") == 0
    assert longest_common_substring("xyz", "abc") == 0
    assert longest_common_substring("same", "same") == 4


def test_exact_overlap_operator(spark):
    docs = spark.createDataFrame(
        [
            (1, "aaa shared boilerplate block here bbb"),
            (2, "ccc shared boilerplate block here ddd"),
            (3, "totally unrelated content xyz"),
        ],
        "doc_id long, text_norm string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = exact_overlap(pairs, docs, min_len=10).collect()
    assert len(got) == 1
    assert got[0]["id_a"] == 1 and got[0]["id_b"] == 2
    assert got[0]["overlap_len"] >= len("shared boilerplate block here")


def test_exact_overlap_string_ids(spark):
    """The engine is id-type generic (string doc ids are first-class in
    cluster/verify): exact_overlap must derive its mapInPandas schema
    from the pairs schema, not hardcode long ids."""
    docs = spark.createDataFrame(
        [
            ("u1", "aaa shared boilerplate block here bbb"),
            ("u2", "ccc shared boilerplate block here ddd"),
        ],
        "doc_id string, text_norm string",
    )
    pairs = spark.createDataFrame(
        [("u1", "u2")], "id_a string, id_b string"
    )
    got = exact_overlap(pairs, docs, min_len=10).collect()
    assert len(got) == 1
    assert got[0]["id_a"] == "u1" and got[0]["id_b"] == "u2"


def test_exact_overlap_fetch_modes(spark):
    """Explicit fetch='broadcast_ids' must broadcast CANDIDATE texts
    (semi-joined), matching verify_pairs_text; unknown modes raise."""
    import pytest

    docs = spark.createDataFrame(
        [
            (1, "aaa shared boilerplate block here bbb"),
            (2, "ccc shared boilerplate block here ddd"),
            (3, "unrelated filler content row xyz"),
        ],
        "doc_id long, text_norm string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = exact_overlap(
        pairs, docs, min_len=10, fetch="broadcast_ids"
    ).collect()
    assert len(got) == 1 and got[0]["id_a"] == 1
    with pytest.raises(ValueError, match="unknown fetch"):
        exact_overlap(pairs, docs, min_len=10, fetch="bogus")
