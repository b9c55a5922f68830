"""Gopher-family repetition filters (operators/repetition.py).

Hand-computed feature values on planted docs, a pure-python reference
cross-check over a deterministic pseudo-random corpus, the 0-shuffle
plan pin, and the remove_repetitive cleaning semantics (pure filter,
zero-token docs kept, unknown thresholds rejected).
"""

import random
import re

import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.operators.repetition import (
    GOPHER_THRESHOLDS,
    remove_repetitive,
    repetition_features,
)

REL = 1e-12


def feats_of(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw.setdefault("top_ngram_ns", (2,))
    kw.setdefault("dup_ngram_ns", (5,))
    return {
        r["doc_id"]: r.asDict()
        for r in repetition_features(df, **kw).collect()
    }


def test_hand_computed_cases(spark):
    got = feats_of(
        spark,
        [
            # "a b"x3 (9 chars) / "a b a b a b" (11 chars)
            (1, "a b a b a b"),
            # 3 raw lines, one duplicated: frac 1/3 by count AND chars
            (2, "x\ny\nx"),
            # every 2-gram unique; 8 distinct 5-grams of 12 tokens
            (3, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb"),
            # "spam spam" overlaps itself: coverage saturates at 1.0;
            # 4 total 5-grams, 1 distinct -> dup_5gram_frac 3/4
            (4, "spam spam spam spam spam spam spam spam"),
        ],
    )
    assert got[1]["top_2gram_char_frac"] == pytest.approx(9 / 11, rel=REL)
    assert got[1]["dup_line_frac"] == 0.0
    assert got[1]["dup_5gram_frac"] == 0.0  # both 5-grams distinct

    assert got[2]["n_lines"] == 3
    assert got[2]["dup_line_frac"] == pytest.approx(1 / 3, rel=REL)
    assert got[2]["dup_line_char_frac"] == pytest.approx(1 / 3, rel=REL)

    # unique 2-grams: nothing repeats (count >= 2 gate), so coverage is 0
    # — a doc with no repetition must never score on the top-gram feature
    assert got[3]["top_2gram_char_frac"] == 0.0
    assert got[3]["dup_5gram_frac"] == 0.0

    assert got[4]["top_2gram_char_frac"] == 1.0  # saturated
    assert got[4]["dup_5gram_frac"] == pytest.approx(3 / 4, rel=REL)


def test_zero_token_doc_excluded_from_features(spark):
    got = feats_of(spark, [(1, "   "), (2, None), (3, "ok fine")])
    assert set(got) == {3}


def py_features(text: str, top_n: int, dup_n: int) -> dict:
    """Independent python reference of the documented semantics."""
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    toks = [t for t in norm.split(" ") if t]
    lines = [ln for ln in text.split("\n") if ln]

    def grams(n):
        if len(toks) < n:
            return []
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    out = {"n_lines": len(lines)}
    nl, nd = len(lines), len(set(lines))
    out["dup_line_frac"] = (nl - nd) / nl if nl else 0.0
    s_all = sum(len(x) for x in lines)
    s_dist = sum(len(x) for x in set(lines))
    out["dup_line_char_frac"] = (s_all - s_dist) / s_all if s_all else 0.0
    total = len(" ".join(toks))
    g = grams(top_n)
    # count >= 2: a gram occurring once is not repetition (mirrors
    # _top_gram_chars and the SQL twin's WHERE c >= 2)
    best = max(
        (g.count(x) * len(x) for x in set(g) if g.count(x) >= 2), default=0
    )
    out[f"top_{top_n}gram_char_frac"] = (
        min(1.0, best / total) if total else 0.0
    )
    d = grams(dup_n)
    out[f"dup_{dup_n}gram_frac"] = (
        (len(d) - len(set(d))) / len(d) if d else 0.0
    )
    return out


def test_python_reference_cross_check(spark):
    rng = random.Random(42)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    rows = []
    for i in range(60):
        n = rng.randint(1, 40)
        words = [rng.choice(vocab) for _ in range(n)]
        # inject line breaks every 4-7 words
        parts, j = [], 0
        while j < len(words):
            step = rng.randint(4, 7)
            parts.append(" ".join(words[j : j + step]))
            j += step
        rows.append((i, "\n".join(parts)))
    got = feats_of(spark, rows, top_ngram_ns=(2, 3), dup_ngram_ns=(5,))
    for i, text in rows:
        want = py_features(text, 2, 5)
        want3 = py_features(text, 3, 5)
        assert got[i]["n_lines"] == want["n_lines"], (i, text)
        for k in (
            "dup_line_frac",
            "dup_line_char_frac",
            "top_2gram_char_frac",
            "dup_5gram_frac",
        ):
            assert got[i][k] == pytest.approx(want[k], rel=REL), (i, k, text)
        assert got[i]["top_3gram_char_frac"] == pytest.approx(
            want3["top_3gram_char_frac"], rel=REL
        ), (i, text)


def test_plan_is_narrow(spark):
    """Scale-shape pin: the whole feature projection is shuffle-free and
    python-free (runs at scan speed at 100 TB)."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        repetition_features(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF fallback anywhere


def test_remove_repetitive_gopher_defaults(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),  # drop: top2
            # drop: 3 of 6 lines duplicated
            (2, "l one a\nl two b\nl one a\nl three c\nl one a\nl four d"),
            # keep: long unique-ish doc, every gram distinct
            (3, " ".join(f"tok{i} mid{i * 7 % 13}" for i in range(40))),
            (4, "   "),  # keep: zero tokens repeat nothing
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in remove_repetitive(df).collect())
    assert kept == [3, 4]
    # the clean is a pure filter: no join, no exchange
    plan = (
        remove_repetitive(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_remove_repetitive_custom_subset_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "fresh words only here")],
        "doc_id long, text string",
    )
    # subset: only the dup-5gram rule -> doc 1 survives (0 dup 5-grams
    # beyond... 4 tokens -> no 5-grams at all)
    kept = sorted(
        r["doc_id"]
        for r in remove_repetitive(
            df, {"dup_5gram_frac": 0.15}
        ).collect()
    )
    assert kept == [1, 2]
    with pytest.raises(ValueError, match="unknown repetition thresholds"):
        remove_repetitive(df, {"beep_frac": 0.5})


def test_gopher_threshold_keys_all_computable(spark):
    """Every published default is wired to a real feature column."""
    # long enough that single-occurrence grams don't dominate the char
    # fractions (the Gopher bounds target real web documents)
    text = " ".join(f"tok{i} mid{i * 7 % 13}" for i in range(40))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = remove_repetitive(df, GOPHER_THRESHOLDS)
    assert out.count() == 1


def test_oracle_repetition_scores_survives_empty_docs(spark, tmp_path):
    """Regression: q_repetition_scores crashed with IllegalArgumentException
    ('Illegal sequence boundaries') on any zero-token document, because
    F.sequence(1, size(toks), 5) was built before any non-empty filter.
    Zero-token docs must be DROPPED (the DuckDB twin's `base` CTE filters
    len(t) > 0), not crash the query."""
    from lsh_qd_spark.oracle import q_repetition_scores

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, ""),            # zero tokens — the crash case
            (3, "   \t  "),     # whitespace-only — also zero tokens
            (4, None),          # null text
        ],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    got = q_repetition_scores(spark, sf_dir).collect()
    assert sorted(r["doc_id"] for r in got) == [1]


def test_short_unrepetitive_doc_survives_gopher_filter(spark):
    """A short document with zero repetition must NOT be dropped: with
    single occurrences counting as 'repetition', any doc under ~25 tokens
    had its longest n-gram trivially covering >16-20% of the characters
    and remove_repetitive deleted it wholesale."""
    from lsh_qd_spark.operators.repetition import remove_repetitive

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),  # 10 distinct tokens, no repeats
            (2, "spam spam spam spam spam spam spam spam"),  # pure repeat
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in remove_repetitive(df).collect()}
    assert kept == {1}
