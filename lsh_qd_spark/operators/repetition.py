"""Repetition filters — the Gopher-rule family of within-document
quality signals.

Rae et al. 2021 (Gopher, appendix A1.1) drop web documents whose content
is dominated by repetition: duplicated lines, duplicated n-grams, or a
single n-gram covering a large share of the characters. Every major open
web corpus since (RefinedWeb, Dolma, FineWeb, RedPajama) ships the same
filters. This operator is that family for the engine, as per-document
features plus the cleaning transformation that applies the published
thresholds.

Semantics (exact-count flavor, deterministic in both engines):
- ``dup_line_frac``      = (n_lines − n_distinct_lines) / n_lines —
  the fraction of line occurrences beyond each line's first.
- ``dup_line_char_frac`` = excess-occurrence characters / all line
  characters (same excess, weighted by line length).
- ``top_{n}gram_char_frac`` = max over REPEATED word n-grams (count ≥ 2;
  a gram occurring once is not repetition — see ``_top_gram_chars``) of
  count × char_len(gram), divided by the character length of the
  token-joined text, saturated at 1.0 (overlapping occurrences of a
  self-overlapping gram — "spam spam" in "spam spam spam" — would
  otherwise over-count coverage past the document length). Taking the
  max of the product (instead of "count of the most frequent gram")
  needs no tie-break rule, so independent engines agree exactly.
- ``dup_{n}gram_frac``   = (n_grams − n_distinct_grams) / n_grams.
  Gopher's original uses character coverage with overlap union; the
  count flavor is the common reproduction (cross-engine exact) and is
  monotone in the same signal.

Scale shape: every feature is a **0-shuffle narrow map** — token/line
arrays never explode into rows. The top-gram count runs over the SORTED
gram array as a run-length ``aggregate`` (O(n log n) per document,
whole-stage codegen), so at 100 TB this runs at scan speed with no
exchange; the DuckDB oracle twin instead uses unnest + GROUP BY — an
independent strategy over the same definition. The reference has no
quality-filter surface (it consumes pre-vectorized sets,
/root/reference/lsh-qd.py:195); this is part of the
training-data-pipeline extension (SURVEY.md §2, LLM-pipeline block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lsh_qd_spark.functions.text import tokens, word_grams

# Gopher appendix A1.1 thresholds (drop a document when the feature
# EXCEEDS the bound). Keys match repetition_features output columns.
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_frac": 0.15,
    "dup_6gram_frac": 0.14,
    "dup_7gram_frac": 0.13,
    "dup_8gram_frac": 0.12,
    "dup_9gram_frac": 0.11,
    "dup_10gram_frac": 0.10,
}


def _lines(text: Column, sep: str = "\n") -> Column:
    """Non-empty line array (literal separator, split-regex-escaped)."""
    import re

    return F.filter(
        F.split(text, re.escape(sep)), lambda x: F.length(x) > 0
    )


def _char_sum(arr: Column) -> Column:
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def _top_gram_chars(grams: Column) -> Column:
    """max over REPEATED grams (count ≥ 2) of count(gram) × char_len(gram),
    via a run-length pass over the sorted array: as a run of equal grams
    extends, run × len grows monotonically, so folding ``greatest`` at
    each step captures every run's final value. 0 shuffles, all JVM.

    Runs of length 1 contribute 0: a gram that occurs ONCE is not
    repetition — counting it meant every short document's longest n-gram
    trivially covered >16-20% of its characters and remove_repetitive
    deleted unrepetitive docs under ~25 tokens wholesale (Gopher applies
    these thresholds only past a min-word-count gate). The SQL twin
    filters ``c >= 2`` identically."""
    run_now = lambda acc, x: F.when(  # noqa: E731 — shared by two fields
        x == acc["prev"], acc["run"] + 1
    ).otherwise(F.lit(1).cast("long"))
    return F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_now(acc, x).alias("run"),
            F.greatest(
                acc["best"],
                F.when(
                    run_now(acc, x) >= 2, run_now(acc, x) * F.length(x)
                ).otherwise(F.lit(0).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def _frac(num: Column, den: Column) -> Column:
    """num/den as double; 0.0 on an empty denominator (a doc with no
    lines/grams repeats nothing)."""
    return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))


def repetition_columns(
    text: Column,
    top_ngram_ns: tuple[int, ...] = (2, 3, 4),
    dup_ngram_ns: tuple[int, ...] = (5, 10),
    line_sep: str = "\n",
) -> dict[str, Column]:
    """Every repetition feature as a named (unaliased) expression over
    one text column — the shared core of the features projection and the
    cleaning filter."""
    toks = tokens(text)
    lines = _lines(text, line_sep)
    dlines = F.array_distinct(lines)
    n_lines = F.size(lines)
    s_all, s_dist = _char_sum(lines), _char_sum(dlines)
    total_chars = F.length(F.concat_ws(" ", toks))

    out: dict[str, Column] = {
        "n_lines": n_lines.cast("long"),
        "dup_line_frac": _frac(n_lines - F.size(dlines), n_lines),
        "dup_line_char_frac": _frac(s_all - s_dist, s_all),
    }
    for n in top_ngram_ns:
        out[f"top_{n}gram_char_frac"] = F.least(
            F.lit(1.0),
            _frac(_top_gram_chars(word_grams(toks, n)), total_chars),
        )
    for n in dup_ngram_ns:
        g = word_grams(toks, n)
        out[f"dup_{n}gram_frac"] = _frac(
            F.size(g) - F.size(F.array_distinct(g)), F.size(g)
        )
    return out


def repetition_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ngram_ns: tuple[int, ...] = (2, 3, 4),
    dup_ngram_ns: tuple[int, ...] = (5, 10),
    line_sep: str = "\n",
) -> DataFrame:
    """(id, n_lines, dup_line_frac, dup_line_char_frac,
    top_{n}gram_char_frac…, dup_{n}gram_frac…) per document with ≥ 1
    token. One narrow projection — no shuffle, no Python."""
    t = F.col(text_col)
    cols = repetition_columns(t, top_ngram_ns, dup_ngram_ns, line_sep)
    return docs.where(F.size(tokens(t)) > 0).select(
        F.col(id_col), *(c.alias(name) for name, c in cols.items())
    )


def _grams_ns(th: dict[str, float], prefix: str) -> tuple[int, ...]:
    """n values of the thresholded n-gram features with this prefix
    (``dup_line*`` keys don't end in ``gram_…`` and never parse here)."""
    suffix = "gram_char_frac" if prefix == "top_" else "gram_frac"
    return tuple(
        sorted(
            int(k.split("_")[1][: -len("gram")])
            for k in th
            if k.startswith(prefix) and k.endswith(suffix)
        )
    )


def remove_repetitive(
    docs: DataFrame,
    thresholds: dict[str, float] | None = None,
    text_col: str = "text",
    line_sep: str = "\n",
) -> DataFrame:
    """``docs`` minus documents exceeding ANY threshold (Gopher defaults;
    pass a dict to override/subset). A pure filter — the features are
    evaluated inline on the scan, so the whole clean is one narrow pass
    with no join and no shuffle. Documents with zero tokens are kept
    (they repeat nothing; emptiness is a different filter's job)."""
    th = GOPHER_THRESHOLDS if thresholds is None else thresholds
    cols = repetition_columns(
        F.col(text_col),
        top_ngram_ns=_grams_ns(th, "top_"),
        dup_ngram_ns=_grams_ns(th, "dup_"),
        line_sep=line_sep,
    )
    unknown = set(th) - set(cols)
    if unknown:
        raise ValueError(f"unknown repetition thresholds: {sorted(unknown)}")
    keep = F.lit(True)
    for k, bound in th.items():
        keep = keep & (cols[k] <= F.lit(float(bound)))
    return docs.where(keep)
