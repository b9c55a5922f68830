"""Text normalization, tokenization, and shingling — all JVM-side.

The reference consumes pre-vectorized binary strings and derives the set of
nonzero indices (``/root/reference/lsh-qd.py:195``). Our front-end replaces
that with the text path the north rule mandates: normalize → tokenize →
k-gram shingles → 64-bit shingle hashes. Everything here is built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen — no Python
in the hot path.

Two shingle-hash families:
- ``xxhash64`` (default, production): Spark's JVM xxhash64 of the shingle
  string.
- ``poly`` (portable): polynomial character hash mod ``HASH_M``, expressible
  identically in DuckDB SQL — used by the driver-oracle queries so Spark and
  DuckDB compute byte-identical shingle IDs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from lsh_qd_spark.config import HASH_M

POLY_MULT = 31


def extract_text(html: Column) -> Column:
    """Extracted page text from a raw ``html`` binary column — the
    Common-Crawl-style front step of the north rule's input table
    (url, warc_ts, html, text, lang): ``text = extract_text(html)``.

    Pure JVM regexp chain (no UDF, stays in whole-stage codegen):
    lenient UTF-8 (binary→string cast) → drop <script>/<style> subtrees →
    drop HTML comments → take the <body> element → strip remaining tags →
    decode the five standard HTML entities. A pure function of the bytes, so re-extraction is
    byte-identical per url across runs and parallelism levels — the
    input_hint invariant (tests/test_shingle.py pins round-trip equality
    against the synth pages table).
    """
    # cast, NOT decode: Spark 4's decode raises MALFORMED_CHARACTER_CODING
    # on any invalid UTF-8 byte, and crawl WARCs routinely truncate mid
    # multi-byte character (or lie about their encoding) — one bad page
    # would abort the whole extraction job. The binary→string cast is
    # lenient (invalid bytes → U+FFFD) and byte-identical to decode on
    # valid UTF-8, keeping the per-url determinism invariant.
    s = html.cast("string")
    # script/style subtrees go FIRST, on the whole markup: a literal
    # "<body>" inside a head script string (document.write et al.) would
    # otherwise start the body extraction inside the head and leak script
    # remnants into the text
    s = F.regexp_replace(s, r"(?is)<(script|style)[^>]*>.*?</\1>", "")
    # HTML comments next — the COMMENT form of the same hazard: a
    # commented-out "<body>" in the head (e.g. templating remnants) would
    # otherwise start the body extraction inside the comment and leak
    # head markup/title text into the extracted output. After the script
    # strip, so legacy "<script><!-- code //--></script>" hiding markers
    # are already gone and cannot open a bogus comment span here.
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    # Truncated captures without a closing </body> (routine in crawl WARCs)
    # must not drop the document: fall back to everything after <body>,
    # then to the whole markup (minus <head>) when no <body> exists at all.
    #
    # Evaluation-order note: the common case (well-formed closed body) must
    # pay for the expensive dot-all scan ONCE. regexp_extract returns ''
    # for both "no match" and "matched an empty body", so the extract
    # result is the FIRST branch and the disambiguating rlike (a second
    # full scan) runs only for the rare empty-'' results.
    closed = F.regexp_extract(s, r"(?is)<body(?:\s[^>]*)?>(.*)</body>", 1)
    open_tail = F.regexp_extract(s, r"(?is)<body(?:\s[^>]*)?>(.*)$", 1)
    body = (
        F.when(closed != "", closed)
        .when(s.rlike(r"(?is)<body(?:\s[^>]*)?>.*</body>"), F.lit(""))
        .when(open_tail != "", open_tail)
        .when(s.rlike(r"(?i)<body(?:\s[^>]*)?>"), F.lit(""))
        .otherwise(F.regexp_replace(s, r"(?is)<head[^>]*>.*?</head>", ""))
    )
    txt = F.regexp_replace(body, r"(?s)<[^>]+>", "")
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")]:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return txt


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse all whitespace runs to single spaces, trim.

    Deterministic pure function of the input → satisfies the per-row
    "byte-identical extracted text per url" invariant (BASELINE.json
    input_hint).
    """
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text (empty tokens removed)."""
    return F.filter(F.split(normalize_text(col), " "), lambda t: t != F.lit(""))


def word_grams(toks: Column, n: int) -> Column:
    """Overlapping word n-grams (space-joined) of a token array; empty
    when fewer than ``n`` tokens. THE sliding-window expression — shared
    by shingling (below), the Gopher repetition filters, and strict
    decontamination grams, so the three rules cannot drift."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_strings(col: Column, k: int) -> Column:
    """Distinct k-gram shingle strings of a text column.

    Documents with fewer than ``k`` tokens (but ≥ 1) produce a single shingle
    of all their tokens; empty documents produce an empty array (downstream
    drops them, mirroring the reference's empty-set skip at
    ``/root/reference/lsh-qd.py:196-197``).
    """
    toks = tokens(col)
    grams = F.when(
        F.size(toks) < k,
        F.when(F.size(toks) > 0, F.array(F.concat_ws(" ", toks))).otherwise(
            F.array().cast("array<string>")
        ),
    ).otherwise(word_grams(toks, k))
    return F.array_distinct(grams)


def poly_hash(col: Column) -> Column:
    """Portable polynomial hash of a string: fold ``acc*31 + codepoint``
    mod HASH_M over characters. Exactly reproducible in DuckDB SQL
    (see lsh_qd_spark/oracle.py) — the bridge for driver value-hash parity.
    """
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * POLY_MULT + F.ascii(c)) % F.lit(HASH_M),
    )


def shingles(col: Column, k: int, hash_family: str = "xxhash64") -> Column:
    """Distinct 64-bit shingle IDs for a text column: array<long>."""
    grams = shingle_strings(col, k)
    if hash_family == "xxhash64":
        hashed = F.transform(grams, lambda s: F.xxhash64(s))
    elif hash_family == "poly":
        hashed = F.transform(grams, poly_hash)
    else:
        raise ValueError(f"unknown shingle hash family: {hash_family}")
    return F.array_distinct(hashed)
