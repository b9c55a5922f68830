"""Shingle front-end: determinism, normalization, edge cases."""

from pyspark.sql import functions as F

from lsh_qd_spark.functions.text import (
    normalize_text,
    poly_hash,
    shingle_strings,
    shingles,
)
from lsh_qd_spark.config import HASH_M


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], "t string").select(
        expr(F.col("t")).alias("v")
    ).first()["v"]


def test_normalize(spark):
    assert (
        _one(spark, "  Hello\t\tWorld\n  again ", normalize_text)
        == "hello world again"
    )


def test_shingle_strings_basic(spark):
    got = _one(spark, "a b c d e f", lambda c: shingle_strings(c, 5))
    assert got == ["a b c d e", "b c d e f"]


def test_shingle_short_doc_single_gram(spark):
    got = _one(spark, "a b c", lambda c: shingle_strings(c, 5))
    assert got == ["a b c"]


def test_shingle_empty_and_whitespace(spark):
    assert _one(spark, "", lambda c: shingle_strings(c, 5)) == []
    assert _one(spark, " \t \n ", lambda c: shingle_strings(c, 5)) == []


def test_shingle_distinct(spark):
    got = _one(spark, "x x x x x x x x", lambda c: shingle_strings(c, 5))
    assert got == ["x x x x x"]


def test_shingles_deterministic_across_runs(spark):
    text = "The quick brown fox jumps over the lazy dog again and again"
    a = _one(spark, text, lambda c: shingles(c, 5))
    b = _one(spark, text, lambda c: shingles(c, 5))
    assert a == b and len(a) > 0


def test_poly_hash_matches_python(spark):
    s = "hello world"
    expected = 0
    for ch in s:
        expected = (expected * 31 + ord(ch)) % HASH_M
    assert _one(spark, s, poly_hash) == expected


def test_byte_identical_invariant(spark):
    """Same text → identical normalized text and shingle IDs, independent of
    partitioning (per-row invariant, BASELINE.json input_hint)."""
    rows = [(i, "Some Page   Text %d" % (i % 3),) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, t string")
    one = df.coalesce(1).select(normalize_text(F.col("t")).alias("n")).collect()
    many = df.repartition(7).select(normalize_text(F.col("t")).alias("n")).collect()
    assert sorted(r["n"] for r in one) == sorted(r["n"] for r in many)


def test_extract_text_roundtrip_synth_pages(spark):
    """input_hint invariant: extract_text(html) is byte-identical to the
    stored text column for every synth page — including the empty /
    whitespace-only / tiny edge docs."""
    from lsh_qd_spark.functions.text import extract_text
    from lsh_qd_spark.synth import SynthConfig, generate_pages

    pages = generate_pages(spark, SynthConfig(n_docs=400, seed=11))
    mismatches = pages.where(
        ~(extract_text(F.col("html")).eqNullSafe(F.col("text")))
    ).count()
    assert mismatches == 0


def test_extract_text_entities_and_script(spark):
    from lsh_qd_spark.functions.text import extract_text

    html = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><script>var x=1;</script><p>a &amp; b &lt;c&gt; "
        "&quot;d&#39;</p></body></html>"
    ).encode()
    got = (
        spark.createDataFrame([(html,)], "h binary")
        .select(extract_text(F.col("h")).alias("v"))
        .first()["v"]
    )
    assert got == "a & b <c> \"d'"


def test_extract_text_truncated_and_bodyless(spark):
    """Crawl-reality fallbacks: no closing </body> (truncated capture) and
    no <body> at all must not drop the document."""
    from lsh_qd_spark.functions.text import extract_text

    cases = [
        (b"<html><body><p>hello truncated</p>", "hello truncated"),
        (b"<html><head><title>T</title></head><p>no body tag</p></html>",
         "no body tag"),
    ]
    for html, want in cases:
        got = (
            spark.createDataFrame([(html,)], "h binary")
            .select(extract_text(F.col("h")).alias("v"))
            .first()["v"]
        )
        assert got.strip() == want, (html, got)


def test_windows_give_identical_minhash_signatures():
    """MinHash is invariant to shingle multiplicity: the fused path feeds
    raw rolling-hash windows (shingle_windows) and must produce the exact
    signatures of the set path (shingle_sets -> minhash)."""
    import numpy as np

    from lsh_qd_spark.config import HASH_M, MERSENNE_P
    from lsh_qd_spark.functions.fast_shingle import (
        shingle_sets,
        shingle_windows,
    )
    from lsh_qd_spark.functions.minhash import (
        minhash_matrix,
        production_coefficients,
    )

    texts = [
        "a b a b a b a b a b",  # heavy duplicate shingles
        "the quick brown fox jumps over the lazy dog",
        "",  # empty -> None
        "one two",  # short doc (n < k)
        "x " * 200,  # single repeated token
    ]
    k = 3
    sets = shingle_sets(texts, k)
    wins = shingle_windows(texts, k)
    # windows dedup to exactly the sets
    for s, w in zip(sets, wins):
        if s is None:
            assert w is None
        else:
            assert np.array_equal(np.unique(w), s)
    a, b = production_coefficients(16, 42)
    m_set = minhash_matrix(
        [None if s is None else s.view(np.int64) for s in sets],
        a, b, MERSENNE_P, HASH_M,
    )
    m_win = minhash_matrix(
        [None if w is None else w.view(np.int64) for w in wins],
        a, b, MERSENNE_P, HASH_M,
    )
    assert np.array_equal(m_set, m_win)
