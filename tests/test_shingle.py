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


# ---- Arrow batched tokenizer vs object-path oracle --------------------------

def _same_windows(a, b):
    import numpy as np

    return len(a) == len(b) and all(
        (x is None and y is None)
        or (x is not None and y is not None and np.array_equal(x, y))
        for x, y in zip(a, b)
    )


def test_arrow_windows_identical_to_object_path():
    """The Arrow joined-batch tokenizer must be bit-identical to the
    per-doc object path on ordinary and adversarial inputs."""
    import numpy as np

    from lsh_qd_spark.functions.fast_shingle import (
        _shingle_windows_objects,
        shingle_windows,
    )

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(500)] + ["ΑΣ", "İs", "ÄÖÜ", "ß"]
    texts = [
        " ".join(rng.choice(vocab, rng.randint(0, 30))) for _ in range(400)
    ] + [
        None, "", "   ", "one", "a b c d", "a b c d e f g",
        "ΑΣ ΒΣ ΓΣ ΔΣ ΕΣ ΖΣ",      # final-sigma context casing
        "İstanbul Σ x y z w",       # dotted-I full lowercase mapping
        "ΣΑ σ ς",
        # final-sigma across the join seam: a doc ending in a cased letter
        # followed by a doc starting (or consisting) of Σ must not turn
        # the standalone Σ final through the sentinel
        "word ends cased X", "Σ a b c d e", "ΑΣ", "Σ", "xΣ yΣ", "Σx Σ",
        "tab\tsep\nnl and\x0bmore", # every Python whitespace class splits
        " lead", "trail ", "x\xa0nbsp y z a b",
        "a\x1cb c\x1dd e\x1ff g",   # C1 separators: whitespace to BOTH paths
    ]
    for k in (2, 5):
        assert _same_windows(
            shingle_windows(texts, k), _shingle_windows_objects(texts, k)
        ), f"k={k}"


def test_arrow_windows_sentinel_fallback():
    """A document containing the NUL sentinel must route to the object
    path (and still produce object-path results)."""
    from lsh_qd_spark.functions.fast_shingle import (
        _shingle_windows_objects,
        shingle_windows,
    )

    texts = ["x \x00 y a b c", "plain doc here a b", None, ""]
    assert _same_windows(
        shingle_windows(texts, 3), _shingle_windows_objects(texts, 3)
    )


def test_arrow_split_whitespace_set_matches_python():
    """The Arrow fast path is sound only because utf8_split_whitespace
    splits on EXACTLY the codepoints Python str.split() does. Pin the
    agreement over every Python-whitespace codepoint and a boundary
    sample of non-whitespace ones (the full-range scan was run once;
    this keeps the cheap invariant in CI)."""
    import sys

    import pyarrow as pa
    import pyarrow.compute as pc

    py_ws = [
        chr(c)
        for c in range(sys.maxunicode + 1)
        if chr(c).isspace()
    ]
    assert len(py_ws) == 29  # the scanned set; a unicodedata bump re-opens this
    for ch in py_ws:
        toks = [
            t
            for t in pc.utf8_split_whitespace(
                pa.array([f"a{ch}b"])
            ).to_pylist()[0]
            if t
        ]
        assert toks == ["a", "b"], hex(ord(ch))
    for ch in ["\x00", "_", "-", "​", "⁠", "a"]:  # must NOT split
        toks = pc.utf8_split_whitespace(pa.array([f"a{ch}b"])).to_pylist()[0]
        assert toks == [f"a{ch}b"], hex(ord(ch))
