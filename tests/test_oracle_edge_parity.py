"""Latent-parity guard for the DuckDB oracle twins on degenerate text.

The driver gate only exercises the fixed testdata; these tests run the
text-family Spark/DuckDB query pairs over a corpus of deliberately nasty
documents — NULL text, empty text, whitespace-only, a vertical tab
(\\x0B: inside Java's \\s but OUTSIDE RE2's), and non-ASCII — where the
twins historically diverged (unicode('') = -1 vs ascii('') = 0; DuckDB
CASE falling through to a language for NULL text; RE2 \\s missing \\x0B).
"""

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lsh_qd_spark import oracle

EDGE_DOCS = [
    (0, None, "en", "web", 0),
    (1, "", "en", "web", 0),
    (2, "   \t\n ", "en", "web", 6),
    (3, "a\x0bb c d e f g h", "en", "web", 16),
    (4, "Ünïcode tëxt wïth ümläuts ünd mörê wörds hërë", "de", "web", 46),
    (5, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60),
    (6, "the quick brown fox jumps over the lazy dog again and again!", "en", "web", 61),
    (7, "one", "en", "web", 3),
]

TEXT_FAMILY = [
    "doc_stats",
    "token_counts",
    "token_totals",
    "quality_scores",
    "doc_fingerprint",
    "langid",
    "minhash_buckets",
    "candidate_pairs",
    "verified_pairs",
]


@pytest.fixture(scope="module")
def edge_sf(spark, tmp_path_factory):
    sf = tmp_path_factory.mktemp("edge_sf")
    spark.createDataFrame(
        EDGE_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    return str(sf)


@pytest.fixture(scope="module")
def edge_duck(edge_sf):
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; the driver testdata is single files
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{edge_sf}/documents.parquet/*.parquet'"
    )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


@pytest.mark.parametrize("name", TEXT_FAMILY)
def test_edge_corpus_parity(spark, edge_sf, edge_duck, name):
    import __spark_entry__ as entrymod

    spark_pdf = entrymod.queries()[name](spark, edge_sf).toPandas()
    duck_pdf = edge_duck.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), name
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist())):
            if isinstance(x, float) or isinstance(y, float):
                xf, yf = float(x), float(y)
                ok = xf == yf or (math.isnan(xf) and math.isnan(yf))
            else:
                ok = x == y
            assert ok, f"{name}: col {c} row {i}: {x!r} != {y!r}"


def test_fingerprint_degenerate_values(spark, edge_sf):
    """Pin the Spark-side semantics the twin mirrors: NULL text -> NULL
    fingerprint, empty/whitespace-only -> 0 (one zero fold step)."""
    got = {
        r["doc_id"]: r["fingerprint"]
        for r in oracle.q_doc_fingerprint(spark, edge_sf).collect()
    }
    assert got[0] is None
    assert got[1] == 0 and got[2] == 0


def test_langid_null_text_is_null(spark, edge_sf):
    got = {
        r["doc_id"]: r["lang_guess"]
        for r in oracle.q_langid(spark, edge_sf).collect()
    }
    assert got[0] is None  # NULL text: no guess, not the last profile
    assert got[1] == "und"  # empty text: zero markers
    assert got[5] == "en"


def test_vertical_tab_tokenizes_identically(spark, edge_duck):
    """\\x0B is whitespace to Java but not to RE2's \\s — the DuckDB twin
    uses an explicit class so both engines see the same token count."""
    spark_n = (
        spark.createDataFrame([("a\x0bb c",)], "text string")
        .select(F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("n"))
        .collect()[0]["n"]
    )
    duck_n = edge_duck.sql(
        f"SELECT len(list_filter(string_split({oracle.DUCK_NORM}, ' '), x -> x <> '')) AS n "
        "FROM (SELECT 'a' || chr(11) || 'b c' AS text)"
    ).df()["n"][0]
    assert spark_n == duck_n == 3
