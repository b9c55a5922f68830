"""Re-crawl collapse: URL canonicalization + latest-snapshot selection.

Canonicalization cases each encode a real way crawl logs spell the SAME
resource differently; the selection tests plant multi-snapshot URLs and
check winner identity, determinism under timestamp ties, and that the
wide columns survive untouched.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.operators.recrawl import canonical_url, latest_snapshot

CANON_CASES = [
    # fragment never names a different resource
    ("https://a.com/x#sec2", "https://a.com/x"),
    # host case-insensitive, path case-SENSITIVE (RFC 3986)
    ("HTTPS://A.com/Path", "https://a.com/Path"),
    ("https://www.a.com/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    # NON-default port is identity
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # tracking params dropped, real params kept and sorted
    ("https://a.com/x?utm_source=tw&id=3", "https://a.com/x?id=3"),
    # tracking-param NAMES match case-insensitively (ad/mail tooling
    # emits UTM_SOURCE=, Gclid=); values keep their case
    ("https://a.com/x?UTM_SOURCE=tw&id=3", "https://a.com/x?id=3"),
    ("https://a.com/x?Gclid=AbC&id=3", "https://a.com/x?id=3"),
    ("https://a.com/x?b=2&a=1", "https://a.com/x?a=1&b=2"),
    ("https://a.com/x?gclid=abc", "https://a.com/x"),
    ("https://a.com/x?fbclid=1&a=2", "https://a.com/x?a=2"),
    # trailing slash and bare host normalize to one spelling
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com", "https://a.com/"),
    ("https://a.com/", "https://a.com/"),
    # utm_ prefix match must not eat unrelated params
    ("https://a.com/x?utmost=1", "https://a.com/x?utmost=1"),
    # `ref` is frequently a RESOURCE KEY (forums, PHP apps), not a
    # tracker — stripping it would silently collapse distinct pages
    ("https://a.com/view?ref=1001", "https://a.com/view?ref=1001"),
    ("https://a.com/view?ref=1002", "https://a.com/view?ref=1002"),
    # DNS-rooted FQDN trailing dot names the same host
    ("https://a.com./x", "https://a.com/x"),
    ("https://a.com.:443/x", "https://a.com/x"),
    # NOT absolute URLs → NULL, never a shared synthetic key (an empty-
    # string url in a dirty extract must not merge unrelated documents)
    ("", None),
    ("   ", None),
    ("example.com/x", None),
    ("/relative/path", None),
    ("://missing.scheme/x", None),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CANON_CASES)], "i int, u string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("u")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonical_url_null_stays_null(spark):
    df = spark.createDataFrame([(1, None)], "i int, u string")
    assert (
        df.select(canonical_url(F.col("u")).alias("c")).first()["c"] is None
    )


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # url A: three crawls, spelled three equivalent ways — latest wins
        (1, "https://a.com/p", _ts(1), b"<h1/>", "a v1", "en"),
        (2, "https://www.a.com/p", _ts(5), b"<h2/>", "a v2", "en"),
        (3, "https://a.com/p#top", _ts(3), b"<h3/>", "a v1b", "en"),
        # url B: ts tie — highest doc_id wins, deterministically
        (4, "https://b.com/q", _ts(2), b"", "b x", "en"),
        (5, "https://b.com/q", _ts(2), b"", "b y", "en"),
        # url C: single crawl
        (6, "https://c.com/r?z=1", _ts(9), b"", "c", "de"),
        # null urls never merge with each other
        (7, None, _ts(1), b"", "n1", "en"),
        (8, None, _ts(2), b"", "n2", "en"),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    )


def test_latest_snapshot_winners(spark, pages):
    out = latest_snapshot(pages)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {2, 5, 6, 7, 8}
    assert rows[2]["n_snapshots"] == 3  # A collapsed across 3 spellings
    assert rows[5]["n_snapshots"] == 2  # B tie broken to the higher id
    assert rows[6]["n_snapshots"] == 1
    assert rows[7]["n_snapshots"] == 1 and rows[8]["n_snapshots"] == 1
    # null urls expose NULL canonical_url, not a fabricated key
    assert rows[7]["canonical_url"] is None
    assert rows[8]["canonical_url"] is None
    assert rows[2]["canonical_url"] == "https://a.com/p"
    # wide columns pass through byte-identical (fetch-late join, not agg)
    assert rows[2]["text"] == "a v2" and bytes(rows[2]["html"]) == b"<h2/>"
    # schema: input columns + the two additions
    assert set(out.columns) == set(pages.columns) | {
        "canonical_url",
        "n_snapshots",
    }


def test_latest_snapshot_prunes_election_scan(spark, pages, tmp_path):
    """The winner election must read/shuffle only (id, url, ts): over a
    parquet table the plan has two scans, and the election-side scan's
    ReadSchema must carry neither text nor html — those columns move only
    on the fetch side of the semi-join."""
    import contextlib
    import io

    src = str(tmp_path / "pages")
    pages.write.parquet(src)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        latest_snapshot(spark.read.parquet(src)).explain("formatted")
    plan = buf.getvalue()
    schemas = [
        line.split("ReadSchema:", 1)[1]
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]
    assert len(schemas) == 2, plan
    election = [s for s in schemas if "text" not in s and "html" not in s]
    assert election, f"no pruned election scan:\n{plan}"
    assert "url" in election[0] and "warc_ts" in election[0]


def test_canonical_url_invariance_grid_and_idempotence(spark):
    """Exhaustive spelling grid of ONE logical resource: every combination
    of scheme/host case, www, explicit default port, fragment, tracking
    params, query-param order, and trailing slash must canonicalize to the
    SAME key — and canonicalization must be a fixpoint (re-canonicalizing
    the output changes nothing), or re-processing an already-collapsed
    table would split groups."""
    import itertools

    variants = []
    for (scheme, host), port, frag, track, q, slash in itertools.product(
        [("https", "example.com"), ("HTTPS", "EXAMPLE.com"),
         ("https", "www.example.com")],
        ["", ":443"],
        ["", "#sec"],
        ["", "utm_source=x&"],
        ["a=1&b=2", "b=2&a=1"],
        ["", "/"],
    ):
        variants.append(
            f"{scheme}://{host}{port}/Path/Sub{slash}?{track}{q}{frag}"
        )
    df = spark.createDataFrame([(v,) for v in variants], "u string")
    canon = df.select(canonical_url(F.col("u")).alias("c"))
    got = {r["c"] for r in canon.collect()}
    assert got == {"https://example.com/Path/Sub?a=1&b=2"}, got
    # fixpoint: canonicalizing the canonical form is the identity
    twice = canon.select(canonical_url(F.col("c")).alias("c2")).collect()
    assert {r["c2"] for r in twice} == got


def test_latest_snapshot_rerun_is_identity(spark, pages):
    """Re-collapsing an already-collapsed table must be well-defined (no
    duplicate canonical_url/n_snapshots columns) and keep every row: all
    groups are singletons the second time."""
    once = latest_snapshot(pages)
    twice = latest_snapshot(once)
    assert twice.columns.count("canonical_url") == 1
    assert twice.columns.count("n_snapshots") == 1
    ids_once = {r["doc_id"] for r in once.collect()}
    got = {r["doc_id"]: r["n_snapshots"] for r in twice.collect()}
    assert set(got) == ids_once
    assert all(n == 1 for n in got.values())


def test_latest_per_url_rejected_in_streaming_mode(tmp_path):
    """Streaming modes must reject --latest-per-url loudly like the other
    batch-only prep flags, not silently skip the collapse."""
    from lsh_qd_spark.cli import main

    with pytest.raises(SystemExit, match="latest-per-url"):
        main(["--input", str(tmp_path / "in"), "--output",
              str(tmp_path / "out"), "--mode", "incremental",
              "--checkpoint-dir", str(tmp_path / "ck"),
              "--latest-per-url"])


def test_synth_timestamps_wrap_within_one_day():
    """warc_ts wraps doc ids modulo seconds-per-day: large synthetic
    corpora (> 86 400 docs) must not fan timestamps out over ~3 years
    (the old modulus was milliseconds-per-day by mistake), or any
    latest-per-url scenario built on them is skewed."""
    import numpy as np

    from lsh_qd_spark.synth import BASE_TS, SynthConfig, _batch

    cfg = SynthConfig(n_docs=200_000, seed=3)
    pdf = _batch(cfg, np.array([0, 86_399, 86_400, 199_999]))
    secs = pdf["warc_ts"].astype("int64") // 1_000_000_000
    assert secs.min() >= BASE_TS
    assert secs.max() < BASE_TS + 86_400
    # the wrap itself: id 86_400 lands back on BASE_TS
    assert secs[pdf.doc_id == 86_400].iloc[0] == BASE_TS
