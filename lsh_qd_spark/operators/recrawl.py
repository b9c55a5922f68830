"""Re-crawl collapse: one surviving snapshot per canonical URL.

A Common-Crawl-style pages table carries every *fetch* of every URL —
the same page appears once per crawl with a new ``warc_ts`` (and usually
near-identical text). Feeding all snapshots into near-dup detection
wastes the expensive stages on duplicates that are already keyed by an
exact identifier, and pollutes cluster statistics (every page looks like
an N-member cluster of itself). This stage collapses the table to the
LATEST snapshot per canonical URL before any hashing runs — the cheap,
exact complement to MinHash (which then only has to find duplication
*across* URLs: mirrors, scrapers, boilerplate farms).

URL canonicalization is a pure JVM expression chain (whole-stage
codegen, no UDF): scheme+host lowercased (path/query stay case-
sensitive per RFC 3986 §6.2.2.1), fragment dropped, ``www.`` and the
scheme's default port stripped, tracking query parameters (``utm_*``
and click ids) removed, surviving parameters sorted so param order
never splits a URL into two keys, and the trailing slash normalized.

Scale shape (100 TB):
- the winner election shuffles ONLY ``(canonical_url, ts, id)`` — one
  groupBy with a map-side-partial ``max_by`` — never text or html
  payloads (same fetch-late discipline as operators/verify);
- survivors come back via a semi-join on the id, so the wide columns
  move zero times; with AQE the near-unique canonical_url key has no
  skew concern (a single URL re-crawled even thousands of times is a
  trivially small group);
- ties on ``warc_ts`` (same page fetched twice in one crawl) break by
  the highest id — a total order, so reruns are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that identify the *visit*, not the resource
# Deliberately NOT stripped: bare `ref` — unlike utm_*/gclid it is
# frequently a resource-identifying key (forums, PHP apps, e-commerce),
# so stripping it would silently collapse distinct pages into one
# canonical URL and drop them before dedup ever sees them.
# (?i): tracking tooling emits these names in any case (UTM_SOURCE=,
# Gclid=) — the NAME match must be case-insensitive or the spellings
# defeat the collapse; param VALUES stay untouched (the filter only
# decides keep-vs-drop, it never rewrites the kv string)
TRACKING_PARAM_RE = r"(?i)^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)(=.*)?$"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` as one JVM expression tree (no UDF).

    Normalizations (each motivated by a way the SAME resource gets
    distinct crawl-log spellings): lowercase scheme+host, drop fragment,
    drop ``www.``, drop the scheme's default port, drop tracking params,
    sort surviving params, strip the trailing path slash (bare host →
    ``/``). NULL urls stay NULL so they never merge into one group.
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")  # fragment first
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    # strip userinfo ('user[:pass]@'): it names the visit, not the
    # resource — left in place it defeats the www./default-port stripping
    # below AND propagates credentials into the canonical key. Greedy to
    # the LAST '@' (a raw '@' cannot occur in the host per RFC 3986).
    hostport = F.regexp_replace(hostport, r"^.*@", "")
    host = F.regexp_replace(hostport, r"^www\.", "")
    # DNS-rooted FQDN spelling: 'example.com.' names the same host
    host = F.regexp_replace(host, r"\.+(?=$|:)", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")  # trailing slash(es)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        pathq.contains("?"), F.regexp_replace(pathq, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    # NULL for anything that is not an absolute scheme://host URL — empty
    # strings, whitespace, relative paths, 'example.com/x'. Without this,
    # every blank url in a dirty crawl extract canonicalizes to the SAME
    # synthetic ':///' key and latest_snapshot would silently merge (and
    # drop all but one of) thousands of unrelated documents.
    return F.when(
        url.isNull() | (scheme == "") | (host == ""),
        F.lit(None).cast("string"),
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qpart))


def latest_snapshot(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Latest crawl snapshot per canonical URL.

    Output: the winning input rows, all columns preserved, plus
    ``canonical_url`` (NULL when the url was NULL/blank/not an absolute
    URL — never a fabricated key) and ``n_snapshots`` (how many fetches
    this URL had — 1 for never-re-crawled pages). Rows whose url does not
    canonicalize never compete: each passes through as its own group.

    Precondition: ``id_col`` is unique per ROW (the standard crawl-table
    shape — one row id per fetch). If re-crawls reuse the same id, the
    winner join matches every snapshot of that id and the collapse is a
    no-op for them; cross-batch same-id re-crawls are the streaming
    pipeline's job (streaming/incremental.py), not this operator's.

    Idempotent: pre-existing ``canonical_url``/``n_snapshots`` columns
    (a re-run over an already-collapsed table) are dropped and recomputed
    rather than duplicated.

    Two narrow shuffles — the key-only winner election and the id
    semi-join back — instead of one wide one: the (ts, id, url) triple
    is tens of bytes while text+html are kilobytes, so electing winners
    on the skinny projection and fetching wide rows late is the 100 TB
    shape (see module docstring).
    """
    pages = pages.drop("canonical_url", "n_snapshots")
    canon = canonical_url(F.col(url_col))
    skinny = pages.select(
        F.col(id_col).alias("_rid"),
        canon.alias("canonical_url"),
        # non-canonicalizable urls get a per-row unique GROUP key so no
        # two of them merge; the exposed canonical_url stays NULL
        F.coalesce(
            canon, F.concat(F.lit("_null_url_"), F.col(id_col).cast("string"))
        ).alias("_gkey"),
        F.col(ts_col).alias("_rts"),
    )
    winners = (
        skinny.groupBy("_gkey")
        .agg(
            F.max_by(
                F.col("_rid"), F.struct(F.col("_rts"), F.col("_rid"))
            ).alias("_rid"),
            F.count("*").alias("n_snapshots"),
            # all group members share one canonical_url (it IS the group
            # key when non-null); max() of all-NULLs stays NULL
            F.max("canonical_url").alias("canonical_url"),
        )
        .drop("_gkey")
    )
    return pages.join(
        winners.withColumnRenamed("_rid", id_col), id_col, "inner"
    )
