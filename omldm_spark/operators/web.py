"""URL canonicalization + host-level dedup over the documents table.

The other classic scrubbing pass of a web-scale pretraining pipeline
(CommonCrawl/C4/RefinedWeb-style): the same page is crawled under many raw
URL spellings — scheme case, ``www.`` prefixes, default ports, tracking
query parameters (``utm_*``, ``ref``, ``fbclid``, ``gclid``), fragments,
trailing slashes — and URL-level dedup only works after all of them
collapse to one canonical form.  Canonicalization here is a pure Catalyst
expression chain (regexp extracts + a higher-order array filter over query
parameters) — zero Python, zero shuffles: at 100 TB this is a map-only
pass that pipelines into the scan, and the dedup itself is one hash
groupBy on the canonical string (map-side combine collapses per-partition
repeats before the shuffle; a genuinely viral hot URL only ever ships one
partial count per partition, so no salting is needed for COUNT-shaped
rollups).

The synthetic documents table has no URL column, so the operator plants
deterministic raw URLs keyed by ``doc_id`` first — the operators/pii.py
plant discipline — including multiple raw spellings that canonicalize to
the SAME target, so the oracle checks real collapse behavior, not a no-op.

Canonicalization rules (applied in order, each mirrored verbatim in the
DuckDB oracle; regexes stay in the shared Java-regex/RE2 subset):

1. drop the ``#fragment``
2. lowercase the scheme and host; strip a leading ``www.``
3. strip the scheme's default port (``:80`` for http, ``:443`` for https)
4. drop tracking query parameters: ``utm_*``, ``ref``, ``fbclid``,
   ``gclid`` (parameter ORDER is otherwise preserved — full re-sorting
   changes semantics for duplicate keys and servers that care; dropping
   only known-tracking params is the conservative standard)
5. strip trailing slashes from the path; an empty path becomes ``/``

Reference scope note: OMLDM has no web/url surface (numeric payloads only,
DataPointParser.scala:17-47); this operator is part of the
beyond-reference LLM-pipeline charter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters dropped during canonicalization (anchored key match)
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|ref|fbclid|gclid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def canonical_url(u: Column) -> Column:
    """Canonical form of a raw URL as one Catalyst expression chain.

    Case folding applies to the scheme and the HOST only: any userinfo
    (``user:pass@``) in the authority is split off first and preserved
    verbatim (RFC 3986 §6.2.2.1 — only scheme and host are
    case-insensitive).  Input with no ``scheme://`` passes through
    UNCHANGED — canonicalization is defined for absolute URLs; mangling
    a relative reference into ``'://...'`` loses the original (review
    r9)."""
    nofrag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    authority = F.regexp_extract(nofrag, _HOSTPORT_RE, 1)
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(authority, r"^.*@", ""))
    nowww = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(nowww, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(nowww, ":443$", ""))
        .otherwise(nowww)
    )
    rest = F.regexp_extract(nofrag, _REST_RE, 1)
    rawpath = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    p1 = F.when(rawpath == "", F.lit("/")).otherwise(
        F.regexp_replace(rawpath, "/+$", ""))
    path = F.when(p1 == "", F.lit("/")).otherwise(p1)
    keep = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    q2 = F.array_join(keep, "&")
    canon = F.concat(
        scheme, F.lit("://"), userinfo, host, path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )
    return F.when(scheme == "", u).otherwise(canon)


def CANONICAL_URL_SQL(u: str) -> str:
    """The same chain over expression ``u`` in DuckDB (RE2) — every rule
    in the same order with the same regexes, including the userinfo
    split (preserved verbatim, only the host case-folds) and the
    schemeless passthrough."""
    nofrag = f"regexp_replace({u}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '{_SCHEME_RE}', 1))"
    authority = f"regexp_extract({nofrag}, '{_HOSTPORT_RE}', 1)"
    userinfo = f"regexp_extract({authority}, '^(.*@)', 1)"
    hostport = f"lower(regexp_replace({authority}, '^.*@', ''))"
    nowww = f"regexp_replace({hostport}, '^www\\.', '')"
    host = f"""CASE
      WHEN {scheme} = 'http' THEN regexp_replace({nowww}, ':80$', '')
      WHEN {scheme} = 'https' THEN regexp_replace({nowww}, ':443$', '')
      ELSE {nowww} END"""
    rest = f"regexp_extract({nofrag}, '{_REST_RE}', 1)"
    rawpath = f"regexp_extract({rest}, '^([^?]*)', 1)"
    query = f"regexp_extract({rest}, '^[^?]*\\?(.*)$', 1)"
    p1 = f"""CASE WHEN {rawpath} = '' THEN '/'
      ELSE regexp_replace({rawpath}, '/+$', '') END"""
    path = f"CASE WHEN ({p1}) = '' THEN '/' ELSE ({p1}) END"
    # coalesce: DuckDB's array_to_string of an EMPTY list is NULL where
    # Spark's array_join is '' — uncoalesced it nulled the whole concat
    q2 = (f"coalesce(array_to_string(list_filter(string_split({query}, "
          f"'&'), x -> x <> '' AND NOT regexp_matches(x, "
          f"'{TRACKING_PARAM_RE}')), '&'), '')")
    return f"""(CASE WHEN {scheme} = '' THEN {u}
      ELSE {scheme} || '://' || ({userinfo}) || ({host}) || ({path})
      || CASE WHEN ({q2}) = '' THEN '' ELSE '?' || ({q2}) END END)"""


def host_of(canon: Column) -> Column:
    """Host(:port) of a CANONICAL url — authority minus any userinfo.
    Every host-keyed rollup (report / quota / blocklist) keys on this,
    so a ``user@host`` authority still groups under ``host``."""
    return F.regexp_replace(
        F.regexp_extract(canon, _HOSTPORT_RE, 1), r"^.*@", "")


def HOST_OF_SQL(canon: str) -> str:
    return (f"regexp_replace(regexp_extract({canon}, "
            f"'{_HOSTPORT_RE}', 1), '^.*@', '')")


def plant_urls(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic raw URLs keyed by doc_id: every doc carries two raw
    spellings of ONE canonical page (scheme case, www, default port,
    utm/fragment noise vs the plain form) plus, for every 4th doc, a CDN
    asset URL with a :443 port and a ``ref`` tracking param.  Output one
    row per (doc_id, url) — already exploded."""
    d = F.col(id_col)
    site = (d % 20).cast("string")
    pg = (d % 7).cast("string")
    qid = (d % 13).cast("string")
    u1 = F.concat(
        F.lit("HTTP://WWW.Site"), site, F.lit(".Example.COM:80/path/"),
        pg, F.lit("/?utm_source=feed&id="), qid,
        F.lit("&utm_campaign=x#frag"))
    u2 = F.concat(
        F.lit("http://site"), site, F.lit(".example.com/path/"), pg,
        F.lit("?id="), qid)
    u3 = F.concat(
        F.lit("https://cdn.example.com:443/assets/img"),
        (d % 5).cast("string"), F.lit(".png?ref=home"))
    urls = F.when(d % 4 == 0, F.array(u1, u2, u3)).otherwise(
        F.array(u1, u2))
    return docs.select(
        d.cast("long").alias(id_col), F.explode(urls).alias("url"))


def PLANT_URLS_SQL(table: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB mirror of plant_urls: identical raw URL rows."""
    return f"""
SELECT CAST({id_col} AS BIGINT) AS {id_col}, unnest(
  CASE WHEN {id_col} % 4 = 0 THEN [u1, u2, u3] ELSE [u1, u2] END) AS url
FROM (
  SELECT {id_col},
    'HTTP://WWW.Site' || CAST({id_col} % 20 AS VARCHAR)
      || '.Example.COM:80/path/' || CAST({id_col} % 7 AS VARCHAR)
      || '/?utm_source=feed&id=' || CAST({id_col} % 13 AS VARCHAR)
      || '&utm_campaign=x#frag' AS u1,
    'http://site' || CAST({id_col} % 20 AS VARCHAR)
      || '.example.com/path/' || CAST({id_col} % 7 AS VARCHAR)
      || '?id=' || CAST({id_col} % 13 AS VARCHAR) AS u2,
    'https://cdn.example.com:443/assets/img'
      || CAST({id_col} % 5 AS VARCHAR) || '.png?ref=home' AS u3
  FROM {table}
)
"""


def url_canonical_dedup(urls: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Per-canonical-URL collapse report: (canon_url, n_raw_rows,
    n_raw_forms, n_docs, keep_doc).  ``keep_doc`` is the minimum doc id —
    the deterministic survivor the dedup pass would retain.  One map-only
    canonicalization + one hash groupBy; count/min aggregates partial-
    aggregate map-side, so a hot URL ships one row per partition."""
    return (
        urls.select(F.col(id_col), F.col("url"),
                    canonical_url(F.col("url")).alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw_rows"),
            F.countDistinct("url").cast("long").alias("n_raw_forms"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.min(id_col).cast("long").alias("keep_doc"),
        )
    )


def URL_CANONICAL_DEDUP_SQL(table: str = "documents",
                            id_col: str = "doc_id") -> str:
    return f"""
WITH planted AS ({PLANT_URLS_SQL(table, id_col)})
SELECT {CANONICAL_URL_SQL('url')} AS canon_url,
       CAST(count(*) AS BIGINT) AS n_raw_rows,
       CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms,
       CAST(count(DISTINCT {id_col}) AS BIGINT) AS n_docs,
       CAST(min({id_col}) AS BIGINT) AS keep_doc
FROM planted
GROUP BY 1
"""


def url_host_report(urls: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-host rollup after canonicalization: (host, n_urls,
    n_canon_urls, n_docs) — the crawl-frontier / per-domain quota view
    (domain caps are the standard anti-spam lever in web-corpus
    curation).  Same single-groupBy shape as the dedup report."""
    canon = canonical_url(F.col("url"))
    host = host_of(canon)
    return (
        urls.select(F.col(id_col), host.alias("host"),
                    canon.alias("canon_url"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("canon_url").cast("long").alias("n_canon_urls"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
        )
    )


def URL_HOST_REPORT_SQL(table: str = "documents",
                        id_col: str = "doc_id") -> str:
    canon = CANONICAL_URL_SQL("url")
    return f"""
WITH planted AS ({PLANT_URLS_SQL(table, id_col)}),
canon AS (
  SELECT {id_col}, {canon} AS canon_url FROM planted
)
SELECT {HOST_OF_SQL('canon_url')} AS host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT canon_url) AS BIGINT) AS n_canon_urls,
       CAST(count(DISTINCT {id_col}) AS BIGINT) AS n_docs
FROM canon
GROUP BY 1
"""


def host_quota_sample(urls: DataFrame, quota: int = 8,
                      id_col: str = "doc_id") -> DataFrame:
    """Per-host page quota after canonicalization: keep at most ``quota``
    DISTINCT canonical pages per host, selected by the engine-identical
    md5 order — the anti-spam lever of web-corpus curation (one link-farm
    domain otherwise floods the corpus; C4 capped pages per domain for
    exactly this reason).  Composition of canonical_url with the
    cap_key_degree discipline (operators/corpus.py): distinct
    (host, canon_url) pairs -> one keyed row_number window -> filter.
    Returns (host, canon_url, n_docs) for the kept pages.

    Scale: the window partitions by host over DISTINCT pages, so a hot
    host costs its page count, not its raw crawl count — the distinct
    agg collapses recrawls map-side first."""
    from .corpus import cap_key_degree

    canon = canonical_url(F.col("url"))
    host = host_of(canon)
    pages = (
        urls.select(host.alias("host"), canon.alias("canon_url"),
                    F.col(id_col))
        .groupBy("host", "canon_url")
        .agg(F.countDistinct(id_col).cast("long").alias("n_docs"))
    )
    kept = cap_key_degree(pages, quota, key_col="host",
                          item_col="canon_url")
    return kept.select("host", "canon_url", "n_docs")


def HOST_QUOTA_SQL(quota: int = 8, table: str = "documents",
                   id_col: str = "doc_id") -> str:
    from .corpus import CAP_DEGREE_SQL

    canon = CANONICAL_URL_SQL("url")
    return f"""
WITH planted AS ({PLANT_URLS_SQL(table, id_col)}),
pages AS (
  SELECT {HOST_OF_SQL(canon)} AS host,
         {canon} AS canon_url,
         CAST(count(DISTINCT {id_col}) AS BIGINT) AS n_docs
  FROM planted
  GROUP BY 1, 2
),
kept AS ({CAP_DEGREE_SQL(quota, "pages", key="host", item="canon_url")})
SELECT k.host, k.canon_url, p.n_docs
FROM kept k JOIN pages p
  ON p.host = k.host AND p.canon_url = k.canon_url
"""


def blocklist_filter(urls: DataFrame, blocked_hosts: list[str],
                     id_col: str = "doc_id") -> DataFrame:
    """Domain-blocklist scrub: drop every URL whose canonical host is on
    the list, report per-host keep/drop counts — (host, blocked, n_urls,
    n_docs).  The blocklist is model-scale (curated lists are 1e4-1e6
    hosts): broadcast into a map-side membership check; at list sizes
    beyond broadcast this becomes a LEFT ANTI join on host, same keyed
    shape.  Here the list rides an isin literal — Catalyst compiles it
    to a hash-set probe inside the scan projection."""
    canon = canonical_url(F.col("url"))
    host = host_of(canon)
    return (
        urls.select(F.col(id_col), host.alias("host"))
        .withColumn("blocked", F.col("host").isin(blocked_hosts))
        .groupBy("host", "blocked")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
        )
    )


def BLOCKLIST_SQL(blocked_hosts: list[str], table: str = "documents",
                  id_col: str = "doc_id") -> str:
    canon = CANONICAL_URL_SQL("url")
    # escape quotes when inlining hosts as SQL literals — a host string
    # containing ' would otherwise produce malformed oracle SQL; an
    # EMPTY list must not render the malformed "IN ()" (review r10)
    inlist = ", ".join(
        "'" + h.replace("'", "''") + "'" for h in blocked_hosts)
    blocked_pred = (f"{HOST_OF_SQL(canon)} IN ({inlist})"
                    if blocked_hosts else "FALSE")
    return f"""
WITH planted AS ({PLANT_URLS_SQL(table, id_col)})
SELECT {HOST_OF_SQL(canon)} AS host,
       {blocked_pred}
         AS blocked,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT {id_col}) AS BIGINT) AS n_docs
FROM planted
GROUP BY 1, 2
"""


def url_frontier_ingest(incoming: DataFrame, existing: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Crawl-frontier admission (incremental URL dedup): an incoming URL
    batch is admitted only if its CANONICAL form is (a) new to the
    already-crawled set and (b) first within the batch (min doc id per
    canonical page).  The operators/dedup.incremental_dedup shape on
    canonical URLs: one LEFT ANTI join against the persisted canonical
    set + one canonical-keyed min — both keyed on the canonical string,
    per-batch cost O(batch + probe), never a recrawl-history scan.
    Returns (canon_url, doc_id) for the admitted URLs."""
    seen = existing.select(
        canonical_url(F.col("url")).alias("canon_url")).distinct()
    cand = incoming.select(
        F.col(id_col), canonical_url(F.col("url")).alias("canon_url"))
    fresh = cand.join(seen, "canon_url", "left_anti")
    return fresh.groupBy("canon_url").agg(
        F.min(id_col).cast("long").alias(id_col))


def URL_FRONTIER_SQL(mod: int = 3, table: str = "documents",
                     id_col: str = "doc_id") -> str:
    canon = CANONICAL_URL_SQL("url")
    return f"""
WITH planted AS ({PLANT_URLS_SQL(table, id_col)}),
canon AS (SELECT {id_col}, {canon} AS canon_url FROM planted),
seen AS (
  SELECT DISTINCT canon_url FROM canon WHERE {id_col} % {mod} != 0
),
cand AS (SELECT * FROM canon WHERE {id_col} % {mod} = 0)
SELECT c.canon_url, CAST(min(c.{id_col}) AS BIGINT) AS {id_col}
FROM cand c LEFT JOIN seen s ON s.canon_url = c.canon_url
WHERE s.canon_url IS NULL
GROUP BY 1
"""
