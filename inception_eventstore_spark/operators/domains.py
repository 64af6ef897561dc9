"""URL/domain curation for web-scraped corpora.

Web-pipeline staples (C4, RefinedWeb, Dolma): extract the URLs a
document references, reduce them to registrable hosts, aggregate
per-domain corpus statistics, and drop documents touching blocklisted
domains. All JVM regex/array expressions (the URL pattern is the PII
module's, constrained to the Java-regex ∩ RE2 dialect so the DuckDB
oracle shares it) — no Python in the path, whole-stage codegen applies.

Scale shapes: extraction is a map-side projection; domain stats shuffle
only (domain, 1) pairs with map-side combine; the blocklist filter
broadcasts the (tiny) blocklist into a semi-join against exploded
hosts, then anti-joins the matching ids back out — the corpus text
moves through map-side passes only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Shared with PII_PATTERNS ("url") — one dialect, one oracle story.
URL_PATTERN = r"https?://[^ \t\n]+"

#: host = the authority between the scheme and the first /?#, lowered,
#: with any :port and leading www. stripped.
_HOST_PATTERN = r"https?://([^/?#\s]+)"


def extract_urls(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(URL_PATTERN), 0)


def host_of(url: Column) -> Column:
    """Normalized host of one URL: lowercase, :port and www. removed."""
    host = F.lower(F.regexp_extract(url, _HOST_PATTERN, 1))
    host = F.regexp_replace(host, r":[0-9]+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def doc_domains(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, domain) — one row per DISTINCT referenced domain per doc."""
    urls = docs.select(
        F.col(id_col), extract_urls(text_col).alias("_urls")
    )
    return (
        urls.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(F.transform(F.col("_urls"), host_of))
            ).alias("domain"),
        )
        .where(F.col("domain") != "")
    )


def domain_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain corpus stats: referencing docs + total mentions."""
    urls = docs.select(
        F.col(id_col), extract_urls(text_col).alias("_urls")
    ).where(F.size("_urls") > 0)
    mentions = urls.select(
        F.col(id_col),
        F.explode(F.transform(F.col("_urls"), host_of)).alias("domain"),
    ).where(F.col("domain") != "")
    return mentions.groupBy("domain").agg(
        F.countDistinct(id_col).alias("docs"),
        F.count("*").alias("mentions"),
    )


def domain_blocklist_filter(
    docs: DataFrame,
    blocked_domains: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "domain",
) -> DataFrame:
    """Remove documents referencing ANY blocklisted domain. The
    blocklist (one ``domain`` column) is broadcast into the semi-join,
    so the corpus is never shuffled to FIND offenders; the offending-id
    anti-join is left to the planner — a blocklist that matches a large
    corpus fraction produces a bad_ids set too big to force-broadcast
    (AQE still broadcasts it when small). Documents with no URLs always
    survive."""
    blocked = blocked_domains.select(
        F.lower(F.col(domain_col)).alias("domain")
    )
    bad_ids = (
        doc_domains(docs, id_col=id_col, text_col=text_col)
        .join(F.broadcast(blocked), "domain", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(bad_ids, id_col, "left_anti")


#: Query parameters that never change content identity — the standard
#: crawl-dedup strip list (shared with the oracle verbatim).
TRACKING_PARAMS = ("utm_[^=&]*", "gclid", "fbclid", "ref", "mc_eid")


def canonical_url(url: Column) -> Column:
    """Canonical form of one URL column — the crawl-frontier dedup key
    (the same page arrives with tracking params, fragments, www,
    default ports and shuffled query orders; canonicalization collapses
    them before any hash dedup):

    - scheme + host lowercased; ``www.`` and default ``:80``/``:443``
      ports dropped;
    - fragment dropped;
    - tracking params (TRACKING_PARAMS) dropped, remaining query
      params SORTED (order never matters server-side);
    - trailing ``/`` on the path dropped (empty path ≡ "/").

    Pure JVM column algebra (regexp in the shared Java∩RE2 dialect of
    this module, array_sort/array_join for the params) — no UDF, and
    every step re-derives identically in the DuckDB oracle."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    tracking = "|".join(TRACKING_PARAMS)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(f"^({tracking})="),
    )
    qsorted = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qsorted != "", F.concat(F.lit("?"), qsorted)).otherwise(
            F.lit("")
        ),
    )


def canonical_doc_urls(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(canonical_url, n_raw, n_docs) — every URL mentioned in the
    corpus collapsed to its canonical form with raw-mention and
    distinct-doc counts: the frontier-dedup statistic. One explode +
    one partial-aggregated groupBy on the canonical string."""
    urls = docs.select(
        F.col(id_col), F.explode(extract_urls(text_col)).alias("_u")
    ).select(id_col, canonical_url(F.col("_u")).alias("canonical_url"))
    return urls.groupBy("canonical_url").agg(
        F.count("*").alias("n_raw"),
        F.countDistinct(id_col).alias("n_docs"),
    )
