"""Web-corpus URL operators: parse, canonicalize, registered domain.

Common-Crawl-style corpora key almost every curation decision on the URL:
domain quotas group by REGISTERED domain (example.co.uk, not
deep.sub.example.co.uk), dedup wants tracking-parameter-insensitive
canonical URLs, and provenance filters match on scheme/host.  The
reference has no URL surface (its ``source`` column is an opaque string,
/root/reference/src/mcpvectordb/ingestor.py); these are the
beyond-reference web-scale extensions.

Everything here is pure ``pyspark.sql.functions`` expressions — regexp
extracts, array sort/filter — that stay inside whole-stage codegen (no
UDF, no shuffle: URL work is a projection), and every operator has a
bit-exact DuckDB oracle twin in the catalog.  The regex subset used
(character classes, alternation, anchors) behaves identically under Java
regex and RE2.

Registered-domain extraction uses a compact embedded multi-label-suffix
list (the high-traffic subset of the Mozilla Public Suffix List) rather
than the full 9k-entry PSL: the list rides the plan as a literal array —
at 100 TB the full PSL would ship the same way (kilobytes in the task
closure), so the shape does not change, only the constant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# High-traffic multi-label public suffixes (Mozilla PSL subset).  A host
# whose last TWO labels match gets a three-label registered domain.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.kr", "co.za", "co.nz",
)

# Query parameters that carry tracking state, not content identity
# (Google Analytics utm_*, click ids, common referrer tags).
TRACKING_PREFIXES = ("utm_", "gclid", "fbclid", "msclkid", "mc_eid", "ref")

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_parts(url: Column) -> Column:
    """Parse a URL into a struct (scheme, host, port, path, query,
    fragment) with pure regexp extracts — six independent codegen
    expressions over the same string, no UDF.

    Missing pieces come back as empty strings (regexp_extract's no-match
    contract in both Spark and DuckDB), which downstream expressions test
    with ``!= ''`` — never NULL-propagating surprises."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    fragment = F.regexp_extract(url, r"#(.*)$", 1)
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        path.alias("path"),
        query.alias("query"),
        fragment.alias("fragment"),
    )


def registered_domain(host: Column) -> Column:
    """example.co.uk for deep.sub.example.co.uk — last two labels, or last
    three when the two-label tail is a known public suffix.  Hosts with
    fewer labels than that pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tail2 = F.concat_ws(".", F.slice(labels, -2, 2))
    tail3 = F.concat_ws(".", F.slice(labels, -3, 3))
    is_multi = tail2.isin(*MULTI_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), tail3)
        .otherwise(tail2)
    )


def _kept_params_sorted(query: Column) -> Column:
    """Query params minus tracking params, sorted for canonical order."""
    params = F.filter(F.split(query, "&"), lambda p: p != "")

    def is_tracking(p: Column) -> Column:
        key = F.regexp_extract(p, r"^([^=]*)", 1)
        cond = F.lit(False)
        for t in TRACKING_PREFIXES:
            cond = cond | key.startswith(t)
        return cond

    return F.array_sort(F.filter(params, lambda p: ~is_tracking(p)))


def normalize_url(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, default ports stripped,
    tracking params removed and the survivors sorted, fragment dropped,
    empty path → '/'.  One projection — the whole pipeline inlines into a
    single codegen expression tree."""
    p = url_parts(url)
    scheme, host, port = p["scheme"], p["host"], p["port"]
    nondefault_port = (
        (port != "")
        & ~(
            ((scheme == "http") & (port == "80"))
            | ((scheme == "https") & (port == "443"))
        )
    )
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    q = F.array_join(_kept_params_sorted(p["query"]), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(nondefault_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def url_features(df: DataFrame, url_col: str) -> DataFrame:
    """Per-row URL curation columns: host, registered domain, canonical
    URL, and the count of tracking params stripped (an audit/quality
    signal — heavily tracked URLs skew toward syndicated content)."""
    p = url_parts(F.col(url_col))
    all_params = F.filter(F.split(p["query"], "&"), lambda x: x != "")
    kept = _kept_params_sorted(p["query"])
    return df.withColumns(
        {
            "url_host": p["host"],
            "url_domain": registered_domain(p["host"]),
            "url_norm": normalize_url(F.col(url_col)),
            "n_tracking_params": (F.size(all_params) - F.size(kept)).cast("int"),
        }
    )
