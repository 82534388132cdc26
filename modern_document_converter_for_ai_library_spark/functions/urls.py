"""URL canonicalization for web-corpus pipelines (pure columns).

Standard crawl-dedup normalization (the URL-level dedup that precedes
content-level dedup in Common-Crawl-style pipelines): lowercase scheme and
host, strip the fragment, strip default ports (http:80 / https:443), drop
tracking query parameters (utm_*, gclid, fbclid) while PRESERVING the
order of the remaining ones, and normalize an empty path to '/'. Path and
query values keep their case — only authority components are
case-insensitive per RFC 3986.

Everything is regexp/higher-order-function columns — map-only, engine
portable (DuckDB mirror in queries.py's q_url_normalize oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid)="


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose into scheme/host(with port)/path/query columns."""
    u = F.regexp_replace(url, "#.*$", "")  # fragment never survives
    scheme = F.lower(F.regexp_extract(u, "^([^:/?#]+)://", 1))
    after = F.regexp_replace(u, "^[^:/?#]+://", "")
    hostport = F.lower(F.regexp_extract(after, "^([^/?#]*)", 1))
    pathq = F.substring(after, F.length(hostport) + F.lit(1), F.lit(1 << 30))
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    return {"scheme": scheme, "hostport": hostport, "path": path, "query": query}


def normalize_url_col(url: Column) -> Column:
    p = url_parts(url)
    scheme, hostport = p["scheme"], p["hostport"]
    host = (
        F.when(
            (scheme == "http") & hostport.endswith(":80"),
            F.substring(hostport, 1, F.length(hostport) - F.lit(3)),
        )
        .when(
            (scheme == "https") & hostport.endswith(":443"),
            F.substring(hostport, 1, F.length(hostport) - F.lit(4)),
        )
        .otherwise(hostport)
    )
    params = F.filter(
        F.split(p["query"], "&"),
        lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
    )
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(F.lit("")),
    )


def host_col(url: Column) -> Column:
    """Registered host (lowercased, port stripped) — the skew/grouping key
    for per-site aggregation and politeness partitioning."""
    hostport = F.lower(
        F.regexp_extract(F.regexp_replace(url, "^[^:/?#]+://", ""), "^([^/?#:]*)", 1)
    )
    return hostport
