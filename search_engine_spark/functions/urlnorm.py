"""URL normalization + domain extraction (reference T7,
``Crawler/UrlNormalizer.java:15-57,61-82``) as a map-only Catalyst pass.

Reference semantics reproduced exactly:
* protocol and host lowercased; path/query case preserved
* default port dropped (:80 for http, :443 for https); other ports kept
* empty path -> "/"
* ``/./`` and ``segment/../`` dot-segments resolved
* query preserved, fragment removed
* domain = host without port, leading ``www.`` stripped

Portability is the spec: every expression is a built-in shared
semantically with the DuckDB oracle — no capture-group backreferences
(Spark spells them ``$1``, RE2 ``\\1``), no dialect regex classes;
port/prefix strips are length arithmetic. Dot-segment resolution runs a
FIXED number of rewrite passes (``_DOT_PASSES``), exact for paths up to
that ``..`` nesting depth — crawler URL tails are depth 1-2 in practice;
deeper paths keep their residual ``..`` segments, identically in both
engines. (The reference delegates to ``java.net.URI.normalize``, which is
unbounded; the bounded rewrite is the price of a pure-Catalyst operator.)

Scale: per-row expressions only — at 100 TB this is a map-only pass
pipelined into whatever scan feeds it (crawl-frontier dedup, visited-set
maintenance).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DOT_PASSES = 4


def _resolve_dots(path: Column) -> Column:
    for _ in range(_DOT_PASSES):
        path = F.regexp_replace(path, r"/\./", "/")
    path = F.regexp_replace(path, r"/\.$", "/")
    for _ in range(_DOT_PASSES):
        path = F.regexp_replace(path, r"/[^/]+/\.\./", "/")
    return F.regexp_replace(path, r"/[^/]+/\.\.$", "/")


def normalize_urls(df: DataFrame, url_col: str = "url",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, url_norm, domain): the reference's UrlNormalizer.normalize
    + extractDomain, vectorized. Rows that do not parse as
    ``scheme://host...`` yield NULLs (the reference returns null on
    MalformedURLException)."""
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hp0 = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    hostport = (
        F.when(
            (scheme == "http") & hp0.endswith(":80"),
            hp0.substr(F.lit(1), F.length(hp0) - 3),
        )
        .when(
            (scheme == "https") & hp0.endswith(":443"),
            hp0.substr(F.lit(1), F.length(hp0) - 4),
        )
        .otherwise(hp0)
    )
    pq = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    raw_path = F.regexp_extract(pq, r"^([^?]*)", 1)
    query = F.regexp_extract(pq, r"(\?[^#]*)", 1)  # '' when absent
    path = _resolve_dots(
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    )
    ok = (scheme != "") & (hp0 != "")
    host_only = F.regexp_extract(hostport, r"^([^:]+)", 1)
    domain = F.when(
        host_only.startswith("www."),
        host_only.substr(F.lit(5), F.length(host_only) - 4),
    ).otherwise(host_only)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(ok, F.concat(scheme, F.lit("://"), hostport, path, query))
        .alias("url_norm"),
        F.when(ok, domain).alias("domain"),
    )
