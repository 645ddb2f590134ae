"""Robots-rules predicate (reference P7, ``Crawler/RobotsChecker.java``)
as a batch relational operator: given a URL corpus and a parsed rules
table, decide per URL whether crawling is allowed.

Reference semantics reproduced (``RobotsChecker.java:172-184``):
* rules key on the domain key ``scheme://host[:port]``
  (``getDomainKey``, ``RobotsChecker.java:103-107``)
* the MOST SPECIFIC (longest) matching path prefix wins
* no matching rule, or no rules for the domain -> allow (default-allow,
  ``RobotsChecker.java:26-28``)
* an empty-prefix rule is a domain catch-all (matches every path)

The reference fetches robots.txt per domain at crawl time with an LRU
cache; at 100 TB the same decision is a BATCH operator — a pre-parsed
rules table (domain_key, path_prefix, allow) joined against the URL
corpus. Rules tables are bounded (rules x domains, no corpus-size term),
so the join side is an explicit broadcast; the longest-prefix selection
is ONE map-side-combinable agg via an integer encoding
``length(prefix) * 2 + allow`` — equal-length matching prefixes of one
path are necessarily the same string, so max() decides by length alone
and the low bit just carries the winner's verdict (no struct-max, whose
NULL ordering differs across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES_DDL = "domain_key string, path_prefix string, allow boolean"


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, allowed): the reference's ``isAllowed`` per URL.
    ``rules`` columns: (domain_key, path_prefix, allow)."""
    url = F.col(url_col)
    scheme = F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    hostport = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    u = urls.select(
        F.col(id_col).alias("doc_id"),
        F.concat(scheme, F.lit("://"), hostport).alias("_dk"),
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
        .alias("_path"),
    )
    j = u.join(
        F.broadcast(rules),
        (F.col("_dk") == rules["domain_key"])
        & F.col("_path").startswith(rules["path_prefix"]),
        "left",
    )
    score = F.length("path_prefix") * 2 + F.col("allow").cast("int")
    return (
        j.groupBy("doc_id")
        .agg(F.max(score).alias("_best"))
        .select(
            "doc_id",
            F.coalesce(F.col("_best") % 2 == 1, F.lit(True)).alias("allowed"),
        )
    )
