"""Robots-rules predicate (functions/robots.py vs the reference's
RobotsChecker longest-prefix semantics)."""

from __future__ import annotations

from search_engine_spark.functions.robots import robots_filter


def test_robots_longest_prefix_semantics(spark):
    urls = spark.createDataFrame(
        [
            (0, "https://a.com/p1/x"),      # deny /p1 overridden by /p1/x
            (1, "https://a.com/p1/y"),      # deny /p1 wins
            (2, "https://a.com/q"),         # no matching rule -> allow
            (3, "https://b.com/anything"),  # catch-all '' deny
            (4, "https://b.com/open/x"),    # catch-all deny, /open re-allow
            (5, "https://c.com/p1/x"),      # ruleless domain -> allow
            (6, "https://a.com:8080/p1/y"), # port in domain key -> no rules
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [
            ("https://a.com", "/p1", False),
            ("https://a.com", "/p1/x", True),
            ("https://b.com", "", False),
            ("https://b.com", "/open", True),
        ],
        "domain_key string, path_prefix string, allow boolean",
    )
    got = {r["doc_id"]: r["allowed"] for r in robots_filter(urls, rules).collect()}
    assert got == {0: True, 1: False, 2: True, 3: False, 4: True,
                   5: True, 6: True}
    assert robots_filter(urls, rules).count() == urls.count()
