"""URL normalization (functions/urlnorm.py vs the reference's
UrlNormalizer.java semantics)."""

from __future__ import annotations

from search_engine_spark.functions.urlnorm import normalize_urls


def test_normalize_urls_reference_semantics(spark):
    docs = spark.createDataFrame(
        [
            (0, "HTTP://WWW.Example.COM:80/A/./b/../Docs/X?q=1&x=2#frag"),
            (1, "https://Sub.Site.ORG:443/"),
            (2, "https://site.org:8080/a/b/../../c/index.html"),
            (3, "http://example.com"),          # empty path -> "/"
            (4, "not a url"),                   # malformed -> NULLs
            (5, "ftp://Files.example.net:21/pub/./x"),  # non-default port kept
            (6, "http://h.io/p/.."),            # trailing ".." collapses
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: (r["url_norm"], r["domain"])
           for r in normalize_urls(docs).collect()}
    # lowercase scheme+host, :80 dropped, dots resolved, PATH CASE kept,
    # query kept, fragment dropped; domain strips www. and port
    assert got[0] == ("http://www.example.com/A/Docs/X?q=1&x=2", "example.com")
    assert got[1] == ("https://sub.site.org/", "sub.site.org")
    assert got[2] == ("https://site.org:8080/c/index.html", "site.org")
    assert got[3] == ("http://example.com/", "example.com")
    assert got[4] == (None, None)
    assert got[5] == ("ftp://files.example.net:21/pub/x", "files.example.net")
    assert got[6] == ("http://h.io/", "h.io")
