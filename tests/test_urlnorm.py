"""URL canonicalization + hash contracts (reference tests/test_parser.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcrawler.functions.urlnorm import canonicalize, host_of
from sparkcrawler.oracle import url_hash64


@pytest.mark.parametrize(
    "base,href,expected",
    [
        # reference contract: relative href absolutized (test_parser.py:16-34)
        ("https://example.com", "/page1", "https://example.com/page1"),
        ("https://example.com", "https://example.com/page2", "https://example.com/page2"),
        # north-rule canonicalization
        ("https://EXAMPLE.com:443/a", "b#frag", "https://example.com/b"),
        ("http://example.com:80/", "/x?b=2&a=1", "http://example.com/x?a=1&b=2"),
        ("http://example.com:8080/", "/x", "http://example.com:8080/x"),
        (None, "HTTPS://Host.Example", "https://host.example/"),
        # javascript href survives canonicalization; host filter kills it
        ("https://example.com", "javascript:void(0)", "javascript:void(0)"),
        ("https://example.com/a/b/", "../c", "https://example.com/a/c"),
    ],
)
def test_canonicalize(base, href, expected):
    assert canonicalize(base, href) == expected


def test_canonicalize_stable():
    # canonical form is a fixpoint
    u = canonicalize("https://example.com", "/x?b=2&a=1#f")
    assert canonicalize(None, u) == u


def test_host_of():
    assert host_of("https://Example.COM:443/x") == "example.com"
    assert host_of("http://example.com:8080/x") == "example.com:8080"
    assert host_of("javascript:void(0)") == ""
    assert host_of(None) == ""


def test_xxhash64_parity_with_spark(spark):
    """The oracle's pure-Python XXH64 must equal Spark's builtin, since
    both sides sort by (depth, priority, url_hash, url)."""
    urls = [
        "https://host0.example/p/0",
        "a", "", "héllo wörld 中文",
        "x" * 7, "x" * 8, "x" * 31, "x" * 32, "x" * 100,
        "https://example.com/x?a=1&b=2",
    ]
    rows = (
        spark.createDataFrame([(u,) for u in urls], "url string")
        .select("url", F.xxhash64("url").alias("h"))
        .collect()
    )
    for row in rows:
        assert url_hash64(row["url"]) == row["h"], row["url"]


def test_canonicalize_udf_matches_python(spark):
    from sparkcrawler.functions.urlnorm import canonicalize_udf

    pairs = [
        ("https://example.com", "/page1"),
        ("https://EXAMPLE.com:443/a", "b#frag"),
        ("http://example.com:80/", "/x?b=2&a=1"),
        ("https://example.com", "javascript:void(0)"),
    ]
    df = spark.createDataFrame(pairs, "base string, href string")
    got = df.select(canonicalize_udf("base", "href").alias("c")).collect()
    assert [r["c"] for r in got] == [canonicalize(b, h) for b, h in pairs]
