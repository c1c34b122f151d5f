"""Link/text extraction contracts pinned by the reference test suite
(reference tests/test_parser.py:16-34, :104-110) + byte-identical text."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcrawler.functions.extract import (
    extract_links_py,
    extract_links_udf,
    extract_text_py,
    extract_text_udf,
    oracle_links,
)

FIXTURE_3A = (
    "<html><body>"
    '<a href="/page1">Page 1</a>'
    '<a href="https://example.com/page2">Page 2</a>'
    '<a href="https://other-domain.com/page3">Page 3</a>'
    "</body></html>"
)


def test_reference_three_anchor_fixture():
    """3 anchors, one off-domain → exactly {/page1, /page2} same-host."""
    links = oracle_links("https://example.com", FIXTURE_3A)
    assert set(links) == {
        "https://example.com/page1",
        "https://example.com/page2",
    }


def test_javascript_href_yields_no_link():
    html = "<html><a href='javascript:void(0)'>Invalid</a></html>"
    assert oracle_links("https://example.com", html) == []


def test_within_page_dedup_and_order():
    html = (
        '<a href="/b">1</a><a href="/a">2</a><a href="/b">dup</a>'
        '<a href="/c">3</a>'
    )
    links = extract_links_py("https://e.com", html)
    assert links == ["https://e.com/b", "https://e.com/a", "https://e.com/c"]


def test_anchor_without_href_ignored():
    assert extract_links_py("https://e.com", "<a name='x'>no href</a>") == []


def test_extract_text_entities_and_script_skipped():
    html = (
        "<html><head><script>var x=1;</script><style>.a{}</style></head>"
        "<body><h1>T&amp;itle</h1><p>café 中文</p></body></html>"
    )
    assert extract_text_py(html) == "T&itlecafé 中文"


def test_udfs_match_python_and_corpus_text_byte_identical(spark):
    """The Arrow UDFs must equal the pure-Python core on the synthetic
    corpus, and extracted text must be byte-identical to the corpus
    ``text`` column (BASELINE.json per-row invariant)."""
    from sparkcrawler.sources.synth import synth_pages_df

    _, pages = synth_pages_df(spark, 120, 5, with_sitemaps=False)
    got = (
        pages.withColumn("links", extract_links_udf("url", "html"))
        .withColumn("text2", extract_text_udf("html"))
        .select("url", "html", "links", "text", "text2")
        .collect()
    )
    assert len(got) == 120
    mismatches = [r["url"] for r in got if r["text2"] != r["text"]]
    assert mismatches == []
    for r in got[:25]:
        assert list(r["links"]) == extract_links_py(r["url"], bytes(r["html"]))
        assert r["text2"].encode("utf-8") == extract_text_py(bytes(r["html"])).encode("utf-8")


def test_same_host_filter_jvm_side_matches_oracle(spark):
    """JVM parse_url host filter == oracle_links same-host filter."""
    from sparkcrawler.sources.synth import synth_pages_df

    _, pages = synth_pages_df(spark, 60, 4, with_sitemaps=False)
    df = (
        pages.withColumn("links_all", extract_links_udf("url", "html"))
        .withColumn("host", F.parse_url("url", F.lit("HOST")))
        .withColumn(
            "links",
            F.filter(
                F.col("links_all"),
                lambda x: F.parse_url(x, F.lit("HOST")) == F.col("host"),
            ),
        )
        .select("url", "html", "links")
        .collect()
    )
    for r in df:
        assert list(r["links"]) == oracle_links(r["url"], bytes(r["html"])), r["url"]
