"""Sitemap parsing (operators/sitemap.py): urlset/sitemapindex rows,
namespace tolerance, malformed-XML tolerance, the robots Sitemap:
directive extraction, and the Spark fan-out kernel."""

from __future__ import annotations

from workshoop2_etl_spark.operators.sitemap import (
    parse_sitemap_xml,
    parse_sitemaps,
    sitemap_urls_from_robots,
    synthesize_sitemap,
)


def test_urlset_roundtrip():
    xml = synthesize_sitemap(
        [
            ("http://a.com/1", "2024-01-02", 0.8),
            ("http://a.com/2", None, None),
        ]
    )
    rows = parse_sitemap_xml(xml)
    assert rows == [
        ("http://a.com/1", "2024-01-02", None, 0.8, False),
        ("http://a.com/2", None, None, None, False),
    ]


def test_sitemapindex_flagged():
    xml = synthesize_sitemap(
        [("http://a.com/sitemap1.xml", "2024-02-03", None)], index=True
    )
    rows = parse_sitemap_xml(xml)
    assert rows == [
        ("http://a.com/sitemap1.xml", "2024-02-03", None, None, True)
    ]


def test_namespace_and_malformed_tolerance():
    # no namespace at all (real-world sloppy sitemaps)
    bare = "<urlset><url><loc>http://b.com/x</loc></url></urlset>"
    assert parse_sitemap_xml(bare) == [
        ("http://b.com/x", None, None, None, False)
    ]
    # versioned/unknown namespace
    ns = (
        '<urlset xmlns="http://example.org/other"><url>'
        "<loc>http://b.com/y</loc><priority>bogus</priority>"
        "</url></urlset>"
    )
    assert parse_sitemap_xml(ns) == [
        ("http://b.com/y", None, None, None, False)
    ]
    # malformed / wrong root / empty: zero rows, no raise
    assert parse_sitemap_xml("<urlset><url></urlse") == []
    assert parse_sitemap_xml("<html><body/></html>") == []
    assert parse_sitemap_xml("") == []
    assert parse_sitemap_xml(None) == []
    # url with no loc is skipped
    assert (
        parse_sitemap_xml(
            "<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>"
        )
        == []
    )


def test_robots_sitemap_directive():
    txt = (
        "# policy\n"
        "Sitemap: http://a.com/sitemap.xml\n"
        "User-agent: *\n"
        "Disallow: /x\n"
        "sitemap:http://a.com/s2.xml\n"  # case-insensitive, any position
        "Sitemap:\n"  # empty value ignored
    )
    assert sitemap_urls_from_robots(txt) == [
        "http://a.com/sitemap.xml",
        "http://a.com/s2.xml",
    ]
    assert sitemap_urls_from_robots(None) == []


def test_spark_fanout_no_shuffle(spark):
    xmls = spark.createDataFrame(
        [
            (
                "a.com",
                synthesize_sitemap(
                    [(f"http://a.com/{i}", None, None) for i in range(5)]
                ),
            ),
            (
                "b.com",
                synthesize_sitemap(
                    [("http://b.com/more.xml", None, None)], index=True
                ),
            ),
        ],
        "domain string, sitemap_xml string",
    )
    out = parse_sitemaps(xmls, "sitemap_xml", key_cols=["domain"])
    rows = out.collect()
    assert len(rows) == 6
    assert sum(r["is_index"] for r in rows) == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("+- == Initial Plan ==")[0]


def test_parse_never_raises_hypothesis():
    """Totality: arbitrary text never raises — at crawl scale a
    poison sitemap must not kill the task."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300))
    def run(s):
        rows = parse_sitemap_xml(s)
        assert isinstance(rows, list)

    run()


def test_synthesize_escapes_ampersand():
    """Regression (round-10 self-review): query strings carry '&'
    routinely — unescaped it is invalid XML the tolerant parser
    silently zero-rows. ET decodes the entity back on parse."""
    loc = "http://a.com/?a=1&b=2"
    rows = parse_sitemap_xml(synthesize_sitemap([(loc, "<2024>", None)]))
    assert rows == [(loc, "<2024>", None, None, False)]
