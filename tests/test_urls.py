"""URL canonicalization (functions/urls.py): rule-by-rule cases,
NULL/non-URL passthrough, multi-label public suffixes, and the
no-Python-plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from workshoop2_etl_spark.functions.urls import (
    host_of,
    normalize_url,
    registrable_domain,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["n"]
        for r in df.select(normalize_url(F.col("url")).alias("n")).collect()
    ]


def test_normalization_rules(spark):
    cases = [
        # case, default port, dup slashes, trailing slash, trackers,
        # param sort, fragment — all at once
        (
            "HTTP://WWW.Example.COM:80/path//to/page/?utm_source=x&b=2&a=1#f",
            "http://www.example.com/path/to/page?a=1&b=2",
        ),
        ("https://Host.org:443/", "https://host.org"),
        # non-default port survives
        ("https://host.org:8443/x/", "https://host.org:8443/x"),
        # exact-name trackers drop; params sort byte-wise
        ("http://x.com/q?gclid=9&z=1&y=2", "http://x.com/q?y=2&z=1"),
        # all params tracked -> '?' drops entirely
        ("http://x.com/?utm_a=1&fbclid=2", "http://x.com"),
        ("  http://x.com  ", "http://x.com"),
    ]
    got = _norm(spark, [c[0] for c in cases])
    assert got == [c[1] for c in cases]


def test_non_url_and_null_passthrough(spark):
    got = _norm(spark, ["not a url", "   padded   ", None])
    assert got == ["not a url", "padded", None]


def test_idempotent(spark):
    urls = [
        "HTTP://A.B:80/c//d/?utm_x=1&b=2&a=1#z",
        "https://x.co.uk/",
    ]
    once = _norm(spark, urls)
    twice = _norm(spark, once)
    assert once == twice


def test_registrable_domain_branches(spark):
    df = spark.createDataFrame(
        [
            ("http://www.bbc.co.uk/news",),
            ("http://deep.sub.example.com/",),
            ("http://example.org/",),
            ("http://localhost/",),
        ],
        "url string",
    )
    got = [
        (r["h"], r["d"])
        for r in df.select(
            host_of(F.col("url")).alias("h"),
            registrable_domain(F.col("url")).alias("d"),
        ).collect()
    ]
    assert got == [
        ("www.bbc.co.uk", "bbc.co.uk"),  # multi-label suffix -> 3 labels
        ("deep.sub.example.com", "example.com"),
        ("example.org", "example.org"),
        ("localhost", "localhost"),  # single label passes through
    ]


def test_plan_is_pure_jvm(spark):
    df = spark.range(10).select(
        F.concat(F.lit("http://h"), F.col("id"), F.lit(".com/p/")).alias(
            "url"
        )
    )
    out = df.select(
        normalize_url(F.col("url")), registrable_domain(F.col("url"))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan.split(
        "+- == Initial Plan =="
    )[0]


def test_resolve_href_rfc3986_forms(spark):
    """RFC 3986 §5 relative resolution (round 11): every href form
    crawled HTML actually contains, composed with normalize_url to
    the canonical edge target."""
    from workshoop2_etl_spark.functions.urls import resolve_href

    cases = [
        # (base, href, expected canonical)
        ("http://www.s.com/dir/page5", "../page3", "http://www.s.com/page3"),
        ("http://www.s.com/dir/page5", "./page3", "http://www.s.com/dir/page3"),
        ("http://www.s.com/dir/page5", "page3", "http://www.s.com/dir/page3"),
        ("http://www.s.com/dir/page5", "/page3", "http://www.s.com/page3"),
        ("http://www.s.com/dir/page5", "/a/../page3", "http://www.s.com/page3"),
        ("http://www.s.com/page5", "../../x", "http://www.s.com/x"),  # root pop guard
        ("http://www.s.com/page5", "//cdn.com/x", "http://cdn.com/x"),
        ("https://s.com/p", "//cdn.com/x", "https://cdn.com/x"),
        ("http://www.s.com/page5", "?q=1", "http://www.s.com/page5?q=1"),
        ("http://www.s.com/page5", "#frag", "http://www.s.com/page5"),
        ("http://www.s.com/page5", "", "http://www.s.com/page5"),
        ("http://www.s.com/page5", "mailto:a@b.c", "mailto:a@b.c"),
        ("http://www.s.com/page5", "https://o.com/x?utm_source=z#f", "https://o.com/x"),
        ("http://www.s.com/a/b/c", "../d/./e", "http://www.s.com/a/d/e"),
        ("http://www.s.com/a/b/c", "d/e?fbclid=1&q=2", "http://www.s.com/a/b/d/e?q=2"),
    ]
    df = spark.createDataFrame(cases, "base string, href string, expect string")
    out = df.select(
        "expect",
        normalize_url(resolve_href(F.col("base"), F.col("href"))).alias("got"),
    )
    assert all(r["got"] == r["expect"] for r in out.collect())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure column expressions, no UDF
