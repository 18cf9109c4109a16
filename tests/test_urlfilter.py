"""URL blocklist filtering (operators/urlfilter.py, SURVEY §2.9
X206): subtree semantics, prefix boundaries, entry normalization,
category tie-break, and the broadcast/shuffle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.urlfilter import (
    blocklist_filter,
    host_suffix_chain,
)


def _bl(spark, rows):
    return spark.createDataFrame(
        rows, "entry string, kind string, category string"
    )


def _urls(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )


def _cats(df):
    return {
        r["url"]: r["block_category"]
        for r in df.select("url", "block_category").collect()
    }


def test_suffix_chain(spark):
    out = spark.range(1).select(
        host_suffix_chain(F.lit("www.ads.example.com")).alias("s")
    ).collect()[0]["s"]
    assert out == [
        "www.ads.example.com",
        "ads.example.com",
        "example.com",
        "com",
    ]


def test_domain_subtree_match(spark):
    """A domain entry blocks the host itself and every subdomain —
    but never a host that merely ENDS with the same characters, and
    never a lookalike where the domain is a non-final label."""
    bl = _bl(spark, [("example.com", "domain", "ads")])
    urls = _urls(
        spark,
        [
            "http://example.com/a",
            "http://www.example.com/a",
            "http://deep.www.example.com/a",
            "http://notexample.com/a",  # char suffix, not label suffix
            "http://example.com.evil.net/a",  # domain not in final position
        ],
    )
    got = _cats(blocklist_filter(urls, bl, url_col="url", keep_blocked=True))
    assert got["http://example.com/a"] == "ads"
    assert got["http://www.example.com/a"] == "ads"
    assert got["http://deep.www.example.com/a"] == "ads"
    assert got["http://notexample.com/a"] is None
    assert got["http://example.com.evil.net/a"] is None


def test_url_prefix_boundary(spark):
    """URL entries match at path/query boundaries only: /casino
    blocks /casino, /casino/x, /casino?q — never /casino-royale, and
    never the same path on another host."""
    bl = _bl(spark, [("http://a.com/casino", "url", "gambling")])
    urls = _urls(
        spark,
        [
            "http://a.com/casino",
            "http://a.com/casino/slots",
            "http://a.com/casino?game=1",
            "http://a.com/casino-royale",
            "http://b.com/casino/slots",
        ],
    )
    got = _cats(blocklist_filter(urls, bl, url_col="url", keep_blocked=True))
    assert got["http://a.com/casino"] == "gambling"
    assert got["http://a.com/casino/slots"] == "gambling"
    assert got["http://a.com/casino?game=1"] == "gambling"
    assert got["http://a.com/casino-royale"] is None
    assert got["http://b.com/casino/slots"] is None


def test_entry_normalization(spark):
    """Messy list files load as-is: upper case, padding, and a
    tracker-param-bearing URL entry all normalize before matching."""
    bl = _bl(
        spark,
        [
            ("  EXAMPLE.COM ", "domain", "ads"),
            ("http://B.com:80/x?utm_source=feed", "url", "spam"),
        ],
    )
    urls = _urls(spark, ["http://www.example.com/a", "http://b.com/x/y"])
    got = _cats(blocklist_filter(urls, bl, url_col="url", keep_blocked=True))
    assert got["http://www.example.com/a"] == "ads"
    assert got["http://b.com/x/y"] == "spam"


def test_min_category_tiebreak(spark):
    """Multi-matches resolve to the lexicographically smallest
    category regardless of list order."""
    bl = _bl(
        spark,
        [
            ("a.com", "domain", "zz_porn"),
            ("http://www.a.com/x", "url", "ads"),
            ("www.a.com", "domain", "malware"),
        ],
    )
    urls = _urls(spark, ["http://www.a.com/x/1"])
    got = _cats(blocklist_filter(urls, bl, url_col="url", keep_blocked=True))
    assert got["http://www.a.com/x/1"] == "ads"


def test_filter_mode_and_columns(spark):
    """keep_blocked=False drops blocked rows AND the category column;
    user columns ride through untouched either way."""
    bl = _bl(spark, [("a.com", "domain", "ads")])
    urls = _urls(spark, ["http://a.com/x", "http://b.com/x"]).withColumn(
        "extra", F.lit("v")
    )
    kept = blocklist_filter(urls, bl, url_col="url")
    assert kept.columns == ["id", "url", "extra"]
    assert [r["url"] for r in kept.collect()] == ["http://b.com/x"]
    marked = blocklist_filter(urls, bl, url_col="url", keep_blocked=True)
    assert marked.count() == 2 and "block_category" in marked.columns


def test_broadcast_and_shuffle_agree(spark):
    """broadcast=True and broadcast=False produce identical output —
    the size gate changes the physical join, never the answer."""
    bl = _bl(
        spark,
        [
            ("site2.com", "domain", "ads"),
            ("http://www.site3.com/casino", "url", "gambling"),
        ],
    )
    urls = _urls(
        spark,
        [
            "http://www.site2.com/p",
            "http://www.site3.com/casino/p",
            "http://www.site4.com/p",
        ],
    )
    a = _cats(
        blocklist_filter(
            urls, bl, url_col="url", keep_blocked=True, broadcast=True
        )
    )
    b = _cats(
        blocklist_filter(
            urls, bl, url_col="url", keep_blocked=True, broadcast=False
        )
    )
    assert a == b
    assert a["http://www.site2.com/p"] == "ads"


def test_allowlist_exceptions_clear_blocks(spark):
    """allow_domain / allow_url entries match by the same subtree/
    prefix rules and clear every block on the URLs they hit — the
    shared-host false-positive escape hatch."""
    bl = _bl(
        spark,
        [
            ("sites.example.com", "domain", "adult"),
            ("sites.example.com/good", "allow_url", "ok"),
            ("bad.net", "domain", "malware"),
            ("rescued.bad.net", "allow_domain", "ok"),
        ],
    )
    urls = _urls(
        spark,
        [
            "http://sites.example.com/evil/p",      # blocked
            "http://sites.example.com/good/p",      # url exception
            "http://bad.net/x",                     # blocked
            "http://rescued.bad.net/x",             # domain exception
            "http://www.rescued.bad.net/x",         # exception subtree
        ],
    )
    got = _cats(blocklist_filter(urls, bl, url_col="url", keep_blocked=True))
    assert got["http://sites.example.com/evil/p"] == "adult"
    assert got["http://sites.example.com/good/p"] is None
    assert got["http://bad.net/x"] == "malware"
    assert got["http://rescued.bad.net/x"] is None
    assert got["http://www.rescued.bad.net/x"] is None
