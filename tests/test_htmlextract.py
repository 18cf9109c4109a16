"""HTML main-text extraction (operators/htmlextract.py): structural
boilerplate removal, block/inline semantics, entity decoding, fixture
closed form, malformed-markup tolerance, Spark plumbing."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.htmlextract import (
    extract_text,
    html_to_text,
    synthesize_html,
)

_WS = re.compile(r"[ \t\r\n\f]+")


def test_structural_drop_vs_inline_keep():
    html = (
        "<body><nav><a href='/'>home</a><p>menu</p></nav>"
        "<p>Keep <b>bold</b> and <a href='x'>anchor</a> text.</p>"
        "<script>var s = '<p>fake</p>';</script>"
        "<footer>legal</footer></body>"
    )
    title, text, n_links = extract_text(html)
    # dropped containers vanish WITH contents (incl. their links and
    # any markup-looking strings inside script)
    assert text == "Keep bold and anchor text."
    assert n_links == 1  # only the kept region's link counts
    assert title == ""


def test_blocks_join_with_newlines_and_entities_decode():
    html = (
        "<h1>T&amp;A</h1><p>first&nbsp;block</p><p></p>"
        "<div>second &lt;tag&gt;</div>"
    )
    _, text, _ = extract_text(html)
    lines = text.split("\n")
    assert lines[0] == "T&A"
    assert lines[-1] == "second <tag>"
    # the empty <p></p> produced no block
    assert len(lines) == 3


def test_title_routes_to_title_not_body():
    html = "<head><title>  My   Page </title></head><body><h1>My Page</h1></body>"
    title, text, _ = extract_text(html)
    assert title == "My Page"
    # an h1 repeating the title is BODY text and stays
    assert text == "My Page"


def test_malformed_markup_never_raises():
    for bad in (
        "<p>unclosed <b>nested",
        "<<<>>>",
        "<script>never ends",
        "",
        None,
        "<a href=x>y</a></nav></nav></footer>",
        "&#x0; &bogus; <p attr='>broken</p>",
    ):
        title, text, n_links = extract_text(bad)
        assert isinstance(title, str) and isinstance(text, str)
        assert n_links >= 0


def test_fixture_closed_form(spark):
    """The registered query's oracle contract, checked row-by-row in
    Python: extracted text == 'Doc {id}' NL norm(text) NL link
    sentence, title == 'Doc {id}', n_links == 1."""
    docs = spark.createDataFrame(
        [
            (1, "hello  world"),
            (2, "a < b & c > d"),
            (3, ""),
            (4, " \t\n "),
            (5, "café naïve"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in html_to_text(
            synthesize_html(docs).drop("text"), "html", id_cols=["doc_id"]
        ).collect()
    }
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, r in out.items():
        norm = _WS.sub(" ", src[did] or "").strip()
        parts = [f"Doc {did}"] + ([norm] if norm else []) + [
            f"See ref {did} for details."
        ]
        assert r["title"] == f"Doc {did}"
        assert r["text"] == "\n".join(parts)
        assert r["n_links"] == 1
        assert r["text_chars"] == len(r["text"])


def test_spark_plumbing_prunes_and_scales(spark):
    """html_to_text is a pure map: no Exchange in the plan, and the
    markup column prunes away for downstream projections."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    out = html_to_text(
        synthesize_html(docs).drop("text"), "html", id_cols=["doc_id"]
    ).select("doc_id", "n_links")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("+- == Initial Plan ==")[0]
    assert out.count() == 20


def test_extract_page_links_drops_boilerplate_and_nests():
    from workshoop2_etl_spark.operators.htmlextract import (
        extract_page_links,
    )

    html = (
        "<html><body>"
        "<nav><a href='/home'>home</a></nav>"
        "<p>See <a href='http://a.com/1'>one  link</a> and "
        "<a href='http://a.com/2'>two</a>.</p>"
        "<footer><a href='/legal'>legal</a></footer>"
        "</body></html>"
    )
    assert extract_page_links(html) == [
        ("http://a.com/1", "one link"),
        ("http://a.com/2", "two"),
    ]
    # nested anchor closes the outer capture (HTML's own rule)
    nested = "<a href='/x'>outer <a href='/y'>inner</a> tail</a>"
    assert extract_page_links(nested) == [
        ("/x", "outer"),
        ("/y", "inner"),
    ]
    # anchors without href, malformed markup, empties: tolerated
    assert extract_page_links("<a name='x'>no href</a>") == []
    assert extract_page_links("<a href='/z'>unclosed") == [("/z", "unclosed")]
    assert extract_page_links("") == []
    assert extract_page_links(None) == []


def test_extract_links_to_pagerank_composition(spark):
    """Crawl chapter meets graph chapter: pages -> extract_links ->
    RELATIVE hrefs resolved against each page's base URI
    (resolve_href, round 11) -> edge list -> bit-reproducible
    PageRank; the hub of each group must outrank its spokes."""
    from pyspark.sql import functions as F

    from workshoop2_etl_spark.functions.urls import (
        normalize_url,
        resolve_href,
    )
    from workshoop2_etl_spark.operators.graph import pagerank_fixed_point
    from workshoop2_etl_spark.operators.htmlextract import extract_links

    n = 21  # three 7-groups
    pages = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("http://s.com/dir/page"), F.col("id")
        ).alias("base_uri"),
        F.concat(
            F.lit("<body><nav><a href='/no'>x</a></nav><p>"
                  "<a href='../page"),  # relative: needs the base URI
            F.expr("7 * (id div 7)").cast("string"),
            F.lit("#frag'>hub</a></p></body>"),
        ).alias("html"),
    )
    edges = extract_links(
        pages, "html", id_cols=["doc_id", "base_uri"]
    ).select(
        F.col("doc_id").alias("src"),
        F.regexp_extract(
            normalize_url(resolve_href(F.col("base_uri"), F.col("href"))),
            r"^http://s\.com/page(\d+)$",
            1,
        )
        .try_cast("long")
        .alias("dst"),
    ).where(F.col("dst").isNotNull())
    assert edges.count() == n  # nav links excluded, one edge per page
    ranks = pagerank_fixed_point(edges, iterations=3)
    r = {row[0]: row[1] for row in ranks.collect()}
    for hub in (0, 7, 14):
        spokes = [r[i] for i in range(hub + 1, hub + 7) if i in r]
        assert all(r[hub] > s for s in spokes)


def test_extract_jsonld_blocks_and_negatives(spark):
    """X228: both quote styles match, block order is stable, the
    type-less boilerplate script and non-ld types never match, and
    a page with no blocks keeps one NULL row (posexplode_outer)."""
    from workshoop2_etl_spark.operators.htmlextract import extract_jsonld

    rows = [
        (
            1,
            '<html><head><script>var x = "<p>no</p>";</script></head>'
            '<body><script type="application/ld+json">{"a":1}</script>'
            "<p>t</p>"
            "<script type='application/ld+json'>{\"b\":2}</script>"
            '<script type="text/javascript">{"c":3}</script>'
            "</body></html>",
        ),
        (2, "<html><body><p>nothing structured</p></body></html>"),
        (
            3,
            '<script TYPE = "application/ld+json">\n{"multi":\n"line"}\n'
            "</SCRIPT>",
        ),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        (r["doc_id"], r["ld_no"]): r["ld_json"]
        for r in extract_jsonld(df, "html", id_cols=["doc_id"]).collect()
    }
    assert got[(1, 0)] == '{"a":1}'
    assert got[(1, 1)] == '{"b":2}'
    assert (1, 2) not in got  # text/javascript is not JSON-LD
    assert got[(2, None)] is None  # blockless page keeps its row (NULL pos)
    assert "multi" in got[(3, 0)]  # case-insensitive tag + multiline body


def test_page_directives_tokens_orders_and_decoys(spark):
    """X231: both attribute orders and quote styles parse; token
    matching never fires 'noindex' on 'index'; description metas and
    stylesheet links never match; absent directives are FALSE/NULL."""
    from workshoop2_etl_spark.operators.htmlextract import page_directives

    rows = [
        (1, '<meta name="robots" content="noindex, nofollow"><p>a</p>'),
        (2, "<meta content='nofollow' name='robots'>"),
        (3, '<meta name="robots" content="index, follow">'),
        (4, '<meta name="description" content="noindex nofollow">'),
        (5, '<link href="https://c.example/x" rel="canonical">'),
        (6, '<link rel="canonical" href="https://c.example/y">'),
        (7, '<link rel="stylesheet" href="style.css"><p>plain</p>'),
        (8, '<META NAME="ROBOTS" CONTENT="NOINDEX">'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r["doc_id"]: r
        for r in page_directives(df, "html", id_cols=["doc_id"]).collect()
    }
    assert got[1]["robots_noindex"] and got[1]["robots_nofollow"]
    assert not got[2]["robots_noindex"] and got[2]["robots_nofollow"]
    assert not got[3]["robots_noindex"] and not got[3]["robots_nofollow"]
    assert not got[4]["robots_noindex"]  # description meta never counts
    assert got[5]["canonical_url"] == "https://c.example/x"
    assert got[6]["canonical_url"] == "https://c.example/y"
    assert got[7]["canonical_url"] is None
    assert not got[7]["robots_noindex"]
    assert got[8]["robots_noindex"]  # case-insensitive everywhere
