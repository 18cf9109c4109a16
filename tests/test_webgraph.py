"""Web-graph aggregates (operators/webgraph.py, SURVEY §2.9 X207):
anchor-profile semantics, the anchor cap, host projection, and the
PageRank composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.webgraph import anchor_stats, host_graph


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src long, dst long, anchor_text string"
    )


def test_anchor_mode_and_nulls(spark):
    """Mode breaks count ties to the smallest anchor; NULL anchors
    count toward indegree but never enter the profile."""
    e = _edges(
        spark,
        [
            (1, 10, "zeta"),
            (2, 10, "zeta"),
            (3, 10, "alpha"),
            (4, 10, "alpha"),
            (5, 10, None),
            (1, 20, None),
        ],
    )
    out = {r["dst"]: r for r in anchor_stats(e).collect()}
    r10 = out[10]
    assert r10["indegree"] == 5  # NULL-anchor edge still an edge
    assert r10["n_src"] == 5
    assert r10["top_anchor"] == "alpha"  # 2-2 tie -> lexicographic
    assert r10["top_anchor_count"] == 2
    assert r10["anchors_all"] == "alpha|zeta"
    r20 = out[20]
    assert r20["indegree"] == 1 and r20["top_anchor"] is None
    assert r20["anchors_all"] == ""


def test_anchor_cap_and_src_dedup(spark):
    """anchors_all holds at most max_anchors sorted distinct texts;
    n_src deduplicates repeat links from one page."""
    e = _edges(
        spark,
        [(1, 10, f"a{i}") for i in range(5)] + [(1, 10, "a0")],
    )
    r = anchor_stats(e, max_anchors=3).collect()[0]
    assert r["indegree"] == 6 and r["n_src"] == 1
    assert r["anchors_all"] == "a0|a1|a2"
    assert r["top_anchor"] == "a0" and r["top_anchor_count"] == 2


def test_host_graph_projection(spark):
    """Self-loops drop (or stay when asked); n_src_pages counts
    distinct source URLs, not edges."""
    e = spark.createDataFrame(
        [
            ("http://a.com/1", "http://b.com/x"),
            ("http://a.com/1", "http://b.com/y"),
            ("http://a.com/2", "http://b.com/x"),
            ("http://a.com/2", "http://a.com/3"),  # self-loop
            ("http://B.com:80/9", "http://a.com/1"),  # messy host
        ],
        "src_url string, dst_url string",
    )
    out = {
        (r["src_host"], r["dst_host"]): r for r in host_graph(e).collect()
    }
    assert set(out) == {("a.com", "b.com"), ("b.com", "a.com")}
    ab = out[("a.com", "b.com")]
    assert ab["n_links"] == 3 and ab["n_src_pages"] == 2
    assert out[("b.com", "a.com")]["n_links"] == 1
    kept = host_graph(e, drop_self=False)
    assert kept.count() == 3


def test_host_pagerank_composition(spark):
    """The host graph feeds operators/graph.py PageRank directly: a
    star (every host → hub.com) ranks the hub highest."""
    from workshoop2_etl_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [
            (f"http://s{i}.com/p{j}", "http://hub.com/x")
            for i in range(4)
            for j in range(2)
        ]
        + [("http://hub.com/x", "http://s0.com/p0")],
        "src_url string, dst_url string",
    )
    hosts = host_graph(e)
    ranks = pagerank(
        hosts.select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        ),
        iterations=5,
    )
    top = ranks.orderBy(F.desc("rank")).first()
    assert top["node"] == "hub.com"


def test_outlink_stats(spark):
    """Outdegree/external split/distinct-host count per source page;
    internal links count in outdegree but not externals."""
    from workshoop2_etl_spark.operators.webgraph import outlink_stats

    e = spark.createDataFrame(
        [
            ("http://a.com/p", "http://a.com/q"),   # internal
            ("http://a.com/p", "http://b.com/x"),
            ("http://a.com/p", "http://b.com/y"),   # same ext host
            ("http://a.com/p", "http://c.com/z"),
            ("http://solo.com/p", "http://solo.com/q"),
        ],
        "src_url string, dst_url string",
    )
    out = {r["src_url"]: r for r in outlink_stats(e).collect()}
    a = out["http://a.com/p"]
    assert a["n_outlinks"] == 4 and a["n_external"] == 3
    assert a["n_dst_hosts"] == 3  # a.com, b.com, c.com
    assert a["external_ratio"] == 0.75
    s = out["http://solo.com/p"]
    assert s["n_external"] == 0 and s["external_ratio"] == 0.0
