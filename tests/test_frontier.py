"""Frontier politeness striping (operators/frontier.py): per-domain
cap holds in every wave, ranks are deterministic, priority ordering
respected, and the plan is one window over a domain shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.frontier import frontier_waves


def _urls(spark, n=200, domains=5):
    return spark.range(n).select(
        F.concat(F.lit("d"), F.col("id") % domains).alias("domain"),
        F.concat(F.lit("http://d"), F.col("id") % domains, F.lit("/p"), F.col("id")).alias("url"),
        ((F.col("id") * 37) % 10).cast("double").alias("priority"),
    )


def test_wave_cap_holds_everywhere(spark):
    out = frontier_waves(
        _urls(spark), domain_col="domain", url_col="url", per_domain=3
    )
    per = (
        out.groupBy("domain", "wave")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per <= 3
    # every URL is scheduled exactly once
    assert out.count() == 200
    # ranks are dense 1..k per domain
    dense = (
        out.groupBy("domain")
        .agg(F.max("fetch_rank").alias("mx"), F.count("*").alias("n"))
        .where(F.col("mx") != F.col("n"))
        .count()
    )
    assert dense == 0


def test_priority_orders_within_domain(spark):
    out = frontier_waves(
        _urls(spark, n=50, domains=1),
        domain_col="domain",
        url_col="url",
        per_domain=4,
        priority_col="priority",
    ).collect()
    by_rank = sorted(out, key=lambda r: r["fetch_rank"])
    prios = [r["priority"] for r in by_rank]
    assert prios == sorted(prios, reverse=True)
    # wave striping follows the rank
    assert all(
        r["wave"] == (r["fetch_rank"] - 1) // 4 for r in by_rank
    )


def test_deterministic_across_runs(spark):
    kw = dict(domain_col="domain", url_col="url", per_domain=2)
    a = sorted(map(tuple, frontier_waves(_urls(spark), **kw).collect()))
    b = sorted(
        map(
            tuple,
            frontier_waves(
                _urls(spark).repartition(13), **kw
            ).collect(),
        )
    )
    assert a == b


def test_per_domain_validation(spark):
    with pytest.raises(ValueError):
        frontier_waves(
            _urls(spark), domain_col="domain", url_col="url", per_domain=0
        )


def test_delay_to_cap_and_per_domain_col(spark):
    """Round 11 (r10 verdict item 4): robots Crawl-delay feeds the
    per-domain wave cap. NULL delay keeps the scalar default — byte-
    identical to yesterday's behavior — while stated delays change
    wave assignment; a huge delay clamps to 1 URL/wave."""
    from pyspark.sql import functions as F

    from workshoop2_etl_spark.operators.frontier import (
        delay_to_cap,
        frontier_waves,
    )

    urls = spark.createDataFrame(
        [
            (f"{d}.com", f"http://{d}.com/p{i}", dl)
            for d, dl in [("a", None), ("b", 15.0), ("c", 99.0)]
            for i in range(6)
        ],
        "domain string, url string, crawl_delay double",
    )
    capped = urls.withColumn(
        "cap", delay_to_cap(F.col("crawl_delay"), wave_interval_sec=30.0)
    )
    out = frontier_waves(
        capped,
        domain_col="domain",
        url_col="url",
        per_domain=4,
        per_domain_col="cap",
    )
    waves = {
        (r["domain"], r["url"]): r["wave"] for r in out.collect()
    }
    # a: default cap 4 -> waves 0,0,0,0,1,1
    assert [waves[("a.com", f"http://a.com/p{i}")] for i in range(6)] == [
        0, 0, 0, 0, 1, 1,
    ]
    # b: delay 15 @ 30s interval -> cap 2 -> waves 0,0,1,1,2,2
    assert [waves[("b.com", f"http://b.com/p{i}")] for i in range(6)] == [
        0, 0, 1, 1, 2, 2,
    ]
    # c: delay 99 -> floor(30/99)=0 clamps to 1 -> one per wave
    assert [waves[("c.com", f"http://c.com/p{i}")] for i in range(6)] == [
        0, 1, 2, 3, 4, 5,
    ]
    # regression: without per_domain_col the plan is unchanged
    legacy = frontier_waves(
        urls, domain_col="domain", url_col="url", per_domain=4
    )
    lw = {(r["domain"], r["url"]): r["wave"] for r in legacy.collect()}
    assert [lw[("b.com", f"http://b.com/p{i}")] for i in range(6)] == [
        0, 0, 0, 0, 1, 1,
    ]


def test_recrawl_candidates_classification(spark):
    """new (no state row) / stale (lastmod postdates crawl) / fresh;
    unparseable lastmod never falsely stale."""
    from workshoop2_etl_spark.operators.frontier import recrawl_candidates

    disc = spark.createDataFrame(
        [
            ("u/new", "2024-01-10"),
            ("u/stale", "2024-02-01"),
            ("u/fresh", "2024-01-01"),
            ("u/garbage", "not-a-date"),
            ("u/equal", "2024-01-15"),  # same day: not stale
        ],
        "loc string, lastmod string",
    )
    state = spark.createDataFrame(
        [
            ("u/stale", "2024-01-15"),
            ("u/fresh", "2024-01-15"),
            ("u/garbage", "2024-01-15"),
            ("u/equal", "2024-01-15"),
        ],
        "url string, crawled string",
    )
    out = {
        r["loc"]: r["recrawl_reason"]
        for r in recrawl_candidates(
            disc,
            state,
            url_col="loc",
            lastmod_col="lastmod",
            state_url_col="url",
            crawled_col="crawled",
        ).collect()
    }
    assert out == {
        "u/new": "new",
        "u/stale": "stale",
        "u/fresh": "fresh",
        "u/garbage": "fresh",
        "u/equal": "fresh",
    }
