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


def test_conditional_fetch_plan_modes(spark):
    """Validator presence drives the mode: ETag-only, LM-only, and
    both → conditional (verbatim echo); absent row or a state row
    with neither validator → unconditional."""
    from workshoop2_etl_spark.operators.frontier import (
        conditional_fetch_plan,
    )

    disc = spark.createDataFrame(
        [("u/both",), ("u/etag",), ("u/lm",), ("u/none",), ("u/new",)],
        "url string",
    )
    state = spark.createDataFrame(
        [
            ("u/both", '"e1"', "Mon, 15 Jan 2024 00:00:00 GMT"),
            ("u/etag", '"e2"', None),
            ("u/lm", None, "Tue, 16 Jan 2024 00:00:00 GMT"),
            ("u/none", None, None),
        ],
        "url string, etag string, last_modified string",
    )
    out = {
        r["url"]: r
        for r in conditional_fetch_plan(
            disc, state, url_col="url", state_url_col="url"
        ).collect()
    }
    assert out["u/both"]["fetch_mode"] == "conditional"
    assert out["u/both"]["if_none_match"] == '"e1"'
    assert out["u/both"]["if_modified_since"].startswith("Mon")
    assert out["u/etag"]["fetch_mode"] == "conditional"
    assert out["u/etag"]["if_modified_since"] is None
    assert out["u/lm"]["fetch_mode"] == "conditional"
    assert out["u/lm"]["if_none_match"] is None
    assert out["u/none"]["fetch_mode"] == "unconditional"
    assert out["u/new"]["fetch_mode"] == "unconditional"
    assert out["u/new"]["if_none_match"] is None


def test_classify_fetch_results_routing(spark):
    """200 stores its own payload, 304 borrows the state's, 304
    against a URL with no stored body surfaces NULL content (visible
    protocol violation), 5xx/4xx → error."""
    from workshoop2_etl_spark.operators.frontier import (
        classify_fetch_results,
    )

    results = spark.createDataFrame(
        [
            ("u/changed", 200, bytearray(b"v2")),
            ("u/same", 304, None),
            ("u/phantom304", 304, None),
            ("u/gone", 404, None),
            ("u/boom", 503, None),
        ],
        "url string, http_status int, payload binary",
    )
    state = spark.createDataFrame(
        [("u/changed", bytearray(b"v1")), ("u/same", bytearray(b"v1"))],
        "url string, payload binary",
    )
    out = {
        r["url"]: r
        for r in classify_fetch_results(
            results, state, url_col="url", state_url_col="url"
        ).collect()
    }
    assert out["u/changed"]["outcome"] == "store"
    assert bytes(out["u/changed"]["content"]) == b"v2"
    assert out["u/same"]["outcome"] == "borrow"
    assert bytes(out["u/same"]["content"]) == b"v1"
    assert out["u/phantom304"]["outcome"] == "borrow"
    assert out["u/phantom304"]["content"] is None
    assert out["u/gone"]["outcome"] == "error"
    assert out["u/boom"]["outcome"] == "error"
    assert out["u/gone"]["content"] is None


def test_validator_updates_two_wave_convergence(spark, tmp_path):
    """The full loop: plan -> classify -> validator_updates -> MERGE
    into the versioned state -> the NEXT plan fetches conditionally
    with the refreshed validators. Error rows never touch the state;
    a bare 304 keeps (not nulls) the stored validators."""
    from workshoop2_etl_spark.operators.frontier import (
        classify_fetch_results,
        conditional_fetch_plan,
        validator_updates,
    )
    from workshoop2_etl_spark.sources.versioned import (
        commit_overwrite,
        create_table,
        read_version,
    )

    table = str(tmp_path / "crawlstate")
    create_table(
        spark.createDataFrame(
            [
                ("u/a", bytearray(b"v1a"), '"ea"', "Mon, 15 Jan 2024 00:00:00 GMT", "2024-01-15"),
                ("u/b", bytearray(b"v1b"), '"eb"', "Mon, 15 Jan 2024 00:00:00 GMT", "2024-01-15"),
                ("u/c", bytearray(b"v1c"), '"ec"', "Mon, 15 Jan 2024 00:00:00 GMT", "2024-01-15"),
            ],
            "url string, payload binary, etag string, last_modified string, crawled_on string",
        ),
        table,
    )
    state = read_version(spark, table, None)
    disc = spark.createDataFrame(
        [("u/a",), ("u/b",), ("u/c",), ("u/d",)], "url string"
    )
    plan = conditional_fetch_plan(
        disc, state, url_col="url", state_url_col="url"
    )
    # wave: a changed (200, new validators), b unchanged (bare 304),
    # c errored (503), d new (200)
    results = spark.createDataFrame(
        [
            ("u/a", 200, bytearray(b"v2a"), '"fa"', "Thu, 01 Feb 2024 00:00:00 GMT"),
            ("u/b", 304, None, None, None),
            ("u/c", 503, None, None, None),
            ("u/d", 200, bytearray(b"v2d"), '"fd"', "Thu, 01 Feb 2024 00:00:00 GMT"),
        ],
        "url string, http_status int, payload binary, etag string, last_modified string",
    )
    classified = classify_fetch_results(
        plan.join(results, "url"), state,
        url_col="url", state_url_col="url",
    )
    upd = validator_updates(
        classified, url_col="url", crawled_on="2024-02-01"
    ).withColumn("crawled_on", F.col("crawled_on").cast("string"))
    # the X199 batch-upsert shape: untouched keys pass left-anti,
    # updates union in, one snapshot commit
    merged = state.join(upd, "url", "left_anti").unionByName(upd)
    commit_overwrite(merged, table)
    state2 = read_version(spark, table, None)
    got = {r["url"]: r for r in state2.collect()}
    assert bytes(got["u/a"]["payload"]) == b"v2a"
    assert got["u/a"]["etag"] == '"fa"'
    # bare 304: borrowed content kept, validators NOT nulled
    assert bytes(got["u/b"]["payload"]) == b"v1b"
    assert got["u/b"]["etag"] == '"eb"'
    assert got["u/b"]["crawled_on"] == "2024-02-01"
    # error: untouched
    assert got["u/c"]["crawled_on"] == "2024-01-15"
    # new URL inserted
    assert bytes(got["u/d"]["payload"]) == b"v2d"
    # wave 2: every stored URL now plans conditional with the
    # refreshed validators
    plan2 = {
        r["url"]: r
        for r in conditional_fetch_plan(
            disc, state2, url_col="url", state_url_col="url"
        ).collect()
    }
    assert plan2["u/a"]["if_none_match"] == '"fa"'
    assert plan2["u/d"]["fetch_mode"] == "conditional"
    assert plan2["u/b"]["if_none_match"] == '"eb"'


def test_validator_updates_store_without_validators_stores_null(spark):
    """r12 ADVICE (frontier.py:273): a 200 'store' response that
    carried NO ETag/Last-Modified must store NULL validators — NOT
    inherit the request's echoed (stale) validators — so the next
    fetch for that URL plans unconditional. Only 'borrow' rows
    coalesce onto the echoed request validators."""
    from workshoop2_etl_spark.operators.frontier import (
        classify_fetch_results,
        conditional_fetch_plan,
        validator_updates,
    )

    state = spark.createDataFrame(
        [
            ("u/a", bytearray(b"v1a"), '"ea"', "Mon, 15 Jan 2024 00:00:00 GMT"),
            ("u/b", bytearray(b"v1b"), '"eb"', "Mon, 15 Jan 2024 00:00:00 GMT"),
        ],
        "url string, payload binary, etag string, last_modified string",
    )
    disc = spark.createDataFrame([("u/a",), ("u/b",)], "url string")
    plan = conditional_fetch_plan(
        disc, state, url_col="url", state_url_col="url"
    )
    # a: content changed, 200 with NO validator headers; b: bare 304
    results = spark.createDataFrame(
        [
            ("u/a", 200, bytearray(b"v2a"), None, None),
            ("u/b", 304, None, None, None),
        ],
        "url string, http_status int, payload binary, etag string, last_modified string",
    )
    classified = classify_fetch_results(
        plan.join(results, "url"), state, url_col="url", state_url_col="url"
    )
    upd = {
        r["url"]: r
        for r in validator_updates(
            classified, url_col="url", crawled_on="2024-02-01"
        ).collect()
    }
    # 200-without-validators: fresh payload, NULL validators (NOT '"ea"')
    assert bytes(upd["u/a"]["payload"]) == b"v2a"
    assert upd["u/a"]["etag"] is None
    assert upd["u/a"]["last_modified"] is None
    # bare 304 borrow: stored validators survive
    assert upd["u/b"]["etag"] == '"eb"'
    # wall-clock fallback is refused outright
    import pytest as _pytest

    with _pytest.raises(ValueError, match="crawled_on"):
        validator_updates(classified, url_col="url")
