"""robots.txt parsing + relational admission (operators/robots.py):
RFC 9309 group selection, precedence, default-allow, wildcard
refusal, and the no-match-rules-must-not-eliminate-URLs regression."""

from __future__ import annotations

from workshoop2_etl_spark.operators.robots import (
    parse_robots,
    parse_robots_text,
    robots_filter,
)

_TXT = (
    "# crawl policy\n"
    "User-agent: BadBot\nDisallow: /\n\n"
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/pub/\n"
    "Disallow: /tmp\n"
    "Disallow: /wild/*/no\n"  # wildcard rule, kept (round 10)
    "Allow: /end$\n"          # $-anchored rule, kept (round 10)
    "Disallow:\n"             # empty Disallow = allow-all, no rule
)


def test_parser_groups_and_refusals():
    assert parse_robots_text(_TXT, "*") == [
        ("/private/", False),
        ("/private/pub/", True),
        ("/tmp", False),
        ("/wild/*/no", False),
        ("/end$", True),
    ]
    assert parse_robots_text(_TXT, "BadBot") == [("/", False)]
    # unknown agent falls back to the * group
    assert parse_robots_text(_TXT, "GoodBot") == parse_robots_text(
        _TXT, "*"
    )
    assert parse_robots_text(None) == []
    assert parse_robots_text("") == []
    # stacked User-agent lines share one directive group
    stacked = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_text(stacked, "b") == [("/x", False)]


def test_relational_admission_decision(spark):
    robots = spark.createDataFrame(
        [
            ("d1.com", _TXT),
            ("d2.com", "User-agent: *\nDisallow: /\nAllow: /ok/\n"),
        ],
        "domain string, robots_txt string",
    )
    rules = parse_robots(robots, "robots_txt", key_cols=["domain"])
    urls = spark.createDataFrame(
        [
            (1, "d1.com", "/private/page"),      # prefix deny
            (2, "d1.com", "/private/pub/page"),  # longer Allow wins
            (3, "d1.com", "/open/page"),         # rules exist, none match
            (4, "d2.com", "/anything"),          # denied by /
            (5, "d2.com", "/ok/page"),           # Allow longer than /
            (6, "d3.com", "/whatever"),          # domain has no rules
        ],
        "uid long, domain string, path string",
    )
    out = robots_filter(
        urls,
        rules,
        url_key="uid",
        path_col="path",
        join_on="domain",
        keep_denied=True,
    )
    got = {r["uid"]: r["allowed"] for r in out.collect()}
    assert got == {
        1: False,
        2: True,
        3: True,  # the no-match default-allow regression case
        4: False,
        5: True,
        6: True,
    }
    kept = sorted(
        r["uid"]
        for r in robots_filter(
            urls, rules, url_key="uid", path_col="path", join_on="domain"
        ).collect()
    )
    assert kept == [2, 3, 5, 6]


def _tiny_fixture(spark):
    robots = spark.createDataFrame(
        [("d.com", "User-agent: *\nDisallow: /x\n")],
        "domain string, robots_txt string",
    )
    rules = parse_robots(robots, "robots_txt", key_cols=["domain"])
    urls = spark.createDataFrame(
        [(1, "d.com", "/x/1"), (2, "d.com", "/ok"), (3, "e.com", "/x/2")],
        "uid long, domain string, path string",
    )
    return urls, rules


def test_rules_join_broadcast_gate(spark):
    """broadcast=True hints the join; broadcast=False (the big-rules
    crawl regime) plans a shuffle join on the domain key and returns
    IDENTICAL rows; default auto-gates on Catalyst's size estimate —
    a mapInPandas rules plan has no stats, so auto takes the safe
    non-broadcast path rather than forcing a whole-crawl broadcast."""
    urls, rules = _tiny_fixture(spark)
    kw = dict(
        url_key="uid", path_col="path", join_on="domain", keep_denied=True
    )
    forced = robots_filter(urls, rules, broadcast=True, **kw)
    plan_b = forced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b or "BroadcastNestedLoop" in plan_b

    shuffled = robots_filter(urls, rules, broadcast=False, **kw)
    plan_s = shuffled._jdf.queryExecution().executedPlan().toString()
    head_s = plan_s.split("+- == Initial Plan ==")[0]
    assert "BroadcastHashJoin" not in head_s
    assert "SortMergeJoin" in head_s or "ShuffledHashJoin" in head_s

    rows_b = sorted(map(tuple, forced.collect()))
    rows_s = sorted(map(tuple, shuffled.collect()))
    assert rows_b == rows_s and len(rows_b) == 3

    auto = robots_filter(urls, rules, **kw)
    plan_a = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_a.split(
        "+- == Initial Plan =="
    )[0]
    assert sorted(map(tuple, auto.collect())) == rows_b


def test_rule_to_regex_compilation():
    from workshoop2_etl_spark.operators.robots import rule_to_regex

    assert rule_to_regex("/plain/prefix") is None  # startswith path
    assert rule_to_regex("/a/*/b") == r"^/a/.*/b"
    assert rule_to_regex("/end$") == r"^/end$"
    assert rule_to_regex("/f*.php$") == r"^/f.*\.php$"
    # $ not at the end is a literal octet per the RFC
    assert rule_to_regex("/a$b*") == r"^/a\$b.*"


def test_wildcard_rules_admission(spark):
    """RFC 9309 wildcard semantics end-to-end: * spans path segments,
    $ anchors the end, precedence still longest-rule-then-Allow, and
    a wildcard Disallow is no longer silently dropped (the round-9
    gap: 'Disallow: /private*' used to admit everything)."""
    robots = spark.createDataFrame(
        [
            (
                "d.com",
                "User-agent: *\n"
                "Disallow: /private*\n"
                "Allow: /private-ok/\n"
                "Disallow: /*.pdf$\n",
            )
        ],
        "domain string, robots_txt string",
    )
    rules = parse_robots(robots, "robots_txt", key_cols=["domain"])
    urls = spark.createDataFrame(
        [
            (1, "d.com", "/private/page"),       # wildcard deny
            (2, "d.com", "/private-extra/x"),    # /private* spans it
            (3, "d.com", "/private-ok/x"),       # longer Allow wins
            (4, "d.com", "/docs/file.pdf"),      # $-anchored deny
            (5, "d.com", "/docs/file.pdfx"),     # $ fails -> allowed
            (6, "d.com", "/open/page.html"),     # no rule matches
        ],
        "uid long, domain string, path string",
    )
    out = robots_filter(
        urls,
        rules,
        url_key="uid",
        path_col="path",
        join_on="domain",
        keep_denied=True,
        broadcast=True,
    )
    got = {r["uid"]: r["allowed"] for r in out.collect()}
    assert got == {
        1: False,
        2: False,
        3: True,
        4: False,
        5: True,
        6: True,
    }


def test_urls_carrying_rule_named_columns_survive(spark):
    """Regression (r10 ADVICE): a urls frame that itself carries
    rule_path / allow / rule_regex columns must neither make the
    rules join ambiguous nor lose those user columns to the final
    drop() — the rules side now joins under reserved __rule_*
    names."""
    robots = spark.createDataFrame(
        [("d.com", "User-agent: *\nDisallow: /private/\n")],
        "domain string, robots_txt string",
    )
    rules = parse_robots(robots, "robots_txt", key_cols=["domain"])
    urls = spark.createDataFrame(
        [
            (1, "d.com", "/private/x", "user-rp", True, "user-rx"),
            (2, "d.com", "/open/x", "user-rp2", False, None),
        ],
        "uid long, domain string, path string, "
        "rule_path string, allow boolean, rule_regex string",
    )
    out = robots_filter(
        urls,
        rules,
        url_key="uid",
        path_col="path",
        join_on="domain",
        keep_denied=True,
    )
    rows = {r["uid"]: r for r in out.collect()}
    assert rows[1]["allowed"] is False and rows[2]["allowed"] is True
    # user columns pass through untouched
    assert rows[1]["rule_path"] == "user-rp"
    assert rows[1]["allow"] is True
    assert rows[1]["rule_regex"] == "user-rx"
    assert rows[2]["rule_path"] == "user-rp2"


def test_broadcast_gate_parses_spark_byte_strings(spark):
    """Regression (r10 ADVICE): the auto-gate threshold is parsed by
    Spark's own JavaUtils.byteStringAsBytes — '10MB' is 10*1024**2,
    not 10_000_000, and bare-integer strings still work."""
    jvm = spark._jvm
    parse = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes
    assert int(parse("10MB")) == 10 * 1024 * 1024
    assert int(parse("10485760")) == 10485760
    assert int(parse("1g")) == 1024**3
    # and the gate still broadcasts a tiny rules frame under the
    # default threshold when stats are available (parquet-backed
    # frames have size estimates; createDataFrame ones may not, so
    # this only asserts the no-exception path end-to-end)
    urls, rules = _tiny_fixture(spark)
    out = robots_filter(
        urls,
        rules,
        url_key="uid",
        path_col="path",
        join_on="domain",
        keep_denied=True,
    )
    assert out.count() == 3


def test_crawl_delay_parsing():
    """Round 11: Crawl-delay per group — integral, fractional,
    malformed (ignored), negative (ignored), group selection matches
    the directive rules (exact agent group shadows *)."""
    from workshoop2_etl_spark.operators.robots import crawl_delay_text

    txt = (
        "User-agent: fastbot\nCrawl-delay: 0.5\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 10\nDisallow: /y\n"
    )
    assert crawl_delay_text(txt, "fastbot") == 0.5
    assert crawl_delay_text(txt, "*") == 10.0
    assert crawl_delay_text(txt, "unknown") == 10.0
    # agent group exists but states no delay: no fallback to *
    txt2 = (
        "User-agent: quiet\nDisallow: /a\n\n"
        "User-agent: *\nCrawl-delay: 3\n"
    )
    assert crawl_delay_text(txt2, "quiet") is None
    assert crawl_delay_text("User-agent: *\nCrawl-delay: soon\n") is None
    assert crawl_delay_text("User-agent: *\nCrawl-delay: -2\n") is None
    assert crawl_delay_text("") is None
    assert crawl_delay_text(None) is None
    # delay parsing must not disturb rule parsing (shared walk)
    assert parse_robots_text(txt, "fastbot") == [("/x", False)]


def test_request_rate_directive():
    """Request-rate m/n converts to n/m seconds-between-fetches;
    Crawl-delay wins when both appear; time windows and malformed
    forms are tolerated; group shadowing applies."""
    from workshoop2_etl_spark.operators.robots import crawl_delay_text

    assert crawl_delay_text("User-agent: *\nRequest-rate: 1/5\n") == 5.0
    assert crawl_delay_text("User-agent: *\nRequest-rate: 2/10\n") == 5.0
    # Crawl-delay is the more explicit directive
    both = "User-agent: *\nCrawl-delay: 2\nRequest-rate: 1/9\n"
    assert crawl_delay_text(both) == 2.0
    # optional time window ignored
    win = "User-agent: bot\nRequest-rate: 1/7 0600-1200\n"
    assert crawl_delay_text(win, "bot") == 7.0
    # exact group shadows * even when only * has a rate
    shadow = (
        "User-agent: bot\nDisallow: /x\n\n"
        "User-agent: *\nRequest-rate: 1/5\n"
    )
    assert crawl_delay_text(shadow, "bot") is None
    # malformed forms ignored
    assert crawl_delay_text("User-agent: *\nRequest-rate: 0/5\n") is None
    assert crawl_delay_text("User-agent: *\nRequest-rate: fast\n") is None
