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
    "Disallow: /wild/*/no\n"  # wildcard -> refused, not mis-matched
    "Allow: /end$\n"          # $-anchor -> refused
    "Disallow:\n"             # empty Disallow = allow-all, no rule
)


def test_parser_groups_and_refusals():
    assert parse_robots_text(_TXT, "*") == [
        ("/private/", False),
        ("/private/pub/", True),
        ("/tmp", False),
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


def test_rules_join_is_broadcast(spark):
    robots = spark.createDataFrame(
        [("d.com", "User-agent: *\nDisallow: /x\n")],
        "domain string, robots_txt string",
    )
    rules = parse_robots(robots, "robots_txt", key_cols=["domain"])
    urls = spark.createDataFrame(
        [(1, "d.com", "/x/1")], "uid long, domain string, path string"
    )
    out = robots_filter(
        urls,
        rules,
        url_key="uid",
        path_col="path",
        join_on="domain",
        keep_denied=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
