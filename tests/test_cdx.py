"""CDXJ capture-index parsing + SURT keys + selective-fetch planning
(operators/cdx.py, functions/urls.py surt — round 11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.cdx import (
    fetch_plan,
    parse_cdxj,
    parse_cdxj_line,
    synthesize_cdxj_line,
)


def test_cdxj_line_roundtrip():
    line = synthesize_cdxj_line(
        "com,example)/p?q=1",
        "20240101000000",
        url="http://example.com/p?q=1",
        status=200,
        mime="text/html",
        digest="sha1:beef",
        filename="crawl-0000.warc.gz",
        offset=12345,
        length=678,
    )
    parsed = parse_cdxj_line(line)
    assert parsed == (
        "com,example)/p?q=1",
        "20240101000000",
        "http://example.com/p?q=1",
        200,
        "text/html",
        "sha1:beef",
        "crawl-0000.warc.gz",
        12345,
        678,
    )


def test_cdxj_tolerance():
    """Malformed lines yield None, never raise — missing JSON, bad
    JSON, missing filename/offset, non-numeric offset, revisit-style
    non-numeric status (parses with NULL status)."""
    assert parse_cdxj_line(None) is None
    assert parse_cdxj_line("") is None
    assert parse_cdxj_line("key 20240101000000") is None
    assert parse_cdxj_line("key 20240101000000 not-json") is None
    assert parse_cdxj_line('key 2024 {"url": "u"}') is None  # no filename
    assert (
        parse_cdxj_line(
            'key 2024 {"filename": "f", "offset": "x", "length": "1"}'
        )
        is None
    )
    ok = parse_cdxj_line(
        'key 2024 {"filename": "f", "offset": "5", "length": "7", '
        '"status": "-"}'
    )
    assert ok is not None and ok[3] is None and ok[7] == 5 and ok[8] == 7


def test_parse_cdxj_kernel_and_plan(spark):
    lines = [
        synthesize_cdxj_line(
            f"com,h)/p{i}",
            "20240101000000",
            url=f"http://h.com/p{i}",
            status=200 if i % 2 == 0 else 404,
            mime="text/html",
            digest=f"sha1:{i}",
            filename=f"crawl-{i % 2}.warc.gz",
            offset=i * 100,
            length=50,
        )
        for i in range(6)
    ] + ["garbage line"]
    df = spark.createDataFrame([(ln,) for ln in lines], "cdx_line string")
    parsed = parse_cdxj(df, "cdx_line", id_cols=[])
    assert parsed.count() == 6  # garbage dropped
    plan_rows = {
        r["warc_filename"]: r
        for r in fetch_plan(
            parsed.where(F.col("status") == 200)
        ).collect()
    }
    # status-200 captures: i in {0,2,4}, all in crawl-0.warc.gz
    assert set(plan_rows) == {"crawl-0.warc.gz"}
    r = plan_rows["crawl-0.warc.gz"]
    assert r["n_records"] == 3
    assert r["bytes_to_read"] == 150
    assert r["first_offset"] == 0
    assert r["last_end"] == 450
    # kernel is a pure map: no Exchange before the aggregation
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("+- == Initial Plan ==")[0]


def test_surt_reproduces_index_keys(spark):
    from workshoop2_etl_spark.functions.urls import normalize_url, surt

    cases = [
        ("http://www.Example.COM:80/Page?b=2&a=1#f", "com,example,www)/Page?a=1&b=2"),
        ("https://sub.site.co.uk/x/y", "uk,co,site,sub)/x/y"),
        ("http://host.com", "com,host)"),
        ("not a url", None),
    ]
    df = spark.createDataFrame(cases, "u string, expect string")
    out = df.select(
        "expect", surt(normalize_url(F.col("u"))).alias("got")
    )
    assert all(r["got"] == r["expect"] for r in out.collect())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure columns, no UDF


def test_fetch_records_by_index_slices_members(spark):
    """Range fetch inflates ONLY the admitted members; stale ranges
    (out of bounds) skip; files with no admitted captures drop; the
    range lists broadcast (no blob-side Exchange)."""
    from workshoop2_etl_spark.operators.cdx import fetch_records_by_index
    from workshoop2_etl_spark.operators.warc import (
        gzip_warc_record,
        synthesize_warc_record,
    )

    members = [
        gzip_warc_record(
            synthesize_warc_record(i, f"<p>d{i}</p>", host="h.com")
        )
        for i in range(4)
    ]
    blob_a = members[0] + members[1] + members[2]
    offs = [0, len(members[0]), len(members[0]) + len(members[1])]
    files = spark.createDataFrame(
        [("a.warc.gz", blob_a), ("b.warc.gz", members[3])],
        "warc_filename string, content binary",
    )
    captures = spark.createDataFrame(
        [
            ("a.warc.gz", offs[0], len(members[0])),  # doc 0
            ("a.warc.gz", offs[2], len(members[2])),  # doc 2
            ("a.warc.gz", 999999, 50),  # stale: out of bounds
        ],
        "warc_filename string, offset long, length long",
    )
    out = fetch_records_by_index(files, captures)
    rows = {r["target_uri"]: bytes(r["payload"]) for r in out.collect()}
    assert rows == {
        "http://h.com/page0": b"<p>d0</p>",
        "http://h.com/page2": b"<p>d2</p>",
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    head = plan.split("+- == Initial Plan ==")[0]
    assert "BroadcastHashJoin" in head or "BroadcastNestedLoop" in head
