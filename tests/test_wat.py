"""WAT metadata-record parsing (operators/wat.py, SURVEY §2.9 X205):
round trip through the published envelope layout, anchor-only link
selection, malformed-JSON tolerance, and the no-shuffle plan shape."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.warc import parse_warc_blobs, split_warc
from workshoop2_etl_spark.operators.wat import (
    synthesize_wat_record,
    wat_envelope_json,
    wat_link,
    wat_links,
)


def _parsed_fixture(spark, payloads: list[bytes]):
    """One blob holding the given metadata-record payloads → the
    parse_warc_blobs output frame."""
    recs = []
    for i, payload in enumerate(payloads):
        env = payload.decode("utf-8", "replace")
        rec = synthesize_wat_record(i, env)
        recs.append(rec)
    blob = b"".join(recs)
    df = spark.createDataFrame([(blob,)], "content binary")
    return parse_warc_blobs(df, "content", id_cols=[])


def test_roundtrip_envelope(spark):
    """to_json fixture → WARC metadata record → frame walk →
    from_json: every selected field survives byte-exact."""
    src = spark.createDataFrame([(7,)], "doc_id long").select(
        wat_envelope_json(
            F.lit("http://www.site.com/dir/page7"),
            F.array(
                wat_link("A@/href", F.lit("../page0"), F.lit("hub 0")),
                wat_link("IMG@/src", F.lit("/logo.png")),
            ),
            title=F.lit("Doc 7"),
            status=F.lit("200"),
        ).alias("wat_json")
    )
    env = src.collect()[0]["wat_json"]
    # the synthesized JSON is the published WAT layout
    j = json.loads(env)
    assert j["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"] == (
        "http://www.site.com/dir/page7"
    )
    links = j["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"
    ]["Links"]
    assert [link["path"] for link in links] == ["A@/href", "IMG@/src"]

    parsed = _parsed_fixture(spark, [env.encode()])
    out = wat_links(parsed).collect()
    assert len(out) == 1  # anchors only — IMG@/src is not an edge
    r = out[0]
    assert r["page_uri"] == "http://www.site.com/dir/page7"
    assert r["page_status"] == 200
    assert r["page_title"] == "Doc 7"
    assert r["href"] == "../page0"
    assert r["anchor_text"] == "hub 0"


def test_link_paths_selector(spark):
    """link_paths widens the provenance filter: IMG@/src rows appear
    when asked for, with NULL anchor text."""
    env = (
        spark.range(1)
        .select(
            wat_envelope_json(
                F.lit("http://h/p"),
                F.array(
                    wat_link("A@/href", F.lit("/a"), F.lit("t")),
                    wat_link("IMG@/src", F.lit("/i.png")),
                ),
            ).alias("j")
        )
        .collect()[0]["j"]
    )
    parsed = _parsed_fixture(spark, [env.encode()])
    both = wat_links(parsed, link_paths=("A@/href", "IMG@/src"))
    rows = {r["href"]: r["anchor_text"] for r in both.collect()}
    assert rows == {"/a": "t", "/i.png": None}


def test_malformed_json_tolerated(spark):
    """Poison payloads — truncated JSON, non-JSON text, an envelope
    without HTML-Metadata, a JSON array — yield zero link rows and
    never raise (PERMISSIVE from_json + explode-drop)."""
    good = (
        spark.range(1)
        .select(
            wat_envelope_json(
                F.lit("http://h/p"),
                F.array(wat_link("A@/href", F.lit("/a"), F.lit("t"))),
            ).alias("j")
        )
        .collect()[0]["j"]
    )
    payloads = [
        good.encode(),
        good[: len(good) // 2].encode(),  # truncated mid-JSON
        b"not json at all",
        b'{"Envelope": {"WARC-Header-Metadata": {}}}',  # no HTML-Metadata
        b'[1, 2, 3]',
        b"",
    ]
    parsed = _parsed_fixture(spark, payloads)
    assert parsed.count() == len(payloads)  # every record framed
    out = wat_links(parsed).collect()
    assert len(out) == 1 and out[0]["href"] == "/a"


def test_non_metadata_records_excluded(spark):
    """A response record whose body happens to be JSON-shaped is not
    a WAT row — the warc_type/content_type guard filters on the
    record class, not the payload."""
    from workshoop2_etl_spark.operators.warc import synthesize_warc_record

    env = (
        spark.range(1)
        .select(
            wat_envelope_json(
                F.lit("http://h/p"),
                F.array(wat_link("A@/href", F.lit("/a"), F.lit("t"))),
            ).alias("j")
        )
        .collect()[0]["j"]
    )
    blob = synthesize_warc_record(5, env, host="h.com") + synthesize_wat_record(
        5, env
    )
    assert len(split_warc(blob)) == 2
    df = spark.createDataFrame([(blob,)], "content binary")
    parsed = parse_warc_blobs(df, "content", id_cols=[])
    out = wat_links(parsed).collect()
    assert len(out) == 1
    assert out[0]["page_uri"] == "http://h/p"


def test_wat_links_no_exchange(spark):
    """Record rows → link rows is narrow work: filter + from_json +
    explode add no Exchange to the executed plan."""
    env = (
        spark.range(1)
        .select(
            wat_envelope_json(
                F.lit("http://h/p"),
                F.array(wat_link("A@/href", F.lit("/a"), F.lit("t"))),
            ).alias("j")
        )
        .collect()[0]["j"]
    )
    parsed = _parsed_fixture(spark, [env.encode()])
    out = wat_links(parsed)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("+- == Initial Plan ==")[0]


def test_metas_description_extraction(spark):
    """Head.Metas surfaces the first name='description' content
    (case-insensitive name match); absent Metas or no description
    yields NULL."""
    from pyspark.sql import functions as F

    def env(metas):
        return (
            spark.range(1)
            .select(
                wat_envelope_json(
                    F.lit("http://h/p"),
                    F.array(wat_link("A@/href", F.lit("/a"), F.lit("t"))),
                    metas=metas,
                ).alias("j")
            )
            .collect()[0]["j"]
        )

    with_desc = env(
        F.array(
            F.struct(
                F.lit("keywords").alias("name"),
                F.lit("k1,k2").alias("content"),
            ),
            F.struct(
                F.lit("Description").alias("name"),
                F.lit("A fine page").alias("content"),
            ),
        )
    )
    no_desc = env(
        F.array(
            F.struct(
                F.lit("viewport").alias("name"),
                F.lit("width=1").alias("content"),
            )
        )
    )
    no_metas = env(None)
    parsed = _parsed_fixture(
        spark, [with_desc.encode(), no_desc.encode(), no_metas.encode()]
    )
    out = wat_links(parsed).collect()
    assert sorted(
        (r["page_description"] for r in out), key=lambda x: (x is None, x)
    ) == ["A fine page", None, None]
