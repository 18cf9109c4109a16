"""Wikipedia-dump ingest semantics (operators/wikidump.py): the bz2
multistream walk, tolerant page extraction, redirect handling, and
the wikitext cleanup chain — the oracle-parity run proves the
Spark↔DuckDB replay; these pin the corners."""

from __future__ import annotations

import bz2

from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.wikidump import (
    TEMPLATE_PASSES,
    WIKI_HEADER,
    WIKI_TRAILER,
    bz2_member,
    parse_wiki_pages,
    parse_wikidump_blobs,
    split_bz2_streams,
    synthesize_wiki_page,
    wikitext_to_text,
)


def test_split_bz2_streams_walk_and_tolerance():
    a, b = bz2.compress(b"alpha"), bz2.compress(b"beta")
    assert split_bz2_streams(a + b) == [b"alpha", b"beta"]
    # truncated final member: keep what decoded
    assert split_bz2_streams(a + b[:-4]) == [b"alpha"]
    assert split_bz2_streams(b"") == []
    assert split_bz2_streams(b"not bz2") == []


def test_parse_wiki_pages_id_redirect_and_entities():
    xml = (
        synthesize_wiki_page(7, "A & B <C>", "x & y <z>", ns=0)
        + synthesize_wiki_page(9, "R", "#REDIRECT [[A]]", redirect_to="A")
        + b"<page><title>broken, no id</title></page>"
    )
    rows = parse_wiki_pages(xml)
    assert len(rows) == 2  # the id-less page tolerantly drops
    pid, ns, title, is_rd, text = rows[0]
    # the PAGE id, not the nested revision id (7 + 1000000)
    assert pid == 7 and ns == 0 and not is_rd
    # escape -> unescape is the identity on the original strings
    assert title == "A & B <C>" and text == "x & y <z>"
    assert rows[1][0] == 9 and rows[1][3] is True
    # numeric character references decode too (dumps carry them)
    raw = xml.replace(b"x &amp; y", b"x &#38;&#x26; y")
    assert parse_wiki_pages(raw)[0][4] == "x && y <z>"


def test_parse_wikidump_blobs_multistream_and_redirect_policy(spark):
    pages = [
        synthesize_wiki_page(i, f"P{i}", f"body {i}") for i in range(4)
    ]
    blob = (
        bz2_member(WIKI_HEADER)
        + bz2_member(b"".join(pages[:2]))
        + bz2_member(
            pages[2]
            + synthesize_wiki_page(99, "R", "#REDIRECT [[P0]]",
                                   redirect_to="P0")
            + pages[3]
        )
        + bz2_member(WIKI_TRAILER)
    )
    df = spark.createDataFrame([(bytearray(blob),)], "content binary")
    got = parse_wikidump_blobs(df, "content", id_cols=[])
    ids = sorted(r.page_id for r in got.collect())
    assert ids == [0, 1, 2, 3]  # redirect dropped by default
    kept = parse_wikidump_blobs(
        df, "content", id_cols=[], keep_redirects=True
    )
    by_id = {r.page_id: r for r in kept.collect()}
    assert by_id[99].is_redirect is True and len(by_id) == 5
    # plain (non-bz2) XML blobs parse through the same walk
    raw = spark.createDataFrame(
        [(bytearray(b"".join(pages)),)], "content binary"
    )
    assert parse_wikidump_blobs(raw, "content", id_cols=[]).count() == 4


def test_wikitext_cleanup_rules(spark):
    cases = {
        # nested templates up to TEMPLATE_PASSES levels vanish
        "a {{t1|{{t2|{{t3}}}}}} b": "a  b",
        # piped + plain links, media links
        "see [[Main Page|the main]] and [[Other]]": "see the main and Other",
        "x [[File:Pic.png|thumb|cap]] y": "x  y",
        # refs (paired incl. newline, self-closing), residual tags
        'a<ref name="n">c\nd</ref>b<ref group="g"/>c <sup>2</sup>':
            "a" + "b" + "c 2",
        # headings, quote runs, entities
        "== Head ==\n'''bold''' ''it'' &nbsp;x": "Head\nbold it  x",
        # blank-line collapse + end trim
        "  a\n\n\n\nb\t\n": "a\n\nb",
    }
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases.items())],
        "i long, s string",
    )
    out = {
        r.i: r.t
        for r in df.select(
            "i", wikitext_to_text(F.col("s")).alias("t")
        ).collect()
    }
    for i, want in enumerate(cases.values()):
        assert out[i] == want, (i, out[i], want)
    # a template nested DEEPER than TEMPLATE_PASSES leaves a visible
    # remnant — never silently swallowed text
    deep = "{{" * (TEMPLATE_PASSES + 1) + "x" + "}}" * (TEMPLATE_PASSES + 1)
    rem = (
        spark.createDataFrame([(deep,)], "s string")
        .select(wikitext_to_text(F.col("s")).alias("t"))
        .collect()[0].t
    )
    assert "{{" in rem


def test_index_parse_and_seek_fetch(spark):
    """The index parser keeps colons inside titles and surfaces
    malformed lines as NULLs; seek-fetch decompresses only the
    indexed streams, tolerates stale/misaligned offsets, and is
    stream-granular (stream-mates come back; callers filter ids)."""
    from workshoop2_etl_spark.operators.wikidump import (
        fetch_wiki_streams_by_index,
        parse_wikidump_index,
    )

    lines = spark.createDataFrame(
        [
            ("f", "617:12:Title: with colons"),
            ("f", "not a line"),
            ("f", "99:x:bad id"),
        ],
        "filename string, line string",
    )
    idx = {r.line: r for r in parse_wikidump_index(
        lines, "line", key_cols=["filename", "line"]).collect()}
    good = idx["617:12:Title: with colons"]
    assert (good.offset, good.page_id, good.title) == (
        617, 12, "Title: with colons")
    assert idx["not a line"].offset is None
    assert idx["99:x:bad id"].page_id is None

    # two streams of two pages; index the second stream only
    m0 = bz2_member(
        synthesize_wiki_page(1, "P1", "a") + synthesize_wiki_page(2, "P2", "b")
    )
    m1 = bz2_member(
        synthesize_wiki_page(3, "P3", "c") + synthesize_wiki_page(4, "P4", "d")
    )
    head = bz2_member(WIKI_HEADER)
    blob = head + m0 + m1 + bz2_member(WIKI_TRAILER)
    files = spark.createDataFrame(
        [("f", bytearray(blob))], "filename string, content binary"
    )
    caps = spark.createDataFrame(
        [
            ("f", len(head) + len(m0)),  # m1: valid
            ("f", len(head) + len(m0) + 1),  # misaligned: skipped
            ("f", len(blob) + 50),  # past EOF: skipped
        ],
        "filename string, offset long",
    )
    got = fetch_wiki_streams_by_index(files, caps).collect()
    assert sorted(r.page_id for r in got) == [3, 4]  # whole stream, no m0
    assert all(r.offset == len(head) + len(m0) for r in got)
    # a file with no admitted captures is never opened
    files2 = spark.createDataFrame(
        [("f", bytearray(blob)), ("g", bytearray(b"\x00" * 10))],
        "filename string, content binary",
    )
    assert fetch_wiki_streams_by_index(files2, caps).count() == 2
