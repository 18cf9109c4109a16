"""WARC record framing/parse (operators/warc.py): spec byte framing,
multi-record split, HTTP envelope extraction, truncation tolerance,
the Spark blob fan-out, and the full WARC -> HTML -> text composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.warc import (
    gzip_warc_record,
    parse_warc_blobs,
    parse_warc_record,
    split_warc,
    split_warc_gz,
    synthesize_warc_record,
)


def _blob(n=5, host="www.h.com"):
    return b"".join(
        synthesize_warc_record(
            i, f"<html><body><p>doc {i} body</p></body></html>", host=host
        )
        for i in range(n)
    )


def test_split_and_parse_roundtrip():
    parts = split_warc(_blob(5))
    assert len(parts) == 5
    for i, rec in enumerate(parts):
        wt, uri, st, ct, payload, loc, *_ids = parse_warc_record(rec)
        assert loc is None
        assert wt == "response" and st == 200
        assert uri == f"http://www.h.com/page{i}"
        assert ct.startswith("text/html")
        assert payload.decode() == (
            f"<html><body><p>doc {i} body</p></body></html>"
        )


def test_framing_tolerance():
    blob = _blob(2)
    first_len = len(split_warc(blob)[0])
    assert split_warc(b"") == []
    assert split_warc(None) == []
    assert split_warc(b"garbage") == []
    # truncated mid-second-record: first record still recovered
    assert len(split_warc(blob[: first_len + 40])) == 1
    assert parse_warc_record(b"nope") is None


def test_content_length_not_last_header():
    """Regression (r9 ADVICE): CRLF-terminated Content-Length followed
    by more headers (the real CommonCrawl ordering) must still frame —
    the old ``$``-anchored regex only matched when it was last."""
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"Content-Length: 5\r\n"
        b"WARC-Block-Digest: sha1:beef\r\n"
        b"WARC-IP-Address: 192.0.2.9\r\n"
        b"\r\nhello\r\n\r\n"
    )
    parts = split_warc(rec * 3)
    assert len(parts) == 3
    for p in parts:
        assert parse_warc_record(p)[4] == b"hello"


def test_gzip_member_split_roundtrip():
    """CommonCrawl layout: one gzip member per record, concatenated."""
    recs = [
        synthesize_warc_record(i, f"<p>d{i}</p>", host="www.h.com")
        for i in range(6)
    ]
    gz = b"".join(gzip_warc_record(r) for r in recs)
    parts = split_warc_gz(gz)
    framed = [r[:-4] for r in recs]  # splitter strips the CRLFCRLF sep
    assert parts == framed
    # tolerance: empty / garbage / truncated-final-member
    assert split_warc_gz(b"") == []
    assert split_warc_gz(None) == []
    assert split_warc_gz(b"garbage") == []
    first = gzip_warc_record(recs[0])
    assert split_warc_gz(first + gzip_warc_record(recs[1])[:-4]) == framed[:1]
    # one member holding several records still fans out
    multi = gzip_warc_record(b"".join(recs[:3]))
    assert split_warc_gz(multi) == framed[:3]


def test_spark_gzip_blob_autodetect(spark):
    """parse_warc_blobs detects .warc.gz rows by magic and yields the
    same records as the plain path."""
    recs = [
        synthesize_warc_record(i, f"<p>d{i}</p>", host="www.h.com")
        for i in range(4)
    ]
    plain = b"".join(recs)
    gz = b"".join(gzip_warc_record(r) for r in recs)
    blobs = spark.createDataFrame(
        [(1, plain), (2, gz)], "file_id long, content binary"
    )
    out = parse_warc_blobs(blobs, "content", id_cols=["file_id"])
    rows = out.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file_id"], set()).add(
            (r["target_uri"], bytes(r["payload"]))
        )
    assert by_file[1] == by_file[2] and len(by_file[1]) == 4


def test_non_http_record():
    wi = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n"
    )
    wt, uri, st, ct, payload, loc, *_ids = parse_warc_record(split_warc(wi)[0])
    assert loc is None
    assert wt == "warcinfo" and uri is None and st is None
    assert payload == b"robots: x"


def test_spark_blob_fanout_no_shuffle(spark):
    """One file row -> N record rows, as a pure map (no Exchange)."""
    blobs = spark.createDataFrame(
        [(1, _blob(3)), (2, _blob(4, host="www.i.org"))],
        "file_id long, content binary",
    )
    out = parse_warc_blobs(blobs, "content", id_cols=["file_id"])
    rows = out.collect()
    assert len(rows) == 7
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file_id"], []).append(r["target_uri"])
    assert len(by_file[1]) == 3 and len(by_file[2]) == 4
    assert all("www.i.org" in u for u in by_file[2])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("+- == Initial Plan ==")[0]


def test_warc_html_composition(spark):
    """The registered pipeline in miniature: records -> blob -> parse
    -> html_to_text, ids recovered from the parsed URIs."""
    from workshoop2_etl_spark.operators.htmlextract import html_to_text

    blob = b"".join(
        synthesize_warc_record(
            i,
            f"<html><head><title>T{i}</title></head>"
            f"<body><p>body {i}</p></body></html>",
            host="www.h.com",
        )
        for i in range(4)
    )
    blobs = spark.createDataFrame([(blob,)], "content binary")
    parsed = parse_warc_blobs(blobs, "content", id_cols=[])
    out = {
        r["doc_id"]: (r["title"], r["text"])
        for r in html_to_text(
            parsed.select(
                F.regexp_extract("target_uri", r"page(\d+)$", 1)
                .cast("long")
                .alias("doc_id"),
                F.col("payload").cast("string").alias("html"),
            ),
            "html",
            id_cols=["doc_id"],
        ).collect()
    }
    assert out == {i: (f"T{i}", f"body {i}") for i in range(4)}


def test_gz_split_never_raises_hypothesis():
    """Totality of the gzip member walk: arbitrary bytes never raise,
    and whatever decodes is a list of frames."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=400))
    def run(b):
        assert isinstance(split_warc_gz(b), list)
        assert isinstance(split_warc_gz(b"\x1f\x8b" + b), list)

    run()


def test_http_body_gzip_deflate_chunked_roundtrip():
    """Round 11: response payloads stored AS FETCHED — gzip/deflate
    Content-Encoding and chunked Transfer-Encoding (and their stack)
    all decode back to the document bytes inside parse_warc_record."""
    html = "<html><body><p>café body</p></body></html>"
    for kw in (
        {"content_encoding": "gzip"},
        {"content_encoding": "deflate"},
        {"chunked": True},
        {"chunked": True, "chunk_size": 7},
        {"content_encoding": "gzip", "chunked": True},
    ):
        rec = synthesize_warc_record(3, html, host="www.h.com", **kw)
        parts = split_warc(rec)
        assert len(parts) == 1, kw
        wt, uri, st, ct, payload, loc, *_ids = parse_warc_record(parts[0])
        assert st == 200 and loc is None
        assert payload.decode("utf-8") == html, kw


def test_http_body_decode_tolerance():
    """Truncated chunk framing or a corrupt gzip stream must keep the
    record alive with the raw payload — never raise."""
    from workshoop2_etl_spark.operators.warc import (
        _decode_http_body,
        _dechunk_http_body,
    )

    # corrupt gzip: header claims gzip, bytes are not
    assert _decode_http_body(b"not-gzip", {"content-encoding": "gzip"}) == (
        b"not-gzip",
        None,
    )
    assert _decode_http_body(
        b"not-zlib", {"content-encoding": "deflate"}
    ) == (b"not-zlib", None)
    # truncated chunk: size says 20, only 5 bytes follow
    trunc = b"14\r\nhello"
    assert _dechunk_http_body(trunc) is None
    assert _decode_http_body(
        trunc, {"transfer-encoding": "chunked"}
    ) == (trunc, None)
    # corrupt brotli/zstd: raw bytes + VISIBLE label (not silent)
    assert _decode_http_body(b"brotli-bytes", {"content-encoding": "br"}) == (
        b"brotli-bytes",
        "br",
    )
    assert _decode_http_body(b"z", {"content-encoding": "zstd"}) == (
        b"z",
        "zstd",
    )
    # unknown codings: raw bytes + label; identity: clean
    assert _decode_http_body(b"c", {"content-encoding": "compress"}) == (
        b"c",
        "compress",
    )
    assert _decode_http_body(b"p", {"content-encoding": "identity"}) == (
        b"p",
        None,
    )
    # bad hex size line
    assert _dechunk_http_body(b"zz\r\nhello\r\n0\r\n\r\n") is None
    # end-to-end: a record whose gzip body is truncated still parses
    rec = synthesize_warc_record(
        1, "<p>x</p>", host="h.com", content_encoding="gzip"
    )
    # corrupt the last 4 payload bytes (keeps WARC framing valid)
    broken = rec[:-8] + b"XXXX" + rec[-4:]
    parsed = parse_warc_record(split_warc(broken)[0])
    assert parsed is not None and parsed[2] == 200  # survived


def test_brotli_zstd_bodies_decode_for_real():
    """``br`` and ``zstd`` bodies inflate through pyarrow's bundled
    codecs — including chunked-over-br — and the decompression-bomb
    guard keeps oversized output raw + labeled."""
    from workshoop2_etl_spark.operators.warc import (
        _arrow_compress,
        _decode_http_body,
        chunk_http_body,
    )

    body = b"<html>real brotli body</html>" * 100
    br = _arrow_compress(body, "brotli")
    assert _decode_http_body(br, {"content-encoding": "br"}) == (body, None)
    zs = _arrow_compress(body, "zstd")
    assert _decode_http_body(zs, {"content-encoding": "zstd"}) == (
        body,
        None,
    )
    chunked = chunk_http_body(br, chunk_size=64)
    assert _decode_http_body(
        chunked,
        {"transfer-encoding": "chunked", "content-encoding": "br"},
    ) == (body, None)
    # end-to-end through a synthesized record
    rec = synthesize_warc_record(
        7, "<p>br</p>", host="h.com", content_encoding="br"
    )
    parsed = parse_warc_record(split_warc(rec)[0])
    assert parsed[4] == b"<p>br</p>" and parsed[-1] is None

    # bomb guard: >64 MiB decoded keeps raw bytes + the label
    import workshoop2_etl_spark.operators.warc as W

    bomb = _arrow_compress(b"\x00" * (W._MAX_DECODED_BODY + 1), "zstd")
    out, stub = _decode_http_body(bomb, {"content-encoding": "zstd"})
    assert out == bomb and stub == "zstd"


def test_warc_zst_blob_split(spark):
    """A .warc.zst blob (one zstd frame per record, concatenated)
    parses through parse_warc_blobs; a corrupt blob yields zero
    records rather than failing the task."""
    from workshoop2_etl_spark.operators.warc import (
        ZSTD_MAGIC,
        parse_warc_blobs,
        zstd_warc_record,
    )

    recs = [
        synthesize_warc_record(i, f"<p>doc {i}</p>", host="h.com")
        for i in range(3)
    ]
    blob = b"".join(zstd_warc_record(r) for r in recs)
    assert blob.startswith(ZSTD_MAGIC)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(ZSTD_MAGIC + b"corrupt"))],
        "file_id long, content binary",
    )
    rows = parse_warc_blobs(df, "content").collect()
    assert sorted(r["target_uri"] for r in rows) == [
        f"http://h.com/page{i}" for i in range(3)
    ]
    assert all(r["file_id"] == 1 for r in rows)


def test_redirect_location_surfaced(spark):
    """3xx records surface their Location header as a column."""
    rec301 = synthesize_warc_record(
        1,
        "",
        host="old.com",
        status=301,
        location="http://new.com/page1",
    )
    rec200 = synthesize_warc_record(2, "<p>d2</p>", host="new.com")
    wt, uri, st, ct, payload, loc, *_ids = parse_warc_record(
        split_warc(rec301)[0]
    )
    assert st == 301 and loc == "http://new.com/page1"
    blobs = spark.createDataFrame(
        [(rec301 + rec200,)], "content binary"
    )
    rows = {
        r["http_status"]: r["location"]
        for r in parse_warc_blobs(blobs, "content", id_cols=[]).collect()
    }
    assert rows == {301: "http://new.com/page1", 200: None}


def test_resolve_redirects_chains(spark):
    """Chain following: direct 200, one 301 hop, 301->302 with a
    RELATIVE Location, a dangling redirect (target never fetched),
    and a 2-cycle that must stop at max_hops with 3xx status."""
    from workshoop2_etl_spark.operators.warc import resolve_redirects

    rows = [
        # uri, status, location
        ("http://s.com/final", 200, None),
        ("http://s.com/a", 301, "http://s.com/final"),
        ("http://s.com/b", 301, "http://s.com/mid/x"),
        ("http://s.com/mid/x", 302, "../final"),  # relative Location
        ("http://s.com/dangle", 301, "http://gone.com/x"),
        ("http://s.com/c1", 301, "http://s.com/c2"),  # 2-cycle
        ("http://s.com/c2", 302, "http://s.com/c1"),
    ]
    df = spark.createDataFrame(
        rows, "target_uri string, http_status int, location string"
    )
    out = {
        r["target_uri"]: (
            r["final_uri"], r["n_hops"], r["final_status"]
        )
        for r in resolve_redirects(df, max_hops=4).collect()
    }
    assert out["http://s.com/final"] == ("http://s.com/final", 0, 200)
    assert out["http://s.com/a"] == ("http://s.com/final", 1, 200)
    assert out["http://s.com/b"] == ("http://s.com/final", 2, 200)
    assert out["http://s.com/mid/x"] == ("http://s.com/final", 1, 200)
    # dangling: we know where it points, but no record there
    assert out["http://s.com/dangle"] == ("http://gone.com/x", 1, None)
    # cycle: stops at max_hops, still 3xx -> caller filters
    c_final, c_hops, c_status = out["http://s.com/c1"]
    assert c_hops == 4 and c_status in (301, 302)


def test_materialize_revisits(spark):
    """Revisit records borrow their referent's payload, keep their
    own URI, and drop when the referent isn't in the parsed set."""
    from workshoop2_etl_spark.operators.warc import (
        materialize_revisits,
        synthesize_revisit_record,
    )

    orig = synthesize_warc_record(7, "<p>seven</p>", host="www.h.com")
    rev = synthesize_revisit_record(
        7,
        host="mirror.h.com",
        refers_to_id="<urn:uuid:doc-000000000007>",
        refers_to_uri="http://www.h.com/page7",
        payload_digest="sha1:beef",
    )
    dangling = synthesize_revisit_record(
        8,
        host="mirror.h.com",
        refers_to_id="<urn:uuid:doc-999999999999>",  # never fetched
        refers_to_uri="http://gone.com/page8",
        payload_digest="sha1:dead",
    )
    blobs = spark.createDataFrame(
        [(orig + rev + dangling,)], "content binary"
    )
    parsed = parse_warc_blobs(blobs, "content", id_cols=[])
    assert parsed.count() == 3  # all three records parse
    out = {
        (r["fetched_as"], r["target_uri"]): bytes(r["payload"])
        for r in materialize_revisits(parsed).collect()
    }
    body = b"<p>seven</p>"
    assert out[("response", "http://www.h.com/page7")] == body
    assert out[("revisit", "http://mirror.h.com/page7")] == body
    assert len(out) == 2  # dangling revisit dropped


def test_export_wet_roundtrip_plain(spark):
    """export_wet → parse_warc_blobs round trip: warcinfo heads each
    blob, every doc (including NULL text) survives as a conversion
    record with its text intact, file assignment is id-range."""
    from workshoop2_etl_spark.operators.warc import (
        export_wet,
        parse_warc_blobs,
    )

    docs = spark.createDataFrame(
        [(0, "alpha"), (1, None), (2, "gamma"), (5, "zeta")],
        "doc_id long, text string",
    )
    files = export_wet(docs, per_file=4)
    rows = files.collect()
    assert {r["file_no"]: r["n_records"] for r in rows} == {0: 3, 1: 1}
    parsed = parse_warc_blobs(
        files.select("content"), "content", id_cols=[]
    ).collect()
    kinds = [r["warc_type"] for r in parsed]
    assert kinds.count("warcinfo") == 2  # one head per blob
    conv = {
        r["target_uri"]: bytes(r["payload"]).decode()
        for r in parsed
        if r["warc_type"] == "conversion"
    }
    assert conv == {
        "http://export.local/page0": "alpha",
        "http://export.local/page1": "",  # NULL text kept, empty body
        "http://export.local/page2": "gamma",
        "http://export.local/page5": "zeta",
    }


def test_export_wet_uri_col_and_gzip(spark):
    """Explicit per-row URIs ride into the records; gzip_members
    produces .wet.gz-style member blobs the same ingest splits."""
    from workshoop2_etl_spark.operators.warc import (
        export_wet,
        parse_warc_blobs,
    )

    docs = spark.createDataFrame(
        [(7, "seven", "http://a.com/x"), (8, "eight", "http://b.com/y")],
        "doc_id long, text string, uri string",
    )
    files = export_wet(docs, uri_col="uri", per_file=16, gzip_members=True)
    blob = files.collect()[0]["content"]
    assert bytes(blob).startswith(b"\x1f\x8b")
    parsed = parse_warc_blobs(
        files.select("content"), "content", id_cols=[]
    ).collect()
    conv = {
        r["target_uri"]: bytes(r["payload"]).decode()
        for r in parsed
        if r["warc_type"] == "conversion"
    }
    assert conv == {"http://a.com/x": "seven", "http://b.com/y": "eight"}


def test_export_wet_to_files_roundtrip(spark, tmp_path):
    """export_wet -> write_binary_files -> spark binaryFile source ->
    parse: the full corpus-to-disk-and-back loop."""
    from workshoop2_etl_spark.operators.warc import (
        export_wet,
        parse_warc_blobs,
    )
    from workshoop2_etl_spark.sources.writers import write_binary_files

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    files = export_wet(docs, per_file=4, gzip_members=True)
    out = str(tmp_path / "wet")
    n = write_binary_files(
        files, out, prefix="crawl", ext="warc.wet.gz"
    )
    assert n == 3  # ids 0-3, 4-7, 8-9
    back = spark.read.format("binaryFile").load(out)
    parsed = parse_warc_blobs(
        back.select("content"), "content", id_cols=[]
    )
    conv = {
        r["target_uri"]: bytes(r["payload"]).decode()
        for r in parsed.collect()
        if r["warc_type"] == "conversion"
    }
    assert conv == {
        f"http://export.local/page{i}": f"text {i}" for i in range(10)
    }


def test_parse_surfaces_cache_validators(spark):
    """ETag / Last-Modified response headers surface verbatim; 304
    records parse with empty payloads; records without validators
    yield NULLs."""
    from workshoop2_etl_spark.operators.warc import (
        parse_warc_blobs,
        synthesize_warc_record,
    )

    blob = (
        synthesize_warc_record(
            1, "<p>x</p>", host="a.com",
            etag='W/"abc"', last_modified="Mon, 15 Jan 2024 00:00:00 GMT",
        )
        + synthesize_warc_record(2, "<p>y</p>", host="a.com")
        + synthesize_warc_record(
            3, "", host="a.com", status=304, etag='"zzz"',
        )
    )
    df = spark.createDataFrame([(bytearray(blob),)], "content binary")
    rows = {
        r["target_uri"]: r
        for r in parse_warc_blobs(df, "content", id_cols=[]).collect()
    }
    r1 = rows["http://a.com/page1"]
    assert r1["etag"] == 'W/"abc"'
    assert r1["last_modified"] == "Mon, 15 Jan 2024 00:00:00 GMT"
    r2 = rows["http://a.com/page2"]
    assert r2["etag"] is None and r2["last_modified"] is None
    r3 = rows["http://a.com/page3"]
    assert r3["http_status"] == 304
    assert r3["etag"] == '"zzz"' and bytes(r3["payload"]) == b""


def test_synthesize_warc_record_binary_content_type():
    """Round 13: non-text payloads — a bytes body passes through
    unencoded and the Content-Type header is overridable, so an
    application/pdf response frames and re-parses byte-exact."""
    from workshoop2_etl_spark.operators.warc import (
        parse_warc_record,
        split_warc,
        synthesize_warc_record,
    )

    body = b"%PDF-1.7\nbinary\x00\xff bytes"
    rec = synthesize_warc_record(
        7, body, host="www.x.com", content_type="application/pdf"
    )
    # through the file framing, as the pipeline parses it (split_warc
    # slices by WARC Content-Length, excluding the record separator)
    wtype, uri, status, ctype, payload, *rest = parse_warc_record(
        split_warc(rec)[0]
    )
    assert wtype == "response"
    assert uri == "http://www.x.com/page7"
    assert status == 200
    assert ctype == "application/pdf"
    assert bytes(payload) == body
    # default stays the html header — existing fixtures unchanged
    rec2 = synthesize_warc_record(8, "<p>x</p>", host="www.x.com")
    assert parse_warc_record(split_warc(rec2)[0])[3] == "text/html; charset=utf-8"
