"""Charset-sniffed decoding (operators/charset.py): ladder order,
BOM consumption, strict-UTF-8 rejection evidence, totality."""

from __future__ import annotations

import codecs

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from workshoop2_etl_spark.operators.charset import decode_bytes, sniff_decode


def test_ladder_rungs():
    assert sniff_decode("plain".encode("utf-8")) == ("plain", "utf-8")
    assert sniff_decode("ü".encode("utf-8")) == ("ü", "utf-8")
    # BOM consumed, not leaked into text
    assert sniff_decode(codecs.BOM_UTF8 + "x".encode("utf-8")) == (
        "x",
        "utf-8-sig",
    )
    assert sniff_decode(
        codecs.BOM_UTF16_LE + "héllo".encode("utf-16-le")
    ) == ("héllo", "utf-16")
    assert sniff_decode(
        codecs.BOM_UTF16_BE + "héllo".encode("utf-16-be")
    ) == ("héllo", "utf-16")
    # cp1252: 0xE9 (é) and 0x97 (em-dash, the 0x80-0x9F page) are
    # invalid UTF-8 — strict verify must reject and fall through
    assert sniff_decode("é — “q”".encode("cp1252")) == ("é — “q”", "cp1252")
    # bytes undefined in cp1252 fall to latin-1 (total)
    assert sniff_decode(b"\x81\x8d") == ("\x81\x8d", "latin-1")
    assert sniff_decode(None) == (None, None)
    assert sniff_decode(b"") == ("", "utf-8")


@settings(
    max_examples=80,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(b=st.binary(max_size=120))
def test_sniff_decode_total(b):
    """Every byte string decodes to SOME labeled text — the ladder
    never raises and never returns an unlabeled decode."""
    text, enc = sniff_decode(b)
    assert isinstance(text, str)
    assert enc in ("utf-8", "utf-8-sig", "utf-16", "cp1252", "latin-1")


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    t=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
    )
)
def test_utf8_roundtrip_always_labeled_utf8(t):
    text, enc = sniff_decode(t.encode("utf-8"))
    assert text == t and enc in ("utf-8", "utf-8-sig", "utf-16")
    # BOM labels only fire when t itself starts with a BOM character
    if not t.startswith("﻿") and not t.startswith("￾"):
        assert enc == "utf-8"


def test_spark_kernel(spark):
    rows = [
        (1, "plain".encode("utf-8")),
        (2, codecs.BOM_UTF8 + "bom".encode("utf-8")),
        (3, "é — legacy".encode("cp1252")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["text"], r["encoding"])
        for r in decode_bytes(df, "payload", id_cols=["doc_id"]).collect()
    }
    assert got == {
        1: ("plain", "utf-8"),
        2: ("bom", "utf-8-sig"),
        3: ("é — legacy", "cp1252"),
        4: (None, None),
    }
