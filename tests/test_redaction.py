

def test_mojibake_single_and_double_unwind():
    from workshoop2_etl_spark.operators.redaction import _demojibake_once

    for clean in ["café", "don’t — em", "naïve œuvre", "日本語", "é"]:
        moji = clean.encode("utf-8").decode("latin-1")
        assert _demojibake_once(moji) == clean
        double = moji.encode("utf-8").decode("latin-1")
        assert _demojibake_once(_demojibake_once(double)) == clean


def test_mojibake_no_false_repair():
    from workshoop2_etl_spark.operators.redaction import _demojibake_once

    # clean non-ASCII whose latin-1 bytes are NOT valid UTF-8, pure
    # ASCII, and text outside latin-1 entirely: all untouched
    assert _demojibake_once("café") is None
    assert _demojibake_once("plain ascii") is None
    assert _demojibake_once("日本語") is None


def test_fix_mojibake_kernel(spark):
    from workshoop2_etl_spark.operators.redaction import fix_mojibake

    rows = [
        (1, "café".encode("utf-8").decode("latin-1")),
        (2, "plain ascii"),
        (3, "café"),
        (4, None),
        (
            5,
            "don’t"
            .encode("utf-8").decode("latin-1")
            .encode("utf-8").decode("latin-1"),  # double-encoded
        ),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text"], r["fixed"])
        for r in fix_mojibake(df, "text", flag_col="fixed").collect()
    }
    assert out == {
        1: ("café", True),
        2: ("plain ascii", False),
        3: ("café", False),
        4: (None, False),
        5: ("don’t", True),
    }
