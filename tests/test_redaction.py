

def test_mojibake_single_and_double_unwind():
    from workshoop2_etl_spark.operators.redaction import _demojibake_once

    for clean in ["café", "don’t — em", "naïve œuvre", "日本語", "é"]:
        moji = clean.encode("utf-8").decode("latin-1")
        assert _demojibake_once(moji) == clean
        double = moji.encode("utf-8").decode("latin-1")
        assert _demojibake_once(_demojibake_once(double)) == clean


def test_mojibake_mixed_cp1252_and_c1_fallback():
    """Regression (r9 ADVICE): mojibake mixing cp1252-plane
    codepoints (â€™ from ’) with the five latin-1-only C1 codepoints
    (U+0081 etc., produced by most Cyrillic UTF-8 continuation
    bytes) fails BOTH whole-string strict encodes — the fallback
    must be per character (sloppy-windows-1252)."""
    from workshoop2_etl_spark.operators.redaction import _demojibake_once

    for clean in ["’ с", "курс", "€Ђ", "déjà — Москва"]:
        # build the mixed form the way crawls actually produce it:
        # cp1252 decode where mapped, C1 passthrough where not
        moji = "".join(
            b.to_bytes(1, "big").decode("cp1252", errors="ignore")
            or chr(b)
            for b in clean.encode("utf-8")
        )
        assert _demojibake_once(moji) == clean, clean


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
