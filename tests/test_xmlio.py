"""Generic declared-schema XML source/sink (round 13): full-lattice
round trips, entity escaping, NULL-vs-empty distinction, malformed
input tolerance/refusals, and the multi-file Spark path."""

from __future__ import annotations

import datetime
import decimal

import pytest
from pyspark.sql import types as T

from workshoop2_etl_spark.sources.xmlio import (
    decode_xml_pandas,
    encode_xml_pandas,
    read_xml,
    write_xml,
)

FULL = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("amt", T.DecimalType(10, 2)),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)


def test_full_lattice_roundtrip_with_escapes_and_nulls():
    import pandas as pd

    rows = pd.DataFrame(
        {
            "k": pd.array([1, 2, None], dtype="Int64"),
            "name": ["a<b>&\"c'", "", None],
            "price": pd.array([1.5, float(1) / 3, None], dtype="float64"),
            "ok": pd.Series([True, False, None], dtype="object"),
            "amt": pd.Series(
                [decimal.Decimal("10.25"), None, decimal.Decimal("0.01")],
                dtype="object",
            ),
            "d": pd.Series(
                [datetime.date(2024, 2, 29), None, datetime.date(1999, 1, 1)],
                dtype="object",
            ),
            "ts": pd.to_datetime(
                pd.Series(
                    [datetime.datetime(2024, 1, 2, 3, 4, 5, 678901), None, None],
                    dtype="object",
                )
            ),
        }
    )
    blob = encode_xml_pandas(rows, FULL)
    back = decode_xml_pandas(blob, FULL)
    assert list(back["k"]) == [1, 2] + [v for v in [back["k"][2]]][:1]
    assert back["k"][2] is None or back["k"].isna()[2]
    # escaped string round-trips exactly; empty != NULL
    assert back["name"][0] == "a<b>&\"c'"
    assert back["name"][1] == ""
    assert back["name"][2] is None
    # shortest-roundtrip doubles are value-exact (1/3 survives)
    assert back["price"][1] == float(1) / 3
    assert back["amt"][0] == decimal.Decimal("10.25")
    assert back["d"][0] == datetime.date(2024, 2, 29)
    assert back["ts"][0] == datetime.datetime(2024, 1, 2, 3, 4, 5, 678901)


def test_numeric_character_references_unescape():
    blob = (
        b'<?xml version="1.0"?><rows>'
        b"<row><name>caf&#233; &#x20AC;</name></row></rows>"
    )
    schema = T.StructType([T.StructField("name", T.StringType())])
    back = decode_xml_pandas(blob, schema)
    assert back["name"][0] == "café €"


def test_tolerance_and_refusals():
    schema = T.StructType([T.StructField("k", T.LongType())])
    # bytes outside row elements ignored; missing column -> NULL
    blob = b"<rows>junk<row><other>9</other></row><row><k>7</k></row></rows>"
    back = decode_xml_pandas(blob, schema)
    assert back["k"].isna()[0] and back["k"][1] == 7
    # unparseable declared-long value fails loudly, never silently nulls
    with pytest.raises(ValueError):
        decode_xml_pandas(b"<rows><row><k>x7</k></row></rows>", schema)
    # unsupported column types refused driver-side
    nested = T.StructType(
        [T.StructField("a", T.ArrayType(T.LongType()))]
    )
    with pytest.raises(ValueError, match="lattice"):
        decode_xml_pandas(b"<rows/>", nested)
    # invalid element names refused
    bad = T.StructType([T.StructField("1bad name", T.StringType())])
    with pytest.raises(ValueError, match="element name"):
        decode_xml_pandas(b"<rows/>", bad)


def test_spark_multifile_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(i, f"name&{i}<tag>", i * 0.125) for i in range(100)], schema
    )
    out = str(tmp_path / "xmlsink")
    n_files = write_xml(df.repartition(4, "k"), out)
    assert n_files == 4
    back = read_xml(spark, out, schema)
    assert back.schema == schema
    got = sorted((r["k"], r["v"], r["x"]) for r in back.collect())
    want = sorted((i, f"name&{i}<tag>", i * 0.125) for i in range(100))
    assert got == want


def test_write_refuses_binary_and_renders_deterministically(spark, tmp_path):
    bad = spark.createDataFrame([(bytearray(b"x"),)], "b binary")
    with pytest.raises(ValueError, match="lattice"):
        write_xml(bad, str(tmp_path / "nope"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_xml(df.coalesce(1), p1)
    write_xml(df.coalesce(1), p2)
    import glob

    b1 = open(glob.glob(p1 + "/*.xml")[0], "rb").read()
    b2 = open(glob.glob(p2 + "/*.xml")[0], "rb").read()
    assert b1 == b2
