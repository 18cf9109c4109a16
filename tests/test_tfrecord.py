"""TFRecord codec semantics (sources/tfrecord.py): CRC32C spec
vectors, framing verification, the Example wire round trip incl.
arrays/floats/NULLs, and the declared-schema read contract."""

from __future__ import annotations

import glob
import struct

import pytest
from pyspark.sql import types as T

from workshoop2_etl_spark.sources.tfrecord import (
    _example_bytes,
    _frame_record,
    crc32c,
    masked_crc32c,
    read_tfrecord,
    split_tfrecords,
    write_tfrecord,
)


def test_crc32c_public_vectors_and_mask():
    """RFC 3720 / public Castagnoli test vectors — conformance, not
    self-consistency — plus the TFRecord mask rotation."""
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    c = crc32c(b"abc")
    assert masked_crc32c(b"abc") == (
        (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    )


def test_framing_verifies_both_crcs():
    fields = T.StructType([T.StructField("k", T.LongType())]).fields
    blob = b"".join(
        _frame_record(_example_bytes({"k": i}, fields)) for i in range(3)
    )
    assert len(split_tfrecords(blob)) == 3
    # truncated tail: the complete prefix still parses
    assert len(split_tfrecords(blob[:-6])) == 2
    # flipped data byte: loud failure, never a garbage row
    corrupt = bytearray(blob)
    corrupt[14] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        split_tfrecords(bytes(corrupt))
    # broken length CRC: framing lost, walk stops cleanly
    corrupt2 = bytearray(blob)
    corrupt2[8] ^= 0xFF
    assert split_tfrecords(bytes(corrupt2)) == []


def test_roundtrip_arrays_floats_nulls(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("neg", T.LongType()),
            T.StructField("txt", T.StringType()),
            T.StructField("raw", T.BinaryType()),
            T.StructField("vec", T.ArrayType(T.FloatType())),
            T.StructField("ids", T.ArrayType(T.LongType())),
            T.StructField("maybe", T.StringType()),
        ]
    )
    rows = [
        (1, -5, "héllo", b"\x00\xff", [1.5, -2.25], [1, 2, 300], None),
        (2, 0, "", b"", [], [2**62], "x"),
    ]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "t")
    n = write_tfrecord(df.coalesce(1), out)
    assert n == 1 == len(glob.glob(out + "/*.tfrecord"))
    back = {r.k: r for r in read_tfrecord(spark, out, schema).collect()}
    assert back[1].neg == -5 and back[1].txt == "héllo"
    assert bytes(back[1].raw) == b"\x00\xff"
    assert back[1].vec == [1.5, -2.25]  # float32-exact values
    assert back[1].ids == [1, 2, 300]
    assert back[1].maybe is None  # omitted feature -> NULL
    assert back[2].ids == [2**62] and back[2].vec == []
    # doubles narrow to float32 on the wire — documented, visible
    d = spark.createDataFrame([(0.1,)], "x double").coalesce(1)
    out2 = str(tmp_path / "d")
    write_tfrecord(d, out2)
    got = read_tfrecord(
        spark, out2, T.StructType([T.StructField("x", T.DoubleType())])
    ).collect()[0].x
    assert got == struct.unpack("<f", struct.pack("<f", 0.1))[0] != 0.1


def test_read_contract_mismatches(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", [1, 2])], "k long, v string, ids array<long>"
    ).coalesce(1)
    out = str(tmp_path / "m")
    write_tfrecord(df, out)
    # kind mismatch: bytes feature declared long
    bad = T.StructType(
        [T.StructField("v", T.LongType())]
    )
    with pytest.raises(Exception, match="declared"):
        read_tfrecord(spark, out, bad).collect()
    # multi-value list under a scalar declaration
    bad2 = T.StructType([T.StructField("ids", T.LongType())])
    with pytest.raises(Exception, match="scalar"):
        read_tfrecord(spark, out, bad2).collect()
    # unknown feature name: NULL, not an error
    extra = T.StructType([T.StructField("nope", T.StringType())])
    assert read_tfrecord(spark, out, extra).collect()[0].nope is None
    # refusals at the edge of the lattice
    with pytest.raises(ValueError, match="unsupported Spark type"):
        write_tfrecord(
            spark.createDataFrame([({"a": 1},)], "m map<string,long>"),
            str(tmp_path / "x"),
        )
    with pytest.raises(Exception, match="holes"):
        write_tfrecord(
            spark.createDataFrame(
                [([1, None],)], "a array<long>"
            ).coalesce(1),
            str(tmp_path / "h"),
        )
