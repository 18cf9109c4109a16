"""S2/S7 surface pinning: the sandbox ships no JDBC driver jar, so the
e2e path cannot run — these unit tests pin the option maps the reader
and writer hand Spark's jdbc datasource, against the reference's
semantics (dags/merge_to_dw.py:25 BATCH_SIZE=1000; :37-44 table scan;
:172-191 batched executemany insert). No SparkSession needed."""

from __future__ import annotations

import pytest

from workshoop2_etl_spark.sources.readers import jdbc_read_options
from workshoop2_etl_spark.sources.writers import jdbc_write_options

URL = "jdbc:mysql://dw-host:3306/warehouse"


def test_read_options_plain_scan():
    assert jdbc_read_options(URL, "grammy_awards") == {
        "url": URL,
        "dbtable": "grammy_awards",
    }


def test_read_options_partitioned_range_scan():
    opts = jdbc_read_options(
        URL,
        "fact_plays",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
        properties={"driver": "com.mysql.cj.jdbc.Driver"},
    )
    assert opts == {
        "url": URL,
        "dbtable": "fact_plays",
        "driver": "com.mysql.cj.jdbc.Driver",
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "1000000",
        "numPartitions": "32",
    }


def test_read_options_partitioned_defaults_to_8_partitions():
    opts = jdbc_read_options(
        URL, "t", partition_column="id", lower_bound=0, upper_bound=10
    )
    assert opts["numPartitions"] == "8"


def test_read_options_partition_column_requires_both_bounds():
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        jdbc_read_options(URL, "t", partition_column="id", lower_bound=0)


def test_read_options_bounds_without_partition_column_rejected():
    # Spark silently ignores bounds without partitionColumn and
    # serializes the scan through one connection — fail loudly instead.
    with pytest.raises(ValueError, match="without partition_column"):
        jdbc_read_options(URL, "t", lower_bound=0, upper_bound=10)


def test_write_options_default_batch_matches_reference():
    # reference dags/merge_to_dw.py:25 — BATCH_SIZE = 1000
    assert jdbc_write_options(URL, "dim_song") == {
        "url": URL,
        "dbtable": "dim_song",
        "batchsize": "1000",
    }


def test_write_options_custom_batch_and_properties():
    opts = jdbc_write_options(
        URL,
        "fact_plays",
        batch_size=5000,
        properties={"isolationLevel": "READ_COMMITTED"},
    )
    assert opts["batchsize"] == "5000"
    assert opts["isolationLevel"] == "READ_COMMITTED"


def test_write_options_rejects_nonpositive_batch():
    with pytest.raises(ValueError, match="positive"):
        jdbc_write_options(URL, "t", batch_size=0)
