"""S2/S7 executed end-to-end against the Derby engine embedded in the
Spark classpath (jdbc:derby:memory: — no server, no download): the
batched JDBC write and the partitioned-range JDBC read that
tests/test_jdbc_options.py could only pin as option maps."""

from __future__ import annotations

import pytest

from workshoop2_etl_spark.sources.readers import read_jdbc, read_parquet
from workshoop2_etl_spark.sources.writers import write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
PROPS = {"driver": DERBY_DRIVER}


@pytest.fixture(scope="module")
def derby(spark):
    jvm = spark._jvm
    # Redirect the engine's boot log away from the repo; must happen
    # before the first connection boots the engine in this JVM.
    jvm.java.lang.System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    try:
        jvm.java.lang.Class.forName(DERBY_DRIVER)
    except Exception:  # pragma: no cover - jars ship with pyspark
        pytest.skip("Derby driver not on the Spark classpath")
    return "jdbc:derby:memory:e2e;create=true"


def test_jdbc_write_read_roundtrip(spark, derby, sf_dir):
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    write_jdbc(orders, derby, "orders_rt", mode="overwrite", properties=PROPS)
    back = read_jdbc(spark, derby, "orders_rt", properties=PROPS)
    # Derby surfaces DATE back as TIMESTAMP through this dialect;
    # value comparison normalizes via the date cast.
    a = sorted(map(tuple, orders.withColumn(
        "o_orderdate", orders.o_orderdate.cast("date")).collect()))
    b = sorted(map(tuple, back.withColumn(
        "o_orderdate", back.o_orderdate.cast("date")).collect()))
    assert a == b


def test_jdbc_partitioned_read_parallel_and_complete(spark, derby, sf_dir):
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    write_jdbc(orders, derby, "orders_part", mode="overwrite", properties=PROPS)
    hi = orders.agg({"o_orderkey": "max"}).collect()[0][0]
    back = read_jdbc(
        spark, derby, "orders_part", properties=PROPS,
        partition_column="o_orderkey", lower_bound=0, upper_bound=int(hi),
        num_partitions=4,
    )
    # the range really splits into parallel scans...
    assert back.rdd.getNumPartitions() == 4
    # ...and stride boundaries neither drop nor duplicate rows
    assert back.count() == orders.count()
    assert back.select("o_orderkey").distinct().count() == orders.count()


def test_jdbc_append_mode_accumulates(spark, derby):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    write_jdbc(df, derby, "append_t", mode="overwrite", properties=PROPS)
    write_jdbc(df, derby, "append_t", mode="append", properties=PROPS)
    assert read_jdbc(spark, derby, "append_t", properties=PROPS).count() == 4
