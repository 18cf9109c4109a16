"""Storage-layout data skipping: range-clustered parquet must yield
(a) tight, near-disjoint row-group min/max spans — prunable by ANY
footer-reading engine — and (b) an actually-pruned Spark scan
(numOutputRows of the FileScan ≪ the unclustered twin's)."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from workshoop2_etl_spark.sources.writers import cluster_parquet

N = 200_000
LO, HI = 100_000, 101_000  # 0.5% selectivity window on k


@pytest.fixture(scope="module")
def layouts(spark):
    base = tempfile.mkdtemp(prefix="wsds_")
    df = spark.range(N).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    cluster_parquet(
        df, os.path.join(base, "clustered"), cluster_cols=["k"],
        n_files=8, rowgroup_bytes=64 * 1024,
    )
    # The unclustered twin models data with NO key/layout correlation
    # (arrival-ordered logs, hash-distributed ETL output): scrambling
    # by md5 makes every row group span ~the whole key domain.
    (
        df.repartition(8)
        .sortWithinPartitions(F.md5(F.col("k").cast("string")))
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite")
        .parquet(os.path.join(base, "hashed"))
    )
    return base


def _rowgroup_spans(path):
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(0).statistics
            spans.append((st.min, st.max))
    return spans


def test_rowgroup_stats_tight(layouts):
    cl = _rowgroup_spans(os.path.join(layouts, "clustered"))
    ha = _rowgroup_spans(os.path.join(layouts, "hashed"))
    avg = lambda s: sum(b - a for a, b in s) / len(s)  # noqa: E731
    # Clustered groups each cover ~N/groups consecutive keys; hashed
    # groups span nearly the whole domain. Order of magnitude apart.
    assert avg(cl) * 10 < avg(ha)
    # Prunability for the test window: most clustered groups MISS it.
    missing = sum(1 for a, b in cl if b < LO or a > HI)
    assert missing >= 0.9 * len(cl)


def _scan_rows(spark, path):
    q = spark.read.parquet(path).filter(
        (F.col("k") >= LO) & (F.col("k") < HI)
    )
    q.collect()
    plan = q._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "Scan" in node.getClass().getName():
            total += node.metrics().apply("numOutputRows").value()
    return total


def test_spark_scan_actually_prunes(spark, layouts):
    pruned = _scan_rows(spark, os.path.join(layouts, "clustered"))
    full = _scan_rows(spark, os.path.join(layouts, "hashed"))
    # The hashed layout reads ~everything (row-group stats useless);
    # the clustered layout touches only the covering groups. Require
    # ≥5× even allowing generous row-group boundaries.
    assert pruned * 5 <= full, (pruned, full)
    assert full >= 0.5 * N


def test_cluster_requires_cols(spark):
    df = spark.range(10)
    with pytest.raises(ValueError, match="cluster_cols"):
        cluster_parquet(df, "/tmp/never", cluster_cols=[])


def test_bloom_filter_prunes_point_lookup(spark):
    """Equality probes on a scrambled high-cardinality key: min/max
    stats are useless (every row group spans the hash domain), so any
    pruning observed is the bloom filter's doing."""
    import tempfile

    from workshoop2_etl_spark.sources.writers import write_parquet_bloom

    base = tempfile.mkdtemp(prefix="wsbloom_")
    df = spark.range(300_000).select(
        F.xxhash64("id").alias("k"), F.col("id").alias("v")
    )
    write_parquet_bloom(
        df, os.path.join(base, "bloom"),
        bloom_cols={"k": 300_000}, rowgroup_bytes=128 * 1024,
    )
    (
        df.write.option("parquet.block.size", 128 * 1024)
        .mode("overwrite").parquet(os.path.join(base, "plain"))
    )
    target = df.filter("v = 123456").select("k").collect()[0]["k"]

    def scan_rows(path):
        q = spark.read.parquet(path).filter(F.col("k") == target)
        q.collect()
        leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
        tot = 0
        for i in range(leaves.size()):
            node = leaves.apply(i)
            if "Scan" in node.getClass().getName():
                tot += node.metrics().apply("numOutputRows").value()
        return tot

    bloom = scan_rows(os.path.join(base, "bloom"))
    plain = scan_rows(os.path.join(base, "plain"))
    assert plain >= 0.9 * 300_000      # no bloom → reads ~everything
    assert bloom * 10 <= plain         # bloom skips non-matching groups

    with pytest.raises(ValueError, match="bloom_cols"):
        write_parquet_bloom(df, os.path.join(base, "x"), bloom_cols={})


def test_zorder_prunes_both_dimensions(spark):
    """Z-order vs single-key sort: the sorted layout prunes only its
    leading key; the Morton layout prunes selective filters on BOTH
    columns (statistically — order of magnitude, not perfection)."""
    import tempfile

    from workshoop2_etl_spark.sources.writers import zorder_parquet

    base = tempfile.mkdtemp(prefix="wszorder_")
    n = 200_000
    # two independent uniform dimensions
    df = spark.range(n).select(
        (F.xxhash64("id") % 100_000).alias("x"),
        (F.xxhash64(F.col("id") + 1) % 100_000).alias("y"),
    ).select(F.abs("x").alias("x"), F.abs("y").alias("y"))
    zorder_parquet(
        df, os.path.join(base, "z"), cluster_cols=["x", "y"],
        bits=16, n_files=8, rowgroup_bytes=32 * 1024,
    )
    (
        df.repartitionByRange(8, "x").sortWithinPartitions("x")
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite").parquet(os.path.join(base, "xsort"))
    )

    def scan_rows(path, col):
        q = spark.read.parquet(path).filter(
            (F.col(col) >= 50_000) & (F.col(col) < 51_000)  # 1% window
        )
        q.collect()
        leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
        tot = 0
        for i in range(leaves.size()):
            node = leaves.apply(i)
            if "Scan" in node.getClass().getName():
                tot += node.metrics().apply("numOutputRows").value()
        return tot

    # x-sorted layout: near-perfect on x, useless on y
    assert scan_rows(os.path.join(base, "xsort"), "x") * 10 <= n
    assert scan_rows(os.path.join(base, "xsort"), "y") >= 0.9 * n
    # z-order: prunes BOTH dimensions by ≥4× (statistical locality)
    assert scan_rows(os.path.join(base, "z"), "x") * 4 <= n
    assert scan_rows(os.path.join(base, "z"), "y") * 4 <= n

    with pytest.raises(ValueError, match="exactly 2"):
        zorder_parquet(df, os.path.join(base, "bad"), cluster_cols=["x"])
