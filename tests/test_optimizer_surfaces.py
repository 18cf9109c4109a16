"""Optimizer-surface proofs: scan-level aggregate pushdown and
runtime bloom-filter join pruning — the two 'free at 100 TB'
optimizations that silently stop working when configs or plan shapes
drift, asserted against the executed/optimized plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class _conf:
    """Set/restore Spark SQL confs around a block."""

    def __init__(self, spark, **kv):
        self.spark = spark
        self.kv = {k.replace("__", "."): v for k, v in kv.items()}

    def __enter__(self):
        self.old = {}
        for k, v in self.kv.items():
            self.old[k] = self.spark.conf.get(k, None)
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.old.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def test_parquet_aggregate_pushdown_to_footer(spark):
    """count(*)/min/max with no filters must compile to a footer-only
    BatchScan (PushedAggregation) under the V2 parquet source — the
    scan reads row-group STATISTICS, not data pages: a metadata-time
    answer no matter the table size."""
    with _conf(
        spark,
        **{
            "spark__sql__sources__useV1SourceList": "",
            "spark__sql__parquet__aggregatePushdown": "true",
        },
    ):
        df = spark.read.parquet(f"{SF}/lineitem.parquet").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation" in plan or "count(*)" in plan.split(
            "BatchScan"
        )[1].splitlines()[0], plan[:800]
        row = df.collect()[0]
        assert row.n == 6000 and row.mn == 1.0 and row.mx == 50.0


def test_runtime_bloom_filter_join_pruning(spark):
    """A selective non-broadcast join must inject Spark's runtime
    bloom filter on the probe side (might_contain over a
    bloom_filter_agg subquery): fact rows that cannot match die at
    the scan, BEFORE the shuffle — the difference between shuffling
    the whole fact table and shuffling the matching slice."""
    with _conf(
        spark,
        **{
            "spark__sql__optimizer__runtime__bloomFilter__enabled": "true",
            "spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold": "0",
            "spark__sql__autoBroadcastJoinThreshold": "-1",
        },
    ):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt and "bloom_filter_agg" in opt
        # and the filtered join still answers correctly
        n = j.count()
        expected = (
            li.join(
                spark.read.parquet(f"{SF}/orders.parquet"),
                li.l_orderkey == F.col("o_orderkey"),
            )
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .count()
        )
        assert n == expected and n > 0


def test_aggregate_pushdown_disabled_for_filtered_scans(spark):
    """With a data filter present the footer stats can't answer the
    aggregate — the optimizer must fall back to a real scan (guard
    against wrong-answer pushdown)."""
    with _conf(
        spark,
        **{
            "spark__sql__sources__useV1SourceList": "",
            "spark__sql__parquet__aggregatePushdown": "true",
        },
    ):
        df = (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .filter(F.col("l_discount") > 0.05)
            .agg(F.min("l_quantity").alias("mn"))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: []" in plan or "PushedAggregation" not in plan
        assert df.collect()[0].mn is not None
