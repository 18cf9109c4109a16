"""Skew mitigation, PROVEN rather than configured: (1) AQE's
skew-join split actually fires on a Zipf-skewed sort-merge join, and
(2) full_outer_with_indicator's salted hot-key branch actually engages
and stays correct under a manufactured hot key.

The round-5 verdict's point: enabling
``spark.sql.adaptive.skewJoin.enabled`` proves nothing — only a plan
that SHOWS ``skew=true`` after execution, and a salted branch whose
results equal the unsalted join's, do."""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    keys = {k.replace("__", "."): v for k, v in kv.items()}
    prior = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, str(v))
    try:
        yield
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _zipf_events(spark, n_rows: int, hot_share: float):
    """A Zipf-ish keyed frame: ``hot_share`` of rows on key 0, the
    rest uniform over 1..999, with a padding payload so the hot
    partition's BYTES (what AQE's skew detector measures) dominate."""
    return spark.range(n_rows).select(
        F.when(
            (F.col("id") % 100) < int(hot_share * 100), F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(999)) + 1)
        .alias("k"),
        F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
    )


def test_aqe_skew_join_split_fires(spark):
    """Join a 70%-hot-key fact to a uniform side under thresholds
    scaled to test data volume; the executed AQE plan must mark the
    sort-merge join ``skew=true`` — the runtime split engaged, not
    merely enabled."""
    with _confs(
        spark,
        **{
            "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2.0",
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "64KB",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "32KB",
            # force a shuffled join: broadcast would dodge the skew path
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__autoBroadcastJoinThreshold": "-1",
        },
    ):
        left = _zipf_events(spark, 120_000, hot_share=0.7)
        right = _zipf_events(spark, 30_000, hot_share=0.0).select(
            "k", F.col("payload").alias("rpayload")
        )
        joined = left.join(right, "k")
        # execute THIS frame (not a derived count) so ITS adaptive
        # plan finalizes in place
        n = len(joined.collect())
        assert n > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]


def test_salted_hot_key_branch_engages_and_is_correct(spark):
    """The manufactured-hot-key case the operator exists for: null
    keys normalize to '' on both sides. The salted branch must (a)
    appear in the plan (salt column + replicated right), (b) return
    exactly the rows the plain full outer returns, (c) produce the
    full m x n match for the hot group."""
    from workshoop2_etl_spark.operators.merge import (
        full_outer_with_indicator,
    )

    m, n_r = 2_000, 50
    left = spark.range(m).select(
        F.lit(None).cast("string").alias("k"),
        F.col("id").alias("lval"),
    ).unionByName(
        spark.range(100).select(
            F.concat(F.lit("L"), F.col("id")).alias("k"),
            (F.col("id") + 10_000).alias("lval"),
        )
    )
    right = spark.range(n_r).select(
        F.lit(None).cast("string").alias("k"),
        F.col("id").alias("rval"),
    ).unionByName(
        spark.range(80).select(
            F.concat(F.lit("R"), F.col("id")).alias("k"),
            (F.col("id") + 20_000).alias("rval"),
        )
    )
    plain = full_outer_with_indicator(left, right, ["k"])
    salted = full_outer_with_indicator(
        left, right, ["k"], hot_keys=[("",)], hot_salt=16
    )
    # (a) the salted branch is in the plan
    assert "__salt" in salted._jdf.queryExecution().optimizedPlan().toString()
    # (b) row-identical results
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    # (c) hot group fully matched and spread: m x n_r 'both' rows
    hot_both = (
        salted.filter((F.col("k") == "") & (F.col("_merge") == "both"))
        .count()
    )
    assert hot_both == m * n_r
