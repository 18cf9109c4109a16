"""Key-skew diagnostics (operators/skew.py): exact quantile rule,
salt recommendation, heavy-key ordering, planted-skew behavior, and
the plan shape (TakeOrderedAndProject, bounded quantile frame)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.skew import (
    heavy_keys,
    key_counts,
    skew_profile,
)


def _planted(spark):
    """9 uniform keys of 100 rows + one hot key of 1100 rows."""
    rows = [(f"k{i % 9}",) for i in range(900)] + [("HOT",)] * 1100
    return spark.createDataFrame(rows, "k string")


def test_skew_profile_planted_hot_key(spark):
    prof = skew_profile(_planted(spark), ["k"]).collect()[0]
    assert prof["total_rows"] == 2000
    assert prof["n_keys"] == 10
    assert prof["max_key_rows"] == 1100
    # ceil-rank quantiles over sizes [100×9, 1100]:
    # p50 rank=5 -> 100, p90 rank=9 -> 100, p99 rank=10 -> 1100
    assert prof["p50_key_rows"] == 100
    assert prof["p90_key_rows"] == 100
    assert prof["p99_key_rows"] == 1100
    assert prof["avg_key_rows"] == 200.0
    assert prof["skew_ratio"] == 5.5
    # ceil(1100 / 200) = 6 — split the hot key six ways
    assert prof["recommended_salt"] == 6


def test_skew_profile_uniform_salt_is_one(spark):
    df = spark.range(1000).select((F.col("id") % 10).alias("k"))
    prof = skew_profile(df, ["k"]).collect()[0]
    assert prof["max_key_rows"] == 100
    assert prof["recommended_salt"] == 1
    assert prof["skew_ratio"] == 1.0
    assert (
        prof["p50_key_rows"]
        == prof["p90_key_rows"]
        == prof["p99_key_rows"]
        == 100
    )


def test_quantiles_match_numpy_rank_rule(spark):
    """The spelled-out rule (smallest size with cum rank >=
    ceil(q*n)) against a direct numpy computation on random sizes."""
    import random

    rng = random.Random(11)
    rows = []
    sizes = {}
    for i in range(80):
        c = rng.randint(1, 50)
        sizes[f"key{i}"] = c
        rows += [(f"key{i}",)] * c
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k string")
    prof = skew_profile(df, ["k"]).collect()[0]
    arr = np.sort(np.array(list(sizes.values())))
    n = len(arr)
    for q, col in [(0.5, "p50_key_rows"), (0.9, "p90_key_rows"), (0.99, "p99_key_rows")]:
        rank = -(-(n * int(round(q * 10000))) // 10000)  # ceil
        assert prof[col] == int(arr[rank - 1]), (q, prof[col], arr[rank - 1])


def test_heavy_keys_total_order_and_plan(spark):
    df = _planted(spark)
    top = heavy_keys(df, ["k"], top_n=3)
    got = [(r["k"], r["cnt"]) for r in top.collect()]
    # HOT first, then ties broken ascending by key
    assert got == [("HOT", 1100), ("k0", 100), ("k1", 100)]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_key_counts_multi_column(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 1)], "x string, y int"
    )
    got = {
        (r["x"], r["y"]): r["cnt"]
        for r in key_counts(df, ["x", "y"]).collect()
    }
    assert got == {("a", 1): 2, ("a", 2): 1, ("b", 1): 1}
