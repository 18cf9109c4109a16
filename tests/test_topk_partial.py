"""Map-side partial top-k: exactness vs the plain window on skewed
data, and the survivor bound that makes it the 100 TB path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.analytics import (
    partial_prune_topk,
    top_k_per_group,
    top_k_per_group_partial,
)

ORDER = [("v", False), ("id", True)]


def _df(spark, n=20_000, groups=10, parts=8):
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % groups).alias("g"),
            # skew: group 0 owns ~half the rows' largest values
            ((F.col("id") * 2654435761) % 1_000_003).alias("v"),
        )
        .repartition(parts)
    )


def test_exact_vs_plain_window(spark):
    df = _df(spark)
    part = top_k_per_group_partial(df, ["g"], ORDER, 5)
    plain = top_k_per_group(
        df, ["g"], [F.col("v").desc(), F.col("id").asc()], 5
    )
    a = sorted(map(tuple, part.select("g", "id", "v", "rank").collect()))
    b = sorted(map(tuple, plain.select("g", "id", "v", "rank").collect()))
    assert a == b
    assert len(a) == 10 * 5


def test_survivor_bound(spark):
    parts, groups, k = 8, 10, 5
    df = _df(spark, parts=parts, groups=groups)
    survivors = partial_prune_topk(df, ["g"], ORDER, k).count()
    assert survivors <= parts * groups * k
    # and the prune genuinely prunes (not a pass-through)
    assert survivors < df.count() / 10


def test_groups_smaller_than_k(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("b", 3, 3)], "g string, id long, v long"
    )
    got = top_k_per_group_partial(df, ["g"], ORDER, 10).collect()
    assert len(got) == 3  # every row survives when group < k


def test_k_validation(spark):
    df = spark.createDataFrame([("a", 1, 1)], "g string, id long, v long")
    with pytest.raises(ValueError, match="k must be"):
        top_k_per_group_partial(df, ["g"], ORDER, 0)
