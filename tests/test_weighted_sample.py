"""Efraimidis–Spirakis weighted sampling: the properties the oracle
parity run can't see (weight monotonicity, zero-weight exclusion,
salt independence, determinism)."""

from __future__ import annotations

import pytest

from workshoop2_etl_spark.operators.sampling import weighted_sample


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, g string, w double")


def test_huge_weight_dominates(spark):
    # One row with weight 1e9 vs 50 rows at weight 1: its Exp(1e9)
    # race key is ~1e9 smaller — it wins k=1 for any hash draw.
    rows = [(0, "g", 1e9)] + [(i, "g", 1.0) for i in range(1, 51)]
    [r] = weighted_sample(
        _df(spark, rows), "id", weight_col="w", k=1, group_cols=["g"]
    ).collect()
    assert r["id"] == 0


def test_zero_and_negative_weights_never_win(spark):
    rows = [(1, "g", 0.0), (2, "g", -5.0), (3, "g", 1.0), (4, "g", 1.0)]
    got = {
        r["id"]
        for r in weighted_sample(
            _df(spark, rows), "id", weight_col="w", k=3, group_cols=["g"]
        ).collect()
    }
    # k=3 but only the two positive-weight rows can win... except the
    # row_number window still emits 3 rows; nonpositive weights sort
    # last (key=inf), so the third slot falls to the smaller id.
    assert {3, 4} <= got
    assert got - {3, 4} in ({1}, set())


def test_deterministic_and_salt_sensitive(spark):
    rows = [(i, "g", float(1 + i % 7)) for i in range(200)]
    df = _df(spark, rows)
    a = {
        r["id"]
        for r in weighted_sample(
            df, "id", weight_col="w", k=10, group_cols=["g"], salt="s1"
        ).collect()
    }
    b = {
        r["id"]
        for r in weighted_sample(
            df.repartition(7), "id", weight_col="w", k=10,
            group_cols=["g"], salt="s1",
        ).collect()
    }
    c = {
        r["id"]
        for r in weighted_sample(
            df, "id", weight_col="w", k=10, group_cols=["g"], salt="s2"
        ).collect()
    }
    assert a == b  # layout-independent
    assert a != c  # fresh draw per salt


def test_global_guard(spark):
    df = _df(spark, [(1, "g", 1.0)])
    with pytest.raises(ValueError, match="ONE partition"):
        weighted_sample(df, "id", weight_col="w", k=1)
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, "id", weight_col="w", k=0, group_cols=["g"])


def test_reservoir_sample_exact_nested_and_heap_planned(spark):
    """X226: exactly k rows, id-stable, size-nested (top-k is a
    prefix of top-(k+m) under fixed race keys), and planned as
    TakeOrderedAndProject — never a global sort or one-partition
    window."""
    import pytest
    from pyspark.sql import functions as F

    from workshoop2_etl_spark.operators.sampling import reservoir_sample

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    s1 = reservoir_sample(df, "k", k=100, salt="t")
    rows1 = s1.collect()
    assert len(rows1) == 100
    ids1 = [r["k"] for r in rows1]
    # deterministic rerun
    assert ids1 == [r["k"] for r in reservoir_sample(df, "k", k=100, salt="t").collect()]
    # nested: top-100 is a prefix of top-150
    ids2 = [r["k"] for r in reservoir_sample(df, "k", k=150, salt="t").collect()]
    assert ids2[:100] == ids1
    # a different salt draws a different sample
    assert ids1 != [r["k"] for r in reservoir_sample(df, "k", k=100, salt="u").collect()]
    # plan shape: bounded heaps, not a global Sort
    s1.collect()
    plan = s1._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in final
    with pytest.raises(ValueError, match="k must be"):
        reservoir_sample(df, "k", k=0)
