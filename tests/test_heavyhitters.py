"""Misra–Gries heavy hitters: the exactness guarantee must hold even
when the per-partition counter dict is FAR smaller than the
vocabulary (the testdata corpora are too small to force trims, so a
Zipf-ish synthetic stream exercises the decrement path directly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.heavyhitters import (
    _mg_absorb,
    heavy_hitters,
    misra_gries_partials,
)


def _zipf_rows(n_heavy: int = 5, n_tail: int = 400):
    """~5 heavy items (200 occurrences each) over a 400-item tail of
    3 occurrences each → 1000 + 1200 = 2200 rows, vocab 405."""
    rows = []
    for h in range(n_heavy):
        rows += [(f"hot_{h}",)] * 200
    for t in range(n_tail):
        rows += [(f"tail_{t}",)] * 3
    return rows


def test_exact_despite_trims(spark):
    rows = _zipf_rows()
    df = spark.createDataFrame(rows, "item string").repartition(8)
    # capacity 16 ≪ vocab 405 → every partition trims repeatedly.
    # support 0.07 > 1/(16+1) keeps the completeness bound valid.
    got = {
        r["item"]: r["n"]
        for r in heavy_hitters(
            df, "item", support=0.07, capacity=16
        ).collect()
    }
    # Exact answer: threshold = ceil(0.07 * 2200) = 154 → the 5 hot
    # items at 200 each, nothing from the 3-occurrence tail.
    assert got == {f"hot_{h}": 200 for h in range(5)}


def test_partials_bounded_and_superset(spark):
    rows = _zipf_rows()
    df = spark.createDataFrame(rows, "item string").repartition(4)
    parts = misra_gries_partials(df, "item", capacity=16).collect()
    # ≤ capacity rows per partition → ≤ 4 × 16 candidates total.
    assert len(parts) <= 4 * 16
    # Pigeonhole: every global 1/(k+1)-heavy item survives somewhere.
    survivors = {r["item"] for r in parts}
    for h in range(5):
        assert f"hot_{h}" in survivors


def test_capacity_too_small_raises(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError, match="cannot certify"):
        heavy_hitters(df, "item", support=0.001, capacity=10)
    with pytest.raises(ValueError, match="support"):
        heavy_hitters(df, "item", support=0.0)


def test_mg_absorb_trim_semantics():
    import pandas as pd

    counters: dict = {}
    # 3 distinct, capacity 2 → one trim: subtract 3rd-largest (1);
    # a:4→3, b:2→1, c:1→dropped.
    _mg_absorb(counters, pd.Series({"a": 4, "b": 2, "c": 1}), capacity=2)
    assert counters == {"a": 3, "b": 1}
    # Counts accumulate across batches for surviving keys.
    _mg_absorb(counters, pd.Series({"a": 1}), capacity=2)
    assert counters["a"] == 4


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("x",), (None,), ("x",), (None,), ("y",)], "item string"
    )
    got = heavy_hitters(df, "item", support=0.5, capacity=4).collect()
    # N counts non-null items only (count(col) semantics): N=3,
    # threshold=2 → x qualifies, y (1) does not.
    assert {(r["item"], r["n"]) for r in got} == {("x", 2)}
