"""Market-basket rules and triangle-count unit tests on planted data."""

from __future__ import annotations

import pytest

from workshoop2_etl_spark.operators.basket import (
    association_rules,
    copurchase_pairs,
)
from workshoop2_etl_spark.operators.graph import triangle_count


def test_association_rules_hand_computed(spark):
    # baskets: {a,b} ×3, {a,c} ×1, {b,c} ×1, {a} ×1  → N=6
    rows = []
    bid = 0
    for _ in range(3):
        rows += [(bid, "a"), (bid, "b")]
        bid += 1
    rows += [(bid, "a"), (bid, "c")]
    bid += 1
    rows += [(bid, "b"), (bid, "c")]
    bid += 1
    rows += [(bid, "a")]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            df, basket_col="bk", item_col="it", min_count=2
        ).collect()
    }
    # only (a,b) survives min_count=2: n=3, n(a)=5, n(b)=4, N=6
    assert set(out) == {("a", "b"), ("b", "a")}
    ab = out[("a", "b")]
    assert ab.n_pair == 3
    assert ab.support == pytest.approx(round(3 / 6, 6))
    assert ab.confidence == pytest.approx(round(3 / 5, 6))
    assert ab.lift == pytest.approx(round((3 / 5) / (4 / 6), 6))
    ba = out[("b", "a")]
    assert ba.confidence == pytest.approx(round(3 / 4, 6))


def test_copurchase_dedups_within_basket_and_guards_big_baskets(spark):
    # one basket with item repeated (must count once) + one 5-item
    # basket excluded by max_basket=4
    rows = [(1, "x"), (1, "x"), (1, "y")] + [(2, f"i{j}") for j in range(5)]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = copurchase_pairs(
        df, basket_col="bk", item_col="it", min_count=1, max_basket=4
    ).collect()
    assert {(r.item_a, r.item_b, r.n_baskets) for r in out} == {("x", "y", 1)}


def test_triangle_count_planted_graph(spark):
    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5 (0 new)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = triangle_count(df).collect()[0]
    assert r.n_triangles == 4
    assert r.n_edges == 7
    assert r.n_nodes == 5
    # wedges of K4 with a<b<c orientation: per middle vertex b, pairs
    # (a<b, c>b): b=2:1·2=2, b=3:2·1=2, b=4: a∈{1,2,3}, c=5 → 3; total 7
    assert r.n_wedges == 7


def test_triangle_count_orients_unoriented_input(spark):
    # both directions supplied: filter keeps a<b once, no double count
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)], "src long, dst long"
    )
    r = triangle_count(df).collect()[0]
    assert r.n_triangles == 1 and r.n_edges == 3
