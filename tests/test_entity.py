"""Entity-resolution semantics: transitive clustering, weight
thresholds, and null-attribute handling — the planted-registry
oracle-parity query only exercises disjoint pairs."""

from __future__ import annotations

import pytest

from workshoop2_etl_spark.operators.entity import resolve_entities

WEIGHTS = {"city": (16, -8)}


def _resolve(spark, rows, threshold=28):
    df = spark.createDataFrame(rows, "id long, name string, city string")
    out = resolve_entities(
        df, "id", "name",
        agree_weights=WEIGHTS, name_weights=(24, 12),
        threshold=threshold, max_distance=1,
    ).collect()
    return {r["id"]: (r["entity_id"], r["is_canonical"]) for r in out}


def test_transitive_chain_one_entity(spark):
    # ann ↔ anne within d=1, anne ↔ annes within d=1, but ann ↔ annes
    # is d=2 — never a candidate pair. Transitivity must still fuse
    # all three (same city → every candidate pair scores 24/28+).
    got = _resolve(spark, [
        (1, "ann", "k"), (2, "anne", "k"), (3, "annes", "k"),
        (9, "zzz", "q"),
    ])
    assert got == {1: (1, True), 2: (1, False), 3: (1, False)}


def test_disagreeing_attribute_blocks_lookalikes(spark):
    # same near-name, different city: 12 - 8 = 4 < 28 → no link
    got = _resolve(spark, [(1, "bob", "x"), (2, "rob", "y")])
    assert got == {}
    # same city: 12 + 16 = 28 → linked
    got = _resolve(spark, [(1, "bob", "x"), (2, "rob", "x")])
    assert got == {1: (1, True), 2: (1, False)}


def test_null_attribute_is_disagreement(spark):
    got = _resolve(spark, [(1, "bob", None), (2, "rob", "x")])
    assert got == {}
    # both-NULL is ALSO a disagreement (plain `=`, matching the
    # DuckDB oracle semantics): NULL carries no identity evidence
    got = _resolve(spark, [(1, "bob", None), (2, "rob", None)])
    assert got == {}


def test_exact_name_weight_used(spark):
    # identical names, different city: 24 - 8 = 16 < 28 at the
    # default threshold; drops to a link at threshold 16
    rows = [(1, "sam", "x"), (2, "sam", "y")]
    assert _resolve(spark, rows) == {}
    assert _resolve(spark, rows, threshold=16) == {
        1: (1, True), 2: (1, False)
    }
