"""Partial-aggregate algebra: the merge identity must hold for any
split of the input, any number of shards, and empty shards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.incremental import (
    aggregate_state,
    finalize_state,
    merge_states,
)

KEYS = ["k"]
VALS = ["v"]


def _rows():
    return [("a", float(i)) for i in range(10)] + [
        ("b", float(i * 3)) for i in range(7)
    ]


def _report(df, keys, vals):
    return {
        tuple(r[k] for k in keys): (r["n"], r["total_v"], r["lo_v"], r["hi_v"], r["avg_v"])
        for r in finalize_state(df, keys, vals).collect()
    }


def test_merge_identity_three_way(spark):
    df = spark.createDataFrame(_rows(), "k string, v double")
    full = aggregate_state(df, KEYS, VALS)
    shards = [
        aggregate_state(df.filter(F.col("v") % 3 == i), KEYS, VALS)
        for i in range(3)
    ]
    merged = merge_states(KEYS, VALS, *shards)
    assert _report(merged, KEYS, VALS) == _report(full, KEYS, VALS)


def test_empty_delta_is_identity(spark):
    df = spark.createDataFrame(_rows(), "k string, v double")
    full = aggregate_state(df, KEYS, VALS)
    empty = aggregate_state(df.filter(F.lit(False)), KEYS, VALS)
    merged = merge_states(KEYS, VALS, full, empty)
    assert _report(merged, KEYS, VALS) == _report(full, KEYS, VALS)


def test_delta_introduces_new_group(spark):
    base = spark.createDataFrame([("a", 1.0)], "k string, v double")
    delta = spark.createDataFrame([("z", 5.0), ("z", 7.0)], "k string, v double")
    merged = merge_states(
        KEYS, VALS,
        aggregate_state(base, KEYS, VALS),
        aggregate_state(delta, KEYS, VALS),
    )
    rep = _report(merged, KEYS, VALS)
    assert rep[("z",)] == (2, 12.0, 5.0, 7.0, 6.0)
    assert rep[("a",)] == (1, 1.0, 1.0, 1.0, 1.0)


def test_join_agg_merge_identity_any_split(spark):
    """state(base⋈dim) ⊕ state(delta⋈dim) == state(all⋈dim) for every
    split point, including all-base and all-delta."""
    from workshoop2_etl_spark.operators.incremental import join_agg_state

    fact = spark.createDataFrame(
        [(i, i % 4, float(i * 10)) for i in range(12)],
        "id long, fk long, v double",
    )
    dim = spark.createDataFrame(
        [(k, "seg%d" % (k % 2)) for k in range(4)], "fk long, seg string"
    )
    keys, vals = ["seg"], ["v"]
    full = join_agg_state(fact, dim, "fk", keys, vals)
    want = _report(full, keys, vals)
    for cut in (0, 5, 12):
        merged = merge_states(
            keys, vals,
            join_agg_state(fact.filter(F.col("id") < cut), dim, "fk", keys, vals),
            join_agg_state(fact.filter(F.col("id") >= cut), dim, "fk", keys, vals),
        )
        assert _report(merged, keys, vals) == want


def test_join_agg_state_broadcasts_dim(spark):
    """The dim side must be broadcast — no shuffle of delta fact rows
    for the join itself."""
    from workshoop2_etl_spark.operators.incremental import join_agg_state

    fact = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(12)],
        "id long, fk long, v double",
    )
    dim = spark.createDataFrame(
        [(k, "s%d" % k) for k in range(4)], "fk long, seg string"
    )
    st = join_agg_state(fact, dim, "fk", ["seg"], ["v"])
    st.collect()
    plan = st._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_join_agg_mixed_fact_dim_keys(spark):
    """keys may mix fact and dim columns."""
    from workshoop2_etl_spark.operators.incremental import join_agg_state

    fact = spark.createDataFrame(
        [(1, 0, "x", 2.0), (2, 0, "y", 4.0), (3, 1, "x", 8.0)],
        "id long, fk long, flag string, v double",
    )
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b")], "fk long, seg string"
    )
    keys, vals = ["seg", "flag"], ["v"]
    merged = merge_states(
        keys, vals,
        join_agg_state(fact.filter("id <= 1"), dim, "fk", keys, vals),
        join_agg_state(fact.filter("id > 1"), dim, "fk", keys, vals),
    )
    rep = _report(merged, keys, vals)
    assert rep[("a", "x")] == (1, 2.0, 2.0, 2.0, 2.0)
    assert rep[("a", "y")] == (1, 4.0, 4.0, 4.0, 4.0)
    assert rep[("b", "x")] == (1, 8.0, 8.0, 8.0, 8.0)


def test_schema_mismatch_raises(spark):
    a = aggregate_state(
        spark.createDataFrame([("a", 1.0)], "k string, v double"), KEYS, VALS
    )
    b = spark.createDataFrame([("a", 1)], "k string, n long")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_states(KEYS, VALS, a, b)
    with pytest.raises(ValueError, match="at least one"):
        merge_states(KEYS, VALS)
