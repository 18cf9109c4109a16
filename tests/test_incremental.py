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


# ---------------------------------------------------------------------------
# Round 8: refresh under DIM CHANGE (VERDICT r7 item 5)
# ---------------------------------------------------------------------------

def _dimchange_fixtures(spark):
    from workshoop2_etl_spark.operators.incremental import join_agg_state

    fact = spark.createDataFrame(
        [(i, i % 5, "f%d" % (i % 2), float(i * 10 + 1)) for i in range(20)],
        "id long, fk long, flag string, v double",
    )
    old_dim = spark.createDataFrame(
        [(k, "seg%d" % (k % 2), k * 100) for k in range(5)],
        "fk long, seg string, attr long",
    )
    # UPDATE fk=1 (seg1 -> segX), DELETE fk=3, INSERT fk=9 (no facts)
    new_dim = spark.createDataFrame(
        [(0, "seg0", 0), (1, "segX", 100), (2, "seg0", 200),
         (4, "seg0", 400), (9, "seg9", 900)],
        "fk long, seg string, attr long",
    )
    return fact, old_dim, new_dim, join_agg_state


def test_dim_changed_keys_update_delete_insert(spark):
    from workshoop2_etl_spark.operators.incremental import dim_changed_keys

    _, old_dim, new_dim, _ = _dimchange_fixtures(spark)
    got = sorted(r["fk"] for r in dim_changed_keys(old_dim, new_dim, "fk").collect())
    assert got == [1, 3, 9]


def test_dim_changed_keys_null_attribute_differs(spark):
    from workshoop2_etl_spark.operators.incremental import dim_changed_keys

    old = spark.createDataFrame([(1, None), (2, "x")], "fk long, a string")
    new = spark.createDataFrame([(1, "<null>"), (2, "x")], "fk long, a string")
    got = [r["fk"] for r in dim_changed_keys(old, new, "fk").collect()]
    # NULL attribute must differ from a literal sentinel-like string
    assert got == [1]
    # and identical snapshots (incl. the NULL) yield no changed keys
    assert dim_changed_keys(old, old, "fk").count() == 0


def test_dim_changed_keys_schema_mismatch_raises(spark):
    from workshoop2_etl_spark.operators.incremental import dim_changed_keys

    old = spark.createDataFrame([(1, "x")], "fk long, a string")
    new = spark.createDataFrame([(1, "x", 2)], "fk long, a string, b long")
    with pytest.raises(ValueError, match="schemas differ"):
        dim_changed_keys(old, new, "fk")


def test_refresh_dim_change_equals_full_recompute_dim_keys(spark):
    """Dashboard shape (keys entirely on the dim): refresh ==
    join_agg_state(fact, new_dim) exactly — update remaps, delete
    drops, insert with no facts is a no-op."""
    from workshoop2_etl_spark.operators.incremental import (
        refresh_join_agg_dim_change,
    )

    fact, old_dim, new_dim, join_agg_state = _dimchange_fixtures(spark)
    keys, vals = ["seg"], ["v"]
    base_state = join_agg_state(fact, old_dim, "fk", keys, vals)
    refreshed = refresh_join_agg_dim_change(
        base_state, fact, old_dim, new_dim, "fk", keys, vals
    )
    want = _report(join_agg_state(fact, new_dim, "fk", keys, vals), keys, vals)
    assert _report(refreshed, keys, vals) == want
    assert ("segX",) in want  # the migrated group exists


def test_refresh_dim_change_equals_full_recompute_mixed_keys(spark):
    """General branch (keys mix fact and dim columns)."""
    from workshoop2_etl_spark.operators.incremental import (
        refresh_join_agg_dim_change,
    )

    fact, old_dim, new_dim, join_agg_state = _dimchange_fixtures(spark)
    keys, vals = ["seg", "flag"], ["v"]
    base_state = join_agg_state(fact, old_dim, "fk", keys, vals)
    refreshed = refresh_join_agg_dim_change(
        base_state, fact, old_dim, new_dim, "fk", keys, vals
    )
    want = _report(join_agg_state(fact, new_dim, "fk", keys, vals), keys, vals)
    assert _report(refreshed, keys, vals) == want


def test_refresh_dim_change_noop_dim_keeps_state(spark):
    """An unchanged dim snapshot must keep every group untouched —
    the refresh degenerates to the identity."""
    from workshoop2_etl_spark.operators.incremental import (
        refresh_join_agg_dim_change,
    )

    fact, old_dim, _, join_agg_state = _dimchange_fixtures(spark)
    keys, vals = ["seg"], ["v"]
    base_state = join_agg_state(fact, old_dim, "fk", keys, vals)
    refreshed = refresh_join_agg_dim_change(
        base_state, fact, old_dim, old_dim, "fk", keys, vals
    )
    assert _report(refreshed, keys, vals) == _report(base_state, keys, vals)


def test_refresh_dim_change_minmax_survive_group_shrink(spark):
    """The reason subtraction doesn't work: fk=1's rows held the
    group max. After fk=1 migrates out of seg1, seg1's max must DROP
    to the remaining rows' max — only whole-group re-derivation gets
    this right."""
    from workshoop2_etl_spark.operators.incremental import (
        refresh_join_agg_dim_change,
    )

    fact = spark.createDataFrame(
        [(1, 1, 1000.0), (2, 3, 5.0), (3, 3, 7.0)],
        "id long, fk long, v double",
    )
    old_dim = spark.createDataFrame(
        [(1, "s"), (3, "s")], "fk long, seg string"
    )
    new_dim = spark.createDataFrame(
        [(1, "t"), (3, "s")], "fk long, seg string"
    )
    from workshoop2_etl_spark.operators.incremental import join_agg_state

    keys, vals = ["seg"], ["v"]
    base_state = join_agg_state(fact, old_dim, "fk", keys, vals)
    rep = _report(
        refresh_join_agg_dim_change(
            base_state, fact, old_dim, new_dim, "fk", keys, vals
        ),
        keys, vals,
    )
    assert rep[("s",)] == (2, 12.0, 5.0, 7.0, 6.0)
    assert rep[("t",)] == (1, 1000.0, 1000.0, 1000.0, 1000.0)


def test_refresh_dim_change_plan_broadcasts_everywhere(spark):
    """No shuffle of fact rows for any join in the refresh: changed
    keys, affected groups, pruned fks and the dim all broadcast."""
    from workshoop2_etl_spark.operators.incremental import (
        refresh_join_agg_dim_change,
    )

    fact, old_dim, new_dim, join_agg_state = _dimchange_fixtures(spark)
    keys, vals = ["seg"], ["v"]
    base_state = join_agg_state(fact, old_dim, "fk", keys, vals)
    refreshed = refresh_join_agg_dim_change(
        base_state, fact, old_dim, new_dim, "fk", keys, vals
    )
    refreshed.collect()
    plan = refreshed._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    # The ONE permitted sort-merge is the dim⋈dim digest diff: full
    # outer joins cannot broadcast, and both of its sides are
    # dim-sized. Every fact-touching join must be broadcast.
    smj = [ln for ln in final.splitlines() if "SortMergeJoin" in ln]
    assert len(smj) <= 1 and all("FullOuter" in ln for ln in smj), smj
    assert "CartesianProduct" not in final


def test_dim_changed_keys_keys_only_dim(spark):
    """A dim with no attribute columns degrades to a presence-only
    diff (insert/delete) instead of raising on zero-arg xxhash64."""
    from workshoop2_etl_spark.operators.incremental import dim_changed_keys

    old = spark.createDataFrame([(1,), (2,), (3,)], "fk long")
    new = spark.createDataFrame([(2,), (3,), (4,)], "fk long")
    got = sorted(r["fk"] for r in dim_changed_keys(old, new, "fk").collect())
    assert got == [1, 4]
    assert dim_changed_keys(old, old, "fk").count() == 0
