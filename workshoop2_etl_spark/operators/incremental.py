"""Incremental aggregate maintenance (partial-aggregate algebra).

The reference recomputes its warehouse aggregates from scratch on
every DAG run (dags/merge_to_dw.py re-reads and re-joins the full
extract each schedule; the Metabase queries aggregate the full fact
table). At 100 TB a nightly full recompute is the bottleneck — the
standard fix is to persist a MERGEABLE aggregation state (the
"partial aggregate" Spark itself uses map-side) and fold only the
delta in:

    state(base ∪ delta) == merge(state(base), state(delta))

which holds exactly for the commutative-monoid metrics kept here —
``count``, ``sum``, ``min``, ``max`` — with ``avg = sum/count``
derived at finalize time (avg itself is NOT mergeable; its pieces
are). That identity is what the registered query proves against a
full-recompute oracle: maintain the state from a base load plus an
increment, finalize, and match DuckDB aggregating everything.

Plan shape at scale: the base state is one row per group (dashboard
cardinality — thousands, not billions); each refresh scans ONLY the
delta partition, partial-aggregates it map-side, and shuffles group
rows, never fact rows. The big table is read once per increment,
not once per refresh of every downstream aggregate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(
    df: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """Collapse rows to the mergeable per-group state: ``n`` plus
    ``sum_/min_/max_<col>`` for each value column. One hash
    aggregate; map-side partials keep the shuffle at group
    cardinality."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in value_cols:
        aggs += [
            F.sum(c).alias(f"sum_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def join_agg_state(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    keys: list[str],
    value_cols: list[str],
    *,
    broadcast_dim: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Mergeable state of a fact ⋈ dim aggregate — the incremental
    pattern users actually need at 100 TB: a dashboard grouped by DIM
    attributes (segment, region, category) over FACT measures. Each
    refresh enriches ONLY the delta's fact rows with the dim
    (broadcast by default — the dim is small by definition of being a
    grouping dimension) and partial-aggregates; the state merge then
    costs O(groups).

    The identity state(base⋈dim) ⊕ state(delta⋈dim) == state((base ∪
    delta)⋈dim) holds because the join distributes over the union —
    PROVIDED the dim is the same snapshot on both sides. A dim that
    changed between loads breaks it for the affected keys; re-derive
    those groups from the fact partition (or keep the dim SCD2 and
    join as-of the load time). ``keys`` may mix fact and dim columns.
    """
    enriched = fact.join(
        F.broadcast(dim) if broadcast_dim else dim, on, how
    )
    return aggregate_state(enriched, keys, value_cols)


def merge_states(
    keys: list[str], value_cols: list[str], *states: DataFrame
) -> DataFrame:
    """Fold any number of states into one: counts and sums add, mins
    min, maxes max — the monoid operation that makes refresh cost
    O(delta), not O(base). Inputs must share the state schema from
    :func:`aggregate_state`."""
    if not states:
        raise ValueError("merge_states needs at least one state")
    cols = states[0].columns
    for s in states[1:]:
        if s.columns != cols:
            raise ValueError(
                f"state schemas differ: {cols} vs {s.columns}"
            )
    unioned = reduce(DataFrame.unionByName, states)
    aggs = [F.sum("n").alias("n")]
    for c in value_cols:
        aggs += [
            F.sum(f"sum_{c}").alias(f"sum_{c}"),
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.max(f"max_{c}").alias(f"max_{c}"),
        ]
    return unioned.groupBy(*keys).agg(*aggs)


def finalize_state(
    state: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """Derive the non-mergeable metrics (avg) from the state and
    present the report shape: keys, n, then per value column
    ``total/lo/hi/avg`` (rounded per the repo's oracle convention —
    2 places for sums, 4 for averages)."""
    out = [F.col(k) for k in keys] + [F.col("n")]
    for c in value_cols:
        out += [
            F.round(F.col(f"sum_{c}"), 2).alias(f"total_{c}"),
            F.col(f"min_{c}").alias(f"lo_{c}"),
            F.col(f"max_{c}").alias(f"hi_{c}"),
            F.round(F.col(f"sum_{c}") / F.col("n"), 4).alias(f"avg_{c}"),
        ]
    return state.select(*out)
