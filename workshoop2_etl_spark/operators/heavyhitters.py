"""Exact heavy hitters at scale: Misra–Gries partials + exact verify.

The naive "which items exceed φ of the corpus" plan —
``groupBy(item).count()`` then filter — shuffles one row per DISTINCT
item. Over a 100 TB corpus the token/URL/entity vocabulary is
billions of keys, so the shuffle (and the reducer-side hash tables)
scale with vocabulary, not with the answer. The classic streaming fix
is the Misra–Gries summary (Misra & Gries 1982; merge operation from
Agarwal et al., "Mergeable Summaries", PODS 2012): a bounded map of
``capacity`` counters per partition whose merged key set provably
contains every item with true frequency > N/(capacity+1).

Two-phase plan here:

1. **Partial summaries** (:func:`misra_gries_partials`): one
   ``mapInPandas`` pass keeps a ≤``capacity``-entry counter dict per
   partition (batched MG: add the batch's value_counts, then subtract
   the (capacity+1)-th largest counter and drop the non-positive —
   the mergeable-summaries merge step). Output is at most
   ``partitions × capacity`` candidate rows, independent of
   vocabulary size.
2. **Exact verify** (:func:`heavy_hitters`): the distinct candidate
   set (small — bounded by partitions × capacity, e.g. 1000
   executors × 4096 ≈ 4M short strings) broadcasts into a semi-join
   that restricts the exact count to candidates only; the final
   filter compares against ``ceil(support × N)`` with N computed
   distributively (1-row broadcast crossJoin, no driver collect).

Completeness (why no heavy hitter can be missed): if an item's global
count C > N/(k+1) = Σ nᵢ/(k+1), then by pigeonhole some partition has
cᵢ > nᵢ/(k+1), and MG with k counters retains every item whose
partition-local count exceeds nᵢ/(k+1). Hence requiring
``support ≥ 1/(capacity+1)`` makes the candidate set a superset of
the true φ-heavy hitters, and the verify pass makes the final answer
EXACT — which is what lets this operator carry a plain SQL oracle
(``HAVING count(*) >= ceil(support * total)``) despite the sketch in
the middle.

The reference has no sketch operators (575 lines of eager pandas);
this generalizes its ``value_counts`` (dags/limpiezaSpotify.py:94-99
uses full value counting on a small column) to the
vocabulary-unbounded regime.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_absorb(counters: dict, batch_counts: pd.Series, capacity: int) -> None:
    """Fold one batch's value counts into the bounded MG counter dict.

    When the dict exceeds ``capacity``, subtract the (capacity+1)-th
    largest counter value from every counter and drop the
    non-positive — the Agarwal et al. mergeable-summaries merge.
    Each such trim decrements ≥ capacity+1 logical occurrences per
    unit, so the total undercount of any surviving counter is
    ≤ n/(capacity+1) over the partition.
    """
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > capacity:
        vals = sorted(counters.values(), reverse=True)
        cut = vals[capacity]
        for item in list(counters):
            nv = counters[item] - cut
            if nv > 0:
                counters[item] = nv
            else:
                del counters[item]


def misra_gries_partials(
    items: DataFrame, item_col: str, *, capacity: int
) -> DataFrame:
    """Per-partition Misra–Gries summaries: ≤ ``capacity`` rows of
    ``(item, lb)`` per partition, where ``lb`` is the surviving
    counter (a lower bound on the partition-local count, undercounted
    by at most nᵢ/(capacity+1)).

    One narrow pass — no shuffle; memory is O(capacity) per
    partition regardless of vocabulary size.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            col = pdf[item_col].dropna()
            if len(col):
                _mg_absorb(counters, col.value_counts(), capacity)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "lb": list(counters.values())}
            )

    return items.select(item_col).mapInPandas(
        summarize, schema="item string, lb long"
    )


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    *,
    support: float,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT φ-heavy hitters: every item with count ≥ ceil(support·N),
    computed without ever aggregating the full vocabulary.

    ``capacity`` defaults to the smallest value satisfying the
    completeness bound ``support ≥ 1/(capacity+1)`` (i.e.
    ``ceil(1/support)``); passing a smaller value raises, since the
    candidate set could then miss true heavy hitters.

    Returns ``(item, n)`` with exact counts. Plan shape: narrow MG
    pass → tiny candidate broadcast → semi-joined exact aggregate
    whose shuffle carries candidate items only → threshold filter
    against a 1-row broadcast total.
    """
    if not 0.0 < support <= 1.0:
        raise ValueError(f"support must be in (0, 1], got {support}")
    min_cap = int(1.0 / support)  # support >= 1/(cap+1)  <=>  cap >= 1/support - 1
    if capacity is None:
        capacity = min_cap
    elif support < 1.0 / (capacity + 1):
        raise ValueError(
            f"capacity {capacity} cannot certify support {support}: "
            f"need capacity >= {min_cap} (support >= 1/(capacity+1))"
        )
    candidates = (
        misra_gries_partials(items, item_col, capacity=capacity)
        .select("item")
        .distinct()
    )
    total = items.select(
        F.count(item_col).cast("double").alias("__total")
    )
    return (
        items.join(
            F.broadcast(candidates),
            items[item_col] == candidates["item"],
            "left_semi",
        )
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") >= F.ceil(F.lit(support) * F.col("__total")))
        .select("item", "n")
    )
