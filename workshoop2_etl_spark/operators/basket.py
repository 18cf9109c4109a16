"""Market-basket analytics: co-occurrence pairs and association
rules (support / confidence / lift) over (basket, item) facts — the
classic retail companion to the star-schema dashboards (Agrawal &
Srikant, VLDB 1994 define the measures; pairs-only here, which is
what production recommenders actually ship).

Scale shape: ONE basket-keyed shuffle groups each basket's distinct
items into a sorted array; the C(n,2) pair expansion is then a
higher-order transform INSIDE the row — no self-join, no second
data-sized shuffle (the earlier self-join formulation paid one, and
bench showed it). Pair volume is bounded by Σ_b |basket_b|² —
baskets are order-sized (single digits), NOT corpus-sized. Item
marginals are a separate aggregate broadcast back onto the (far
smaller) surviving pair aggregate. No collect, no cross-join, no
per-item loop. A pathologically large basket would square — the
``max_basket`` guard drops those baskets loudly rather than letting
one degenerate basket explode quadratically (same policy as
``dedup.near_dedup``'s ``max_bucket_size``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_pairs(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_basket: int = 1000,
) -> DataFrame:
    """Distinct co-occurring item pairs with their basket counts.

    Items are deduplicated within a basket first (map-side distinct
    on (basket, item)); pairs are oriented ``item_a < item_b`` so each
    unordered pair appears once. Baskets larger than ``max_basket``
    items are excluded (squared fan-out guard).

    Returns (``item_a``, ``item_b``, ``n_baskets`` long).
    """
    baskets = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .groupBy("__b")
        .agg(F.array_sort(F.collect_set("__i")).alias("__items"))
    )
    if max_basket is not None:
        baskets = baskets.filter(F.size("__items") <= max_basket)
    # Pair expansion as a higher-order transform over the sorted
    # per-basket array — each basket emits its C(n,2) oriented pairs
    # WITHOUT a basket-keyed self-join (one shuffle to group, zero to
    # pair; the self-join formulation paid a second data-sized
    # shuffle plus join bookkeeping for the same rows).
    pair_structs = F.flatten(
        F.transform(
            "__items",
            lambda x, i: F.transform(
                F.slice(
                    F.col("__items"),
                    i + 2,
                    F.greatest(F.size("__items") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    out = (
        baskets.select(F.explode(pair_structs).alias("__p"))
        .groupBy(
            F.col("__p.a").alias("item_a"), F.col("__p.b").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    if min_count > 1:
        out = out.filter(F.col("n_baskets") >= min_count)
    return out


def association_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_basket: int = 1000,
) -> DataFrame:
    """Pairwise association rules a→b with the canonical measures:

        support(a→b)    = n(a,b) / N
        confidence(a→b) = n(a,b) / n(a)
        lift(a→b)       = confidence / (n(b) / N)

    Both directions of every surviving pair are emitted (confidence
    is asymmetric). N is the number of qualifying baskets (after the
    ``max_basket`` guard); item marginals count baskets containing
    the item. Measures are rounded to 6 dp so cross-engine float
    noise cannot reorder rankings.

    Returns (``antecedent``, ``consequent``, ``n_pair`` long,
    ``support``, ``confidence``, ``lift``).

    Plan: pair aggregate (bounded, see module docstring) ⋈ broadcast
    item marginals ⋈ one-row broadcast basket count.
    """
    b = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket is not None:
        sizes = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__sz"))
        b = b.join(
            sizes.filter(F.col("__sz") <= max_basket).select("__b"), "__b"
        )
    # b feeds three branches (pairs, marginals, total). Deliberately
    # NOT persisted here: the operator returns a lazy plan and could
    # never release the blocks; callers running it repeatedly can
    # persist the (basket,item) projection themselves. The recompute
    # is a distinct over two narrow columns.
    pairs = copurchase_pairs(
        b,
        basket_col="__b",
        item_col="__i",
        min_count=min_count,
        max_basket=None,  # already guarded upstream
    )
    marg = b.groupBy(F.col("__i").alias("__item")).agg(
        F.count(F.lit(1)).alias("__n_item")
    )
    total = b.agg(F.countDistinct("__b").alias("__n"))
    # Both directions emitted IN-ROW (explode of the two orientation
    # structs) rather than a union of two projections: the union form
    # re-executed the pair-count aggregate once per branch (r15,
    # guide §2.4 — same rewrite as the graph symmetrization; row
    # multiset identical).
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                    F.col("n_baskets").alias("n_pair"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                    F.col("n_baskets").alias("n_pair"),
                ),
            )
        ).alias("__r")
    ).select("__r.antecedent", "__r.consequent", "__r.n_pair")
    out = (
        both.join(
            F.broadcast(marg.withColumnRenamed("__n_item", "__n_ante")),
            F.col("antecedent") == F.col("__item"),
        )
        .drop("__item")
        .join(
            F.broadcast(marg.withColumnRenamed("__n_item", "__n_cons")),
            F.col("consequent") == F.col("__item"),
        )
        .drop("__item")
        .crossJoin(F.broadcast(total))
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            F.round(F.col("n_pair") / F.col("__n"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("__n_ante"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_pair") / F.col("__n_ante"))
                / (F.col("__n_cons") / F.col("__n")),
                6,
            ).alias("lift"),
        )
    )
    return out
