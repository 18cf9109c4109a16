"""Entity resolution: blocked candidate pairs → Fellegi–Sunter field
scoring → transitive clustering → canonical records.

The master-data / record-linkage pipeline (Fellegi & Sunter 1969) as
a composition of this repo's primitives, each already proven at its
own scale shape:

1. **Blocking** — deletion-neighborhood candidate generation
   (:func:`..operators.merge.fuzzy_join_blocked`): pairs within small
   edit distance found by an equi-join on ≤d-deletion variants, never
   the |R|² loop. Pigeonhole-complete, so blocking loses no true pair.
2. **Scoring** — integer agreement weights per field (the log-odds
   m/u weights of Fellegi–Sunter, pre-quantized): name similarity
   plus exact agreement on corroborating attributes. Integer sums —
   cross-engine exact, no float thresholds.
3. **Clustering** — :func:`..operators.dedup.duplicate_clusters`
   (union-find under the 1M-edge broadcast threshold, distributed
   min-label propagation above it) makes matching transitive: A≈B
   and B≈C land A, B, C in one entity even when A and C were never a
   candidate pair.
4. **Canonicalization** — each entity keeps its min-id member as the
   survivor record (swap in ``cleaning.mode_or_first_dedup`` for
   field-wise consolidation when fields conflict).

Scale shape: the only data-sized shuffles are the variant equi-join
(id + variant digests, no payloads) and the final cluster join; the
scoring join carries id pairs plus the few agreement fields;
clustering is edge-bounded, and real linkage graphs are sparse by
construction (blocking caps candidates per record).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.dedup import duplicate_clusters
from workshoop2_etl_spark.operators.merge import fuzzy_join_blocked

__all__ = ["resolve_entities"]


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    agree_weights: Mapping[str, tuple[int, int]],
    name_weights: tuple[int, int] = (24, 12),
    threshold: int = 28,
    max_distance: int = 1,
    max_bucket_size: int | None = None,
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Resolve near-duplicate records of ``df`` into entities.

    ``agree_weights`` maps each corroborating column to its
    ``(agree, disagree)`` integer weights (Fellegi–Sunter log-odds,
    pre-quantized — a copied attribute is strong evidence FOR, a
    differing one evidence AGAINST, so lookalike neighbors with
    different attributes fall under ``threshold``). ``name_weights``
    scores the name field by edit distance: exact, within
    ``max_distance``. A candidate pair links its records iff the
    total weight ≥ ``threshold``; linking is transitive via
    connected components.

    ``block_cols`` adds conjunctive blocking keys: candidate pairs
    must agree EXACTLY on every listed column before the name verify
    runs (classic multi-key blocking — on a registry whose name space
    is dense, e.g. serial-numbered ids where every name has dozens of
    edit-distance-1 neighbors, blocking shrinks candidates by the
    key's selectivity). The documented recall trade: a true pair
    that disagrees — or is NULL — on a blocking key is never
    considered, so block on stable attributes only.

    Returns one row per member of a multi-record entity:
    ``(id_col, entity_id, is_canonical)`` with ``entity_id`` the
    cluster's min id. Unmatched records are absent (each is its own
    entity), keeping the output proportional to the duplicates, not
    the registry.
    """
    a = df.select(
        F.col(id_col).alias("__ida"),
        F.col(name_col).alias("__na"),
        *[F.col(c).alias(f"__la_{c}") for c in block_cols],
    )
    b = df.select(
        F.col(id_col).alias("__idb"),
        F.col(name_col).alias("__nb"),
        *[F.col(c).alias(f"__rb_{c}") for c in block_cols],
    )
    cand = (
        fuzzy_join_blocked(
            a, b, "__ida", "__na", "__idb", "__nb",
            max_distance=max_distance,
            max_bucket_size=max_bucket_size,
            extra_on=[(f"__la_{c}", f"__rb_{c}") for c in block_cols],
        )
        .filter(F.col("__ida") < F.col("__idb"))
    )
    attrs = list(agree_weights)
    side_a = df.select(
        F.col(id_col).alias("__ida"),
        *[F.col(c).alias(f"__a_{c}") for c in attrs],
    )
    side_b = df.select(
        F.col(id_col).alias("__idb"),
        *[F.col(c).alias(f"__b_{c}") for c in attrs],
    )
    exact_w, near_w = name_weights
    score = F.when(F.col("__na") == F.col("__nb"), exact_w).otherwise(
        near_w
    )
    for c, (agree, disagree) in agree_weights.items():
        # plain equality: a NULL attribute on EITHER side (including
        # both-NULL) is a DISagreement — the NULL comparison falls
        # through to otherwise().  Matches the DuckDB oracle's `=`.
        score = score + F.when(
            F.col(f"__a_{c}") == F.col(f"__b_{c}"), agree
        ).otherwise(disagree)
    matched = (
        cand.join(side_a, "__ida")
        .join(side_b, "__idb")
        .withColumn("__score", score)
        .filter(F.col("__score") >= threshold)
        .select(
            F.col("__ida").alias(f"{id_col}_a"),
            F.col("__idb").alias(f"{id_col}_b"),
        )
    )
    clusters = duplicate_clusters(matched, id_col)
    return clusters.select(
        id_col,
        F.col("cluster_id").alias("entity_id"),
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )
