"""Iterative graph algorithms as DataFrame loops: PageRank, and
TextRank keyword extraction built on it.

The iterative-algorithm class (PageRank, label propagation, k-core)
is where naive Spark code dies of LINEAGE: each iteration's plan
contains every prior iteration's joins, so iteration k plans O(k)
shuffles and the driver eventually OOMs on the plan tree itself. The
loop here truncates lineage with an eager ``localCheckpoint`` per
iteration — each iteration's physical work is exactly one join + one
aggregate, regardless of k. (Same discipline as the distributed
min-label propagation in ``dedup.connected_components``.)

Scale: ranks and degrees shuffle on the node key; edge fan-out is the
join — at 100 TB of edges this is the standard Pregel-in-DataFrames
formulation with per-superstep materialization. The dangling-mass
scalar is a one-row broadcast cross-join, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list (uniform teleport, dangling
    mass redistributed uniformly — the textbook power iteration):

    r'(v) = (1−d)/N + d · (Σ_{u→v} r(u)/outdeg(u) + dangling/N)

    Returns (``node``, ``rank`` double); Σ rank = 1 at every step.
    Deterministic: same edges → same ranks (floating-point sums are
    aggregated per node; cross-engine parity is checked by property
    test against a numpy power iteration, not an SQL oracle —
    iteration is exactly what SQL can't express... except via
    recursive CTEs, which cannot re-aggregate per step).
    """
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # one driver scalar, reused every step
    out_deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    # (src, dst, 1/outdeg) — the transition fragment, reused each step.
    trans = (
        edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("__dst"))
        .join(out_deg, "node")
        .select("node", "__dst", (1.0 / F.col("__deg")).alias("__w"))
        .persist()
    )
    has_out = out_deg.select("node")
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    prev = None
    for _ in range(iterations):
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        contribs = (
            trans.join(ranks, "node")
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__w")).alias("__c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.col("__dm") / n_nodes
                    )
                ).alias("rank"),
            )
            # Eager lineage cut: without this, iteration k's plan
            # embeds all k-1 prior joins and planning time explodes.
            .localCheckpoint(eager=True)
        )
        # Release the superseded iteration's checkpoint blocks NOW:
        # leaving k generations of rank blocks to the ContextCleaner
        # pressures the block manager for the rest of the session
        # (measured as a broad slowdown across later queries).
        if prev is not None:
            prev.unpersist()
        prev = ranks
    trans.unpersist()
    nodes.unpersist()
    return ranks


def textrank_keywords(
    df: DataFrame,
    text_col: str,
    *,
    k: int = 15,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """TextRank (Mihalcea & Tarau 2004) keyword extraction: adjacent
    lower-cased tokens form co-occurrence edges (both directions, the
    undirected-graph convention), PageRank ranks the vocabulary, top-k
    keywords come back as (``token``, ``rank``, ``rk``).

    Ties break on ascending token after a 8-dp round so float noise
    cannot reorder equal-rank words.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    pairs = df.select(toks.alias("__t")).select(
        F.posexplode("__t").alias("__i", "src"),
        F.col("__t"),
    )
    fwd = pairs.select(
        # F.get: NULL past the last token (ANSI mode makes [] throw)
        "src", F.get(F.col("__t"), F.col("__i") + 1).alias("dst")
    ).filter(F.col("dst").isNotNull())
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(
        edges, damping=damping, iterations=iterations
    )
    return (
        ranks.select(
            F.col("node").alias("token"),
            F.round("rank", 8).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("token"))
        .limit(k)
        # row_number over ≤k rows — the single partition is the
        # already-limited result, not the vocabulary.
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("rank"), F.asc("token")))
            .cast("long"),
        )
    )
