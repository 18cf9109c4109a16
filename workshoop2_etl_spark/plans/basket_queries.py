"""Registry entries for market-basket and co-occurrence-graph
analytics over the lineitem fact: pairwise association rules
(support / confidence / lift) and the triangle census of the
co-purchase graph. Both oracle-backed (DuckDB twins) and demoted past
the driver's 50-row window — hash-checked by the local mirror
(tests/test_oracle_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.basket import association_rules
from workshoop2_etl_spark.operators.graph import triangle_count
from workshoop2_etl_spark.plans.reference_queries import _register, _t

_RULES_SQL = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
), p AS (
  SELECT x.it AS i1, y.it AS i2, count(*) AS n
  FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
  GROUP BY 1, 2 HAVING count(*) >= 2
), m AS (
  SELECT it, count(*) AS nm FROM b GROUP BY 1
), t AS (
  SELECT count(DISTINCT bk) AS n FROM b
), bidir AS (
  SELECT i1 AS a, i2 AS c, n FROM p
  UNION ALL
  SELECT i2, i1, n FROM p
)
SELECT a AS antecedent, c AS consequent, CAST(bidir.n AS BIGINT) AS n_pair,
       round(bidir.n / t.n, 6) AS support,
       round(bidir.n / ma.nm, 6) AS confidence,
       round((bidir.n / ma.nm) / (mc.nm / t.n), 6) AS lift
FROM bidir JOIN m ma ON bidir.a = ma.it JOIN m mc ON bidir.c = mc.it CROSS JOIN t
ORDER BY lift DESC, antecedent ASC, consequent ASC
LIMIT 100
"""


@_register("association_rules_lineitem", _RULES_SQL)
def association_rules_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 co-purchase rules by lift over order baskets (pairs in
    ≥2 baskets). The pair shuffle is Σ basket² — baskets are
    order-sized, so a small constant × the fact table; marginals and
    the basket count broadcast back onto the surviving pair aggregate
    (operators/basket.py). (rounded lift desc, antecedent, consequent)
    is a total order, so the cut is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    out = association_rules(
        li, basket_col="l_orderkey", item_col="l_partkey", min_count=2
    )
    return out.orderBy(
        F.desc("lift"), F.asc("antecedent"), F.asc("consequent")
    ).limit(100)


_TRI_SQL = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
), p AS (
  SELECT x.it AS a, y.it AS bb, count(*) AS n
  FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
  GROUP BY 1, 2 HAVING count(*) >= 2
), e AS (
  SELECT a, bb FROM p
), w AS (
  SELECT e1.a, e1.bb, e2.bb AS c FROM e e1 JOIN e e2 ON e1.bb = e2.a
), tri AS (
  SELECT 1 FROM w JOIN e ON w.a = e.a AND w.c = e.bb
)
SELECT (SELECT CAST(count(*) AS BIGINT)
        FROM (SELECT a AS v FROM e UNION SELECT bb FROM e)) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM w) AS n_wedges,
       (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles
"""


@_register("triangles_copurchase_lineitem", _TRI_SQL)
def triangles_copurchase_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Triangle census of the co-purchase graph (parts sharing ≥2
    order baskets): the join-based a<b<c formulation — wedges via one
    equi-join on the middle vertex, closed by the (a,c) edge probe
    (operators/graph.py:triangle_count; degree-ordered orientation is
    the documented skew path at scale)."""
    from workshoop2_etl_spark.operators.basket import copurchase_pairs

    li = _t(spark, sf_dir, "lineitem")
    edges = copurchase_pairs(
        li, basket_col="l_orderkey", item_col="l_partkey", min_count=2
    ).select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
    return triangle_count(edges)


@_register("label_propagation_copurchase")  # rows-only: iterative
def label_propagation_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Product communities by synchronous label propagation over the
    co-purchase graph (parts co-ordered ≥3 times). Rows-only like
    pagerank: a fixed-round iterative algorithm has no SQL twin; the
    deterministic tie-break (most frequent neighbor label, then
    smallest) is property-tested against a Python reference in
    tests/test_graph.py. Community sizes summarize the result so the
    output is stable and small."""
    from workshoop2_etl_spark.operators.basket import copurchase_pairs
    from workshoop2_etl_spark.operators.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    edges = copurchase_pairs(
        li, basket_col="l_orderkey", item_col="l_partkey", min_count=3
    ).select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    )
    labels = label_propagation(edges, iterations=4)
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") >= 2)
        .orderBy(F.desc("n_members"), F.asc("label"))
        .limit(50)
    )


@_register("kcore_word_cooccurrence")  # rows-only: iterative peel
def kcore_word_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 8-core of the word co-occurrence graph (Seidman 1983):
    vocabulary that survives iterated deletion of low-degree nodes —
    the dense core a keyword extractor or graph embedding would seed
    from. The substrate is words co-occurring in ≥ 20 documents
    (vocabulary-bounded at ANY corpus scale, unlike the co-purchase
    graph, which thins out as the catalog grows — measured: its
    4-core is empty at sf0.1). Rows-only like the other iterative
    graph entries (the peel's fixpoint loop has no SQL twin;
    order-independence is property-tested against a Python peel in
    tests/test_graph.py). Output: surviving nodes with in-core
    degrees, top 50."""
    from workshoop2_etl_spark.operators.basket import copurchase_pairs
    from workshoop2_etl_spark.operators.graph import k_core

    docs = _t(spark, sf_dir, "documents")
    edges = copurchase_pairs(
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col("text")), r"\s+"),
                        lambda t: t != "",
                    )
                )
            ).alias("word"),
        ),
        basket_col="doc_id",
        item_col="word",
        min_count=20,
    ).select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
    core = k_core(edges, k=8)
    deg = (
        core.select(F.col("src").alias("node"))
        .unionByName(core.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.orderBy(F.desc("degree"), F.asc("node")).limit(50)
