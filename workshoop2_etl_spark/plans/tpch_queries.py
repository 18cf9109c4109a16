"""Classic decision-support queries (TPC-H shapes adapted to the
driver's synthetic star schema) — the canonical optimizer showcases a
reference user graduating from pandas dashboards would reach for next.

Why these belong in the engine: the reference's dashboard queries
(`SURVEY.md` §2.6, Metabase PDF) are all single-join rank/aggregate
shapes; the TPC-H shapes add the *hard* relational patterns — multi-way
star joins with two independent dimension paths (Q7/Q8), correlated
per-group thresholds (Q17/Q18), disjunctive cross-table predicates
(Q19), scan-dominated selective aggregation (Q6) — each expressed so
Catalyst produces the plan you'd want at 100 TB:

- dims (`nation`, `supplier`, `customer`, filtered `part`) broadcast;
  the only shuffles are fact-side aggregations on their group keys;
- Q6 is a pure scan-agg: both filters reach the parquet reader
  (`PushedFilters`), no shuffle at all beyond the final partial-agg
  exchange (asserted in tests/test_plan_shapes.py);
- Q17/Q18's "compare each row to its group's aggregate" uses a
  self-aggregate + broadcast-back join (Q17, brand-filtered → tiny) or
  a pre-aggregated semi-join (Q18) — never a windowed full sort;
- Q19's OR-of-ANDs predicate is left as one disjunction so Catalyst
  can push the common `p_brand IN (...)` prefix into the part scan and
  AQE can size the broadcast.

The queries are adapted (columns the synthetic schema lacks —
l_shipmode, o_shippriority, l_commitdate — are substituted with
equivalents) but keep each original's *shape*, which is what the
optimizer exercises. TPC-H is public (tpc.org); shapes cited per query.

Every entry is oracle-backed (DuckDB twin) and demoted past the
driver's 50-row window — hash-checked by the local mirror
(tests/test_oracle_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workshoop2_etl_spark.plans.reference_queries import _register, _t

def _rev():
    # Built lazily — Column construction needs an active SparkContext,
    # and this module imports before the session exists.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


@_register("tpch_q3_unshipped_orders", _Q3_SQL)
def tpch_q3_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): orders placed before a date
    whose line items ship after it — revenue still in flight. Fact-fact
    equi-join on the order key with both date filters pushed to the
    scans; top-10 via TakeOrderedAndProject, not a global sort."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@_register("tpch_q6_forecast_revenue", _Q6_SQL)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    scan-dominated aggregate — all three predicates reach the parquet
    scan as PushedFilters, the projection prunes to three columns, and
    the only exchange is the single-row partial-agg merge. At 100 TB
    this query is I/O-bound by design; anything else is a bug."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


@_register("tpch_q7_volume_shipping", _Q7_SQL)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations
    by year. Two independent dimension paths hang off the fact — the
    supplier side and the customer side — and BOTH are broadcast
    (supplier and customer are dims; nation is pre-joined into each
    before broadcasting, so the fact row never shuffles for dimension
    resolution). The nation-pair disjunction is applied post-join where
    both names are in scope; Catalyst still prunes each broadcast to
    the two named nations via the pushed-down IN filter."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(nation.filter(pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(nation.filter(pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


_Q8_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY 1
"""


@_register("tpch_q8_market_share", _Q8_SQL)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of PROMO
    part revenue per year. The selective part filter (1/6 of parts) is
    the join's best reducer, so the filtered part dim broadcasts FIRST
    — lineitem rows for other part types die before touching orders.
    The share is a conditional-sum ratio in one aggregation pass, not
    two queries joined."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp_nat = (
        _t(spark, sf_dir, "supplier")
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("n_name") == "NATION_3", rev).otherwise(0.0)
                )
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


_Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
"""


@_register("tpch_q14_promo_revenue", _Q14_SQL)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue
    from PROMO parts. The month filter prunes the fact at the scan;
    part broadcasts carrying only (p_partkey, p_type); the CASE ratio
    is one pass."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue")
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


@_register("tpch_q15_top_supplier", _Q15_SQL)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) achieving the quarter's
    maximum revenue — tie-safe (every argmax row returns, unlike
    LIMIT 1). The per-supplier aggregate is computed once; its scalar
    max comes back as a one-row broadcast joined on equality, the
    set-wise argmax idiom (no window over a single global partition).
    Rounding happens BEFORE the max-compare on both sides so the
    equality is exact."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q17_SQL = """
WITH pavg AS (
  SELECT l_partkey AS a_partkey, 0.2 * avg(l_quantity) AS qty_thresh
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
  GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pavg ON l_partkey = a_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < qty_thresh
"""


@_register("tpch_q17_small_quantity_revenue", _Q17_SQL)
def tpch_q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from orders
    below 20% of a part's average order quantity. The correlated
    subquery becomes a brand-filtered per-part aggregate broadcast
    back onto the same brand-filtered fact slice — the per-group-
    threshold idiom without any window sort. The brand filter applies
    BEFORE the aggregate on both branches, so the broadcast is bounded
    by the brand's part count, not the part table."""
    part_b = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(part_b), li.l_partkey == F.col("p_partkey"))
    pavg = branded.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        branded.join(F.broadcast(pavg), branded.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


@_register("tpch_q18_large_volume_customers", _Q18_SQL)
def tpch_q18_large_volume_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold, with their customers. The HAVING subquery is
    ONE aggregate over lineitem whose surviving keys broadcast-semi-
    join the fact — lineitem is scanned twice but shuffled on the
    order key only once each, and the second scan's join carries only
    qualifying orders. Top-100 via TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
       AND l_quantity BETWEEN 20 AND 35)
"""


@_register("tpch_q19_disjunctive_revenue", _Q19_SQL)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): an OR-of-ANDs predicate
    spanning both join sides. Written as ONE disjunction on the joined
    relation — Catalyst factors the part-only conjuncts
    (brand ∈ {1,2,3} with its size range) into the part scan and the
    lineitem-only bound (l_quantity ≤ 35, ≥ 1) into the fact scan,
    keeping the broadcast small and the fact pre-filtered without the
    query being hand-split into three unions."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(11, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(26, 50)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return joined.filter(clause).agg(
        F.round(F.sum(_rev()), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@_register("tpch_q13_customer_distribution", _Q13_SQL)
def tpch_q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed
    0, 1, 2… orders — the LEFT OUTER join that must keep orderless
    customers (count(o_orderkey) counts non-null keys, so they land
    in bucket 0) followed by a histogram of the counts. First
    aggregate shuffles on the customer key; the second is
    bucket-cardinality-sized."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q22_SQL = """
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_mktsegment
"""


@_register("tpch_q22_prospective_customers", _Q22_SQL)
def tpch_q22_prospective_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): well-funded customers who
    never placed an URGENT order (adapted from "never ordered": this
    synthetic schema gives every customer orders, which would make the
    original vacuously empty) — a one-row broadcast scalar
    (positive-balance average) filters the dim, then a LEFT ANTI join
    removes everyone with a qualifying order. The anti-join's build
    side is the DISTINCT qualifying customer keys, not the fact
    table."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__a"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@_register("tpch_q4_order_priority", _Q4_SQL)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders with at least
    one line item shipping 60+ days after the order date — an EXISTS
    that mixes an equi key (order key) with a non-equi conjunct
    referencing BOTH sides (l_shipdate > o_orderdate + 60d). Planned
    as a LEFT SEMI join carrying the inequality as the join
    condition's residual — never a fact-side distinct or a count>0
    aggregate."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (
                li.l_shipdate
                > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q11_SQL = """
WITH r AS (
  SELECT l_suppkey,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem GROUP BY l_suppkey
), t AS (
  SELECT sum(rev) AS tot FROM r
)
SELECT l_suppkey, round(rev, 2) AS revenue
FROM r, t
WHERE rev > tot * 0.0105
ORDER BY revenue DESC, l_suppkey ASC
"""


@_register("tpch_q11_important_suppliers", _Q11_SQL)
def tpch_q11_important_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q11 shape (important stock): suppliers whose revenue
    exceeds a FRACTION OF THE GLOBAL TOTAL — the HAVING-against-a-
    scalar-subquery pattern. The per-supplier aggregate is computed
    once; its grand total re-aggregates the supplier-sized result
    (never a second fact scan) and broadcasts back as one row. The
    unrounded revenue feeds the threshold compare on both engines;
    rounding only shapes the output column."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("__rev"))
    tot = r.agg(F.sum("__rev").alias("__tot"))
    return (
        r.crossJoin(F.broadcast(tot))
        .filter(F.col("__rev") > F.col("__tot") * 0.0105)
        .select(
            "l_suppkey", F.round(F.col("__rev"), 2).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_suppkey"))
    )


_ABC_SQL = """
WITH r AS (
  SELECT l_partkey,
         CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)
              AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
), t AS (
  SELECT sum(cents) AS tot FROM r
), c AS (
  SELECT l_partkey, cents,
         sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM r
)
SELECT CASE WHEN 5 * cum <= 4 * t.tot THEN 'A'
            WHEN 20 * cum <= 19 * t.tot THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(sum(cents) / 100.0, 2) AS class_revenue
FROM c, t
GROUP BY 1
"""


@_register("abc_pareto_parts", _ABC_SQL)
def abc_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: A carries the
    first 80% of cumulative revenue share, B to 95%, C the tail — the
    inventory-policy classic. Per-part revenue is converted to EXACT
    integer cents first, so the ranking, the cumulative prefix sums,
    and the 80%/95% threshold compares (5·cum ≤ 4·tot, 20·cum ≤
    19·tot) are pure integer arithmetic — identical on any engine,
    no float-boundary flicker at the class cutoffs. The data-sized work is
    one aggregate onto parts; the ranked cumulative share runs over
    the part-dimension table (bounded), same reasoning as the KM
    curve's distinct-duration window."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.groupBy("l_partkey").agg(
        F.round(F.sum(_rev()) * 100).cast("long").alias("cents")
    )
    tot = r.agg(F.sum("cents").alias("__tot"))
    w = Window.orderBy(F.desc("cents"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        r.crossJoin(F.broadcast(tot))
        .withColumn("__cum", F.sum("cents").over(w))
        .withColumn(
            "abc_class",
            F.when(5 * F.col("__cum") <= 4 * F.col("__tot"), "A")
            .when(20 * F.col("__cum") <= 19 * F.col("__tot"), "B")
            .otherwise("C"),
        )
    )
    return c.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("cents") / 100.0, 2).alias("class_revenue"),
    )


_LTV_SQL = """
WITH first_order AS (
  SELECT o_custkey,
         CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS cohort
  FROM orders GROUP BY o_custkey
), rev AS (
  SELECT f.cohort,
         (year(o.o_orderdate) - year(f.cohort)) * 12
           + (month(o.o_orderdate) - month(f.cohort)) AS month_offset,
         o.o_totalprice
  FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
)
SELECT cohort, CAST(month_offset AS BIGINT) AS month_offset,
       round(sum(o_totalprice), 2) AS revenue,
       round(sum(sum(o_totalprice)) OVER (
         PARTITION BY cohort ORDER BY month_offset
         ROWS UNBOUNDED PRECEDING), 2) AS cum_revenue
FROM rev
GROUP BY cohort, month_offset
"""


@_register("cohort_ltv_orders", _LTV_SQL)
def cohort_ltv_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers cohorted by
    first-order month, revenue per month offset, cumulated into the
    LTV curve — the revenue sibling of retention_cohorts_events. Two
    aggregates (first-order month per customer — broadcastable dim —
    then cohort×offset revenue) and a per-cohort cumulative window
    over month offsets (bounded by the calendar, not the data).
    Rounded before cumulating on both engines: the inner sums are
    rounded to identical 2-dp doubles, so the running sums add the
    SAME values in the SAME order — no drift."""
    orders = _t(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.trunc(F.min("o_orderdate"), "month").alias("cohort")
    )
    rev = (
        orders.join(F.broadcast(first), "o_custkey")
        .withColumn(
            "month_offset",
            (
                (F.year("o_orderdate") - F.year("cohort")) * 12
                + (F.month("o_orderdate") - F.month("cohort"))
            ).cast("long"),
        )
        .groupBy("cohort", "month_offset")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.withColumn(
        "cum_revenue", F.round(F.sum("revenue").over(w), 2)
    )


_CONTRIB_SQL = """
WITH seg AS (
  SELECT c_mktsegment,
         sum(CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01'
                   AND o_orderdate < TIMESTAMP '2000-01-01'
                  THEN o_totalprice ELSE 0 END) AS cur,
         sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                   AND o_orderdate < TIMESTAMP '1999-01-01'
                  THEN o_totalprice ELSE 0 END) AS prev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
), t AS (
  SELECT sum(cur) - sum(prev) AS total_delta FROM seg
)
SELECT c_mktsegment,
       round(cur, 2) AS revenue_cur,
       round(prev, 2) AS revenue_prev,
       round(cur - prev, 2) AS delta,
       round((cur - prev) / t.total_delta, 6) AS contribution
FROM seg, t
"""


@_register("contribution_analysis_orders", _CONTRIB_SQL)
def contribution_analysis_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Year-over-year contribution analysis: which market segment
    DROVE the revenue change — per-segment 1999-vs-1998 deltas as
    shares of the total delta (they sum to 1), the decomposition
    behind every 'why did the number move' dashboard. ONE conditional
    aggregation pass over the joined fact (never two scans diffed),
    total delta re-aggregated from the segment-sized result and
    broadcast back."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    d98 = F.lit("1998-01-01").cast("timestamp")
    d99 = F.lit("1999-01-01").cast("timestamp")
    d00 = F.lit("2000-01-01").cast("timestamp")
    seg = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.when(
                    (F.col("o_orderdate") >= d99)
                    & (F.col("o_orderdate") < d00),
                    F.col("o_totalprice"),
                ).otherwise(0.0)
            ).alias("cur"),
            F.sum(
                F.when(
                    (F.col("o_orderdate") >= d98)
                    & (F.col("o_orderdate") < d99),
                    F.col("o_totalprice"),
                ).otherwise(0.0)
            ).alias("prev"),
        )
    )
    tot = seg.agg(
        (F.sum("cur") - F.sum("prev")).alias("total_delta")
    )
    return seg.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        F.round(F.col("cur"), 2).alias("revenue_cur"),
        F.round(F.col("prev"), 2).alias("revenue_prev"),
        F.round(F.col("cur") - F.col("prev"), 2).alias("delta"),
        F.round(
            (F.col("cur") - F.col("prev")) / F.col("total_delta"), 6
        ).alias("contribution"),
    )


_CONC_SQL = """
WITH r AS (
  SELECT o_custkey,
         CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS rk
  FROM r
), t AS (
  SELECT count(*) AS n, sum(cents) AS tot,
         sum(CAST(cents AS DOUBLE) * CAST(cents AS DOUBLE)) AS sumsq,
         sum(rk * cents) AS weighted
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers,
       round(tot / 100.0, 2) AS total_revenue,
       round((2.0 * weighted) / (n * tot) - (n + 1.0) / n, 6) AS gini,
       round(sumsq / (CAST(tot AS DOUBLE) * tot), 6) AS hhi,
       round(
         (SELECT sum(cents) FROM ranked WHERE rk > n - CAST(n / 10 AS BIGINT))
         / CAST(tot AS DOUBLE), 6) AS top_decile_share
FROM t
"""


@_register("concentration_metrics_orders", _CONC_SQL)
def concentration_metrics_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue-concentration metrics over customers: Gini coefficient
    (rank formula G = 2·Σ rank·xᵢ /(n·Σx) − (n+1)/n on
    ascending-sorted revenue), Herfindahl–Hirschman index (Σ share²),
    and the top-decile revenue share — the inequality view beside the
    X145 ABC classification. Inputs are EXACT integer cents; Σx and
    Σ rank·x stay integer (Gini and the decile share are bit-equal
    cross-engine), while Σx² is summed in DOUBLES on both sides —
    cents² exceeds both int64 (Spark raises ARITHMETIC_OVERFLOW; the
    first formulation hit it) and the 2⁵³ exact-integer range, and
    the 6-dp rounding is 10 orders of magnitude above the resulting
    ulp noise. The per-customer rank
    runs on the customer DIMENSION (bounded), not the fact table;
    at fact scale the rank would use the X52 two-phase scheme."""
    r = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("cents")
        )
    )
    ranked = r.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.asc("cents"), F.asc("o_custkey"))
        ),
    )
    t = ranked.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("cents").alias("__tot"),
        F.sum(
            F.col("cents").cast("double") * F.col("cents").cast("double")
        ).alias("__sumsq"),
        F.sum(F.col("rk") * F.col("cents")).alias("__weighted"),
    )
    top = (
        ranked.crossJoin(F.broadcast(t.select("__n")))
        .filter(
            F.col("rk") > F.col("__n") - (F.col("__n") / 10).cast("long")
        )
        .agg(F.sum("cents").alias("__topsum"))
    )
    return (
        t.crossJoin(F.broadcast(top))
        .select(
            F.col("__n").cast("long").alias("n_customers"),
            F.round(F.col("__tot") / 100.0, 2).alias("total_revenue"),
            F.round(
                (2.0 * F.col("__weighted")) / (F.col("__n") * F.col("__tot"))
                - (F.col("__n") + 1.0) / F.col("__n"),
                6,
            ).alias("gini"),
            F.round(
                F.col("__sumsq")
                / (F.col("__tot").cast("double") * F.col("__tot")),
                6,
            ).alias("hhi"),
            F.round(
                F.col("__topsum") / F.col("__tot").cast("double"), 6
            ).alias("top_decile_share"),
        )
    )
