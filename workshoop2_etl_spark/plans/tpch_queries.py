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
With the pack-3 wave (Q2/Q5/Q9/Q10/Q12/Q16/Q20/Q21, bottom of this
file) the FULL 22-query suite is represented: Q1 is pricing_summary
in reference_queries.py, the other 21 live here.

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


# ---------------------------------------------------------------------------
# TPC-H pack 3 (round 6, second wave): Q2/Q5/Q9/Q10/Q12/Q16/Q20/Q21 shapes.
# With these the full 22-query TPC-H suite is represented (Q1 is
# pricing_summary in reference_queries.py; the other 21 live here).
# The synthetic schema has no partsupp table and no l_commitdate /
# l_receiptdate / l_shipmode / p_container / p_mfgr columns, so:
#   - partsupp is DERIVED: (l_partkey, l_suppkey) pairs from lineitem,
#     with ps_supplycost := min observed unit price and
#     ps_availqty-style totals := sum(l_quantity). Unit prices divide
#     two doubles identically in both engines and min() is selection,
#     not accumulation, so cross-engine equality is exact.
#   - "receipt later than commit" (Q12/Q21 lateness) becomes
#     "shipped more than a year after the order date" — the synthetic
#     ship delays run from negative (pre-dated) to ~6 years, and
#     l_quantity is integral so sum/threshold comparisons are exact.
# Shapes follow the public TPC-H spec (tpc.org); each docstring names
# the original pattern the optimizer is meant to exercise.
# ---------------------------------------------------------------------------


_Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@_register("tpch_q5_local_supplier_volume", _Q5_SQL)
def tpch_q5_local_supplier_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue from orders where the
    customer and the line's supplier share a nation, by nation within
    one region. The interesting constraint is the NON-key equi-term
    ``c_nationkey = s_nationkey`` riding on the supplier join — it
    prunes to same-nation trade without a separate filter step. All
    four dimensions broadcast; the only shuffle is the fact-side
    partial-agg merge on n_name (5 groups)."""
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nat = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nat),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_Q10_SQL = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name, c_mktsegment
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@_register("tpch_q10_returned_items", _Q10_SQL)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): customers who returned the
    most revenue in one quarter. Group-by carries the full customer
    descriptor (key + 4 functionally-dependent attributes) — Catalyst
    treats them as one composite key; at 100 TB the cheaper layout is
    aggregate-by-custkey THEN broadcast-join the descriptor back, but
    with customer as a broadcast dim the grouped descriptor costs only
    wider shuffle rows, bounded by |customer|. Top-20 via
    TakeOrderedAndProject."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment"
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            "c_acctbal", "n_name", "c_mktsegment",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q12_SQL = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 0 THEN 'EARLY'
            WHEN date_diff('day', o_orderdate, l_shipdate) < 365 THEN 'NORMAL'
            ELSE 'SLOW' END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1
"""


@_register("tpch_q12_shipping_priority_buckets", _Q12_SQL)
def tpch_q12_shipping_priority_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): conditional
    two-way counts per shipping class. The synthetic schema has no
    l_shipmode/l_commitdate/l_receiptdate, so the class is derived
    from the ship delay (early / within-a-year / slow) — preserving
    the original's pattern of a derived CASE key with two filtered
    counts in one pass. One fact-fact join, one 3-group aggregate;
    the date filter reaches the lineitem scan."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(delay < 0, "EARLY")
            .when(delay < 365, "NORMAL")
            .otherwise("SLOW"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


_Q21_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
), od AS (
  SELECT l_orderkey,
         count(*) AS n_supp,
         sum(is_late) AS n_late
  FROM lo GROUP BY 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lo
JOIN od USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE lo.is_late = 1 AND od.n_supp > 1 AND od.n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@_register("tpch_q21_waiting_suppliers", _Q21_SQL)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): suppliers that
    were the SOLE late supplier on a finished multi-supplier order.
    The original expresses this with correlated EXISTS / NOT EXISTS;
    the set-based equivalent — per-(order, supplier) lateness flags,
    then per-order counts, then a filter — turns both correlated
    subqueries into WINDOW aggregates over the flags
    (count/sum OVER (PARTITION BY order)). Not a re-aggregate +
    self-join: column pruning makes the two branch subtrees differ,
    so exchange reuse does NOT fire and the whole join+aggregate
    pipeline would execute twice (measured — zero ReusedExchange
    nodes in the AQE final plan). The window costs one extra
    order-keyed exchange but scans and aggregates once, and its
    groups are order-sized (bounded, ~8 suppliers), never skewed.
    Supplier is a broadcast dim; 'late' is shipped >1 year after
    order (no l_commitdate/l_receiptdate in the synthetic schema)."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 365 DAYS"
    )
    lo = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lo.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@_register("tpch_q16_supplier_part_relationship", _Q16_SQL)
def tpch_q16_supplier_part_relationship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): how many distinct
    suppliers serve each (brand, type, size) bucket, excluding an
    unwanted brand/type and a blocklist of suppliers (here: negative
    account balance, standing in for the original's complaint-comment
    scan). partsupp is derived as the distinct (part, supplier) pairs
    observed in lineitem. The blocklist is a broadcast LEFT ANTI join
    — the NOT IN without its NULL trap — and the distinct-pair
    reduction happens BEFORE the count-distinct aggregate, so the
    exchange carries (brand, type, size, suppkey) pairs, not fact
    rows."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"), F.asc("p_type"), F.asc("p_size"),
        )
    )


_Q20_SQL = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
), tot AS (
  SELECT l_partkey AS t_partkey, sum(qty) AS total_qty
  FROM shipped GROUP BY 1
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey FROM shipped JOIN tot ON l_partkey = t_partkey
    WHERE qty > 0.3 * total_qty)
ORDER BY s_name
"""


@_register("tpch_q20_part_promotion", _Q20_SQL)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers who dominate
    the year's shipments of some name-prefixed part family (>30% of
    that part's shipped quantity — standing in for the original's
    ps_availqty > half-of-shipped test, since there is no partsupp).
    Same nested-semi-join shape: an inner aggregate derives the
    qualifying supplier set, an outer LEFT SEMI join filters the
    supplier dim, nation broadcasts in. The part total is a window
    sum over the (supplier, part) aggregate — not a re-aggregate
    joined back, which column pruning would plan as two full
    subtrees (see Q21); l_quantity is integral, so the 0.3·total
    threshold compares exactly in both engines."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    qualifying = (
        shipped.withColumn(
            "total_qty",
            F.sum("qty").over(Window.partitionBy("l_partkey")),
        )
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(
            qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi"
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
), eligible AS (
  SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
  FROM ps
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), target AS (
  SELECT p_partkey, p_brand FROM part WHERE p_size = 15
), best AS (
  SELECT ps_partkey AS b_partkey, min(ps_supplycost) AS min_cost
  FROM eligible JOIN target ON ps_partkey = p_partkey
  GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       round(ps_supplycost, 4) AS supply_cost
FROM eligible
JOIN target ON ps_partkey = p_partkey
JOIN best   ON ps_partkey = b_partkey AND ps_supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@_register("tpch_q2_min_cost_supplier", _Q2_SQL)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier): for every size-15 part, the
    European supplier(s) offering it at the lowest unit cost. The
    original's correlated `= (SELECT min(ps_supplycost) ...)` becomes
    a per-part window min + filter — the argmin decorrelation that
    keeps ONE subtree (a re-aggregate joined back would plan the
    eligible pipeline twice under column pruning; see Q21). The cost
    equality is EXACT cross-engine: unit cost is one double division
    (identical bits in Spark and DuckDB) and min() selects an
    existing value rather than accumulating. partsupp is derived from
    lineitem (no partsupp in the synthetic schema); supplier, nation,
    region, and the filtered part list all broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.min(
                F.col("l_extendedprice") / F.col("l_quantity")
            ).alias("ps_supplycost")
        )
    )
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_nat = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(eur_nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    target = _t(spark, sf_dir, "part").filter(
        F.col("p_size") == 15
    ).select("p_partkey", "p_brand")
    eligible = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(target), ps.ps_partkey == target.p_partkey)
        .select(
            "ps_partkey", "ps_supplycost",
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
        )
    )
    return (
        eligible.withColumn(
            "min_cost",
            F.min("ps_supplycost").over(Window.partitionBy("ps_partkey")),
        )
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round("ps_supplycost", 4).alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"),
            F.asc("s_name"), F.asc("p_partkey"),
        )
        .limit(100)
    )


_Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.2 * p_retailprice * l_quantity), 2) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


@_register("tpch_q9_product_type_profit", _Q9_SQL)
def tpch_q9_product_type_profit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q9 (product type profit): profit on a name-matched part
    family by supplier nation and year. ps_supplycost is substituted
    with 0.2·p_retailprice (no partsupp), keeping the original's
    revenue-minus-cost aggregand over a LIKE-filtered part family.
    The '%red%' contains-match cannot prune the parquet scan (no
    prefix), so it runs as a broadcast semi-reduction instead: the
    filtered part dim broadcasts and the fact rows drop before any
    exchange. Supplier and nation broadcast; one partial-agg shuffle
    on (nation, year)."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    profit = _rev() - 0.2 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )
