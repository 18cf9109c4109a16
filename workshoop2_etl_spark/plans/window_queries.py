"""Set-operation, window-function, and pivot coverage (SURVEY §2.7:
"engine gets union/intersect/except free from Spark; not
parity-tested" — these entries parity-test them, plus the analytic
window shapes every dashboard's trend panel needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.analytics import top_k_per_group
from workshoop2_etl_spark.plans.reference_queries import _register, _t


@_register(
    "setops_customer_status",
    """
WITH o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'both' AS cohort, CAST(count(*) AS BIGINT) AS n
FROM (SELECT o_custkey FROM o INTERSECT SELECT o_custkey FROM f)
UNION ALL
SELECT 'open_only', CAST(count(*) AS BIGINT)
FROM (SELECT o_custkey FROM o EXCEPT SELECT o_custkey FROM f)
UNION ALL
SELECT 'any', CAST(count(*) AS BIGINT)
FROM (SELECT o_custkey FROM o UNION SELECT o_custkey FROM f)
""",
)
def setops_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except cohort arithmetic over customer key
    sets — each compiles to a hash aggregate / left-anti join."""
    orders = _t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()

    def count_as(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("cohort"), F.count(F.lit(1)).alias("n")
        )

    return (
        count_as(o.intersect(f), "both")
        .unionByName(count_as(o.exceptAll(f).distinct(), "open_only"))
        .unionByName(count_as(o.union(f).distinct(), "any"))
    )


@_register(
    "cumulative_monthly_revenue",
    """
WITH m AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT y, mo, round(rev, 2) AS revenue,
       round(sum(rev) OVER (PARTITION BY y ORDER BY mo
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS revenue_ytd,
       round(rev - lag(rev) OVER (PARTITION BY y ORDER BY mo), 2) AS mom_delta
FROM m
""",
)
def cumulative_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend-panel window shapes: year-partitioned running total +
    month-over-month delta (running SUM OVER + LAG). Partitioned
    windows — no single-partition funnel."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.partitionBy("y").orderBy("mo")
    return m.select(
        "y",
        "mo",
        F.round("rev", 2).alias("revenue"),
        F.round(
            F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("revenue_ytd"),
        F.round(F.col("rev") - F.lag("rev").over(w), 2).alias("mom_delta"),
    )


@_register(
    "top3_customers_per_segment",
    """
SELECT c_mktsegment, c_custkey, revenue, CAST(rank AS BIGINT) AS rank FROM (
  SELECT c_mktsegment, c_custkey, round(sum(o_totalprice), 2) AS revenue,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY round(sum(o_totalprice), 2) DESC, c_custkey ASC
         ) AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, c_custkey
) WHERE rank <= 3
""",
)
def top3_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (the scale path for 'ranking per category'
    dashboards): partitioned row_number, k-heap per group via
    WindowGroupLimit — never a global sort."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    grouped = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    out = top_k_per_group(
        grouped,
        ["c_mktsegment"],
        [F.desc("revenue"), F.asc("c_custkey")],
        3,
    )
    return out.select(
        "c_mktsegment", "c_custkey", "revenue", F.col("rank").cast("long").alias("rank")
    )


@_register(
    "pivot_status_by_priority",
    """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presentation-time pivot of the long-form crosstab. The pivot
    values are DECLARED (not discovered) so the plan is one
    aggregate — ``pivot()`` without values runs a distinct scan
    first, which is the wrong default at 100 TB."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .select(
            "o_orderpriority",
            F.col("F").cast("long").alias("F"),
            F.col("O").cast("long").alias("O"),
            F.col("P").cast("long").alias("P"),
        )
    )
