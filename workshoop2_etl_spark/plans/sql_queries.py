"""SQL-surface queries: the reference's Metabase dashboard runs raw
SQL against the warehouse (README.md:128-141 — "structured queries
and supports Metabase connections"), so ``spark.sql`` over registered
temp views is a co-equal query surface of this engine (SURVEY.md
§1.3/§3.3).

Each entry here is authored as a SQL string and executed via
``spark.sql`` — Catalyst compiles it to the identical physical plan a
DataFrame formulation would get (same pushdown, same broadcast, same
codegen), which these queries' green oracle rows demonstrate. The
oracle twin is near-verbatim the same SQL (dialect differences only),
so this doubles as an ANSI-compatibility check of the surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from workshoop2_etl_spark.plans.reference_queries import _register
from workshoop2_etl_spark.sources.readers import load_tables


def _sql(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    load_tables(spark, sf_dir, tables, register_views=True)
    return spark.sql(sql)


@_register(
    "sql_monthly_order_trend",
    """
SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1, 2
""",
)
def sql_monthly_order_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Trends ... by year" dashboard analog, via the SQL surface."""
    return _sql(
        spark, sf_dir, ["orders"],
        """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1, 2
        """,
    )


@_register(
    "sql_revenue_by_nation",
    """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop dim join via SQL; both dims auto-broadcast (under the
    10 MB threshold), so the fact scan never shuffles before the
    aggregate."""
    return _sql(
        spark, sf_dir, ["orders", "customer", "nation"],
        """
        SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
    )


@_register(
    "sql_popularity_correlation",
    """
SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(corr(l_discount, l_extendedprice), 6) AS corr_disc_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
""",
)
def sql_popularity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Relationship between popularity and danceability/energy"
    analog: Pearson correlations between measures, one aggregate,
    rounded to 6 dp both sides (co-moment accumulation order differs
    across engines at the 1e-12 level)."""
    return _sql(
        spark, sf_dir, ["lineitem"],
        """
        SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(corr(l_discount, l_extendedprice), 6) AS corr_disc_price,
               count(*) AS n
        FROM lineitem
        """,
    )
