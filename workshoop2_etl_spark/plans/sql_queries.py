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


@_register(
    "sql_variant_props",
    """
SELECT event_type,
       CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS n_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum
FROM events GROUP BY 1
""",
)
def sql_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    ``parse_json`` once into the binary variant encoding, typed
    ``variant_get`` extraction — the engine-native path for schema-
    on-read JSON (vs get_json_object's per-access string re-parse).
    Oracle: DuckDB's JSON extraction, same values."""
    return _sql(
        spark, sf_dir, ["events"],
        """
        SELECT event_type,
               CAST(count(variant_get(parse_json(props), '$.k', 'long'))
                    AS BIGINT) AS n_k,
               CAST(sum(variant_get(parse_json(props), '$.k', 'long'))
                    AS BIGINT) AS k_sum
        FROM events GROUP BY 1
        """,
    )


_RECURSIVE_SQL = """
WITH RECURSIVE chain(key, cur, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 64
  UNION ALL
  SELECT key, CAST(floor(cur / 2) AS BIGINT), depth + 1
  FROM chain WHERE cur > 1
)
SELECT key, CAST(max(depth) AS BIGINT) AS depth FROM chain GROUP BY key
"""


@_register("sql_recursive_halving_depth", _RECURSIVE_SQL)
def sql_recursive_halving_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4, SPARK-24497): per-key iteration depth
    of the halving chain key → key/2 → … → 1 — the hierarchical-walk
    query class (org charts, BOM explosions, graph reachability) that
    needed driver-side loops before recursive CTEs landed. Iterations
    are Catalyst-planned unions, executor-side. Oracle: the identical
    ANSI recursive CTE in DuckDB."""
    return _sql(spark, sf_dir, ["customer"], _RECURSIVE_SQL)


_LATERAL_SQL = """
SELECT r_name, l.n_name
FROM region, LATERAL (
  SELECT n_name FROM nation
  WHERE n_regionkey = r_regionkey
  ORDER BY n_name LIMIT 2
) l
"""


@_register("sql_lateral_top2_nations", _LATERAL_SQL)
def sql_lateral_top2_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY/LIMIT: the
    top-2-per-outer-row idiom SQL users reach for before window
    functions — supported verbatim on both engines."""
    return _sql(spark, sf_dir, ["region", "nation"], _LATERAL_SQL)


_UDTF_BIGRAMS_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents WHERE doc_id % 10 = 0
)
SELECT bg, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest([ts[i] || ' ' || ts[i + 1] FOR i IN range(1, len(ts))]) AS bg
  FROM toks
) GROUP BY bg ORDER BY n DESC, bg LIMIT 15
"""


@_register("sql_udtf_word_bigrams", _UDTF_BIGRAMS_ORACLE)
def sql_udtf_word_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): a user-defined TABLE function lateral-
    joined per document — the API for set-returning custom logic the
    SQL surface can call directly. Row-at-a-time Python is the slow
    path (the vectorized twin is split+explode, cf. word_frequencies);
    this entry covers the API surface on a bounded tenth of the
    corpus (doc_id %% 10 — the slow path is priced accordingly).
    Oracle: DuckDB list-comprehension bigrams."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bg string")
    class Bigrams:
        def eval(self, text: str):  # noqa: ANN001 - UDTF contract
            toks = [t for t in (text or "").split(" ") if t]
            for a, b in zip(toks, toks[1:]):
                yield (a + " " + b,)

    spark.udtf.register("word_bigrams", Bigrams)
    return _sql(
        spark, sf_dir, ["documents"],
        """
        SELECT bg, count(*) AS n
        FROM (SELECT text FROM documents WHERE doc_id % 10 = 0),
             LATERAL word_bigrams(text)
        GROUP BY bg ORDER BY n DESC, bg LIMIT 15
        """,
    )
