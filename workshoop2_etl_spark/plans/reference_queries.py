"""Reference-parity query registry.

Every operator from SURVEY.md §2 re-expressed over the driver's
TPC-H-ish testdata tables, each as a ``(spark, sf_dir) -> DataFrame``
callable plus an equivalent ANSI-SQL oracle string for DuckDB. The
driver hash-compares the two at sf0.01 (CORRECTNESS gate).

Cross-engine determinism conventions:
- every aggregate / computed column is aliased identically in Spark
  and SQL;
- integral outputs cast to BIGINT both sides (DuckDB sums promote to
  HUGEINT, Spark counts are long);
- floating aggregates rounded (2-4 dp) both sides — double summation
  order differs between engines at the 1e-12 relative level;
- session timezone pinned to UTC (session.py) to match DuckDB's
  naive timestamps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.analytics import (
    crosstab_counts,
    histogram,
    null_profile,
    summary_stats,
    top_k,
    value_counts,
)
from workshoop2_etl_spark.operators.cleaning import (
    mode_or_first_dedup,
    recode_with_default,
)
from workshoop2_etl_spark.operators.merge import full_outer_with_indicator
from workshoop2_etl_spark.plans.pipelines import DimSpec, star_pipeline

QueryFn = Callable[[SparkSession, str], DataFrame]

SPARK_QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from workshoop2_etl_spark.sources.readers import read_parquet

    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Flagship: the reference's merge pipeline shape (J1 + A3).
# Two independently-derived datasets (open vs finished order books per
# customer) are key-normalized, full-outer-joined with a pandas-style
# ``_merge`` indicator, then summarized by provenance — the exact shape
# of reference dags/merge_to_dw.py:47-84 (spotify ⟗ grammys + indicator
# counts logged at :82).
# ---------------------------------------------------------------------------

_FLAGSHIP_SQL = """
WITH l AS (
  SELECT lower(trim(coalesce(CAST(o_custkey AS VARCHAR), ''))) AS key,
         CAST(count(*) AS BIGINT) AS n_open,
         round(sum(o_totalprice), 2) AS open_total
  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
), r AS (
  SELECT lower(trim(coalesce(CAST(o_custkey AS VARCHAR), ''))) AS key,
         CAST(count(*) AS BIGINT) AS n_finished,
         round(sum(o_totalprice), 2) AS finished_total
  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
), m AS (
  SELECT coalesce(l.key, r.key) AS key, n_open, open_total, n_finished, finished_total,
         CASE WHEN r.key IS NULL THEN 'left_only'
              WHEN l.key IS NULL THEN 'right_only'
              ELSE 'both' END AS _merge
  FROM l FULL OUTER JOIN r ON l.key = r.key
)
SELECT _merge,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(coalesce(n_open, 0) + coalesce(n_finished, 0)) AS BIGINT) AS n_orders,
       round(sum(coalesce(open_total, 0) + coalesce(finished_total, 0)), 2) AS total_price
FROM m GROUP BY _merge
"""


@_register("flagship_merge_indicator", _FLAGSHIP_SQL)
def flagship_merge_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def side(status: str, n_alias: str, total_alias: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .groupBy(F.col("o_custkey").cast("string").alias("key"))
            .agg(
                F.count(F.lit(1)).alias(n_alias),
                F.round(F.sum("o_totalprice"), 2).alias(total_alias),
            )
        )

    left = side("O", "n_open", "open_total")
    right = side("F", "n_finished", "finished_total")
    # hot_keys: the key-normalization convention maps null custkeys to
    # "", manufacturing one potentially huge key group; routing it
    # through the salted hot branch keeps the cold join skew-free, and
    # this gate run proves the branch is value-identical.
    merged = full_outer_with_indicator(left, right, ["key"], hot_keys=[("",)])
    return merged.groupBy("_merge").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(
            F.coalesce(F.col("n_open"), F.lit(0))
            + F.coalesce(F.col("n_finished"), F.lit(0))
        ).alias("n_orders"),
        F.round(
            F.sum(
                F.coalesce(F.col("open_total"), F.lit(0.0))
                + F.coalesce(F.col("finished_total"), F.lit(0.0))
            ),
            2,
        ).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Relational core (A4/A5/P10/T2): TPC-H-Q1-shaped pricing summary.
# ---------------------------------------------------------------------------

@_register(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Dashboard analogs (J3/A12/A13/T1/T3): fact ⋈ dim rankings.
# ---------------------------------------------------------------------------

@_register(
    "top_customers_by_revenue",
    """
SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 15
""",
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analog of the dashboard's "Ranking of Artists by Total Grammys
    Won" (J3): fact × broadcast dim, grouped ranking, top-k."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    grouped = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return top_k(grouped, [F.desc("revenue"), F.asc("c_custkey")], 15)


@_register(
    "avg_price_by_segment",
    """
SELECT c_mktsegment, round(avg(o_totalprice), 4) AS avg_price,
       CAST(count(*) AS BIGINT) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def avg_price_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Average Popularity by Artist" analog (A12)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_register(
    "count_distinct_customers",
    "SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers FROM orders",
)
def count_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Number of Artists" KPI analog (A6) — exact count distinct.
    At 100 TB the dashboard variant is ``approx_count_distinct`` (HLL,
    no shuffle of distinct values); exact is kept for oracle parity."""
    return _t(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )


@_register(
    "filtered_count_distinct",
    """
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers_finished
FROM orders WHERE o_orderstatus = 'F'
""",
)
def filtered_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Artists Who Have Won a Grammy" KPI analog (A11)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .agg(F.countDistinct("o_custkey").alias("n_customers_finished"))
    )


@_register(
    "year_priority_counts",
    """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY 1, 2
""",
)
def year_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Nominations By Genre Over The Years" analog (A14): two-dim
    count series in long form."""
    orders = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    return crosstab_counts(orders, "order_year", "o_orderpriority")


# ---------------------------------------------------------------------------
# EDA / profiling (A3/A5/A7/A8/A9/A10, F4/F5).
# ---------------------------------------------------------------------------

@_register(
    "value_counts_event_type",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
)
def value_counts_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_counts(_t(spark, sf_dir, "events"), "event_type")


@_register(
    "group_mean_event_value",
    """
SELECT event_type, round(avg(value), 4) AS mean_value,
       round(avg(CASE WHEN value > 10 THEN 1 ELSE 0 END), 4) AS high_rate
FROM events GROUP BY event_type
""",
)
def group_mean_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group mean + boolean-rate (A4/F5 — the reference's per-year /
    per-category ``winner.mean()``)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("mean_value"),
        F.round(F.avg((F.col("value") > 10).cast("int")), 4).alias("high_rate"),
    )


@_register(
    "null_profile_events",
    """
SELECT CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id,
       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts,
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id,
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value,
       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props
FROM events
""",
)
def null_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return null_profile(_t(spark, sf_dir, "events"))


@_register(
    "minmax_orderdate",
    """
SELECT min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders
""",
)
def minmax_orderdate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar min/max + row count (A5/A9)."""
    return _t(spark, sf_dir, "orders").agg(
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "summary_stats_lineitem",
    """
SELECT * FROM (
  SELECT 'l_quantity' AS column, CAST(count(l_quantity) AS BIGINT) AS count,
         round(avg(l_quantity), 4) AS mean, round(stddev_samp(l_quantity), 4) AS std,
         round(min(l_quantity), 4) AS min, round(max(l_quantity), 4) AS max
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', CAST(count(l_extendedprice) AS BIGINT),
         round(avg(l_extendedprice), 4), round(stddev_samp(l_extendedprice), 4),
         round(min(l_extendedprice), 4), round(max(l_extendedprice), 4)
  FROM lineitem
  UNION ALL
  SELECT 'l_discount', CAST(count(l_discount) AS BIGINT),
         round(avg(l_discount), 4), round(stddev_samp(l_discount), 4),
         round(min(l_discount), 4), round(max(l_discount), 4)
  FROM lineitem
)
""",
)
def summary_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe() parity (A8) with exact aggregates only."""
    li = _t(spark, sf_dir, "lineitem")
    stats = summary_stats(li, ["l_quantity", "l_extendedprice", "l_discount"])
    return stats.select(
        "column",
        F.col("count").cast("long").alias("count"),
        F.round("mean", 4).alias("mean"),
        F.round("std", 4).alias("std"),
        F.round("min", 4).alias("min"),
        F.round("max", 4).alias("max"),
    )


@_register(
    "histogram_totalprice",
    """
WITH s AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
b AS (
  SELECT CAST(least(CAST(floor((o_totalprice - s.lo) / ((s.hi - s.lo) / 20)) AS BIGINT), 19) AS BIGINT) AS bin,
         s.lo AS lo, (s.hi - s.lo) / 20 AS width
  FROM orders, s WHERE o_totalprice IS NOT NULL
)
SELECT bin, round(lo + bin * width, 6) AS bin_lo, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bin, lo, width
""",
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram (A10, seaborn ``histplot(bins=...)``)."""
    return histogram(_t(spark, sf_dir, "orders"), "o_totalprice", bins=20).select(
        F.col("bin").cast("long").alias("bin"), "bin_lo", "n"
    )


@_register(
    "days_between_events",
    """
SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
""",
)
def days_between_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp day-difference (F4, eda_grammy cell 4 ``.dt.days``)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "day_offset",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).cast("long"),
        )
        .groupBy("day_offset")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Cleaning semantics (P4/A1) on testdata.
# ---------------------------------------------------------------------------

_EVENT_RECODE = {
    "click": ("Engagement", "click-through"),
    "view": ("Engagement", "impression"),
    "purchase": ("Conversion", "sale"),
    "signup": ("Conversion", "registration"),
}


@_register(
    "recode_event_types",
    """
SELECT CASE WHEN event_type = 'click' THEN 'Engagement'
            WHEN event_type = 'view' THEN 'Engagement'
            WHEN event_type = 'purchase' THEN 'Conversion'
            WHEN event_type = 'signup' THEN 'Conversion'
            ELSE 'Otro' END AS genero,
       CASE WHEN event_type = 'click' THEN 'click-through'
            WHEN event_type = 'view' THEN 'impression'
            WHEN event_type = 'purchase' THEN 'sale'
            WHEN event_type = 'signup' THEN 'registration'
            ELSE event_type END AS subgenero,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
""",
)
def recode_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dict-lookup recode with per-column defaults (P4, the genre map
    of reference dags/limpiezaSpotify.py:12-57,84-89): mapped types get
    (genero, subgenero); unmapped fall to ('Otro', original value)."""
    ev = _t(spark, sf_dir, "events")
    recoded = recode_with_default(
        ev,
        "event_type",
        _EVENT_RECODE,
        ["genero", "subgenero"],
        [F.lit("Otro"), F.col("event_type")],
    )
    return recoded.groupBy("genero", "subgenero").agg(F.count(F.lit(1)).alias("n"))


@_register(
    "mode_or_first_lineitem",
    """
WITH counts AS (
  SELECT l_orderkey, l_quantity, count(*) AS c
  FROM lineitem WHERE l_quantity IS NOT NULL
  GROUP BY l_orderkey, l_quantity
), modes AS (
  SELECT l_orderkey, l_quantity FROM (
    SELECT l_orderkey, l_quantity,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY c DESC, l_quantity ASC) AS rn
    FROM counts
  ) WHERE rn = 1
), firsts AS (
  SELECT l_orderkey, l_partkey FROM (
    SELECT l_orderkey, l_partkey,
           row_number() OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_quantity
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
)
SELECT f.l_orderkey, f.l_partkey AS first_partkey, m.l_quantity AS qty_mode
FROM firsts f LEFT JOIN modes m ON f.l_orderkey = m.l_orderkey
""",
)
def mode_or_first_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode-or-first dedup (A1) on a real table: collapse
    lineitems per order; quantity → pandas-mode semantics (smallest
    most-frequent), first_partkey → first by (line number, partkey,
    quantity) — a total order, since this synthetic lineitem has
    duplicate line numbers per order."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_linenumber"
    )
    out = mode_or_first_dedup(
        li, "l_orderkey", "l_quantity", ["l_linenumber", "l_partkey", "l_quantity"]
    )
    return out.select(
        "l_orderkey",
        F.col("l_partkey").alias("first_partkey"),
        F.col("l_quantity").alias("qty_mode"),
    )


# ---------------------------------------------------------------------------
# Star schema (S9/J2): set-based dim build + fact FK resolution.
# ---------------------------------------------------------------------------

@_register(
    "dim_build_priority",
    """
SELECT CAST(row_number() OVER (ORDER BY o_orderpriority) AS BIGINT) AS priority_id,
       o_orderpriority
FROM (SELECT DISTINCT o_orderpriority FROM orders WHERE o_orderpriority IS NOT NULL)
""",
)
def dim_build_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension build (S9): distinct natural keys + deterministic
    surrogate ids ordered by natural key."""
    from workshoop2_etl_spark.operators.star import build_dim

    orders = _t(spark, sf_dir, "orders")
    dim = build_dim(orders, ["o_orderpriority"], "priority_id")
    return dim.select(
        F.col("priority_id").cast("long").alias("priority_id"), "o_orderpriority"
    )


@_register(
    "star_fact_resolution",
    """
WITH dp AS (
  SELECT CAST(row_number() OVER (ORDER BY o_orderpriority) AS BIGINT) AS priority_id,
         o_orderpriority
  FROM (SELECT DISTINCT o_orderpriority FROM orders WHERE o_orderpriority IS NOT NULL)
), ds AS (
  SELECT CAST(row_number() OVER (ORDER BY o_orderstatus) AS BIGINT) AS status_id,
         o_orderstatus
  FROM (SELECT DISTINCT o_orderstatus FROM orders WHERE o_orderstatus IS NOT NULL)
)
SELECT priority_id, status_id, CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total_price
FROM orders o
LEFT JOIN dp ON o.o_orderpriority = dp.o_orderpriority
LEFT JOIN ds ON o.o_orderstatus = ds.o_orderstatus
GROUP BY priority_id, status_id
""",
)
def star_fact_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full star build (J2): two dims + fact with resolved FKs,
    aggregated by the surrogate keys. Dims broadcast; the fact scan
    never shuffles during resolution."""
    orders = _t(spark, sf_dir, "orders")
    _, fact = star_pipeline(
        orders,
        [
            DimSpec("dim_priority", ["o_orderpriority"], "priority_id"),
            DimSpec("dim_status", ["o_orderstatus"], "status_id"),
        ],
        fact_cols=["o_totalprice"],
    )
    return (
        fact.groupBy(
            F.col("priority_id").cast("long").alias("priority_id"),
            F.col("status_id").cast("long").alias("status_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
