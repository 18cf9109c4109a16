"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(``workshoop2_etl_spark/plans/reference_queries.py`` and friends):
``entry`` runs the flagship merge-with-indicator pipeline on sf0.001,
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import workshoop2_etl_spark.plans.coverage_queries  # noqa: F401 — registers queries
import workshoop2_etl_spark.plans.llm_queries  # noqa: F401 — registers queries
import workshoop2_etl_spark.plans.sql_queries  # noqa: F401 — registers queries
import workshoop2_etl_spark.plans.streaming_queries  # noqa: F401 — registers queries
import workshoop2_etl_spark.plans.window_queries  # noqa: F401 — registers queries
from workshoop2_etl_spark.plans.reference_queries import (
    ORACLE_SQL,
    SPARK_QUERIES,
    flagship_merge_indicator,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_merge_indicator(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible query."""
    return dict(ORACLE_SQL)
