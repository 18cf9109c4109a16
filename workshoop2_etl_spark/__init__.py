"""workshoop2_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference repo
20angela26/WorkShoop2-ETL (a pandas/Airflow music-analytics ETL:
clean → outer-merge → star-schema warehouse → BI dashboard), extended
with the operators a large-scale (100 TB) training-data pipeline
needs: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, multimodal column plumbing, and
text analysis.

Design principles (see SURVEY.md §7):
- DataFrame/SQL only; lazy plans end-to-end; Catalyst does the
  optimization (pushdown, pruning, join selection, AQE).
- No row-at-a-time Python UDFs. Pandas UDFs (Arrow) only where
  built-ins genuinely cannot express the semantics.
- Every operator is a pure ``DataFrame -> DataFrame`` function with an
  explicit contract, unit tests, and (where SQL-expressible) a DuckDB
  oracle twin registered in ``__spark_entry__.py``.
"""

from workshoop2_etl_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
