"""String/date scalar functions, all JVM-side built-ins — no UDFs.

Parity targets (reference SURVEY.md §2.3):
- F1/F2/P5/P7: the join-key normalization chain
  ``fillna("") → astype(str) → strip → lower``
  (reference dags/merge_to_dw.py:60-66).
- F3/F6: list-of-artists flattened to ``", "``-joined string
  (reference dags/merge_to_dw.py:55-58) — the reference uses a Python
  row lambda; here it is ``array_join`` (codegen'd, vectorized).
- F4: timestamp difference in days (reference notebook eda_grammy
  cell 4).
- F5: boolean mean → rate (reference notebook cells 6-7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_join_key(col: Column | str) -> Column:
    """``fillna("") → str → strip → lower`` on one key column.

    Reference dags/merge_to_dw.py:63. The ``fillna("")`` matters for
    join semantics: the reference *deliberately* converts null keys to
    empty string so they match each other in the outer merge. Spark
    nulls never equi-join, so the engine replicates the empty-string
    convention rather than leaving nulls (SURVEY.md §4.3 caveat).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.coalesce(c.cast("string"), F.lit(""))))


def normalize_join_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Apply :func:`normalize_join_key` in place to each key column."""
    return df.withColumns({k: normalize_join_key(k) for k in keys})


def flatten_string_list(col: Column | str, sep: str = ", ") -> Column:
    """Array-of-string → joined string; non-array passthrough is the
    caller's concern (the engine declares types; the reference guessed
    per-row with ``isinstance``, dags/merge_to_dw.py:55-58)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(c, sep)


def days_between(later: Column | str, earlier: Column | str) -> Column:
    """Whole days between two timestamps (reference eda_grammy cell 4,
    ``(updated_at - published_at).dt.days``)."""
    lt = F.col(later) if isinstance(later, str) else later
    et = F.col(earlier) if isinstance(earlier, str) else earlier
    return F.datediff(lt, et)


def epoch_micros(df: DataFrame, col_name: str) -> Column:
    """Microseconds since the epoch for a timestamp column of EITHER
    flavor — ``timestamp`` (LTZ) via ``unix_micros``, or
    ``timestamp_ntz`` via ``timestampdiff`` from the naive epoch.

    Spark 4's ``unix_micros`` rejects TIMESTAMP_NTZ outright, and
    casting NTZ→LTZ first would interpret the naive value in the
    session timezone — a silent, DST-dependent shift that breaks
    parity with engines (DuckDB) that treat naive timestamps as UTC.
    The parquet writer decides which flavor a scan produces, so
    time-arithmetic operators must accept both.
    """
    dtype = dict(df.dtypes).get(col_name)
    if dtype == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col_name}`)"
        )
    return F.unix_micros(F.col(col_name))


def bool_rate(col: Column | str) -> Column:
    """Mean of a boolean → rate in [0,1] (reference eda_grammy cells
    6-7, ``winner.mean()``). Nulls are excluded, matching pandas."""
    c = F.col(col) if isinstance(col, str) else col
    return F.avg(c.cast("int"))
