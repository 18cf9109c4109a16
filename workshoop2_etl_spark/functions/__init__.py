"""Scalar / string / date functions (reference SURVEY.md §2.3, F1-F6)."""

from workshoop2_etl_spark.functions.text import (
    bool_rate,
    days_between,
    flatten_string_list,
    normalize_join_key,
    normalize_join_keys,
)

__all__ = [
    "bool_rate",
    "days_between",
    "flatten_string_list",
    "normalize_join_key",
    "normalize_join_keys",
]
