"""The merge operator — full outer equi-join with provenance indicator.

Parity target (reference SURVEY.md §2.4 J1): the flagship
``pd.merge(spotify, grammy, on=["track_name","artists"], how="outer",
indicator=True)`` (reference dags/merge_to_dw.py:47-84, join at
:71-77). Semantics to preserve exactly:

- keys are pre-normalized with ``fillna("") → str → strip → lower``
  so *null keys match each other* (as empty string) — Spark nulls
  never equi-join, hence the normalization is part of the operator;
- many-to-many: duplicate keys on both sides cross-product within the
  key group (both pandas and Spark do this natively);
- a ``_merge`` indicator column: ``both`` / ``left_only`` /
  ``right_only``, rebuilt from non-null probe columns.

Scale notes: a full outer join cannot broadcast — both sides
hash-partition on the join key. That is the right plan at 100 TB;
AQE splits skewed key groups (e.g. the empty-string key, which this
operator *creates* by design — at scale, consider filtering the ""
group into a separate union branch if it grows hot).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workshoop2_etl_spark.functions.text import normalize_join_keys

#: pandas uses a Categorical {left_only, right_only, both}; the engine
#: uses plain strings with the same vocabulary.
INDICATOR_VALUES = ("left_only", "right_only", "both")


def full_outer_with_indicator(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    indicator_col: str = "_merge",
    normalize_keys: bool = True,
) -> DataFrame:
    """Full outer join with a pandas-style ``indicator`` column.

    Output columns: join keys once, then left non-key columns, right
    non-key columns, then ``indicator_col`` — pandas' column order.
    """
    on = list(on)
    if normalize_keys:
        left = normalize_join_keys(left, on)
        right = normalize_join_keys(right, on)

    l_probe, r_probe = "__l_probe", "__r_probe"
    lj = left.withColumn(l_probe, F.lit(1))
    rj = right.withColumn(r_probe, F.lit(1))
    joined = lj.join(rj, on, "full_outer")

    indicator = (
        F.when(F.col(r_probe).isNull(), F.lit("left_only"))
        .when(F.col(l_probe).isNull(), F.lit("right_only"))
        .otherwise(F.lit("both"))
    )
    left_cols = [c for c in left.columns if c not in on]
    right_cols = [c for c in right.columns if c not in on]
    return joined.select(
        *on, *left_cols, *right_cols, indicator.alias(indicator_col)
    )


def merge_provenance_counts(merged: DataFrame, indicator_col: str = "_merge") -> DataFrame:
    """``value_counts`` over the indicator (reference
    dags/merge_to_dw.py:82 logs exactly this after the merge)."""
    return (
        merged.groupBy(indicator_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc(indicator_col))
    )
