"""Schema contracts and validators.

The reference's only schema check is a hand-rolled required-columns
assertion (reference dags/limpiezaSpotify.py:78-81). The engine
generalizes it: explicit ``StructType`` contracts per source plus a
reusable validator, raised eagerly at plan-build time (cheap — only
touches ``df.columns`` / ``df.schema``, never data).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class SchemaContractError(ValueError):
    """A DataFrame does not satisfy its declared schema contract."""


def require_columns(df: DataFrame, required: Iterable[str]) -> DataFrame:
    """Raise unless every column in ``required`` is present.

    Parity with the reference's required-columns assertion
    (reference dags/limpiezaSpotify.py:78-81), which raises
    ``ValueError`` listing the missing columns.
    """
    missing = sorted(set(required) - set(df.columns))
    if missing:
        raise SchemaContractError(f"missing required columns: {missing}")
    return df


def validate_schema(
    df: DataFrame, contract: T.StructType, *, strict: bool = False
) -> DataFrame:
    """Check ``df`` against a StructType contract.

    Non-strict (default): every contract field must exist with the
    exact declared type; extra columns are allowed. Strict: the
    column sets must match exactly (order-insensitive).
    """
    actual = {f.name: f.dataType for f in df.schema.fields}
    problems: list[str] = []
    for field in contract.fields:
        if field.name not in actual:
            problems.append(f"missing column {field.name!r}")
        elif actual[field.name] != field.dataType:
            problems.append(
                f"column {field.name!r}: expected {field.dataType.simpleString()}, "
                f"got {actual[field.name].simpleString()}"
            )
    if strict:
        extra = sorted(actual.keys() - {f.name for f in contract.fields})
        if extra:
            problems.append(f"unexpected columns: {extra}")
    if problems:
        raise SchemaContractError("; ".join(problems))
    return df


#: Widenings a reader can apply losslessly — anything else is breaking.
_SAFE_WIDENINGS = {
    ("int", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("float", "double"),
    ("int", "double"),
    ("bigint", "double"),
    ("date", "timestamp"),
}


def schema_diff(old, new) -> dict:
    """Compatibility report between two schema versions (StructTypes)
    — the review artifact a contract change ships with, classifying
    every field change as ADDITIVE (old readers keep working: new
    nullable columns, safe type widenings, nullable→relaxed) or
    BREAKING (removed columns, narrowings/type changes, new
    NON-nullable columns — which old writers cannot produce,
    nullable→required tightenings).

    Pure metadata — no Spark job, no data read. Returns::

        {"added": [...], "removed": [...],
         "changed": [{"name", "old_type", "new_type", "breaking"}...],
         "nullability": [{"name", "old_nullable", "new_nullable",
                          "breaking"}...],
         "breaking": bool}
    """
    o = {f.name: f for f in old.fields}
    n = {f.name: f for f in new.fields}
    added = sorted(set(n) - set(o))
    removed = sorted(set(o) - set(n))
    changed = []
    nullability = []
    breaking = bool(removed)
    for name in added:
        if not n[name].nullable:
            breaking = True
    for name in sorted(set(o) & set(n)):
        ot, nt = o[name].dataType.simpleString(), n[name].dataType.simpleString()
        if ot != nt:
            is_breaking = (ot, nt) not in _SAFE_WIDENINGS
            changed.append(
                {
                    "name": name,
                    "old_type": ot,
                    "new_type": nt,
                    "breaking": is_breaking,
                }
            )
            breaking = breaking or is_breaking
        if o[name].nullable != n[name].nullable:
            tightened = o[name].nullable and not n[name].nullable
            nullability.append(
                {
                    "name": name,
                    "old_nullable": o[name].nullable,
                    "new_nullable": n[name].nullable,
                    "breaking": tightened,
                }
            )
            breaking = breaking or tightened
    return {
        "added": added,
        "removed": removed,
        "changed": changed,
        "nullability": nullability,
        "breaking": breaking,
    }
