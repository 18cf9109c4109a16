"""Star-schema builder — set-based dimension & fact construction.

Parity target (reference SURVEY.md §2.1 S9 / §2.4 J2): the reference
builds 6 dimensions + 2 facts by looping *per row* and issuing
insert-or-lookup queries against MySQL (reference
dags/merge_to_dw.py:153-170 ``insert_dim``, :198-300 row loop) — an
N+1-query row-at-a-time algorithm. The engine preserves the resulting
*table semantics* (each distinct natural key appears once with a
stable surrogate key; facts carry resolved FK ids; rows with missing
required keys are dropped) while replacing the algorithm with the
set-based idiom (SURVEY.md §7 step 5):

    distinct natural keys → anti-join against the existing dim →
    assign new surrogate keys → union.

Surrogate keys are ``row_number`` over the natural-key ordering —
deterministic across reruns and partitionings, unlike
``monotonically_increasing_id`` (partition-dependent) or arrival
order in the reference (run-dependent).

Scale notes: dims come from a distinct (one shuffle each, usually
tiny after AQE coalescing); FK resolution joins are **broadcast** —
dimension tables are small by construction, so the 100 TB fact scan
never shuffles during resolution. The only caveat is the global
``row_number`` for key assignment: it funnels *new distinct keys*
(not rows) through one partition; fine for real dimension
cardinalities, and swappable for ``xxhash64(natural_key)`` keys when
a dimension itself is huge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dim(
    src: DataFrame,
    natural_keys: Sequence[str],
    surrogate_col: str,
    *,
    extra_cols: Sequence[str] = (),
    key_strategy: str = "row_number",
) -> DataFrame:
    """Fresh dimension from a source: distinct non-null natural keys
    plus a surrogate id.

    Mirrors what the reference's per-row ``insert_dim`` loop converges
    to (dags/merge_to_dw.py:198-251), minus arrival-order key values.
    ``extra_cols`` are carried attributes, deduplicated by first value
    under natural-key ordering.

    ``key_strategy`` picks the surrogate assignment:

    - ``"row_number"`` (default): dense ids 1..N ordered by natural
      key — reference-faithful, but the global window funnels the
      *distinct keys* through one partition. Right for true
      dimensions (≤ millions of keys).
    - ``"hash"``: ``xxhash64(natural_keys)`` — fully parallel, no
      global window, stable across reruns and cluster sizes. The
      100 TB path for high-cardinality dimensions (user ids, URLs);
      ids are sparse 64-bit, collision odds ~n²/2⁶⁵.
    """
    nk = list(natural_keys)
    cols = nk + list(extra_cols)
    distinct = src.select(*cols).where(
        F.lit(True) if not nk else F.expr(" AND ".join(f"{k} IS NOT NULL" for k in nk))
    )
    if extra_cols:
        w = Window.partitionBy(*nk).orderBy(*[F.col(c) for c in extra_cols])
        distinct = (
            distinct.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        distinct = distinct.distinct()
    if key_strategy == "hash":
        return distinct.withColumn(surrogate_col, F.xxhash64(*nk)).select(
            surrogate_col, *cols
        )
    if key_strategy != "row_number":
        raise ValueError(f"unknown key_strategy: {key_strategy!r}")
    w_key = Window.orderBy(*[F.col(k) for k in nk])
    return distinct.withColumn(surrogate_col, F.row_number().over(w_key)).select(
        surrogate_col, *cols
    )


def upsert_dim(
    existing: DataFrame,
    src: DataFrame,
    natural_keys: Sequence[str],
    surrogate_col: str,
    *,
    key_strategy: str = "row_number",
) -> DataFrame:
    """Insert-or-lookup, set-wise (reference S9): keys already in
    ``existing`` keep their surrogate id; new keys get fresh ids.
    Equivalent to the reference's try-INSERT-except-SELECT per row
    (dags/merge_to_dw.py:153-170), executed as one anti-join.

    ``key_strategy="row_number"`` continues dense ids after the
    current max, ordered by natural key (global window over *new*
    keys only); ``"hash"`` assigns ``xxhash64(natural_keys)`` with no
    window at all — use when the dim itself is huge, paired with a
    hash-built ``existing``."""
    nk = list(natural_keys)
    new_keys = (
        src.select(*nk)
        .where(F.expr(" AND ".join(f"{k} IS NOT NULL" for k in nk)))
        .distinct()
        .join(existing.select(*nk), nk, "left_anti")
    )
    if key_strategy == "hash":
        assigned = new_keys.withColumn(surrogate_col, F.xxhash64(*nk)).select(
            surrogate_col, *nk
        )
        return existing.select(surrogate_col, *nk).unionByName(assigned)
    if key_strategy != "row_number":
        raise ValueError(f"unknown key_strategy: {key_strategy!r}")
    offset = existing.agg(F.coalesce(F.max(surrogate_col), F.lit(0)).alias("m"))
    w_key = Window.orderBy(*[F.col(k) for k in nk])
    assigned = (
        new_keys.withColumn("__rn", F.row_number().over(w_key))
        .crossJoin(F.broadcast(offset))
        .withColumn(surrogate_col, (F.col("__rn") + F.col("m")).cast("int"))
        .select(surrogate_col, *nk)
    )
    return existing.select(surrogate_col, *nk).unionByName(assigned)


def resolve_fk(
    fact_src: DataFrame,
    dim: DataFrame,
    natural_keys: Sequence[str],
    surrogate_col: str,
    *,
    required: bool = False,
) -> DataFrame:
    """Attach ``surrogate_col`` to ``fact_src`` by joining the dim on
    its natural key. Dimensions broadcast (small by construction) so
    the fact side stays shuffle-free. ``required=True`` drops rows
    whose FK did not resolve — the reference's per-row null routing
    (P11, dags/merge_to_dw.py:254,288)."""
    nk = list(natural_keys)
    out = fact_src.join(
        F.broadcast(dim.select(surrogate_col, *nk)), nk, "left"
    )
    if required:
        out = out.filter(F.col(surrogate_col).isNotNull())
    return out
