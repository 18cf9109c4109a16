"""Global contiguous ID assignment without a global sort bottleneck.

``row_number() OVER (ORDER BY key)`` — the naive formulation — plans a
single-partition window: every row funnels through ONE task, the
textbook scale failure. :func:`assign_global_ids` produces the exact
same numbering with the classic two-phase scheme instead:

1. range-repartition by the ordering key (Spark samples boundaries, so
   partitions are balanced), number rows *within* each partition —
   parallel windows, one per range;
2. count rows per range (a P-row aggregate, P = #partitions), prefix-
   sum the counts on the driver (P longs — not data), broadcast the
   offsets back, and add.

The result is deterministic for a unique ordering key: ids equal the
key's rank regardless of where Spark draws the range boundaries.
Training pipelines want exactly this — stable, dense ``int64`` doc ids
for shard addressing and example bookkeeping — and
``monotonically_increasing_id`` explicitly does NOT provide it
(non-contiguous, partition-layout-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_global_ids(
    df: DataFrame,
    order_col: str,
    *,
    id_name: str = "gid",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 0-based ``id_name`` column equal to each row's rank
    under ``order_col`` (which must be unique — duplicate keys get
    arbitrary but still unique ids within their tie group).

    Two shuffles (range repartition + per-range window sort that reuses
    the range layout) and one P-row driver hop; no stage is ever
    single-partition.

    The input lineage is evaluated twice (once for the counts, once in
    the returned plan) — safe because ``repartitionByRange`` samples
    its boundaries with a fixed seed, so both evaluations see identical
    partitioning; callers with an expensive upstream should persist
    ``df`` first.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = ranged.withColumn("__rn", F.row_number().over(w))

    counts = (
        local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    # Range partition ids are ordered by key range, so offsets are the
    # prefix sums of counts in __pid order. P rows on the driver.
    offset, offsets = 0, {}
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = offset
        offset += row["__n"]
    offmap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    return (
        local.withColumn(
            id_name,
            (offmap[F.col("__pid")] + F.col("__rn") - 1).cast("long"),
        )
        .drop("__pid", "__rn")
    )
