"""Global contiguous ID assignment without a global sort bottleneck.

``row_number() OVER (ORDER BY key)`` — the naive formulation — plans a
single-partition window: every row funnels through ONE task, the
textbook scale failure. :func:`assign_global_ids` produces the exact
same numbering with the classic two-phase scheme instead:

1. range-repartition by the ordering key (Spark samples boundaries, so
   partitions are balanced), number rows *within* each partition —
   parallel windows, one per range;
2. count rows per range (a P-row aggregate, P = #partitions), prefix-
   sum the counts with a window over those P rows, broadcast-join the
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

    The whole computation is ONE plan in which the per-range rows and
    the per-range counts are two branches over the *same* range
    exchange. Spark's exchange reuse (``spark.sql.exchange.reuse``,
    on by default, and AQE stage reuse) dedupes the identical
    subtrees, so the range shuffle — including its nondeterministic
    boundary sampling — executes exactly ONCE and both branches read
    the same shuffle output. This matters: ``repartitionByRange``
    samples boundaries with a seed derived from the runtime RDD id,
    so two *separate* executions of the same lineage may draw
    different boundaries once partitions exceed the reservoir sample
    size (~``spark.sql.execution.rangeExchange.sampleSizePerPartition``
    rows). An earlier formulation collected the counts in a separate
    job and could mismatch the second run's partitioning; the
    single-plan join formulation removes both the second job and the
    driver collect. (Correctness therefore rides on exchange reuse —
    ``spark.sql.exchange.reuse`` and the AQE stage-reuse equivalent,
    both default-on since 2.x; the regression test runs 6k rows per
    partition, far past the reservoir, and asserts the reuse node is
    present in the executed plan.)

    The offsets branch is P rows (P = #partitions): its prefix-sum
    window runs on one task over P longs — metadata, not data — and
    joins back in via broadcast hash join.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    local = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__pid").orderBy(order_col)
            ),
        )
    )
    # Range partition ids are ordered by key range, so offsets are the
    # prefix sums of counts in __pid order. P rows; coalesce(1) (a
    # narrow pull, not a shuffle — its outputPartitioning IS
    # SinglePartition) lets the unpartitioned prefix-sum window plan
    # with no Exchange at all.
    offsets = (
        local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .coalesce(1)
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_name, (F.col("__off") + F.col("__rn") - 1).cast("long")
        )
        .drop("__pid", "__rn", "__off")
    )
