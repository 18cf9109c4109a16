"""Unit + plan-shape tests for the round-5 operators: time-axis
analytics guards, global-id scalability (the no-single-partition
claim), and compaction file counts. Value-level correctness is proven
by the DuckDB oracle mirror (tests/test_oracle_parity.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.ids import assign_global_ids
from workshoop2_etl_spark.operators.timeseries import (
    funnel,
    resample_fill,
    retention_cohorts,
)
from workshoop2_etl_spark.sources.readers import read_parquet
from workshoop2_etl_spark.sources.writers import compact_parquet


def test_resample_fill_oversized_grid_raises(spark, sf_dir):
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    # the guard is lazy (in-plan assert_true): plan construction is
    # side-effect-free and the failure surfaces at action time
    plan = resample_fill(
        ev,
        group_cols=["user_id"],
        ts_col="ts",
        value_col="value",
        step_seconds=1,
        max_buckets=100,
    )
    with pytest.raises(Exception, match="max_buckets"):
        plan.count()


def test_resample_fill_floors_pre_epoch_timestamps(spark):
    # truncation toward zero would put 1969-12-31T12:00 in bucket 0
    # (1970-01-01); floor puts it in bucket -1 (1969-12-31) — the
    # grid semantics and the DuckDB oracle's floor()
    from datetime import datetime

    df = spark.createDataFrame(
        [("g", datetime(1969, 12, 31, 12, 0, 0), 5.0),
         ("g", datetime(1970, 1, 1, 6, 0, 0), 7.0)],
        "g string, ts timestamp, value double",
    )
    rows = (
        resample_fill(
            df, group_cols=["g"], ts_col="ts", value_col="value",
            step_seconds=86400, agg="avg",
        )
        .orderBy("bucket_ts")
        .collect()
    )
    assert [r.bucket_ts for r in rows] == [
        datetime(1969, 12, 31, 0, 0), datetime(1970, 1, 1, 0, 0)
    ]
    assert [r.v for r in rows] == [5.0, 7.0]


def test_resample_fill_bad_agg_raises(spark, sf_dir):
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError, match="unsupported agg"):
        resample_fill(
            ev, group_cols=["user_id"], ts_col="ts",
            value_col="value", agg="median",
        )


def test_funnel_counts_are_monotonic(spark, sf_dir):
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    rows = (
        funnel(
            ev,
            actor_col="user_id",
            ts_col="ts",
            stage_col="event_type",
            stages=["signup", "view", "click", "purchase"],
        )
        .orderBy("stage_idx")
        .collect()
    )
    counts = [r.n_actors for r in rows]
    assert len(counts) == 4 and counts[0] > 0
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_funnel_requires_two_stages(spark, sf_dir):
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError, match="at least two"):
        funnel(
            ev, actor_col="user_id", ts_col="ts",
            stage_col="event_type", stages=["signup"],
        )


def test_retention_rejects_unknown_period(spark, sf_dir):
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError, match="period"):
        retention_cohorts(
            ev, actor_col="user_id", ts_col="ts", period="month"
        )


def test_global_ids_dense_and_never_single_partition(spark, sf_dir):
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = assign_global_ids(docs, "doc_id", num_partitions=8)
    # The whole point of the operator: no stage may funnel the data
    # through one partition the way OVER (ORDER BY …) would.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    rows = out.select("doc_id", "gid").orderBy("doc_id").collect()
    n = len(rows)
    assert [r.gid for r in rows] == list(range(n))  # dense, rank-ordered


def test_global_ids_single_range_shuffle_beyond_sample_size(spark):
    """Regression for the two-job formulation: repartitionByRange
    seeds its boundary sampling from the runtime RDD id, so two
    separate executions of the same lineage can draw different
    boundaries once a partition holds more rows than
    rangeExchange.sampleSizePerPartition (default 100) — the old
    collect-then-rebuild offsets map could then mismatch the second
    partitioning. The single-plan formulation must stay dense at
    50k rows / 8 ranges (6250 rows per partition >> sample size),
    and its plan must contain exactly ONE range exchange subtree
    executed (the counts branch reuses it)."""
    df = (
        spark.range(50_000)
        # decorrelate key order from partition order so ranges matter
        .select(F.xxhash64("id").alias("k"))
        .distinct()
    )
    n = df.count()
    out = assign_global_ids(df, "k", num_partitions=8)
    rows = sorted(out.collect(), key=lambda r: r.k)
    assert [r.gid for r in rows] == list(range(n))
    # collect() above finalized the AQE plan in place — read it now
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the P-row offsets branch must coalesce, never exchange-to-one
    assert "Exchange SinglePartition" not in plan
    # the counts branch must READ the data branch's range shuffle,
    # not re-execute it (re-execution re-samples boundaries)
    assert "reused" in plan.lower()


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    spark.range(20000).withColumn("x", F.rand(7)).repartition(64).write.parquet(src)
    n_before = len(glob.glob(os.path.join(src, "*.parquet")))
    assert n_before == 64
    compact_parquet(spark, src, dst, target_file_bytes=64 * 1024)
    n_after = len(glob.glob(os.path.join(dst, "*.parquet")))
    assert 1 <= n_after < n_before
    assert spark.read.parquet(dst).count() == 20000


def test_hll_union_estimate_within_error_envelope(spark, sf_dir):
    """Sharded HLL sketches unioned must estimate within the lgK=12
    HLL error envelope (~1.6% at 2 sigma; assert 5% for slack) of the
    exact distinct count — and must equal the estimate a single
    unsharded sketch would give (mergeability)."""
    import __spark_entry__ as e

    approx = (
        e.queries()["hll_shard_union_customers"](spark, sf_dir)
        .collect()[0][0]
    )
    from workshoop2_etl_spark.sources.readers import read_parquet
    from pyspark.sql import functions as F

    cust = read_parquet(spark, f"{sf_dir}/customer.parquet")
    exact = cust.select("c_custkey").distinct().count()
    assert abs(approx - exact) <= 0.05 * exact
    single = cust.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("c_custkey", F.lit(12))
        ).cast("long")
    ).collect()[0][0]
    assert approx == single  # union of shards == one global sketch


def test_python_datasource_partition_plan_is_balanced():
    from workshoop2_etl_spark.sources.synthetic import (
        SyntheticEventsReader,
    )

    r = SyntheticEventsReader(n_rows=10, n_partitions=4)
    bounds = [p.value for p in r.partitions()]
    assert bounds == [(0, 3), (3, 6), (6, 8), (8, 10)]
    sizes = [e - s for s, e in bounds]
    assert max(sizes) - min(sizes) <= 1
    # more partitions than rows collapses; zero rows is legal
    assert len(SyntheticEventsReader(n_rows=2, n_partitions=8).partitions()) == 2
    import pytest

    with pytest.raises(ValueError):
        SyntheticEventsReader(n_rows=-1, n_partitions=4)


def test_resample_fill_sum_agg_matches_independent_buckets(spark, sf_dir):
    import math

    from workshoop2_etl_spark.functions.text import epoch_micros
    from workshoop2_etl_spark.operators.timeseries import resample_fill

    ev = read_parquet(spark, f"{sf_dir}/events.parquet").filter(
        F.col("user_id") < 5
    )
    step = 86400
    s = resample_fill(
        ev, group_cols=["user_id"], ts_col="ts", value_col="value",
        step_seconds=step, agg="sum",
    )
    # Independent per-bucket ground truth: every bucket that actually
    # holds events must carry its own (unfilled) sum in the output.
    exp = (
        ev.withColumn(
            "bucket",
            F.floor(
                epoch_micros(ev, "ts") / F.lit(step * 1_000_000)
            ).cast("long"),
        )
        .groupBy("user_id", "bucket")
        .agg(F.sum("value").alias("exp"))
    )
    got = s.withColumn(
        "bucket",
        (F.unix_micros("bucket_ts") / F.lit(step * 1_000_000)).cast("long"),
    )
    rows = got.join(exp, ["user_id", "bucket"]).collect()
    assert len(rows) == exp.count()
    for r in rows:
        assert math.isclose(r.v, r.exp, rel_tol=1e-9)


def test_fuzzy_join_unbroadcast_path(spark):
    from workshoop2_etl_spark.operators.merge import fuzzy_join

    left = spark.createDataFrame([("kitten",), ("sittin",)], "a string")
    right = spark.createDataFrame([("sitting",), ("mitten",)], "b string")
    got = sorted(
        (r.a, r.b)
        for r in fuzzy_join(
            left, right, "a", "b", max_distance=2, broadcast_right=False
        ).collect()
    )
    # kitten↔sitting is distance 3 and must NOT match at bound 2
    assert got == [("kitten", "mitten"), ("sittin", "mitten"),
                   ("sittin", "sitting")]


def test_apply_cdc_rejects_missing_columns(spark):
    from workshoop2_etl_spark.operators.star import apply_cdc

    base = spark.createDataFrame([(1, "x")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "I", 1)], "k long, op string, seq long"
    )  # lacks v
    import pytest

    with pytest.raises(ValueError, match="lack base columns"):
        apply_cdc(base, changes, ["k"])


def test_compact_parquet_single_file_input(spark, tmp_path):
    src_dir = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(src_dir)
    import glob as g

    single = g.glob(os.path.join(src_dir, "*.parquet"))[0]
    dst = str(tmp_path / "one_out")
    n = compact_parquet(spark, single, dst, target_file_bytes=10**9)
    assert n == 1
    assert spark.read.parquet(dst).count() == 100
