"""Streaming Python DataSource: offset mechanics under repeated
bounded activations with a shared checkpoint — each availableNow
activation of a SimpleDataSourceStreamReader consumes exactly one
read() slice, so successive activations must resume from the
committed offset and never re-emit rows."""

from __future__ import annotations

import pytest

from workshoop2_etl_spark.sources.synthetic import (
    HAVE_PYTHON_DATASOURCE,
    SyntheticEventsStreamReader,
    register_synthetic_source,
    synth_row,
)

pytestmark = pytest.mark.skipif(
    not HAVE_PYTHON_DATASOURCE, reason="Python DataSource needs Spark 4"
)


def _activate_once(spark, out_dir: str, ckpt: str) -> None:
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", "500")
        .option("batchrows", "137")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


def test_stream_source_resumes_from_checkpoint(spark, tmp_path):
    register_synthetic_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _activate_once(spark, out, ckpt)
    first = spark.read.parquet(out).count()
    assert first == 137  # one rate-limited slice
    _activate_once(spark, out, ckpt)
    second = spark.read.parquet(out).count()
    assert second == 274  # resumed at 137, no re-emit
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == list(range(274))  # exact prefix, gapless


def test_stream_reader_replay_is_deterministic():
    r = SyntheticEventsStreamReader(n_rows=50, batch_rows=20)
    assert r.initialOffset() == {"idx": 0}
    rows1, nxt = r.read({"idx": 0})
    assert nxt == {"idx": 20}
    replay = list(r.readBetweenOffsets({"idx": 0}, {"idx": 20}))
    assert list(rows1) == replay == [synth_row(i) for i in range(20)]
    # tail slice clamps at the feed bound
    rows3, nxt3 = r.read({"idx": 40})
    assert nxt3 == {"idx": 50} and len(list(rows3)) == 10
    with pytest.raises(ValueError):
        SyntheticEventsStreamReader(n_rows=10, batch_rows=0)


def test_foreachbatch_stream_upsert_merges_incrementally(spark, tmp_path):
    """Two bounded activations over a growing source directory: the
    second batch's overlapping keys replace the first's rows, new
    keys append, untouched keys survive — the streaming MERGE sink."""
    from pyspark.sql import functions as F

    from workshoop2_etl_spark.streaming.events import run_stream_upsert

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    ).write.parquet(src)

    def activate():
        stream = spark.readStream.schema(
            "k long, name string, v double"
        ).parquet(src)
        run_stream_upsert(stream, dst, ckpt, ["k"])

    activate()
    assert sorted(
        (r.k, r.v) for r in spark.read.parquet(dst).collect()
    ) == [(1, 10.0), (2, 20.0), (3, 30.0)]

    # second file: update k=2, insert k=4
    spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k long, name string, v double"
    ).write.mode("append").parquet(src)
    activate()
    got = sorted((r.k, r.name, r.v) for r in spark.read.parquet(dst).collect())
    assert got == [(1, "a", 10.0), (2, "b2", 99.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_drop_duplicates_within_watermark_suppresses_near_dupes(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate keys arriving within
    the watermark horizon are suppressed while state for expired keys
    is evicted — the bounded-state streaming dedup (the exact variant
    keeps state forever)."""
    import datetime as dt

    src = str(tmp_path / "dd_src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=5)),   # dup within horizon
        (2, t0 + dt.timedelta(minutes=10)),
        (2, t0 + dt.timedelta(minutes=12)),  # dup within horizon
        (3, t0 + dt.timedelta(hours=5)),
    ]
    spark.createDataFrame(rows, "k long, ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("k long, ts timestamp").parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["k"])
    from workshoop2_etl_spark.streaming import run_available_now

    out = run_available_now(deduped, "q_dd_watermark")
    keys = sorted(r.k for r in out.collect())
    assert keys == [1, 2, 3]  # one survivor per key


def test_transform_with_state_running_totals(spark):
    """Spark 4 arbitrary-state API (transformWithStateInPandas):
    batch parity of the last emission per user. Environment-gated —
    the API needs protobuf in the Python env; where absent, the
    operator must refuse with a clear error instead of crashing the
    activation mid-stream."""
    import pytest as _pytest
    from pyspark.sql import functions as SF

    from workshoop2_etl_spark.streaming.events import (
        _tws_available,
        running_user_totals_tws,
        run_available_now,
        stream_events,
    )

    sf_dir = "/root/testdata/sf0.001"
    stream = stream_events(spark, f"{sf_dir}/events.parquet")
    if not _tws_available():
        with _pytest.raises(RuntimeError, match="protobuf"):
            running_user_totals_tws(stream)
        return

    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = run_available_now(
            running_user_totals_tws(stream),
            "tws_running_totals",
            output_mode="update",
        )
        # last (= max-n, monotone) emission per user == batch aggregate
        from pyspark.sql import Window as W

        last = (
            out.withColumn(
                "__r",
                SF.row_number().over(
                    W.partitionBy("user_id").orderBy(SF.desc("n"))
                ),
            )
            .filter("__r = 1")
            .select("user_id", "n", SF.round("total", 2).alias("total"))
        )
        batch = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy(SF.col("user_id").cast("long").alias("user_id"))
            .agg(
                SF.count(SF.lit(1)).alias("n"),
                SF.round(SF.sum("value"), 2).alias("total"),
            )
        )
        a = sorted(map(tuple, last.collect()))
        b = sorted(map(tuple, batch.collect()))
        assert a == b
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prior
            )
