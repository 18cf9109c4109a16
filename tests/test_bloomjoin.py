"""Bloom-filter semi-join: exactness, the no-false-negative invariant,
sizing math, and the shuffle-pruning behavior that is the operator's
reason to exist (operators/bloomjoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.bloomjoin import (
    _MAX_BITS,
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_semi_join,
)


def test_bloom_params_textbook_sizing():
    m, k = bloom_params(1000, 0.01)
    # -1000 ln(.01) / ln(2)^2 = 9585.1 -> word-rounded
    assert m == 9600
    assert k == 7  # (m/n) ln 2 = 6.65 -> 7
    # degenerate and capped cases
    assert bloom_params(0, 0.5)[0] >= 64
    assert bloom_params(10**12, 0.001)[0] == _MAX_BITS
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives_and_fp_rate(spark):
    """Every inserted key passes the probe (construction invariant);
    at textbook sizing the measured FP rate on disjoint keys is near
    the requested fpp."""
    n = 2000
    build = spark.range(n).select(F.col("id").alias("k"))
    m, k = bloom_params(n, 0.01)
    bitmap = bloom_build(build, "k", m, k)
    bf_df = spark.createDataFrame([(bitmap,)], "bf array<bigint>")

    hits = (
        build.crossJoin(F.broadcast(bf_df))
        .filter(bloom_might_contain(F.col("bf"), F.col("k"), m, k))
        .count()
    )
    assert hits == n  # no false negatives

    # disjoint probe keys: only false positives survive
    probe = spark.range(n, 9 * n).select(F.col("id").alias("k"))
    fps = (
        probe.crossJoin(F.broadcast(bf_df))
        .filter(bloom_might_contain(F.col("bf"), F.col("k"), m, k))
        .count()
    )
    fp_rate = fps / (8 * n)
    assert fp_rate < 0.05, fp_rate  # requested 0.01, generous margin


def test_semi_join_exact_vs_plain(spark):
    """bloom_semi_join == plain left_semi on mixed keys including
    NULLs and many-to-many duplicates — even with a deliberately tiny,
    collision-heavy bitmap (est_build_items far under-sized), because
    the confirming join makes false positives harmless."""
    probe = spark.createDataFrame(
        [(i % 50 if i % 7 else None, f"p{i}") for i in range(400)],
        "k int, payload string",
    )
    build = spark.createDataFrame(
        [(i,) for i in range(0, 50, 3)] * 2 + [(None,)], "k int"
    )
    expected = sorted(
        probe.join(build, "k", "left_semi").select("k", "payload").collect()
    )
    for est in (1, 1000):  # under-sized (FP-heavy) and right-sized
        got = sorted(
            bloom_semi_join(probe, build, "k", est_build_items=est)
            .select("k", "payload")
            .collect()
        )
        assert got == expected


def test_semi_join_distinct_key_names(spark):
    probe = spark.createDataFrame([(1, "a"), (2, "b")], "pk int, v string")
    build = spark.createDataFrame([(2,), (3,)], "bk int")
    got = bloom_semi_join(probe, build, "pk", "bk").collect()
    assert [(r["pk"], r["v"]) for r in got] == [(2, "b")]


def test_build_shuffle_bounded_by_bitmap(spark):
    """The build-side aggregate shuffles at most m/64 rows no matter
    how many build rows go in — the property that makes the bitmap
    cheaper than shuffling the keys themselves."""
    n = 50_000
    m, k = bloom_params(n, 0.01)
    bitmap = bloom_build(spark.range(n).select(F.col("id").alias("k")), "k", m, k)
    assert len(bitmap) == m // 64
    nonzero = sum(1 for w in bitmap if w)
    assert nonzero <= m // 64
    # with k*n insertions into m bits, expected fill keeps words dense
    # but the ROW count of the aggregate output is capped by m//64
    assert m // 64 < n  # the cap is genuinely smaller than the input


def test_probe_shuffle_pruned(spark):
    """With broadcast disabled (forcing the shuffle join regime the
    operator targets), the probe-side exchange carries only the bloom
    survivors: shuffle bytes drop versus the plain semi-join."""
    from bench import _shuffle_snapshot

    probe = spark.range(200_000).select(
        F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    )
    build = spark.range(0, 200_000, 101).select(F.col("id").alias("k"))  # ~1%

    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    with_conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        s0 = _shuffle_snapshot(spark)
        plain = probe.join(build, "k", "left_semi").count()
        s1 = _shuffle_snapshot(spark)
        bloomed = bloom_semi_join(probe, build, "k").count()
        s2 = _shuffle_snapshot(spark)
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        with_conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    assert plain == bloomed == probe.join(build, "k", "left_semi").count()
    plain_bytes = s1 - s0
    bloom_bytes = s2 - s1
    # 1% selectivity: the bloomed run shuffles the pruned probe plus
    # the (tiny) bitmap aggregate; anything under half the plain run
    # proves the pruning (measured ~10x in practice).
    assert bloom_bytes < plain_bytes / 2, (plain_bytes, bloom_bytes)


def test_arrow_tier_matches_expression_tier(spark):
    """Above _EXPR_WORDS the probe switches to the Arrow-vectorized
    numpy bit test — same positions, same survivors, same final
    result as the pure-expression tier (and as the plain join)."""
    from workshoop2_etl_spark.operators.bloomjoin import (
        _EXPR_WORDS,
        bloom_params,
    )

    probe = spark.range(30_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    build = spark.range(0, 30_000, 13).select(F.col("id").alias("k"))
    expected = sorted(
        map(tuple, probe.join(build, "k", "left_semi").collect())
    )
    # force the big-bitmap tier: est items sized so m/64 > _EXPR_WORDS
    big_est = (_EXPR_WORDS * 64 * 2) // 10  # ~10 bits/key at fpp 0.01
    m, _ = bloom_params(big_est, 0.01)
    assert m // 64 > _EXPR_WORDS  # the tier switch actually triggers
    got = sorted(
        map(
            tuple,
            bloom_semi_join(
                probe, build, "k", est_build_items=big_est
            ).collect(),
        )
    )
    assert got == expected


def test_broadcast_release_hook(spark):
    """r9 ADVICE: the big tier's bitmap broadcast is tracked and
    reclaimable; release keeps already-built frames re-executable
    (unpersist re-ships lazily from the driver value)."""
    from workshoop2_etl_spark.operators.bloomjoin import (
        _EXPR_WORDS,
        _LIVE_BROADCASTS,
        bloom_params,
        release_bloom_broadcasts,
    )

    release_bloom_broadcasts()  # clean slate
    probe = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    build = spark.range(0, 10_000, 13).select(F.col("id").alias("k"))
    big_est = (_EXPR_WORDS * 64 * 2) // 10
    m, _ = bloom_params(big_est, 0.01)
    assert m // 64 > _EXPR_WORDS
    out = bloom_semi_join(probe, build, "k", est_build_items=big_est)
    n1 = out.count()
    assert len(_LIVE_BROADCASTS) == 1
    assert release_bloom_broadcasts() == 1
    assert not _LIVE_BROADCASTS
    # the frame still executes after release (lazy re-broadcast)
    assert out.count() == n1
    assert release_bloom_broadcasts() == 0  # idempotent


def test_broadcast_registry_self_caps():
    """The tracked-broadcast registry must not pin handles forever in
    non-bench sessions: past the cap the OLDEST is unpersisted and
    dropped (safe: unpersist re-ships lazily)."""
    from workshoop2_etl_spark.operators import bloomjoin as bj

    class _FakeBC:
        def __init__(self):
            self.unpersisted = False

        def unpersist(self):
            self.unpersisted = True

    bj.release_bloom_broadcasts()  # clean slate
    fakes = [_FakeBC() for _ in range(bj._MAX_LIVE_BROADCASTS + 3)]
    for f in fakes:
        bj._track_broadcast(f)
    assert len(bj._LIVE_BROADCASTS) == bj._MAX_LIVE_BROADCASTS
    assert all(f.unpersisted for f in fakes[:3])  # oldest evicted
    assert not any(f.unpersisted for f in fakes[3:])
    n = bj.release_bloom_broadcasts()
    assert n == bj._MAX_LIVE_BROADCASTS
    assert all(f.unpersisted for f in fakes)
