"""Bloom-filter semi-join: exact big-big semi-join with the probe-side
shuffle pruned by a compact bloom filter of the build side's keys.

The gap this fills sits between the engine's two existing join
regimes. A selective dimension that fits the broadcast threshold is
broadcast (``star.py``); a non-selective big-big join hash-partitions
both sides (``merge.py``). In between lives the production case where
the build side is too big to broadcast as *rows* (tens of millions of
keys) but its **bloom filter** — ~10 bits per key — still fits: a
100 M-key build side is a 120 MB broadcast as rows but a 15 MB bitmap.
Pruning the probe side with the bitmap BEFORE its exchange removes
(1 - selectivity - fpp) of the shuffle, which at 100 TB is the
difference between shuffling the whole fact table and shuffling only
the ~matching slice. Spark's own runtime bloom-filter rewrite
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, SPARK-32268)
applies the same idea; this operator is the explicit, plannable form
usable when the optimizer's creation-side heuristics decline (no
shuffle on the build side, non-equi downstream use, or a DSv2 source
the rewrite won't touch) — and it works on any Spark build because it
uses only public column functions, not the internal
``bloom_filter_agg`` routine (unresolvable from SQL here).

Exactness is NOT probabilistic: the bloom pass only *prunes*; an
ordinary ``left_semi`` join on the survivors confirms every match, so
false positives cost bytes, never correctness (no false negatives by
the no-false-negative invariant of the construction, proven in
tests/test_bloomjoin.py).

Construction (all JVM-side, whole-stage-codegen-friendly):

- Kirsch–Mitzenmacher double hashing: ``pos_i = (h1 + i*h2) mod m``
  with ``h1 = xxhash64(key)``, ``h2 = xxhash64(key, salt)`` — two
  hash evaluations serve all ``k`` probes. Both hashes are reduced
  mod m BEFORE combining (``(h1%m + i*(h2%m)) mod m`` ≡ the same
  position), keeping every intermediate ≤ 17·2^27 — no long overflow
  under ANSI arithmetic (Spark 4 default).
- Build: explode the k positions, fold into 64-bit words with
  ``bit_or`` — the build-side shuffle is AT MOST ``m/64`` rows of
  (word_idx, word) regardless of build cardinality, and map-side
  partial ``bit_or`` makes it usually far less.
- The probe is a plain ``Filter`` over the scan that STAYS BELOW the
  join's exchange. How the bitmap reaches it is sized in two tiers,
  both measured (r8, 600 k probe rows): small bitmaps
  (≤ ``_EXPR_WORDS`` words) ride as an ``array<long>`` literal inside
  pure column expressions; big bitmaps switch to ONE Arrow-vectorized
  ``mapInPandas`` bit test over a numpy ``uint64`` view — because a
  multi-thousand-element array literal breaks whole-stage codegen
  (JVM method limits) and every per-row access runs interpreted at
  3–10 µs/row (measured 4.7–33 s over 600 k rows), while the numpy
  test is a few ms per batch. The two hash columns are ALWAYS
  computed JVM-side (xxhash64), so both tiers test identical
  positions and the Arrow batch carries two extra longs, nothing
  else. Two designs that look cleaner are exactly wrong here:
  ``crossJoin(broadcast(one_row))`` — Catalyst treats the filter as
  a join condition and reorders the nested-loop join ABOVE the
  semi-join it was built to prune; and a scalar subquery — the
  unfoldable expression blocks codegen the same way (measured 3.5 s).

Reference parity: the reference engine (575 lines of eager pandas,
see SURVEY.md §2.4) has no big-big join story at all — every join is
an in-memory ``pd.merge``; this operator is part of the 100 TB
extension surface, like the salted-merge hot-key branch it composes
with.
"""

from __future__ import annotations

import math
import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hard cap on the bitmap: 2^27 bits = 16 MiB — comfortably
#: broadcastable, and at 10 bits/key it covers ~13 M build keys at the
#: requested fpp before the filter merely degrades (more false
#: positives = more bytes, still exact).
_MAX_BITS = 1 << 27

#: Fixed second-hash salt (any constant distinct from the implicit
#: xxhash64 seed works; build and probe must agree).
_H2_SALT = 0x9E3779B9


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: ``m = -n ln p / (ln 2)^2`` bits rounded up to
    a word multiple and capped at ``_MAX_BITS``; ``k = (m/n) ln 2``
    clamped to [1, 16]."""
    if n_items < 1:
        n_items = 1
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = min(max(((m + 63) // 64) * 64, 64), _MAX_BITS)
    k = max(1, min(16, round(m / n_items * math.log(2))))
    return m, k


def _shl1(nbits: Column) -> Column:
    """``1L << nbits`` with a *column* shift amount — pyspark's
    ``F.shiftleft`` only takes a Python-int shift, so this goes
    through ``call_function`` to the SQL builtin, which shifts by an
    expression."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), nbits)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k Kirsch–Mitzenmacher bit positions for ``key``."""
    m = F.lit(m_bits)
    h1 = F.pmod(F.xxhash64(key), m)
    h2 = F.pmod(F.xxhash64(key, F.lit(_H2_SALT)), m)
    return [F.pmod(h1 + F.lit(i) * h2, m) for i in range(k)]


def bloom_build(build: DataFrame, key: str, m_bits: int, k: int) -> list[int]:
    """Aggregate the build side's keys into an ``m_bits`` bloom bitmap,
    returned as a dense Python list of ``m_bits/64`` signed longs.

    The only shuffle is the (word_idx → bit_or) aggregate — at most
    ``m_bits/64`` rows after map-side combine, independent of build
    row count. The driver-side collect is bounded by the same cap
    (≤ 2 M longs at ``_MAX_BITS``), the same bounded-scalar class as
    the ANN quantizers."""
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    words = (
        build.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            _shl1((F.col("pos") % 64).cast("int")).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["word_idx"]] = r["word"]
    return bitmap


def bloom_might_contain(bf: Column, key: Column, m_bits: int, k: int) -> Column:
    """Membership test against an ``array<long>`` bitmap column —
    pure column expressions (element_at + bitwise AND), k probes."""
    cond = F.lit(True)
    for pos in _positions(key, m_bits, k):
        word = F.element_at(bf, (pos / 64).cast("int") + 1)
        bit = _shl1((pos % 64).cast("int"))
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


#: Array-literal size up to which the pure-expression probe keeps
#: whole-stage codegen (measured: fine at 512 words, interpreted and
#: 3-10 µs/row by 4509).
_EXPR_WORDS = 512

#: Bitmap broadcasts created by the big tier, awaiting release.
#: BOUNDED: beyond _MAX_LIVE_BROADCASTS the oldest handle is
#: unpersisted and dropped automatically — unpersist is SAFE while
#: its frame is still alive (Spark lazily re-ships from the
#: driver-side value on next execution; only destroy() invalidates),
#: so a long-lived non-bench session running many bloom joins holds
#: at most the cap's worth of driver/executor blocks instead of
#: accreting one ≤16 MiB block per join forever.
_LIVE_BROADCASTS: list = []
_MAX_LIVE_BROADCASTS = 8
_BROADCASTS_LOCK = threading.Lock()


def _track_broadcast(bc) -> None:
    with _BROADCASTS_LOCK:
        _LIVE_BROADCASTS.append(bc)
        while len(_LIVE_BROADCASTS) > _MAX_LIVE_BROADCASTS:
            old = _LIVE_BROADCASTS.pop(0)
            try:
                old.unpersist()
            except Exception:
                pass


def release_bloom_broadcasts() -> int:
    """Unpersist every bitmap broadcast the big-bitmap tier has
    created since the last call, returning how many were released.
    Safe to call while frames are still alive: ``unpersist`` drops
    the executor/driver memory blocks but the broadcast re-ships
    lazily from the driver value if a frame re-executes (only
    ``destroy`` would invalidate it). The registry also self-caps
    (see above); this hook reclaims eagerly — e.g. after each bench
    query."""
    n = 0
    with _BROADCASTS_LOCK:
        while _LIVE_BROADCASTS:
            bc = _LIVE_BROADCASTS.pop()
            try:
                bc.unpersist()
                n += 1
            except Exception:
                pass
    return n


def _bloom_prune_arrow(
    probe: DataFrame, bitmap: list[int], key: str, m_bits: int, k: int
) -> DataFrame:
    """The big-bitmap probe tier: JVM-computed hash columns + ONE
    Arrow-vectorized bit test per batch against a numpy ``uint64``
    view of the bitmap, shipped via ``SparkContext.broadcast`` so a
    16 MiB bitmap crosses the wire ONCE PER EXECUTOR, not once per
    task (closure capture serializes the array into every task's
    closure — at 100 TB task counts that is bitmap × tasks of
    redundant transfer). Tests the same positions as
    :func:`bloom_might_contain` bit-for-bit."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    bm_bc = probe.sparkSession.sparkContext.broadcast(
        np.array(bitmap, dtype=np.int64)
    )
    # Long-lived sessions running many bloom joins would otherwise
    # accumulate up-to-16 MiB broadcast blocks on driver + executors
    # (r9 ADVICE). The handle is tracked in a SELF-CAPPING registry
    # (oldest auto-unpersisted past the cap); callers can reclaim
    # eagerly with release_bloom_broadcasts() — unpersist (not
    # destroy) keeps frames re-executable either way.
    _track_broadcast(bm_bc)
    with_h = probe.withColumn(
        "__bloom_h1", F.pmod(F.xxhash64(F.col(key)), F.lit(m_bits))
    ).withColumn(
        "__bloom_h2",
        F.pmod(F.xxhash64(F.col(key), F.lit(_H2_SALT)), F.lit(m_bits)),
    )
    schema = T.StructType(
        [f for f in with_h.schema if f.name not in ("__bloom_h1", "__bloom_h2")]
    )

    def batches(it):
        one = np.uint64(1)
        bm = bm_bc.value.view(np.uint64)
        for pdf in it:
            h1 = pdf["__bloom_h1"].to_numpy(np.int64)
            h2 = pdf["__bloom_h2"].to_numpy(np.int64)
            mask = np.ones(len(pdf), dtype=bool)
            for i in range(k):
                pos = (h1 + i * h2) % m_bits
                word = bm[pos >> 6]
                bit = (word >> (pos % 64).astype(np.uint64)) & one
                mask &= bit.astype(bool)
            out = pdf.loc[mask].drop(columns=["__bloom_h1", "__bloom_h2"])
            if len(out):
                yield out

    return with_h.mapInPandas(batches, schema)


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    *,
    est_build_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """EXACT ``probe LEFT SEMI JOIN build`` with the probe-side
    exchange pruned by a bloom filter of the build keys.

    ``est_build_items`` sizes the bitmap; when omitted it is measured
    with one ``count()`` on the (key-projected) build side — cheap
    next to the join it optimizes, and exact sizing beats a guess.
    The build side is scanned twice (bitmap + confirming join); both
    scans are key-column-only, so the parquet reader prunes to one
    column each time.
    """
    build_key = build_key or probe_key
    keys = build.select(build_key)
    n = est_build_items if est_build_items is not None else keys.count()
    m_bits, k = bloom_params(n, fpp)
    bitmap = bloom_build(keys, build_key, m_bits, k)

    if len(bitmap) <= _EXPR_WORDS:
        bf = F.lit(bitmap).cast("array<bigint>")
        pruned = probe.filter(
            bloom_might_contain(bf, F.col(probe_key), m_bits, k)
        )
    else:
        pruned = _bloom_prune_arrow(probe, bitmap, probe_key, m_bits, k)
    if probe_key == build_key:
        return pruned.join(keys, on=probe_key, how="left_semi")
    return pruned.join(
        keys, on=pruned[probe_key] == keys[build_key], how="left_semi"
    )
