"""Time-series operators over the events feed: gap-filled resampling,
staged funnels, and retention cohorts.

The reference's dashboards are static group-bys (SURVEY.md §2.6); these
are their time-axis siblings — the queries a product-analytics user
runs against the same fact table. All three are single-digit-shuffle
compositions of built-in operators:

- :func:`resample_fill` — per-group fixed-step grid (``sequence`` +
  explode) left-joined with per-bucket aggregates, then forward-filled
  with ``last(ignorenulls)`` over the group's time order. No UDFs; the
  grid explode is narrow; the only shuffles are the bucket aggregate
  and the per-group window sort.
- :func:`funnel` — ONE aggregation pass: min event time per stage per
  actor, then ordered-chain predicates (reached stage k iff
  m1 ≤ … ≤ mk, strictly increasing across distinct stages) unpivoted
  into (stage, n_actors) rows. Never a per-stage self-join.
- :func:`retention_cohorts` — first-activity cohort per actor × later
  activity periods → distinct-actor counts, two small aggregates and
  one join on the actor key.

Scale: every shuffle is keyed by the group/actor column; at 100 TB the
fact table shuffles once per operator on a high-cardinality key. The
grid explode in :func:`resample_fill` multiplies rows by the span/step
ratio — callers bound it with ``max_buckets`` (raise) rather than
discovering a quadratic blow-up in production.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from workshoop2_etl_spark.functions.text import epoch_micros

_US = 1_000_000


def resample_fill(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
    agg: str = "avg",
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Per-group fixed-step resample with forward fill.

    Each group's timeline becomes a dense grid of ``step_seconds``
    buckets from its first to its last observation; ``value_col`` is
    aggregated per bucket (``avg``/``sum``/``min``/``max``/``count``)
    and empty buckets inherit the most recent earlier bucket's value
    (classic ffill; leading gaps stay NULL).

    Returns (group_cols…, ``bucket_ts`` timestamp, ``v`` double).

    ``max_buckets`` guards the grid explode: a single group spanning
    years at 1-second steps would quietly generate 10⁸ rows per group
    — fail loudly instead (at action time, executor-side) so the
    caller picks a coarser step.
    """
    if agg not in ("avg", "sum", "min", "max", "count"):
        raise ValueError(f"unsupported agg {agg!r}")
    gcols = list(group_cols)
    step_us = step_seconds * _US
    # floor, not cast-truncation: division truncates TOWARD ZERO, so a
    # pre-1970 timestamp would land one bucket high — diverging from
    # both the grid semantics and the DuckDB oracle's floor().
    bucket = F.floor(epoch_micros(df, ts_col) / F.lit(step_us)).cast(
        "long"
    )

    per_bucket = (
        df.withColumn("__bucket", bucket)
        .groupBy(*gcols, "__bucket")
        .agg(getattr(F, agg)(F.col(value_col)).cast("double").alias("__v"))
    )
    spans = per_bucket.groupBy(*gcols).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    # Lazy in-plan guard (no extra job, plan construction stays
    # side-effect-free): assert_true evaluates executor-side on the
    # P-group spans rows during the single execution and fails the
    # job with the message below; an earlier version ran an eager
    # take(1) here, executing the full per-bucket aggregate at CALL
    # time and again at action time.
    guarded_hi = F.when(
        F.assert_true(
            (F.col("__hi") - F.col("__lo")) < F.lit(max_buckets),
            F.lit(
                f"resample_fill grid would exceed max_buckets="
                f"{max_buckets} for at least one group; use a coarser "
                f"step_seconds"
            ),
        ).isNull(),
        F.col("__hi"),
    )
    grid = spans.select(
        *gcols,
        F.explode(F.sequence("__lo", guarded_hi)).alias("__bucket"),
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [*gcols, "__bucket"], "left")
        .withColumn("__filled", F.last("__v", ignorenulls=True).over(w))
        .select(
            *gcols,
            F.timestamp_micros(
                F.col("__bucket") * F.lit(step_us)
            ).alias("bucket_ts"),
            F.col("__filled").alias("v"),
        )
    )


def funnel(
    df: DataFrame,
    *,
    actor_col: str,
    ts_col: str,
    stage_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Ordered-funnel conversion counts in ONE aggregation pass.

    An actor reaches stage k when their earliest occurrence of each
    stage is strictly ordered: min(s₁) < min(s₂) < … < min(sₖ) — the
    standard "first touches happen in order" funnel, which needs only
    the per-stage min timestamps, not a per-stage self-join or an
    event-sequence scan.

    Returns one row per stage: (``stage_idx`` long, ``stage``,
    ``n_actors`` long), n_actors non-increasing down the funnel.
    """
    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("funnel needs at least two stages")
    mins = df.groupBy(actor_col).agg(
        *[
            F.min(
                F.when(F.col(stage_col) == s, F.col(ts_col))
            ).alias(f"__m{i}")
            for i, s in enumerate(stages)
        ]
    )
    reached = []
    cond = F.col("__m0").isNotNull()
    reached.append(cond)
    for i in range(1, len(stages)):
        cond = (
            cond
            & F.col(f"__m{i}").isNotNull()
            & (F.col(f"__m{i-1}") < F.col(f"__m{i}"))
        )
        reached.append(cond)
    counts = mins.agg(
        *[
            F.sum(c.cast("long")).alias(f"__n{i}")
            for i, c in enumerate(reached)
        ]
    )
    # Unpivot the single counts row into (stage_idx, stage, n_actors).
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"__n{i}").alias("n_actors"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return (
        counts.select(F.explode(pairs).alias("r"))
        .select("r.stage_idx", "r.stage", "r.n_actors")
    )


def retention_cohorts(
    df: DataFrame,
    *,
    actor_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: actors grouped by first-activity
    period, counted in each later period they return.

    ``offset`` is whole periods since the cohort period (0 = the
    cohort period itself), computed as day-difference / period-days —
    exact because both endpoints are period-truncated. Two aggregates
    (first activity per actor; distinct actor-periods) joined on the
    actor key; the output is tiny (periods²/2 rows).

    Returns (``cohort`` date, ``offset`` long, ``n_actors`` long).
    """
    days = {"week": 7, "day": 1}.get(period)
    if days is None:
        raise ValueError("period must be 'week' or 'day'")
    trunc = F.date_trunc(period, F.col(ts_col)).cast("date")
    firsts = df.groupBy(actor_col).agg(F.min(trunc).alias("__cohort"))
    actives = df.select(
        F.col(actor_col), trunc.alias("__active")
    ).distinct()
    return (
        actives.join(firsts, actor_col)
        .groupBy(
            F.col("__cohort").alias("cohort"),
            (
                F.datediff("__active", "__cohort") / F.lit(days)
            )
            .cast("long")
            .alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_actors"))
    )


def transition_counts(
    df: DataFrame,
    *,
    actor_col: str,
    ts_col: str,
    state_col: str,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """First-order state-transition (Markov bigram) counts: for each
    actor's time-ordered event sequence, count each consecutive
    (from_state → to_state) pair across the corpus.

    One window pass (``lag`` over the actor partition) + one count
    aggregate — the sequence-mining primitive behind next-action
    models and funnel diagnostics. Pass ``order_tiebreak`` columns
    (e.g. an event id) when timestamps can collide: a total order per
    actor makes the result deterministic.

    Returns (``from_state``, ``to_state``, ``n`` long).
    """
    w = Window.partitionBy(actor_col).orderBy(ts_col, *order_tiebreak)
    pairs = df.select(
        F.lag(F.col(state_col)).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).filter(F.col("from_state").isNotNull())
    return pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )


def islands(
    df: DataFrame,
    group_cols: Sequence[str],
    tick_col: str,
) -> DataFrame:
    """Gap-and-islands: collapse each group's set of integer ticks
    (days, hours, slots — caller's unit) into maximal runs of
    CONSECUTIVE ticks.

    The classic trick: over distinct ticks per group,
    ``tick - row_number()`` is constant exactly within a consecutive
    run, so one ordered window plus one aggregate yields every island
    — no self-join, no iteration. Returns one row per island:
    group cols, ``island_start``, ``island_end``, ``length_ticks``.

    Scale: both the window and the aggregate partition by the group
    key — fully parallel across groups; per-group work is a sort of
    that group's DISTINCT ticks (days-active, not events), orders of
    magnitude below event cardinality.
    """
    gcols = list(group_cols)
    return (
        df.select(*gcols, F.col(tick_col).cast("long").alias("__tick"))
        .distinct()
        .withColumn("__grp", F.col("__tick") - F.row_number().over(
            Window.partitionBy(*gcols).orderBy("__tick")
        ))
        .groupBy(*gcols, "__grp")
        .agg(
            F.min("__tick").alias("island_start"),
            F.max("__tick").alias("island_end"),
            F.count(F.lit(1)).alias("length_ticks"),
        )
        .drop("__grp")
    )


def longest_streaks(
    df: DataFrame,
    group_cols: Sequence[str],
    tick_col: str,
) -> DataFrame:
    """Per-group streak report from :func:`islands`: number of
    islands, total active ticks, and the LONGEST island (earliest
    start wins ties — deterministic). One extra per-group window over
    island rows (tiny: islands ≤ active ticks)."""
    gcols = list(group_cols)
    isl = islands(df, gcols, tick_col)
    w = Window.partitionBy(*gcols).orderBy(
        F.desc("length_ticks"), F.asc("island_start")
    )
    return (
        isl.withColumn("__rk", F.row_number().over(w))
        .groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("length_ticks").alias("n_active_ticks"),
            F.max(F.when(F.col("__rk") == 1, F.col("length_ticks"))).alias(
                "longest_len"
            ),
            F.max(F.when(F.col("__rk") == 1, F.col("island_start"))).alias(
                "longest_start"
            ),
        )
    )
