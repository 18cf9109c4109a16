"""Key-skew profiling: the measurement half of the engine's skew
story. ``merge.py`` routes hot keys through a salted branch and AQE
splits skewed partitions at runtime — but both need to know WHICH
keys are hot and HOW hot; this operator answers that with exact
numbers, scale-correctly.

Design for 100 TB:

- The only data-sized shuffle is the per-key count aggregate.
- Exact quantiles of the KEY-SIZE DISTRIBUTION come from the
  size-of-sizes histogram (``groupBy(count).count()``) — its row
  count is the number of DISTINCT group sizes, bounded and tiny next
  to the key count (hundreds at any corpus size we've measured), so
  the cumulative-rank walk runs on a deliberately small frame. No
  global sort of per-key counts, no ``collect()`` of key counts.
- The quantile rule is spelled out (smallest size with cumulative
  key-rank ≥ ``ceil(q·n_keys)``) so the DuckDB oracle replays it
  verbatim — no reliance on engine percentile builtins, whose
  interpolation conventions differ.
- ``recommended_salt = ceil(max_key_rows / avg_key_rows)`` — the
  split factor that brings the hottest group down to an average-sized
  task — in exact integer arithmetic
  (``(max·n_keys + total − 1) div total``); 1 means "don't salt".

Reference parity: the reference engine (eager pandas, SURVEY.md §2)
never needs this — every join fits one process. This is 100 TB
extension surface, the diagnostic producing the ``hot_keys`` argument
``full_outer_with_indicator`` consumes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_counts(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Per-key row counts — the data-sized aggregate every profile
    question reduces to."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def heavy_keys(
    df: DataFrame, keys: Sequence[str], *, top_n: int = 10
) -> DataFrame:
    """The ``top_n`` heaviest keys (count desc, then keys asc — a
    total order, so ties are deterministic), via
    TakeOrderedAndProject: no global sort materializes."""
    counts = key_counts(df, keys)
    return counts.orderBy(
        F.desc("cnt"), *[F.asc(k) for k in keys]
    ).limit(top_n)


def skew_profile(
    df: DataFrame,
    keys: Sequence[str],
    *,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """ONE summary row describing how skewed ``keys`` is:

    ``total_rows, n_keys, max_key_rows``, one ``p*_key_rows`` column
    per requested quantile (exact, rank-based: the smallest group
    size such that at least ``ceil(q·n_keys)`` keys are that size or
    smaller), ``avg_key_rows`` (the double division of two exact
    longs — bit-identical across engines), ``skew_ratio``
    (``max / (total/n)``, same parenthesization in the oracle) and
    integer ``recommended_salt``.
    """
    counts = key_counts(df, keys)
    # size-of-sizes histogram: tiny by construction (distinct sizes;
    # see module docstring) — the single-partition window is safe here
    hist = counts.groupBy(F.col("cnt").alias("size")).agg(
        F.count(F.lit(1)).alias("n_at_size")
    )
    w = Window.orderBy("size").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = hist.withColumn("cum_keys", F.sum("n_at_size").over(w))

    scalars = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_key_rows"),
    )
    out = scalars.crossJoin(
        F.broadcast(
            ranked.agg(
                F.sort_array(
                    F.collect_list(F.struct("size", "cum_keys"))
                ).alias("__h")
            )
        )
    )
    def _at_least(rank):
        # one-arg lambda built per quantile: a default-argument capture
        # (lambda s, r=rank) would make pyspark's HOF introspection
        # read TWO parameters and bind r to the (element, index) form
        return lambda s: s["cum_keys"] >= rank

    qcols = []
    for q in quantiles:
        num, den = int(round(q * 10000)), 10000
        rank = F.expr(f"(n_keys * {num} + {den - 1}) div {den}")
        name = f"p{int(round(q * 100))}_key_rows"
        qcols.append(
            F.array_min(
                F.filter("__h", _at_least(rank)).getField("size")
            ).alias(name)
        )
    avg = F.col("total_rows") / F.col("n_keys")
    return out.select(
        "total_rows",
        "n_keys",
        "max_key_rows",
        *qcols,
        avg.alias("avg_key_rows"),
        (F.col("max_key_rows") / avg).alias("skew_ratio"),
        F.expr(
            "(max_key_rows * n_keys + total_rows - 1) div total_rows"
        ).alias("recommended_salt"),
    )


def auto_salt_plan(
    df: DataFrame,
    keys: Sequence[str],
    *,
    skew_threshold: float = 4.0,
    top_n: int = 10,
    max_salt: int = 32,
    normalize_keys: bool = False,
) -> dict:
    """Measure-then-decide: close the loop between the skew
    diagnostics above and ``merge.full_outer_with_indicator``'s
    salted hot-key branch (round-8 VERDICT task 4 — the two halves
    existed but nothing composed them).

    Returns ``{"salt", "hot_keys", "profile"}``:

    - ``salt`` — ``min(recommended_salt, max_salt)`` when
      ``skew_ratio ≥ skew_threshold``, else 1 (don't salt).
    - ``hot_keys`` — the ``top_n`` heaviest key tuples whose count is
      ≥ ``skew_threshold × avg_key_rows`` (keys merely at the top of
      a flat distribution are NOT hot).
    - ``profile`` — the full one-row :func:`skew_profile` dict, for
      logging/audit.

    Driver-side cost is bounded by construction: ONE collected
    profile row plus at most ``top_n`` heavy-key rows — never a
    key-sized collect, so the decision path itself scales.

    ``normalize_keys`` (r9 VERDICT item 3): when the downstream join
    normalizes its keys (trim/lower/``fillna("")`` — the reference's
    J1/P7 semantics, which COLLAPSE every null/blank key onto the
    empty string, manufacturing a hot key), the profile must measure
    the NORMALIZED distribution: skew that exists only
    post-normalization is invisible to a raw-key profile, and hot-key
    tuples profiled raw would fail to match the normalized rows the
    salted branch filters on. Pass the same flag the join gets.
    """
    if normalize_keys:
        from workshoop2_etl_spark.functions.text import (
            normalize_join_keys,
        )

        df = normalize_join_keys(df, list(keys))
    prof = skew_profile(df, keys).collect()[0].asDict()
    # an empty frame profiles to all-NULL scalars (n_keys = 0):
    # nothing to salt
    if not prof["n_keys"] or prof["recommended_salt"] is None:
        return {"salt": 1, "hot_keys": [], "profile": prof}
    salt = int(prof["recommended_salt"])
    if prof["skew_ratio"] < skew_threshold or salt <= 1:
        return {"salt": 1, "hot_keys": [], "profile": prof}
    cutoff = prof["avg_key_rows"] * skew_threshold
    hot = [
        tuple(r[k] for k in keys)
        for r in heavy_keys(df, keys, top_n=top_n).collect()
        if r["cnt"] >= cutoff
    ]
    return {"salt": min(salt, max_salt), "hot_keys": hot, "profile": prof}


def auto_salted_full_outer(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    indicator_col: str = "_merge",
    normalize_keys: bool = True,
    skew_threshold: float = 4.0,
    top_n: int = 10,
    max_salt: int = 32,
    decision: dict | None = None,
) -> DataFrame:
    """Full outer join with indicator that salts ITSELF: profiles the
    left side's key distribution, and when the measured skew clears
    ``skew_threshold`` routes the measured hot keys through the
    salted branch with the measured split factor. Result rows are
    identical with or without salting (the decomposition identity
    ``full outer ≡ salted inner ∪ left-anti ∪ right-anti`` proven in
    tests/test_skew.py and tests/test_merge.py) — only the physical
    task layout changes, which is the point: at 100 TB a Zipf head
    key turns one reduce task into the job's critical path unless its
    group is split.

    ``decision`` lets a caller reuse a precomputed
    :func:`auto_salt_plan` (e.g. to assert WHICH branch fired).
    """
    from workshoop2_etl_spark.operators.merge import (
        full_outer_with_indicator,
    )

    if decision is None:
        # Profile the SAME key space the join will use: with
        # normalize_keys the join collapses null/blank keys onto ""
        # (the reference's J1/P7 empty-string quirk) — a hot key the
        # raw distribution cannot see (r9 VERDICT item 3).
        decision = auto_salt_plan(
            left,
            on,
            skew_threshold=skew_threshold,
            top_n=top_n,
            max_salt=max_salt,
            normalize_keys=normalize_keys,
        )
    return full_outer_with_indicator(
        left,
        right,
        on,
        indicator_col=indicator_col,
        normalize_keys=normalize_keys,
        hot_keys=decision["hot_keys"] or None,
        hot_salt=max(decision["salt"], 1),
    )
