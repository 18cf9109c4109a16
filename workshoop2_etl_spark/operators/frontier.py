"""Crawl-frontier politeness scheduling — the LAST step of the crawl
chapter's front end (robots admits a URL, the sitemap discovered it,
URL dedup canonicalized it; now WHEN may we fetch it?): a polite
crawler fetches at most a handful of URLs per origin per scheduling
wave, so the frontier must be PARTITIONED BY DOMAIN and STRIPED into
waves — pure relational work, and exactly the kind of thing that
becomes a driver-side for-loop in naive crawlers.

Design for 100 TB frontiers:

- ONE window per assignment: ``row_number`` over
  ``(domain, priority desc, url)`` gives each URL a deterministic
  per-domain fetch rank; ``wave = (rank-1) div per_domain`` stripes
  them so wave *w* contains at most ``per_domain`` URLs from any
  origin. A scheduler drains wave 0, then wave 1, … — per-origin
  politeness holds no matter how many executors fetch concurrently,
  because the cap is IN THE DATA, not in coordination.
- The shuffle is hash-partitioned by domain — the frontier's natural
  key — and the per-domain window state is one counter; hot domains
  (a crawl's Zipf head) cost seconds of window time, not stragglers,
  because the window never materializes per-domain lists.
- Deterministic: ties break on the URL string, so the same frontier
  always yields the same waves — resumable scheduling without state.

Reference has no crawl surface; §2.9 extension (X194).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def delay_to_cap(
    delay_sec: Column,
    *,
    wave_interval_sec: float = 30.0,
    default_cap: int = 4,
) -> Column:
    """Turn a robots ``Crawl-delay`` (seconds between fetches the
    site asks for) into a per-domain WAVE CAP: if the scheduler
    drains one wave every ``wave_interval_sec``, a domain asking for
    ``d`` seconds between fetches can politely serve
    ``floor(interval / d)`` fetches per wave (never below 1 — a huge
    delay still progresses, one URL per wave). NULL delay (site
    didn't ask) keeps ``default_cap`` — the caller's guess, exactly
    yesterday's behavior."""
    if default_cap < 1:
        raise ValueError(f"default_cap must be >= 1, got {default_cap}")
    cap = F.greatest(
        F.floor(F.lit(float(wave_interval_sec)) / delay_sec).cast("long"),
        F.lit(1).cast("long"),
    )
    return F.when(
        delay_sec.isNotNull() & (delay_sec > 0), cap
    ).otherwise(F.lit(default_cap).cast("long"))


def frontier_waves(
    urls: DataFrame,
    *,
    domain_col: str,
    url_col: str,
    per_domain: int = 4,
    priority_col: str | None = None,
    per_domain_col: str | None = None,
) -> DataFrame:
    """Assign each frontier URL a per-domain ``fetch_rank`` (1-based,
    highest ``priority_col`` first, URL-string tiebreak) and a
    ``wave`` number such that no wave holds more than ``per_domain``
    URLs of one domain. Input columns pass through.

    ``per_domain_col`` (round 11) names a per-ROW cap column — e.g.
    :func:`delay_to_cap` over the domain's robots ``Crawl-delay``,
    joined onto the frontier — overriding the scalar ``per_domain``
    where non-NULL: the politeness data the crawl already fetched
    drives the schedule instead of a caller guess. Same single
    window; the divisor just varies per domain."""
    if per_domain < 1:
        raise ValueError(f"per_domain must be >= 1, got {per_domain}")
    order: list[Column] = []
    if priority_col is not None:
        order.append(F.col(priority_col).desc_nulls_last())
    order.append(F.col(url_col).asc())
    w = Window.partitionBy(domain_col).orderBy(*order)
    ranked = urls.withColumn("fetch_rank", F.row_number().over(w))
    cap: Column = F.lit(per_domain).cast("long")
    if per_domain_col is not None:
        cap = F.coalesce(
            F.greatest(F.col(per_domain_col).cast("long"), F.lit(1)), cap
        )
    return ranked.withColumn(
        "wave",
        ((F.col("fetch_rank") - 1) / cap).cast("long"),
    )


def recrawl_candidates(
    discovered: DataFrame,
    state: DataFrame,
    *,
    url_col: str,
    lastmod_col: str,
    state_url_col: str,
    crawled_col: str,
) -> DataFrame:
    """Freshness-driven incremental recrawl selection — the edge
    between sitemap discovery (X193: ``lastmod`` per listed URL) and
    the crawl store (X138/X199: what we fetched, when): a discovered
    URL needs fetching when it is NEW (no row in ``state``) or STALE
    (its published ``lastmod`` postdates our last crawl). Emits the
    discovered rows plus ``last_crawled`` and ``recrawl_reason``
    (``new`` / ``stale`` / ``fresh``); callers filter
    ``!= 'fresh'`` and hand the rest to :func:`frontier_waves`.

    Scale shape: ONE hash join on the canonical URL key — the
    incremental-crawl planner is a join, not a per-URL loop; at
    CommonCrawl scale both sides shuffle on the same key the frontier
    window uses next, so AQE can reuse the exchange. Unparseable
    lastmod values compare NULL → never falsely stale (a site that
    publishes garbage dates doesn't trigger a full recrawl)."""
    st = state.select(
        F.col(state_url_col).alias(url_col),
        F.col(crawled_col).cast("date").alias("last_crawled"),
    )
    joined = discovered.join(st, url_col, "left")
    reason = (
        F.when(F.col("last_crawled").isNull(), F.lit("new"))
        .when(
            F.try_to_timestamp(F.col(lastmod_col)).cast("date")
            > F.col("last_crawled"),
            F.lit("stale"),
        )
        .otherwise(F.lit("fresh"))
    )
    return joined.withColumn("recrawl_reason", reason)
