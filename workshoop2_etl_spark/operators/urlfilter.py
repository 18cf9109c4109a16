"""URL blocklist filtering — the curation stage every public
LLM-corpus pipeline runs before content ever downloads (RefinedWeb,
FineWeb, CCNet all filter against category blocklists shaped like the
public UT1/Shallalist sets): a list of (entry, kind, category) rows
where ``kind='domain'`` blocks a host and its whole subdomain
subtree, and ``kind='url'`` blocks a URL prefix on one host.

Semantics (the UT1 matching rules, stated closed-form so the oracle
can mirror them):

- **domain entry** ``example.com`` blocks ``example.com`` AND every
  ``*.example.com`` host (subtree match — the lists name registrable
  domains or specific hosts and expect subdomain coverage).
- **url entry** ``http://example.com/casino`` blocks exactly that
  canonical URL plus everything under it as a PATH/QUERY boundary
  (``…/casino/x``, ``…/casino?q=``) — never mid-token
  (``…/casino-royale`` stays clean).
- A URL matching several entries reports the lexicographically
  smallest category (deterministic, order-independent).

Scale shape (the part a naive implementation gets wrong):

- **No regex scan, no cross join.** Domain subtree matching is an
  EQUI-join: each URL's host explodes into its suffix chain
  (``www.ads.example.com`` → itself, ``ads.example.com``,
  ``example.com``, ``com`` — ≤ label-count rows, ids only) and joins
  ``suffix = entry``. URL-prefix matching equi-joins on the entry's
  HOST first, then checks the boundary-aware ``startswith`` inside
  the joined pairs — each URL meets only its own host's entries,
  never the whole list.
- **Size-gated broadcast.** Public blocklists are MB-scale (UT1 ~3M
  entries) — usually broadcastable; the gate asks Catalyst's own
  size estimate against ``autoBroadcastJoinThreshold`` (same policy
  as ``operators/robots.py robots_filter``) and falls back to a
  plain shuffle equi-join when the list is too big or the estimate
  unknown, so a 10⁸-entry list cannot OOM the driver.
- Matches aggregate per NORMALIZED URL and join back — the wide
  document columns never ride through the match join.

The reference has no crawl surface; SURVEY §2.9 X206.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from workshoop2_etl_spark.functions.urls import host_of, normalize_url
from workshoop2_etl_spark.operators.robots import should_broadcast


def host_suffix_chain(host: Column) -> Column:
    """``array<string>`` of every label-boundary suffix of a host:
    ``www.ads.example.com`` → [``www.ads.example.com``,
    ``ads.example.com``, ``example.com``, ``com``]. Pure columns —
    the explode side of the domain-subtree equi-join."""
    labels = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(
            F.slice(labels, i, F.size(labels) - i + 1), "."
        ),
    )


def blocklist_filter(
    urls: DataFrame,
    blocklist: DataFrame,
    *,
    url_col: str,
    entry_col: str = "entry",
    kind_col: str = "kind",
    category_col: str = "category",
    keep_blocked: bool = False,
    broadcast: bool | None = None,
) -> DataFrame:
    """Match every URL row against a category blocklist. Returns the
    input rows plus ``block_category`` (NULL = clean; the smallest
    matching category otherwise), filtered to clean rows unless
    ``keep_blocked``.

    ``blocklist`` rows: ``entry_col`` a host/domain (for
    ``kind_col='domain'``) or a URL prefix (``kind_col='url'``),
    ``category_col`` the list's category label. Entries are
    normalized on the way in (lowercased hosts; canonical URL form
    for prefixes), so raw list files load as-is.

    Exception entries (``kind_col='allow_domain'`` /
    ``'allow_url'``, the UT1 "white"-list shape) match by the SAME
    domain-subtree / prefix rules and CLEAR every block on the URLs
    they hit — the false-positive escape hatch for shared hosts
    (``sites.google.com/goodsite`` under a blocked platform
    domain)."""
    if broadcast is None:
        broadcast = should_broadcast(blocklist)

    def _maybe_b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast else df

    u = F.col(url_col)
    work = urls.withColumn("__norm", normalize_url(u))
    keyed = work.select(
        F.col("__norm"), host_of(F.col("__norm")).alias("__host")
    ).dropDuplicates(["__norm"])

    # ONE probe pass over the URL set covers blocks AND exceptions:
    # both entry classes ride the same two equi-joins (domain
    # subtree, URL prefix) with an __allow flag, and the per-URL
    # aggregate resolves them — min blocking category, cleared when
    # any exception hit. A separate pass for the allow kinds would
    # re-scan the deduped URL set even for the common all-block list.
    is_allow = F.col(kind_col).startswith("allow")
    dom_entries = blocklist.where(
        F.col(kind_col).isin("domain", "allow_domain")
    ).select(
        F.lower(F.trim(F.col(entry_col))).alias("__sfx"),
        F.col(category_col).alias("__cat"),
        is_allow.alias("__allow"),
    )
    dmatch = (
        keyed.select(
            "__norm",
            F.explode(host_suffix_chain(F.col("__host"))).alias("__sfx"),
        )
        .join(_maybe_b(dom_entries), "__sfx")
        .select("__norm", "__cat", "__allow")
    )
    # UT1 url lists are scheme-less ("host/path") — default the
    # scheme so host extraction and the canonical compare work
    raw = F.trim(F.col(entry_col))
    entry_url = F.when(raw.contains("://"), raw).otherwise(
        F.concat(F.lit("http://"), raw)
    )
    url_entries = blocklist.where(
        F.col(kind_col).isin("url", "allow_url")
    ).select(
        normalize_url(entry_url).alias("__pfx"),
        host_of(entry_url).alias("__host"),
        F.col(category_col).alias("__cat"),
        is_allow.alias("__allow"),
    )
    pfx = F.col("__pfx")
    umatch = (
        keyed.join(_maybe_b(url_entries), "__host")
        .where(
            (F.col("__norm") == pfx)
            | F.col("__norm").startswith(F.concat(pfx, F.lit("/")))
            | F.col("__norm").startswith(F.concat(pfx, F.lit("?")))
        )
        .select("__norm", "__cat", "__allow")
    )
    matches = (
        dmatch.unionByName(umatch)
        .groupBy("__norm")
        .agg(
            F.min(F.when(~F.col("__allow"), F.col("__cat"))).alias(
                "block_category"
            ),
            F.max(F.col("__allow").cast("int")).alias("__has_allow"),
        )
        .where(
            F.col("block_category").isNotNull()
            & (F.col("__has_allow") == 0)
        )
        .drop("__has_allow")
    )
    # matches scales with the number of BLOCKED URLs, not the list —
    # no forced broadcast here; AQE sizes the join at runtime
    out = work.join(matches, "__norm", "left").drop("__norm")
    if keep_blocked:
        return out
    return out.where(F.col("block_category").isNull()).drop(
        "block_category"
    )
