"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's full-row ``drop_duplicates``
(reference dags/limpiezaSpotify.py:101 — see
:mod:`workshoop2_etl_spark.operators.cleaning`), a 100 TB corpus
needs *content* dedup:

- :func:`exact_dedup` — hash-grouped exact content duplicates;
- :func:`minhash_signatures` / :func:`lsh_candidate_pairs` /
  :func:`verify_jaccard` / :func:`near_dedup_minhash` — MinHash +
  banded LSH near-duplicate detection (never all-pairs);
- :func:`simhash` — 63-bit SimHash fingerprints + hamming buckets;
- :func:`embedding_neardup` lives in
  :mod:`workshoop2_etl_spark.operators.similarity` (cosine path).

Scale design. Exact dedup shuffles a 64-bit hash, never the document
bytes. MinHash is one explode + one hash-aggregate (k mins computed
map-side); LSH banding turns the quadratic pair search into an
equi-join on (band, band-hash) buckets, and ``max_bucket_size``
guards against degenerate buckets going quadratic (skew guard — at
100 TB a boilerplate page can put millions of docs in one bucket).
Everything is JVM-side built-ins: no Python runs per row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    content_col: str,
    id_col: str,
    *,
    keep: str = "min",
) -> DataFrame:
    """Keep one row per distinct ``content_col`` value.

    Groups on ``xxhash64(content)`` — a 64-bit shuffle key instead of
    the full document bytes (at 100 TB the shuffle moves 8 bytes per
    doc, not kilobytes). The representative row is the ``min`` (or
    ``max``) ``id_col`` within the group — deterministic, unlike
    ``dropDuplicates`` which keeps an arbitrary row.
    """
    if keep not in ("min", "max"):
        raise ValueError(f"keep must be 'min' or 'max', got {keep!r}")
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    keep_ids = (
        df.groupBy(F.xxhash64(content_col).alias("__h"))
        .agg(agg.alias(id_col))
        .select(id_col)
    )
    return df.join(keep_ids, id_col, "left_semi")


def duplicate_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Per-content-group stats: representative id + group size.

    Output: ``keep_id`` (min id), ``n_dups`` (group size). Grouping is
    by content hash; collision probability for xxhash64 is ~n²/2⁶⁵
    (negligible below ~10⁹ distinct docs; at that point switch the
    hash to 128-bit ``md5``/``sha2``).
    """
    return (
        df.groupBy(F.xxhash64(content_col).alias("__h"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("keep_id", "n_dups")
    )


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n",
    normalize: bool = False,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Corpus-wide line-level deduplication (CCNet-style): split each
    document into units on ``sep``, keep exactly the FIRST occurrence
    of every distinct unit across the whole corpus (ordered by
    ``(id, position)``), and reassemble each document from its
    surviving units in original order.

    This is the pass that strips boilerplate — headers, footers,
    cookie banners, navigation chrome — that exact *document* dedup
    (:func:`exact_dedup`) cannot see because the surrounding text
    differs. Production corpora split on newlines; ``sep`` is a
    parameter because unit granularity is a policy choice (lines,
    sentences, or — as in the registered demo over the single-line
    testdata — words).

    ``normalize=True`` lowercases+trims the *match key* only; kept
    text stays verbatim. Empty units never match each other (blank
    lines survive everywhere — dropping every blank line after the
    first would glue unrelated paragraphs).

    Output: the input row plus ``out_col`` (deduplicated text, ''
    when nothing survived), ``n_units`` and ``n_kept`` counts.

    Scale: two shuffles, both on narrow rows — (1) the first-occurrence
    selection aggregates ``min(struct(id, pos, unit))`` per 64-bit unit
    hash (8-byte key, not the unit text): struct ordering compares
    ``(id, pos)`` lexicographically, so the min IS the first
    occurrence, the aggregate is partial-aggregable (map-side combine
    collapses every duplicate of a unit within a map partition before
    the shuffle — the more boilerplate, the FEWER bytes shuffled),
    and no per-key sort runs anywhere (the round-7 ``row_number``
    window formulation sorted each unit's (id, pos) list; a
    mega-duplicated boilerplate unit serialized on one task — VERDICT
    r7 item 2); (2) reassembly groups by ``id_col``. Hash-collision
    semantics are unchanged from the window formulation: two distinct
    units colliding on xxhash64 keep only the (id, pos)-min one.
    """
    import re as _re

    unit = F.posexplode(
        F.filter(F.split(F.col(text_col), _re.escape(sep)), lambda u: u != "")
    )
    exploded = df.select(F.col(id_col), unit.alias("__pos", "__unit"))
    key = F.lower(F.trim(F.col("__unit"))) if normalize else F.col("__unit")
    kept = (
        exploded.groupBy(F.xxhash64(key).alias("__k"))
        .agg(
            F.min(
                F.struct(F.col(id_col), F.col("__pos"), F.col("__unit"))
            ).alias("__m")
        )
        .select(
            F.col(f"__m.{id_col}").alias(id_col),
            F.col("__m.__pos").alias("__pos"),
            F.col("__m.__unit").alias("__unit"),
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__unit")))
                ),
                lambda s: s["__unit"],
            ),
            sep,
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_kept"),
    )
    n_units = F.size(
        F.filter(F.split(F.col(text_col), _re.escape(sep)), lambda u: u != "")
    )
    return (
        df.withColumn("n_units", n_units.cast("bigint"))
        .join(rebuilt, id_col, "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
        .withColumn("n_kept", F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint"))
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash
# ---------------------------------------------------------------------------

def tokens_expr(text_col: str) -> Column:
    """Lower-cased whitespace tokens, empties removed."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )


def shingles_expr(text_col: str, n: int = 3) -> Column:
    """Word ``n``-shingles as space-joined strings. Documents shorter
    than ``n`` tokens yield one shingle of all their tokens.

    NOTE: inlines the tokenization inside the transform lambda, so the
    regex split re-evaluates per shingle index — O(tokens²) per doc.
    Fine for ad-hoc use on short strings; the operators below use
    :func:`with_distinct_shingles` (two-step projection, split runs
    once per row)."""
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t != '')"
    return F.expr(
        f"transform(sequence(1, greatest(size({toks}) - {n} + 1, 1)),"
        f" i -> array_join(slice({toks}, i, {n}), ' '))"
    )


def with_distinct_shingles(
    df: DataFrame, text_col: str, n: int, out_col: str
) -> DataFrame:
    """Attach the distinct word-``n``-shingle set of ``text_col`` as
    ``out_col``. Two projection steps so the regex tokenization runs
    ONCE per row; the shingle transform then references the token
    array column (the single-expression form re-splits the text for
    every shingle index — measured 2× slower at sf0.1, and the gap
    grows quadratically with document length)."""
    tok_col = f"__{out_col}_toks"
    toks = df.withColumn(
        tok_col,
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""),
    )
    shingles = F.expr(
        f"transform(sequence(1, greatest(size({tok_col}) - {n} + 1, 1)),"
        f" i -> array_join(slice({tok_col}, i, {n}), ' '))"
    )
    return toks.withColumn(out_col, F.array_distinct(shingles)).drop(tok_col)


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, *, shingle_n: int = 3
) -> DataFrame:
    """Distinct word-``shingle_n``-gram set per document as
    ``(id_col, __set)`` — the shared input of signature generation
    AND candidate verification. Shingle construction is the measured
    bottleneck of the near-dedup path (6.2 s of 9.9 s at sf0.1), so
    the pipeline computes this frame ONCE and, when the caller
    manages a ``cache_registry``, persists it across both consumers.
    """
    return with_distinct_shingles(df, text_col, shingle_n, "__set").select(
        F.col(id_col), "__set"
    )


def minhash_signatures_from_sets(
    sets: DataFrame,
    id_col: str,
    *,
    set_col: str = "__set",
    num_hashes: int = 64,
    drop_empty: bool = True,
) -> DataFrame:
    """MinHash signatures from a precomputed shingle-set frame (see
    :func:`shingle_sets`), computed IN-ROW: the shingle strings are
    hashed once per row (``transform`` + ``xxhash64``), then each of
    the k salted minima is an ``array_min`` over the hashed array —
    **zero exchanges** (r14 opt, guide §2.4).

    The pre-r14 formulation exploded the sets and hash-aggregated k
    map-side mins — correct, but it shuffled (id, k·8 B partials) per
    doc and added an Exchange to every minhash pipeline (per
    micro-batch in the streaming near-dedup). The in-row version
    produces BIT-IDENTICAL signatures (same ``xxhash64(shingle)`` →
    ``xxhash64(h, salt)`` chain, min over the same distinct set;
    verified ``exceptAll`` both ways = 0 rows at sf0.1) and measured
    4.43 s → 3.71 s on the sf0.1 signature stage. Rows whose set is
    EMPTY or NULL are dropped, matching the explode formulation (no
    exploded rows → no group).

    ``drop_empty=False`` (r15 opt, guide §1.2/§4.4-shape): callers
    whose set frame PROVABLY contains no empty/NULL sets skip the
    filter. The predicate ``size(set) > 0`` looks free, but when
    ``set_col`` is a computed alias (the :func:`shingle_sets`
    composition), Catalyst's pushdown INLINES the whole shingle
    construction into the filter and pushes it below any upstream
    repartition — the full tokenize+shingle+distinct chain then runs
    TWICE per row, once of that on the scan's (often single)
    pre-repartition partition. Measured at sf0.1: a 3.3 s
    single-task stage in every minhash pipeline, just to evaluate a
    filter that :func:`shingle_sets` makes a tautology (docs shorter
    than ``n`` tokens yield ONE shingle, and a NULL text yields ONE
    NULL shingle — checked empirically over null/empty/whitespace
    fixtures: min size = 1, never null). Dropping the no-op filter
    changes no rows; ``exceptAll`` both ways = 0 on the registry
    corpus including planted null/empty texts.
    """
    src = sets.where(F.size(set_col) > 0) if drop_empty else sets
    hashed = src.select(
        id_col,
        F.transform(F.col(set_col), lambda s: F.xxhash64(s)).alias("__hs"),
    )
    # The k min columns are built as ONE SQL string parsed JVM-side
    # (r15 opt, guide §1.2 driver work): the previous per-column
    # Column/lambda construction cost ~11 ms of py4j round trips per
    # hash — 0.7-0.8 s of pure driver time per pipeline BUILD (per
    # micro-batch in the streaming fold), measured at sf0.1. The
    # parsed expression tree is identical (same xxhash64(h, i) chain,
    # same aliases); signatures verified exceptAll = 0 both ways.
    mins = [
        f"array_min(transform(__hs, h -> xxhash64(h, {int(i)}))) AS h{int(i)}"
        for i in range(num_hashes)
    ]
    return hashed.selectExpr(f"`{id_col}`", *mins)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: ``num_hashes`` columns
    ``h0..h{k-1}``, each the min over the document's distinct
    shingles of a distinct 64-bit hash function.

    The shingle string is hashed ONCE (``xxhash64``); the k functions
    re-hash that 8-byte value with a distinct salt — variable-length
    string hashing happens once per shingle instead of k times.
    (The classic affine ``a_i·h + b_i mod 2⁶⁴`` derivation is cheaper
    still but needs wrapping multiplication, which ANSI mode — Spark
    4's default — rejects at runtime.)

    ``drop_empty=False`` is sound here because :func:`shingle_sets`
    never yields an empty or NULL set (see
    :func:`minhash_signatures_from_sets` — the empty-set filter was
    a tautology whose pushed-down inlining re-ran the whole shingle
    construction below the scan/repartition).
    """
    return minhash_signatures_from_sets(
        shingle_sets(df, id_col, text_col, shingle_n=shingle_n),
        id_col,
        num_hashes=num_hashes,
        drop_empty=False,
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Banded-LSH candidate pairs from MinHash signatures.

    The signature is cut into ``bands`` bands of ``num_hashes/bands``
    rows; two docs are candidates iff at least one band hashes equal.
    Implemented as ONE bucket aggregate + in-row pair emission (r15,
    guide §2.4 — the same trick as ``basket.copurchase_pairs``): each
    (band, band_hash) bucket collects its member ids, and the sorted
    array emits its C(n, 2) oriented pairs with a higher-order
    transform. The previous self-equi-join form evaluated the banded
    subtree twice (no ReusedExchange across join sides) and paid a
    window sort for the bucket cap — 7 Exchanges vs 3, and the cost
    stays Σ bucket², never n². ``max_bucket_size`` becomes a free
    ``size()`` filter on the bucket array: degenerate buckets
    (boilerplate that would go quadratic) drop whole; docs there were
    already near-identical to *many* others and should be routed to
    exact dedup instead.

    Output: ``{id_col}_a < {id_col}_b`` distinct candidate pairs —
    row-identical to the self-join form (a doc appears once per band,
    so bucket member ids are distinct; checked ``exceptAll`` both
    ways at sf0.1).
    """
    banded = lsh_banded(
        signatures, id_col, num_hashes=num_hashes, bands=bands
    )
    buckets = banded.groupBy("band", "bh").agg(
        F.array_sort(F.collect_list(id_col)).alias("__ids")
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("__ids") <= max_bucket_size)
    pair_structs = F.expr(
        "flatten(transform(__ids, (x, i) ->"
        " transform(slice(__ids, i + 2, greatest(size(__ids) - i - 1, 0)),"
        " y -> struct(x AS a, y AS b))))"
    )
    return (
        buckets.filter(F.size("__ids") >= 2)
        .select(F.explode(pair_structs).alias("__p"))
        .select(
            F.col("__p.a").alias(f"{id_col}_a"),
            F.col("__p.b").alias(f"{id_col}_b"),
        )
        .distinct()
    )


def lsh_banded(
    signatures: DataFrame,
    id_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """The banded bucket-membership frame ``(id, band, bh)`` — the
    LSH index's storage unit: persist it (parquet, bucketed by
    ``(band, bh)`` at scale) and new document batches join against it
    WITHOUT recomputing base signatures (:func:`lsh_index_refresh`)."""
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b as band, xxhash64(slice({_array_sql(num_hashes)}, b * {r} + 1, {r}), b) as bh))"
            )
        ).alias("__b"),
    ).select(id_col, F.col("__b.band").alias("band"), F.col("__b.bh").alias("bh"))


def _cap_buckets(banded: DataFrame, max_bucket_size: int) -> DataFrame:
    """Drop rows of buckets larger than ``max_bucket_size`` (the
    boilerplate skew guard — see :func:`lsh_candidate_pairs`)."""
    w = Window.partitionBy("band", "bh")
    return (
        banded.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") <= max_bucket_size)
        .drop("__n")
    )


def lsh_index_refresh(
    banded_base: DataFrame,
    banded_delta: DataFrame,
    id_col: str,
    *,
    max_bucket_size: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental LSH index maintenance: absorb a delta batch into a
    persisted banded index and emit ONLY the candidate pairs the delta
    introduces — the production shape for continuous near-dedup, where
    re-signing and re-pairing the whole corpus per arriving batch
    would dominate the pipeline (signatures are computed for the
    delta alone; the base index is read back, never recomputed).

    Returns ``(banded_all, new_pairs)``:

    - ``banded_all`` — the refreshed index (base ∪ delta), the frame
      to persist for the next refresh;
    - ``new_pairs`` — distinct ``a < b`` candidate pairs with AT
      LEAST ONE delta member: the delta side probes the union index
      on the bucket key, so cost is Σ (delta-in-bucket · bucket), a
      delta-sized sliver of the full Σ bucket².

    EXACT maintenance identity (proven in tests/test_dedup_incr.py):
    with ``max_bucket_size=None``,

        pairs(base ∪ delta) = pairs(base) ∪ new_pairs.

    With a cap the refresh is CONSERVATIVE: bucket sizes are measured
    on the union, so a bucket that outgrew the cap mid-stream keeps
    the base pairs it emitted while under it (a full recompute would
    drop them). That asymmetry is inherent to capping an incremental
    emission — documented rather than hidden; over-cap buckets are
    boilerplate flags either way and belong in exact dedup.
    """
    banded_all = banded_base.unionByName(banded_delta)
    probe_all = banded_all
    probe_delta = banded_delta
    if max_bucket_size is not None:
        # measure on the union: the capped view both sides join
        probe_all = _cap_buckets(banded_all, max_bucket_size)
        probe_delta = probe_delta.join(
            probe_all.select("band", "bh").distinct(), ["band", "bh"]
        )
    d = probe_delta.select(F.col(id_col).alias("__idd"), "band", "bh")
    u = probe_all.select(F.col(id_col).alias("__idu"), "band", "bh")
    new_pairs = (
        d.join(u, ["band", "bh"])
        .filter(F.col("__idd") != F.col("__idu"))
        .select(
            F.least("__idd", "__idu").alias(f"{id_col}_a"),
            F.greatest("__idd", "__idu").alias(f"{id_col}_b"),
        )
        .distinct()
    )
    return banded_all, new_pairs


def _array_sql(num_hashes: int) -> str:
    return "array(" + ",".join(f"h{i}" for i in range(num_hashes)) + ")"


def verify_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    cache_registry: list | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs — the
    verification step after LSH (candidates only, never all-pairs).

    Shingle sets are computed only for documents that appear in a
    candidate pair (semi-join BEFORE the shingle projection): at
    100 TB the candidate set is a sliver of the corpus, and
    re-shingling everything to verify 0.1% of it would dominate the
    whole pipeline.

    Output: pair ids + ``jaccard`` in [0,1].
    """
    # The pair set feeds two consumers (the id semi-join filter and
    # the final join); without persist Spark re-executes the whole
    # candidate-generation subtree — signatures included — once per
    # reference. Candidates are small by construction (that is the
    # point of LSH), so caching them is cheap and saves a full
    # upstream recompute. The cache stays alive as long as the
    # returned (lazy) DataFrame does. Callers that materialize the
    # result and want the cache released pass ``cache_registry`` (a
    # list the cached frame is appended to; unpersist each entry once
    # downstream results are materialized — ``near_dedup_keep`` does
    # exactly that). Without it, long-lived sessions running many
    # dedup jobs should spark.catalog.clearCache() between jobs.
    ids_needed = lambda p: p.select(  # noqa: E731
        F.explode(F.array(f"{id_col}_a", f"{id_col}_b")).alias(id_col)
    ).distinct()
    pairs = pairs.persist()
    if cache_registry is not None:
        cache_registry.append(pairs)
    needed = df.join(ids_needed(pairs), id_col, "left_semi")
    sets = shingle_sets(needed, id_col, text_col, shingle_n=shingle_n)
    return verify_jaccard_from_sets(pairs, sets, id_col)


def verify_jaccard_from_sets(
    pairs: DataFrame,
    sets: DataFrame,
    id_col: str,
    *,
    set_col: str = "__set",
) -> DataFrame:
    """Exact Jaccard for candidate pairs against a precomputed
    shingle-set frame (:func:`shingle_sets`). ``pairs`` must already
    be persisted by the caller (both output sides consume it);
    ``sets`` covers at least every id in ``pairs`` — extra rows cost
    nothing, the pair join selects what it needs."""
    a = sets.select(
        F.col(id_col).alias(f"{id_col}_a"), F.col(set_col).alias("__sa")
    )
    b = sets.select(
        F.col(id_col).alias(f"{id_col}_b"), F.col(set_col).alias("__sb")
    )
    return (
        pairs.join(a, f"{id_col}_a")
        .join(b, f"{id_col}_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sa", "__sb"))
            / F.size(F.array_union("__sa", "__sb")),
        )
        .select(f"{id_col}_a", f"{id_col}_b", "jaccard")
    )


def near_dedup_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    cache_registry: list | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dedup: signatures → banded
    candidates → exact-Jaccard verify → pairs above ``threshold``.

    Shingle construction dominates this pipeline (6.2 s of 9.9 s at
    sf0.1), and both the signature and the verify stage need the
    shingle sets. With a ``cache_registry`` the set frame is computed
    ONCE, persisted (memory-and-disk; at 100 TB it spills — still
    cheaper than re-running the regex tokenize + shingle transform
    per consumer), shared by both stages, and released by the caller
    after materialization (``near_dedup_keep`` does exactly that).
    Without a registry nothing new is persisted: verification
    re-shingles only the candidate docs (semi-join first), the
    pre-round-4 behavior, so unmanaged callers accrete no caches."""
    if cache_registry is not None:
        shingled = shingle_sets(
            df, id_col, text_col, shingle_n=shingle_n
        ).persist()
        cache_registry.append(shingled)
        # drop_empty=False: shingle_sets never yields an empty/NULL
        # set (see minhash_signatures_from_sets), and here the filter
        # additionally blocked reading the signature input straight
        # from the persisted shingle cache.
        sigs = minhash_signatures_from_sets(
            shingled, id_col, num_hashes=num_hashes, drop_empty=False
        )
        cands = lsh_candidate_pairs(
            sigs, id_col, num_hashes=num_hashes, bands=bands
        )
        cands = cands.persist()
        cache_registry.append(cands)
        verified = verify_jaccard_from_sets(cands, shingled, id_col)
    else:
        sigs = minhash_signatures(
            df, id_col, text_col, num_hashes=num_hashes, shingle_n=shingle_n
        )
        cands = lsh_candidate_pairs(
            sigs, id_col, num_hashes=num_hashes, bands=bands
        )
        verified = verify_jaccard(
            cands, df, id_col, text_col, shingle_n=shingle_n
        )
    return verified.filter(F.col("jaccard") >= threshold)


def duplicate_clusters(
    pairs: DataFrame,
    id_col: str,
    *,
    max_iterations: int = 20,
    collect_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every doc in a
    duplicate cluster gets the cluster's min id as ``cluster_id``.

    Two code paths, picked by edge count (the broadcast-threshold
    pattern):

    - **≤ collect_threshold edges**: collect the (8-byte, 8-byte) pair
      list and run driver-side union-find. LSH pair sets are sparse by
      construction, so this is the overwhelmingly common case, and it
      avoids the per-round job-scheduling + codegen overhead that
      dominates an iterative DataFrame loop on small graphs.
    - **larger**: distributed min-label propagation — each round every
      node adopts the smallest label in its neighborhood (two hash
      joins + an aggregate per round, one scalar to the driver for
      the fixpoint test). Rounds ≈ graph diameter; at the scale where
      this path activates, per-round overhead is noise against data
      movement.

    Output: one row per doc id appearing in ``pairs``:
    (``{id_col}``, ``cluster_id``). Docs in no pair are absent (their
    cluster is themselves).
    """
    a, b = f"{id_col}_a", f"{id_col}_b"
    # Persist AND materialize the input first: both downstream paths
    # reference `pairs` more than once, and concurrent branch
    # execution inside one job would miss a lazy cache and re-run the
    # whole pair-generation pipeline per reference.
    pairs = pairs.persist()
    n_edges = pairs.count()

    if n_edges <= collect_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        # One driver fetch via toPandas — two int64 columns land as
        # numpy arrays (~16 bytes/edge; Arrow-batched when
        # spark.sql.execution.arrow.pyspark.enabled). The union-find
        # dict on top holds up to 2×threshold boxed-int entries
        # (~100 bytes each) — the real memory bound, and the reason
        # the default threshold is 1M edges (~a few hundred MB), not
        # more. (collect() of Row objects would pay that boxing cost
        # on the edge list itself as well.)
        edge_pdf = pairs.select(a, b).toPandas()
        for x, y in zip(edge_pdf[a].to_list(), edge_pdf[b].to_list()):
            parent.setdefault(x, x)
            parent.setdefault(y, y)
            rx, ry = find(x), find(y)
            if rx != ry:
                # union by min id so the representative is min(cluster)
                lo, hi = (rx, ry) if rx < ry else (ry, rx)
                parent[hi] = lo
        out_rows = [(x, find(x)) for x in parent]
        spark = pairs.sparkSession
        schema = pairs.select(F.col(a).alias(id_col)).schema
        id_type = schema[id_col].dataType.simpleString()
        pairs.unpersist()  # result is local — the cache is done
        return spark.createDataFrame(
            out_rows, f"{id_col} {id_type}, cluster_id {id_type}"
        )
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    labels.count()  # materialize edges+labels once, before the loop
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                F.col("label").alias("__old"),
            )
        ).persist()
        changed = new_labels.filter(F.col("label") != F.col("__old")).count()
        old = labels
        labels = new_labels.select("id", "label").persist()
        old.unpersist()
        if changed == 0:
            break
    else:
        # Silent non-convergence would split one duplicate cluster
        # into several "representatives" — fail loudly instead.
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iterations} "
            "rounds (graph diameter exceeds max_iterations); raise "
            "max_iterations or lower collect_threshold"
        )
    edges.unpersist()
    pairs.unpersist()
    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )


def near_dedup_keep(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end near-dedup corpus filter: MinHash-LSH pairs →
    connected components → keep each cluster's min-id representative.
    Returns the surviving rows of ``df`` (all columns).

    Cache hygiene: :func:`verify_jaccard`'s candidate cache is
    unpersisted here once :func:`duplicate_clusters` has materialized
    the cluster labels (driver path returns a local frame; the
    distributed path returns an already-persisted, already-counted
    label frame) — repeated dedup jobs in one session accrete no
    cached lineages from this entry point."""
    caches: list = []
    pairs = near_dedup_minhash(
        df, id_col, text_col, threshold=threshold,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        cache_registry=caches,
    )
    clusters = duplicate_clusters(pairs, id_col)
    for cached in caches:
        cached.unpersist()
    drop_ids = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    return df.join(drop_ids, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = 63,
) -> DataFrame:
    """Frequency-weighted SimHash fingerprint per document.

    Classic Charikar construction: each distinct token votes its
    occurrence count on every bit of its 64-bit hash (+cnt if set,
    −cnt if clear); the fingerprint takes the sign of each bit-sum.
    ``bits`` ≤ 63 keeps the fingerprint in a signed long.

    Near-duplicate docs differ in a few bits — pair search is
    :func:`simhash_neardup_pairs` (blocked-prefix self-join + exact
    popcount verify); the MinHash path is the engine's primary
    near-dedup.

    Plan shape: explode tokens → count per (doc, token) → one hash
    aggregate with ``bits`` conditional sums — two shuffles on the
    doc key, no Python.
    """
    tok_counts = (
        df.select(id_col, F.explode(tokens_expr(text_col)).alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__h", F.xxhash64("__t"))
    )
    # Both wide expression lists are built as SQL strings parsed
    # JVM-side in one call each (r15 opt, guide §1.2 driver work):
    # the per-Column py4j construction of 63 conditional sums plus
    # the 63-term fingerprint chain measured ~2.2 s of pure driver
    # time PER CALL at bits=63. Parsed trees are identical (same
    # shiftright/&/CASE/cast chain, left-associated sum, same
    # aliases); fingerprints verified exceptAll = 0 both ways.
    bit_sums = [
        f"sum(CASE WHEN (shiftright(__h, {int(i)}) & 1) = 1"
        f" THEN __cnt ELSE - __cnt END) AS b{int(i)}"
        for i in range(bits)
    ]
    summed = tok_counts.groupBy(id_col).agg(
        *(F.expr(s) for s in bit_sums)
    )
    fingerprint = " + ".join(
        f"CASE WHEN b{int(i)} > 0 THEN CAST({1 << int(i)} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END"
        for i in range(bits)
    )
    return summed.selectExpr(
        f"`{id_col}`", f"({fingerprint}) AS simhash"
    )


def simhash_neardup_pairs(
    fingerprints: DataFrame,
    id_col: str,
    *,
    fp_col: str = "simhash",
    max_hamming: int = 3,
    bits: int = 63,
    max_bucket_size: int | None = 1000,
    n_blocks: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs from SimHash fingerprints: hamming
    distance ≤ ``max_hamming``, exact.

    Combination-block search (Manku et al., WWW'07 "Detecting
    near-duplicates for web crawling" — public algorithm, the FULL
    table-of-permutations form): cut the fingerprint into
    ``n_blocks`` = m bit blocks (default ``max_hamming + 3``). A pair
    within hamming distance d ≤ ``max_hamming`` differs in at most d
    blocks, so it agrees EXACTLY on at least m−d blocks (pigeonhole)
    — hence on at least one specific (m−d)-subset. Candidates come
    from ONE self-equi-join on (subset id, packed values of that
    subset's blocks), enumerated over all C(m, d) subsets.

    Why not the minimal m = d+1 (one-block match keys): a 63-bit
    fingerprint in 4 blocks gives 16-bit keys, and random-collision
    candidates grow as n²/2¹⁶ — measured 96× growth across one 10×
    scale step on the synthetic corpus, a quadratic term that owns
    the shuffle at 100 TB. The default m = d+3 keys on 3 concatenated
    blocks (~``3·bits/m`` ≈ 31 bits for d=3), driving random
    collisions to ~n²/2³¹ at the price of C(m,d)/(d+1)× more explode
    rows (20 vs 4 at d=3) — linear cost traded for the quadratic one.
    The verify step is a single codegen'd ``bit_count(a ^ b)``
    popcount per candidate — no re-tokenization, unlike the MinHash
    verify.

    ``max_bucket_size`` drops degenerate buckets (the same skew guard
    as :func:`lsh_candidate_pairs`: at 100 TB one boilerplate block
    value must not go quadratic; docs it drops are candidates for
    exact dedup instead).

    Output: ``{id_col}_a < {id_col}_b``, ``hamming`` (bit distance).
    """
    from itertools import combinations

    m = n_blocks if n_blocks is not None else max_hamming + 3
    if m <= max_hamming:
        raise ValueError(
            f"n_blocks={m} must exceed max_hamming={max_hamming} "
            f"(pigeonhole needs at least one agreeing block)"
        )
    width = -(-bits // m)  # ceil: last block may be narrower
    mask = (1 << width) - 1
    fp = F.col(fp_col)
    # One probe key per (m - max_hamming)-subset of blocks: subset id
    # + the subset's block values packed into one long (widths stay
    # well under 63 bits for every supported geometry). The C(m, d)
    # packed structs are built as ONE SQL string parsed JVM-side
    # (r15 opt, guide §1.2 driver work): the per-Column construction
    # of 20 structs × per-block shift/mask/add chains measured
    # ~0.8 s of py4j round trips per call; the parsed tree is
    # identical (same shiftrightunsigned/&/shiftleft/+ chain, same
    # struct field names) — pairs verified exceptAll = 0 both ways.
    subsets = list(combinations(range(m), m - max_hamming))
    if (m - max_hamming) * width > 62:
        raise ValueError(
            f"packed key too wide: {(m - max_hamming)}x{width} bits; "
            f"raise n_blocks or lower bits"
        )
    block_sql = [
        f"(shiftrightunsigned(`{fp_col}`, {i * width})"
        f" & CAST({mask} AS BIGINT))"
        for i in range(m)
    ]
    probe_sql = ",".join(
        "struct({sid} AS blk, ({packed}) AS val)".format(
            sid=sid,
            packed=" + ".join(
                ["CAST(0 AS BIGINT)"]
                + [
                    f"shiftleft({block_sql[i]}, {j * width})"
                    for j, i in enumerate(subset)
                ]
            ),
        )
        for sid, subset in enumerate(subsets)
    )
    b = fingerprints.select(
        F.col(id_col),
        fp.alias("__fp"),
        F.explode(F.expr(f"array({probe_sql})")).alias("__b"),
    ).select(
        id_col, "__fp", F.col("__b.blk").alias("blk"), F.col("__b.val").alias("val")
    )
    # One aggregate per (blk, val) bucket + in-row pair emission
    # (r15, guide §2.4 — the lsh_candidate_pairs rewrite): the
    # self-equi-join form evaluated the fingerprint+probe subtree
    # once per join side and paid a window sort for the cap. A doc
    # appears once per blk, so bucket members have distinct ids;
    # array_sort on (id, fp) structs orders by id and the i<j
    # emission IS the old ``__ida < __idb`` filter. Pairs proven
    # row-identical (exceptAll = 0 both ways).
    buckets = b.groupBy("blk", "val").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(id_col).alias("i"), F.col("__fp").alias("f"))
            )
        ).alias("__m")
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("__m") <= max_bucket_size)
    pair_structs = F.expr(
        "flatten(transform(__m, (x, i) ->"
        " transform(slice(__m, i + 2, greatest(size(__m) - i - 1, 0)),"
        " y -> struct(x AS a, y AS b))))"
    )
    return (
        buckets.filter(F.size("__m") >= 2)
        .select(F.explode(pair_structs).alias("__p"))
        .select(
            F.col("__p.a.i").alias("__ida"),
            F.col("__p.a.f").alias("__fa"),
            F.col("__p.b.i").alias("__idb"),
            F.col("__p.b.f").alias("__fb"),
        )
        .dropDuplicates(["__ida", "__idb"])
        .withColumn(
            "hamming", F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("__ida").alias(f"{id_col}_a"),
            F.col("__idb").alias(f"{id_col}_b"),
            "hamming",
        )
    )


def bottomk_char_sketch(
    text_col: str, *, char_ngram: int = 24, k: int = 8
) -> Column:
    """Bottom-``k`` md5 hashes over character ``char_ngram``-shingles,
    as an array column — the deterministic (cross-engine reproducible)
    blocking sketch behind :func:`ngram_jaccard_neardup`. Long char
    shingles keep globally-common substrings ("es de la ") out of the
    sketch so buckets stay near-dup-selective; measured on the sf0.01
    documents table: 24-char shingles → 40 candidate pairs from 500
    docs with 25/25 true-pair recall, vs 38k candidates at 8 chars.
    """
    return F.expr(
        f"slice(array_sort(array_distinct("
        f"transform(sequence(1, greatest(length({text_col}) - {char_ngram} + 1, 1)),"
        f" i -> md5(substring({text_col}, i, {char_ngram}))))), 1, {k})"
    )


def ngram_jaccard_neardup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.3,
    char_ngram: int = 24,
    sketch_k: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int | None = 1000,
    cache_registry: list | None = None,
) -> DataFrame:
    """N-gram Jaccard near-duplicate pairs with **bottom-k sketch
    blocking** — the fully-deterministic sibling of
    :func:`near_dedup_minhash` (md5, not xxhash64, so every step has
    an exact DuckDB twin and the whole pipeline is oracle-checkable).

    Candidates = docs sharing ≥1 of their bottom-``sketch_k`` hashed
    char shingles (one explode + one self-equi-join on the hash —
    Σ bucket², never n²; ``max_bucket_size`` is the same boilerplate
    skew guard as the LSH path). Verification = exact word
    ``shingle_n``-gram Jaccard via :func:`verify_jaccard`, computed
    only for candidates.

    Output: ``{id_col}_a < {id_col}_b``, ``jaccard`` ≥ ``threshold``.
    """
    sketched = df.select(
        F.col(id_col),
        F.explode(
            bottomk_char_sketch(text_col, char_ngram=char_ngram, k=sketch_k)
        ).alias("__h"),
    )
    # One aggregate per sketch-hash bucket + in-row pair emission
    # (r15, guide §2.4 — the lsh_candidate_pairs rewrite; the sketch
    # is per-doc distinct, so bucket member ids are distinct and the
    # sorted i<j emission reproduces ``__ida < __idb`` exactly).
    buckets = sketched.groupBy("__h").agg(
        F.array_sort(F.collect_list(id_col)).alias("__ids")
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("__ids") <= max_bucket_size)
    pair_structs = F.expr(
        "flatten(transform(__ids, (x, i) ->"
        " transform(slice(__ids, i + 2, greatest(size(__ids) - i - 1, 0)),"
        " y -> struct(x AS a, y AS b))))"
    )
    pairs = (
        buckets.filter(F.size("__ids") >= 2)
        .select(F.explode(pair_structs).alias("__p"))
        .select(
            F.col("__p.a").alias(f"{id_col}_a"),
            F.col("__p.b").alias(f"{id_col}_b"),
        )
        .distinct()
    )
    verified = verify_jaccard(
        pairs, df, id_col, text_col, shingle_n=shingle_n,
        cache_registry=cache_registry,
    )
    return verified.filter(F.col("jaccard") >= threshold)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Version diff between two corpus snapshots: per id, classify
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` — the audit
    every dataset release needs ("what moved between v3 and v3.1?").

    Content equality is by md5 over the concatenated content columns
    (16-byte digests shuffle, never documents — same policy as the
    media payload dedup), id matching is one full outer join on the
    id. NULL-safe: a NULL content column hashes as the empty string,
    distinct from an absent row.

    Returns (id_col, status). Aggregate downstream for release notes;
    filter ``status != 'unchanged'`` for the changed-set export.
    """
    cols = content_cols or [c for c in old.columns if c != id_col]

    def digest(df: DataFrame):
        return F.md5(
            F.concat_ws(
                "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
            )
        )

    o = old.select(F.col(id_col), digest(old).alias("__ho"))
    n = new.select(F.col(id_col), digest(new).alias("__hn"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") == F.col("__hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def lsh_tuning(
    threshold: float, num_hashes: int
) -> tuple[int, int]:
    """Pick the banding (bands, rows) for :func:`lsh_candidate_pairs`
    from the target Jaccard ``threshold`` — the standard S-curve
    analysis (Mining of Massive Datasets §3.4): with b bands of r
    rows, P(candidate | similarity s) = 1 − (1 − sʳ)ᵇ, and the curve's
    inflection sits near (1/b)^(1/r). Among the divisor pairs of
    ``num_hashes``, minimize the total error integral

        ∫₀ᵗ P(s) ds  (false positives drawn below the threshold)
      + ∫ₜ¹ (1 − P(s)) ds  (false negatives missed above it)

    evaluated numerically. Low thresholds want many narrow bands
    (candidates easy), high thresholds want few wide bands. Returns
    ``(bands, rows)`` with ``bands·rows == num_hashes``.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    if num_hashes < 2:
        raise ValueError(f"num_hashes must be >= 2, got {num_hashes}")
    best = None
    for bands in range(1, num_hashes + 1):
        if num_hashes % bands:
            continue
        r = num_hashes // bands
        err = 0.0
        steps = 200
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s ** r) ** bands
            err += (p if s < threshold else 1.0 - p) / steps
        if best is None or err < best[0]:
            best = (err, bands, r)
    return best[1], best[2]


# ---------------------------------------------------------------------------
# Exact-substring dedup (duplicated passages, not whole documents)
# ---------------------------------------------------------------------------

def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 30,
    stride: int = 10,
) -> DataFrame:
    """Character spans of each document that repeat elsewhere in the
    corpus (Lee et al. 2022, *Deduplicating Training Data Makes
    Language Models Better* — the exact-substring variant, windowed).

    The reference corpus has no notion of sub-document dedup (its
    dedup is full-row ``drop_duplicates``,
    reference dags/limpiezaSpotify.py:101); this is the passage-level
    generalization a pretraining pipeline needs: boilerplate headers,
    licence blocks, and quoted passages duplicate *across* otherwise
    distinct documents.

    Algorithm: slide a ``window``-char window at ``stride`` over each
    text; a window occurring more than once corpus-wide is a
    duplicated window; the globally-first occurrence (min
    ``(id, offset)``) is kept, every other occurrence is marked; per
    document, overlapping/adjacent marked offsets merge into maximal
    ``[span_start, span_end)`` spans (gap-and-islands over a running
    max-end window).

    Scale: the explode emits ``chars/stride`` rows but projects to
    ``(id, offset, xxhash64)`` before any exchange — window *strings*
    never shuffle; the duplicate test groups 8-byte hashes with
    map-side combine; the island merge is a per-document window
    (partition-parallel). Hash equality stands in for string equality
    exactly as in :func:`exact_dedup` (64-bit collision odds are
    negligible and the oracle groups by the string itself).

    Alignment caveat: with ``stride > 1``, two copies of a passage
    only collide when they sit at offsets congruent mod ``stride``
    (strided sampling is phase-sensitive). ``stride=1`` restores full
    sensitivity at ``stride``× the row count; the alignment-robust
    sparse alternative is winnowing (Schleimer et al. 2003), which
    selects the min hash per sliding hash-window and guarantees any
    shared substring of length ≥ ``window + w − 1`` shares a
    fingerprint regardless of phase.

    Returns one row per span: ``(id_col, span_start, span_end)``,
    half-open char offsets into the original text.
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1, got {window}/{stride}")
    text = F.col(text_col)
    occ = (
        df.filter(F.length(text) >= window)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.lit(0), F.length(text) - window, F.lit(stride)
                )
            ).alias("__off"),
            text.alias("__t"),
        )
        .select(
            id_col,
            "__off",
            F.xxhash64(
                F.col("__t").substr(F.col("__off") + 1, F.lit(window))
            ).alias("__h"),
        )
    )
    firsts = (
        occ.groupBy("__h")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct(F.col(id_col), F.col("__off"))).alias("__first"),
        )
        .filter(F.col("__n") > 1)
        .select("__h", "__first")
    )
    dup_occ = (
        occ.join(firsts, "__h")
        .filter(
            ~(
                (F.col(id_col) == F.col("__first")[id_col])
                & (F.col("__off") == F.col("__first")["__off"])
            )
        )
        .select(id_col, "__off")
    )
    w = Window.partitionBy(id_col).orderBy("__off")
    prev_end = F.max(F.col("__off") + window).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup_occ.withColumn(
        "__isl",
        F.sum(
            F.when(prev_end.isNull() | (F.col("__off") > prev_end), 1)
            .otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy(id_col, "__isl").agg(
        F.min("__off").alias("span_start"),
        (F.max("__off") + window).alias("span_end"),
    ).select(id_col, "span_start", "span_end")


def remove_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    *,
    out_col: str = "cleaned_text",
) -> DataFrame:
    """Cut ``spans`` (as produced by :func:`duplicate_spans` —
    disjoint, half-open) out of each document, keeping the remaining
    segments in order.

    One aggregate packs each document's spans into a sorted array,
    one join attaches them to the text, and a higher-order
    ``F.aggregate`` fold builds the cleaned string JVM-side — the
    accumulator carries ``(pos, acc)`` and each span appends the kept
    gap ``[pos, span_start)`` then advances ``pos`` to ``span_end``;
    the finisher appends the tail. No Python per row, no explode of
    text segments, and documents without spans pass through the join
    as-is (left join, null spans → original text).
    """
    text = F.col(text_col)
    packed = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans")
    )
    joined = df.join(packed, id_col, "left")
    folded = F.aggregate(
        F.col("__spans"),
        F.struct(
            F.lit(0).cast("int").alias("pos"), F.lit("").alias("acc")
        ),
        lambda a, s: F.struct(
            s["span_end"].cast("int").alias("pos"),
            F.concat(
                a["acc"],
                text.substr(a["pos"] + 1, s["span_start"] - a["pos"]),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"], text.substr(a["pos"] + 1, F.length(text) - a["pos"])
        ),
    )
    return joined.withColumn(
        out_col,
        F.when(F.col("__spans").isNull(), text).otherwise(folded),
    ).drop("__spans")


# ---------------------------------------------------------------------------
# Winnowing (alignment-robust local fingerprints)
# ---------------------------------------------------------------------------

def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003, the MOSS algorithm): hash EVERY ``k``-gram, then from each
    sliding window of ``w`` consecutive gram hashes select the
    minimum (leftmost on ties — any deterministic tie-break keeps
    the guarantee; with a strong hash ties are negligible).

    The selection guarantee that strided sampling
    (:func:`duplicate_spans`) lacks: any substring shared between two
    documents of length ≥ ``w + k − 1`` contributes at least one
    *common* fingerprint, at ANY alignment — the shared region spans
    a full hash window, and both documents select the same minimum
    inside it. Density is ~2/(w+1) fingerprints per position.

    Hash choice: ``md5`` (hex string) rather than ``xxhash64`` so an
    external SQL engine reproduces the minima bit-for-bit (the same
    trade the :func:`~workshoop2_etl_spark.operators.textstats.fingerprint`
    sketch makes); both engines compare the same strings.

    Plan: ZERO exchanges. The gram-hash array, the sliding O(n·w)
    window minima, and the per-doc dedup (``array_distinct``) are all
    higher-order functions over in-row arrays — an earlier
    formulation exploded every gram through a per-doc window frame,
    which shuffled the ENTIRE character stream as 42-byte packed keys
    (the suite's largest exchange, ~138 MB at sf0.1; grows linearly
    with corpus bytes at 100 TB). In-row, nothing leaves the scan
    task until the caller aggregates the ~2n/(w+1) selected
    fingerprints. The trade: a document's gram-key array lives in one
    row (~42·n_chars bytes transient per task) — fine for documents;
    for book-length texts chunk first (:mod:`..operators.chunking`).
    Documents shorter than ``k`` chars yield no fingerprints;
    documents with fewer than ``w`` grams yield exactly one (the min
    over all their grams).

    Output: ``(id_col, off, gram_hash)`` — ``off`` is the selected
    gram's char offset.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k/w must be >= 1, got {k}/{w}")
    text = F.col(text_col)
    ng = F.length(text) - k + 1
    # (hash, off) packed into one orderable key: hex md5 is
    # fixed-width, so concatenating a zero-padded offset makes
    # lexicographic min == min of (hash, offset) — identical
    # semantics in any SQL engine, no struct-ordering quirks.
    gram_keys = F.transform(
        F.sequence(F.lit(0), ng - 1),
        lambda i: F.concat(
            F.md5(text.substr(i + 1, F.lit(k))),
            F.lpad(i.cast("string"), 10, "0"),
        ),
    )
    # __keys is aliased in its own projection so the md5 array is
    # computed ONCE per row — the sliding min references it w times
    # per position, and CollapseProject keeps multiply-referenced
    # non-trivial aliases in their own project instead of inlining.
    keys = F.col("__keys")
    # Full windows only (truncated trailing frames would add spurious
    # suffix minima); short docs keep their single all-gram window.
    mins = F.when(
        F.size(keys) < w, F.array(F.array_min(keys))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(keys) - w),
                lambda s: F.array_min(F.slice(keys, s + 1, w)),
            )
        )
    )
    return (
        df.filter(F.length(text) >= k)
        .select(F.col(id_col), gram_keys.alias("__keys"))
        .select(F.col(id_col), F.explode(mins).alias("__sel"))
        .select(
            id_col,
            F.substring("__sel", 33, 10).cast("long").alias("off"),
            F.substring("__sel", 1, 32).alias("gram_hash"),
        )
    )


def winnow_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_postings: int = 50,
) -> DataFrame:
    """Near-duplicate candidate pairs by shared winnowing
    fingerprints: docs sharing ≥ ``min_shared`` distinct selected
    grams, with the shared count as evidence weight.

    ``max_postings`` drops grams selected by more than that many
    documents — the stop-gram guard (the analog of LSH's
    ``max_bucket_size``): a boilerplate gram in 10⁶ documents would
    otherwise go quadratic. Dropped grams are common, so the pairs
    they would have contributed are overwhelmingly already connected
    by rarer shared grams.

    Shape (r15, guide §2.4 — the ``lsh_candidate_pairs`` rewrite):
    ONE aggregate per gram collects the posting list; the cap is a
    ``size()`` filter on it, and the sorted list emits its C(n, 2)
    oriented pairs in-row. The previous postings-count + self-join
    form evaluated the winnowing-fingerprint subtree THREE times
    (count, join side a, join side b — no ReusedExchange across
    differently-projected branches) and shuffled the postings twice.
    Pairs proven row-identical (``exceptAll`` = 0 both ways).

    Shuffle: postings are ``(gram_hash, id)`` pairs — 32 hex chars +
    an id, never text; the pair aggregation groups on (id_a, id_b).
    """
    fp = winnow_fingerprints(df, id_col, text_col, k=k, w=w).select(
        id_col, "gram_hash"
    ).distinct()
    postings = (
        fp.groupBy("gram_hash")
        .agg(F.array_sort(F.collect_list(id_col)).alias("__ids"))
        .filter(
            (F.size("__ids") <= max_postings) & (F.size("__ids") >= 2)
        )
    )
    pair_structs = F.expr(
        "flatten(transform(__ids, (x, i) ->"
        " transform(slice(__ids, i + 2, greatest(size(__ids) - i - 1, 0)),"
        " y -> struct(x AS a, y AS b))))"
    )
    return (
        postings.select(F.explode(pair_structs).alias("__p"))
        .groupBy(
            F.col("__p.a").alias("id_a"), F.col("__p.b").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Exact all-pairs set-similarity join (prefix filtering)
# ---------------------------------------------------------------------------

def allpairs_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    tau: float,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """EXACT all-pairs token-set similarity join: every document pair
    with Jaccard(tokens(a), tokens(b)) ≥ ``tau`` — the AllPairs /
    prefix-filtering algorithm (Bayardo, Ma & Srikant, WWW 2007;
    Chaudhuri et al. 2006), the exact complement to the sketch-based
    members of this family (MinHash-LSH recall < 1, SimHash Hamming
    proxy, bottom-k blocking).

    Prefix filtering: order every token set by GLOBAL document
    frequency ascending (rarest first, ties by token — the canonical
    order that makes prefixes maximally selective). J(x,y) ≥ τ forces
    overlap ≥ ⌈τ·|x|⌉ and ≥ ⌈τ·|y|⌉, so by pigeonhole the two
    (|s| − ⌈τ|s|⌉ + 1)-prefixes must share a token — the candidate
    equi-join on prefix tokens loses NO qualifying pair, and because
    prefixes hold each set's RAREST tokens, bucket sizes stay small
    by construction (``max_bucket_size`` optionally drops pathological
    buckets, trading exactness for a bound, same knob as
    ``fuzzy_join_blocked``).

    No global rank is materialized: each set sorts its own
    (frequency, token) structs in-row — frequencies arrive by one
    token-keyed join against the corpus document-frequency aggregate
    — so there is no single-partition window anywhere. Verification
    joins the two full sorted-token arrays back by id and computes
    |∩| / |∪| exactly (integer sizes; the final τ comparison divides
    two exact integers, bit-identical in any engine).

    Output: ``(id_a, id_b, n_inter, n_union, jaccard)``.
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    toks = (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col(text_col)), r"\s+"),
                        lambda t: t != "",
                    )
                )
            ).alias("__tok"),
        )
    )
    freq = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    ordered = (
        toks.join(freq, "__tok")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__df", "__tok"))
            ).alias("__s")
        )
        .select(
            id_col,
            F.transform(F.col("__s"), lambda s: s["__tok"]).alias("__toks"),
            F.size("__s").alias("__n"),
        )
    )
    # epsilon inside the ceil: float τ·n can overshoot an exact
    # integer product (0.2·5 → 1.0000000000000002 → ceil 2), which
    # would SHORTEN the prefix and break completeness exactly at the
    # J = τ boundary; the epsilon can only lengthen a prefix, never
    # drop a qualifying pair.
    prefix_len = F.col("__n") - F.ceil(
        F.lit(tau) * F.col("__n") - F.lit(1e-9)
    ).cast("int") + 1
    prefixes = ordered.select(
        id_col,
        F.explode(F.slice("__toks", 1, prefix_len)).alias("__tok"),
    )
    if max_bucket_size is not None:
        ok = (
            prefixes.groupBy("__tok")
            .agg(F.count(F.lit(1)).alias("__b"))
            .filter(F.col("__b") <= max_bucket_size)
            .select("__tok")
        )
        prefixes = prefixes.join(ok, "__tok")
    a = prefixes.select(F.col(id_col).alias("__ida"), "__tok")
    b = prefixes.select(F.col(id_col).alias("__idb"), "__tok")
    cand = (
        a.join(b, "__tok")
        .filter(F.col("__ida") < F.col("__idb"))
        .select("__ida", "__idb")
        .distinct()
    )
    ta = ordered.select(
        F.col(id_col).alias("__ida"),
        F.col("__toks").alias("__ta"),
        F.col("__n").alias("__na"),
    )
    tb = ordered.select(
        F.col(id_col).alias("__idb"),
        F.col("__toks").alias("__tb"),
        F.col("__n").alias("__nb"),
    )
    inter = F.size(F.array_intersect("__ta", "__tb"))
    return (
        cand.join(ta, "__ida")
        .join(tb, "__idb")
        .withColumn("n_inter", inter)
        .withColumn(
            "n_union", F.col("__na") + F.col("__nb") - F.col("n_inter")
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / F.col("n_union"),
        )
        .filter(F.col("jaccard") >= F.lit(tau))
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            "n_inter",
            "n_union",
            "jaccard",
        )
    )
