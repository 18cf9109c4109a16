"""Model-based corpus curation: DSIR importance resampling and
hashed-feature linear classifier inference.

Two standard steps of an LLM pre-training data pipeline that sit
between the rule batteries (:mod:`.quality`) and the LM scorer
(:mod:`.textstats`):

- **DSIR** (Data Selection via Importance Resampling, Xie et al.
  2023, arXiv:2302.03169): score every pool document by how much more
  likely its hashed n-gram profile is under a small TARGET corpus
  than under the raw pool, then resample with Gumbel top-k. This is
  the published, principled version of "pick web pages that look
  like Wikipedia".
- **Linear classifier inference** (the fastText-style quality filter
  of CCNet / LLaMA data prep): apply a trained linear model over
  hashed bag-of-n-gram features as a pure column computation — the
  weights arrive as a (bucket, weight) table and broadcast; no
  per-row Python, no model server.

Cross-engine determinism (the repo's integer-micro recipe): every
per-document accumulation is a sum of 64-bit integers — bucket-level
log-ratios and Gumbel perturbations are fixed to integer micro-units
(``floor(x·10⁶ + ½)``) BEFORE any per-document aggregation, so the
scores compare bit-equal across engines regardless of summation
order. The only float ops are one ``ln`` per distinct bucket and one
``ln(ln)`` per document, each immediately quantized; libm ulp
variance would have to land within 5·10⁻⁷ of a micro-unit boundary
to flip a result.

Scale shape: one explode of feature occurrences; bucket tables are
bounded by ``n_buckets`` (broadcast); the only data-sized shuffles
are the bucket-count partial aggregate and the per-document sum —
both carry (int, int) pairs, never text. Top-k selection is
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hashed_ngram_buckets",
    "hashed_char_ngram_buckets",
    "dsir_logweights",
    "dsir_resample",
    "linear_text_classifier",
    "train_text_classifier",
    "train_language_classifier",
    "language_classify",
    "per_domain_cap",
]

#: 2^32 as a double — divisor that turns 32 md5 bits into a uniform.
_TWO32 = 4294967296.0


def _tokens(text_col: str) -> Column:
    """Whitespace tokens of the lowercased text — the repo-wide
    convention (`textstats.py`), reproduced in DuckDB as
    ``list_filter(string_split_regex(lower(text),'\\s+'), t->t!='')``."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )


def hashed_ngram_buckets(
    text_col: str, *, n_buckets: int = 512, bigrams: bool = True
) -> Column:
    """Array of hashed feature buckets, one entry PER OCCURRENCE
    (unigrams + adjacent bigrams — the DSIR paper's feature space),
    bucket = first 32 md5 bits mod ``n_buckets``.

    md5, not xxhash64/murmur: any SQL engine reproduces
    ``CAST(concat('0x', substr(md5(g),1,8)) AS BIGINT) % n_buckets``
    bit-for-bit (same trade as :func:`..operators.sampling.hash_bucket`).
    """
    toks = _tokens(text_col)
    tail = F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    head = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    feats = F.concat(
        toks,
        F.zip_with(tail, head, lambda a, b: F.concat(a, F.lit(" "), b))
        if bigrams
        else F.array(),
    )
    return F.transform(
        feats,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % n_buckets,
    )


def _micro(x: Column) -> Column:
    """Quantize to integer micro-units with half-up — floor(x·10⁶+½)
    on BOTH engines, never the engines' round() builtins (they
    disagree at half-boundaries)."""
    return F.floor(x * 1e6 + F.lit(0.5)).cast("long")


def dsir_logweights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    *,
    n_buckets: int = 512,
    bigrams: bool = True,
) -> DataFrame:
    """Per-document DSIR log importance weight, in integer micro-log
    units: ``logw_micro = Σ_occurrences floor(10⁶·ln λ(b) + ½)`` where
    ``λ(b) = p_target(b) / p_raw(b)`` over add-one-smoothed hashed
    n-gram distributions (target = rows where ``is_target``; raw =
    the whole pool).

    The bucket ratio table is ``n_buckets`` rows — broadcast back
    onto the exploded occurrences; quantizing ln λ per BUCKET before
    the per-document sum makes the weights integer-exact and
    summation-order-free (see module docstring). Documents with no
    features get weight 0 (λ over an empty product).

    Returns ``(id_col, logw_micro, n_feats)``.
    """
    feats = df.select(
        F.col(id_col),
        is_target.alias("__t"),
        F.explode_outer(
            hashed_ngram_buckets(
                text_col, n_buckets=n_buckets, bigrams=bigrams
            )
        ).alias("__b"),
    )
    counts = feats.filter(F.col("__b").isNotNull()).groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cr"),
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("__ct"),
    )
    tot = counts.agg(
        F.sum("__cr").alias("__nr"), F.sum("__ct").alias("__nt")
    )
    d = float(n_buckets)
    # identical operation order in the oracle:
    #   ((ct+1)/(nt+D)) / ((cr+1)/(nr+D))
    lam = (
        (F.col("__ct") + F.lit(1.0)) / (F.col("__nt") + F.lit(d))
    ) / ((F.col("__cr") + F.lit(1.0)) / (F.col("__nr") + F.lit(d)))
    ratios = (
        counts.crossJoin(F.broadcast(tot))
        .select("__b", _micro(F.log(lam)).alias("__lw"))
    )
    return (
        feats.join(F.broadcast(ratios), "__b", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("__lw"), F.lit(0)).alias("logw_micro"),
            F.count("__b").alias("n_feats"),
        )
    )


def dsir_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    *,
    k: int,
    n_buckets: int = 512,
    bigrams: bool = True,
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel top-``k`` importance resample: key = logw_micro +
    floor(10⁶·(−ln(−ln u)) + ½) with ``u`` the deterministic
    md5-uniform of the (salted) id — sampling without replacement
    with inclusion odds ∝ exp(logw), reproducible anywhere (same
    Efraimidis–Spirakis trade as ``sampling.weighted_sample``, in
    Gumbel form so the weight stays in log space and never
    overflows).

    Returns the selected rows' ``(id_col, logw_micro, key_micro)``,
    ordered by key desc — TakeOrderedAndProject, no global sort.
    """
    w = dsir_logweights(
        df, id_col, text_col, is_target,
        n_buckets=n_buckets, bigrams=bigrams,
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(_TWO32)
    gumbel = _micro(-F.log(-F.log(u)))
    return (
        w.select(
            id_col,
            "logw_micro",
            (F.col("logw_micro") + gumbel).alias("key_micro"),
        )
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(k)
    )


def linear_text_classifier(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bias: float = 0.0,
    n_buckets: int = 512,
    bigrams: bool = True,
    score_col: str = "score",
    max_feats_per_doc: int | None = None,
    features: Column | None = None,
) -> DataFrame:
    """Apply a linear text classifier (fastText-style: mean of hashed
    bag-of-n-gram feature weights through a sigmoid) as a pure
    column computation — the CCNet / LLaMA-prep quality-filter
    inference path.

    ``weights`` is a (``bucket`` int, ``weight`` double) table — the
    trained model, typically a few thousand rows — broadcast onto the
    exploded feature occurrences. Weights are quantized to integer
    micro-units per bucket, so the per-document sum is exact; the
    logit ``z = (Σw)/10⁶/n_feats + bias`` and the sigmoid are then
    evaluated with the identical operation order in any engine.
    Featureless documents score ``sigmoid(bias)``.

    ``max_feats_per_doc`` (r12 ADVICE, curation.py:314): when set,
    only the FIRST that-many features of each document enter the
    logit — the same ``F.slice`` :func:`train_text_classifier`
    applies to its training sample.  Pass the trainer's cap here for
    strict train/apply feature agreement on long documents; the
    default ``None`` scores over the full feature bag (the CCNet
    inference shape, and the pre-r13 behavior).

    ``features``: an alternative feature expression (array<long> of
    bucket ids, e.g. :func:`hashed_char_ngram_buckets` for the
    trained language-ID path) — defaults to the word uni+bigram
    :func:`hashed_ngram_buckets`. Pass the SAME expression the model
    was trained with.

    Returns ``(id_col, n_feats, z, score_col)``.
    """
    bag = (
        features
        if features is not None
        else hashed_ngram_buckets(
            text_col, n_buckets=n_buckets, bigrams=bigrams
        )
    )
    if max_feats_per_doc is not None:
        bag = F.slice(bag, 1, max_feats_per_doc)
    feats = df.select(
        F.col(id_col),
        F.explode_outer(bag).alias("__b"),
    )
    wq = weights.select(
        F.col("bucket").alias("__b"), _micro(F.col("weight")).alias("__w")
    )
    sums = (
        feats.join(F.broadcast(wq), "__b", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("__w"), F.lit(0)).alias("__sw"),
            F.count("__b").alias("n_feats"),
        )
    )
    z = (
        F.col("__sw") / F.lit(1e6)
    ) / F.greatest(F.col("n_feats"), F.lit(1)).cast("double") + F.lit(bias)
    return sums.select(
        id_col,
        "n_feats",
        z.alias("z"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias(score_col),
    )


def train_text_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col,
    *,
    n_buckets: int = 512,
    bigrams: bool = True,
    sample_n: int = 2000,
    epochs: int = 10,
    lr: float = 0.5,
    salt: str = "qtrain",
    max_feats_per_doc: int = 512,
    features: Column | None = None,
):
    """Train the (bucket, weight) model :func:`linear_text_classifier`
    applies — closing the DCLM/fastText loop from a labeled seed set
    to corpus-wide quality scores (round 12, VERDICT r11 item 4: the
    filter was inference-only).

    Shape: the X104 BPE-trainer pattern — a BOUNDED, deterministic
    driver-side fit over a sample, with the feature map computed IN
    SPARK by the very :func:`hashed_ngram_buckets` expression
    inference uses, so train and apply can never disagree on
    tokenization or hashing. The sample is the first ``sample_n``
    rows by ``md5(salt‖id)`` (the repo's seeded-sample key),
    features capped at ``max_feats_per_doc`` per row, so the collect
    is O(sample_n · max_feats) ids regardless of corpus size.  The
    cap truncates long documents' TRAINING features; for strict
    train/apply agreement on such documents pass the same value as
    ``linear_text_classifier(..., max_feats_per_doc=...)`` — left
    uncapped, inference scores the full feature bag, which matches
    training exactly only for documents within the cap (r12
    ADVICE). The
    fit is plain logistic-regression SGD in a FIXED order (hash
    order, fixed epochs, fixed learning rate, no RNG) on the same
    mean-of-bucket-weights logit inference evaluates — deterministic
    to the last bit for a given (data, salt, hyperparameters).

    Weights quantize to integer micro-units (the repo's cross-engine
    rule; inference re-quantizes to the identical values), zero
    weights are dropped. Returns ``(weights DataFrame(bucket int,
    weight double), bias float)`` — exactly the model surface
    ``linear_text_classifier`` consumes.
    """
    if sample_n < 1 or epochs < 1:
        raise ValueError(
            f"sample_n and epochs must be >= 1, got {sample_n}, {epochs}"
        )
    import math

    import numpy as np

    label = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    )
    # Features are projected AFTER the orderBy+limit (r14 opt, guide
    # §1.2): with the feature slice inside the pre-sort projection,
    # the hashed-n-gram expression (one md5 per window) evaluated for
    # EVERY corpus row just to pick sample_n of them. Splitting the
    # projection turns the plan into TakeOrderedAndProject over the
    # cheap (__o, text, label) rows, with the feature map computed
    # only for the sample_n survivors — same rows, same features,
    # same fixed hash order (explicit re-sort before collect), so the
    # fit stays bit-identical.
    # (A caller-supplied ``features`` Column may reference arbitrary
    # input columns, so that path keeps the original single
    # projection; the default n-gram map needs only the text column
    # and takes the deferred path.)
    ordkey = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    ).alias("__o")
    if features is not None:
        sampled = df.select(
            ordkey,
            F.slice(features, 1, max_feats_per_doc).alias("__f"),
            label.cast("int").alias("__y"),
        ).orderBy("__o").limit(sample_n)
    else:
        text_c = (
            F.col(text_col) if isinstance(text_col, str) else text_col
        )
        sampled = (
            df.select(ordkey, text_c.alias("__t"), label.cast("int").alias("__y"))
            .orderBy("__o")
            .limit(sample_n)
            .select(
                "__o",
                F.slice(
                    hashed_ngram_buckets(
                        "__t", n_buckets=n_buckets, bigrams=bigrams
                    ),
                    1,
                    max_feats_per_doc,
                ).alias("__f"),
                "__y",
            )
        )
    rows = sampled.orderBy("__o").collect()  # sample_n rows, <= max_feats ids
    if not rows:
        raise ValueError("train_text_classifier: empty training input")

    offsets = [0]
    flat: list[int] = []
    ys: list[int] = []
    for r in rows:
        flat.extend(r["__f"])
        offsets.append(len(flat))
        ys.append(int(r["__y"]))
    idx = np.asarray(flat, dtype=np.int64)
    off = np.asarray(offsets, dtype=np.int64)
    y = np.asarray(ys, dtype=np.float64)
    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    for _ in range(epochs):
        for i in range(len(ys)):
            s, e = off[i], off[i + 1]
            if e > s:
                fi = idx[s:e]
                z = w[fi].sum() / (e - s) + bias
            else:
                z = bias
            g = 1.0 / (1.0 + math.exp(-z)) - y[i]
            bias -= lr * g
            if e > s:
                np.add.at(w, fi, -lr * g / (e - s))

    wq = np.floor(w * 1e6 + 0.5) / 1e6
    bias = math.floor(bias * 1e6 + 0.5) / 1e6
    pairs = [
        (int(b), float(wq[b])) for b in range(n_buckets) if wq[b] != 0.0
    ]
    weights = df.sparkSession.createDataFrame(
        pairs or [(0, 0.0)], "bucket int, weight double"
    )
    return weights, bias


def per_domain_cap(
    df: DataFrame,
    *,
    url_col: str,
    order_by: list[tuple[str, bool]],
    k: int,
    domain_col: str = "domain",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-domain document cap — the corpus-balancing stage FineWeb/
    RefinedWeb-style pipelines run so a handful of template-heavy
    mega-sites cannot dominate the training mix: keep at most ``k``
    documents per REGISTRABLE domain (subdomains share one budget —
    ``www.x.com`` and ``blog.x.com`` draw from the same ``k``),
    best-first by ``order_by`` ((column, ascending) pairs; append a
    unique id for a total order, same contract as
    :func:`operators.analytics.top_k_per_group_partial`).

    Scale shape: the domain key is a pure column
    (:func:`functions.urls.registrable_domain`), and selection is the
    shuffle-bounded EXACT top-k — a lossless map-side per-group prune
    caps the exchange at ``partitions × domains_per_partition × k``
    rows before the final window re-ranks, so the Zipf-head domain
    (the exact thing this operator exists to cap) costs window time
    over ≤ partitions·k survivor rows, never the whole fact table
    through one hot partition. (SURVEY §2.9 X209.)"""
    from workshoop2_etl_spark.functions.urls import registrable_domain
    from workshoop2_etl_spark.operators.analytics import (
        top_k_per_group_partial,
    )

    work = df.withColumn(domain_col, registrable_domain(F.col(url_col)))
    return top_k_per_group_partial(
        work, [domain_col], order_by, k, rank_col=rank_col
    )


def hashed_char_ngram_buckets(
    text_col: str | Column, *, n: int = 3, n_buckets: int = 2048
) -> Column:
    """Array of hashed CHARACTER n-gram buckets, one entry per
    occurrence — the fastText language-ID feature space (Joulin et
    al. 2016 use char n-grams for langid.176): ``substr(lower(text),
    i, n)`` for every window, bucket = first 32 md5 bits mod
    ``n_buckets`` (the same cross-engine md5 contract as
    :func:`hashed_ngram_buckets`; DuckDB reproduces each bucket
    bit-for-bit). Texts shorter than ``n`` yield an empty array."""
    t = F.lower(text_col if isinstance(text_col, Column) else F.col(text_col))
    idx = F.sequence(F.lit(1), F.length(t) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(F.md5(t.substr(i, F.lit(n))), 1, 8), 16, 10
        ).cast("long")
        % n_buckets,
    )
    # sequence(1, stop<1) DESCENDS in Spark — short texts must yield
    # an empty bag, not reversed out-of-range windows
    return F.when(F.length(t) >= n, grams).otherwise(
        F.array().cast("array<long>")
    )


def train_language_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    langs: list[str],
    *,
    ngram_n: int = 3,
    n_buckets: int = 2048,
    sample_n: int = 2000,
    epochs: int = 10,
    lr: float = 0.5,
    salt: str = "langid",
    max_feats_per_doc: int = 512,
):
    """Trained language ID, part 1 (round 13 — VERDICT r12 'What's
    missing' #4): a MULTINOMIAL softmax fit over hashed
    CHARACTER-n-gram features — the fastText langid construction
    (Joulin et al. 2016 train a softmax, not one-vs-rest: independent
    binary fits leave per-class biases uncalibrated — the bias
    absorbs each class's base rate at full gradient speed while
    feature weights move at gradient/n_feats, and the argmax over
    such logits degrades toward bias order; measured 338/500
    collapse onto one language on a cleanly separable fixture).
    Everything else is the X217 trainer shape verbatim: the training
    sample is the first ``sample_n`` rows by ``md5(salt‖id)``
    collected ONCE with features computed in Spark by the very
    :func:`hashed_char_ngram_buckets` expression inference uses,
    capped at ``max_feats_per_doc``; the fit walks rows in fixed
    hash order with fixed epochs/lr and no RNG — bit-identical
    retrains. X11's stopword heuristic remains the untrained
    fallback.

    Returns ``(weights DataFrame(lang string, bucket int, weight
    double), biases dict[lang, float])`` — the model surface
    :func:`language_classify` consumes (weights quantized to integer
    micro-units, zeros dropped). Training cost is O(sample_n ·
    max_feats · len(langs)) driver work regardless of corpus size."""
    import math

    import numpy as np

    if not langs:
        raise ValueError("train_language_classifier: empty langs")
    if sample_n < 1 or epochs < 1:
        raise ValueError(
            f"sample_n and epochs must be >= 1, got {sample_n}, {epochs}"
        )
    classes = sorted(langs)
    cix = {lg: k for k, lg in enumerate(classes)}
    # Feature projection DEFERRED below the orderBy+limit (r14 opt,
    # guide §1.2; same restructure as train_text_classifier): the
    # char-n-gram map costs one md5 per character window, and with it
    # inside the pre-sort projection the trainer hashed the ENTIRE
    # corpus to pick sample_n rows (measured ~15 s of CPU at sf0.1).
    # Split, the plan is TakeOrderedAndProject over (__o, text,
    # label) and features are computed for the survivors only —
    # same rows, same features, same fixed hash order (explicit
    # re-sort before collect), bit-identical fit.
    #
    # __t carries only the LOWERED PREFIX the capped feature slice
    # can see (r15 opt, r14 VERDICT item 4): slice(grams, 1, cap)
    # reads windows 1..cap, i.e. chars 1..cap+n−1 of lower(text), so
    # the TakeOrdered heap holds ≤ cap+n−1 chars per row instead of
    # whole documents. Lowering BEFORE the substr keeps window
    # boundaries exact (Unicode case mapping can change lengths:
    # İ → "i"+combining dot; truncating the raw text first could
    # shift every later window). hashed_char_ngram_buckets re-lowers,
    # a no-op on already-lowercased text (Java Locale.ROOT lowercase
    # is idempotent), and its length-< n empty-bag guard is
    # unaffected (cap+n−1 ≥ n, so truncation never crosses the
    # boundary). Same windows, same buckets, bit-identical fit.
    text_expr = (
        F.col(text_col) if isinstance(text_col, str) else text_col
    )
    rows = (
        df.select(
            F.md5(
                F.concat(F.lit(salt), F.col(id_col).cast("string"))
            ).alias("__o"),
            F.substring(
                F.lower(text_expr),
                1,
                max_feats_per_doc + ngram_n - 1,
            ).alias("__t"),
            F.col(label_col).alias("__y"),
        )
        .where(F.col("__y").isin(classes))
        .orderBy("__o")
        .limit(sample_n)
        .select(
            "__o",
            F.slice(
                hashed_char_ngram_buckets(
                    "__t", n=ngram_n, n_buckets=n_buckets
                ),
                1,
                max_feats_per_doc,
            ).alias("__f"),
            "__y",
        )
        .orderBy("__o")
        .collect()  # bounded: sample_n rows of <= max_feats ids
    )
    if not rows:
        raise ValueError("train_language_classifier: empty training input")
    offsets = [0]
    flat: list[int] = []
    ys: list[int] = []
    for r in rows:
        flat.extend(r["__f"])
        offsets.append(len(flat))
        ys.append(cix[r["__y"]])
    idx = np.asarray(flat, dtype=np.int64)
    off = np.asarray(offsets, dtype=np.int64)
    K = len(classes)
    w = np.zeros((K, n_buckets), dtype=np.float64)
    bias = np.zeros(K, dtype=np.float64)
    for _ in range(epochs):
        for i in range(len(ys)):
            s, e = off[i], off[i + 1]
            if e > s:
                fi = idx[s:e]
                z = w[:, fi].sum(axis=1) / (e - s) + bias
            else:
                z = bias.copy()
            z -= z.max()  # stable softmax, deterministic
            p = np.exp(z)
            p /= p.sum()
            p[ys[i]] -= 1.0  # grad_k = p_k - 1[y=k]
            bias -= lr * p
            if e > s:
                for k in range(K):
                    np.add.at(w[k], fi, -lr * p[k] / (e - s))
    wq = np.floor(w * 1e6 + 0.5) / 1e6
    pairs = [
        (classes[k], int(b), float(wq[k, b]))
        for k in range(K)
        for b in range(n_buckets)
        if wq[k, b] != 0.0
    ]
    weights = df.sparkSession.createDataFrame(
        pairs or [(classes[0], 0, 0.0)],
        "lang string, bucket int, weight double",
    )
    biases = {
        classes[k]: math.floor(float(bias[k]) * 1e6 + 0.5) / 1e6
        for k in range(K)
    }
    return weights, biases


def language_classify(
    df: DataFrame,
    weights: DataFrame,
    biases: dict[str, float],
    id_col: str,
    text_col: str,
    *,
    ngram_n: int = 3,
    n_buckets: int = 2048,
    out_col: str = "lang_pred",
    max_feats_per_doc: int | None = None,
) -> DataFrame:
    """Trained language ID, part 2: score every language's
    one-vs-rest logit in ONE pass — the char-n-gram occurrences
    explode once, the (lang, bucket, weight) table (≤ langs ×
    n_buckets rows, KB-scale) broadcasts onto them, and the argmax
    is a deterministic row_number window keyed by the document
    (score desc, lang asc on ties).

    All arithmetic follows the X159 micro-unit contract (integer
    weight sums, ``z = Σw/10⁶/n_feats + bias``), so a SQL oracle
    reproduces every logit bit-for-bit. Returns ``(id_col, n_feats,
    out_col)``; featureless documents predict the MAX-BIAS language
    (every logit equals its language's bias, and trained biases
    differ per language — the lang-asc tie-break only applies on
    exact logit ties, never NULL).

    ``max_feats_per_doc``: pass the TRAINER's cap. The one-vs-rest
    biases are fit against logits whose denominator is the capped
    feature count; scoring long documents over the full bag shrinks
    every weight contribution relative to the biases and the argmax
    degrades to bias order (measured: 338/500 collapse onto one
    language on the planted fixture) — the multiclass form of the
    r12 feature-agreement ADVICE."""
    from pyspark.sql import Window

    bag = hashed_char_ngram_buckets(
        text_col, n=ngram_n, n_buckets=n_buckets
    )
    if max_feats_per_doc is not None:
        bag = F.slice(bag, 1, max_feats_per_doc)
    feats = df.select(
        F.col(id_col), F.explode_outer(bag).alias("__b")
    )
    # n_feats is pure LENGTH arithmetic — windows = len(lower(text)) −
    # (n−1), floored at 0, optionally capped — so it must not be a
    # second aggregation over the exploded md5 chain: that branch
    # re-evaluated one md5 per character window for the whole corpus
    # (exchange reuse does not fire across differently-pruned
    # branches; measured ~15 s CPU of pure recompute at sf0.1).
    # Identical values by construction: count(explode_outer(bag)) ==
    # size(bag), and size(bag) is min(windows, cap) with empty-bag
    # rows counting 0 (r14 opt, guide §2.4/§1.2).
    tl = F.length(
        F.lower(
            text_col if isinstance(text_col, Column) else F.col(text_col)
        )
    )
    windows = F.greatest(tl - (ngram_n - 1), F.lit(0))
    if max_feats_per_doc is not None:
        windows = F.least(windows, F.lit(max_feats_per_doc))
    n_feats_col = F.coalesce(windows, F.lit(0)).cast("long")
    wq = weights.select(
        "lang",
        F.col("bucket").alias("__b"),
        _micro(F.col("weight")).alias("__w"),
    )
    langs = sorted(biases)
    bias_rows = [(lg, float(biases[lg])) for lg in langs]
    bias_df = df.sparkSession.createDataFrame(
        bias_rows, "lang string, bias double"
    )
    # matched-bucket micro sums per (doc, lang); docs with no matched
    # bucket for some lang still get a row via the bias cross join
    sums = (
        feats.join(F.broadcast(wq), "__b", "inner")
        .groupBy(id_col, "lang")
        .agg(F.sum("__w").alias("__sw"))
    )
    n_feats = df.select(F.col(id_col), n_feats_col.alias("n_feats"))
    scored = (
        n_feats.crossJoin(F.broadcast(bias_df))
        .join(sums, [id_col, "lang"], "left")
        .select(
            id_col,
            "lang",
            "n_feats",
            (
                (F.coalesce(F.col("__sw"), F.lit(0)) / F.lit(1e6))
                / F.greatest(F.col("n_feats"), F.lit(1)).cast("double")
                + F.col("bias")
            ).alias("__z"),
        )
    )
    pick = Window.partitionBy(id_col).orderBy(
        F.desc("__z"), F.asc("lang")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(pick))
        .where(F.col("__rn") == 1)
        .select(id_col, "n_feats", F.col("lang").alias(out_col))
    )
