"""Property-based tests for the round-6 second-wave operators: each
distributed algorithm against an obviously-correct Python reference
over randomized inputs (continuing test_properties.py's strategy)."""

from __future__ import annotations

import hashlib
import itertools
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.dedup import (
    allpairs_jaccard,
    winnow_fingerprints,
)
from workshoop2_etl_spark.operators.entity import resolve_entities

_SETTINGS = dict(
    max_examples=8,  # each example runs Spark jobs — keep it tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

WORDS = st.sampled_from([f"w{k}" for k in range(9)])
DOC = st.lists(WORDS, min_size=0, max_size=12).map(" ".join)


@settings(**_SETTINGS)
@given(
    docs=st.lists(DOC, min_size=2, max_size=10),
    tau=st.sampled_from([0.3, 0.5, 0.75, 1.0]),
)
def test_allpairs_jaccard_vs_bruteforce(spark, docs, tau):
    """Prefix filtering must return EXACTLY the brute-force pair set
    for any corpus and threshold — completeness (no pair lost to a
    short prefix) and soundness (verify kills false candidates)."""
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.n_union)
        for r in allpairs_jaccard(df, "id", "text", tau=tau).collect()
    }
    sets = {i: set(t.lower().split()) for i, t in rows}
    want = {}
    for (ia, sa), (ib, sb) in itertools.combinations(sets.items(), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if inter / union >= tau:
            want[(min(ia, ib), max(ia, ib))] = (inter, union)
    assert got == want


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=20),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=1, max_value=4),
    w=st.integers(min_value=1, max_value=5),
)
def test_winnow_fingerprints_vs_python_loop(spark, texts, k, w):
    """The in-row HOF rewrite must reproduce the textbook winnowing
    selection exactly: per window of w gram-keys, the minimum
    (hash, offset) pack; short docs keep one all-gram minimum."""
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["id"], r["off"], r["gram_hash"])
        for r in winnow_fingerprints(df, "id", "text", k=k, w=w).collect()
    }
    want = set()
    for i, t in rows:
        n = len(t) - k + 1
        if n < 1:
            continue
        keys = [
            hashlib.md5(t[o : o + k].encode()).hexdigest() + str(o).zfill(10)
            for o in range(n)
        ]
        if n < w:
            sel = {min(keys)}
        else:
            sel = {min(keys[s : s + w]) for s in range(n - w + 1)}
        for key in sel:
            want.add((i, int(key[32:]), key[:32]))
    assert got == want


def _uf_clusters(pairs):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def _lev1(a, b):
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a shorter by 1: b minus one char equals a
    return any(b[:i] + b[i + 1 :] == a for i in range(lb))


@settings(**_SETTINGS)
@given(
    recs=st.lists(
        st.tuples(
            st.text(alphabet="xy", min_size=1, max_size=4),
            st.sampled_from(["p", "q"]),
        ),
        min_size=1,
        max_size=8,
    ),
    threshold=st.sampled_from([16, 28, 40]),
)
def test_resolve_entities_vs_quadratic_reference(spark, recs, threshold):
    """Blocked candidates + integer scoring + union-find must equal a
    quadratic reference: score all O(n²) pairs, link ≥ threshold,
    transitive-close, min-id labels; members of singleton entities
    are absent."""
    rows = [(i, name, city) for i, (name, city) in enumerate(recs)]
    df = spark.createDataFrame(rows, "id long, name string, city string")
    got = {
        r["id"]: (r["entity_id"], r["is_canonical"])
        for r in resolve_entities(
            df, "id", "name",
            agree_weights={"city": (16, -8)},
            name_weights=(24, 12),
            threshold=threshold,
            max_distance=1,
        ).collect()
    }
    linked = []
    for (ia, na, ca), (ib, nb, cb) in itertools.combinations(rows, 2):
        if not _lev1(na, nb):
            continue
        score = (24 if na == nb else 12) + (16 if ca == cb else -8)
        if score >= threshold:
            linked.append((ia, ib))
    labels = _uf_clusters(linked)
    want = {x: (root, x == root) for x, root in labels.items()}
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(DOC, st.booleans()), min_size=1, max_size=8
    ).filter(lambda d: any(t for _, t in d)),
    n_buckets=st.sampled_from([16, 64]),
)
def test_dsir_logweights_vs_python_replay(spark, docs, n_buckets):
    """The integer-micro log weights must equal a full Python replay:
    same md5 bucketing, same add-one smoothing, same per-bucket
    floor(1e6·ln λ + ½) quantization, same integer sums."""
    from workshoop2_etl_spark.operators.curation import dsir_logweights

    rows = [(i, t, bool(is_t)) for i, (t, is_t) in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, text string, is_t boolean")
    got = {
        r["id"]: (r["logw_micro"], r["n_feats"])
        for r in dsir_logweights(
            df, "id", "text", F.col("is_t"), n_buckets=n_buckets
        ).collect()
    }

    def feats(text):
        toks = [t for t in text.lower().split() if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
            for g in grams
        ]

    cr: dict = {}
    ct: dict = {}
    for _, text, is_t in rows:
        for b in feats(text):
            cr[b] = cr.get(b, 0) + 1
            if is_t:
                ct[b] = ct.get(b, 0) + 1
    nr = sum(cr.values())
    nt = sum(ct.get(b, 0) for b in cr)
    lw = {
        b: math.floor(
            math.log(
                ((ct.get(b, 0) + 1.0) / (nt + float(n_buckets)))
                / ((cr[b] + 1.0) / (nr + float(n_buckets)))
            )
            * 1e6
            + 0.5
        )
        for b in cr
    }
    want = {}
    for i, text, _ in rows:
        fs = feats(text)
        want[i] = (sum(lw[b] for b in fs), len(fs))
    assert got == want
