"""Property-based tests (hypothesis): engine operators vs the pandas
semantics the reference relies on, over randomized small frames —
the reference's own test strategy is manual spot-checks (SURVEY §5);
these generalize it."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from workshoop2_etl_spark.operators.cleaning import mode_or_first_dedup
from workshoop2_etl_spark.operators.dedup import exact_dedup
from workshoop2_etl_spark.operators.merge import full_outer_with_indicator

KEYS = st.sampled_from(["a", "b", "c", None])
VALS = st.integers(min_value=0, max_value=5)

_SETTINGS = dict(
    max_examples=12,  # each example runs Spark jobs — keep it tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(
    left=st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=8),
    right=st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=8),
)
def test_full_outer_indicator_matches_pandas_merge(spark, left, right):
    """Row multiset + indicator parity with pd.merge(indicator=True)
    after the reference's fillna("") key normalization."""
    if not left or not right:
        return  # Spark createDataFrame needs rows; pandas edge is trivial
    ldf = spark.createDataFrame(left, "key string, lv int")
    rdf = spark.createDataFrame(right, "key string, rv int")
    got = full_outer_with_indicator(ldf, rdf, ["key"]).collect()
    got_rows = sorted((r.key, r.lv, r.rv, r["_merge"]) for r in got)

    lp = pd.DataFrame(left, columns=["key", "lv"])
    rp = pd.DataFrame(right, columns=["key", "rv"])
    for p in (lp, rp):
        p["key"] = p["key"].fillna("").astype(str).str.strip().str.lower()
    m = pd.merge(lp, rp, on="key", how="outer", indicator=True)
    want_rows = sorted(
        (
            r["key"],
            None if pd.isna(r["lv"]) else int(r["lv"]),
            None if pd.isna(r["rv"]) else int(r["rv"]),
            str(r["_merge"]),
        )
        for r in m.to_dict("records")
    )
    assert got_rows == want_rows


@settings(**_SETTINGS)
@given(rows=st.lists(st.tuples(KEYS, VALS, VALS), min_size=1, max_size=12))
def test_mode_or_first_matches_pandas(spark, rows):
    """qty column: pandas mode().iloc[0] (smallest most-frequent,
    nulls dropped); other columns: first under explicit order."""
    rows = [(k if k is not None else "k", o, v) for k, (o, v) in
            ((k, (i, v)) for i, (k, _, v) in enumerate(rows))]
    df = spark.createDataFrame(rows, "key string, ord int, val int")
    got = {
        r.key: (r.ord, r.val)
        for r in mode_or_first_dedup(df, "key", "val", ["ord"]).collect()
    }

    p = pd.DataFrame(rows, columns=["key", "ord", "val"])

    def mode_or_first(s: pd.Series):
        m = s.mode(dropna=True)
        if len(m):
            return m.iloc[0]
        nn = s.dropna()
        return nn.iloc[0] if nn.size else None

    want = {}
    for k, g in p.sort_values("ord").groupby("key"):
        want[k] = (int(g["ord"].iloc[0]), int(mode_or_first(g["val"])))
    assert got == want


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 100),
            # NUL excluded: the pandas ORACLE (numpy fixed-width
            # strings) wrongly equates '' and '\x00'; Spark is right.
            # Surrogates (Cs) excluded: Spark strings are UTF-8, so a
            # lone surrogate cannot round-trip (it becomes U+FFFD) —
            # not representable input, not an engine defect.
            st.text(
                alphabet=st.characters(
                    blacklist_characters="\x00",
                    blacklist_categories=["Cs"],
                ),
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_exact_dedup_properties(spark, rows):
    """Idempotent; output ids are the min id per distinct content;
    every distinct content survives exactly once."""
    rows = [(i, t) for i, (_, t) in enumerate(rows)]  # unique ids
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = exact_dedup(df, "text", "doc_id")
    got = sorted((r.doc_id, r.text) for r in once.collect())
    p = pd.DataFrame(rows, columns=["doc_id", "text"])
    want = sorted(
        (int(g["doc_id"].min()), t) for t, g in p.groupby("text", dropna=False)
    )
    assert got == want
    twice = exact_dedup(once, "text", "doc_id")
    assert sorted((r.doc_id, r.text) for r in twice.collect()) == got


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100, allow_nan=False)),
        min_size=1,
        max_size=30,
    ),
    bins=st.integers(min_value=1, max_value=10),
)
def test_histogram_matches_numpy(spark, vals, bins):
    """Bin counts parity with numpy.histogram over the same range
    (the reference's seaborn histplot computes exactly this).

    Two-level check. (1) Bit-exact parity, always: the engine bins by
    ``min(floor((v - lo)/width), bins-1)`` in IEEE double — the same
    expression computed in numpy float64 must match exactly. (2)
    ``np.histogram`` parity, guarded: numpy places values by
    comparing against precomputed edge values, which legitimately
    disagrees with the floor formula for values within ~1 ULP of an
    interior edge (hypothesis found it with a subnormal whose
    subtraction absorbs into the edge) — for those inputs only the
    floor-formula check applies."""
    import numpy as np

    from workshoop2_etl_spark.operators.analytics import histogram

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r.bin: r.n for r in histogram(df, "v", bins=bins).collect()}

    arr = np.array([v for v in vals if v is not None], dtype=float)
    if arr.size == 0:
        assert got == {}
        return
    if arr.min() == arr.max():
        assert got == {0: arr.size}
        return

    lo, hi = arr.min(), arr.max()
    width = (hi - lo) / bins
    formula_bins = np.minimum(
        np.floor((arr - lo) / width).astype(int), bins - 1
    )
    want_formula = {
        int(b): int(n) for b, n in zip(*np.unique(formula_bins, return_counts=True))
    }
    assert got == want_formula

    edges = lo + width * np.arange(1, bins)
    edge_ambiguous = edges.size and bool(
        (np.abs(arr[:, None] - edges[None, :]) <= width * 1e-9).any()
    )
    if not edge_ambiguous:
        counts, _ = np.histogram(arr, bins=bins, range=(lo, hi))
        want = {i: int(c) for i, c in enumerate(counts) if c > 0}
        assert got == want


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.sampled_from(["rock", "punk", "salsa", "  Rock "])),
        min_size=1,
        max_size=12,
    )
)
def test_recode_matches_pandas_map(spark, vals):
    """recode + defaults parity with the reference's
    map(genero).fillna('Otro') / map(sub).fillna(original)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from workshoop2_etl_spark.operators.cleaning import recode_with_default

    mapping = {"rock": ("Rock", "classic"), "punk": ("Rock", "punk")}
    df = spark.createDataFrame([(v,) for v in vals], "genre string")
    out = recode_with_default(
        df, "genre", mapping, ["genero", "subgenero"],
        [F.lit("Otro"), F.col("genre")],
    )
    nkey = lambda t: tuple("" if x is None else str(x) for x in t)
    got = sorted(
        ((r.genre, r.genero, r.subgenero) for r in out.collect()), key=nkey
    )

    s = pd.Series(vals, dtype=object)
    genero = s.map({k: v[0] for k, v in mapping.items()})
    sub = s.map({k: v[1] for k, v in mapping.items()})
    want = sorted(
        (
            (
                v,
                g if pd.notna(g) else "Otro",
                sb if pd.notna(sb) else v,
            )
            for v, g, sb in zip(vals, genero, sub)
        ),
        key=nkey,
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    points=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(-50, 50)),
        min_size=1,
        max_size=15,
    ),
    intervals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(-50, 50),
            st.integers(0, 40),  # width — lo+width keeps lo <= hi
        ),
        min_size=1,
        max_size=10,
    ),
    bin_size=st.integers(min_value=1, max_value=17),
)
def test_range_join_matches_bruteforce(spark, points, intervals, bin_size):
    """Bin bucketing (any bin size, negative values, edge-straddling
    intervals) must reproduce the plain BETWEEN cross-join exactly,
    with each pair emitted once."""
    from workshoop2_etl_spark.operators.merge import range_join

    lrows = [(i, k, p) for i, (k, p) in enumerate(points)]
    rrows = [(j, k, lo, lo + w) for j, (k, lo, w) in enumerate(intervals)]
    left = spark.createDataFrame(lrows, "pid long, key string, p long")
    right = spark.createDataFrame(rrows, "rid long, key string, lo long, hi long")

    got = sorted(
        (r.pid, r.rid)
        for r in range_join(
            left, right, ["key"], "p", "lo", "hi", bin_size=bin_size
        ).collect()
    )
    want = sorted(
        (pid, rid)
        for pid, pk, p in lrows
        for rid, rk, lo, hi in rrows
        if pk == rk and lo <= p <= hi
    )
    assert got == want


@given(
    lefts=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(-50, 50),
            st.integers(0, 40),  # width — lo+width keeps lo <= hi
        ),
        min_size=1,
        max_size=12,
    ),
    rights=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(-50, 50),
            st.integers(0, 40),
        ),
        min_size=1,
        max_size=10,
    ),
    bin_size=st.integers(min_value=1, max_value=17),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_overlap_join_matches_bruteforce(spark, lefts, rights, bin_size):
    """Interval-overlap bucketing (any bin size, negative bounds,
    bin-straddling intervals, zero-width intervals) must reproduce
    the plain overlap cross-join exactly — each pair ONCE despite
    multi-bin co-occurrence (the first-common-bin guard)."""
    from workshoop2_etl_spark.operators.merge import overlap_join

    lrows = [(i, k, lo, lo + w) for i, (k, lo, w) in enumerate(lefts)]
    rrows = [(j, k, lo, lo + w) for j, (k, lo, w) in enumerate(rights)]
    left = spark.createDataFrame(lrows, "lid long, key string, llo long, lhi long")
    right = spark.createDataFrame(rrows, "rid long, key string, rlo long, rhi long")

    got = sorted(
        (r.lid, r.rid)
        for r in overlap_join(
            left, right, ["key"], "llo", "lhi", "rlo", "rhi",
            bin_size=bin_size,
        ).collect()
    )
    want = sorted(
        (lid, rid)
        for lid, lk, llo, lhi in lrows
        for rid, rk, rlo, rhi in rrows
        if lk == rk and llo <= rhi and rlo <= lhi
    )
    assert got == want


@given(
    base=st.dictionaries(
        st.integers(0, 9), st.integers(0, 100), min_size=1, max_size=8
    ),
    changes=st.lists(
        st.tuples(
            st.integers(0, 12),              # key (may be novel)
            st.sampled_from(["I", "U", "D"]),
            st.integers(0, 100),             # value
        ),
        min_size=0,
        max_size=15,
    ),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_apply_cdc_matches_dict_replay(spark, base, changes):
    """apply_cdc vs a python-dict replay oracle: per key only the
    max-seq change applies (seq = list position), deletes evict,
    inserts/updates set, untouched base keys survive."""
    from workshoop2_etl_spark.operators.star import apply_cdc

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()], "k long, v long"
    )
    ch_rows = [
        (k, op, seq, v) for seq, (k, op, v) in enumerate(changes)
    ]
    want = dict(base)
    latest: dict = {}
    for k, op, seq, v in ch_rows:
        latest[k] = (op, v)  # later rows have higher seq
    for k, (op, v) in latest.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    ch_df = spark.createDataFrame(
        ch_rows, "k long, op string, seq long, v long"
    )
    got_df = apply_cdc(base_df, ch_df, ["k"])
    got = {r.k: r.v for r in got_df.collect()}
    assert got == want


@given(
    keys=st.lists(st.integers(-20, 20), min_size=1, max_size=25),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_assign_global_ids_dense_even_with_duplicate_keys(spark, keys):
    """Duplicate ordering keys still get DENSE unique ids covering
    exactly range(n), and ids respect the key order across distinct
    keys (ties ordered arbitrarily within their group)."""
    from workshoop2_etl_spark.operators.ids import assign_global_ids

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rows = assign_global_ids(df, "k", num_partitions=4).collect()
    gids = sorted(r.gid for r in rows)
    assert gids == list(range(len(keys)))
    by_gid = sorted(rows, key=lambda r: r.gid)
    ks = [r.k for r in by_gid]
    assert ks == sorted(ks)  # ids never invert the key order
