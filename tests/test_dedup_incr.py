"""Incremental LSH index maintenance (operators/dedup.py
``lsh_index_refresh``): the exact maintenance identity, delta-only
emission, capping semantics, and the banded-frame refactor's
equivalence with the original pair generator."""

from __future__ import annotations

from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.dedup import (
    lsh_banded,
    lsh_candidate_pairs,
    lsh_index_refresh,
    minhash_signatures,
)


def _pairs(df):
    return {(r["doc_id_a"], r["doc_id_b"]) for r in df.collect()}


def _docs(spark, n=60):
    """Docs with planted near-dup twins: every 4th doc is a one-token
    mutation of its predecessor."""
    rows = []
    for i in range(n):
        base = f"the quick brown fox {i // 4} jumps over the lazy dog " * 3
        if i % 4 == 3:
            base += "mutated"
        rows.append((i, base + f" tail{i % 4 if i % 4 != 3 else 2}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_maintenance_identity_uncapped(spark):
    """pairs(base ∪ delta) == pairs(base) ∪ new_pairs, exactly."""
    docs = _docs(spark)
    base = docs.filter("doc_id % 5 != 0")
    delta = docs.filter("doc_id % 5 = 0")

    def banded(d):
        return lsh_banded(minhash_signatures(d, "doc_id", "text"), "doc_id")

    full = _pairs(
        lsh_candidate_pairs(
            minhash_signatures(docs, "doc_id", "text"),
            "doc_id",
            max_bucket_size=None,
        )
    )
    base_pairs = _pairs(
        lsh_candidate_pairs(
            minhash_signatures(base, "doc_id", "text"),
            "doc_id",
            max_bucket_size=None,
        )
    )
    _, new_pairs = lsh_index_refresh(banded(base), banded(delta), "doc_id")
    new = _pairs(new_pairs)
    assert base_pairs | new == full
    # delta-only emission: every new pair touches a delta doc
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    assert all(a in delta_ids or b in delta_ids for a, b in new)
    # and none of them was already a base pair
    assert not (new & base_pairs)
    assert full, "fixture produced no candidate pairs"


def test_refreshed_index_equals_full_banded(spark):
    docs = _docs(spark, n=40)
    base = docs.filter("doc_id < 30")
    delta = docs.filter("doc_id >= 30")

    def banded(d):
        return lsh_banded(minhash_signatures(d, "doc_id", "text"), "doc_id")

    banded_all, _ = lsh_index_refresh(banded(base), banded(delta), "doc_id")
    direct = banded(docs)
    key = ["doc_id", "band", "bh"]
    assert sorted(map(tuple, banded_all.select(key).collect())) == sorted(
        map(tuple, direct.select(key).collect())
    )


def test_capped_refresh_is_conservative_superset(spark):
    """With a cap, the refresh never MISSES a pair the capped full
    recompute finds among delta-touching pairs (it may keep extra
    base pairs from buckets that outgrew the cap — documented)."""
    # many near-identical docs -> one fat bucket
    rows = [(i, "common boilerplate text repeated everywhere") for i in range(20)]
    rows += [(100 + i, f"unique document number {i} with its own words") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = docs.filter("doc_id < 15 or doc_id >= 100")
    delta = docs.filter("doc_id >= 15 and doc_id < 100")

    def banded(d):
        return lsh_banded(minhash_signatures(d, "doc_id", "text"), "doc_id")

    cap = 25
    full_capped = _pairs(
        lsh_candidate_pairs(
            minhash_signatures(docs, "doc_id", "text"),
            "doc_id",
            max_bucket_size=cap,
        )
    )
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    expected_delta_pairs = {
        p for p in full_capped if p[0] in delta_ids or p[1] in delta_ids
    }
    _, new_pairs = lsh_index_refresh(
        banded(base), banded(delta), "doc_id", max_bucket_size=cap
    )
    assert expected_delta_pairs <= _pairs(new_pairs)


def test_lsh_candidate_pairs_unchanged_by_refactor(spark):
    """The banded-frame extraction did not change lsh_candidate_pairs
    output (regression pin for the factored code path)."""
    docs = _docs(spark, n=24)
    sigs = minhash_signatures(docs, "doc_id", "text")
    pairs = _pairs(lsh_candidate_pairs(sigs, "doc_id"))
    # recompute through the factored primitives
    banded = lsh_banded(sigs, "doc_id")
    a = banded.select(F.col("doc_id").alias("x"), "band", "bh")
    b = banded.select(F.col("doc_id").alias("y"), "band", "bh")
    manual = {
        (r["x"], r["y"])
        for r in a.join(b, ["band", "bh"]).filter("x < y").distinct().collect()
    }
    assert pairs == manual
