"""Partition-invariance: a distributed operator's ANSWER must not
depend on how the data happens to be partitioned — the property that
separates a correct distributed algorithm from one that works because
the test data fit in one partition.

Each selected query runs twice against the same sf0.001 parquet under
deliberately different physical conditions — shuffle-partition count
3 vs 16 AND scan-split size 32 KB vs default (the small files then
split into many input partitions vs one) — and the canonicalized
results must be identical. The set spans the failure modes that
partitioning classically breaks: window-function ordering, map-side
partial aggregation (Misra–Gries, partial top-k), per-partition
sampling, global id assignment, and corpus-wide window minima."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

QUERIES = [
    "mode_or_first_lineitem",       # count-desc/value-asc window tie-break
    "topk_pergroup_partial_lineitem",  # map-side partial prune
    "heavy_hitters_bigrams_documents",  # per-partition Misra–Gries
    "weighted_sample_documents",    # md5-raced sampling
    "global_ids_documents",         # two-phase range numbering
    "winnow_candidates_documents",  # per-doc window minima + postings join
    "lm_quality_buckets_documents", # corpus-trained counts + tertiles
    "substring_dedup_documents",    # global keep-first + fold rebuild
    "ewma_value_events",            # order-sensitive per-key recursion
    "tpch_q7_volume_shipping",      # dual broadcast dim paths + agg
    "hybrid_rrf_search_documents",  # two ranked branches + fusion
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].round(6)
    return out.sort_values(by=list(out.columns), ignore_index=True)


@pytest.mark.parametrize("name", QUERIES)
def test_partition_invariant(spark, name):
    q = entry_mod.queries()[name]
    conf = spark.conf
    orig_sp = conf.get("spark.sql.shuffle.partitions")
    orig_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    try:
        conf.set("spark.sql.shuffle.partitions", "3")
        conf.set("spark.sql.files.maxPartitionBytes", "32768")
        a = _canon(q(spark, SF).toPandas())
        conf.set("spark.sql.shuffle.partitions", "16")
        conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        b = _canon(q(spark, SF).toPandas())
    finally:
        conf.set("spark.sql.shuffle.partitions", orig_sp)
        conf.set("spark.sql.files.maxPartitionBytes", orig_mpb)
    pd.testing.assert_frame_equal(a, b)
