"""Round-6 edge-case wave: corner inputs for the session's operators
— empty inputs, singletons, and degenerate shapes that unit tests
built around happy paths can miss."""

from __future__ import annotations

import pytest


def test_triangle_count_empty_and_single_edge(spark):
    from workshoop2_etl_spark.operators.graph import triangle_count

    empty = spark.createDataFrame([], "src long, dst long")
    r = triangle_count(empty).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (0, 0, 0, 0)
    one = spark.createDataFrame([(1, 2)], "src long, dst long")
    r = triangle_count(one).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (2, 1, 0)


def test_rrf_fuse_three_lists_and_single_list(spark):
    from workshoop2_etl_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1)], "doc_id long, rank long")
    c = spark.createDataFrame([(2, 3), (3, 1)], "doc_id long, rank long")
    out = {
        r.doc_id: r
        for r in rrf_fuse(
            {"x": a, "y": b, "z": c}, id_col="doc_id", k=2
        ).collect()
    }
    # doc 2 appears in all three lists and must win
    assert set(out) == {2, 3} or set(out) == {2, 1}
    assert max(out, key=lambda d: out[d].rrf) == 2
    assert out[2].x_rank == 2 and out[2].y_rank == 1 and out[2].z_rank == 3
    single = rrf_fuse({"only": a}, id_col="doc_id").collect()
    assert {r.doc_id for r in single} == {1, 2}


def test_ewma_single_row_and_single_key(spark):
    from workshoop2_etl_spark.operators.timeseries import ewma

    df = spark.createDataFrame([("k", 1, 42.0)], "k string, t int, v double")
    r = ewma(df, key_col="k", ts_col="t", value_col="v", alpha=0.9).collect()
    assert len(r) == 1 and r[0].ewma == 42.0


def test_kaplan_meier_all_censored_and_empty(spark):
    from workshoop2_etl_spark.operators.timeseries import kaplan_meier

    all_cens = spark.createDataFrame(
        [(3, 0), (5, 0), (7, 0)], "d int, e int"
    )
    assert kaplan_meier(all_cens, duration_col="d", event_col="e").count() == 0
    empty = spark.createDataFrame([], "d int, e int")
    assert kaplan_meier(empty, duration_col="d", event_col="e").count() == 0


def test_concurrency_profile_identical_intervals(spark):
    from workshoop2_etl_spark.operators.timeseries import (
        concurrency_profile,
    )

    df = spark.createDataFrame([(1, 3)] * 4, "s int, e int")
    out = {
        r.ts: r.n_active
        for r in concurrency_profile(df, start_col="s", end_col="e").collect()
    }
    assert out == {1: 4, 3: 0}


def test_phrase_search_phrase_longer_than_docs(spark):
    from workshoop2_etl_spark.operators.textstats import phrase_search

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert (
        phrase_search(df, "doc_id", "text", ["a", "b", "c", "d"]).count() == 0
    )


def test_pmi_collocations_min_count_filters_noise(spark):
    from workshoop2_etl_spark.operators.textstats import pmi_collocations

    # "q r" occurs once: a 1-count pair of rare tokens would max PMI —
    # min_count must keep it out
    rows = [(0, "x y x y x y"), (1, "q r")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, "text", min_count=2, k=10).collect()
    pairs = {(r.a, r.b) for r in out}
    assert ("q", "r") not in pairs
    assert ("x", "y") in pairs


def test_moment_stats_single_group_col_list_form(spark):
    from workshoop2_etl_spark.operators.analytics import moment_stats

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)], "k string, x double"
    )
    out = {r.k: r for r in moment_stats(df, ["k"], "x").collect()}
    assert out["a"].mean == 2.0 and out["a"].variance == 1.0
    assert out["b"].skewness is None  # zero variance


def test_holt_winters_series_shorter_than_period(spark):
    from workshoop2_etl_spark.operators.timeseries import holt_winters

    df = spark.createDataFrame(
        [("k", 0, 5.0), ("k", 1, 7.0)], "k string, t int, v double"
    )
    out = holt_winters(
        df, key_col="k", ts_col="t", value_col="v",
        period=7, alpha=0.5, beta=0.5, gamma=0.5,
    ).orderBy("t").collect()
    # seasonal vector is all-zero until a full cycle passes, so this
    # degrades exactly to Holt — no crash, sane numbers
    assert out[0].level == 5.0 and out[1].level == 6.0
    assert out[1].fitted == 5.0
