"""PageRank vs an independent numpy power iteration — the correctness
statement for the iterative-algorithm class, where no SQL oracle can
follow (per-step re-aggregation)."""

from __future__ import annotations

import numpy as np
import pytest

from workshoop2_etl_spark.operators.graph import pagerank, textrank_keywords


def _numpy_pagerank(edges, n_ids, damping, iters):
    ids = sorted(n_ids)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out_deg = np.zeros(n)
    for s, _d in edges:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / out_deg[idx[s]]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in ids}


@pytest.mark.parametrize(
    "edges",
    [
        # cycle + chord + dangling node 9
        [(1, 2), (2, 3), (3, 1), (1, 3), (3, 9)],
        # star into 0, 0 dangles
        [(1, 0), (2, 0), (3, 0), (4, 0)],
        # two components
        [(1, 2), (2, 1), (3, 4), (4, 3), (4, 5)],
    ],
)
def test_pagerank_matches_numpy_power_iteration(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank
        for r in pagerank(df, damping=0.85, iterations=8).collect()
    }
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    want = _numpy_pagerank(edges, nodes, 0.85, 8)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_textrank_returns_ranked_keywords(spark, sf_dir):
    from workshoop2_etl_spark.sources.readers import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = textrank_keywords(docs, "text", k=10, iterations=5).collect()
    assert len(out) == 10
    ranks = [r.rank for r in out]
    assert ranks == sorted(ranks, reverse=True)
    assert [r.rk for r in out] == list(range(1, 11))
    # high-frequency connective tokens should rank near the top
    assert out[0].rank > out[-1].rank
