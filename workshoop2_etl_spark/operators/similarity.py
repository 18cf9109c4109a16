"""Similarity search over embedding columns (``array<float>``).

Two paths, per the standard ANN playbook:

- :func:`brute_force_topk` — exact cosine top-k. The query set
  broadcasts; the corpus is scanned once; per-query top-k via a
  ``row_number`` window over (query, sim). The baseline and the
  oracle-checkable path.
- :func:`hyperplane_buckets` / :func:`lsh_topk` — random-hyperplane
  LSH: 100 TB path. Each vector gets an ``L``-table signature of
  ``p`` sign bits; candidates share a bucket in ≥1 table, exact
  cosine re-ranks candidates only. Recall is tunable via (L, p).
- :func:`embedding_neardup` — near-duplicate vector pairs above a
  cosine threshold, via the same buckets (never all-pairs).

Everything is built-in array math (``zip_with`` / ``aggregate`` /
``sqrt``) inside codegen — no UDFs, no driver-side loops. The
hyperplanes are a deterministic seeded matrix materialized as column
literals (tiny: L·p·dim doubles), so plans are reproducible across
runs and sessions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays, in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array columns (double precision —
    matches DuckDB ``list_cosine_similarity`` on ``DOUBLE[]``)."""
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must have (``query_id_col``, ``vec_col``) and is
    **broadcast** (query sets are small by definition); the corpus is
    scanned once with no shuffle before the per-query top-k window.
    Ties break on ascending neighbor id — a total order, so results
    are deterministic and oracle-comparable.

    Output: ``query_id``, ``{id_col}`` (neighbor), ``sim``, ``rank``.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    scored = joined.withColumn("sim", cosine(vec_col, "__qvec"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def _hyperplanes(num_tables: int, num_planes: int, dim: int, seed: int = 42) -> list[list[list[float]]]:
    """Deterministic L×p×dim Gaussian hyperplane matrix."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_tables, num_planes, dim)).tolist()


def hyperplane_buckets(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    num_tables: int = 4,
    num_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Attach LSH bucket ids: one ``bucket_{t}`` int column per table,
    the sign-bit signature of the vector against ``num_planes``
    hyperplanes. Vectors with equal bucket in any table are candidate
    neighbors (cosine-LSH: P[bit equal] = 1 − θ/π)."""
    planes = _hyperplanes(num_tables, num_planes, dim, seed)
    v = _as_double(vec_col)
    out = df
    for t in range(num_tables):
        bucket = F.lit(0).cast("long")
        for p in range(num_planes):
            plane_lit = F.array(*[F.lit(w) for w in planes[t][p]])
            bit = (dot(v, plane_lit) >= 0).cast("long")
            bucket = bucket + F.shiftleft(bit, p)
        out = out.withColumn(f"bucket_{t}", bucket)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int,
    k: int = 10,
    num_tables: int = 4,
    num_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank over LSH candidates.

    Candidates = corpus rows sharing ≥1 bucket with the query across
    the L tables (union of per-table equi-joins, deduplicated). At
    100 TB the corpus is bucketed once (cheap narrow pass) and each
    query probes L buckets — cost is Σ bucket sizes, not |corpus|.
    May return fewer than ``k`` rows per query (recall < 1 is the
    LSH trade; raise L or lower p for more recall).
    """
    cb = hyperplane_buckets(
        corpus, vec_col=vec_col, dim=dim, num_tables=num_tables,
        num_planes=num_planes, seed=seed,
    )
    qb = hyperplane_buckets(
        queries, vec_col=vec_col, dim=dim, num_tables=num_tables,
        num_planes=num_planes, seed=seed,
    ).select(
        query_id_col,
        F.col(vec_col).alias("__qvec"),
        *[F.col(f"bucket_{t}").alias(f"qb_{t}") for t in range(num_tables)],
    )
    cand = None
    for t in range(num_tables):
        c = cb.join(
            F.broadcast(qb),
            F.col(f"bucket_{t}") == F.col(f"qb_{t}"),
        ).select(query_id_col, id_col, vec_col, "__qvec")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates([query_id_col, id_col]).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cand.withColumn("sim", cosine(vec_col, "__qvec"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def embedding_neardup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    num_tables: int = 6,
    num_planes: int = 14,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) via LSH
    buckets: self-join per table on the bucket id, union, dedup,
    exact-cosine filter. Quadratic only within buckets (and the
    plane count bounds expected bucket size)."""
    b = hyperplane_buckets(
        df, vec_col=vec_col, dim=dim, num_tables=num_tables,
        num_planes=num_planes, seed=seed,
    )
    pairs = None
    for t in range(num_tables):
        left = b.select(
            F.col(id_col).alias("__ida"), F.col(vec_col).alias("__va"),
            F.col(f"bucket_{t}").alias("__bk"),
        )
        right = b.select(
            F.col(id_col).alias("__idb"), F.col(vec_col).alias("__vb"),
            F.col(f"bucket_{t}").alias("__bk"),
        )
        p = left.join(right, "__bk").filter(F.col("__ida") < F.col("__idb")).select(
            "__ida", "__idb", "__va", "__vb"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["__ida", "__idb"])
    return (
        pairs.withColumn("sim", cosine("__va", "__vb"))
        .filter(F.col("sim") >= threshold)
        .select(
            F.col("__ida").alias(f"{id_col}_a"),
            F.col("__idb").alias(f"{id_col}_b"),
            "sim",
        )
    )
