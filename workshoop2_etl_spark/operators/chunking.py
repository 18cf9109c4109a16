"""Document chunking and sequence packing for training-data pipelines.

The two shaping steps between a cleaned corpus and a token pipeline:

- :func:`chunk_documents` — split each document into consecutive
  ``max_tokens``-token chunks (context-window splitting). One narrow
  projection + explode: token array → slice per chunk index — no
  Python, no shuffle.
- :func:`pack_chunks` — assign chunks to fixed-budget bins per group
  (context-window packing): a running token total over a
  deterministic order, bin = floor(cumsum_exclusive / budget). This
  is the streaming first-fit approximation of bin packing — each bin
  holds consecutive chunks until the budget spills — computed with
  ONE window (shuffle on the group key only), versus the exact
  NP-hard packing nobody runs at corpus scale.

Both are pure built-ins, deterministic, and ANSI-SQL-expressible, so
they carry DuckDB oracle twins (the whole path from raw corpus to
packed sequences stays under the correctness gate).

The reference has no chunking (it is a BI/ETL project); these extend
the engine for the 100 TB pretraining-corpus mandate the driver sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Split each document into whitespace-token chunks of at most
    ``max_tokens`` tokens. ``stride`` is the distance between chunk
    STARTS — the default (``None`` → ``max_tokens``) gives
    consecutive non-overlapping chunks; ``stride < max_tokens``
    gives the overlapping sliding windows retrieval indexing uses
    (adjacent chunks share ``max_tokens - stride`` tokens, so an
    answer spanning a boundary is wholly inside some window). One
    window starts at every multiple of ``stride`` below the token
    count — the trailing windows may be short.

    Output: ``{id_col}``, ``chunk_no`` (0-based), ``chunk_text``,
    ``n_tokens``. Documents with no tokens yield no rows (nothing to
    train on). The token array is projected once per row; each chunk
    is a ``slice`` + ``array_join`` over it — the explode multiplies
    rows, not tokenization work.
    """
    stride = max_tokens if stride is None else stride
    if stride < 1 or max_tokens < 1:
        raise ValueError(
            f"max_tokens and stride must be >= 1, got {max_tokens}, {stride}"
        )
    if stride > max_tokens:
        # a start-distance beyond the window length would leave
        # `stride - max_tokens` tokens between windows in NO chunk,
        # silently contradicting the coverage claim above
        raise ValueError(
            f"stride ({stride}) > max_tokens ({max_tokens}) would skip "
            "tokens between windows; use stride <= max_tokens"
        )
    toks = df.withColumn(
        "__toks",
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""),
    ).filter(F.size("__toks") > 0)
    chunks = toks.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(__toks) / {stride}) as int) - 1),"
                f" i -> slice(__toks, i * {stride} + 1, {max_tokens}))"
            )
        ).alias("chunk_no", "__chunk"),
    )
    return chunks.select(
        id_col,
        "chunk_no",
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").alias("n_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    id_col: str,
    *,
    tokens_col: str = "n_tokens",
    order_cols: list[str] | None = None,
    budget: int = 512,
    group_cols: list[str] | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """Assign chunks to fixed-token-budget bins (sequence packing).

    Bin id = ``floor(exclusive-running-total / budget)`` over a
    deterministic order — consecutive chunks fill a bin until the
    budget would spill, then the next bin starts (first-fit on a
    stream). A bin's total may exceed ``budget`` by at most one
    chunk's tail, exactly like real packers that then truncate or pad;
    callers needing hard caps chunk at ``max_tokens ≤ budget`` first.

    ``group_cols`` scopes packing (e.g. per language, so no bin mixes
    languages) and is the ONLY shuffle key: one window per group, no
    driver involvement, no iteration. WITHOUT ``group_cols`` the
    window is a single global sort partition — fine for tests and
    small exports, wrong at corpus scale, so an empty grouping raises
    unless ``allow_global=True`` explicitly acknowledges the
    single-partition sort. Output: input columns + ``bin_id`` (long,
    0-based per group).
    """
    order = order_cols if order_cols is not None else [id_col, "chunk_no"]
    parts = group_cols or []
    if not parts and not allow_global:
        raise ValueError(
            "pack_chunks without group_cols sorts the whole corpus in a "
            "single window partition; pass group_cols (language, shard, "
            "date, ...) or allow_global=True for a small export"
        )
    w = (
        Window.partitionBy(*parts).orderBy(*order)
        if parts
        else Window.partitionBy(F.lit(0)).orderBy(*order)
    )
    running_excl = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return chunks.withColumn(
        "bin_id", F.floor(running_excl / F.lit(budget)).cast("long")
    )
