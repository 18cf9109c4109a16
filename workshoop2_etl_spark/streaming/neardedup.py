"""Near-dedup ON ARRIVAL: the streaming composition of the
incremental LSH index (operators/dedup.py ``lsh_index_refresh``) —
every micro-batch of arriving documents is signed, banded, probed
against the persisted index, and folded into it, so candidate pairs
surface WITH the data instead of in a nightly recompute.

This is the production ingestion story at 100 TB: the corpus index
(the ``(id, band, bh)`` banded frame, parquet) grows append-only;
per batch the work is delta-sized (signatures for the batch alone,
Σ (delta-in-bucket · bucket) candidate probing); and the emission
contract is exact and non-duplicating:

    every candidate pair is emitted EXACTLY ONCE — in the batch where
    its LATER member arrives —

because a pair needs ≥1 member in the probing delta, and once both
members are in the index neither is ever a delta again. Union over
batches therefore equals the from-scratch batch pair set (the
maintenance identity of ``lsh_index_refresh``, applied inductively;
proven over a multi-batch stream in tests/test_streaming_neardedup.py).

Crash semantics: the pairs/index appends here are plain parquet
appends — at-least-once under a mid-batch crash replay. The
exactly-once production variant routes both writes through
``sources.versioned.foreach_batch_versioned_sink`` (batch id recorded
in the manifest, replays become no-ops); this module keeps the
data-path logic separate from the commit protocol deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException


def near_dedup_on_arrival(
    stream_docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    timeout_sec: int = 300,
) -> None:
    """Drain the document stream with ``Trigger.AvailableNow``,
    folding each micro-batch into the persisted LSH index and
    appending the delta-introduced candidate pairs.

    ``index_dir`` holds the banded index (append-only parquet);
    ``pairs_dir`` accumulates one row per emitted candidate pair.
    Both start empty on first activation; a later activation resumes
    from the checkpoint and the index picks up where it left off.
    """
    from workshoop2_etl_spark.operators.dedup import (
        lsh_banded,
        lsh_index_refresh,
        minhash_signatures,
    )

    spark = stream_docs.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        banded_delta = lsh_banded(
            minhash_signatures(
                batch_df.select(id_col, text_col),
                id_col,
                text_col,
                num_hashes=num_hashes,
            ),
            id_col,
            num_hashes=num_hashes,
            bands=bands,
        ).localCheckpoint(eager=True)
        # Index discovery must work on ANY Hadoop-compatible store
        # (HDFS/S3/local), so probe with a schema-pinned read and
        # catch PATH_NOT_FOUND instead of walking the driver's local
        # filesystem (a local listdir silently sees nothing on an
        # object store). The explicit schema makes an
        # existing-but-empty dir read as an empty frame (no footer
        # inference) and skips a second footer read on the hot path.
        try:
            # load() resolves the path eagerly — a missing dir raises
            # PATH_NOT_FOUND right here, on any filesystem scheme
            banded_base = spark.read.schema(banded_delta.schema).parquet(
                index_dir
            )
        except AnalysisException:
            banded_base = spark.createDataFrame(
                [], banded_delta.schema
            )
        _, new_pairs = lsh_index_refresh(
            banded_base, banded_delta, id_col
        )
        new_pairs.write.mode("append").parquet(pairs_dir)
        banded_delta.write.mode("append").parquet(index_dir)

    q = (
        stream_docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    from workshoop2_etl_spark.streaming.events import await_activation

    await_activation(q, timeout_sec, "near-dedup-on-arrival")
