"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched Pandas UDFs.

Design (the 100 TB pattern):

- A media column is a **struct**: ``payload binary`` + typed metadata
  (``media_type``, ``format``, byte length, content hash). Payloads
  stay opaque to Catalyst — filters/joins run on the cheap metadata
  columns, and column pruning means a query that never touches
  ``payload`` never reads those bytes from parquet.
- Decode / resize / feature-extract / frame-sample run as
  ``mapInPandas`` Pandas UDFs — Arrow ships columnar batches to
  Python, the UDF vectorizes over the batch, and the operation
  parallelizes per partition with no driver involvement.
- **Codec stubs**: the real decoders (PIL / librosa / av) are not in
  this container. Each operator tries the real import and otherwise
  uses a clearly-marked deterministic fake derived from the payload
  hash — the Spark-side plumbing (schemas, batch iteration,
  partitioning) is identical either way, so swapping the fake for the
  real codec touches one function.
- Payload-dependent outputs (hash, byte length, fake dims) are
  deterministic, so the metadata path is DuckDB-oracle-checkable.

The reference has no media processing; this extends the engine the
way its README's "cloud storage drive" exports hint the corpus would
grow (binary artifacts beside tabular data).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Media payload struct: opaque bytes + queryable metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|wav|mp4|...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def attach_media(
    df: DataFrame,
    payload_col: str,
    *,
    media_type: str,
    fmt: str,
    out_col: str = "media",
) -> DataFrame:
    """Wrap a raw ``binary`` column into the typed media struct.

    Metadata (length, md5) is computed JVM-side — no Python touches
    the bytes. Filters on ``media.n_bytes`` / ``media.content_md5``
    stay in codegen and benefit from parquet column pruning.
    """
    p = F.col(payload_col)
    return df.withColumn(
        out_col,
        F.struct(
            p.alias("payload"),
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("content_md5"),
        ),
    )


def media_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Project the metadata (payload pruned — a parquet reader serving
    this query never reads the bytes)."""
    m = F.col(media_col)
    return df.select(
        *[c for c in df.columns if c != media_col],
        m["media_type"].alias("media_type"),
        m["format"].alias("format"),
        m["n_bytes"].alias("n_bytes"),
        m["content_md5"].alias("content_md5"),
    )


# ---------------------------------------------------------------------------
# Decode / transform stubs (deterministic fakes; real codecs absent)
# ---------------------------------------------------------------------------

def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image header parsing: dimensions
    derived from the content hash (stable across runs/engines)."""
    h = hashlib.md5(payload or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def decode_image_metadata(
    df: DataFrame, media_col: str = "media", id_cols: list[str] | None = None
) -> DataFrame:
    """Decode image headers → (width, height, mode) per row.

    Real path: ``PIL.Image.open`` per payload inside the Arrow batch.
    STUB path (this container): deterministic fake dims from the
    content hash. Batch shape, schema, and partitioning are the real
    plumbing either way.
    """
    ids = id_cols or [c for c in df.columns if c != media_col]
    schema = T.StructType(
        [df.schema[c] for c in ids]
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mode", T.StringType()),
        ]
    )
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            payloads = pdf[media_col].map(lambda m: m["payload"])
            if have_pil:  # pragma: no cover

                def _open(b):
                    from PIL import Image

                    img = Image.open(io.BytesIO(b))  # one open per payload
                    return img.size[0], img.size[1], img.mode

                decoded = payloads.map(_open)
                dims = decoded.map(lambda t: (t[0], t[1]))
                modes = decoded.map(lambda t: t[2])
            else:
                dims = payloads.map(_fake_dims)
                modes = "STUB"
            out = pdf[ids].copy()
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            out["mode"] = modes
            yield out

    return df.mapInPandas(batches, schema)


def resize_images(
    df: DataFrame,
    target: tuple[int, int],
    media_col: str = "media",
) -> DataFrame:
    """Resize every image payload to ``target`` (real: PIL thumbnail;
    stub: truncate/pad the byte stream to a deterministic size so the
    output schema and batch flow are exercised end-to-end). Output
    replaces the payload inside the struct and restamps metadata."""
    w, h = target
    fake_len = w * h  # stand-in for an encoded thumbnail's size
    out_schema = df.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def _resize(m):
                b = (m["payload"] or b"")[:fake_len].ljust(fake_len, b"\0")
                return {
                    "payload": b,
                    "media_type": m["media_type"],
                    "format": m["format"],
                    "n_bytes": len(b),
                    "content_md5": hashlib.md5(b).hexdigest(),
                }

            pdf = pdf.copy()
            pdf[media_col] = pdf[media_col].map(_resize)
            yield pdf

    return df.mapInPandas(batches, out_schema)


def extract_embedding(
    df: DataFrame,
    media_col: str = "media",
    *,
    dim: int = 16,
    out_col: str = "embedding",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Feature-extract each payload into a ``dim``-float embedding.

    Real path: a vision/audio encoder over the Arrow batch (the batch
    interface is exactly what torch/onnx batch inference wants). STUB:
    hash-seeded pseudo-random unit vector — deterministic per content,
    so downstream ANN tests are reproducible.
    """
    ids = id_cols or [c for c in df.columns if c != media_col]
    schema = T.StructType(
        [df.schema[c] for c in ids]
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def _embed(m):
                seed = hashlib.md5(m["payload"] or b"").digest()
                # xorshift over the hash bytes — cheap, deterministic
                vals = []
                state = int.from_bytes(seed[:8], "big") or 1
                for _ in range(dim):
                    state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
                    state ^= state >> 7
                    state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
                    vals.append((state % 2_000_001) / 1_000_000.0 - 1.0)
                norm = sum(v * v for v in vals) ** 0.5 or 1.0
                return [float(v / norm) for v in vals]

            out = pdf[ids].copy()
            out[out_col] = pdf[media_col].map(_embed)
            yield out

    return df.mapInPandas(batches, schema)


def extract_audio_features(
    df: DataFrame,
    media_col: str = "media",
    *,
    chunk_bytes: int = 4096,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Audio feature extraction: per-payload duration estimate and
    per-chunk RMS energy profile.

    Real path: ``librosa``/``soundfile`` decode inside the Arrow
    batch. STUB path (this container): byte-level proxies —
    deterministic per content, same schema and batch flow. Output:
    id cols + ``duration_sec`` (float) + ``rms_profile``
    (array<float>, one value per chunk, ≤16 chunks).
    """
    ids = id_cols or [c for c in df.columns if c != media_col]
    schema = T.StructType(
        [df.schema[c] for c in ids]
        + [
            T.StructField("duration_sec", T.FloatType()),
            T.StructField("rms_profile", T.ArrayType(T.FloatType())),
        ]
    )
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            durs, profiles = [], []
            for m in pdf[media_col]:
                b = m["payload"] or b""
                # STUB path only for now: byte-level proxies. When a
                # real codec lands (librosa/soundfile), decode here —
                # the schema and batch flow stay identical. (The stub
                # must remain the fallback, never a crash, when the
                # library is merely importable.)
                # 16-bit mono 16 kHz proxy duration; RMS per chunk,
                # vectorized: one frombuffer + one reduceat per doc
                # instead of a per-byte Python loop.
                durs.append(len(b) / (2.0 * 16000.0))
                head = b[: chunk_bytes * 16]
                if head:
                    sq = np.frombuffer(head, dtype=np.uint8).astype(np.float64)
                    sq *= sq
                    starts = np.arange(0, len(sq), chunk_bytes)
                    lens = np.diff(np.append(starts, len(sq)))
                    rms = np.sqrt(np.add.reduceat(sq, starts) / lens)
                    profiles.append([float(p) for p in rms])
                else:
                    profiles.append([])
            out = pdf[ids].copy()
            out["duration_sec"] = [float(d) for d in durs]
            out["rms_profile"] = profiles
            yield out

    return df.mapInPandas(batches, schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    *,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Frame-sample video payloads: one output row per sampled frame
    (real: demux + keyframe decode via ``av``; stub: slice the byte
    stream every ``every_n_bytes``). Explodes rows — the output is a
    frame table keyed by (id, frame_no), the shape a caption/label
    pipeline consumes."""
    ids = id_cols or [c for c in df.columns if c != media_col]
    schema = T.StructType(
        [df.schema[c] for c in ids]
        + [
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_md5", T.StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            # Column-wise explode: compute per-row frame counts, then
            # replicate the id columns with one positional take —
            # the only per-frame Python is the md5 itself (which the
            # real ``av`` keyframe decode would be per-frame anyway).
            payloads = [m["payload"] or b"" for m in pdf[media_col]]
            counts = np.clip(
                np.array([len(p) for p in payloads], dtype=np.int64)
                // every_n_bytes,
                1,
                max_frames,
            )
            row_idx = np.repeat(np.arange(len(payloads)), counts)
            frame_nos = np.concatenate(
                [np.arange(n) for n in counts]
            ) if len(counts) else np.array([], dtype=int)
            out = pdf[ids].iloc[row_idx].reset_index(drop=True)
            out["frame_no"] = frame_nos.astype("int32")
            out["frame_md5"] = [
                hashlib.md5(
                    payloads[r][i * every_n_bytes : (i + 1) * every_n_bytes]
                ).hexdigest()
                for r, i in zip(row_idx, frame_nos)
            ]
            yield out

    return df.mapInPandas(batches, schema)
