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
# Synthetic REAL-format payload generators (BMP / WAV)
# ---------------------------------------------------------------------------
# The container has no compressed-codec fixtures (PIL/librosa absent),
# but "image decode" does not require one: BMP and WAV are
# struct-parseable containers, so the generators below emit REAL files
# — correct headers, padded pixel rows, RIFF chunk walk — whose
# geometry/audio parameters are CLOSED-FORM in (doc_id, text length).
# The decode kernels then parse the actual bytes, and a DuckDB oracle
# can check the decoded values against the closed form end-to-end.

def _synth_bmp(doc_id: int, text: str) -> bytes:
    """A real 24-bpp BMP: BITMAPFILEHEADER + BITMAPINFOHEADER + padded
    pixel array. width = 1 + doc_id % 31, height = 1 + doc_id % 13
    (the oracle's closed form); pixel bytes cycle the text's md5."""
    import struct

    w = 1 + doc_id % 31
    h = 1 + doc_id % 13
    row = (3 * w + 3) & ~3  # rows pad to 4-byte boundaries
    pix_len = row * h
    seed = hashlib.md5((text or "").encode()).digest()
    pixels = (seed * (pix_len // len(seed) + 1))[:pix_len]
    header = struct.pack("<2sIHHI", b"BM", 54 + pix_len, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pix_len, 2835, 2835, 0, 0
    )
    return header + info + pixels


def _synth_wav(doc_id: int, text: str) -> bytes:
    """A real PCM WAV: RIFF container, fmt chunk (mono 16-bit 16 kHz),
    data chunk of constant-amplitude samples. Closed form:
    n_samples = 1600 + len(text) % 800, amplitude = 100 + doc_id % 900
    — so duration and per-chunk RMS are SQL-expressible exactly (the
    RMS of a constant is that constant, and sqrt of a perfect square
    is exact in IEEE double)."""
    import struct

    import numpy as np

    rate, bits, channels = 16000, 16, 1
    n = 1600 + len(text or "") % 800
    amp = 100 + doc_id % 900
    data = np.full(n, amp, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def synthesize_media_payload(
    df: DataFrame,
    *,
    fmt: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "payload",
) -> DataFrame:
    """Emit a REAL ``fmt`` ∈ {bmp, wav} file per row (mapInPandas,
    Arrow-batched) with parameters closed-form in (id, text length) —
    the fixture side of the real-decode round trip."""
    if fmt not in ("bmp", "wav"):
        raise ValueError(f"unsupported synthetic media format {fmt!r}")
    make = _synth_bmp if fmt == "bmp" else _synth_wav
    schema = T.StructType(
        list(df.schema) + [T.StructField(out_col, T.BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out[out_col] = [
                make(int(i), t)
                for i, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield out

    return df.mapInPandas(batches, schema)


# ---------------------------------------------------------------------------
# Decode / transform kernels (real BMP/WAV parse; deterministic fakes
# for formats whose codecs are absent)
# ---------------------------------------------------------------------------

def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image header parsing: dimensions
    derived from the content hash (stable across runs/engines)."""
    h = hashlib.md5(payload or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def _parse_bmp(b: bytes) -> tuple[int, int, str] | None:
    """Parse a real BITMAPINFOHEADER: (width, height, mode) or None if
    the payload is not a BMP. Negative height encodes top-down row
    order; dimensions are the absolute values."""
    import struct

    if len(b) < 54 or b[:2] != b"BM":
        return None
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    mode = {8: "L", 24: "RGB", 32: "RGBA"}.get(bpp, f"BPP{bpp}")
    return abs(w), abs(h), mode


def _parse_wav(b: bytes):
    """Walk a RIFF/WAVE container: returns (sample_rate, channels,
    bits, samples int16 ndarray) or None if not a PCM WAV."""
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt_chunk, data_chunk = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data_chunk = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt_chunk is None or data_chunk is None or len(fmt_chunk) < 16:
        return None
    _fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
        "<HHIIHH", fmt_chunk, 0
    )
    if bits != 16:
        return None
    samples = np.frombuffer(
        data_chunk[: len(data_chunk) & ~1], dtype="<i2"
    )
    return rate, channels, bits, samples


def decode_image_metadata(
    df: DataFrame, media_col: str = "media", id_cols: list[str] | None = None
) -> DataFrame:
    """Decode image headers → (width, height, mode) per row.

    Decode ladder, per payload: a REAL BMP header parse first
    (struct-unpacked ``biWidth``/``biHeight``/``biBitCount`` from the
    actual bytes — no codec library needed), then ``PIL.Image.open``
    for compressed formats when PIL is importable, else the
    deterministic content-hash stub with mode='STUB' (clearly marked
    per row). Batch shape, schema, and partitioning are the real
    plumbing on every path.
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

        def _decode(b: bytes):
            b = b or b""
            bmp = _parse_bmp(b)
            if bmp is not None:
                return bmp
            if have_pil:  # pragma: no cover
                from PIL import Image

                img = Image.open(io.BytesIO(b))
                return img.size[0], img.size[1], img.mode
            w, h = _fake_dims(b)
            return w, h, "STUB"

        for pdf in it:
            decoded = [_decode(m["payload"]) for m in pdf[media_col]]
            out = pdf[ids].copy()
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["mode"] = [d[2] for d in decoded]
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
    """Audio feature extraction: per-payload duration and per-chunk
    RMS energy profile.

    Decode ladder, per payload: a REAL RIFF/WAVE parse first (chunk
    walk with ``struct``, int16 PCM samples via one ``frombuffer`` —
    duration = frames/rate from the ACTUAL fmt chunk, RMS over the
    actual samples), else the byte-level deterministic proxy (same
    schema and batch flow; a compressed-codec path — librosa/
    soundfile — would slot in between). Output: id cols +
    ``duration_sec`` (double) + ``rms_profile`` (array<double>, one
    value per ``chunk_bytes``-byte chunk, ≤16 chunks).
    """
    ids = id_cols or [c for c in df.columns if c != media_col]
    schema = T.StructType(
        [df.schema[c] for c in ids]
        + [
            T.StructField("duration_sec", T.DoubleType()),
            T.StructField("rms_profile", T.ArrayType(T.DoubleType())),
        ]
    )
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def _chunk_rms(x: "np.ndarray", per: int) -> list[float]:
            if len(x) == 0:
                return []
            x = x[: per * 16].astype(np.float64)
            x *= x
            starts = np.arange(0, len(x), per)
            lens = np.diff(np.append(starts, len(x)))
            return [
                float(v)
                for v in np.sqrt(np.add.reduceat(x, starts) / lens)
            ]

        for pdf in it:
            durs, profiles = [], []
            for m in pdf[media_col]:
                b = m["payload"] or b""
                wav = _parse_wav(b)
                if wav is not None:
                    rate, channels, _bits, samples = wav
                    frames = len(samples) // max(channels, 1)
                    durs.append(frames / float(rate))
                    # chunk over samples: chunk_bytes of 16-bit PCM
                    profiles.append(
                        _chunk_rms(samples, max(chunk_bytes // 2, 1))
                    )
                else:
                    # byte-proxy fallback: 16-bit mono 16 kHz duration
                    # estimate, RMS of raw bytes per chunk
                    durs.append(len(b) / (2.0 * 16000.0))
                    head = np.frombuffer(
                        b[: chunk_bytes * 16], dtype=np.uint8
                    )
                    profiles.append(_chunk_rms(head, chunk_bytes))
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
