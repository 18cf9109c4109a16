"""WAT metadata-record parsing — CommonCrawl's per-capture JSON
sidecar (the third artifact next to ``.warc`` responses and ``.wet``
conversions, completing the chapter: WARC X185, WET X191, CDX X202).
Each WAT record is a WARC ``metadata`` record whose payload is one
JSON "Envelope" describing the original response: its WARC headers,
HTTP response message, and — for HTML — the extracted page metadata
(``Head.Title``, ``Links`` with href/anchor/path). Real link-graph
pipelines consume WAT instead of re-parsing 100 TB of HTML: the JSON
is ~10× smaller than the pages it describes and already lists every
outlink.

Design:

- **Ingest is the existing WARC walk.** A ``.wat`` / ``.wat.gz`` file
  IS a WARC file (metadata records, ``Content-Type:
  application/json``), so :func:`operators.warc.parse_warc_blobs`
  splits and frames it unchanged — one kernel for all four formats.
- **JSON decode stays JVM-side.** Unlike HTML (which needs a Python
  parser kernel), the WAT payload is JSON with a published layout, so
  :func:`wat_links` uses ``from_json`` with an explicit nested schema
  — whole-stage-codegen column work, no Python in the hot path, and
  Catalyst prunes the struct to the fields actually selected.
  Malformed JSON yields a NULL struct (PERMISSIVE), never an error.
- **At-scale shape.** File blob → records is a pure map;
  ``from_json`` + ``explode`` fan links out inside the task. No
  shuffle anywhere until the caller aggregates.

Fixture synthesis (:func:`wat_envelope_json`) builds the envelope
with ``to_json(struct(...))`` — also JVM-side — so the round trip
proves the schema against the layout CommonCrawl publishes.

The reference has no crawl handling; SURVEY §2.9 X205.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Explicit schema for the WAT Envelope — only the fields the engine
#: consumes; ``from_json`` ignores everything else in the record
#: (Container offsets, header echoes), which is the pruning story:
#: Jackson never materializes unrequested subtrees.
WAT_LINK_SCHEMA = T.StructType(
    [
        T.StructField(
            "Envelope",
            T.StructType(
                [
                    T.StructField(
                        "WARC-Header-Metadata",
                        T.StructType(
                            [
                                T.StructField("WARC-Type", T.StringType()),
                                T.StructField(
                                    "WARC-Target-URI", T.StringType()
                                ),
                            ]
                        ),
                    ),
                    T.StructField(
                        "Payload-Metadata",
                        T.StructType(
                            [
                                T.StructField(
                                    "HTTP-Response-Metadata",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "Response-Message",
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "Status",
                                                            T.StringType(),
                                                        )
                                                    ]
                                                ),
                                            ),
                                            T.StructField(
                                                "HTML-Metadata",
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "Head",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "Title",
                                                                        T.StringType(),
                                                                    ),
                                                                    T.StructField(
                                                                        "Metas",
                                                                        T.ArrayType(
                                                                            T.StructType(
                                                                                [
                                                                                    T.StructField(
                                                                                        "name",
                                                                                        T.StringType(),
                                                                                    ),
                                                                                    T.StructField(
                                                                                        "content",
                                                                                        T.StringType(),
                                                                                    ),
                                                                                ]
                                                                            )
                                                                        ),
                                                                    ),
                                                                ]
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "Links",
                                                            T.ArrayType(
                                                                T.StructType(
                                                                    [
                                                                        T.StructField(
                                                                            "path",
                                                                            T.StringType(),
                                                                        ),
                                                                        T.StructField(
                                                                            "url",
                                                                            T.StringType(),
                                                                        ),
                                                                        T.StructField(
                                                                            "text",
                                                                            T.StringType(),
                                                                        ),
                                                                    ]
                                                                )
                                                            ),
                                                        ),
                                                    ]
                                                ),
                                            ),
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        )
    ]
)


def wat_envelope_json(
    target_uri: Column,
    links: Column,
    *,
    title: Column | None = None,
    status: Column | None = None,
    metas: Column | None = None,
) -> Column:
    """Build one WAT Envelope JSON string (the public CommonCrawl
    layout) from columns: ``links`` is an
    ``array<struct<path,url,text>>``; ``metas`` (optional) an
    ``array<struct<name,content>>`` for ``Head.Metas``. Pure
    ``to_json(struct(...))`` — the fixture synthesizer for the WAT
    entries, and the proof the parse schema round-trips the
    published shape."""
    head = F.struct(
        (title if title is not None else F.lit(None).cast("string")).alias(
            "Title"
        ),
        (
            metas
            if metas is not None
            else F.lit(None).cast("array<struct<name:string,content:string>>")
        ).alias("Metas"),
    )
    envelope = F.struct(
        F.struct(
            F.lit("response").alias("WARC-Type"),
            target_uri.alias("WARC-Target-URI"),
        ).alias("WARC-Header-Metadata"),
        F.struct(
            F.struct(
                F.struct(
                    (
                        status if status is not None else F.lit("200")
                    ).alias("Status")
                ).alias("Response-Message"),
                F.struct(
                    head.alias("Head"), links.alias("Links")
                ).alias("HTML-Metadata"),
            ).alias("HTTP-Response-Metadata"),
        ).alias("Payload-Metadata"),
    )
    return F.to_json(F.struct(envelope.alias("Envelope")))


def wat_link(path: str, url: Column, text: Column | None = None) -> Column:
    """One entry of a WAT ``Links`` array: ``path`` is the WAT
    provenance tag (``A@/href`` for anchors, ``IMG@/src`` for images,
    ``LINK@/href`` for rel links, …)."""
    return F.struct(
        F.lit(path).alias("path"),
        url.alias("url"),
        (text if text is not None else F.lit(None).cast("string")).alias(
            "text"
        ),
    )


def wat_links(
    parsed: DataFrame,
    *,
    id_cols: list[str] | None = None,
    link_paths: tuple[str, ...] = ("A@/href",),
) -> DataFrame:
    """Rows of :func:`operators.warc.parse_warc_blobs` output (a
    ``.wat`` file walks through the SAME WARC framing — metadata
    records with JSON payloads) → one row per outlink:
    ``id_cols…, page_uri, page_status, page_title,
    page_description`` (the first ``<meta name="description">``
    content, NULL when absent — the page-metadata quality signal),
    ``href, anchor_text``.

    ``link_paths`` selects which WAT link provenances count as edges
    (default: anchors only — WAT also lists IMG/LINK/SCRIPT src
    references, which would poison a navigation graph). The page URI
    comes from the envelope's OWN ``WARC-Header-Metadata`` (the
    original response's headers as the WAT generator recorded them),
    not the metadata record's outer headers — the two agree in real
    WAT files, and using the envelope exercises the JSON path.

    Scale shape: ``from_json`` with :data:`WAT_LINK_SCHEMA` is
    JVM-side and PERMISSIVE — malformed JSON, a non-JSON payload, or
    an envelope without ``HTML-Metadata`` yields NULLs and the
    explode drops the row; nothing raises. No shuffle: filter +
    from_json + explode are all narrow.

    ``id_cols=None`` follows the house convention: every input
    column that is NOT one of ``parse_warc_blobs``' record fields
    carries through (file provenance columns survive by default);
    pass an explicit list (or ``[]``) to override."""
    record_cols = {
        "warc_type",
        "target_uri",
        "http_status",
        "content_type",
        "payload",
        "location",
        "record_id",
        "refers_to",
        "payload_digest",
    }
    ids = (
        id_cols
        if id_cols is not None
        else [c for c in parsed.columns if c not in record_cols]
    )
    env = F.from_json(
        F.col("payload").cast("string"), WAT_LINK_SCHEMA
    )["Envelope"]
    http = env["Payload-Metadata"]["HTTP-Response-Metadata"]
    rows = (
        parsed.where(
            (F.col("warc_type") == "metadata")
            & F.col("content_type").startswith("application/json")
        )
        .select(
            *ids,
            env["WARC-Header-Metadata"]["WARC-Target-URI"].alias(
                "page_uri"
            ),
            http["Response-Message"]["Status"]
            .try_cast("int")
            .alias("page_status"),
            http["HTML-Metadata"]["Head"]["Title"].alias("page_title"),
            # first <meta name="description"> — F.get is NULL-total
            # out of bounds (element_at raises under ANSI)
            F.get(
                F.filter(
                    http["HTML-Metadata"]["Head"]["Metas"],
                    lambda m: F.lower(m["name"]) == "description",
                ),
                0,
            )["content"].alias("page_description"),
            F.explode(http["HTML-Metadata"]["Links"]).alias("__l"),
        )
        .where(F.col("__l")["path"].isin(*link_paths))
    )
    return rows.select(
        *ids,
        "page_uri",
        "page_status",
        "page_title",
        "page_description",
        F.col("__l")["url"].alias("href"),
        F.col("__l")["text"].alias("anchor_text"),
    )


def synthesize_wat_record(doc_id: int, envelope_json: str) -> bytes:
    """Wrap one envelope JSON string as a WARC/1.0 ``metadata``
    record — the WAT file layout (CommonCrawl ships
    ``*.warc.wat.gz``: gzip members of exactly these records). The
    target URI mirrors the envelope's (as real WAT generators do);
    framing is byte-exact Content-Length, same walk as every other
    record in the chapter."""
    payload = envelope_json.encode("utf-8")
    warc_headers = (
        "WARC/1.0\r\n"
        "WARC-Type: metadata\r\n"
        f"WARC-Record-ID: <urn:uuid:wat-{doc_id:012d}>\r\n"
        f"WARC-Target-URI: http://www.site.com/dir/page{doc_id}\r\n"
        f"WARC-Refers-To: <urn:uuid:doc-{doc_id:012d}>\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "Content-Type: application/json\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("ascii")
    return warc_headers + payload + b"\r\n\r\n"
