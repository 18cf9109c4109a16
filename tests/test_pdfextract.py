"""PDF text-extraction rung (round 13): round trips through the
closed-form writer, hand-crafted spec features (TJ arrays, hex
strings, ' show, ToUnicode CMaps, WinAnsi high bytes, uncompressed
streams, multi-section xref), PDF 1.5 xref/object streams (+PNG
predictors), and the refusal ladder (encryption, hybrid /XRefStm,
Type0 fonts, non-Flate filters)."""

from __future__ import annotations

import zlib

import pytest

from workshoop2_etl_spark.operators.pdfextract import (
    build_pdf,
    extract_pdf_text,
    pdf_extract,
    pdf_synthesize,
)


def _wrap_objects(objects: dict[int, bytes], trailer_extra: str = "") -> bytes:
    """Assemble numbered objects into a classic-xref PDF (test rig)."""
    out = bytearray(b"%PDF-1.7\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    size = max(objects) + 1
    out += f"xref\n0 {size}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, size):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R {trailer_extra}>>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _one_page(content: bytes, font_body: bytes | None = None) -> bytes:
    font = font_body or (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    return _wrap_objects(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: (
                b"<< /Type /Page /Parent 2 0 R "
                b"/Resources << /Font << /F1 5 0 R >> >> "
                b"/Contents 4 0 R >>"
            ),
            4: (
                f"<< /Length {len(content)} >>".encode()
                + b"\nstream\n"
                + content
                + b"\nendstream"
            ),
            5: font,
        }
    )


# ----------------------------------------------------------- round trips


@pytest.mark.parametrize(
    "text",
    [
        "hello world",
        "line one\nline two\nline three",
        "",
        "a\n",
        "escape (parens) and \\backslash\\ and )close(",
        "latin-1: café naïve ñ",
        "\n".join(f"row {i} of a long document" for i in range(137)),
    ],
)
def test_build_extract_identity(text):
    assert extract_pdf_text(build_pdf(text)) == text


def test_build_extract_identity_uncompressed_and_pagination():
    text = "\n".join(f"l{i}" for i in range(85))
    blob = build_pdf(text, lines_per_page=10, compress=False)
    assert b"FlateDecode" not in blob
    assert extract_pdf_text(blob) == text
    # 85 lines / 10 per page = 9 pages in the page tree
    assert blob.count(b"/Type /Page ") == 9


# --------------------------------------------------- hand-crafted features


def test_tj_array_hex_string_and_quote_show():
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Hel) -120 <6c6f>] TJ "
        b"(, world) Tj "
        b"(second line) ' "
        b"ET"
    )
    assert _extract(content) == "Hello, world\nsecond line"


def _extract(content: bytes, font_body: bytes | None = None) -> str:
    return extract_pdf_text(_one_page(content, font_body))


def test_octal_escapes_and_winansi_high_bytes():
    # \200 = 0x80 = euro sign in WinAnsiEncoding; \251 = 0xA9 = (c)
    content = b"BT /F1 12 Tf 72 720 Td (price: 5\\200 \\251me) Tj ET"
    assert _extract(content) == "price: 5€ ©me"


def test_tounicode_cmap_overrides_winansi():
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange <00> <ff> endcodespacerange\n"
        b"2 beginbfchar\n<41> <0391>\n<42> <03b2>\nendbfchar\n"
        b"1 beginbfrange\n<61> <63> <0061>\nendbfrange\n"
        b"endcmap end\n"
    )
    font = _wrap_objects(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: (
                b"<< /Type /Page /Parent 2 0 R "
                b"/Resources << /Font << /F1 5 0 R >> >> "
                b"/Contents 4 0 R >>"
            ),
            4: (
                b"<< /Length 40 >>\nstream\n"
                b"BT /F1 12 Tf 72 720 Td (ABabc) Tj ET\n  \nendstream"
            ),
            5: (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /X "
                b"/ToUnicode 6 0 R >>"
            ),
            6: (
                f"<< /Length {len(cmap)} >>".encode()
                + b"\nstream\n" + cmap + b"\nendstream"
            ),
        }
    )
    # A->GREEK ALPHA, B->beta via bfchar; a..c via bfrange base
    assert extract_pdf_text(font) == "Αβabc"


def test_indirect_length_and_content_array():
    content1 = b"BT /F1 12 Tf 72 720 Td (part one) Tj"
    content2 = b"0 -14 Td (part two) Tj ET"
    blob = _wrap_objects(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: (
                b"<< /Type /Page /Parent 2 0 R "
                b"/Resources << /Font << /F1 7 0 R >> >> "
                b"/Contents [4 0 R 5 0 R] >>"
            ),
            4: (
                b"<< /Length 6 0 R >>\nstream\n" + content1 + b"\nendstream"
            ),
            5: (
                f"<< /Length {len(content2)} >>".encode()
                + b"\nstream\n" + content2 + b"\nendstream"
            ),
            6: str(len(content1)).encode(),
            7: (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding /WinAnsiEncoding >>"
            ),
        }
    )
    assert extract_pdf_text(blob) == "part one\npart two"


def test_incremental_update_prev_chain():
    """An appended xref section with /Prev: the newest offsets win."""
    base = build_pdf("original text")
    # append a replacement content stream for object 4 (page 1 content)
    new_content = zlib.compress(
        b"BT /F1 12 Tf 72 720 Td (updated text) Tj ET"
    )
    obj = (
        f"4 0 obj\n<< /Length {len(new_content)} /Filter /FlateDecode >>"
        .encode()
        + b"\nstream\n" + new_content + b"\nendstream\nendobj\n"
    )
    prev_xref_at = int(base.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
    out = bytearray(base)
    new_obj_at = len(out)
    out += obj
    xref_at = len(out)
    out += (
        f"xref\n4 1\n{new_obj_at:010d} 00000 n \ntrailer\n"
        f"<< /Size 6 /Root 1 0 R /Prev {prev_xref_at} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    assert extract_pdf_text(bytes(out)) == "updated text"


def test_free_entry_shadows_older_section():
    """A newer section's 'f' (free) entry deletes the object — an
    older /Prev section's 'n' entry must not resurrect it (§7.5.4)."""
    base = build_pdf("x")
    prev_xref_at = int(base.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
    out = bytearray(base)
    xref_at = len(out)
    # free object 1 (the catalog) in a newer incremental section
    out += (
        f"xref\n1 1\n0000000000 65535 f \ntrailer\n"
        f"<< /Size 6 /Root 1 0 R /Prev {prev_xref_at} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    with pytest.raises(ValueError, match="object 1 not in xref"):
        extract_pdf_text(bytes(out))


# ------------------------------------------------- PDF 1.5 xref streams


@pytest.mark.parametrize(
    "text",
    [
        "hello xref stream",
        "multi\npage\n" + "\n".join(f"row {i}" for i in range(90)),
        "",
    ],
)
def test_xref_stream_objstm_roundtrip(text):
    """`xref_mode='stream'`: /XRef stream (+PNG-Up predictor) and
    /ObjStm-packed catalog/pages/font parse back to the same text."""
    blob = build_pdf(text, lines_per_page=25, xref_mode="stream")
    assert b"/ObjStm" in blob and b"/XRef" in blob and b"trailer" not in blob
    assert extract_pdf_text(blob) == text


def test_xref_stream_index_subsections_and_no_type_column():
    """Hand-built /XRef stream: split /Index subsections, w0=0 (type
    column absent → defaults to type 1), no predictor."""
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> "
            b"/Contents 4 0 R >>"
        ),
        4: (
            b"<< /Length "
            + str(len(b"BT /F1 12 Tf 72 720 Td (split) Tj ET")).encode()
            + b" >>\nstream\nBT /F1 12 Tf 72 720 Td (split) Tj ET\nendstream"
        ),
        5: (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"
        ),
    }
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    rows = b"".join(
        offsets[n].to_bytes(3, "big") + b"\x00" for n in (1, 2, 3, 4, 5)
    ) + xref_at.to_bytes(3, "big") + b"\x00"
    payload = zlib.compress(rows)
    out += (
        f"6 0 obj\n<< /Type /XRef /Size 7 /W [0 3 1] "
        f"/Index [1 3 4 3] /Root 1 0 R /Filter /FlateDecode "
        f"/Length {len(payload)} >>\nstream\n"
    ).encode() + payload + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    assert extract_pdf_text(bytes(out)) == "split"


def test_xref_stream_free_entry_shadows_prev():
    """Type-0 (free) rows in a newer xref stream delete objects from
    the /Prev chain — same §7.5.4 rule as classic tables."""
    base = build_pdf("stale", xref_mode="stream")
    prev_at = int(base.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
    out = bytearray(base)
    xref_at = len(out)
    # one row: object 1 (catalog, packed in the ObjStm) is now free
    rows = bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
    payload = zlib.compress(rows)
    out += (
        f"9 0 obj\n<< /Type /XRef /Size 10 /W [1 4 2] /Index [1 1] "
        f"/Root 1 0 R /Prev {prev_at} /Filter /FlateDecode "
        f"/Length {len(payload)} >>\nstream\n"
    ).encode() + payload + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    with pytest.raises(ValueError, match="not in xref"):
        extract_pdf_text(bytes(out))


def test_predictor_variants_roundtrip():
    """_unpredict inverts every PNG filter type and TIFF predictor 2."""
    from workshoop2_etl_spark.operators.pdfextract import _unpredict

    rowlen, nrows = 7, 9
    plain = bytes((i * 37 + j * j) % 251 for i in range(nrows) for j in range(rowlen))

    def filt(ft):
        out = bytearray()
        prev = bytes(rowlen)
        for r in range(0, len(plain), rowlen):
            row = plain[r : r + rowlen]
            out.append(ft)
            for i in range(rowlen):
                a = row[i - 1] if i >= 1 else 0
                b = prev[i]
                c = prev[i - 1] if i >= 1 else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((row[i] - pred) & 0xFF)
            prev = row
        return bytes(out)

    parms = {"Predictor": 12, "Columns": rowlen}
    for ft in range(5):
        assert _unpredict(filt(ft), parms) == plain, f"filter {ft}"
    # TIFF predictor 2: horizontal differencing, no filter byte
    tiff = bytearray()
    for r in range(0, len(plain), rowlen):
        row = plain[r : r + rowlen]
        tiff.append(row[0])
        for i in range(1, rowlen):
            tiff.append((row[i] - row[i - 1]) & 0xFF)
    assert _unpredict(bytes(tiff), {"Predictor": 2, "Columns": rowlen}) == plain


# ----------------------------------------------------------------- refusals


def test_standard_security_handler_rc4():
    """§7.6.3 standard security handler: empty-user-password RC4
    files (V1 40-bit and V2 128-bit) decrypt and extract; a
    non-empty user password (tampered /U), AES (V≥4), and
    non-Standard handlers refuse by name."""
    text = "classified\n" + "\n".join(f"row {i}" for i in range(40))
    for mode in ("rc4-40", "rc4-128"):
        blob = build_pdf(text, lines_per_page=16, encrypt=mode)
        assert b"/Encrypt" in blob
        assert extract_pdf_text(blob) == text, mode
    # ciphertext differs from the plain build's stream bytes
    import zlib as _z

    assert _z.compress(
        b"BT\n/F1 12 Tf\n72 720 Td\n(classified) Tj\nET"
    ) not in build_pdf("classified", encrypt="rc4-128")

    bad = bytearray(build_pdf("x", encrypt="rc4-128"))
    i = bad.find(b"/U <")
    bad[i + 4 : i + 8] = b"dead"
    with pytest.raises(ValueError, match="password-protected"):
        extract_pdf_text(bytes(bad))

    aes = build_pdf("x", encrypt="rc4-128").replace(
        b"/V 2 /R 3", b"/V 4 /R 4"
    )
    with pytest.raises(ValueError, match="AES"):
        extract_pdf_text(aes)

    alien = build_pdf("x", encrypt="rc4-128").replace(
        b"/Filter /Standard", b"/Filter /AcmeCrypt"
    )
    with pytest.raises(ValueError, match="security handler"):
        extract_pdf_text(alien)


def test_refuses_bad_startxref_target():
    blob = bytearray(build_pdf("x"))
    # point startxref at the catalog object: neither a classic table
    # nor an /XRef stream
    head, tail = bytes(blob).rsplit(b"startxref\n", 1)
    off = head.index(b"1 0 obj")
    blob = head + b"startxref\n" + str(off).encode() + b"\n%%EOF\n"
    with pytest.raises(ValueError, match="neither"):
        extract_pdf_text(blob)


def test_refuses_hybrid_xrefstm():
    blob = build_pdf("x").replace(
        b"/Root 1 0 R >>", b"/Root 1 0 R /XRefStm 99 >>"
    )
    with pytest.raises(ValueError, match="XRefStm"):
        extract_pdf_text(blob)


def test_refuses_type0_font():
    font = b"<< /Type /Font /Subtype /Type0 /BaseFont /X >>"
    content = b"BT /F1 12 Tf 72 720 Td (cid) Tj ET"
    with pytest.raises(ValueError, match="Type0"):
        _extract(content, font)


def _one_page_filtered(payload: bytes, filter_decl: str) -> bytes:
    return _wrap_objects(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: (
                b"<< /Type /Page /Parent 2 0 R "
                b"/Resources << /Font << /F1 5 0 R >> >> "
                b"/Contents 4 0 R >>"
            ),
            4: (
                f"<< /Length {len(payload)} /Filter {filter_decl} >>"
                .encode()
                + b"\nstream\n" + payload + b"\nendstream"
            ),
            5: (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding /WinAnsiEncoding >>"
            ),
        }
    )


def test_differences_encoding():
    """§9.6.5 /Encoding dictionaries with /Differences arrays: runs
    of (code, glyph-name…) remap byte codes through the standard
    glyph-name table (+ uniXXXX forms); unmapped codes fall to the
    base WinAnsi and unknown names surface as U+FFFD, never a
    silent guess."""
    from workshoop2_etl_spark.operators.pdfextract import (
        _GLYPH_NAMES,
        _glyph_to_char,
    )

    assert _GLYPH_NAMES["hyphen"] == "-"  # not the 0xAD position
    assert _GLYPH_NAMES["Aacute"] == "Á"
    assert _GLYPH_NAMES["questiondown"] == "¿"
    assert _glyph_to_char("uni20AC") == "€"
    assert _glyph_to_char("u1F600") == "😀"
    assert _glyph_to_char("gid57") == "�"

    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding "
        b"/Differences [ 65 /Z /eacute /uni0394 90 /A ] >> >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (ABC plain Z) Tj ET"
    assert _extract(content, font) == "ZéΔ plain A"


def test_refuses_image_codec_filter():
    content = b"BT /F1 12 Tf 72 720 Td (x) Tj ET"
    blob = _one_page_filtered(content, "/DCTDecode")
    with pytest.raises(ValueError, match="filter"):
        extract_pdf_text(blob)


def test_filter_ladder_lzw_ascii_runlength():
    """§7.4 filter chain: LZWDecode (the TIFF early-change core),
    ASCIIHexDecode, ASCII85Decode, RunLengthDecode, and a cascaded
    [/FlateDecode /LZWDecode] pair all extract the same text;
    /EarlyChange 0 refuses by name."""
    import base64

    from workshoop2_etl_spark.operators.multimodal import (
        _packbits_encode,
        _tiff_lzw_encode,
    )

    content = b"BT /F1 12 Tf 72 720 Td (filters!) Tj ET"
    cases = {
        "/LZWDecode": _tiff_lzw_encode(content),
        "/RunLengthDecode": _packbits_encode(content) + b"\x80",
        "/ASCIIHexDecode": content.hex().encode() + b">",
        "/ASCII85Decode": base64.a85encode(content) + b"~>",
        "[/FlateDecode /LZWDecode]": zlib.compress(
            _tiff_lzw_encode(content)
        ),
    }
    for decl, payload in cases.items():
        assert extract_pdf_text(
            _one_page_filtered(payload, decl)
        ) == "filters!", decl

    early0 = _one_page_filtered(
        _tiff_lzw_encode(content), "/LZWDecode /DecodeParms "
        "<< /EarlyChange 0 >>"
    )
    with pytest.raises(ValueError, match="EarlyChange"):
        extract_pdf_text(early0)


def test_refuses_non_pdf():
    with pytest.raises(ValueError, match="%PDF"):
        extract_pdf_text(b"GIF89a not a pdf")


# --------------------------------------------------------------- Spark side


def test_spark_pdf_roundtrip_and_error_rows(spark):
    rows = [
        (1, "alpha\nbeta"),
        (2, "gamma (x) \\ delta"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pdfs = pdf_synthesize(df, "doc_id", "text", lines_per_page=1)
    out = {
        r["doc_id"]: r
        for r in pdf_extract(pdfs, "doc_id", "pdf").collect()
    }
    assert out[1]["pdf_text"] == "alpha\nbeta"
    assert out[2]["pdf_text"] == "gamma (x) \\ delta"
    assert out[3]["pdf_text"] == ""
    assert all(out[i]["pdf_error"] is None for i in (1, 2, 3))
    # a corrupt blob yields an error row, not a task failure
    # corrupt blobs yield error rows, not task failures — including
    # shapes that raise beyond ValueError (here /Root resolving to an
    # integer would AttributeError inside the page walk)
    pg = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    pages_is_int = build_pdf("x").replace(
        pg, b"7 %" + b"x" * (len(pg) - 3)  # same length: offsets hold
    )
    import pytest as _pt

    with _pt.raises(AttributeError):  # the shape the kernel must absorb
        extract_pdf_text(pages_is_int)
    bad = spark.createDataFrame(
        [
            (9, bytearray(b"%PDF-1.7 broken")),
            (10, bytearray(pages_is_int)),
        ],
        "doc_id long, pdf binary",
    )
    for row in pdf_extract(bad, "doc_id", "pdf").collect():
        assert row["pdf_text"] is None
        assert row["pdf_error"]
