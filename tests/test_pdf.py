"""Pure-Python PDF text extraction."""

import zlib

import pytest

from super_rag_tpu.fileparser.parser import DocParser
from super_rag_tpu.fileparser.pdf import PdfParser, extract_pdf_text


def make_pdf(content_stream: bytes, compress: bool = False) -> bytes:
    """Minimal single-page PDF with one content stream."""
    if compress:
        filt = b"/Filter /FlateDecode "
        data = zlib.compress(content_stream)
    else:
        filt = b""
        data = content_stream
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << " + filt + b"/Length " + str(len(data)).encode()
        + b" >>\nstream\n" + data + b"\nendstream\nendobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer\n%%EOF"


CONTENT = (b"BT /F1 12 Tf 72 700 Td (Hello PDF world.) Tj T* "
           b"[(Seg) -120 (mented) -90 ( text!)] TJ ET")


def test_plain_stream():
    text = extract_pdf_text(make_pdf(CONTENT))
    assert "Hello PDF world." in text
    assert "Segmented text!" in text


def test_flate_stream():
    text = extract_pdf_text(make_pdf(CONTENT, compress=True))
    assert "Hello PDF world." in text


def test_escapes_and_hex():
    c = (rb"BT (paren \( inside \) and \134 backslash) Tj "
         b"<48656C6C6F> Tj ET")
    text = extract_pdf_text(make_pdf(c))
    assert "paren ( inside )" in text
    assert "Hello" in text


def test_scanned_pdf_raises():
    with pytest.raises(ValueError, match="no extractable text"):
        extract_pdf_text(make_pdf(b"q 1 0 0 1 0 0 cm /Im0 Do Q"))


def test_dispatcher_handles_pdf():
    parts = DocParser().parse_file("doc.pdf", make_pdf(CONTENT, compress=True))
    assert "Hello PDF world." in parts[0].content


def test_end_to_end_pdf_ingest(tmp_path):
    import jax.numpy as jnp
    from super_rag_tpu.config import Settings
    from super_rag_tpu.service.collection_service import CollectionService
    from super_rag_tpu.service.document_service import DocumentService
    from super_rag_tpu.service.context import build_context

    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    ctx = build_context(cfg)
    cs = CollectionService(ctx)
    ds = DocumentService(ctx, cs)
    coll = cs.create("u", "pdfs")
    doc = ds.create("u", coll["id"], "report.pdf", make_pdf(CONTENT, True))
    assert doc["status"] == "COMPLETE"
    eng = ctx.engines.get(coll["id"], coll["config"])
    hits = eng.search("segmented text", top_k=1, mode="fulltext")
    assert hits and "Segmented" in hits[0].text


# -- round 4: CID/Type0 + ToUnicode, ObjStm, images (VERDICT r3 item 8) ---------


def make_cid_pdf(codes_hex: bytes, cmap_stream: bytes,
                 in_objstm: bool = False) -> bytes:
    """Single-page PDF whose text uses a Type0 (CID) font with a
    /ToUnicode CMap — hex strings are 2-byte CIDs, unreadable without
    the map."""
    content = b"BT /F1 12 Tf 72 700 Td <" + codes_hex + b"> Tj ET"
    font = (b"<< /Type /Font /Subtype /Type0 /BaseFont /Subset+Fake "
            b"/ToUnicode 6 0 R >>")
    page = (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>")
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
    ]
    if in_objstm:
        # pack the page + font dicts inside a compressed object stream
        inner = [(3, page), (5, font)]
        payload = b""
        header = b""
        for num, body in inner:
            header += str(num).encode() + b" " + str(len(payload)).encode() + b" "
            payload += body + b" "
        first = len(header)
        stm = zlib.compress(header + payload)
        objs.append(
            b"7 0 obj << /Type /ObjStm /N 2 /First " + str(first).encode()
            + b" /Filter /FlateDecode /Length " + str(len(stm)).encode()
            + b" >>\nstream\n" + stm + b"\nendstream\nendobj"
        )
    else:
        objs.append(b"3 0 obj " + page + b" endobj")
        objs.append(b"5 0 obj " + font + b" endobj")
    objs.append(
        b"4 0 obj << /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj"
    )
    objs.append(
        b"6 0 obj << /Length " + str(len(cmap_stream)).encode()
        + b" >>\nstream\n" + cmap_stream + b"\nendstream\nendobj"
    )
    return b"%PDF-1.5\n" + b"\n".join(objs) + b"\ntrailer\n%%EOF"


CMAP = b"""/CIDInit /ProcSet findresource begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0001> <0048>
<0002> <0069>
endbfchar
1 beginbfrange
<0010> <0012> <0061>
endbfrange
endcmap
end
"""


def test_cid_tounicode_decodes():
    # codes: 0001('H') 0002('i') 0010('a') 0011('b') 0012('c')
    pdf = make_cid_pdf(b"00010002001000110012", CMAP)
    text = extract_pdf_text(pdf)
    assert "Hiabc" in text


def test_cid_bfrange_array_form():
    cmap = (b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
            b"endcodespacerange\n1 beginbfrange\n"
            b"<0005> <0006> [<0058> <0059>]\nendbfrange\nendcmap\n")
    pdf = make_cid_pdf(b"00050006", cmap)
    assert "XY" in extract_pdf_text(pdf)


def test_cid_font_in_object_stream():
    """PDF 1.5 compressed-xref layout: the page and font dicts live in
    an /ObjStm — the object walk must expand it to find the CMap."""
    pdf = make_cid_pdf(b"00010002", CMAP, in_objstm=True)
    assert "Hi" in extract_pdf_text(pdf)


def test_cid_without_tounicode_does_not_crash():
    content = b"BT /F1 12 Tf <00410042> Tj ET"
    font = b"<< /Type /Font /Subtype /Type0 /BaseFont /NoMap >>"
    page = (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>")
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj " + page + b" endobj",
        b"5 0 obj " + font + b" endobj",
        b"4 0 obj << /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj",
    ]
    pdf = b"%PDF-1.5\n" + b"\n".join(objs) + b"\ntrailer\n%%EOF"
    # 2-byte codes with no map: nothing readable, but no crash either
    try:
        extract_pdf_text(pdf)
    except ValueError:
        pass


def test_dct_and_jpx_images_extracted():
    from super_rag_tpu.fileparser.pdf import extract_pdf_images

    jpeg = b"\xff\xd8\xff\xe0" + b"J" * 64 + b"\xff\xd9"
    jp2 = b"\x00\x00\x00\x0cjP  \r\n\x87\n" + b"K" * 64
    objs = [
        b"1 0 obj << /Subtype /Image /Width 4 /Height 4 /Filter /DCTDecode"
        b" /Length " + str(len(jpeg)).encode() + b" >>\nstream\n" + jpeg
        + b"\nendstream\nendobj",
        b"2 0 obj << /Subtype /Image /Width 4 /Height 4 /Filter /JPXDecode"
        b" /Length " + str(len(jp2)).encode() + b" >>\nstream\n" + jp2
        + b"\nendstream\nendobj",
    ]
    pdf = b"%PDF-1.5\n" + b"\n".join(objs) + b"\ntrailer\n%%EOF"
    images = extract_pdf_images(pdf)
    mimes = sorted(m for m, _ in images)
    assert mimes == ["image/jp2", "image/jpeg"]
    assert images[0][1] in (jpeg, jp2)


def test_scanned_dct_pdf_yields_image_parts():
    jpeg = b"\xff\xd8\xff\xe0" + b"J" * 64 + b"\xff\xd9"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length 28 >>\nstream\nq 1 0 0 1 0 0 cm /Im0 Do Q"
        b"\nendstream\nendobj",
        b"5 0 obj << /Subtype /Image /Width 4 /Height 4 /Filter /DCTDecode"
        b" /Length " + str(len(jpeg)).encode() + b" >>\nstream\n" + jpeg
        + b"\nendstream\nendobj",
    ]
    pdf = b"%PDF-1.5\n" + b"\n".join(objs) + b"\ntrailer\n%%EOF"
    parts = PdfParser().parse_file("scan.pdf", pdf)
    kinds = {type(p).__name__ for p in parts}
    assert "AssetBinPart" in kinds and "ImagePart" in kinds


def test_two_column_reading_order():
    """A two-column page interleaves its columns in stream order; the
    position-aware assembly must emit left column fully, then right."""
    ops = []
    # stream order alternates columns line by line (typical generator
    # output); x=72 left column, x=320 right column
    rows = [
        (72, 700, "Left one."), (320, 700, "Right one."),
        (72, 685, "Left two."), (320, 685, "Right two."),
        (72, 670, "Left three."), (320, 670, "Right three."),
    ]
    for x, y, txt in rows:
        ops.append(f"BT 1 0 0 1 {x} {y} Tm ({txt}) Tj ET".encode())
    pdf = make_pdf(b" ".join(ops))
    text = extract_pdf_text(pdf)
    li = [text.index(s) for s in
          ("Left one.", "Left two.", "Left three.")]
    ri = [text.index(s) for s in
          ("Right one.", "Right two.", "Right three.")]
    assert max(li) < min(ri), text  # full left column before right


def test_same_line_runs_join_in_x_order():
    ops = (b"BT 1 0 0 1 300 700 Tm (world) Tj ET "
           b"BT 1 0 0 1 72 700 Tm (Hello) Tj ET")
    text = extract_pdf_text(make_pdf(ops))
    assert "Hello world" in text


def test_grid_aligned_rows_become_markdown_table():
    """Consecutive lines whose runs start at shared x positions are a
    table; the assembly emits them as a markdown grid (the layout signal
    the reference gets from MinerU table models)."""
    cells = [
        (72, 700, "Name"), (220, 700, "Role"), (400, 700, "Team"),
        (72, 685, "Alice"), (220, 685, "Engineer"), (400, 685, "TPU"),
        (72, 670, "Bob"), (220, 670, "Manager"), (400, 670, "Infra"),
    ]
    ops = [f"BT 1 0 0 1 {x} {y} Tm ({t}) Tj ET".encode()
           for x, y, t in cells]
    # surrounding prose must stay plain text
    ops.insert(0, b"BT 1 0 0 1 72 730 Tm (Team roster:) Tj ET")
    ops.append(b"BT 1 0 0 1 72 640 Tm (End of roster.) Tj ET")
    text = extract_pdf_text(make_pdf(b" ".join(ops)))
    assert "| Name | Role | Team |" in text, text
    assert "| --- | --- | --- |" in text
    assert "| Alice | Engineer | TPU |" in text
    assert "| Bob | Manager | Infra |" in text
    assert "Team roster:" in text and "End of roster." in text
    assert "| Team roster" not in text  # prose not swallowed by the grid


def test_lone_multi_run_line_stays_prose():
    ops = (b"BT 1 0 0 1 72 700 Tm (Hello) Tj ET "
           b"BT 1 0 0 1 200 700 Tm (world) Tj ET "
           b"BT 1 0 0 1 72 685 Tm (Just a paragraph line.) Tj ET")
    text = extract_pdf_text(make_pdf(ops))
    assert "|" not in text
    assert "Hello world" in text


def test_two_col_table_with_narrow_gap_is_table_not_columns():
    cells = [
        (72, 700, "Key"), (180, 700, "Value"),
        (72, 685, "qps"), (180, 685, "21000"),
        (72, 670, "recall"), (180, 670, "0.95"),
    ]
    ops = [f"BT 1 0 0 1 {x} {y} Tm ({t}) Tj ET".encode()
           for x, y, t in cells]
    text = extract_pdf_text(make_pdf(b" ".join(ops)))
    assert "| Key | Value |" in text, text
    assert "| recall | 0.95 |" in text
