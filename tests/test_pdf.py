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
