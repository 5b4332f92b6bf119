"""Heavy-parser adapters (docling/MinerU) + OCR seam: the marshalling
code runs against stub libraries injected into sys.modules — the image
has neither library nor tesseract, exactly like many deployments; the
adapters must register only when importable and convert markdown output
into the repo's Part hierarchy (reference fileparser/docling_parser.py,
mineru_parser.py)."""

import os
import sys
import types

import pytest

from super_rag_tpu.fileparser.base import TitlePart
from super_rag_tpu.fileparser.heavy import (
    DoclingParser,
    MinerUParser,
    heavy_parsers,
)
from super_rag_tpu.fileparser.ocr import (
    TesseractOCR,
    default_ocr,
    ocr_images,
)
from super_rag_tpu.fileparser.parser import DocParser

MD = "# Title\n\nBody paragraph with content.\n\n## Section\n\nMore text.\n"


def test_unavailable_without_libraries():
    assert not DoclingParser.available()
    assert not MinerUParser.available()
    assert heavy_parsers() == []
    # and DocParser still builds + dispatches without them
    parts = DocParser().parse_file("x.md", MD.encode())
    assert parts


@pytest.fixture
def fake_docling(monkeypatch):
    class FakeDoc:
        def export_to_markdown(self):
            return MD

    class FakeResult:
        document = FakeDoc()

    class FakeConverter:
        def convert(self, src):
            assert os.path.exists(src)
            return FakeResult()

    mod = types.ModuleType("docling.document_converter")
    mod.DocumentConverter = FakeConverter
    pkg = types.ModuleType("docling")
    pkg.document_converter = mod
    monkeypatch.setitem(sys.modules, "docling", pkg)
    monkeypatch.setitem(sys.modules, "docling.document_converter", mod)
    return mod


def test_docling_adapter_converts_markdown(fake_docling):
    assert DoclingParser.available()
    parts = DoclingParser().parse_file("report.docx", b"fake-bytes")
    assert any(isinstance(p, TitlePart) and p.content == "Title"
               for p in parts)
    text = " ".join(p.content for p in parts)
    assert "Body paragraph" in text and "More text" in text
    # and the dispatcher now includes it, ahead of built-ins
    names = [type(p).__name__ for p in heavy_parsers()]
    assert names == ["DoclingParser"]


@pytest.fixture
def fake_mineru(monkeypatch):
    def parse_doc(paths, output_dir, backend):
        stem = os.path.splitext(os.path.basename(paths[0]))[0]
        d = os.path.join(output_dir, stem, "auto")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{stem}.md"), "w") as f:
            f.write(MD)

    common = types.ModuleType("mineru.cli.common")
    common.parse_doc = parse_doc
    cli = types.ModuleType("mineru.cli")
    cli.common = common
    pkg = types.ModuleType("mineru")
    pkg.cli = cli
    monkeypatch.setitem(sys.modules, "mineru", pkg)
    monkeypatch.setitem(sys.modules, "mineru.cli", cli)
    monkeypatch.setitem(sys.modules, "mineru.cli.common", common)
    return common


def test_mineru_adapter_reads_output_markdown(fake_mineru):
    assert MinerUParser.available()
    parts = MinerUParser().parse_file("scan.pdf", b"%PDF-fake")
    assert any("Body paragraph" in p.content for p in parts)


def test_mineru_missing_output_raises(fake_mineru, monkeypatch):
    def broken(paths, output_dir, backend):
        pass  # produces nothing

    fake_mineru.parse_doc = broken
    with pytest.raises(ValueError, match="no markdown"):
        MinerUParser().parse_file("scan.pdf", b"%PDF-fake")


# -- OCR seam -----------------------------------------------------------------


def test_default_ocr_chain_on_this_image():
    # no tesseract binary here, so the chain lands on the offline
    # glyph-template engine (fileparser/glyph_ocr.py)
    assert not TesseractOCR.available()
    engine = default_ocr()
    assert engine is not None and engine.name == "glyph-template"
    # unreadable bytes must not kill the document, just skip the page
    assert ocr_images([("image/png", b"x")]) == [""]


def test_ocr_images_with_stub_engine():
    class Stub:
        def __init__(self):
            self.calls = 0

        def image_to_text(self, data):
            self.calls += 1
            if data == b"bad":
                raise RuntimeError("unreadable")
            return f"page text {self.calls}"

    eng = Stub()
    out = ocr_images([("image/jpeg", b"a"), ("image/jpeg", b"bad"),
                      ("image/jpeg", b"c")], engine=eng)
    assert out == ["page text 1", "", "page text 3"]


def test_scanned_pdf_uses_ocr_when_available(monkeypatch):
    """A text-free PDF with an embedded JPEG gains a TextPart when an
    OCR engine exists."""
    from super_rag_tpu.fileparser import pdf as pdf_mod
    from super_rag_tpu.fileparser.base import TextPart
    from super_rag_tpu.fileparser import ocr as ocr_mod

    jpeg = b"\xff\xd8\xff\xe0" + b"0" * 32 + b"\xff\xd9"
    fake_pdf = (b"%PDF-1.4\n1 0 obj\n<< /Subtype /Image /Width 10 "
                b"/Height 10 /Filter /DCTDecode >>\nstream\n" + jpeg +
                b"\nendstream\nendobj\n%%EOF")

    class Eng:
        def image_to_text(self, data):
            return "OCR RECOVERED TEXT"

    monkeypatch.setattr(ocr_mod, "default_ocr", lambda: Eng())
    parts = pdf_mod.PdfParser().parse_file("scan.pdf", fake_pdf)
    texts = [p.content for p in parts if isinstance(p, TextPart)]
    assert any("OCR RECOVERED TEXT" in t for t in texts)


def test_scanned_pdf_without_ocr_still_yields_images():
    from super_rag_tpu.fileparser import pdf as pdf_mod
    from super_rag_tpu.fileparser.base import AssetBinPart

    jpeg = b"\xff\xd8\xff\xe0" + b"0" * 32 + b"\xff\xd9"
    fake_pdf = (b"%PDF-1.4\n1 0 obj\n<< /Subtype /Image /Width 10 "
                b"/Height 10 /Filter /DCTDecode >>\nstream\n" + jpeg +
                b"\nendstream\nendobj\n%%EOF")
    parts = pdf_mod.PdfParser().parse_file("scan.pdf", fake_pdf)
    assert any(isinstance(p, AssetBinPart) for p in parts)
