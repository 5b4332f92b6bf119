"""Offline glyph-template OCR (fileparser/glyph_ocr.py).

The reference gets OCR from MinerU/Docling model bundles
(super_rag/fileparser/mineru_parser.py:33-47); this engine is the
image's offline recourse for scanned machine-rendered pages.
"""

import difflib
import io
import textwrap

import numpy as np
import pytest

from super_rag_tpu.fileparser.glyph_ocr import GlyphOCR

FONT_DIR = "/usr/share/fonts/truetype/dejavu"
PANGRAM = ("The quick brown fox jumps over the lazy dog.\n"
           "Pack my box with five dozen liquor jugs! 0123456789")


def _render(text: str, font_name: str, size: int, pad: int = 24,
            fill: int = 0, bg: int = 255) -> bytes:
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.truetype(f"{FONT_DIR}/{font_name}", size)
    lines = text.split("\n")
    asc, desc = font.getmetrics()
    lh = int((asc + desc) * 1.25)
    w = max(int(font.getlength(line)) for line in lines) + 2 * pad
    h = lh * len(lines) + 2 * pad
    img = Image.new("L", (w, h), bg)
    d = ImageDraw.Draw(img)
    for i, line in enumerate(lines):
        d.text((pad, pad + i * lh), line, font=font, fill=fill)
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


def _ratio(got: str, want: str) -> float:
    return difflib.SequenceMatcher(None, got, want).ratio()


@pytest.fixture(scope="module")
def engine() -> GlyphOCR:
    return GlyphOCR()


@pytest.mark.parametrize("font,size,floor", [
    ("DejaVuSans.ttf", 32, 0.99),
    ("DejaVuSans.ttf", 18, 0.97),
    ("DejaVuSans-Bold.ttf", 28, 0.99),
    ("DejaVuSerif.ttf", 24, 0.95),
    ("DejaVuSerif.ttf", 40, 0.97),
    ("DejaVuSansMono.ttf", 28, 0.99),
])
def test_pangram_roundtrip(engine, font, size, floor):
    got = engine.image_to_text(_render(PANGRAM, font, size))
    assert _ratio(got, PANGRAM) >= floor, repr(got)


def test_line_structure_preserved(engine):
    got = engine.image_to_text(_render(PANGRAM, "DejaVuSans.ttf", 32))
    assert got.count("\n") == 1
    first, second = got.split("\n")
    assert "quick brown fox" in first
    assert "0123456789" in second


def test_word_spacing(engine):
    got = engine.image_to_text(
        _render("alpha beta gamma", "DejaVuSans.ttf", 30))
    assert got.split() == ["alpha", "beta", "gamma"]


def test_inverted_polarity(engine):
    got = engine.image_to_text(
        _render("white on black 42", "DejaVuSans.ttf", 30,
                fill=255, bg=0))
    assert _ratio(got, "white on black 42") >= 0.9, repr(got)


def test_noisy_jpeg_scan(engine):
    """Simulated scan: downscaled, sensor noise, JPEG q40."""
    from PIL import Image

    para = ("Retrieval augmented generation grounds language models in "
            "external documents and reduces hallucination.")
    text = "\n".join(textwrap.wrap(para, 50))
    png = _render(text, "DejaVuSerif.ttf", 36)
    img = Image.open(io.BytesIO(png)).convert("L")
    img = img.resize((int(img.width * 0.8), int(img.height * 0.8)))
    arr = np.asarray(img, dtype=np.int16)
    rng = np.random.default_rng(0)
    arr = np.clip(arr + rng.integers(-12, 12, arr.shape), 0, 255)
    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.uint8)).save(buf, "JPEG", quality=40)
    got = engine.image_to_text(buf.getvalue())
    assert _ratio(got, text) >= 0.9, repr(got)


def test_paragraph_gap_emits_blank_line(engine):
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.truetype(f"{FONT_DIR}/DejaVuSans.ttf", 28)
    img = Image.new("L", (620, 300), 255)
    d = ImageDraw.Draw(img)
    d.text((20, 20), "First paragraph line.", font=font, fill=0)
    d.text((20, 60), "Second line same block.", font=font, fill=0)
    d.text((20, 200), "New paragraph after gap.", font=font, fill=0)
    buf = io.BytesIO()
    img.save(buf, "PNG")
    got = engine.image_to_text(buf.getvalue())
    blocks = [b for b in got.split("\n\n") if b.strip()]
    assert len(blocks) == 2, repr(got)


def test_empty_and_blank_images(engine):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (200, 100), 255).save(buf, "PNG")
    assert engine.image_to_text(buf.getvalue()) == ""


def test_garbage_bytes_skip_gracefully():
    from super_rag_tpu.fileparser.ocr import ocr_images

    out = ocr_images([("image/jpeg", b"\xff\xd8 not a real jpeg")])
    assert out == [""]


def test_default_ocr_resolves_to_glyph_engine():
    """No tesseract in this image -> the chain lands on GlyphOCR."""
    from super_rag_tpu.fileparser.ocr import TesseractOCR, default_ocr

    engine = default_ocr()
    assert engine is not None
    if not TesseractOCR.available():
        assert engine.name == "glyph-template"


def test_image_file_upload_yields_searchable_text():
    """Standalone image documents (reference capability:
    mineru_parser.py:13-19 extension list) parse to OCR text + asset."""
    from super_rag_tpu.fileparser.base import (
        AssetBinPart, ImagePart, TextPart,
    )
    from super_rag_tpu.fileparser.parser import DocParser

    png = _render("Quarterly revenue grew twelve percent",
                  "DejaVuSans.ttf", 32)
    parts = DocParser().parse_file("screenshot.png", png)
    texts = [p for p in parts if isinstance(p, TextPart)]
    assert texts and "revenue" in texts[0].content
    assert any(isinstance(p, AssetBinPart) for p in parts)
    assert any(isinstance(p, ImagePart) for p in parts)


def test_photo_image_attaches_asset_without_noise_text():
    from PIL import Image

    from super_rag_tpu.fileparser.base import AssetBinPart, TextPart
    from super_rag_tpu.fileparser.parser import DocParser

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG")
    parts = DocParser().parse_file("photo.jpg", buf.getvalue())
    texts = [p for p in parts if isinstance(p, TextPart)]
    # random noise must not become indexed "text"
    assert all(len(t.content.replace(" ", "")) < 8 for t in texts)
    assert any(isinstance(p, AssetBinPart) for p in parts)


def test_scanned_pdf_extracts_text_offline(engine):
    """A DCT (JPEG) page image inside a text-free PDF now yields real
    text via the offline engine (reference capability:
    index/document_parser.py page rendering + MinerU OCR)."""
    from super_rag_tpu.fileparser.base import TextPart
    from super_rag_tpu.fileparser.pdf import PdfParser

    jpeg = io.BytesIO()
    from PIL import Image

    png = _render("Scanned page with searchable words",
                  "DejaVuSans.ttf", 34)
    Image.open(io.BytesIO(png)).convert("L").save(jpeg, "JPEG",
                                                  quality=90)
    blob = jpeg.getvalue()
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length 28 >>\nstream\nq 1 0 0 1 0 0 cm /Im0 Do Q"
        b"\nendstream\nendobj",
        b"5 0 obj << /Subtype /Image /Width 4 /Height 4 /Filter /DCTDecode"
        b" /Length " + str(len(blob)).encode() + b" >>\nstream\n" + blob
        + b"\nendstream\nendobj",
    ]
    pdf = b"%PDF-1.5\n" + b"\n".join(objs) + b"\ntrailer\n%%EOF"
    parts = PdfParser().parse_file("scan.pdf", pdf)
    texts = [p.content for p in parts if isinstance(p, TextPart)]
    assert texts, "scanned PDF produced no TextPart"
    joined = " ".join(texts)
    assert "Scanned" in joined and "searchable" in joined, joined
