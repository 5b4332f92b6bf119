"""OCR engines for scanned documents.

The reference gets OCR through MinerU/Docling's bundled models
(fileparser/mineru_parser.py; docling's pipeline options).  Neither ships
in this image, so OCR is its own pluggable seam here:

  TesseractOCR   shells out to the `tesseract` binary when installed
                 (stdin image -> stdout text; no python deps)
  PytesseractOCR uses the pytesseract package when installed
  GlyphOCR       offline glyph-template recogniser (fileparser/
                 glyph_ocr.py) — PIL+numpy only, always available in
                 this image; handles clean machine-rendered pages

``default_ocr()`` probes the chain and returns the first available
engine.  With GlyphOCR in the chain the scanned-PDF path now has a
real offline recourse; the vision caption ladder (index/vision.py)
still covers pages the template engine cannot read (handwriting,
noisy photographs).
"""

from __future__ import annotations

import shutil
import subprocess
from typing import Optional


class OCREngine:
    name = "base"

    def image_to_text(self, image_bytes: bytes) -> str:
        raise NotImplementedError


class TesseractOCR(OCREngine):
    name = "tesseract"

    def __init__(self, binary: str = "tesseract", lang: str = "eng"):
        self.binary = binary
        self.lang = lang

    @classmethod
    def available(cls, binary: str = "tesseract") -> bool:
        return shutil.which(binary) is not None

    def image_to_text(self, image_bytes: bytes) -> str:
        proc = subprocess.run(
            [self.binary, "stdin", "stdout", "-l", self.lang],
            input=image_bytes, capture_output=True, timeout=120,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"tesseract failed: {proc.stderr.decode('utf-8', 'replace')[:200]}"
            )
        return proc.stdout.decode("utf-8", "replace").strip()


class PytesseractOCR(OCREngine):
    name = "pytesseract"

    @classmethod
    def available(cls) -> bool:
        try:
            import pytesseract  # noqa: F401

            return True
        except ImportError:
            return False

    def image_to_text(self, image_bytes: bytes) -> str:
        import io

        import pytesseract
        from PIL import Image

        return pytesseract.image_to_string(
            Image.open(io.BytesIO(image_bytes))
        ).strip()


def default_ocr() -> Optional[OCREngine]:
    if TesseractOCR.available():
        return TesseractOCR()
    if PytesseractOCR.available():
        return PytesseractOCR()
    from super_rag_tpu.fileparser.glyph_ocr import GlyphOCR

    if GlyphOCR.available():
        return GlyphOCR()
    return None


def ocr_images(images: list[tuple[str, bytes]],
               engine: Optional[OCREngine] = None) -> list[str]:
    """OCR a list of (mime, bytes) page images; skips failed pages."""
    engine = engine or default_ocr()
    if engine is None:
        return []
    out = []
    for _mime, data in images:
        try:
            text = engine.image_to_text(data)
        except Exception:  # noqa: BLE001 — one bad page must not kill the doc
            text = ""
        out.append(text)
    return out
