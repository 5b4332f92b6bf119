"""Multi-parser dispatcher with a fallback chain.

Analog of the reference's DocParser (super_rag/fileparser/file_parser.py:
47-116: extension dispatch over [MinerU, Docling] with fallback).  Heavy
PDF/office parsers (docling/mineru) are optional: they register only if
importable, markdown/text always work, and unknown extensions fall back
to plain-text decoding.
"""

from __future__ import annotations

import os
from typing import Optional

from super_rag_tpu.fileparser.base import BaseParser, Part
from super_rag_tpu.fileparser.markdown import MarkdownParser, TextParser


def _optional_parsers() -> list[BaseParser]:
    from super_rag_tpu.fileparser.heavy import heavy_parsers
    from super_rag_tpu.fileparser.image import ImageFileParser
    from super_rag_tpu.fileparser.office import DocxParser, PptxParser, XlsxParser
    from super_rag_tpu.fileparser.olebinary import LegacyDocParser, LegacyPptParser
    from super_rag_tpu.fileparser.pdf import PdfParser

    # heavy adapters (MinerU, docling — layout/OCR) lead when importable,
    # mirroring the reference's priority (file_parser.py:47-116); the
    # built-ins below remain the fallback chain
    return [*heavy_parsers(), PdfParser(), DocxParser(), XlsxParser(),
            PptxParser(), LegacyDocParser(), LegacyPptParser(),
            ImageFileParser()]


class DocParser:
    """Dispatch by extension; fall back down the chain on parse errors."""

    def __init__(self, extra_parsers: Optional[list[BaseParser]] = None):
        self.parsers: list[BaseParser] = [
            MarkdownParser(),
            *(extra_parsers or []),
            *_optional_parsers(),
            TextParser(),
        ]

    def supported_extensions(self) -> set[str]:
        exts: set[str] = set()
        for p in self.parsers:
            exts.update(p.supported_extensions)
        return exts

    def parse_file(self, path: str, data: Optional[bytes] = None) -> list[Part]:
        ext = os.path.splitext(path)[1].lower()
        chain = [
            p for p in self.parsers if ext in p.supported_extensions
        ] or [TextParser()]
        last_err: Optional[Exception] = None
        for parser in chain:
            try:
                return parser.parse_file(path, data)
            except Exception as e:  # try next parser in the chain
                last_err = e
        raise ValueError(f"all parsers failed for {path}: {last_err}")
