"""Heavy-parser adapters: docling and MinerU behind BaseParser.

Counterpart of the reference's adapter pair
(fileparser/docling_parser.py:35-53, fileparser/mineru_parser.py:33-47):
both libraries convert rich documents (layout-aware PDF, office, OCR)
to MARKDOWN, and the adapter's job is marshalling — run the conversion,
read the markdown, hand it to the repo's own MarkdownParser for Parts.
Neither library ships in this image, so each adapter probes importability
(`available()`); DocParser registers them ahead of the built-in parsers
only when present, and the built-ins remain the fallback chain either
way.  Tests exercise the adapters with stub modules injected into
sys.modules — the marshalling logic is real and covered.
"""

from __future__ import annotations

import importlib
import os
import tempfile
from typing import Optional

from super_rag_tpu.fileparser.base import BaseParser, Part
from super_rag_tpu.fileparser.markdown import MarkdownParser

_RICH_EXTS = (".pdf", ".docx", ".doc", ".pptx", ".ppt", ".xlsx", ".xls",
              ".html")


def _md_to_parts(md_content: str, name: str) -> list[Part]:
    return MarkdownParser().parse_file(name + ".md",
                                       md_content.encode("utf-8"))


class DoclingParser(BaseParser):
    """docling DocumentConverter -> markdown -> Parts
    (reference docling_parser.py:50-53 export_to_markdown path)."""

    supported_extensions = _RICH_EXTS

    @staticmethod
    def available() -> bool:
        try:
            importlib.import_module("docling.document_converter")
            return True
        except ImportError:
            return False

    def parse_file(self, path: str, data: Optional[bytes] = None) -> list[Part]:
        from docling.document_converter import DocumentConverter

        name = os.path.basename(path)
        with tempfile.TemporaryDirectory(prefix="docling-") as tmp:
            src = os.path.join(tmp, name)
            if data is not None:
                with open(src, "wb") as f:
                    f.write(data)
            else:
                src = path
            converter = DocumentConverter()
            result = converter.convert(src)
            md_content = result.document.export_to_markdown()
        return _md_to_parts(md_content, os.path.splitext(name)[0])


class MinerUParser(BaseParser):
    """MinerU pipeline -> <stem>/auto/<stem>.md -> Parts
    (reference mineru_parser.py:33-47 parse_doc output layout)."""

    supported_extensions = (".pdf",)

    @staticmethod
    def available() -> bool:
        try:
            importlib.import_module("mineru.cli.common")
            return True
        except ImportError:
            return False

    def parse_file(self, path: str, data: Optional[bytes] = None) -> list[Part]:
        from mineru.cli.common import parse_doc

        name = os.path.basename(path)
        stem = os.path.splitext(name)[0]
        with tempfile.TemporaryDirectory(prefix="mineru-") as tmp:
            src = os.path.join(tmp, name)
            if data is not None:
                with open(src, "wb") as f:
                    f.write(data)
            else:
                src = path
            out_dir = os.path.join(tmp, "mineru_output")
            os.makedirs(out_dir, exist_ok=True)
            parse_doc([src], output_dir=out_dir, backend="pipeline")
            md_path = os.path.join(out_dir, stem, "auto", f"{stem}.md")
            if not os.path.exists(md_path):
                raise ValueError(f"mineru produced no markdown for {name}")
            with open(md_path, encoding="utf-8") as f:
                md_content = f.read()
        return _md_to_parts(md_content, stem)


def heavy_parsers() -> list[BaseParser]:
    """The importable heavy parsers, in the reference's priority order
    (file_parser.py:47-116 tries [MinerU, Docling] before built-ins)."""
    out: list[BaseParser] = []
    if MinerUParser.available():
        out.append(MinerUParser())
    if DoclingParser.available():
        out.append(DoclingParser())
    return out
