from super_rag_tpu.fileparser.base import (
    Part,
    TextPart,
    TitlePart,
    CodePart,
    ImagePart,
    MarkdownPart,
    AssetBinPart,
    BaseParser,
)
from super_rag_tpu.fileparser.parser import DocParser

__all__ = [
    "Part",
    "TextPart",
    "TitlePart",
    "CodePart",
    "ImagePart",
    "MarkdownPart",
    "AssetBinPart",
    "BaseParser",
    "DocParser",
]
