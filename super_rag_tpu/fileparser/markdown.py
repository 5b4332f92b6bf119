"""Markdown -> Parts via a markdown-it token stream.

Follows the reference's approach (super_rag/fileparser/parse_md.py:59
walks markdown-it tokens into Parts; base64 data-URIs become AssetBinPart)
but re-written for our Part model.  Headings become TitlePart(level),
fenced code becomes CodePart, paragraphs/lists/tables become TextPart,
embedded base64 images are extracted to AssetBinPart and replaced by an
ImagePart reference.
"""

from __future__ import annotations

import base64
import hashlib
import re

from markdown_it import MarkdownIt

from super_rag_tpu.fileparser.base import (
    AssetBinPart,
    BaseParser,
    CodePart,
    ImagePart,
    Part,
    TextPart,
    TitlePart,
)

_DATA_URI = re.compile(r"data:(image/[\w.+-]+);base64,([A-Za-z0-9+/=\s]+)")


def _extract_data_uris(md_text: str) -> tuple[str, list[AssetBinPart]]:
    assets: list[AssetBinPart] = []

    def repl(m: re.Match) -> str:
        mime, b64 = m.group(1), m.group(2)
        try:
            data = base64.b64decode(b64)
        except Exception:
            return m.group(0)
        asset_id = hashlib.sha256(data).hexdigest()[:16]
        assets.append(
            AssetBinPart(data=data, mime_type=mime, asset_id=asset_id)
        )
        return f"asset://{asset_id}"

    return _DATA_URI.sub(repl, md_text), assets


class MarkdownParser(BaseParser):
    supported_extensions = (".md", ".markdown")

    def __init__(self):
        self._md = MarkdownIt("commonmark", {"html": False})
        self._md.enable("table")

    def parse_file(self, path: str, data: bytes | None = None) -> list[Part]:
        if data is None:
            with open(path, "rb") as f:
                data = f.read()
        return self.parse_text(data.decode("utf-8", errors="replace"))

    def parse_text(self, text: str) -> list[Part]:
        text, assets = _extract_data_uris(text)
        tokens = self._md.parse(text)
        parts: list[Part] = []
        i = 0
        while i < len(tokens):
            t = tokens[i]
            if t.type == "heading_open":
                level = int(t.tag[1])
                inline = tokens[i + 1]
                parts.append(TitlePart(content=inline.content.strip(), level=level))
                i += 3
            elif t.type == "fence":
                parts.append(CodePart(content=t.content, language=t.info or ""))
                i += 1
            elif t.type == "inline":
                content = t.content.strip()
                if content:
                    for m in re.finditer(r"asset://(\w+)", content):
                        parts.append(ImagePart(url=f"asset://{m.group(1)}"))
                    cleaned = re.sub(r"!\[[^\]]*\]\(asset://\w+\)", "", content).strip()
                    if cleaned:
                        parts.append(TextPart(content=cleaned))
                i += 1
            elif t.type in ("table_open",):
                # capture the raw table slice as one text part
                j = i
                while j < len(tokens) and tokens[j].type != "table_close":
                    j += 1
                rows = [
                    tok.content for tok in tokens[i : j + 1] if tok.type == "inline"
                ]
                parts.append(TextPart(content="\n".join(rows)))
                i = j + 1
            else:
                i += 1
        parts.extend(assets)
        return parts


class TextParser(BaseParser):
    supported_extensions = (".txt", ".log", ".py", ".json", ".yaml", ".yml",
                            ".csv", ".html", ".htm")

    def parse_file(self, path: str, data: bytes | None = None) -> list[Part]:
        if data is None:
            with open(path, "rb") as f:
                data = f.read()
        text = data.decode("utf-8", errors="replace")
        if path.endswith((".html", ".htm")):
            text = re.sub(r"<script.*?</script>|<style.*?</style>", "", text,
                          flags=re.S | re.I)
            text = re.sub(r"<[^>]+>", " ", text)
            text = re.sub(r"\s+", " ", text)
        return [TextPart(content=text.strip())]
