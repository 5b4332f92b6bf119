"""Best-effort pure-Python PDF text extraction.

The reference delegates PDFs to MinerU/Docling/pdfium (heavy external
deps absent from this image).  This parser handles the common case of
text-based PDFs without external libraries: it walks the object graph,
inflates FlateDecode streams (zlib is stdlib), and interprets the text
operators (Tj/TJ/'/") of content streams, inserting line breaks on text
positioning (Td/TD/T*).

Limitations (by design, documented): no OCR, no encrypted files, and
subset fonts with custom CMaps decode approximately.  Scanned PDFs fall
through to the next parser in the chain (reference DocParser fallback
semantics, fileparser/file_parser.py:47-116).
"""

from __future__ import annotations

import re
import zlib

from super_rag_tpu.fileparser.base import BaseParser, Part, TextPart

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.S)
# text-showing operators inside BT..ET blocks
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
_OP_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?:Tj|')"  # (string) Tj / '
    rb"|<(?P<hex>[0-9A-Fa-f\s]+)>\s*Tj"  # <hex> Tj
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"  # [(a) -120 (b)] TJ
    rb"|(?P<nl>T\*|TD|Td|TL)"  # line movements
)
_ARR_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]+>")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                    j += 1
                try:
                    out.append(int(raw[i + 1 : j], 8) & 0xFF)
                except ValueError:
                    pass
                i = j
                continue
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1", errors="replace")


def _decode_hex(raw: bytes) -> str:
    clean = re.sub(rb"\s", b"", raw)
    if len(clean) % 2:
        clean += b"0"
    try:
        data = bytes.fromhex(clean.decode("ascii"))
    except ValueError:
        return ""
    # UTF-16BE CID text (2-byte codes) decodes readably for Latin ranges;
    # otherwise treat as latin-1
    if len(data) >= 2 and data[0] == 0 and len(data) % 2 == 0:
        try:
            return data.decode("utf-16-be", errors="replace")
        except UnicodeDecodeError:
            pass
    return data.decode("latin-1", errors="replace")


def _text_from_content(content: bytes) -> str:
    pieces: list[str] = []
    for block in _BT_RE.findall(content):
        for m in _OP_RE.finditer(block):
            if m.group("lit") is not None:
                pieces.append(_decode_literal(m.group("lit")))
            elif m.group("hex") is not None:
                pieces.append(_decode_hex(m.group("hex")))
            elif m.group("arr") is not None:
                for s in _ARR_STR_RE.findall(m.group("arr")):
                    if s.startswith(b"("):
                        pieces.append(_decode_literal(s[1:-1]))
                    else:
                        pieces.append(_decode_hex(s[1:-1]))
            elif m.group("nl") is not None:
                pieces.append("\n")
        pieces.append("\n")
    text = "".join(pieces)
    text = re.sub(r"[ \t]+", " ", text)
    return re.sub(r"\n{3,}", "\n\n", text).strip()


def extract_pdf_text(data: bytes) -> str:
    if b"/Encrypt" in data[:4096] or b"/Encrypt" in data[-4096:]:
        raise ValueError("encrypted PDFs are not supported")
    chunks: list[str] = []
    for _num, body in _OBJ_RE.findall(data):
        m = _STREAM_RE.search(body)
        if m:
            raw = m.group(1)
            if b"/FlateDecode" in body:
                try:
                    raw = zlib.decompress(raw)
                except zlib.error:
                    continue
            if b"BT" in raw and (b"Tj" in raw or b"TJ" in raw):
                t = _text_from_content(raw)
                if t:
                    chunks.append(t)
        elif b"BT" in body and (b"Tj" in body or b"TJ" in body):
            t = _text_from_content(body)
            if t:
                chunks.append(t)
    text = "\n\n".join(chunks).strip()
    if not text:
        raise ValueError(
            "no extractable text (scanned or custom-encoded PDF)"
        )
    return text


_IMG_DICT_RE = re.compile(rb"/Subtype\s*/Image")
_WH_RE = re.compile(rb"/Width\s+(\d+).*?/Height\s+(\d+)", re.S)


def extract_pdf_images(data: bytes) -> list[tuple[str, bytes]]:
    """Embedded image XObjects as (mime_type, bytes).

    Scanned PDFs are usually one full-page image per page: DCTDecode
    streams ARE JPEG files (returned verbatim); FlateDecode raw bitmaps
    are reconstructed into PNGs via PIL when the dict gives a decodable
    geometry.  Counterpart of the reference's per-page pdfium rendering
    (index/document_parser.py:88-120) within this image's constraints.
    """
    images: list[tuple[str, bytes]] = []
    for _num, body in _OBJ_RE.findall(data):
        if not _IMG_DICT_RE.search(body):
            continue
        m = _STREAM_RE.search(body)
        if not m:
            continue
        raw = m.group(1)
        if b"/DCTDecode" in body:
            images.append(("image/jpeg", raw))
            continue
        if b"/FlateDecode" in body:
            try:
                pixels = zlib.decompress(raw)
            except zlib.error:
                continue
            wh = _WH_RE.search(body)
            if not wh:
                continue
            w, h = int(wh.group(1)), int(wh.group(2))
            mode = None
            if b"/DeviceRGB" in body and len(pixels) >= w * h * 3:
                mode = "RGB"
            elif b"/DeviceGray" in body and len(pixels) >= w * h:
                mode = "L"
            if mode is None:
                continue
            try:
                from PIL import Image
                import io

                img = Image.frombytes(mode, (w, h),
                                      pixels[: w * h * len(mode)])
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                images.append(("image/png", buf.getvalue()))
            except Exception:  # noqa: BLE001 — skip undecodable bitmaps
                continue
    return images


class PdfParser(BaseParser):
    supported_extensions = (".pdf",)

    def parse_file(self, path: str, data: bytes | None = None) -> list[Part]:
        if data is None:
            with open(path, "rb") as f:
                data = f.read()
        if not data.startswith(b"%PDF"):
            raise ValueError("not a PDF file")
        from super_rag_tpu.fileparser.base import AssetBinPart, ImagePart
        import hashlib

        parts: list[Part] = []
        images = extract_pdf_images(data)
        try:
            parts.append(TextPart(content=extract_pdf_text(data)))
        except ValueError:
            # image-only (scanned) PDF: OCR the page images when an
            # engine exists (fileparser/ocr.py — tesseract/pytesseract);
            # with none installed the vision caption ladder still
            # indexes the pages (index/vision.py), as before
            from super_rag_tpu.fileparser.ocr import default_ocr, ocr_images

            if images and default_ocr() is not None:
                page_texts = [t for t in ocr_images(images) if t]
                if page_texts:
                    parts.append(TextPart(content="\n\n".join(page_texts)))
        for j, (mime, blob) in enumerate(images):
            asset_id = hashlib.sha256(blob).hexdigest()[:16]
            parts.append(AssetBinPart(data=blob, mime_type=mime,
                                      asset_id=asset_id))
            parts.append(ImagePart(content=f"page image {j + 1}",
                                   url=f"asset://{asset_id}"))
        if not parts:
            raise ValueError(
                "no extractable text or images (encrypted or unsupported "
                "encoding)"
            )
        return parts
