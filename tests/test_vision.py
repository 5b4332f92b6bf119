"""Vision tier: scanned-PDF image extraction, perceptual image embedding,
and image->image retrieval (VERDICT r1 missing #3/#6)."""

import io
import zlib

import numpy as np
import pytest

from super_rag_tpu.fileparser.base import AssetBinPart, ImagePart, TextPart
from super_rag_tpu.fileparser.pdf import PdfParser, extract_pdf_images
from super_rag_tpu.models.image_embedder import ImageEmbedder


def _jpeg(color, size=(96, 64), noise_seed=None):
    from PIL import Image

    arr = np.zeros((size[1], size[0], 3), np.uint8)
    arr[:] = color
    if noise_seed is not None:
        rng = np.random.default_rng(noise_seed)
        arr = np.clip(
            arr.astype(int) + rng.integers(-20, 20, arr.shape), 0, 255
        ).astype(np.uint8)
    # structured content so DCT features are non-trivial
    arr[:: 8] = 255 - arr[:: 8]
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def _scanned_pdf(jpegs):
    """Minimal PDF whose pages are JPEG image XObjects and no text layer
    (the scanned-document shape)."""
    objs = []
    for j, data in enumerate(jpegs):
        objs.append(
            b"%d 0 obj\n<< /Subtype /Image /Width 96 /Height 64 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
            b"/Filter /DCTDecode /Length %d >>\nstream\n" % (j + 10, len(data))
            + data + b"\nendstream\nendobj\n"
        )
    return b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"


def test_extract_pdf_images_dct():
    jpeg = _jpeg((200, 30, 30))
    images = extract_pdf_images(_scanned_pdf([jpeg]))
    assert len(images) == 1
    mime, blob = images[0]
    assert mime == "image/jpeg" and blob == jpeg


def test_scanned_pdf_parses_to_image_parts():
    pdf = _scanned_pdf([_jpeg((200, 30, 30)), _jpeg((30, 30, 200))])
    parts = PdfParser().parse_file("scan.pdf", pdf)
    imgs = [p for p in parts if isinstance(p, ImagePart)]
    bins = [p for p in parts if isinstance(p, AssetBinPart)]
    assert len(imgs) == 2 and len(bins) == 2
    assert not any(isinstance(p, TextPart) for p in parts)
    assert imgs[0].url.startswith("asset://")


def test_pdf_with_text_still_attaches_images():
    # text-layer PDF from test_pdf.py conventions + an image object
    text_obj = (
        b"5 0 obj\n<< /Length 60 >>\nstream\n"
        b"BT /F1 12 Tf (hello pelican world) Tj ET\nendstream\nendobj\n"
    )
    jpeg = _jpeg((90, 180, 90))
    pdf = b"%PDF-1.4\n" + text_obj + _scanned_pdf([jpeg])[len(b"%PDF-1.4\n"):]
    parts = PdfParser().parse_file("mixed.pdf", pdf)
    assert any(isinstance(p, TextPart) and "pelican" in p.content
               for p in parts)
    assert any(isinstance(p, ImagePart) for p in parts)


def test_flatedecode_bitmap_extraction():
    w, h = 32, 16
    pixels = bytes(range(256)) * (w * h * 3 // 256)
    stream = zlib.compress(pixels)
    pdf = (
        b"%PDF-1.4\n7 0 obj\n<< /Subtype /Image /Width 32 /Height 16 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode "
        b">>\nstream\n" + stream + b"\nendstream\nendobj\n%%EOF"
    )
    images = extract_pdf_images(pdf)
    assert len(images) == 1 and images[0][0] == "image/png"


def test_image_embedder_similarity_structure():
    emb = ImageEmbedder(dim=64)
    red1 = _jpeg((200, 30, 30), noise_seed=1)
    red2 = _jpeg((200, 30, 30), noise_seed=2)  # same scene, different noise
    blue = _jpeg((30, 30, 200), noise_seed=3)
    # different CONTENT structure, not just color: stripes vs flat
    from PIL import Image

    rng = np.random.default_rng(9)
    arr = (rng.random((64, 96)) > 0.5).astype(np.uint8) * 255
    buf = io.BytesIO()
    Image.fromarray(arr).convert("RGB").save(buf, format="JPEG")
    speckle = buf.getvalue()

    v = emb.embed([red1, red2, blue, speckle])
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    same = float(v[0] @ v[1])
    cross = float(v[0] @ v[3])
    assert same > cross + 0.2, (same, cross)


def test_image_embedder_bad_bytes():
    v = ImageEmbedder(dim=32).embed([b"not an image"])
    assert v.shape == (1, 32) and not v.any()


def test_end_to_end_scanned_pdf_vision_search(tmp_path):
    """Image-only PDF ingests; retrievable via indexer=vision filter and
    via image->image search (VERDICT item 8 done-criterion)."""
    import jax.numpy as jnp

    from super_rag_tpu.engine.collection import CollectionEngine
    from super_rag_tpu.engine.index import IndexSpec
    from super_rag_tpu.index.vision import vision_rows

    eng = CollectionEngine(IndexSpec(dim=64, dtype=jnp.float32,
                                     vocab_size=1 << 14))
    # text rows so the index is mixed
    eng.ingest(["a plain text document about pelicans"])

    scan_a = _jpeg((200, 30, 30), noise_seed=4)
    scan_b = _jpeg((30, 200, 30), noise_seed=5)
    parts = PdfParser().parse_file("scan.pdf", _scanned_pdf([scan_a, scan_b]))
    rows = vision_rows(parts, doc_name="scan.pdf")
    assert len(rows) == 2 and rows[0]["data"]

    from super_rag_tpu.models.image_embedder import ImageEmbedder

    emb = ImageEmbedder(dim=64).embed([r["data"] for r in rows])
    eng.ingest([r["text"] for r in rows],
               metadata=[{"asset_id": r["asset_id"]} for r in rows],
               indexer="vision", embeddings=emb)

    # text search with the vision filter finds the captions
    hits = eng.search("scan.pdf image", top_k=3, index_types=["vision"])
    assert hits and all(h.metadata.get("asset_id") for h in hits)

    # image query: a re-compressed variant of scan_a must rank first
    query_img = _jpeg((200, 30, 30), noise_seed=6)
    ih = eng.search_by_image(query_img, top_k=2)
    assert ih and ih[0].metadata["asset_id"] == rows[0]["asset_id"]
