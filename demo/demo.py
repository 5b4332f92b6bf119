"""Demo: ingest one document, hybrid-search it (driver config #1).

Mirrors the reference's demo/demo.py flow — ingest a document with chunk
400/20, embed, exact cosine top-5, single collection — through the full
framework stack (metadata DB, object store, reconciler, device engine).

    python demo/demo.py [path/to/document.md] [query]
"""

from __future__ import annotations

import os
import sys
import tempfile

import jax


def main() -> None:
    from super_rag_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from super_rag_tpu.config import Settings
    from super_rag_tpu.service.collection_service import CollectionService
    from super_rag_tpu.service.context import build_context
    from super_rag_tpu.service.document_service import DocumentService

    doc_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "sample.md"
    )
    query = sys.argv[2] if len(sys.argv) > 2 else "how does hybrid search work"

    cfg = Settings(data_dir=tempfile.mkdtemp(prefix="super_rag_demo_"),
                   chunk_size=400, chunk_overlap=20)
    ctx = build_context(cfg)
    collections = CollectionService(ctx)
    documents = DocumentService(ctx, collections)

    print(f"backend: {jax.default_backend()}")
    coll = collections.create("demo", "demo-collection")
    with open(doc_path, "rb") as f:
        data = f.read()
    doc = documents.create("demo", coll["id"], os.path.basename(doc_path), data)
    print(f"ingested {doc['name']}: status={doc['status']}, "
          f"indexes={[(i['index_type'], i['status']) for i in doc['indexes']]}")

    chunks = documents.chunks("demo", doc["id"])
    print(f"chunks: {len(chunks)}")

    import asyncio

    result = asyncio.new_event_loop().run_until_complete(
        collections.execute_search("demo", coll["id"], query, top_k=5)
    )
    print(f"\nquery: {query!r}")
    for item in result["items"]:
        print(f"  #{item['rank']} score={item['score']:.4f} "
              f"[{item['recall_type']}] {item['text'][:80]!r}")


if __name__ == "__main__":
    main()
