"""Document index tasks: parse -> chunk -> embed -> device insert.

Counterpart of the reference's Ray task bodies (tasks/document.py:12-240
and tasks/utils.py:6-55): the parse step pulls the original from the
object store and produces Parts; create_index chunks, embeds on device,
and inserts into the collection's DeviceIndex, recording the engine row
ids in DocumentIndex.index_data (the reference stores SeekDB ctx_ids the
same way — index/vector_and_full_text_index.py:104-129) so update/delete
are exact.
"""

from __future__ import annotations

import logging

from super_rag_tpu.chunk.chunking import Rechunker
from super_rag_tpu.config import Settings
from super_rag_tpu.engine.manager import EngineManager
from super_rag_tpu.fileparser.parser import DocParser
from super_rag_tpu.store.db import Database
from super_rag_tpu.store.objectstore import ObjectStore

logger = logging.getLogger(__name__)


def _live_engine_rows(engine, document_id: str, index_type: str) -> list[int]:
    """All alive engine rows for (document, index_type) by row metadata.

    The index_data spec row can under-report: if a v1 create commits after
    v2 was claimed, the reconciler's CAS drops v1's completion as stale and
    its engine rows are never recorded — delete-by-index_data alone would
    leave them searchable forever.  Scanning live row_meta makes
    create_index idempotent against ANY orphaned rows of this document.
    """
    import numpy as np

    from super_rag_tpu.engine.index import INDEXER_CODES

    idx = engine.index
    code = INDEXER_CODES.get(index_type)
    codes = None
    if code is not None and idx.size:
        codes = np.asarray(idx.indexer_code[: idx.size])
    rows = []
    for r, meta in enumerate(idx.row_meta):
        if meta is None or meta.get("document_id") != document_id:
            continue
        if codes is not None and r < len(codes) and int(codes[r]) != code:
            continue
        rows.append(r)
    return rows


class DocumentIndexTask:
    def __init__(self, db: Database, objects: ObjectStore,
                 engines: EngineManager, cfg: Settings):
        self.db = db
        self.objects = objects
        self.engines = engines
        self.cfg = cfg
        self.parser = DocParser()
        self.ctx = None  # backfilled by service.context.build_context

    def _load_parts(self, document: dict):
        data = self.objects.get(document["object_path"])
        return self.parser.parse_file(document["name"], data)

    def prepare(self, document_id: str, index_type: str) -> dict:
        """Host-side stage of create_index — parse + chunk, the CPU-bound
        work safe to run on a worker pool while the device worker embeds
        a previous document (ThreadScheduler host_workers pipelining).
        Returns the payload ``create_index`` accepts as ``prepared``."""
        doc = self.db.get_document(document_id)
        if doc is None:
            raise ValueError(f"document {document_id} not found")
        parts = self._load_parts(doc)
        chunker = Rechunker(self.cfg.chunk_size, self.cfg.chunk_overlap)
        chunks = chunker.rechunk(parts, metadata={"document_id": document_id})
        return {"document_id": document_id, "index_type": index_type,
                "doc_hash": doc.get("content_hash"), "parts": parts,
                "chunks": chunks}

    def create_index(self, document_id: str, index_type: str,
                     version: int, prepared: dict | None = None) -> dict:
        """Parse + chunk + embed + insert; returns index_data for the spec
        row.  Idempotent per (document, version): any rows from a prior
        version are removed first.  ``prepared`` (from :meth:`prepare`)
        skips the parse/chunk stage when it matches this document."""
        doc = self.db.get_document(document_id)
        if doc is None:
            raise ValueError(f"document {document_id} not found")
        coll = self.db.get_collection(doc["collection_id"])
        engine = self.engines.get(coll["id"], coll["config"])

        # delete rows of the previous version (update = delete + recreate,
        # reference index/vector_and_full_text_index.py:89-166)
        spec_row = self.db.query_one(
            "SELECT * FROM document_index WHERE document_id=? AND index_type=?",
            (document_id, index_type),
        )
        import json as _json

        old_rows = []
        if spec_row and spec_row.get("index_data"):
            old_rows = _json.loads(spec_row["index_data"]).get("rows", [])
        # union with a live-row scan: rows inserted by a superseded version
        # whose completion lost the CAS race are in the engine but not in
        # index_data (ADVICE r2) — delete them too or they stay searchable
        old_rows = sorted(
            set(old_rows) | set(_live_engine_rows(engine, document_id,
                                                  index_type))
        )
        if old_rows:
            engine.delete(old_rows)

        if (prepared is not None
                and prepared.get("document_id") == document_id
                and prepared.get("doc_hash") == doc.get("content_hash")):
            parts, chunks = prepared["parts"], prepared["chunks"]
        else:
            parts = self._load_parts(doc)
            chunker = Rechunker(self.cfg.chunk_size, self.cfg.chunk_overlap)
            chunks = chunker.rechunk(parts,
                                     metadata={"document_id": document_id})
        if not chunks and index_type != "vision":
            # image-only documents (scanned PDFs) have no text chunks but
            # still produce vision rows from their image parts
            return {"rows": [], "chunks": 0}

        if index_type == "summary":
            from super_rag_tpu.index.summary import summarize_document

            completion = getattr(self.ctx, "completion", None)
            summary = summarize_document(
                [c.text for c in chunks], completion=completion,
                title=doc["name"],
            )
            rows = engine.ingest(
                [summary],
                metadata=[{"document_id": document_id,
                           "collection_id": coll["id"],
                           "document_name": doc["name"],
                           "title_path": "", "chunk_index": 0}],
                indexer="summary",
                chat_id=doc.get("chat_id"),
            )
            return {"rows": rows, "chunks": 1}

        if index_type == "vision":
            import numpy as np

            from super_rag_tpu.index.vision import vision_rows
            from super_rag_tpu.models.image_embedder import ImageEmbedder

            rows_data = vision_rows(
                parts,
                vision_completion=getattr(self.ctx, "completion", None),
                doc_name=doc["name"],
            )
            if not rows_data:
                return {"rows": [], "chunks": 0}
            # dense vector ladder (reference index/vision_index.py:33-39):
            # image embedding when the asset bytes are available (the
            # multimodal-embedding analog), else caption text embedding
            img_embedder = ImageEmbedder(dim=engine.index.spec.dim)
            emb = np.zeros((len(rows_data), engine.index.spec.dim),
                           np.float32)
            with_data = [j for j, r in enumerate(rows_data) if r["data"]]
            if with_data:
                emb[with_data] = img_embedder.embed(
                    [rows_data[j]["data"] for j in with_data]
                )
            text_only = [j for j in range(len(rows_data))
                         if j not in set(with_data) or not emb[j].any()]
            if text_only:
                emb[text_only] = np.asarray(engine.embedder.embed(
                    [rows_data[j]["text"] for j in text_only]
                ))
            for r in rows_data:  # assets retrievable for preview/display
                if r["data"]:
                    self.objects.put(
                        f"assets/{document_id}/{r['asset_id']}", r["data"]
                    )
            rows = engine.ingest(
                [r["text"] for r in rows_data],
                metadata=[
                    {"document_id": document_id, "collection_id": coll["id"],
                     "document_name": doc["name"],
                     "asset_id": r["asset_id"],
                     "mime_type": r.get("mime_type"), "title_path": "",
                     "chunk_index": j}
                    for j, r in enumerate(rows_data)
                ],
                indexer="vision",
                chat_id=doc.get("chat_id"),
                embeddings=emb,
            )
            return {"rows": rows, "chunks": len(rows)}

        if index_type == "graph":
            kg = getattr(self.ctx, "kg", None)
            if kg is None:
                raise ValueError("graph index requires the kg service")
            # bulk path: one extraction pass + one batched device write
            # for the whole document (graphiti add_episode_bulk parity)
            # per-collection entity ontology (CollectionConfig.
            # kg_entity_types) — graphiti's custom entity types
            # (graphiti_core/prompts/extract_nodes.py entity_types)
            from super_rag_tpu.kg.extract import Ontology

            _cfg = coll.get("config") or {}
            if isinstance(_cfg, str):
                import json as _json

                try:
                    _cfg = _json.loads(_cfg)
                except ValueError:
                    _cfg = {}
            r = kg.add_episode_bulk(
                coll["id"], [c.text for c in chunks], source=document_id,
                ontology=Ontology.from_config(_cfg.get("kg_entity_types")),
            )
            return {"rows": [], "episodes": r["episode_ids"],
                    "chunks": len(chunks)}

        rows = engine.ingest(
            [c.padded_text for c in chunks],
            metadata=[
                {**c.metadata, "document_id": document_id,
                 "collection_id": coll["id"], "document_name": doc["name"]}
                for c in chunks
            ],
            indexer="vector",
            chat_id=doc.get("chat_id"),
        )
        return {"rows": rows, "chunks": len(chunks)}

    def delete_index(self, document_id: str, index_type: str) -> None:
        doc = self.db.get_document(document_id)
        if doc is None:
            return
        spec_row = self.db.query_one(
            "SELECT * FROM document_index WHERE document_id=? AND index_type=?",
            (document_id, index_type),
        )
        import json as _json

        data = (
            _json.loads(spec_row["index_data"])
            if spec_row and spec_row.get("index_data")
            else {}
        )
        rows = data.get("rows", [])
        if rows:
            coll = self.db.get_collection(doc["collection_id"])
            engine = self.engines.get(coll["id"], coll["config"] if coll else {})
            engine.delete(rows)
        kg = getattr(self.ctx, "kg", None)
        if kg is not None:
            for eid in data.get("episodes", []):
                kg.delete_episode(doc["collection_id"], eid)
