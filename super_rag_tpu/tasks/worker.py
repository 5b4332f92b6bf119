"""Out-of-process ingest worker: the cross-process half of
ProcessScheduler (tasks/scheduler.py).

The reference fans parse/chunk out over Ray remote tasks
(config/ray_tasks.py); Ray is absent from this image, so this module IS
the remote task body: a subprocess that speaks JSON-lines over
stdin/stdout — one request per line, one response per line — and runs
the host-side ``prepare`` stage (object fetch -> parse -> chunk).  The
device-side commit stays in the parent (the TPU engine is in-process
there), exactly like Ray workers feeding a central SeekDB.

Running it as a real OS process proves the scheduler contract
*serializes*: documents go in and Parts/Chunks come back over a pipe, so
a Ray (or any RPC) backend can drop in behind the same TaskScheduler ABC
without discovering unpicklable payloads in production.

This module must stay importable WITHOUT jax — the worker does host work
only.
"""

from __future__ import annotations

import base64
import json
import sys
from typing import Any, Optional

from super_rag_tpu.chunk.chunking import Chunk, Rechunker
from super_rag_tpu.fileparser.base import AssetBinPart, Part
from super_rag_tpu.fileparser.parser import DocParser
from super_rag_tpu.store.db import Database
from super_rag_tpu.store.objectstore import LocalObjectStore, get_object_store


# -- wire format (JSON-safe Parts/Chunks) ------------------------------------


def part_to_wire(p: Part) -> dict:
    if isinstance(p, AssetBinPart):
        return {"kind": "AssetBinPart", "content": p.content,
                "metadata": p.metadata, "mime_type": p.mime_type,
                "asset_id": p.asset_id,
                "data_b64": base64.b64encode(p.data).decode()}
    return p.to_dict()


def part_from_wire(d: dict) -> Part:
    if d.get("kind") == "AssetBinPart":
        return AssetBinPart(
            content=d.get("content", ""), metadata=d.get("metadata", {}),
            mime_type=d.get("mime_type", "application/octet-stream"),
            asset_id=d.get("asset_id", ""),
            data=base64.b64decode(d.get("data_b64", "")),
        )
    return Part.from_dict(d)


def chunk_to_wire(c: Chunk) -> dict:
    return {"text": c.text, "title_path": list(c.title_path),
            "metadata": c.metadata}


def chunk_from_wire(d: dict) -> Chunk:
    return Chunk(text=d["text"], title_path=tuple(d.get("title_path", ())),
                 metadata=d.get("metadata", {}))


def prepared_to_wire(prepared: dict) -> dict:
    return {
        "document_id": prepared["document_id"],
        "index_type": prepared["index_type"],
        "doc_hash": prepared.get("doc_hash"),
        "parts": [part_to_wire(p) for p in prepared["parts"]],
        "chunks": [chunk_to_wire(c) for c in prepared["chunks"]],
    }


def prepared_from_wire(d: dict) -> dict:
    return {
        "document_id": d["document_id"],
        "index_type": d["index_type"],
        "doc_hash": d.get("doc_hash"),
        "parts": [part_from_wire(p) for p in d.get("parts", [])],
        "chunks": [chunk_from_wire(c) for c in d.get("chunks", [])],
    }


# -- worker body --------------------------------------------------------------


def prepare_on_host(
    document_id: str,
    index_type: str,
    db_path: str,
    object_store: Optional[dict] = None,
    objects_root: str = "",
    chunk_size: int = 400,
    chunk_overlap: int = 20,
) -> dict:
    """The remote-task body (reference config/ray_tasks.py parse/chunk
    stage): object fetch -> parse -> chunk, returning the JSON-safe wire
    dict.  Module-level and jax-free so ANY execution plane can run it —
    the pipe worker below, a Ray remote (RayTaskScheduler), or an RPC
    handler."""
    db = Database(db_path)
    try:
        if object_store:
            objects = get_object_store(**object_store)
        else:  # pre-wire_config clients
            objects = LocalObjectStore(objects_root)
        doc = db.get_document(document_id)
        if doc is None:
            raise ValueError(f"document {document_id} not found")
        data = objects.get(doc["object_path"])
        parts = DocParser().parse_file(doc["name"], data)
        chunker = Rechunker(int(chunk_size), int(chunk_overlap))
        chunks = chunker.rechunk(
            parts, metadata={"document_id": document_id}
        )
        return prepared_to_wire({
            "document_id": document_id,
            "index_type": index_type,
            "doc_hash": doc.get("content_hash"),
            "parts": parts, "chunks": chunks,
        })
    finally:
        db.close()


def handle(req: dict) -> dict:
    op = req.get("op")
    if op == "ping":
        return {"ok": True, "pong": True}
    if op == "prepare":
        return {"ok": True, "prepared": prepare_on_host(
            req["document_id"], req["index_type"], req["db_path"],
            object_store=req.get("object_store"),
            objects_root=req.get("objects_root", ""),
            chunk_size=int(req.get("chunk_size", 400)),
            chunk_overlap=int(req.get("chunk_overlap", 20)),
        )}
    return {"ok": False, "error": f"unknown op: {op}"}


def main() -> None:
    out = sys.stdout
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req: Any = json.loads(line)
            resp = handle(req)
        except Exception as e:  # noqa: BLE001 — report, keep serving
            resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        out.write(json.dumps(resp) + "\n")
        out.flush()


if __name__ == "__main__":
    main()
