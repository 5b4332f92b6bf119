from super_rag_tpu.store.db import Database
from super_rag_tpu.store.objectstore import LocalObjectStore, get_object_store

__all__ = ["Database", "LocalObjectStore", "get_object_store"]
