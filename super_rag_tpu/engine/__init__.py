from super_rag_tpu.engine.index import DeviceIndex, IndexSpec, FilterSpec
from super_rag_tpu.engine.collection import CollectionEngine

__all__ = ["DeviceIndex", "IndexSpec", "FilterSpec", "CollectionEngine"]
