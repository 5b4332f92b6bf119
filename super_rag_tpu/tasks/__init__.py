from super_rag_tpu.tasks.scheduler import (
    InProcessScheduler,
    TaskScheduler,
    ThreadScheduler,
)
from super_rag_tpu.tasks.reconciler import DocumentIndexReconciler

__all__ = [
    "TaskScheduler",
    "InProcessScheduler",
    "ThreadScheduler",
    "DocumentIndexReconciler",
]
