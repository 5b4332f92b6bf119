from super_rag_tpu.tasks.scheduler import (
    InProcessScheduler,
    ProcessScheduler,
    TaskScheduler,
    ThreadScheduler,
)
from super_rag_tpu.tasks.reconciler import DocumentIndexReconciler

__all__ = [
    "TaskScheduler",
    "InProcessScheduler",
    "ProcessScheduler",
    "ThreadScheduler",
    "DocumentIndexReconciler",
]
