from super_rag_tpu.nodeflow.models import (
    Edge,
    ExecutionContext,
    NodeInstance,
    NodeflowInstance,
    SystemInput,
    register_node_runner,
    NODE_RUNNER_REGISTRY,
)
from super_rag_tpu.nodeflow.engine import NodeflowEngine
from super_rag_tpu.nodeflow.parser import NodeflowParser

__all__ = [
    "Edge",
    "ExecutionContext",
    "NodeInstance",
    "NodeflowInstance",
    "SystemInput",
    "register_node_runner",
    "NODE_RUNNER_REGISTRY",
    "NodeflowEngine",
    "NodeflowParser",
]
