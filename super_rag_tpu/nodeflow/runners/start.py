"""Start node: echoes the system query (reference runners/start.py:21-27)."""

from __future__ import annotations

from pydantic import BaseModel

from super_rag_tpu.nodeflow.models import register_node_runner
from super_rag_tpu.nodeflow.types import StartOutput


class StartInput(BaseModel):
    query: str = ""


@register_node_runner("start", StartInput, StartOutput,
                      title="Start", description="Entry point: emits the query")
async def run(node, inputs: StartInput, ctx) -> StartOutput:
    return StartOutput(query=inputs.query or ctx.system_input.query)
