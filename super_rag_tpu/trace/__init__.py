from super_rag_tpu.trace.tracing import (
    Span,
    Tracer,
    get_tracer,
    trace_function,
    trace_async_function,
)

__all__ = ["Span", "Tracer", "get_tracer", "trace_function",
           "trace_async_function"]
