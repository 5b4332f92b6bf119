"""Lightweight tracing (OpenTelemetry-shaped, stdlib-only).

Counterpart of the reference's trace/ package (telemetry.py init with
Jaeger/console/no-op exporters, utils.py get_tracer + @trace_function /
@trace_async_function decorators, trace-id propagation into chat
messages).  The OTel SDK is not in this image, so this module implements
the same surface: hierarchical spans via contextvars, W3C-style
trace/span ids, pluggable exporters (in-memory ring + logging), and — the
TPU-specific addition — an optional jax.profiler hook so a span can wrap
a device trace (SURVEY.md 5.1 'add jax.profiler traces for the kernel
path').
"""

from __future__ import annotations

import contextvars
import functools
import logging
import secrets
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

logger = logging.getLogger("super_rag_tpu.trace")

_current_span: contextvars.ContextVar[Optional["Span"]] = contextvars.ContextVar(
    "current_span", default=None
)


@dataclass
class Span:
    name: str
    trace_id: str
    span_id: str
    parent_id: Optional[str]
    start: float = field(default_factory=time.time)
    end: Optional[float] = None
    attributes: dict = field(default_factory=dict)
    status: str = "OK"

    @property
    def duration_ms(self) -> float:
        return ((self.end or time.time()) - self.start) * 1000.0

    def set_attribute(self, key: str, value: Any) -> None:
        self.attributes[key] = value

    def to_dict(self) -> dict:
        return {
            "name": self.name, "trace_id": self.trace_id,
            "span_id": self.span_id, "parent_id": self.parent_id,
            "start": self.start, "duration_ms": round(self.duration_ms, 3),
            "attributes": self.attributes, "status": self.status,
        }


class Tracer:
    def __init__(self, service_name: str = "super_rag_tpu",
                 max_spans: int = 10_000, log_spans: bool = False):
        self.service_name = service_name
        self.spans: deque[Span] = deque(maxlen=max_spans)
        self.log_spans = log_spans
        self._lock = threading.Lock()

    def start_span(self, name: str, attributes: Optional[dict] = None) -> "SpanContext":
        return SpanContext(self, name, attributes or {})

    def _record(self, span: Span) -> None:
        with self._lock:
            self.spans.append(span)
        if self.log_spans:
            logger.info("span %s %.2fms %s", span.name, span.duration_ms,
                        span.attributes)

    def current_trace_id(self) -> Optional[str]:
        span = _current_span.get()
        return span.trace_id if span else None

    def recent(self, limit: int = 100) -> list[dict]:
        with self._lock:
            return [s.to_dict() for s in list(self.spans)[-limit:]]


class SpanContext:
    def __init__(self, tracer: Tracer, name: str, attributes: dict):
        self.tracer = tracer
        self.name = name
        self.attributes = attributes
        self.span: Optional[Span] = None
        self._token = None

    def __enter__(self) -> Span:
        parent = _current_span.get()
        self.span = Span(
            name=self.name,
            trace_id=parent.trace_id if parent else secrets.token_hex(16),
            span_id=secrets.token_hex(8),
            parent_id=parent.span_id if parent else None,
            attributes=dict(self.attributes),
        )
        self._token = _current_span.set(self.span)
        return self.span

    def __exit__(self, exc_type, exc, tb):
        assert self.span is not None
        self.span.end = time.time()
        if exc_type is not None:
            self.span.status = "ERROR"
            self.span.attributes["error"] = str(exc)
        _current_span.reset(self._token)
        self.tracer._record(self.span)
        return False


_global_tracer: Optional[Tracer] = None


def get_tracer() -> Tracer:
    global _global_tracer
    if _global_tracer is None:
        _global_tracer = Tracer()
    return _global_tracer


def trace_function(name: Optional[str] = None,
                   device_profile_dir: Optional[str] = None):
    """Decorator: wrap a sync function in a span; optionally capture a
    jax.profiler trace of the call (kernel-path profiling)."""

    def deco(fn: Callable):
        span_name = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with get_tracer().start_span(span_name) as span:
                if device_profile_dir:
                    import jax

                    with jax.profiler.trace(device_profile_dir):
                        out = fn(*args, **kwargs)
                    span.set_attribute("jax_profile", device_profile_dir)
                    return out
                return fn(*args, **kwargs)

        return wrapped

    return deco


def trace_async_function(name: Optional[str] = None):
    def deco(fn: Callable):
        span_name = name or fn.__qualname__

        @functools.wraps(fn)
        async def wrapped(*args, **kwargs):
            with get_tracer().start_span(span_name):
                return await fn(*args, **kwargs)

        return wrapped

    return deco
