"""OpenTelemetry tracing, off by default (reference telemetry/tracing.py:42-104:
OTLP gRPC exporter, FastAPI/httpx auto-instrumentation excluded for
/metrics & /health, manual spans at every stage).

Gated: when ENABLE_TRACING is false or the OTel SDK is unavailable, `span()`
is a no-op context manager, so call sites never branch.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Optional

logger = logging.getLogger(__name__)

_tracer = None


def setup_tracing(settings) -> bool:
    """Install a global TracerProvider with OTLP export. Returns enabled."""
    global _tracer
    if not settings.enable_tracing:
        return False
    try:
        from opentelemetry import trace
        from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (
            OTLPSpanExporter,
        )
        from opentelemetry.sdk.resources import Resource
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import BatchSpanProcessor

        provider = TracerProvider(
            resource=Resource.create(
                {
                    "service.name": f"ragtpu-node{settings.node_number}",
                    "service.version": "0.1.0",
                    "run.id": settings.run_id,
                }
            )
        )
        provider.add_span_processor(
            BatchSpanProcessor(OTLPSpanExporter(endpoint=settings.otlp_endpoint))
        )
        trace.set_tracer_provider(provider)
        _tracer = trace.get_tracer("ragtpu")
        logger.info("tracing enabled -> %s", settings.otlp_endpoint)
        return True
    except Exception:  # noqa: BLE001 — missing exporter wheels etc.
        logger.exception("tracing setup failed; continuing without")
        return False


@contextlib.contextmanager
def span(name: str, **attrs):
    """Manual stage span (no-op when tracing is off)."""
    if _tracer is None:
        yield None
        return
    with _tracer.start_as_current_span(name) as s:
        for k, v in attrs.items():
            s.set_attribute(k, v)
        yield s
