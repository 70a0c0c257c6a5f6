"""Prometheus metrics, shared across the pipeline.

Parity with the reference's telemetry/metrics.py:43-193: pipeline-wide
metrics labeled (run_id, node, service), idempotent registration so test
reloads don't raise (reference metrics.py:18-38), /metrics exposition on
every node.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

from prometheus_client import (
    REGISTRY,
    CollectorRegistry,
    Counter,
    Gauge,
    Histogram,
    generate_latest,
)

CONTENT_TYPE_LATEST = "text/plain; version=0.0.4; charset=utf-8"

_LAT_BUCKETS = (
    0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5,
    5.0, 10.0, 30.0,
)


def get_metric(
    cls,
    name: str,
    doc: str,
    labels: Iterable[str] = (),
    registry: CollectorRegistry = REGISTRY,
    **kwargs,
):
    """Create-or-return a collector; duplicate registration is a lookup."""
    try:
        return cls(name, doc, list(labels), registry=registry, **kwargs)
    except ValueError:
        collector = registry._names_to_collectors.get(name)
        if collector is None:
            raise
        return collector


REQUESTS_TOTAL = get_metric(
    Counter, "pipeline_requests_total", "Requests by service and status",
    ["run_id", "node", "service", "status"],
)
REQUEST_LATENCY = get_metric(
    Histogram, "pipeline_request_latency_seconds", "End-to-end request latency",
    ["run_id", "node", "service"], buckets=_LAT_BUCKETS,
)
STAGE_DURATION = get_metric(
    Histogram, "pipeline_stage_duration_seconds", "Per-stage duration",
    ["run_id", "node", "service", "stage"], buckets=_LAT_BUCKETS,
)
BATCH_SIZE = get_metric(
    Histogram, "pipeline_batch_size", "Processed batch sizes",
    ["run_id", "node", "service"],
    buckets=(1, 2, 4, 8, 16, 32, 64, 128, 256),
)
BATCH_FLUSH = get_metric(
    Counter, "pipeline_batch_flush_total", "Batch flushes by reason",
    ["run_id", "node", "service", "reason"],
)
BATCH_WAIT = get_metric(
    Histogram, "pipeline_batch_wait_seconds",
    "First-enqueue-to-flush wait per batch (the queueing share of p50)",
    ["run_id", "node", "service"], buckets=_LAT_BUCKETS,
)
QUEUE_DEPTH = get_metric(
    Gauge, "pipeline_queue_depth", "Scheduler queue depth",
    ["run_id", "node", "service"],
)
CACHE_EVENTS = get_metric(
    Counter, "pipeline_cache_events_total", "Cache hits/misses/evictions",
    ["run_id", "node", "cache", "event"],
)
RPC_DURATION = get_metric(
    Histogram, "pipeline_rpc_duration_seconds", "Inter-node RPC duration",
    ["run_id", "node", "target"], buckets=_LAT_BUCKETS,
)
ERRORS_TOTAL = get_metric(
    Counter, "pipeline_errors_total", "Errors by type",
    ["run_id", "node", "service", "error_type"],
)
COMPRESSION_RATIO = get_metric(
    Histogram, "pipeline_compression_ratio", "Payload compression ratio",
    ["run_id", "node", "direction"],
    buckets=(1.0, 1.5, 2.0, 3.0, 5.0, 10.0, 25.0),
)
MEMORY_RSS = get_metric(
    Gauge, "pipeline_memory_rss_bytes", "Process RSS", ["run_id", "node"],
)
DEVICE_MEMORY = get_metric(
    Gauge, "pipeline_device_memory_bytes", "Per-device HBM in use",
    ["run_id", "node", "device"],
)
TOKENS_GENERATED = get_metric(
    Counter, "pipeline_tokens_generated_total", "LLM tokens emitted",
    ["run_id", "node"],
)
ENGINE_LANES_ACTIVE = get_metric(
    Gauge, "pipeline_engine_lanes_active",
    "Continuous-batching decode lanes currently holding a request",
    ["run_id", "node"],
)
ENGINE_SEGMENTS = get_metric(
    Counter, "pipeline_engine_segments_total",
    "Decode-engine segments dispatched", ["run_id", "node"],
)


def render_metrics() -> bytes:
    return generate_latest(REGISTRY)


def update_resource_gauges(run_id: str, node: str) -> None:
    """RSS + device memory snapshot (reference gateway/api.py:47-57)."""
    try:
        import psutil

        MEMORY_RSS.labels(run_id, node).set(
            psutil.Process(os.getpid()).memory_info().rss
        )
    except Exception:  # noqa: BLE001 — psutil absence must not break serving
        pass
    try:
        import jax

        for d in jax.local_devices():
            stats = d.memory_stats() or {}
            if "bytes_in_use" in stats:
                DEVICE_MEMORY.labels(run_id, node, str(d.id)).set(
                    stats["bytes_in_use"]
                )
    except Exception:  # noqa: BLE001
        pass
