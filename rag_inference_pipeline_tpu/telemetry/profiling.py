"""Sampled per-stage profiling + resource snapshots + jax.profiler capture.

Reference parity (src/pipeline/telemetry/profiling.py:43-227): per-request
sampling decision at PROFILING_SAMPLE_RATE, context-manager `track(stage)`
capturing duration and RSS delta, summary emitted as a structured JSON log
line. The Scalene whole-process analog on TPU is `jax.profiler` trace
capture (start_trace/stop_trace), exposed via `DeviceTraceCapture`.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import random
import time
from typing import Optional

logger = logging.getLogger(__name__)


def get_resource_snapshot() -> dict:
    """RSS/CPU snapshot (reference profiling.py:200-227)."""
    out: dict = {"ts": time.time()}
    try:
        import psutil

        p = psutil.Process(os.getpid())
        mi = p.memory_info()
        out["rss_mb"] = mi.rss / 1e6
        out["vms_mb"] = mi.vms / 1e6
        out["cpu_percent"] = p.cpu_percent(interval=None)
    except Exception:  # noqa: BLE001
        pass
    return out


class _NullProfile:
    @contextlib.contextmanager
    def track(self, stage: str):  # noqa: ARG002
        yield

    def finish(self) -> None:
        pass


class _ActiveProfile:
    def __init__(
        self, service: str, metric_labels: Optional[tuple] = None
    ) -> None:
        self.service = service
        self.metric_labels = metric_labels
        self.stages: list[dict] = []
        self._t0 = time.monotonic()

    @contextlib.contextmanager
    def track(self, stage: str):
        start = time.monotonic()
        rss0 = get_resource_snapshot().get("rss_mb", 0.0)
        try:
            yield
        finally:
            dur = time.monotonic() - start
            self.stages.append(
                {
                    "stage": stage,
                    "duration_ms": dur * 1e3,
                    "rss_delta_mb": get_resource_snapshot().get("rss_mb", 0.0)
                    - rss0,
                }
            )
            if self.metric_labels is not None:
                # sampled stages also land in Prometheus so the Grafana
                # per-stage rows (fused:device_step, classify, ...) work
                # without log scraping
                from .metrics import STAGE_DURATION

                STAGE_DURATION.labels(
                    *self.metric_labels, stage
                ).observe(dur)

    def finish(self) -> None:
        logger.info(
            "profile_summary %s",
            json.dumps(
                {
                    "service": self.service,
                    "total_ms": (time.monotonic() - self._t0) * 1e3,
                    "stages": self.stages,
                }
            ),
        )


class SampledStageProfiler:
    """maybe_start() -> profile object; no-op unless sampled."""

    def __init__(self, settings, service: str) -> None:
        self.enabled = settings.enable_profiling
        self.rate = settings.profiling_sample_rate
        self.service = service
        self._labels = (
            settings.run_id, str(settings.node_number), service,
        )
        self._null = _NullProfile()

    def maybe_start(self):
        if self.enabled and random.random() < self.rate:
            return _ActiveProfile(self.service, self._labels)
        return self._null


class DeviceTraceCapture:
    """jax.profiler trace capture — the Scalene analog (reference run.sh:19-59
    wraps nodes in Scalene; here traces go to TensorBoard format)."""

    def __init__(self, log_dir: str = "/tmp/ragtpu_traces") -> None:
        self.log_dir = log_dir
        self._active = False

    def start(self) -> str:
        import jax

        os.makedirs(self.log_dir, exist_ok=True)
        jax.profiler.start_trace(self.log_dir)
        self._active = True
        return self.log_dir

    def stop(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
