"""Repo config library validation + telemetry units (profiles load, manifests
parse, metrics render, profiler samples)."""

import glob
import json
import logging
import os

import yaml

from rag_inference_pipeline_tpu.core import Settings, load_profile_file
from rag_inference_pipeline_tpu.telemetry.metrics import get_metric, render_metrics
from rag_inference_pipeline_tpu.telemetry.profiling import (
    SampledStageProfiler,
    get_resource_snapshot,
)

REPO = os.path.join(os.path.dirname(__file__), "..")


class TestConfigLibrary:
    def test_all_profiles_valid(self):
        paths = sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))
        assert len(paths) >= 14
        for p in paths:
            prof = load_profile_file(p)
            assert prof.name, p
            assert prof.components, p

    def test_all_manifests_parse(self):
        paths = sorted(glob.glob(os.path.join(REPO, "configs", "experiments", "*.yaml")))
        assert len(paths) >= 5
        for p in paths:
            m = yaml.safe_load(open(p))
            # `workload:` (single) or `workloads:` (sweep — one boot,
            # several request/concurrency points; run_experiment.py)
            assert "nodes" in m, p
            wl = m.get("workloads") or [m.get("workload")]
            assert all(
                isinstance(w, dict)
                and {"requests", "concurrency"} <= set(w)
                for w in wl
            ), p
            for spec in m["nodes"].values():
                profile = spec["profile"]
                assert os.path.exists(
                    os.path.join(REPO, "configs", f"{profile}.yaml")
                ), f"{p} references missing profile {profile}"

    def test_env_presets_parse(self):
        from rag_inference_pipeline_tpu.core.config import _parse_env_file

        for f in (".env.shared", ".env.local", ".env.prod"):
            env = _parse_env_file(os.path.join(REPO, f))
            assert env, f

    def test_monitoring_dashboard_is_json(self):
        p = os.path.join(
            REPO, "monitoring", "grafana", "provisioning", "dashboards",
            "ragtpu-dashboard.json",
        )
        dash = json.load(open(p))
        assert dash["panels"]


class TestTelemetry:
    def test_metrics_idempotent_registration(self):
        from prometheus_client import Counter

        a = get_metric(Counter, "test_dup_counter", "d", ["x"])
        b = get_metric(Counter, "test_dup_counter", "d", ["x"])
        assert a is b

    def test_render_metrics(self):
        text = render_metrics().decode()
        assert "pipeline_requests_total" in text

    def test_resource_snapshot(self):
        snap = get_resource_snapshot()
        assert snap.get("rss_mb", 0) > 0

    def test_profiler_sampling(self, caplog):
        s = Settings(enable_profiling=True, profiling_sample_rate=1.0)
        prof = SampledStageProfiler(s, "test")
        p = prof.maybe_start()
        with p.track("stage_a"):
            pass
        with caplog.at_level(logging.INFO):
            p.finish()
        assert any("profile_summary" in r.message for r in caplog.records)

    def test_profiler_disabled_is_noop(self):
        s = Settings(enable_profiling=False)
        p = SampledStageProfiler(s, "test").maybe_start()
        with p.track("x"):
            pass
        p.finish()  # must not raise or log
