"""Core layer tests: settings, enums, profiles, mesh, registry.

Mirrors the reference's test_config.py / test_enums.py / test_profile_schema.py
coverage (SURVEY.md section 4 item 1).
"""

import asyncio

import pytest

from rag_inference_pipeline_tpu.core import (
    ComponentRegistry,
    ComponentType,
    NodeRole,
    Profile,
    Settings,
    derive_node_role,
    load_profile_file,
    load_role_profile,
    load_settings,
    make_mesh,
    single_node_profile,
)


class TestEnums:
    def test_derive_node_role(self):
        assert derive_node_role(0) is NodeRole.GATEWAY
        assert derive_node_role(1) is NodeRole.RETRIEVAL
        assert derive_node_role(2) is NodeRole.GENERATION

    def test_derive_node_role_invalid(self):
        with pytest.raises(ValueError):
            derive_node_role(3)


class TestSettings:
    def test_defaults(self):
        s = Settings()
        assert s.retrieval_k == 10
        assert s.max_tokens == 128
        assert s.truncate_length == 512
        assert s.index_dim == 768
        assert s.node_role is NodeRole.GATEWAY

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("RETRIEVAL_K", "25")
        monkeypatch.setenv("INDEX_NPROBE", "128")
        monkeypatch.setenv("ADAPTIVE_BATCHING", "false")
        s = load_settings()
        assert s.retrieval_k == 25
        assert s.index_nprobe == 128
        assert s.adaptive_batching is False

    def test_env_file(self, tmp_path):
        f = tmp_path / ".env"
        f.write_text("GATEWAY_BATCH_SIZE=16\n# comment\nRUN_ID='abc'\n")
        s = load_settings(env_file=str(f))
        assert s.gateway_batch_size == 16
        assert s.run_id == "abc"

    def test_validators(self):
        with pytest.raises(ValueError):
            Settings(total_nodes=4)
        with pytest.raises(ValueError):
            Settings(node_number=5)
        with pytest.raises(ValueError):
            Settings(index_dim=768, index_pq_m=7)
        with pytest.raises(ValueError):
            Settings(index_metric="cosine")

    def test_urls(self):
        s = Settings(total_nodes=3, node_1_ip="10.0.0.2", base_port=8000)
        assert s.retrieval_url == "http://10.0.0.2:8001"
        s1 = Settings(total_nodes=1)
        assert s1.retrieval_url.endswith(":8000")

    def test_shape_buckets(self):
        s = Settings(batch_shape_buckets="1,4,16")
        assert s.shape_buckets == (1, 4, 16)


class TestProfiles:
    def test_single_node_profile_valid(self):
        p = single_node_profile()
        assert p.has(ComponentType.INDEX)
        assert set(p.routes) == {"gateway", "retrieval", "generation"}

    def test_duplicate_alias_rejected(self):
        with pytest.raises(ValueError, match="duplicate"):
            Profile(
                name="x",
                components=[
                    {"type": "embedder", "alias": "a"},
                    {"type": "index", "alias": "a"},
                ],
            )

    def test_route_requires_component(self):
        with pytest.raises(ValueError, match="requires"):
            Profile(name="x", components=[], routes=["retrieval"])

    def test_yaml_roundtrip(self, tmp_path):
        y = tmp_path / "p.yaml"
        y.write_text(
            """
name: retrieval_only
components:
  - type: mesh
  - type: index
    config: {kind: flat}
routes: [retrieval]
"""
        )
        p = load_profile_file(str(y))
        assert p.name == "retrieval_only"
        assert p.components[1].config == {"kind": "flat"}

    def test_selection_precedence(self, tmp_path):
        y = tmp_path / "override.yaml"
        y.write_text("name: ovr\ncomponents: [{type: index}]\nroutes: [retrieval]\n")
        s = Settings(role_profile_override_path=str(y))
        assert load_role_profile(s).name == "ovr"
        s2 = Settings(total_nodes=1)
        assert load_role_profile(s2).name == "single_node_full"
        s3 = Settings(total_nodes=3, node_number=1)
        assert load_role_profile(s3).name == "retrieval_default"


class TestMesh:
    def test_mesh_shapes(self):
        ctx = make_mesh(dp=4, tp=2)
        assert ctx.dp == 4 and ctx.tp == 2 and ctx.n_devices == 8

    def test_mesh_infer_dp(self):
        ctx = make_mesh(tp=2)
        assert ctx.dp == 4

    def test_mesh_too_big(self):
        with pytest.raises(ValueError):
            make_mesh(dp=16, tp=2)

    def test_sharded_put(self):
        import jax.numpy as jnp
        import numpy as np

        ctx = make_mesh(dp=8, tp=1)
        x = ctx.put(np.zeros((16, 4), np.float32), ctx.rows_dp)
        assert x.shape == (16, 4)
        assert jnp.sum(x) == 0


class TestRegistry:
    def test_lifecycle(self):
        events = []

        class C:
            def __init__(self, n):
                self.n = n

            def load(self):
                events.append(("load", self.n))

            async def start(self):
                events.append(("start", self.n))

            async def stop(self):
                events.append(("stop", self.n))

            def unload(self):
                events.append(("unload", self.n))

        r = ComponentRegistry()
        r.register("a", C("a"))
        r.register("b", C("b"))
        r.alias("idx", "a")
        assert r.get("idx").n == "a"
        asyncio.get_event_loop().run_until_complete(r.start_all())
        asyncio.get_event_loop().run_until_complete(r.stop_all())
        r.unload_all()
        assert events == [
            ("load", "a"),
            ("load", "b"),
            ("start", "a"),
            ("start", "b"),
            ("stop", "b"),
            ("stop", "a"),
            ("unload", "b"),
            ("unload", "a"),
        ]

    def test_duplicate_and_health(self):
        r = ComponentRegistry()
        r.register("a", object(), load=False)
        with pytest.raises(ValueError):
            r.register("a", object())
        assert r.health() == {"a": True}


class TestBatchOverrides:
    def test_profile_batch_overrides_applied(self, tmp_path, monkeypatch):
        y = tmp_path / "ovr.yaml"
        y.write_text(
            "name: ovr\ncomponents: [{type: orchestrator}]\nroutes: [gateway]\n"
            "batch_overrides: {gateway_batch_size: 99}\n"
        )
        monkeypatch.setenv("ROLE_PROFILE_OVERRIDE_PATH", str(y))
        from rag_inference_pipeline_tpu.core import load_settings
        from rag_inference_pipeline_tpu.serve.runtime import build_app

        s = load_settings()
        app = build_app(s)
        from rag_inference_pipeline_tpu.serve.http import SETTINGS_KEY

        assert app[SETTINGS_KEY].gateway_batch_size == 99
