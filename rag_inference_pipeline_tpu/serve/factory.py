"""Component factory + app assembly from a role profile.

Reference parity (src/pipeline/component_factory.py:63-104 and
runtime_factory.py:166-344): ComponentType -> constructor dispatch, profile
-> registry with aliases, services wired with whatever components are local
to this node, lifespan start/stop. The mesh component is TPU-new: one
MeshContext shared by every on-device component.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

from ..core.config import Settings
from ..core.enums import ComponentType
from ..core.mesh import MeshContext, mesh_from_settings
from ..core.profiles import Profile
from ..core.registry import ComponentRegistry
from ..engine.orchestrator import Orchestrator
from ..index import make_index
from ..models.components import (
    EmbedderComponent,
    LLMComponent,
    RerankerComponent,
    SentimentComponent,
    ToxicityComponent,
)
from ..utils.docstore import DocumentStore
from .services import GenerationService, RetrievalExecutor

logger = logging.getLogger(__name__)


class MeshComponent:
    """Registry wrapper owning the device mesh."""

    def __init__(self, settings: Settings) -> None:
        self.settings = settings
        self.ctx: Optional[MeshContext] = None

    def load(self) -> None:
        self.ctx = mesh_from_settings(self.settings)
        logger.info(
            "mesh ready: dp=%d tp=%d devices=%d",
            self.ctx.dp, self.ctx.tp, self.ctx.n_devices,
        )

    def unload(self) -> None:
        self.ctx = None

    @property
    def is_loaded(self) -> bool:
        return self.ctx is not None


class IndexComponent:
    """Index lifecycle wrapper: loads from index_path at startup (the
    reference loads a prebuilt faiss file, faiss_store.py:58-69)."""

    def __init__(self, settings: Settings, mesh: Optional[MeshContext]) -> None:
        self.settings = settings
        self.mesh = mesh
        self.index = None

    def load(self) -> None:
        from ..index.base import BaseIndex

        if self.settings.index_path:
            self.index = BaseIndex.load(
                self.settings.index_path,
                self.mesh,
                # deployment choice, not artifact state: "host" keeps the
                # f16 rescore copy in host RAM (no multi-GB boot upload)
                rescore_store=self.settings.index_rescore_store,
            )
            # runtime knobs that are NOT index-artifact state: an artifact-
            # loaded index must still honor the deployment's probe budgets
            # (artifact load bypasses make_index, which applies these)
            if hasattr(self.index, "nprobe_local"):
                self.index.nprobe_local = self.settings.index_nprobe_local
            if hasattr(self.index, "nprobe"):
                self.index.nprobe = self.settings.index_nprobe
            from .spmd import SPMDIndexProxy, is_front_door, is_spmd

            # record the index's HBM footprint so the LLM can derive a
            # safe bucket-ladder cap from the remaining budget (utils/hbm)
            from ..utils import hbm

            hbm.reserve("index", hbm.device_obj_bytes(self.index))
            if is_spmd():
                if not is_front_door():
                    # worker process: NO local warmup searches — on a
                    # multi-host mesh a search is a collective program,
                    # so only the front door's broadcasts may initiate
                    # one (serve/spmd.py). The worker executes them from
                    # worker_loop(), entered by serve.runtime.
                    return
                self.index = SPMDIndexProxy(self.index)
            self.index.warmup(self.settings.retrieval_k)
            if self.settings.warmup_buckets:
                # pre-compile every (batch-bucket, ladder-k) search program so
                # no first request stalls on a 20-40s remote XLA compile
                import jax
                import jax.numpy as jnp

                k_ladder = sorted({self.settings.retrieval_k, 16, 32, 64, 128})
                ks = [k for k in k_ladder if k <= self.index.ntotal]
                for b in self.settings.shape_buckets:
                    q = jnp.zeros((b, self.index.dim), jnp.float32)
                    for k in ks:
                        jax.block_until_ready(self.index.search(q, k))
                logger.info(
                    "index warmup: %d bucket x %d k programs compiled",
                    len(self.settings.shape_buckets), len(ks),
                )
        else:
            # empty index of the configured kind; build/ingest via API or bench
            self.index = make_index(self.settings, self.mesh)
            logger.warning("index: no index_path — starting empty (not loaded)")

    def unload(self) -> None:
        if self.index is not None:
            from ..utils import hbm

            hbm.release("index")
            stop = getattr(self.index, "stop_workers", None)
            if stop is not None:  # SPMD front door: release worker loops
                stop()
            self.index.unload()
            self.index = None

    @property
    def is_loaded(self) -> bool:
        return self.index is not None and self.index.is_loaded


# profile component-config key -> Settings field for the index component
# (reference analog: per-component config dicts in profile YAMLs,
# profile_schema.py:6-44 — previously parsed but never applied here)
_INDEX_CFG_KEYS = {
    "kind": "index_kind",
    "path": "index_path",
    "metric": "index_metric",
    "dtype": "index_dtype",
    "nlist": "index_nlist",
    "nprobe": "index_nprobe",
    "pq_m": "index_pq_m",
    "pq_bits": "index_pq_bits",
    "rescore_k": "index_rescore_k",
    "rescore_store": "index_rescore_store",
    "pq_rescore_k": "index_pq_rescore_k",
    "pq_rescore_kind": "index_pq_rescore_kind",
    "nprobe_local": "index_nprobe_local",
    "cap_factor": "index_cap_factor",
}


def _index_settings(settings: Settings, spec) -> Settings:
    """Apply a profile's per-component index config (e.g. {kind: ivf_pq,
    pq_bits: 4}) over the env settings, re-validated."""
    if not spec.config:
        return settings
    unknown = set(spec.config) - set(_INDEX_CFG_KEYS)
    if unknown:
        raise ValueError(
            f"unknown index config keys {sorted(unknown)}; "
            f"allowed: {sorted(_INDEX_CFG_KEYS)}"
        )
    upd = {_INDEX_CFG_KEYS[k]: v for k, v in spec.config.items()}
    merged = settings.model_copy(update=upd)
    return Settings(**merged.model_dump())  # re-run validators/coercion


def build_registry(
    settings: Settings,
    profile: Profile,
    *,
    overrides: Optional[dict[str, Any]] = None,
) -> ComponentRegistry:
    """Instantiate + register (and thus load) every profiled component.

    `overrides` maps component-type value -> prebuilt instance (tests inject
    fakes here — the translation of the reference's mocked registries,
    SURVEY.md section 4 item 6).
    """
    overrides = overrides or {}
    registry = ComponentRegistry()
    mesh_ctx: Optional[MeshContext] = None

    for spec in profile.components:
        name = spec.name
        t = spec.type
        if t.value in overrides:
            registry.register(name, overrides[t.value], load=False)
            if t is ComponentType.MESH:
                mesh_ctx = getattr(overrides[t.value], "ctx", None)
            continue
        if t is ComponentType.MESH:
            comp = MeshComponent(settings)
            registry.register(name, comp)
            mesh_ctx = comp.ctx
        elif t is ComponentType.EMBEDDER:
            registry.register(name, EmbedderComponent(settings, mesh_ctx))
        elif t is ComponentType.INDEX:
            registry.register(
                name, IndexComponent(_index_settings(settings, spec), mesh_ctx)
            )
        elif t is ComponentType.DOC_STORE:
            registry.register(name, DocumentStore(settings))
        elif t is ComponentType.RERANKER:
            registry.register(name, RerankerComponent(settings, mesh_ctx))
        elif t is ComponentType.LLM:
            registry.register(name, LLMComponent(settings, mesh_ctx))
        elif t is ComponentType.SENTIMENT:
            registry.register(name, SentimentComponent(settings, mesh_ctx))
        elif t is ComponentType.TOXICITY:
            registry.register(name, ToxicityComponent(settings, mesh_ctx))
        elif t is ComponentType.ORCHESTRATOR:
            pass  # wired after local services exist, below
        if spec.alias and spec.alias != t.value and t.value not in registry:
            try:
                registry.alias(t.value, name)
            except ValueError:
                pass

    def opt(t: ComponentType):
        comp = registry.get_optional(t.value)
        return comp

    # service wiring: executors see whichever components are on this node
    retrieval_executor = None
    if "retrieval" in profile.routes:
        idx_comp = opt(ComponentType.INDEX)
        retrieval_executor = RetrievalExecutor(
            settings,
            index=getattr(idx_comp, "index", idx_comp),
            embedder=opt(ComponentType.EMBEDDER),
            doc_store=opt(ComponentType.DOC_STORE),
            reranker=opt(ComponentType.RERANKER),
        )
        registry.register("retrieval_executor", retrieval_executor, load=False)

    generation_service = None
    if "generation" in profile.routes:
        generation_service = GenerationService(
            settings,
            llm=opt(ComponentType.LLM),
            reranker=opt(ComponentType.RERANKER),
            sentiment=opt(ComponentType.SENTIMENT),
            toxicity=opt(ComponentType.TOXICITY),
            doc_store=opt(ComponentType.DOC_STORE),
        )
        registry.register("generation_service", generation_service, load=False)

    fused = None
    if settings.use_fused_pipeline and profile.has(ComponentType.ORCHESTRATOR):
        from ..engine.fused_executor import FusedExecutor

        emb_c = opt(ComponentType.EMBEDDER)
        llm_c = opt(ComponentType.LLM)
        idx_c = opt(ComponentType.INDEX)
        mesh_c = registry.get_optional(ComponentType.MESH.value)
        if not (emb_c and llm_c and idx_c):
            raise ValueError(
                "use_fused_pipeline requires embedder + index + llm on this node"
            )
        fused = FusedExecutor(
            settings,
            mesh_ctx=getattr(mesh_c, "ctx", None) or mesh_from_settings(settings),
            embedder=emb_c,
            index=getattr(idx_c, "index", idx_c),
            llm=llm_c,
            sentiment=opt(ComponentType.SENTIMENT),
            toxicity=opt(ComponentType.TOXICITY),
        )
        registry.register("fused_executor", fused)  # load() builds the pipe

    if profile.has(ComponentType.ORCHESTRATOR):
        orch = Orchestrator(
            settings,
            retrieval_executor=retrieval_executor,
            generation_service=generation_service,
            embedder=(
                opt(ComponentType.EMBEDDER) if retrieval_executor is None else None
            ),
            fused_executor=fused,
        )
        registry.register("orchestrator", orch, load=False)

    return registry
