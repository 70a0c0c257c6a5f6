"""YAML role profiles: which components and routes a node hosts.

Parity with the reference's profile system (reference:
src/pipeline/config/profile_schema.py:6-44 and runtime_factory.py:70-126):
a profile lists components (type + optional per-component config + alias)
and routes to mount; selection precedence is explicit path > named profile >
node-number-derived default. Validators reject duplicate aliases and routes
referencing components the profile doesn't place.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import yaml
from pydantic import BaseModel, Field, field_validator, model_validator

from .enums import ComponentType, NodeRole

_PROFILE_DIRS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "configs"),
    "configs",
]

_ROUTE_REQUIRES: dict[str, set[ComponentType]] = {
    "gateway": {ComponentType.ORCHESTRATOR},
    "retrieval": {ComponentType.INDEX},
    "generation": {ComponentType.LLM},
}


class ComponentSpec(BaseModel):
    type: ComponentType
    alias: Optional[str] = None
    config: dict[str, Any] = Field(default_factory=dict)

    @property
    def name(self) -> str:
        return self.alias or self.type.value


class Profile(BaseModel):
    name: str
    description: str = ""
    components: list[ComponentSpec] = Field(default_factory=list)
    routes: list[str] = Field(default_factory=list)
    batch_overrides: dict[str, Any] = Field(default_factory=dict)

    @field_validator("routes")
    @classmethod
    def _check_routes(cls, v: list[str]) -> list[str]:
        allowed = {"gateway", "retrieval", "generation"}
        bad = [r for r in v if r not in allowed]
        if bad:
            raise ValueError(f"unknown routes {bad}; allowed: {sorted(allowed)}")
        if len(set(v)) != len(v):
            raise ValueError("duplicate routes in profile")
        return v

    @model_validator(mode="after")
    def _check_aliases_and_deps(self) -> "Profile":
        names = [c.name for c in self.components]
        if len(set(names)) != len(names):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(f"duplicate component aliases: {dupes}")
        placed = {c.type for c in self.components}
        for route in self.routes:
            missing = _ROUTE_REQUIRES.get(route, set()) - placed
            if missing:
                raise ValueError(
                    f"route '{route}' requires components "
                    f"{sorted(t.value for t in missing)} not placed by profile "
                    f"'{self.name}'"
                )
        return self

    def has(self, ctype: ComponentType) -> bool:
        return any(c.type is ctype for c in self.components)


def _builtin_profile(role: NodeRole) -> Profile:
    """Default per-role profiles when no YAML is given (reference baseline)."""
    if role is NodeRole.GATEWAY:
        return Profile(
            name="gateway_default",
            components=[
                ComponentSpec(type=ComponentType.ORCHESTRATOR),
            ],
            routes=["gateway"],
        )
    if role is NodeRole.RETRIEVAL:
        return Profile(
            name="retrieval_default",
            components=[
                ComponentSpec(type=ComponentType.MESH),
                ComponentSpec(type=ComponentType.EMBEDDER),
                ComponentSpec(type=ComponentType.INDEX),
                ComponentSpec(type=ComponentType.DOC_STORE),
            ],
            routes=["retrieval"],
        )
    return Profile(
        name="generation_default",
        components=[
            ComponentSpec(type=ComponentType.MESH),
            ComponentSpec(type=ComponentType.RERANKER),
            ComponentSpec(type=ComponentType.LLM),
            ComponentSpec(type=ComponentType.SENTIMENT),
            ComponentSpec(type=ComponentType.TOXICITY),
            ComponentSpec(type=ComponentType.DOC_STORE),
        ],
        routes=["generation"],
    )


def single_node_profile() -> Profile:
    """Everything on one node / one mesh — the TPU-native default topology.

    The reference forces 3 HTTP-separated nodes; on TPU the idiomatic
    deployment is one process owning the mesh, with all stages device-resident
    (SURVEY.md section 2.6).
    """
    return Profile(
        name="single_node_full",
        description="full RAG pipeline on one mesh",
        components=[
            ComponentSpec(type=ComponentType.MESH),
            ComponentSpec(type=ComponentType.EMBEDDER),
            ComponentSpec(type=ComponentType.INDEX),
            ComponentSpec(type=ComponentType.DOC_STORE),
            ComponentSpec(type=ComponentType.RERANKER),
            ComponentSpec(type=ComponentType.LLM),
            ComponentSpec(type=ComponentType.SENTIMENT),
            ComponentSpec(type=ComponentType.TOXICITY),
            ComponentSpec(type=ComponentType.ORCHESTRATOR),
        ],
        routes=["gateway", "retrieval", "generation"],
    )


def load_profile_file(path: str) -> Profile:
    with open(path, "r", encoding="utf-8") as fh:
        data = yaml.safe_load(fh)
    if not isinstance(data, dict):
        raise ValueError(f"profile file {path} did not parse to a mapping")
    data.setdefault("name", os.path.splitext(os.path.basename(path))[0])
    return Profile.model_validate(data)


def _find_named_profile(name: str) -> Optional[str]:
    for d in _PROFILE_DIRS:
        candidate = os.path.join(d, f"{name}.yaml")
        if os.path.exists(candidate):
            return candidate
    return None


def load_role_profile(settings) -> Profile:
    """Profile selection: override path > named > node-role default.

    Mirrors reference runtime_factory.py:70-126.
    """
    if settings.role_profile_override_path:
        return load_profile_file(settings.role_profile_override_path)
    if settings.pipeline_role_profile:
        path = _find_named_profile(settings.pipeline_role_profile)
        if path is None:
            raise FileNotFoundError(
                f"profile '{settings.pipeline_role_profile}' not found in "
                f"{_PROFILE_DIRS}"
            )
        return load_profile_file(path)
    if settings.total_nodes == 1:
        return single_node_profile()
    return _builtin_profile(settings.node_role)
