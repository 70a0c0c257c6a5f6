from .config import Settings, get_settings, load_settings, reset_settings
from .enums import (
    ComponentType,
    IndexKind,
    NodeRole,
    PayloadMode,
    ServiceEndpoint,
    derive_node_role,
)
from .mesh import DP_AXIS, TP_AXIS, MeshContext, make_mesh, mesh_from_settings
from .profiles import (
    ComponentSpec,
    Profile,
    load_profile_file,
    load_role_profile,
    single_node_profile,
)
from .registry import Component, ComponentRegistry

__all__ = [
    "Settings",
    "get_settings",
    "load_settings",
    "reset_settings",
    "ComponentType",
    "IndexKind",
    "NodeRole",
    "PayloadMode",
    "ServiceEndpoint",
    "derive_node_role",
    "DP_AXIS",
    "TP_AXIS",
    "MeshContext",
    "make_mesh",
    "mesh_from_settings",
    "ComponentSpec",
    "Profile",
    "load_profile_file",
    "load_role_profile",
    "single_node_profile",
    "Component",
    "ComponentRegistry",
]
