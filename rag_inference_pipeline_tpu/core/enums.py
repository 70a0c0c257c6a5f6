"""Core enums: node roles, component types, service endpoints.

Behavior parity with the reference's enum layer (reference:
src/pipeline/enums.py:8-66) — node-number -> role derivation, the component
type taxonomy, and the HTTP endpoint names — extended with TPU-native
component kinds (index variants, mesh executor).
"""

from __future__ import annotations

import enum


class NodeRole(str, enum.Enum):
    GATEWAY = "gateway"
    RETRIEVAL = "retrieval"
    GENERATION = "generation"


class ServiceEndpoint(str, enum.Enum):
    QUERY = "/query"
    RETRIEVE = "/retrieve"
    GENERATE = "/generate"
    HEALTH = "/health"
    METRICS = "/metrics"
    CLEAR_CACHE = "/clear_cache"


class ComponentType(str, enum.Enum):
    """Kinds of components a profile may place on a node.

    The reference's 8 kinds (embedder, faiss, doc store, reranker, llm,
    sentiment, toxicity, orchestrator; reference enums.py:25-48) map to the
    TPU-native set below; `faiss` becomes `index` (flat / ivf_flat / ivf_pq
    chosen by settings), and `mesh` is new: the shared device-mesh context
    every on-device component attaches to.
    """

    MESH = "mesh"
    EMBEDDER = "embedder"
    INDEX = "index"
    DOC_STORE = "doc_store"
    RERANKER = "reranker"
    LLM = "llm"
    SENTIMENT = "sentiment"
    TOXICITY = "toxicity"
    ORCHESTRATOR = "orchestrator"


class IndexKind(str, enum.Enum):
    FLAT = "flat"
    IVF_FLAT = "ivf_flat"
    IVF_PQ = "ivf_pq"


class PayloadMode(str, enum.Enum):
    """What document payloads cross a DCN (cross-host) hop.

    Mirrors the reference's DOCUMENTS_PAYLOAD_MODE semantics
    (reference config/__init__.py:218-223): full bodies, ids only (fetch on
    the far side), or compressed blobs.
    """

    FULL = "full"
    ID_ONLY = "id_only"
    COMPRESSED = "compressed"


def derive_node_role(node_number: int) -> NodeRole:
    """Node number -> default role (reference enums.py:51-66)."""
    mapping = {0: NodeRole.GATEWAY, 1: NodeRole.RETRIEVAL, 2: NodeRole.GENERATION}
    try:
        return mapping[node_number]
    except KeyError:
        raise ValueError(
            f"node_number must be 0, 1, or 2; got {node_number}"
        ) from None
