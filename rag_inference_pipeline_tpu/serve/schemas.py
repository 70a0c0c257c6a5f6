"""API schemas: pydantic request/response models.

Wire-parity with the reference's schemas (reference
services/gateway/schemas.py — QueryRequest/QueryResponse with
{request_id, generated_response, sentiment, is_toxic}; retrieval/generation
batch payloads with payload-mode dependent document fields, base64
compressed_docs; services/retrieval/schemas.py, generation/schemas.py).
"""

from __future__ import annotations

import base64
import uuid
from typing import Any, Optional

from pydantic import BaseModel, Field, field_validator


class Document(BaseModel):
    id: int
    title: str = ""
    content: str = ""
    score: Optional[float] = None
    rerank_score: Optional[float] = None


class QueryRequest(BaseModel):
    query: str
    request_id: str = Field(default_factory=lambda: uuid.uuid4().hex)
    k: Optional[int] = None

    @field_validator("query")
    @classmethod
    def _non_empty(cls, v: str) -> str:
        if not v or not v.strip():
            raise ValueError("query must be non-empty")
        return v


class QueryResponse(BaseModel):
    request_id: str
    generated_response: str
    sentiment: str
    is_toxic: bool


class RetrieveItem(BaseModel):
    query: str = ""
    embedding: Optional[list[float]] = None
    k: Optional[int] = None

    @field_validator("embedding")
    @classmethod
    def _check_embedding(cls, v):
        if v is not None and len(v) == 0:
            raise ValueError("embedding, when given, must be non-empty")
        return v


class RetrieveRequest(BaseModel):
    items: list[RetrieveItem]
    rerank: bool = False
    # binary batch embeddings: base64 of little-endian float32
    # [len(items), dim] row-major. The JSON-float-list path costs ~10x in
    # parse + validate at batch 512 (the serve-layer tax the reference paid
    # msgspec/orjson to avoid, rpc_client.py:122-126); this is the wire
    # format for embedding-bearing /retrieve at device-scale batches.
    embeddings_b64: Optional[str] = None

    @field_validator("embeddings_b64")
    @classmethod
    def _check_emb_b64(cls, v):
        if v is not None:
            base64.b64decode(v, validate=True)
        return v


class RetrieveResultItem(BaseModel):
    ids: list[int]
    scores: list[float]
    documents: Optional[list[Document]] = None  # payload mode: full
    compressed_docs: Optional[str] = None  # payload mode: compressed (b64+zstd)

    @field_validator("compressed_docs")
    @classmethod
    def _check_b64(cls, v):
        if v is not None:
            base64.b64decode(v, validate=True)
        return v


class RetrieveResponse(BaseModel):
    results: list[RetrieveResultItem]


class GenerateItem(BaseModel):
    query: str
    documents: Optional[list[Document]] = None
    doc_ids: Optional[list[int]] = None  # payload mode: id_only
    compressed_docs: Optional[str] = None

    @field_validator("compressed_docs")
    @classmethod
    def _check_b64(cls, v):
        if v is not None:
            base64.b64decode(v, validate=True)
        return v


class GenerateRequest(BaseModel):
    items: list[GenerateItem]


class GenerateResultItem(BaseModel):
    generated_response: str
    sentiment: str = "neutral"
    is_toxic: bool = False


class GenerateResponse(BaseModel):
    results: list[GenerateResultItem]


class HealthResponse(BaseModel):
    status: str
    node: int
    role: str
    components: dict[str, bool]
    random_weights: list[str] = Field(default_factory=list)


class ErrorResponse(BaseModel):
    error: str
    error_type: str = "internal"
    detail: Optional[Any] = None


TOXIC_PLACEHOLDER = "[Content Filtered due to toxicity]"
