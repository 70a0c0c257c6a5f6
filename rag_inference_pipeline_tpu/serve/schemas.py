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

from pydantic import BaseModel, Field, field_validator, model_validator


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
    # `items` may be omitted when embeddings_b64 carries the batch: the
    # count comes from the byte length and every item takes `k` below —
    # at batch 512 even validating 512 {"k": 10} stubs costs ~20 ms of
    # pydantic, half the fast path's host tax (PERF_NOTES "Serve-layer
    # ceiling")
    items: Optional[list[RetrieveItem]] = None
    rerank: bool = False
    k: Optional[int] = None  # default k for itemless binary requests
    # response wire format: "json" (reference parity) or "b64" (id_only
    # only: ids int32 [B, k] + scores f32 [B, k], base64 — the
    # msgspec/orjson-analog binary path, reference rpc_client.py:122-126)
    response_format: str = "json"
    # binary batch embeddings: base64 of little-endian float32
    # [len(items), dim] row-major. The JSON-float-list path costs ~10x in
    # parse + validate at batch 512 (the serve-layer tax the reference paid
    # msgspec/orjson to avoid, rpc_client.py:122-126); this is the wire
    # format for embedding-bearing /retrieve at device-scale batches.
    embeddings_b64: Optional[str] = None

    @field_validator("embeddings_b64")
    @classmethod
    def _check_emb_b64(cls, v):
        # cheap shape check only — at batch 512 the payload is ~2 MB and a
        # full decode here would double the handler's decode cost on the
        # hot path; a bad charset raises binascii.Error (a ValueError ->
        # 400 via error_middleware) at the handler's real decode
        if v is not None and len(v) % 4 != 0:
            raise ValueError("embeddings_b64 length must be a multiple of 4")
        return v

    @field_validator("response_format")
    @classmethod
    def _check_fmt(cls, v):
        if v not in ("json", "b64"):
            raise ValueError("response_format must be 'json' or 'b64'")
        return v

    @model_validator(mode="after")
    def _check_batch(self):
        if self.items is None and self.embeddings_b64 is None:
            raise ValueError("either items or embeddings_b64 is required")
        return self


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
