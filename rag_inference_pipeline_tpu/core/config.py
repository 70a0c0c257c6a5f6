"""Settings system: env vars + .env files -> a validated settings object.

Re-creates the semantics of the reference's pydantic-settings layer
(reference: src/pipeline/config/__init__.py — ~60 fields for node topology,
per-service batch knobs, cache capacities/TTL, index params, payload mode,
compression, model names, telemetry toggles), without pydantic-settings
(not in the image): a small env loader over a pydantic BaseModel.

TPU-specific additions: mesh axis sizes (dp/tp), dtype policy, shape-bucket
ladders for the batcher, and index kind/quantization knobs.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Any, Optional

from pydantic import BaseModel, Field, field_validator, model_validator

from .enums import IndexKind, NodeRole, PayloadMode, derive_node_role


def _parse_env_file(path: str) -> dict[str, str]:
    """Minimal .env parser: KEY=VALUE lines, '#' comments, optional quotes."""
    out: dict[str, str] = {}
    try:
        with open(path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                key, _, value = line.partition("=")
                value = value.strip().strip("'\"")
                out[key.strip()] = value
    except FileNotFoundError:
        pass
    return out


class Settings(BaseModel):
    """All runtime configuration. Field names upper-case to env var names."""

    # --- node topology (reference config/__init__.py:81-97,447-463) ---
    node_number: int = 0
    total_nodes: int = 1
    node_0_ip: str = "127.0.0.1"
    node_1_ip: str = "127.0.0.1"
    node_2_ip: str = "127.0.0.1"
    base_port: int = 8000
    pipeline_role_profile: Optional[str] = None
    role_profile_override_path: Optional[str] = None

    # --- mesh / device (TPU-native; replaces reference's absent TP/DP) ---
    mesh_dp: int = 0  # 0 = infer from device count / tp
    mesh_tp: int = 1
    device_platform: Optional[str] = None  # None = jax default
    # --- multi-host (DCN) process group (core/distributed.py; replaces the
    # reference's NODE_{0,1,2}_IP static topology, config/__init__.py:81-97)
    dist_num_processes: int = 1  # >1 turns on jax.distributed
    dist_process_id: int = 0
    dist_coordinator: str = "127.0.0.1:12355"  # host:port of process 0
    param_dtype: str = "bfloat16"

    # --- batching (reference :265-314) ---
    gateway_batch_size: int = 8
    gateway_batch_timeout_ms: float = 50.0
    retrieval_batch_size: int = 32
    retrieval_batch_timeout_ms: float = 20.0
    generation_batch_size: int = 8
    generation_batch_timeout_ms: float = 50.0
    gateway_pipeline_chunks: int = 4
    adaptive_batching: bool = True
    adaptive_min_delay_ms: float = 5.0
    # work-conserving flush: a completing batch immediately flushes the
    # pending one (reason "ready") — at saturation batching self-clocks on
    # completions instead of the timer (round-4 VERDICT #2; engine/batcher.py)
    batch_flush_on_ready: bool = True
    # XLA needs static shapes: the batcher pads to these bucket sizes
    batch_shape_buckets: str = "1,2,4,8,16,32,64"
    # device HBM budget used to derive the LLM's safe bucket-ladder cap at
    # load (utils/hbm.py — the tunneled v5e exposes no memory_stats, so
    # OOM safety is analytic). 16 GB = v5e / v6e-lite.
    hbm_budget_gb: float = 16.0

    # --- caches (reference :149-203) ---
    query_cache_capacity: int = 1024
    query_cache_ttl_s: float = 300.0
    query_cache_fuzzy: bool = False
    embedding_cache_capacity: int = 10000
    search_cache_capacity: int = 4096
    document_cache_capacity: int = 8192
    document_cache_ttl_s: float = 600.0

    # --- index (reference :106-197,226 + TPU quantization knobs) ---
    index_kind: IndexKind = IndexKind.FLAT
    index_path: Optional[str] = None
    index_dim: int = 768
    index_metric: str = "ip"  # ip | l2
    index_nlist: int = 4096
    index_nprobe: int = 64
    index_pq_m: int = 96  # subspaces (768/8)
    index_pq_bits: int = 8
    index_dtype: str = "bfloat16"  # storage dtype for flat/ivf vectors
    index_search_oversample: int = 4  # partial-topk bin oversampling
    # exact re-score shortlist depth. flat-int8: 64 recovers the SQ8 gap
    # (0.975 -> 0.998 measured at 1M). ivf_pq: ADC misranks tightly-packed
    # true neighbors, so the shortlist must be ~25x k — 256 measured
    # 0.963 recall@10 at 100k vs 0.787 at 64 (tests/test_round2_gaps.py)
    index_rescore_k: int = 64
    # flat-int8 exact rescore copy placement: "device" = bf16 in HBM (the
    # <=5M default), "host" = f16 in host RAM with host-side shortlist
    # refine — the >=10M recall play where the bf16 copy exceeds HBM
    index_rescore_store: str = "device"
    index_pq_rescore_k: int = 256
    # IVF-PQ shortlist rescore store: "exact" = bf16 full vectors in HBM
    # (<=5M); "int4" = int4 per-row-scaled residuals in HBM (0.5 byte/dim,
    # 11.7 GB at 30Mx768 — the >=4-bits/dim re-ranking threshold with NO
    # host store); "host_int8" = int8 codes in HOST RAM, device shortlist
    # + host exact refine (23 GB at 30Mx768 fits host RAM, never HBM);
    # "pq8" = flat residual-PQ8 codes in HBM (precision-walled at ~0.46
    # recall on tight clusters — warns loudly; kept for recall-tolerant
    # capacity points only)
    index_pq_rescore_kind: str = "exact"
    # IVF bucket capacity = cap_factor * n/nlist (lane-aligned). 2.5 holds
    # every row in its home list on clustered corpora; 1.5 displaced 158k
    # rows at 1M/nlist=4096, a flat -6 recall points at EVERY nprobe
    # (artifacts/round3/ivf_oracle_1m_realistic*.json). Cost is padded HBM:
    # bucket storage = cap_factor * n rows.
    index_cap_factor: float = 2.5
    # dp-sharded IVF only: per-shard scan-slot budget (0 = auto,
    # 2*ceil(nprobe/dp) — the measured exactness point: exact parity
    # with unsharded from 2x the balanced share, sub-parity at 1x;
    # artifacts/round4/ivf_sharded_parity.json. Raise toward nprobe to
    # bound worst-case skew at dp x the scan cost)
    index_nprobe_local: int = 0
    index_shard_axis: str = "dp"  # mesh axis database rows are sharded over

    # --- retrieval / generation semantics (reference :231-244) ---
    retrieval_k: int = 10
    rerank_top_n: int = 3
    max_tokens: int = 128
    truncate_length: int = 512
    llm_context_docs: int = 3
    llm_doc_chars: int = 200
    # n-gram (prompt-lookup) speculative decoding: token-identical to greedy,
    # commits up to gamma+1 tokens per model call when the answer quotes the
    # retrieved context (models/qwen.py::ngram_speculative_generate)
    use_speculative_decoding: bool = False
    speculative_gamma: int = 8
    # BENCHMARK-ONLY acceptance injection for speculative decoding: replaces
    # the per-draft accept test with Bernoulli(p) so the acceptance->latency
    # curve is measurable without real checkpoints (offline rig: random-init
    # weights give k-bar ~ 1). Timing-faithful, but emitted text is NOT
    # greedy-identical in this mode (models/qwen.py docstring) — never set
    # in production manifests.
    speculative_inject_p: Optional[float] = None
    # int8 weight quantization for the LLM decode path (W8A8-dynamic,
    # models/qwen.py::quantize_qwen_params): halves the per-step HBM weight
    # stream — the measured B=1 decode wall. "none" keeps param_dtype.
    llm_weight_quant: str = "none"  # none | int8
    # int8 weight quantization for the BERT-family encoders (embedder,
    # reranker, sentiment, toxicity — models/bert.py::quantize_bert_params):
    # encoder prefill is MXU-bound, and the v5e MXU runs s8xs8->s32 at 2x
    # the bf16 rate. "none" keeps param_dtype.
    encoder_weight_quant: str = "none"  # none | int8
    # native JSON codec on the /retrieve hot path (utils/fastjson.py — the
    # orjson/msgspec role the reference pays for, rpc_client.py:122-126).
    # Strict-shape fast path with stdlib+pydantic fallback; behavior-
    # identical (differential-fuzzed, tests/test_fastjson.py).
    fast_json: bool = True
    # verify rounds per engine segment when the decode engine and
    # speculation are BOTH enabled (engine/decode_engine.py::_segment_spec)
    speculative_rounds: int = 2

    # --- payload / compression (reference :205-223) ---
    documents_payload_mode: PayloadMode = PayloadMode.FULL
    compression_algorithm: str = "zstd"  # zstd | none
    compression_level: int = 3
    compression_min_bytes: int = 512

    # --- model names (reference :316-340) ---
    embedding_model: str = "BAAI/bge-base-en-v1.5"
    reranker_model: str = "BAAI/bge-reranker-base"
    llm_model: str = "Qwen/Qwen2.5-0.5B-Instruct"
    sentiment_model: str = "nlptown/bert-base-multilingual-uncased-sentiment"
    toxicity_model: str = "unitary/toxic-bert"
    model_weights_dir: Optional[str] = None  # local safetensors checkpoints
    allow_random_weights: bool = True  # offline fallback for dev/test

    # --- doc store ---
    document_db_path: Optional[str] = None
    doc_store_backend: str = "native"  # native (C++ arena) | sqlite | memory
    doc_store_in_memory: bool = False

    # --- serving / rpc ---
    request_timeout_s: float = 120.0
    rpc_retries: int = 3
    rpc_backoff_base_s: float = 0.1
    http_max_connections: int = 100

    # --- telemetry (reference :362-404) ---
    enable_tracing: bool = False
    otlp_endpoint: str = "http://localhost:4317"
    enable_profiling: bool = False
    profiling_sample_rate: float = 0.2
    enable_metrics: bool = True
    # pre-compile every batch/prefill bucket at load() so no request ever
    # pays a first-compile stall. None = auto: ON when the serving runtime
    # starts an app (a fresh deployment must never see the measured 25.7 s
    # in-band-compile p95 — round-3 VERDICT #9), OFF for library/test use.
    warmup_buckets: Optional[bool] = None
    log_level: str = "INFO"
    run_id: str = "dev"

    # --- fused device pipeline (embed->ANN->decode in one jit) ---
    use_fused_pipeline: bool = False
    doc_tokens_path: Optional[str] = None
    # fused chunking: process_batch splits a gateway batch into device
    # chunks of at most this many lanes (0 = the max shape bucket). The
    # fused step's per-request device cost is FLAT from B=8 to B=16
    # (PERF_NOTES round-5 saturation), so chunks smaller than the flush
    # cap cost no device time while letting chunk N's host work (decode,
    # classify tokenize) overlap chunk N+1's device step. Default 8:
    # measured better-or-equal at EVERY concurrency on the serving curve
    # (conc 16 lockstep 667 -> 440 ms p50, conc 100 throughput +24%;
    # concsweep_chunk8 vs v4, PERF_NOTES "saturation program")
    fused_chunk_lanes: int = 8

    # --- generation decode engine ---
    # persistent-lane decode engine. Two measured regimes (PERF_NOTES):
    # - isolated decode, mixed 16-512-token workload: engine 822-1222 tok/s
    #   vs 163 for decode-to-completion (5-7.5x win — no straggler wait);
    # - full HTTP stack on the TUNNELED single chip at 4.5M docs: static
    #   173 req/min p50 1.17 s vs engine 50 req/min p50 7.9 s — the
    #   per-segment host interaction loses to monolithic decode when every
    #   host<->device sync pays ~35-100 ms RTT and shares one host core
    #   with the event loop.
    # Default OFF: correct for tunneled/remote devices. Turn ON for
    # host-attached TPUs serving mixed-length workloads (sync cost ~1 ms
    # there, and the no-straggler property dominates). Token output is
    # identical to solo greedy decode either way (tested).
    use_continuous_batching: bool = False
    decode_segment_steps: int = 8
    decode_max_concurrency: int = 32  # continuous-batching lanes
    # dispatch segment N+1 before fetching segment N's done flags — hides
    # the host round-trip behind device work (engine/decode_engine.py)
    decode_pipeline_segments: bool = True
    prefill_buckets: str = "128,256,512"
    kv_cache_max_len: int = 1024

    @field_validator("total_nodes")
    @classmethod
    def _check_total_nodes(cls, v: int) -> int:
        if not 1 <= v <= 3:
            raise ValueError("total_nodes must be 1..3 (1 = single-process mesh mode)")
        return v

    @field_validator("node_number")
    @classmethod
    def _check_node_number(cls, v: int) -> int:
        if v not in (0, 1, 2):
            raise ValueError("node_number must be 0, 1 or 2")
        return v

    @field_validator("llm_weight_quant", "encoder_weight_quant")
    @classmethod
    def _check_weight_quant(cls, v: str, info) -> str:
        if v not in ("none", "int8"):
            raise ValueError(f"{info.field_name} must be 'none' or 'int8'")
        return v

    @field_validator("index_metric")
    @classmethod
    def _check_metric(cls, v: str) -> str:
        if v not in ("ip", "l2"):
            raise ValueError("index_metric must be 'ip' or 'l2'")
        return v

    @model_validator(mode="after")
    def _check_pq(self) -> "Settings":
        if self.index_dim % self.index_pq_m != 0:
            raise ValueError(
                f"index_dim ({self.index_dim}) must be divisible by "
                f"index_pq_m ({self.index_pq_m})"
            )
        if self.index_pq_bits not in (4, 8):
            raise ValueError(
                "index_pq_bits must be 4 (PQ4 one-hot MXU ADC, ksub=16 — "
                "double index_pq_m for equal bits/row) or 8 (PQ8, ksub=256)"
            )
        if self.index_cap_factor < 1.0:
            raise ValueError(
                "index_cap_factor must be >= 1.0 (bucket capacity as a "
                "multiple of the mean list size)"
            )
        if self.index_rescore_store not in ("device", "host"):
            raise ValueError(
                "index_rescore_store must be 'device' (bf16 HBM) or "
                "'host' (f16 host RAM, refine-from-storage)"
            )
        if self.index_pq_rescore_kind not in (
            "exact", "int4", "pq8", "host_int8", "host_f16"
        ):
            raise ValueError(
                "index_pq_rescore_kind must be 'exact' (bf16 vectors), "
                "'int4' (HBM int4 residual tier), 'pq8' (flat residual-PQ8 "
                "tier; precision-walled), 'host_int8' or 'host_f16' "
                "(host-RAM refine stores)"
            )
        return self

    # --- computed properties (reference :413-445) ---
    @property
    def node_role(self) -> NodeRole:
        return derive_node_role(self.node_number)

    def node_url(self, node: int) -> str:
        ip = getattr(self, f"node_{node}_ip")
        return f"http://{ip}:{self.base_port + node}"

    @property
    def retrieval_url(self) -> str:
        return self.node_url(1 if self.total_nodes > 1 else 0)

    @property
    def generation_url(self) -> str:
        return self.node_url(2 if self.total_nodes > 2 else 0)

    @property
    def listen_port(self) -> int:
        return self.base_port + self.node_number

    @property
    def listen_host(self) -> str:
        return "0.0.0.0"

    @property
    def shape_buckets(self) -> tuple[int, ...]:
        return tuple(int(x) for x in self.batch_shape_buckets.split(",") if x)

    @property
    def prefill_bucket_list(self) -> tuple[int, ...]:
        return tuple(int(x) for x in self.prefill_buckets.split(",") if x)


_BOOL_TRUE = {"1", "true", "yes", "on"}


def _coerce(field_type: Any, raw: str) -> Any:
    if field_type is bool:
        return raw.lower() in _BOOL_TRUE
    return raw


def load_settings(
    env: Optional[dict[str, str]] = None, env_file: Optional[str] = None
) -> Settings:
    """Build Settings from (os.environ | env overrides | .env file).

    Precedence (highest first): explicit `env` dict, process environment,
    .env file, field defaults — same layering as the reference's
    pydantic-settings config (.env.shared/.env.local/.env.prod presets).
    """
    merged: dict[str, str] = {}
    if env_file:
        merged.update(_parse_env_file(env_file))
    else:
        merged.update(_parse_env_file(os.path.join(os.getcwd(), ".env")))
    merged.update({k: v for k, v in os.environ.items()})
    if env:
        merged.update(env)

    kwargs: dict[str, Any] = {}
    for name, field in Settings.model_fields.items():
        env_name = name.upper()
        if env_name in merged:
            kwargs[name] = _coerce(field.annotation, merged[env_name])
    return Settings(**kwargs)


@lru_cache(maxsize=1)
def get_settings() -> Settings:
    """Process-wide settings singleton (reference config/__init__.py:487-498)."""
    return load_settings()


def reset_settings() -> None:
    """Testing hook: drop the cached singleton."""
    get_settings.cache_clear()
