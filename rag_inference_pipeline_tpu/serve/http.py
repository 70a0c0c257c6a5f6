"""HTTP serving surface (aiohttp): the reference's FastAPI app re-created
endpoint-for-endpoint (reference runtime_factory.py:240-312 mounts
gateway/retrieval/generation routers + /health + /metrics; gateway/api.py
error taxonomy -> 400/503/500; /clear_cache cascades downstream).

Request bodies may arrive zstd-compressed (Content-Encoding) and responses
compress when Accept-Encoding allows — the CompressionMiddleware twin
(reference middleware.py:73-169).
"""

from __future__ import annotations

import asyncio
import json
import logging
from typing import Optional

from aiohttp import web
from pydantic import ValidationError

from ..core.config import Settings
from ..core.profiles import Profile
from ..core.registry import ComponentRegistry
from ..engine.batcher import BatchScheduler
from ..telemetry.metrics import (
    ERRORS_TOTAL,
    render_metrics,
    update_resource_gauges,
)
from .compression import compress, decompress
from .rpc import RPCError
from .schemas import (
    GenerateRequest,
    GenerateResponse,
    HealthResponse,
    QueryRequest,
    QueryResponse,
    RetrieveRequest,
    RetrieveResponse,
)

logger = logging.getLogger(__name__)

SCHEDULERS_KEY = web.AppKey("schedulers", dict)
TRACE_KEY = web.AppKey("trace_capture", object)
REGISTRY_KEY = web.AppKey("registry", ComponentRegistry)
SETTINGS_KEY = web.AppKey("settings", Settings)
PROFILE_KEY = web.AppKey("profile", Profile)


# Custom header: aiohttp's HTTP parser rejects Content-Encoding values it
# can't decode itself, so the pipeline's zstd framing rides X-Ragtpu-Encoding
# (both ends are ours: RPCClient + this middleware).
ENCODING_HEADER = "X-Ragtpu-Encoding"
ACCEPT_HEADER = "X-Ragtpu-Accept-Encoding"


@web.middleware
async def compression_middleware(request: web.Request, handler):
    if request.headers.get(ENCODING_HEADER) == "zstd":
        # handlers read the body via _read_json, which prefers this key
        request["_decompressed_body"] = decompress(await request.read())
    resp = await handler(request)
    s: Settings = request.app[SETTINGS_KEY]
    if (
        "zstd" in request.headers.get(ACCEPT_HEADER, "")
        and isinstance(resp, web.Response)
        and resp.body
        and s.compression_algorithm == "zstd"
    ):
        body, was = compress(
            bytes(resp.body),
            level=s.compression_level,
            min_bytes=s.compression_min_bytes,
            run_id=s.run_id,
            node=str(s.node_number),
            direction="in",
        )
        if was:
            resp.body = body
            resp.headers[ENCODING_HEADER] = "zstd"
    return resp


def _cors_headers(request: web.Request) -> dict:
    # reference parity: CORSMiddleware(allow_origins=['*'],
    # allow_credentials=True, allow_methods=['*'], allow_headers=['*'])
    # (reference runtime_factory.py:146-153). With credentials allowed
    # the CORS spec forbids a literal '*' origin, so (like Starlette in
    # this configuration) the request's Origin is echoed back when
    # present, with Vary: Origin for caches.
    origin = request.headers.get("Origin")
    return {
        "Access-Control-Allow-Origin": origin or "*",
        "Access-Control-Allow-Credentials": "true",
        "Access-Control-Allow-Methods": "*",
        "Access-Control-Allow-Headers": "*",
        **({"Vary": "Origin"} if origin else {}),
    }


GZIP_MIN_SIZE = 1000  # reference GZipMiddleware(minimum_size=1000)


@web.middleware
async def cors_gzip_middleware(request: web.Request, handler):
    """CORS headers + standard-gzip negotiation (reference
    runtime_factory.py:146-158). gzip applies only when the pipeline's
    zstd framing did not (zstd is strictly better between our own nodes;
    gzip serves browser/generic clients)."""
    if request.method == "OPTIONS" and (
        "Access-Control-Request-Method" in request.headers
    ):
        # genuine preflight only; plain OPTIONS falls through to routing
        return web.Response(status=204, headers=_cors_headers(request))
    # NB gzip/deflate REQUEST bodies are decompressed by aiohttp's server
    # transparently; only response-side negotiation lives here
    resp = await handler(request)
    if isinstance(resp, web.Response):
        resp.headers.update(_cors_headers(request))
        if (
            resp.body
            and len(resp.body) >= GZIP_MIN_SIZE
            and ENCODING_HEADER not in resp.headers
            and "gzip" in request.headers.get("Accept-Encoding", "")
        ):
            resp.enable_compression(web.ContentCoding.gzip)
    return resp


@web.middleware
async def error_middleware(request: web.Request, handler):
    """Error taxonomy -> status codes (reference gateway/api.py:145-176)."""
    s: Settings = request.app[SETTINGS_KEY]
    try:
        return await handler(request)
    except web.HTTPException:
        raise
    except (ValidationError, ValueError, json.JSONDecodeError) as exc:
        ERRORS_TOTAL.labels(
            s.run_id, str(s.node_number), "http", type(exc).__name__
        ).inc()
        return web.json_response(
            {"error": str(exc)[:500], "error_type": "validation"}, status=400
        )
    except RuntimeError as exc:
        # readiness failures -> 503 (reference retrieval/api.py:221-239)
        ERRORS_TOTAL.labels(
            s.run_id, str(s.node_number), "http", type(exc).__name__
        ).inc()
        msg = str(exc)
        status = 503 if "not ready" in msg or "not loaded" in msg else 500
        return web.json_response(
            {"error": msg[:500], "error_type": "unavailable"}, status=status
        )
    except RPCError as exc:
        # downstream-node failures are unavailability, not internal errors
        # (reference gateway/api.py maps RPC errors to 503)
        ERRORS_TOTAL.labels(
            s.run_id, str(s.node_number), "http", type(exc).__name__
        ).inc()
        return web.json_response(
            {"error": str(exc)[:500], "error_type": "unavailable"}, status=503
        )
    except Exception as exc:  # noqa: BLE001
        logger.exception("unhandled error on %s", request.path)
        ERRORS_TOTAL.labels(
            s.run_id, str(s.node_number), "http", type(exc).__name__
        ).inc()
        return web.json_response(
            {"error": str(exc)[:500], "error_type": "internal"}, status=500
        )


async def _read_json(request: web.Request) -> dict:
    body = request.get("_decompressed_body") or await request.read()
    return json.loads(body)


# -- handlers ---------------------------------------------------------------


_last_gauge_update = [0.0]


async def handle_query(request: web.Request) -> web.Response:
    import time as _t

    q = QueryRequest.model_validate(await _read_json(request))
    s: Settings = request.app[SETTINGS_KEY]
    orch = request.app[REGISTRY_KEY].get("orchestrator")
    # resource snapshot at most every 5 s — psutil + device memory_stats on
    # every request would stall the event loop at high QPS
    now = _t.monotonic()
    if now - _last_gauge_update[0] > 5.0:
        _last_gauge_update[0] = now
        update_resource_gauges(s.run_id, str(s.node_number))
    result = await orch.process_query(q.query, q.request_id, q.k)
    return web.json_response(QueryResponse(**result).model_dump())


def _retrieve_response(results: list[dict], response_format: str,
                       fast_json: bool) -> web.Response:
    """Common /retrieve response encode: b64 packing, native id_only JSON
    (utils/fastjson.py — the orjson role), or pydantic for document-bearing
    payload modes."""
    if response_format == "b64":
        return web.json_response(_pack_results_b64(results))
    if fast_json:
        from ..utils import fastjson as _fastjson

        enc = _fastjson.encode_results(results)
        if enc is not None:
            return web.Response(body=enc, content_type="application/json")
    return web.json_response(
        RetrieveResponse(results=results).model_dump(exclude_none=True)
    )


async def handle_retrieve(request: web.Request) -> web.Response:
    s: Settings = request.app[SETTINGS_KEY]
    body = request.get("_decompressed_body") or await request.read()
    if s.fast_json:
        # native strict-shape parse (utils/fastjson.py); None => the stdlib
        # + pydantic path below, which produces every 400 and every shape
        # the fast path declines — behavior-identical by construction
        from ..utils import fastjson as _fastjson

        fj = _fastjson.parse_retrieve(bytes(body), s.index_dim)
        if fj is not None:
            sched_fj: BatchScheduler = request.app[SCHEDULERS_KEY]["retrieval"]
            items = [
                {
                    "query": "",
                    "embedding": fj.embeddings[i],
                    "k": int(fj.item_k[i]) if fj.item_k[i] >= 0 else fj.k,
                    "rerank": fj.rerank,
                }
                for i in range(fj.embeddings.shape[0])
            ]
            results = list(await sched_fj.enqueue_many(items))
            return _retrieve_response(
                results, fj.response_format, s.fast_json
            )
    req = RetrieveRequest.model_validate(json.loads(body))
    # validate dims BEFORE enqueueing: a bad item inside a flushed batch
    # would fail other clients' co-batched requests
    batch_emb = None
    if req.embeddings_b64 is not None:
        import base64 as _b64

        import numpy as _np

        raw = _b64.b64decode(req.embeddings_b64, validate=True)
        row = s.index_dim * 4
        if req.items is not None and len(raw) != len(req.items) * row:
            raise ValueError(
                f"embeddings_b64: {len(raw)} bytes != "
                f"{len(req.items)} items x {s.index_dim} dim x f32"
            )
        if req.items is None and (len(raw) == 0 or len(raw) % row != 0):
            raise ValueError(
                f"embeddings_b64: {len(raw)} bytes is not a non-zero "
                f"multiple of {s.index_dim} dim x f32"
            )
        batch_emb = _np.frombuffer(raw, _np.float32).reshape(
            -1, s.index_dim
        )
    if req.items is not None:
        for i, it in enumerate(req.items):
            if it.embedding is not None and len(it.embedding) != s.index_dim:
                raise ValueError(
                    f"item {i}: embedding dim {len(it.embedding)} != "
                    f"index dim {s.index_dim}"
                )
    sched: BatchScheduler = request.app[SCHEDULERS_KEY]["retrieval"]
    if req.items is None:
        # itemless binary batch: one dict per embedding row, shared k
        items = [
            {"query": "", "embedding": batch_emb[i], "k": req.k,
             "rerank": req.rerank}
            for i in range(batch_emb.shape[0])
        ]
    else:
        items = [
            {
                "query": it.query,
                "embedding": (
                    batch_emb[i]
                    if batch_emb is not None and it.embedding is None
                    else it.embedding
                ),
                "k": it.k if it.k is not None else req.k,
                "rerank": req.rerank,
            }
            for i, it in enumerate(req.items)
        ]
    results = await sched.enqueue_many(items)
    return _retrieve_response(list(results), req.response_format, s.fast_json)


def _pack_results_b64(results: list[dict]) -> dict:
    """Binary id_only response: ids int32 [B, k] (pad -1) + scores f32
    [B, k] (pad 0) base64'd — ~3 us vs ~40 ms of pydantic + float
    formatting for 512 rows (PERF_NOTES "Serve-layer ceiling"). Document
    payload modes keep the JSON shape (docs don't pack into rectangles)."""
    import base64 as _b64

    import numpy as _np

    if any("documents" in r or "compressed_docs" in r for r in results):
        raise ValueError(
            "response_format='b64' requires documents_payload_mode=id_only"
        )
    b = len(results)
    k = max((len(r["ids"]) for r in results), default=0)
    ids = _np.full((b, k), -1, _np.int32)
    scores = _np.zeros((b, k), _np.float32)
    for i, r in enumerate(results):
        m = len(r["ids"])
        ids[i, :m] = r["ids"]
        scores[i, :m] = r["scores"]
    return {
        "count": b,
        "k": k,
        "ids_b64": _b64.b64encode(ids.tobytes()).decode(),
        "scores_b64": _b64.b64encode(scores.tobytes()).decode(),
    }


async def handle_generate(request: web.Request) -> web.Response:
    req = GenerateRequest.model_validate(await _read_json(request))
    sched: BatchScheduler = request.app[SCHEDULERS_KEY]["generation"]
    items = [it.model_dump(exclude_none=True) for it in req.items]
    results = await sched.enqueue_many(items)
    return web.json_response(
        GenerateResponse(results=list(results)).model_dump()
    )


async def handle_health(request: web.Request) -> web.Response:
    s: Settings = request.app[SETTINGS_KEY]
    registry = request.app[REGISTRY_KEY]
    health = registry.health()
    random_w = [
        name
        for name in registry.names
        if getattr(registry.get(name), "random_weights", False)
    ]
    ok = all(health.values())
    resp = HealthResponse(
        status="ok" if ok else "degraded",
        node=s.node_number,
        role=s.node_role.value,
        components=health,
        random_weights=random_w,
    )
    return web.json_response(resp.model_dump(), status=200 if ok else 503)


async def handle_metrics(request: web.Request) -> web.Response:
    return web.Response(body=render_metrics(), content_type="text/plain")


async def handle_profile_start(request: web.Request) -> web.Response:
    """Start a jax.profiler device trace — the Scalene analog (reference
    wraps nodes in Scalene via run.sh:19-59; here traces are on-demand and
    TensorBoard-compatible)."""
    from ..telemetry.profiling import DeviceTraceCapture

    cap = request.app.get(TRACE_KEY)
    if cap is None:
        cap = DeviceTraceCapture()
        request.app[TRACE_KEY] = cap
    try:
        log_dir = cap.start()
    except Exception as exc:  # noqa: BLE001 — double-start etc.
        return web.json_response({"error": str(exc)[:200]}, status=409)
    return web.json_response({"status": "tracing", "log_dir": log_dir})


async def handle_profile_stop(request: web.Request) -> web.Response:
    cap = request.app.get(TRACE_KEY)
    if cap is None:
        return web.json_response({"error": "no trace active"}, status=409)
    cap.stop()
    return web.json_response({"status": "stopped", "log_dir": cap.log_dir})


async def handle_clear_cache(request: web.Request) -> web.Response:
    registry = request.app[REGISTRY_KEY]
    s: Settings = request.app[SETTINGS_KEY]
    cleared = []
    orch = registry.get_optional("orchestrator")
    if orch is not None:
        orch.clear_cache()
        cleared.append("query")
        # cascade to downstream nodes (reference gateway/api.py:181-209)
        if orch.retrieval_executor is None and s.total_nodes > 1:
            await orch.rpc.clear_cache(s.retrieval_url)
        if orch.generation_service is None and s.total_nodes > 1:
            await orch.rpc.clear_cache(s.generation_url)
    rexec = registry.get_optional("retrieval_executor")
    if rexec is not None:
        rexec.search_cache.clear()
        cleared.append("search")
    for name in ("embedder", "doc_store"):
        comp = registry.get_optional(name)
        if comp is not None and hasattr(comp, "cache"):
            comp.cache.clear()
            cleared.append(name)
    return web.json_response({"cleared": cleared})


# -- app assembly -----------------------------------------------------------


def create_app(
    settings: Settings,
    profile: Profile,
    registry: ComponentRegistry,
) -> web.Application:
    app = web.Application(
        middlewares=[
            cors_gzip_middleware,  # outermost, like the reference's CORS
            error_middleware,
            compression_middleware,
        ],
        client_max_size=256 * 1024 * 1024,
    )
    app[SETTINGS_KEY] = settings
    app[PROFILE_KEY] = profile
    app[REGISTRY_KEY] = registry
    app[SCHEDULERS_KEY] = {}

    app.router.add_get("/health", handle_health)
    app.router.add_get("/metrics", handle_metrics)
    app.router.add_post("/clear_cache", handle_clear_cache)
    app.router.add_post("/profile/start", handle_profile_start)
    app.router.add_post("/profile/stop", handle_profile_stop)
    if "gateway" in profile.routes:
        app.router.add_post("/query", handle_query)
    if "retrieval" in profile.routes:
        app.router.add_post("/retrieve", handle_retrieve)
    if "generation" in profile.routes:
        app.router.add_post("/generate", handle_generate)

    async def on_startup(app: web.Application) -> None:
        # per-service re-batching schedulers (reference retrieval/api.py:302,
        # generation/api.py:70)
        if "retrieval" in profile.routes:
            rexec = registry.get("retrieval_executor")
            app[SCHEDULERS_KEY]["retrieval"] = BatchScheduler(
                rexec.process_batch,
                batch_size=settings.retrieval_batch_size,
                timeout_s=settings.retrieval_batch_timeout_ms / 1e3,
                adaptive=settings.adaptive_batching,
                flush_on_ready=settings.batch_flush_on_ready,
                name="retrieval",
                run_id=settings.run_id,
                node=str(settings.node_number),
            )
        if "generation" in profile.routes:
            gsvc = registry.get("generation_service")
            gen_fn = (
                gsvc.process_batch_async
                if settings.use_continuous_batching
                else gsvc.process_batch
            )
            app[SCHEDULERS_KEY]["generation"] = BatchScheduler(
                gen_fn,
                batch_size=settings.generation_batch_size,
                timeout_s=settings.generation_batch_timeout_ms / 1e3,
                adaptive=settings.adaptive_batching,
                # engine mode interleaves many in-flight generation calls
                # in ONE continuously-batched decode loop — completion
                # clocking would serialize its feed (see orchestrator.py
                # for the same reasoning on the pipelined gateway)
                flush_on_ready=(
                    settings.batch_flush_on_ready
                    and not settings.use_continuous_batching
                ),
                name="generation",
                run_id=settings.run_id,
                node=str(settings.node_number),
            )
        await registry.start_all()

    async def on_cleanup(app: web.Application) -> None:
        for sched in app[SCHEDULERS_KEY].values():
            await sched.stop()
        await registry.stop_all()
        registry.unload_all()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app
