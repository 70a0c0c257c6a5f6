"""Inter-node RPC client for DCN (cross-host) hops.

Reference parity (services/gateway/rpc_client.py:44-324): pooled async HTTP
client, outbound body compression with Content-Encoding headers, retry x3
exponential backoff on 5xx/connect errors (never on 4xx), response
decompression with magic sniffing, typed error taxonomy, duration metrics.

httpx.AsyncClient (HTTP/1.1; the h2 extra isn't in the image — connection
pooling covers the reference's perf purpose). On-ICI hops never use this:
stages sharing a mesh exchange device arrays directly (SURVEY.md 2.6).
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
from typing import Any, Optional

import httpx

from ..core.config import Settings
from ..telemetry.metrics import RPC_DURATION
from .compression import compress, decompress

logger = logging.getLogger(__name__)


class RPCError(Exception):
    pass


class RPCTimeoutError(RPCError):
    pass


class RPCServiceError(RPCError):
    def __init__(self, status: int, detail: str) -> None:
        super().__init__(f"HTTP {status}: {detail}")
        self.status = status


class RPCClient:
    def __init__(self, settings: Settings) -> None:
        self.settings = settings
        self._client: Optional[httpx.AsyncClient] = None

    def _ensure(self) -> httpx.AsyncClient:
        if self._client is None:
            self._client = httpx.AsyncClient(
                timeout=httpx.Timeout(self.settings.request_timeout_s),
                limits=httpx.Limits(
                    max_connections=self.settings.http_max_connections,
                    max_keepalive_connections=20,
                ),
            )
        return self._client

    async def post(self, url: str, payload: dict, *, target: str = "peer") -> dict:
        s = self.settings
        body = json.dumps(payload).encode()
        headers = {
            "Content-Type": "application/json",
            "X-Ragtpu-Accept-Encoding": "zstd",
        }
        if s.compression_algorithm == "zstd":
            body, was = compress(
                body,
                level=s.compression_level,
                min_bytes=s.compression_min_bytes,
                run_id=s.run_id,
                node=str(s.node_number),
                direction="out",
            )
            if was:
                headers["X-Ragtpu-Encoding"] = "zstd"

        client = self._ensure()
        last_exc: Optional[Exception] = None
        for attempt in range(s.rpc_retries):
            t0 = time.monotonic()
            try:
                resp = await client.post(url, content=body, headers=headers)
                RPC_DURATION.labels(
                    s.run_id, str(s.node_number), target
                ).observe(time.monotonic() - t0)
                if 200 <= resp.status_code < 300:
                    return json.loads(decompress(resp.content))
                detail = resp.text[:500]
                if 400 <= resp.status_code < 500:
                    # 4xx is never retried (reference rpc_client.py:103-108)
                    raise RPCServiceError(resp.status_code, detail)
                last_exc = RPCServiceError(resp.status_code, detail)
            except RPCServiceError as exc:
                if 400 <= exc.status < 500:
                    raise
                last_exc = exc
            except httpx.TimeoutException as exc:
                last_exc = RPCTimeoutError(str(exc))
            except httpx.TransportError as exc:
                last_exc = RPCError(f"connect: {exc}")
            await asyncio.sleep(s.rpc_backoff_base_s * (2**attempt))
        raise last_exc if last_exc else RPCError("rpc failed")

    async def get(self, url: str) -> dict:
        resp = await self._ensure().get(url)
        if resp.status_code != 200:
            raise RPCServiceError(resp.status_code, resp.text[:200])
        return resp.json()

    async def clear_cache(self, base_url: str) -> bool:
        """Cascade cache clearing (reference gateway/api.py:181-209)."""
        try:
            await self.post(f"{base_url}/clear_cache", {}, target="clear_cache")
            return True
        except RPCError:
            return False

    async def close(self) -> None:
        if self._client is not None:
            await self._client.aclose()
            self._client = None
