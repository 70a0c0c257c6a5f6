"""RPC client tests against a real local aiohttp server: compression on the
wire, retry-on-5xx, no-retry-on-4xx, timeout taxonomy (reference
rpc_client.py:103-211 behaviors)."""

import asyncio
import json

import pytest
from aiohttp import web
from aiohttp.test_utils import TestServer

from rag_inference_pipeline_tpu.core import Settings
from rag_inference_pipeline_tpu.serve.compression import (
    compress,
    decompress,
    pack_docs,
    unpack_docs,
)
from rag_inference_pipeline_tpu.serve.rpc import (
    RPCClient,
    RPCError,
    RPCServiceError,
)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def make_server(handler):
    app = web.Application()
    app.router.add_post("/echo", handler)
    return TestServer(app)


class TestCompressionHelpers:
    def test_roundtrip_and_magic_sniff(self):
        data = b"x" * 4096
        blob, was = compress(data, min_bytes=10)
        assert was and blob[:4] == b"\x28\xb5\x2f\xfd"
        assert decompress(blob) == data
        assert decompress(b"plain data") == b"plain data"  # sniff: passthrough

    def test_small_payload_not_compressed(self):
        data = b"tiny"
        blob, was = compress(data, min_bytes=512)
        assert not was and blob == data

    def test_incompressible_not_compressed(self):
        import os

        data = os.urandom(4096)
        blob, was = compress(data, min_bytes=10)
        assert not was

    def test_pack_unpack_docs(self):
        docs = [{"id": 1, "content": "hello " * 100}]
        assert unpack_docs(pack_docs(docs)) == docs


class TestRPCClient:
    def test_post_with_compression(self):
        async def main():
            seen = {}

            async def handler(request):
                seen["encoding"] = request.headers.get("X-Ragtpu-Encoding")
                body = decompress(await request.read())
                payload = json.loads(body)
                return web.json_response({"got": payload["items"]})

            server = make_server(handler)
            await server.start_server()
            s = Settings(compression_min_bytes=10, rpc_retries=1)
            client = RPCClient(s)
            out = await client.post(
                f"http://127.0.0.1:{server.port}/echo",
                {"items": ["x" * 2000]},
            )
            await client.close()
            await server.close()
            return out, seen

        out, seen = run(main())
        assert seen["encoding"] == "zstd"
        assert out["got"] == ["x" * 2000]

    def test_retry_on_5xx_then_success(self):
        async def main():
            calls = {"n": 0}

            async def handler(request):
                calls["n"] += 1
                if calls["n"] < 3:
                    return web.json_response({"error": "boom"}, status=503)
                return web.json_response({"ok": True})

            server = make_server(handler)
            await server.start_server()
            s = Settings(rpc_retries=3, rpc_backoff_base_s=0.01)
            client = RPCClient(s)
            out = await client.post(f"http://127.0.0.1:{server.port}/echo", {})
            await client.close()
            await server.close()
            return out, calls["n"]

        out, n = run(main())
        assert out == {"ok": True} and n == 3

    def test_4xx_never_retried(self):
        async def main():
            calls = {"n": 0}

            async def handler(request):
                calls["n"] += 1
                return web.json_response({"error": "bad"}, status=400)

            server = make_server(handler)
            await server.start_server()
            s = Settings(rpc_retries=3, rpc_backoff_base_s=0.01)
            client = RPCClient(s)
            with pytest.raises(RPCServiceError) as ei:
                await client.post(f"http://127.0.0.1:{server.port}/echo", {})
            await client.close()
            await server.close()
            return calls["n"], ei.value.status

        n, status = run(main())
        assert n == 1 and status == 400

    def test_connect_error_exhausts_retries(self):
        async def main():
            s = Settings(rpc_retries=2, rpc_backoff_base_s=0.01)
            client = RPCClient(s)
            with pytest.raises(RPCError):
                await client.post("http://127.0.0.1:1/echo", {})
            await client.close()

        run(main())
