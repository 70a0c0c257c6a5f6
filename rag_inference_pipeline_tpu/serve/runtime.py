"""Node entry point: `python -m rag_inference_pipeline_tpu.serve.runtime`
(or the `ragtpu` console script).

Reference parity (src/pipeline/runtime.py:97-184): settings -> tracing ->
banner -> profile-driven app assembly -> server with SIGINT/SIGTERM graceful
shutdown (schedulers flush, registry stops in reverse, weights unload).
Every node runs this same binary; the YAML profile decides what it hosts.
"""

from __future__ import annotations

import asyncio
import logging
import signal
from typing import Optional

from aiohttp import web

from ..core.config import Settings, get_settings
from ..core.profiles import load_role_profile
from ..telemetry.tracing import setup_tracing
from .factory import build_registry
from .http import create_app

logger = logging.getLogger(__name__)


def setup_logging(settings: Settings) -> None:
    logging.basicConfig(
        level=getattr(logging, settings.log_level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )


def resolve_serving_settings(settings: Settings) -> Settings:
    """Serving-entry defaults for tri-state knobs (library use keeps them
    off). warmup_buckets None -> ON: a fresh deployment must never see the
    measured 25.7 s in-band-compile p95 (round-3 VERDICT #9); opt out with
    WARMUP_BUCKETS=0."""
    if settings.warmup_buckets is None:
        logger.info("WARMUP_BUCKETS unset — defaulting ON for serving")
        settings = settings.model_copy(update={"warmup_buckets": True})
    return settings


def build_app(settings: Optional[Settings] = None) -> web.Application:
    settings = resolve_serving_settings(settings or get_settings())
    profile = load_role_profile(settings)
    if profile.batch_overrides:
        # profile-level batch knob overrides (reference
        # runtime_factory.py:202-206)
        settings = settings.model_copy(update=profile.batch_overrides)
    logger.info(
        "node %d (%s) starting with profile %r: components=%s routes=%s",
        settings.node_number,
        settings.node_role.value,
        profile.name,
        [c.name for c in profile.components],
        profile.routes,
    )
    registry = build_registry(settings, profile)
    return create_app(settings, profile, registry)


async def serve(settings: Optional[Settings] = None) -> None:
    from ..core.bootstrap import bootstrap

    bootstrap()
    settings = settings or get_settings()
    setup_logging(settings)
    setup_tracing(settings)
    app = build_app(settings)

    from .spmd import is_front_door, is_spmd

    if is_spmd() and not is_front_door():
        # SPMD worker host: no HTTP front door — execute the process-0
        # broadcasts until OP_STOP, then stop components (serve/spmd.py)
        from .http import REGISTRY_KEY
        from .spmd import worker_loop

        registry = app[REGISTRY_KEY]
        idx_comp = registry.get_optional("index")
        index = getattr(idx_comp, "index", None)
        if index is None:
            raise RuntimeError("SPMD worker host has no index component")
        worker_loop(index)
        await registry.stop_all()
        registry.unload_all()
        return

    try:
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, settings.listen_host, settings.listen_port)
        await site.start()
        logger.info(
            "listening on %s:%d", settings.listen_host, settings.listen_port
        )

        stop = asyncio.Event()
        loop = asyncio.get_running_loop()
        for sig in (signal.SIGINT, signal.SIGTERM):
            try:
                loop.add_signal_handler(sig, stop.set)
            except NotImplementedError:  # pragma: no cover — non-unix
                pass
        await stop.wait()
        logger.info("shutdown signal received; draining")
        await runner.cleanup()
    except BaseException:
        # a front-door failure (port bind, serving crash) must not strand
        # worker hosts inside their blocking broadcast loop — send OP_STOP
        # before propagating so the whole deployment exits, not hangs
        if is_spmd():
            from .http import REGISTRY_KEY

            idx_comp = app[REGISTRY_KEY].get_optional("index")
            stop_fn = getattr(
                getattr(idx_comp, "index", None), "stop_workers", None
            )
            if stop_fn is not None:
                try:
                    stop_fn()
                except Exception:  # noqa: BLE001 — best-effort unblock
                    logger.exception("failed to OP_STOP worker hosts")
        raise


def main() -> None:
    asyncio.run(serve())


if __name__ == "__main__":
    main()
