"""Multi-host (DCN) initialization — the JAX-native replacement for the
reference's static 3-node HTTP topology (NODE_{0,1,2}_IP env addressing,
reference config/__init__.py:81-97 and rpc_client.py:44-88).

One `jax.distributed` process group per host; after initialize() the global
mesh spans every host's chips, the dp axis crosses hosts over DCN while tp
stays inside each host's ICI domain, and XLA inserts the cross-host
collectives — no application-level RPC for tensor traffic.

Settings (env): DIST_NUM_PROCESSES, DIST_PROCESS_ID, DIST_COORDINATOR
(host:port of process 0). The 2-process CPU dryrun lives at
scripts/dryrun_dcn.py (DCN-over-TCP on localhost, SURVEY.md section 2.6).
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)

_initialized = False


def init_distributed(settings) -> bool:
    """Join the jax.distributed process group when configured (idempotent).

    Returns True when running multi-process. Must be called before the
    first jax device/array use in the process.
    """
    global _initialized
    if getattr(settings, "dist_num_processes", 1) <= 1:
        return False
    if _initialized:
        return True
    jax.distributed.initialize(
        coordinator_address=settings.dist_coordinator,
        num_processes=settings.dist_num_processes,
        process_id=settings.dist_process_id,
    )
    _initialized = True
    logger.info(
        "jax.distributed up: process %d/%d, %d local + %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def validate_mesh_for_hosts(dp: int, tp: int) -> None:
    """tp must not straddle hosts: cross-host ICI does not exist, so a tp
    group split over DCN would put every layer's all-reduce on the slow
    path. dp crossing hosts is the intended DCN axis."""
    local = jax.local_device_count()
    if tp > local:
        raise ValueError(
            f"tp={tp} exceeds local device count {local}: tensor-parallel "
            "groups must stay inside one host's ICI domain"
        )
    if local % tp:
        raise ValueError(
            f"local device count {local} not divisible by tp={tp}; tp "
            "groups would straddle hosts"
        )
