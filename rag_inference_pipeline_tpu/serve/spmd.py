"""SPMD multi-host serving: one HTTP front door, N jax.distributed hosts.

The reference scales retrieval by standing up one FAISS HTTP service per
node and fanning requests out over REST (reference rpc_client.py:44-88,
config/__init__.py:81-97). The TPU-native shape is single-program
multi-data: every host joins one `jax.distributed` process group, the
index rows shard over the global mesh's dp axis (DCN between hosts, ICI
inside), and a *search step is a collective program* — every process must
execute the same jitted computation in the same order.

That constraint drives the design here (the standard multi-host inference
server pattern):

  - process 0 runs the aiohttp front door and owns request admission;
  - processes 1..N-1 run `worker_loop()` — a blocking loop that receives
    (header, queries) broadcasts and executes the identical search;
  - `SPMDIndexProxy` wraps the index on process 0: each `search()` first
    broadcasts a fixed-shape header [op, rows, k, dim] then the padded
    query block, so all processes enter the sharded search together.

Workers never initiate searches (no local warmup — the front door's
warmup broadcasts drive every process through the same compile set), and
the proxy serializes searches under a lock so concurrent schedulers
cannot interleave two broadcast sequences.

Query batches are already bucket-padded by the serve layer
(serve/services.py bucket ladders), so the broadcast shapes — and thus
the compiled program set — are identical on every process.
"""

from __future__ import annotations

import logging
import threading
from typing import Any

import jax
import numpy as np

logger = logging.getLogger(__name__)

OP_STOP = 0
OP_SEARCH = 1

_HDR_LEN = 4


def _broadcast(x: np.ndarray) -> np.ndarray:
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(x))


def is_spmd() -> bool:
    return jax.process_count() > 1


def is_front_door() -> bool:
    return jax.process_index() == 0


class SPMDIndexProxy:
    """Front-door wrapper: broadcast (header, queries), then search.

    Exposes the BaseIndex surface the serve layer touches (search /
    ntotal / dim / is_loaded / warmup / kind); everything else proxies
    through to the wrapped index.
    """

    def __init__(self, index: Any) -> None:
        self._inner = index
        self._lock = threading.Lock()
        self._stopped = False

    def __getattr__(self, name: str) -> Any:  # ntotal, dim, kind, ...
        return getattr(self._inner, name)

    def search(self, queries, k: int):
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        with self._lock:
            if self._stopped:
                # workers are gone; a broadcast now blocks forever
                raise RuntimeError("index not ready: SPMD workers stopped")
            hdr = np.array(
                [OP_SEARCH, q.shape[0], int(k), q.shape[1]], np.int32
            )
            _broadcast(hdr)
            _broadcast(q)
            return self._inner.search(q, k)

    def warmup(self, k: int = 10) -> float:
        import time

        t0 = time.time()
        q = np.zeros((1, self._inner.dim), np.float32)
        jax.block_until_ready(self.search(q, k))
        return time.time() - t0

    def stop_workers(self) -> None:
        """Broadcast OP_STOP so worker processes exit their loops.

        Idempotent: once workers have exited, a second OP_STOP broadcast
        would block forever waiting on departed peers (both the error
        path in runtime.serve() and component unload call this)."""
        with self._lock:
            if getattr(self, "_stopped", False):
                return
            self._stopped = True
            _broadcast(np.zeros(_HDR_LEN, np.int32))  # op 0 = stop


def worker_loop(index: Any) -> None:
    """Blocking search-executor loop for processes 1..N-1.

    Receives the front door's broadcasts and executes the identical
    sharded search so the collective program stays in lockstep. Returns
    when OP_STOP arrives.
    """
    logger.info(
        "SPMD worker %d/%d entering search loop",
        jax.process_index(),
        jax.process_count(),
    )
    while True:
        hdr = _broadcast(np.zeros(_HDR_LEN, np.int32))
        op, rows, k, dim = (int(v) for v in hdr)
        if op == OP_STOP:
            logger.info("SPMD worker %d stopping", jax.process_index())
            return
        q = _broadcast(np.zeros((rows, dim), np.float32))
        jax.block_until_ready(index.search(q, k))
