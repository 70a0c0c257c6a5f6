"""Named thread-pool executors for CPU-bound host work.

Parity with the reference's ServiceExecutorFactory (reference
utils/executors.py:17-66): named ThreadPoolExecutors sized to cores,
`run_cpu_bound` wrapper, global shutdown hooked into node teardown. On TPU
the device does the heavy compute, so these pools carry host-side work:
tokenization, doc-store fan-out, numpy pre/post-processing.
"""

from __future__ import annotations

import asyncio
import concurrent.futures
import os
import threading
from typing import Any, Callable, Optional

_lock = threading.Lock()
_pools: dict[str, concurrent.futures.ThreadPoolExecutor] = {}


def get_executor(
    name: str, max_workers: Optional[int] = None
) -> concurrent.futures.ThreadPoolExecutor:
    with _lock:
        pool = _pools.get(name)
        if pool is None:
            workers = max_workers or min(8, os.cpu_count() or 4)
            pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=workers, thread_name_prefix=f"ragtpu-{name}"
            )
            _pools[name] = pool
        return pool


async def run_cpu_bound(name: str, fn: Callable[..., Any], *args) -> Any:
    """Run sync fn in the named pool without blocking the event loop
    (reference executors.py:47-59)."""
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(get_executor(name), fn, *args)


def shutdown_all(wait: bool = True) -> None:
    """Join all pools (reference executors.py:61-66; hooked at SIGTERM)."""
    with _lock:
        pools, _pools_snapshot = list(_pools.items()), None
        _pools.clear()
    for _name, pool in pools:
        pool.shutdown(wait=wait)
