#!/usr/bin/env python
"""Multi-host (DCN) dryrun: two localhost processes, each faking 4 CPU
devices, joined by jax.distributed over TCP — the CI-runnable stand-in for
a 2-host TPU pod slice (VERDICT round-1 item #5; SURVEY.md section 2.6
"DCN (JAX multi-host) between hosts").

Validates:
  - jax.distributed.initialize handshake (coordinator on process 0)
  - a global dp=8 mesh spanning both processes (dp crosses DCN)
  - a dp=4 x tp=2 mesh (tp inside each process, validate_mesh_for_hosts)
  - sharded_topk over a row-sharded global DB == numpy oracle
  - a TP-sharded matmul (psum over tp) == dense oracle

Parent mode (no args) spawns the two workers and checks both exit 0.
"""

from __future__ import annotations

try:  # repo-root import without pip install; scripts/ is sys.path[0]
    # only when run as a script — harmless to skip when imported as a
    # module by tests (the package is importable there already)
    import _pathfix  # noqa: F401
except ImportError:
    pass

import argparse
import os
import socket
import subprocess
import sys


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def worker(rank: int, nprocs: int, port: int) -> None:
    os.environ.pop("JAX_PLATFORMS", None)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from rag_inference_pipeline_tpu.core.config import Settings
    from rag_inference_pipeline_tpu.core.distributed import init_distributed
    from rag_inference_pipeline_tpu.core.mesh import (
        DP_AXIS,
        TP_AXIS,
        make_mesh,
    )
    from rag_inference_pipeline_tpu.ops.topk import sharded_topk

    settings = Settings(
        dist_num_processes=nprocs,
        dist_process_id=rank,
        dist_coordinator=f"127.0.0.1:{port}",
    )
    assert init_distributed(settings)
    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs

    # --- dp=8 across DCN: sharded top-k vs oracle -------------------------
    ctx = make_mesh(dp=4 * nprocs, tp=1)
    rng = np.random.default_rng(0)
    n, d, b, k = 4096, 64, 4, 5
    db = rng.standard_normal((n, d), dtype=np.float32)
    q = db[:b] + 0.01 * rng.standard_normal((b, d), dtype=np.float32)
    db_dev = ctx.put(jnp.asarray(db), ctx.rows_dp)
    q_dev = ctx.put(jnp.asarray(q))
    s, ids = sharded_topk(ctx, q_dev, db_dev, k)
    ids = np.asarray(jax.device_get(ids))
    oracle = np.argsort(-(q @ db.T), axis=1)[:, :k]
    rec = np.mean(
        [len(set(ids[i]) & set(oracle[i])) / k for i in range(b)]
    )
    assert rec >= 0.99, f"sharded_topk recall {rec}"

    # --- dp x tp hybrid: tp stays inside one process ----------------------
    ctx2 = make_mesh(dp=2 * nprocs, tp=2)
    w = rng.standard_normal((64, 128), dtype=np.float32)
    x = rng.standard_normal((8, 64), dtype=np.float32)
    w_dev = ctx2.put(jnp.asarray(w), ctx2.cols_tp)
    x_dev = ctx2.put(jnp.asarray(x))

    def mm(xl, wl):
        return jnp.dot(xl, wl)  # [8, 128/tp] per shard, concat over tp

    f = shard_map(
        mm, mesh=ctx2.mesh, in_specs=(P(), P(None, TP_AXIS)),
        out_specs=P(None, TP_AXIS),
    )
    y = np.asarray(jax.device_get(f(x_dev, w_dev)))
    np.testing.assert_allclose(y, x @ w, rtol=1e-5, atol=1e-5)

    # --- cross-host psum ---------------------------------------------------
    ones = ctx.put(jnp.ones((4 * nprocs, 128)), ctx.rows_dp)
    tot = shard_map(
        lambda v: jax.lax.psum(jnp.sum(v), DP_AXIS),
        mesh=ctx.mesh, in_specs=(P(DP_AXIS),), out_specs=P(),
    )(ones)
    assert float(jax.device_get(tot)) == 4 * nprocs * 128

    print(f"[rank {rank}] DCN DRYRUN OK", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=-1)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=0)
    args = ap.parse_args()
    if args.rank >= 0:
        worker(args.rank, args.nprocs, args.port)
        return

    port = free_port()
    procs = []
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    for r in range(args.nprocs):
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--rank", str(r), "--nprocs", str(args.nprocs),
                 "--port", str(port)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    ok = True
    for r, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        text = out.decode(errors="replace")
        if p.returncode != 0 or "DCN DRYRUN OK" not in text:
            ok = False
            print(f"--- rank {r} FAILED (rc={p.returncode}) ---")
            print(text[-3000:])
    if not ok:
        sys.exit(1)
    print(f"DCN dryrun: {args.nprocs} processes x 4 fake devices — all OK")


if __name__ == "__main__":
    main()
