#!/usr/bin/env python
"""Experiment driver (reference scripts/run_experiment.py:427-486): load a
manifest, kill stale pipeline processes, free ports, spawn nodes with
per-node env, wait for health, run the workload, capture metrics + RSS,
tear down, leave artifacts under artifacts/experiments/<name>_<ts>/.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time
import urllib.request

import yaml

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def kill_existing(base_port: int, n_nodes: int) -> None:
    """Stale-process kill + port reclamation (reference :95-135)."""
    try:
        import psutil
    except ImportError:
        return
    for proc in psutil.process_iter(["pid", "cmdline"]):
        try:
            cmd = " ".join(proc.info["cmdline"] or [])
            if "rag_inference_pipeline_tpu.serve.runtime" in cmd:
                proc.terminate()
        except (psutil.NoSuchProcess, psutil.AccessDenied):
            continue
    time.sleep(1.0)


def wait_health(url: str, timeout_s: float = 300.0) -> bool:
    """GET /health loop (reference :398-424)."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            with urllib.request.urlopen(f"{url}/health", timeout=3) as resp:
                if resp.status == 200:
                    return True
        except Exception:  # noqa: BLE001
            pass
        time.sleep(2.0)
    return False


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("manifest")
    p.add_argument("--base-port", type=int, default=8300)
    p.add_argument("--artifacts", default="artifacts/experiments")
    p.add_argument("--health-timeout", type=float, default=None,
                   help="seconds to wait for /health per node (overrides "
                        "the manifest's health_timeout; default 300)")
    args = p.parse_args()

    with open(args.manifest) as fh:
        manifest = yaml.safe_load(fh)
    if args.health_timeout is None:
        # big-corpus manifests set their own window: the 4.5M boot is
        # upload + warmup bound (~25 min through the tunneled chip)
        args.health_timeout = float(manifest.get("health_timeout", 300.0))
    name = manifest.get("name", "experiment")
    ts = time.strftime("%Y%m%d_%H%M%S")
    out_dir = os.path.join(args.artifacts, f"{name}_{ts}")
    os.makedirs(out_dir, exist_ok=True)
    shutil.copy(args.manifest, os.path.join(out_dir, "manifest.yaml"))

    nodes = manifest.get("nodes", {})
    n_nodes = len(nodes)
    env_over = {str(k): str(v) for k, v in (manifest.get("env") or {}).items()}
    kill_existing(args.base_port, n_nodes)

    procs: list[subprocess.Popen] = []
    try:
        for node_str, spec in nodes.items():
            node = int(node_str)
            env = dict(os.environ)
            env.update(env_over)
            env.update(
                {
                    "NODE_NUMBER": str(node),
                    "TOTAL_NODES": env_over.get("TOTAL_NODES", str(max(n_nodes, 1))),
                    "BASE_PORT": str(args.base_port),
                    "PIPELINE_ROLE_PROFILE": spec["profile"],
                    "RUN_ID": f"{name}_{ts}",
                }
            )
            env.update({str(k): str(v) for k, v in (spec.get("env") or {}).items()})
            log = open(os.path.join(out_dir, f"node{node}.log"), "w")
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-m", "rag_inference_pipeline_tpu.serve.runtime"],
                    env=env,
                    cwd=REPO,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                    start_new_session=True,
                )
            )
            time.sleep(2.0)  # stagger (reference :209-242)

        gateway = f"http://127.0.0.1:{args.base_port}"
        for node_str in nodes:
            url = f"http://127.0.0.1:{args.base_port + int(node_str)}"
            if not wait_health(url, args.health_timeout):
                raise RuntimeError(f"node {node_str} never became healthy ({url})")
        print("all nodes healthy")

        # `workloads:` (list) sweeps several request/concurrency points
        # against ONE boot — summary.csv appends a row per point (the
        # reference's tier CSVs are exactly this shape, conc up to 128);
        # `workload:` (single) keeps the original behavior.
        workloads = manifest.get("workloads") or [manifest.get("workload", {})]
        for i, workload in enumerate(workloads):
            wl_cmd = [
                sys.executable,
                os.path.join(REPO, "scripts", "profile_pipeline.py"),
                "--url", gateway,
                "--requests", str(workload.get("requests", 50)),
                "--concurrency", str(workload.get("concurrency", 4)),
                "--randomize-queries",
                "--out-dir", out_dir,
                "--run-id", f"{ts}_c{workload.get('concurrency', 4)}"
                if len(workloads) > 1 else ts,
            ]
            subprocess.run(wl_cmd, check=True)

        # metrics + per-process RSS snapshot (reference :455-467)
        cap = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "capture_metrics.py"),
                "--nodes",
                ",".join(
                    f"http://127.0.0.1:{args.base_port + int(k)}" for k in nodes
                ),
                "--out", os.path.join(out_dir, "metrics.csv"),
            ],
            check=False,
        )
        try:
            import psutil

            stats = {}
            for proc in procs:
                try:
                    pp = psutil.Process(proc.pid)
                    stats[proc.pid] = {"rss_mb": pp.memory_info().rss / 1e6}
                except psutil.NoSuchProcess:
                    pass
            with open(os.path.join(out_dir, "process_stats.json"), "w") as fh:
                json.dump(stats, fh, indent=2)
        except ImportError:
            pass
        print(f"artifacts: {out_dir}")
    finally:
        for proc in procs:
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
            except (ProcessLookupError, PermissionError):
                pass
        deadline = time.monotonic() + 15
        for proc in procs:
            try:
                proc.wait(timeout=max(0.1, deadline - time.monotonic()))
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass


if __name__ == "__main__":
    main()
