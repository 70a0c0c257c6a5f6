"""Multi-host SERVING over DCN: the 2-process HTTP+SPMD dryrun must pass
in CI (round-2 VERDICT coverage gap: DCN plumbing existed but no serving
path exercised it). Process 0 runs the aiohttp front door with the index
wrapped in SPMDIndexProxy; process 1 runs serve.runtime's worker loop;
a /retrieve request drives a dp=8 cross-process sharded int8 search
(serve/spmd.py, scripts/dryrun_dcn_serving.py)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dcn_serving_dryrun():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    # the parent spawns clean workers; strip the 8-device test flag
    env["XLA_FLAGS"] = ""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "dryrun_dcn_serving.py"),
        ],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert '"dcn_serving_dryrun": "ok"' in out.stdout


def test_front_door_failure_releases_workers():
    """Crash drill: the front door fails to bind its HTTP port; workers
    must exit via the OP_STOP failure broadcast in serve/runtime.py, not
    hang in their collective loop until the CI timeout."""
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["XLA_FLAGS"] = ""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "dryrun_dcn_serving.py"),
            "--mode", "fail",
        ],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert '"dcn_serving_dryrun": "fail-drill-ok"' in out.stdout


def test_spmd_noops_single_process():
    from rag_inference_pipeline_tpu.serve.spmd import (
        is_front_door,
        is_spmd,
    )

    assert not is_spmd()
    assert is_front_door()
