"""Multi-host (DCN) plumbing: the 2-process CPU dryrun must pass in CI
(VERDICT round-1 item #5). jax.distributed cannot join a second process
group inside the already-initialized test process, so the dryrun runs as
subprocesses — the same boundary-mocking strategy as the reference's
fake-cluster tests (SURVEY.md section 4 item 6)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dcn_dryrun():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    # the parent harness spawns clean workers; strip the 8-device test flag
    env["XLA_FLAGS"] = ""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_dcn.py")],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "all OK" in out.stdout


def test_validate_mesh_for_hosts_rejects_straddling_tp():
    from rag_inference_pipeline_tpu.core.distributed import (
        validate_mesh_for_hosts,
    )

    # in-process: 8 fake local devices -> tp=16 exceeds local count
    with pytest.raises(ValueError, match="exceeds local device count"):
        validate_mesh_for_hosts(dp=1, tp=16)


def test_init_distributed_noop_single_process():
    from rag_inference_pipeline_tpu.core.config import Settings
    from rag_inference_pipeline_tpu.core.distributed import init_distributed

    assert init_distributed(Settings()) is False
