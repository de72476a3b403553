"""The driver imports __graft_entry__ and calls dryrun_multichip(n)
directly, possibly after its own process already initialized a 1-device
JAX backend (MULTICHIP_r01 failure mode). These tests pin that the
function self-provisions its n-device CPU mesh in both situations."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_overrides: dict) -> subprocess.CompletedProcess:
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_dryrun_fresh_process():
    """No env prep at all: the function must force its own CPU mesh."""
    proc = _run(
        "import __graft_entry__ as g; g.dryrun_multichip(8)",
        {"JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip OK" in proc.stdout


def test_dryrun_after_backend_already_initialized():
    """Driver failure mode: the calling process initialized a 1-device
    backend before calling dryrun_multichip → subprocess fallback."""
    code = (
        "import jax; "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8); "
        "print('fallback ok')"
    )
    proc = _run(code, {"JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr
    assert "fallback ok" in proc.stdout
