"""Regression tests for the driver entry points (``__graft_entry__.py``).

Round 1's only failing graded artifact (MULTICHIP_r01.json) was
``dryrun_multichip`` assuming the *caller* had pre-set the virtual-CPU-device
environment. These tests pin the fixed contract: the dryrun must pass when
invoked cold, in a fresh interpreter, with no JAX_PLATFORMS/XLA_FLAGS set —
exactly as the driver invokes it.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cold_env():
    """Environment as the driver sees it: no CPU forcing, no device-count flag."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_dryrun_multichip_cold():
    """dryrun_multichip(8) must self-bootstrap the 8-device CPU mesh."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as e; e.dryrun_multichip(8)"],
        env=_cold_env(), cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout
    assert "dryrun pggan-spatial ok" in proc.stdout, proc.stdout


def test_dryrun_runs_inline_when_devices_suffice():
    """Under the 8-virtual-device conftest, no subprocess is needed."""
    import jax
    assert jax.device_count() == 8
    import __graft_entry__ as e
    # n_devices=2 < available: runs inline on a slice of the devices.
    e.dryrun_multichip(2)
