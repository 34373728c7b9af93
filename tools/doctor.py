"""Environment doctor: diagnose the accelerator/tunnel/toolchain state.

The TPU here is reached through a tunneled PJRT plugin that can wedge or go
down for hours (docs/PERF.md, .claude/skills/verify/SKILL.md); a bare
``jax.devices()`` then blocks forever in C land. This tool probes everything
with hard timeouts from subprocesses, so it always returns, and prints one
JSON report:

  python tools/doctor.py            # full report
  python tools/doctor.py --quick    # skip the device-compute probe

Checks: package versions, non-CPU platform registration, device enumeration
(timeout-bounded), a tiny device matmul round-trip (the "is the tunnel
actually serving compute" check), virtual-CPU-mesh creation, and the native
library.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sub(code: str, timeout: float, env_extra=None) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra or {})
    t0 = time.perf_counter()
    try:
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=timeout)
        out = proc.stdout.strip().splitlines()
        return {"ok": proc.returncode == 0,
                "seconds": round(time.perf_counter() - t0, 2),
                "result": out[-1] if out else "",
                "error": proc.stderr.strip().splitlines()[-1]
                if proc.returncode and proc.stderr.strip() else None}
    except subprocess.TimeoutExpired:
        return {"ok": False, "seconds": round(time.perf_counter() - t0, 2),
                "result": None, "error": f"timeout after {timeout:.0f}s "
                "(backend unreachable / tunnel outage?)"}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--quick", action="store_true",
                   help="skip the device-compute probe")
    p.add_argument("--probe-timeout", type=float, default=90.0)
    args = p.parse_args(argv)

    report = {}

    def versions():
        out = {}
        for mod in ("jax", "flax", "optax", "orbax.checkpoint", "numpy"):
            try:
                m = __import__(mod)
                for part in mod.split(".")[1:]:
                    m = getattr(m, part)
                out[mod] = getattr(m, "__version__", "?")
            except Exception as e:  # pragma: no cover
                out[mod] = f"unimportable: {e}"
        return out

    report["versions"] = versions()

    import jax  # config only — reading it initializes no backend

    plats = str(jax.config.jax_platforms or "")
    report["registered_platforms"] = plats or "(default)"
    non_cpu = [s for s in plats.split(",") if s.strip() and s.strip() != "cpu"]

    report["device_enumeration"] = _sub(
        "import jax; d = jax.devices(); "
        "print(f'{len(d)} x {d[0].platform}:{d[0].device_kind}')",
        args.probe_timeout)

    if not args.quick:
        report["device_compute"] = _sub(
            "import jax, jax.numpy as jnp, numpy as np;"
            "x = jnp.ones((256, 256));"
            "y = np.asarray(jax.jit(lambda a: a @ a)(x));"
            "print('matmul ok', float(y[0, 0]))",
            args.probe_timeout)

    report["virtual_cpu_mesh"] = _sub(
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from gan_lib_tensorflow_tpu.parallel import create_mesh;"
        "m = create_mesh(); print(dict(m.shape))",
        120, {"JAX_PLATFORMS": "cpu",
              "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})

    so = os.path.join(REPO, "native", "libganpipe.so")
    report["native_lib"] = {"ok": os.path.exists(so), "path": so}

    # north-star asset status (BASELINE.json:5): is the graded FID <= 25
    # verdict runnable on this machine, and if so, with what one-liner?
    sys.path.insert(0, REPO)
    from gan_lib_tensorflow_tpu.cli import north_star
    cifar_dir = north_star.find_cifar(os.environ.get("CIFAR_DIR"))
    weight_candidates = [
        w for w in (os.environ.get("INCEPTION_WEIGHTS"),
                    "data/inception_v3.npz", "data/inception_v3.h5",
                    os.path.expanduser("~/data/inception_v3.npz"))
        if w and os.path.exists(w)]
    report["north_star_assets"] = {
        "cifar10": cifar_dir or "MISSING (cifar-10-batches-py not found)",
        "inception_weights": weight_candidates[0] if weight_candidates
        else "MISSING (set INCEPTION_WEIGHTS or drop data/inception_v3.npz)",
    }
    if cifar_dir and weight_candidates:
        report["north_star_assets"]["graded_command"] = (
            f"python -m gan_lib_tensorflow_tpu.cli.north_star "
            f"--data-dir {cifar_dir} "
            f"--inception-weights {weight_candidates[0]}")
    else:
        report["north_star_assets"]["graded_command"] = (
            "BLOCKED until the assets above exist; "
            "`--smoke` wiring check is always available")

    healthy = (report["device_enumeration"]["ok"]
               and (args.quick or report["device_compute"]["ok"]))
    report["verdict"] = (
        "accelerator healthy" if healthy else
        ("accelerator unreachable — tunnel outage likely; CPU-side work and "
         "the virtual-mesh dryrun remain available" if non_cpu else
         "no accelerator registered — CPU-only environment"))
    print(json.dumps(report, indent=2))
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
