"""PGGAN high-resolution step benchmark: the reproducible script behind the
BASELINE.md ladder rows (reference top rung: 1024x1024 full width, WGAN-GP,
batch 4 — SURVEY.md §3.3 / BASELINE.json:11).

Sweeps the two perf knobs that matter at 512/1024:
  * ``remat_from``  — per-level block rematerialization threshold
  * ``fused_from``  — fused conv+downscale D blocks (Karras fused_scale)

Usage:
  python tools/bench_pggan.py --resolution 1024 --batch 4 \
      --remat-from 0 512 1024 --fused-from 0 128

Prints one JSON line per config: {"resolution", "batch", "remat_from",
"fused_from", "ms_per_step", "img_per_sec"} — or "error" if the config fails
to compile/fit. Timing uses N chained donated steps with ONE end-of-chain
host transfer (block_until_ready returns early on the tunneled axon backend).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def time_config(resolution: int, batch: int, remat_from: int, fused_from: int,
                timed_steps: int, width_mul: float = 1.0,
                s2d_from: int = 0) -> dict:
    from gan_lib_tensorflow_tpu import train
    from gan_lib_tensorflow_tpu.models import pggan

    g = pggan.PGGANGenerator(resolution=resolution, width_mul=width_mul,
                             remat_from=remat_from, s2d_from=s2d_from,
                             compute_dtype=jnp.bfloat16)
    d = pggan.PGGANDiscriminator(resolution=resolution, width_mul=width_mul,
                                 remat_from=remat_from, fused_from=fused_from,
                                 s2d_from=s2d_from,
                                 compute_dtype=jnp.bfloat16)
    spec = pggan.make_pggan_spec(g, d)
    g_optim = optax.adam(1e-3, b1=0.0, b2=0.99)
    d_optim = optax.adam(1e-3, b1=0.0, b2=0.99)
    state = train.create_state(
        jax.random.PRNGKey(0),
        lambda r: g.init(r, jnp.zeros((2, g.z_dim)), 1.0),
        lambda r: d.init(r, jnp.zeros((2, resolution, resolution, 3)), 1.0),
        g_optim, d_optim, ema_decay=0.999)
    step = jax.jit(train.make_train_step(spec, g_optim, d_optim),
                   donate_argnums=0)

    rng = np.random.default_rng(0)
    batch_data = {"image": jnp.asarray(rng.standard_normal(
        (spec.n_micro, batch, resolution, resolution, 3),
        dtype=np.float32).clip(-1, 1))}

    for _ in range(2):  # compile + settle
        state, metrics = step(state, batch_data)
    float(metrics["d_loss"])  # hard sync
    t0 = time.perf_counter()
    for _ in range(timed_steps):
        state, metrics = step(state, batch_data)
    float(metrics["d_loss"])  # end-of-chain sync
    dt = time.perf_counter() - t0
    ms = dt / timed_steps * 1000.0
    return {"ms_per_step": round(ms, 1),
            "img_per_sec": round(batch / (ms / 1000.0), 2)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--width-mul", type=float, default=1.0)
    p.add_argument("--remat-from", type=int, nargs="+", default=[0, 512, 1024])
    p.add_argument("--fused-from", type=int, nargs="+", default=[0, 128])
    p.add_argument("--s2d-from", type=int, nargs="+", default=[0])
    p.add_argument("--timed-steps", type=int, default=10)
    args = p.parse_args()

    for rf in args.remat_from:
      for ff in args.fused_from:
        for sf in args.s2d_from:
            row = {"resolution": args.resolution, "batch": args.batch,
                   "remat_from": rf, "fused_from": ff, "s2d_from": sf}
            try:
                row.update(time_config(args.resolution, args.batch, rf, ff,
                                       args.timed_steps, args.width_mul,
                                       s2d_from=sf))
            except Exception as e:  # OOM / compile failure is a data point
                row["error"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
