"""Per-model fused-train-step timer — fills BASELINE.md's measured table for
every reference model family at its reference config (SURVEY.md §2.4):

  sngan      CIFAR-10 32^2, batch 64, n_critic 5, hinge
  acgan      CIFAR-10 32^2, batch 100, n_critic 1, BCE + aux CE
  imagenet   SNGAN-projection 128^2 conditional, batch 64, n_critic 5, TTUR

Usage: python tools/bench_step.py --model acgan imagenet [--batch N]
Prints one JSON line per model. Same sync discipline as bench.py: N chained
donated steps, one end-of-chain host transfer.
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


def build(model: str, batch: int | None):
    from gan_lib_tensorflow_tpu import train
    from gan_lib_tensorflow_tpu.models import acgan, sngan

    dt = jnp.bfloat16
    if model == "sngan":
        g = sngan.cifar_generator(compute_dtype=dt)
        d = sngan.cifar_discriminator(compute_dtype=dt)
        spec = sngan.make_sngan_spec(g, d, n_critic=5, ema_decay=0.9999)
        opt = lambda: optax.adam(2e-4, b1=0.0, b2=0.9)
        g_optim, d_optim = opt(), opt()
        g_init = lambda r: g.init(r, jnp.zeros((2, g.z_dim)), train=False)
        d_init = lambda r: d.init(r, jnp.zeros((2, 32, 32, 3)))
        size, n_cls, batch = 32, 10, batch or 64
    elif model == "acgan":
        g = acgan.ACGANGenerator(compute_dtype=dt)
        d = acgan.ACGANDiscriminator(compute_dtype=dt)
        spec = acgan.make_acgan_spec(g, d)
        opt = lambda: optax.adam(2e-4, b1=0.5, b2=0.999)
        g_optim, d_optim = opt(), opt()
        g_init = lambda r: g.init(r, jnp.zeros((2, g.z_dim)),
                                  jnp.zeros((2,), jnp.int32), train=False)
        d_init = lambda r: d.init(r, jnp.zeros((2, 32, 32, 3)), train=False)
        size, n_cls, batch = 32, 10, batch or 100
    elif model == "imagenet":
        g = sngan.imagenet128_generator(compute_dtype=dt)
        d = sngan.imagenet128_discriminator(compute_dtype=dt)
        spec = sngan.make_sngan_spec(g, d, n_critic=5, ema_decay=0.9999)
        g_optim = optax.adam(1e-4, b1=0.0, b2=0.9)
        d_optim = optax.adam(4e-4, b1=0.0, b2=0.9)
        g_init = lambda r: g.init(r, jnp.zeros((2, g.z_dim)),
                                  jnp.zeros((2,), jnp.int32), train=False)
        d_init = lambda r: d.init(r, jnp.zeros((2, 128, 128, 3)),
                                  jnp.zeros((2,), jnp.int32))
        size, n_cls, batch = 128, 1000, batch or 64
    else:
        raise ValueError(model)

    from gan_lib_tensorflow_tpu.train import create_state, make_train_step
    state = create_state(jax.random.PRNGKey(0), g_init, d_init,
                         g_optim, d_optim, ema_decay=spec.ema_decay)
    step = jax.jit(make_train_step(spec, g_optim, d_optim), donate_argnums=0)
    rng = np.random.default_rng(0)
    data = {
        "image": jnp.asarray(rng.standard_normal(
            (spec.n_micro, batch, size, size, 3), dtype=np.float32).clip(-1, 1)),
        "label": jnp.asarray(rng.integers(
            0, n_cls, (spec.n_micro, batch)).astype(np.int32)),
    }
    return spec, state, step, data, batch


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", nargs="+",
                   default=["sngan", "acgan", "imagenet"],
                   choices=["sngan", "acgan", "imagenet"])
    p.add_argument("--batch", type=int, default=None,
                   help="override the reference batch size")
    p.add_argument("--timed-steps", type=int, default=50)
    args = p.parse_args()

    for model in args.model:
        spec, state, step, data, batch = build(model, args.batch)
        for _ in range(3):
            state, metrics = step(state, data)
        float(metrics["d_loss"])  # hard sync
        t0 = time.perf_counter()
        for _ in range(args.timed_steps):
            state, metrics = step(state, data)
        float(metrics["d_loss"])  # end-of-chain sync
        dt = time.perf_counter() - t0
        ms = dt / args.timed_steps * 1000.0
        imgs = spec.n_critic * batch
        print(json.dumps({
            "model": model, "batch": batch, "n_critic": spec.n_critic,
            "ms_per_step": round(ms, 2),
            "img_per_sec": round(imgs / (ms / 1000.0), 1)}), flush=True)


if __name__ == "__main__":
    main()
