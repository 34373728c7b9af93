"""Measure IS/FID eval wall-clock: on-device accumulation vs the round-2
host-numpy moment path (VERDICT r2 item #1 "measured before/after for a
50k-sample eval").

Both modes run the same jitted generator+InceptionV3 forward; they differ only
in where the statistics accumulate:
  host   — round-2 behavior: device_get every 2048-d feature batch, s2 += f.T@f
           in host numpy (~420 GFLOP of single-core host work at 50k samples).
  device — round-3 behavior: one jitted donated update per batch; features
           never leave HBM; one accumulator transfer at finalize.

Usage: python tools/bench_eval.py --n-samples 50000 [--mode both]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def run(mode: str, n_samples: int, batch_size: int) -> dict:
    from gan_lib_tensorflow_tpu.eval.inception_v3 import InceptionV3Features
    from gan_lib_tensorflow_tpu.eval.metrics import (
        DeviceEvalAccumulator, MomentAccumulator, inception_score_from_probs)
    from gan_lib_tensorflow_tpu.models import sngan
    from gan_lib_tensorflow_tpu.train import create_state
    import optax

    g = sngan.cifar_generator()
    d = sngan.cifar_discriminator()
    state = create_state(
        jax.random.PRNGKey(0),
        lambda r: g.init(r, np.zeros((2, g.z_dim), np.float32), train=False),
        lambda r: d.init(r, np.zeros((2, 32, 32, 3), np.float32)),
        optax.adam(2e-4), optax.adam(2e-4), ema_decay=0.9999)
    sampler = sngan.make_sampler(g)
    net = InceptionV3Features()

    n_batches = n_samples // batch_size
    splits = 10
    is_n = (n_batches * batch_size // splits) * splits
    rng = jax.random.PRNGKey(1)

    if mode == "device":
        acc = DeviceEvalAccumulator(
            net, net.feature_dim, sample_fn=lambda r: sampler(state, r, batch_size),
            splits=splits, split_size=is_n // splits)
        rng, sub = jax.random.split(rng)
        acc.add_samples(sub, batch_size)  # warmup/compile
        jax.block_until_ready(acc._acc["s2"])
        t0 = time.perf_counter()
        for _ in range(n_batches):
            rng, sub = jax.random.split(rng)
            acc.add_samples(sub, batch_size)
        mu, cov = acc.moments()
        is_mean, _ = acc.inception_score()
        dt = time.perf_counter() - t0
    else:  # host — the round-2 path, reconstructed
        acc = MomentAccumulator(net.feature_dim)
        probs = []
        rng, sub = jax.random.split(rng)
        jax.block_until_ready(net(sampler(state, sub, batch_size))[0])  # warmup
        t0 = time.perf_counter()
        for _ in range(n_batches):
            rng, sub = jax.random.split(rng)
            feats, logits = net(sampler(state, sub, batch_size))
            acc.update(jax.device_get(feats))
            probs.append(jax.device_get(jax.nn.softmax(logits, -1)))
        mu, cov = acc.finalize()
        is_mean, _ = inception_score_from_probs(np.concatenate(probs), splits)
        dt = time.perf_counter() - t0

    return {"mode": mode, "n_samples": n_batches * batch_size,
            "wall_s": round(dt, 2),
            "samples_per_s": round(n_batches * batch_size / dt, 1),
            "is": round(float(is_mean), 4),
            "trace_cov": round(float(np.trace(cov)), 4)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-samples", type=int, default=50_000)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--mode", default="both", choices=["both", "device", "host"])
    args = p.parse_args()
    modes = ["device", "host"] if args.mode == "both" else [args.mode]
    for m in modes:
        print(json.dumps(run(m, args.n_samples, args.batch_size)), flush=True)


if __name__ == "__main__":
    main()
