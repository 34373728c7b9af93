"""FLOP-calibrate the non-CIFAR perf rungs: PGGAN 256/512/1024, ACGAN,
pix2pix 256^2, and ImageNet-128 (scan-corrected).

Extends docs/PERF.md's calibration discipline (VERDICT r2 Weak #2) to the
rungs that had step times but no roofline. Both PGGAN and ACGAN run n_critic=1
with NO lax.scan in the step, so XLA's ``cost_analysis()['flops']`` IS the
true per-step work (the scan-undercount that poisoned round 1 does not apply;
MAC=2 convention verified in docs/PERF.md). The GP double-backward is inline
in the PGGAN program and therefore counted.

Prints one JSON line per rung: measured ms, TF/step, roofline ms at the
nominal 197 TF/s and at the chip's measured matmul ceiling (173 TF/s),
and MFU against both.

Usage: python tools/calibrate_rungs.py --rungs pggan256 pggan512 pggan1024 acgan
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

NOMINAL_TFS = 197.0
ACHIEVED_TFS = 173.0   # measured 8192^3 bf16 matmul rate on this chip (PERF.md)


def build_pggan(resolution: int, batch: int, fused_from: int = 128,
                s2d_from: int = 0):
    from gan_lib_tensorflow_tpu import train
    from gan_lib_tensorflow_tpu.models import pggan

    g = pggan.PGGANGenerator(resolution=resolution, s2d_from=s2d_from,
                             compute_dtype=jnp.bfloat16)
    d = pggan.PGGANDiscriminator(resolution=resolution,
                                 fused_from=fused_from, s2d_from=s2d_from,
                                 compute_dtype=jnp.bfloat16)
    spec = pggan.make_pggan_spec(g, d)
    opt = lambda: optax.adam(1e-3, b1=0.0, b2=0.99)
    g_optim, d_optim = opt(), opt()
    state = train.create_state(
        jax.random.PRNGKey(0),
        lambda r: g.init(r, jnp.zeros((2, g.z_dim)), 1.0),
        lambda r: d.init(r, jnp.zeros((2, resolution, resolution, 3)), 1.0),
        g_optim, d_optim, ema_decay=0.999)
    step = train.make_train_step(spec, g_optim, d_optim)
    rng = np.random.default_rng(0)
    batch_data = {"image": jnp.asarray(rng.standard_normal(
        (spec.n_micro, batch, resolution, resolution, 3),
        dtype=np.float32).clip(-1, 1))}
    return step, state, batch_data


def build_pix2pix(batch: int = 4):
    from gan_lib_tensorflow_tpu import train
    from gan_lib_tensorflow_tpu.models import pix2pix

    g = pix2pix.UNetGenerator(compute_dtype=jnp.bfloat16)
    d = pix2pix.PatchGANDiscriminator(compute_dtype=jnp.bfloat16)
    spec = pix2pix.make_pix2pix_spec(g, d)
    opt = lambda: optax.adam(2e-4, b1=0.5)
    g_optim, d_optim = opt(), opt()
    zs = jnp.zeros((2, 256, 256, 3))
    state = train.create_state(
        jax.random.PRNGKey(0),
        lambda r: g.init({"params": r, "dropout": r}, zs, train=False),
        lambda r: d.init(r, zs, zs, train=False),
        g_optim, d_optim)
    step = train.make_train_step(spec, g_optim, d_optim)
    rng = np.random.default_rng(0)
    batch_data = {
        "input": jnp.asarray(rng.standard_normal(
            (1, batch, 256, 256, 3), dtype=np.float32).clip(-1, 1)),
        "target": jnp.asarray(rng.standard_normal(
            (1, batch, 256, 256, 3), dtype=np.float32).clip(-1, 1))}
    return step, state, batch_data


def build_imagenet(batch: int = 64):
    """SNGAN-projection 128^2. NOTE: n_critic=5 via lax.scan — cost_analysis
    counts the scan body ONCE, so tf_per_step is corrected by hand here
    (prepare + 5x critic + G update decomposition, docs/PERF.md)."""
    from gan_lib_tensorflow_tpu import train
    from gan_lib_tensorflow_tpu.models import sngan

    g = sngan.imagenet128_generator(compute_dtype=jnp.bfloat16)
    d = sngan.imagenet128_discriminator(compute_dtype=jnp.bfloat16)
    spec = sngan.make_sngan_spec(g, d, n_critic=5, ema_decay=0.9999)
    g_optim = optax.adam(1e-4, b1=0.0, b2=0.9)
    d_optim = optax.adam(4e-4, b1=0.0, b2=0.9)
    state = train.create_state(
        jax.random.PRNGKey(0),
        lambda r: g.init(r, jnp.zeros((2, g.z_dim)),
                         jnp.zeros((2,), jnp.int32), train=False),
        lambda r: d.init(r, jnp.zeros((2, 128, 128, 3)),
                         jnp.zeros((2,), jnp.int32)),
        g_optim, d_optim, ema_decay=spec.ema_decay)
    step = train.make_train_step(spec, g_optim, d_optim)
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(rng.standard_normal(
            (spec.n_micro, batch, 128, 128, 3),
            dtype=np.float32).clip(-1, 1)),
        "label": jnp.asarray(rng.integers(
            0, 1000, (spec.n_micro, batch)).astype(np.int32))}
    return step, state, batch_data


def build_acgan(batch: int = 100):
    from gan_lib_tensorflow_tpu import train
    from gan_lib_tensorflow_tpu.models import acgan

    g = acgan.ACGANGenerator(compute_dtype=jnp.bfloat16)
    d = acgan.ACGANDiscriminator(compute_dtype=jnp.bfloat16)
    spec = acgan.make_acgan_spec(g, d)
    opt = lambda: optax.adam(2e-4, b1=0.5)
    g_optim, d_optim = opt(), opt()
    state = train.create_state(
        jax.random.PRNGKey(0),
        lambda r: g.init(r, jnp.zeros((2, g.z_dim)),
                         jnp.zeros((2,), jnp.int32), train=False),
        lambda r: d.init(r, jnp.zeros((2, 32, 32, 3)), train=False),
        g_optim, d_optim)
    step = train.make_train_step(spec, g_optim, d_optim)
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(rng.standard_normal(
            (1, batch, 32, 32, 3), dtype=np.float32).clip(-1, 1)),
        "label": jnp.asarray(rng.integers(0, 10, (1, batch)), jnp.int32)}
    return step, state, batch_data


def calibrate(name: str, step_fn, state, batch_data, batch: int,
              timed_steps: int, tf_override: float = 0.0) -> dict:
    jitted = jax.jit(step_fn, donate_argnums=0)
    lowered = jitted.lower(state, batch_data)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    tf_per_step = tf_override or float(cost["flops"]) / 1e12

    for _ in range(2):
        state, metrics = jitted(state, batch_data)
    float(metrics["d_loss"])  # hard sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    for _ in range(timed_steps):
        state, metrics = jitted(state, batch_data)
    float(metrics["d_loss"])
    ms = (time.perf_counter() - t0) / timed_steps * 1000.0

    roof_nom = tf_per_step / NOMINAL_TFS * 1000.0
    roof_ach = tf_per_step / ACHIEVED_TFS * 1000.0
    return {"rung": name, "batch": batch,
            "ms_per_step": round(ms, 2),
            "img_per_sec": round(batch / (ms / 1000.0), 1),
            "tf_per_step": round(tf_per_step, 3),
            "roofline_ms_nominal": round(roof_nom, 2),
            "roofline_ms_achieved": round(roof_ach, 2),
            "mfu_nominal": round(roof_nom / ms, 3),
            "frac_of_achieved": round(roof_ach / ms, 3)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rungs", nargs="+",
                   default=["acgan", "pggan256", "pggan512", "pggan1024"],
                   help="also available: pix2pix (256^2 batch 4), imagenet "
                        "(SNGAN-projection 128^2 batch 64, scan-corrected "
                        "FLOPs)")
    p.add_argument("--timed-steps", type=int, default=10)
    p.add_argument("--s2d-from", type=int, default=0,
                   help="space-to-depth levels >= this resolution (note: "
                   "cost_analysis then reports the INFLATED s2d FLOPs; "
                   "compare measured ms against the composed-path roofline)")
    p.add_argument("--pggan-batch", type=int, default=0,
                   help="override the per-resolution batch schedule")
    p.add_argument("--pix2pix-batch", type=int, default=4,
                   help="pix2pix rung batch size (reference trains at 1; "
                        "the CLI default is 4; sweep for throughput mode)")
    args = p.parse_args()

    # reference batch schedule at high res (Karras: 16 -> ... -> 4 at 1024)
    pg_batches = {256: 8, 512: 8, 1024: 4}
    for rung in args.rungs:
        try:
            if rung == "acgan":
                step, state, bd = build_acgan()
                row = calibrate(rung, step, state, bd, 100, args.timed_steps)
            elif rung == "pix2pix":
                b = args.pix2pix_batch
                step, state, bd = build_pix2pix(b)
                row = calibrate(rung, step, state, bd, b, args.timed_steps)
            elif rung == "imagenet":
                # scan-corrected hand count (docs/PERF.md): 18.2 TF/step
                step, state, bd = build_imagenet()
                row = calibrate(rung, step, state, bd, 64, args.timed_steps,
                                tf_override=18.2)
            elif rung.startswith("pggan"):
                res = int(rung[len("pggan"):])
                b = args.pggan_batch or pg_batches.get(res, 8)
                step, state, bd = build_pggan(res, b, s2d_from=args.s2d_from)
                row = calibrate(rung, step, state, bd, b, args.timed_steps)
            else:
                row = {"rung": rung, "error": "unknown rung"}
        except Exception as e:
            row = {"rung": rung, "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
