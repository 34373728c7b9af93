"""K-step dispatch-fusion experiment for the small-rung (latency-bound)
models — settles BASELINE.md's ACGAN/pix2pix latency story with one law.

Question (VERDICT r3 Weak #2): ACGAN's 3.43 ms step was reported alongside a
10-step *chained* measurement of 10.1 ms/step — per-step time tripling under
chaining, with no mechanism stated. Hypothesis: sub-10 ms steps through the
tunneled PJRT backend are dominated by host dispatch RTT, so chaining K
dispatches pays K round-trips, while fusing K steps into ONE dispatch
(``lax.scan`` over a ``[K, n_micro, B, ...]`` batch stack) pays one.

This tool measures, same-process same-day, for each model:
  (a) per-step time of K *chained* dispatches of the single-step program
  (b) per-step time of one *fused* program scanning K steps internally
for K in {1, 5, 10, 50}.  If (b) flattens to a constant while (a) does not,
the constant is the true device compute and (a)-(b) is the dispatch tax —
the law that replaces the contradictory sentences.

Math note: the fused program applies the SAME microbatch stack semantics as
the training loop (each scan iteration is exactly one make_train_step call);
only dispatch granularity changes, so per-step device work is identical.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_kstep.py
Prints one JSON line per (model, K, mode).
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


def build(model: str):
    from gan_lib_tensorflow_tpu.models import acgan, pix2pix
    from gan_lib_tensorflow_tpu.train import create_state, make_train_step

    dt = jnp.bfloat16
    if model == "acgan":
        g = acgan.ACGANGenerator(compute_dtype=dt)
        d = acgan.ACGANDiscriminator(compute_dtype=dt)
        spec = acgan.make_acgan_spec(g, d)
        opt = lambda: optax.adam(2e-4, b1=0.5, b2=0.999)
        g_optim, d_optim = opt(), opt()
        g_init = lambda r: g.init(r, jnp.zeros((2, g.z_dim)),
                                  jnp.zeros((2,), jnp.int32), train=False)
        d_init = lambda r: d.init(r, jnp.zeros((2, 32, 32, 3)), train=False)
        batch, size = 100, 32

        def make_batch(rng, k):
            return {
                "image": jnp.asarray(rng.standard_normal(
                    (k, spec.n_micro, batch, size, size, 3),
                    dtype=np.float32).clip(-1, 1)),
                "label": jnp.asarray(rng.integers(
                    0, 10, (k, spec.n_micro, batch)).astype(np.int32)),
            }
    elif model == "pix2pix":
        g = pix2pix.UNetGenerator(compute_dtype=dt)
        d = pix2pix.PatchGANDiscriminator(compute_dtype=dt)
        spec = pix2pix.make_pix2pix_spec(g, d)
        opt = lambda: optax.adam(2e-4, b1=0.5, b2=0.999)
        g_optim, d_optim = opt(), opt()
        g_init = lambda r: g.init(r, jnp.zeros((1, 256, 256, 3)), train=False)
        d_init = lambda r: d.init(r, jnp.zeros((1, 256, 256, 3)),
                                  jnp.zeros((1, 256, 256, 3)), train=False)
        batch, size = 4, 256

        def make_batch(rng, k):
            return {
                "input": jnp.asarray(rng.standard_normal(
                    (k, spec.n_micro, batch, size, size, 3),
                    dtype=np.float32).clip(-1, 1)),
                "target": jnp.asarray(rng.standard_normal(
                    (k, spec.n_micro, batch, size, size, 3),
                    dtype=np.float32).clip(-1, 1)),
            }
    else:
        raise ValueError(model)

    state = create_state(jax.random.PRNGKey(0), g_init, d_init,
                         g_optim, d_optim, ema_decay=spec.ema_decay)
    step = make_train_step(spec, g_optim, d_optim)
    return spec, state, step, make_batch, batch


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", nargs="+", default=["acgan", "pix2pix"],
                   choices=["acgan", "pix2pix"])
    p.add_argument("--ks", type=int, nargs="+", default=[1, 5, 10, 50])
    p.add_argument("--reps", type=int, default=200,
                   help="total steps measured per point (so K=50 runs "
                        "reps//50 fused dispatches)")
    args = p.parse_args()

    for model in args.model:
        spec, state0, step, make_batch, batch = build(model)
        rng = np.random.default_rng(0)

        # --- chained: K separate dispatches of the single-step program ---
        sjit = jax.jit(step, donate_argnums=0)
        one = jax.tree.map(lambda x: x[0], make_batch(rng, 1))
        state = jax.tree.map(jnp.copy, state0)
        for _ in range(3):
            state, m = sjit(state, one)
        float(m["d_loss"])
        for k in args.ks:
            reps = max(1, args.reps // k)
            t0 = time.perf_counter()
            for _ in range(reps):
                for _ in range(k):
                    state, m = sjit(state, one)
                float(m["d_loss"])  # sync once per K-chain (matches a loop
                # that reads metrics every K steps)
            dtym = (time.perf_counter() - t0) / (reps * k) * 1000.0
            print(json.dumps({"model": model, "mode": "chained", "k": k,
                              "ms_per_step": round(dtym, 3)}), flush=True)

        # --- fused: one dispatch scanning K steps over a [K, ...] stack ---
        def k_step(st, stack):
            def body(s, b):
                s, metrics = step(s, b)
                return s, metrics["d_loss"]
            st, dl = jax.lax.scan(body, st, stack)
            return st, dl[-1]

        for k in args.ks:
            kjit = jax.jit(k_step, donate_argnums=0)
            stack = jax.device_put(make_batch(rng, k))
            state = jax.tree.map(jnp.copy, state0)
            state, dl = kjit(state, stack)  # compile
            float(dl)
            reps = max(1, args.reps // k)
            t0 = time.perf_counter()
            for _ in range(reps):
                state, dl = kjit(state, stack)
                float(dl)  # one host sync per fused dispatch
            dtym = (time.perf_counter() - t0) / (reps * k) * 1000.0
            print(json.dumps({"model": model, "mode": "fused", "k": k,
                              "ms_per_step": round(dtym, 3)}), flush=True)


if __name__ == "__main__":
    main()
