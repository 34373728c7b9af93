"""Decompose the PGGAN high-res step: where do the ms go?

Times, in isolation: G fwd, D fwd, g_loss grad, the GP term's grad alone,
and the full d_loss grad (incl. GP double-backward). Compare
``--s2d-from 0`` vs ``--s2d-from <res>`` (the ladder's top-level rewrite).

Timing discipline (same as tools/bench_pggan.py): warmup compile, then N
sequential dispatches and ONE scalar materialization — on the tunneled axon
backend a full-array ``np.asarray`` costs hundreds of ms of transfer and
``block_until_ready`` returns early, so the only honest fence is fetching a
device-side reduction of the last output.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _fence(o):
    """Materialize via a scalar: device-side reduce, 4-byte transfer."""
    leaf = jax.tree_util.tree_leaves(o)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(f, *args, reps: int = 10) -> float:
    _fence(f(*args))                      # compile + settle
    _fence(f(*args))
    t0 = time.perf_counter()
    o = None
    for _ in range(reps):
        o = f(*args)
    _fence(o)
    return round((time.perf_counter() - t0) / reps * 1000, 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--s2d-from", type=int, default=0)
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args()

    from gan_lib_tensorflow_tpu.losses import gradient_penalty, wgan_d_loss
    from gan_lib_tensorflow_tpu.models import pggan

    res, B = args.res, args.batch
    g = pggan.PGGANGenerator(resolution=res, s2d_from=args.s2d_from,
                             compute_dtype=jnp.bfloat16)
    d = pggan.PGGANDiscriminator(resolution=res, fused_from=128,
                                 s2d_from=args.s2d_from,
                                 compute_dtype=jnp.bfloat16)
    k = jax.random.PRNGKey(0)
    gp_ = g.init(k, jnp.zeros((2, g.z_dim)), 1.0)
    dp_ = d.init(k, jnp.zeros((2, res, res, 3)), 1.0)
    z = jax.random.normal(k, (B, g.z_dim))
    x = jax.random.normal(k, (B, res, res, 3), jnp.float32)

    g_fwd = jax.jit(lambda p, z: g.apply(p, z, 1.0))
    d_fwd = jax.jit(lambda p, x: d.apply(p, x, 1.0))

    def dloss(dp, x, fake, rng):
        rl = d.apply(dp, x, 1.0)
        fl = d.apply(dp, fake, 1.0)
        critic = lambda y: d.apply(dp, y, 1.0)
        gpv = gradient_penalty(critic, x, fake, rng)
        return wgan_d_loss(rl, fl) + 10.0 * gpv + 1e-3 * (rl ** 2).mean()

    def gponly(dp, x, fake, rng):
        critic = lambda y: d.apply(dp, y, 1.0)
        return gradient_penalty(critic, x, fake, rng)

    def gloss(gp, dp, z):
        fake = g.apply(gp, z, 1.0)
        return -d.apply(dp, fake, 1.0).mean()

    fake = jax.block_until_ready(g_fwd(gp_, z))
    d_grad = jax.jit(jax.grad(dloss))
    gp_grad = jax.jit(jax.grad(gponly))
    g_grad = jax.jit(jax.grad(gloss))
    rng = jax.random.PRNGKey(1)

    out = {
        "s2d_from": args.s2d_from, "res": res, "batch": B,
        "g_fwd_ms": timeit(g_fwd, gp_, z, reps=args.reps),
        "d_fwd_ms": timeit(d_fwd, dp_, x, reps=args.reps),
        "g_grad_ms": timeit(g_grad, gp_, dp_, z, reps=args.reps),
        "gp_grad_ms": timeit(gp_grad, dp_, x, fake, rng, reps=args.reps),
        "d_grad_full_ms": timeit(d_grad, dp_, x, fake, rng, reps=args.reps),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
