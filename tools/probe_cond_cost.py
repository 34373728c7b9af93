"""Bound the conditional machinery's cost in the ImageNet-128 step.

Times the full fused step (batch 64, n_critic 5, TTUR) in two builds:
  cond    — reference SNGAN-projection: cond-BN in G + projection D (1000 cls)
  uncond  — num_classes=0 both: plain BN, no projection term
The delta bounds everything conditional: 10 cond-BN gamma/beta gathers +
per-sample scale/bias in G, the projection embedding + dot in D.
"""
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(n_cls: int):
    from gan_lib_tensorflow_tpu import train
    from gan_lib_tensorflow_tpu.models import sngan

    dt = jnp.bfloat16
    g = sngan.imagenet128_generator(compute_dtype=dt, num_classes=n_cls)
    d = sngan.imagenet128_discriminator(compute_dtype=dt, num_classes=n_cls)
    spec = sngan.make_sngan_spec(g, d, n_critic=5, ema_decay=0.9999)
    g_optim = optax.adam(1e-4, b1=0.0, b2=0.9)
    d_optim = optax.adam(4e-4, b1=0.0, b2=0.9)
    if n_cls:
        g_init = lambda r: g.init(r, jnp.zeros((2, g.z_dim)),
                                  jnp.zeros((2,), jnp.int32), train=False)
        d_init = lambda r: d.init(r, jnp.zeros((2, 128, 128, 3)),
                                  jnp.zeros((2,), jnp.int32))
    else:
        g_init = lambda r: g.init(r, jnp.zeros((2, g.z_dim)), train=False)
        d_init = lambda r: d.init(r, jnp.zeros((2, 128, 128, 3)))
    state = train.create_state(jax.random.PRNGKey(0), g_init, d_init,
                               g_optim, d_optim, ema_decay=spec.ema_decay)
    step = jax.jit(train.make_train_step(spec, g_optim, d_optim),
                   donate_argnums=0)
    rng = np.random.default_rng(0)
    batch = 64
    data = {
        "image": jnp.asarray(rng.standard_normal(
            (spec.n_micro, batch, 128, 128, 3), dtype=np.float32).clip(-1, 1)),
        "label": jnp.asarray(rng.integers(
            0, max(n_cls, 1), (spec.n_micro, batch)).astype(np.int32)),
    }
    return state, step, data, batch, spec


def main():
    for name, n_cls in (("cond", 1000), ("uncond", 0)):
        state, step, data, batch, spec = build(n_cls)
        for _ in range(3):
            state, metrics = step(state, data)
        float(metrics["d_loss"])
        t0 = time.perf_counter()
        for _ in range(30):
            state, metrics = step(state, data)
        float(metrics["d_loss"])
        ms = (time.perf_counter() - t0) / 30 * 1000.0
        print(json.dumps({"config": name, "ms_per_step": round(ms, 2),
                          "img_per_sec": round(spec.n_critic * batch
                                               / (ms / 1000.0), 1)}),
              flush=True)
        del state, step, data


if __name__ == "__main__":
    main()
