"""Sampling entry point: restore a checkpoint and write a sample grid
(reference surface §3.5: every model dir's "restore -> run G -> save_images").

Usage:
  python -m gan_lib_tensorflow_tpu.cli.sample --model sngan \
      --ckpt-dir runs/out/ckpt --out samples.png --n 64
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

from ..train import CheckpointManager, create_state
from ..utils import save_image_grid
from . import common


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   choices=["sngan", "sngan_imagenet", "acgan", "pggan"])
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out", default="samples.png")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-classes", type=int, default=0)
    p.add_argument("--resolution", type=int, default=1024, help="pggan only")
    p.add_argument("--width-mul", type=float, default=1.0, help="pggan only")
    args = p.parse_args(argv)

    import optax
    optim = optax.adam(1e-4)

    if args.model in ("sngan", "sngan_imagenet"):
        from ..models import sngan as m
        if args.model == "sngan":
            g = m.cifar_generator(num_classes=args.num_classes)
            d = m.cifar_discriminator(num_classes=args.num_classes)
            hw = 32
        else:
            nc = args.num_classes or 1000
            g = m.imagenet128_generator(num_classes=nc)
            d = m.imagenet128_discriminator(num_classes=nc)
            hw = 128
        cond = g.num_classes > 0

        def g_init(r):
            zz = jnp.zeros((2, g.z_dim))
            return (g.init(r, zz, jnp.zeros((2,), jnp.int32), train=False)
                    if cond else g.init(r, zz, train=False))

        def d_init(r):
            xx = jnp.zeros((2, hw, hw, 3))
            return (d.init(r, xx, jnp.zeros((2,), jnp.int32)) if cond
                    else d.init(r, xx))
        sampler = m.make_sampler(g)
    elif args.model == "acgan":
        from ..models import acgan as m
        g = m.ACGANGenerator()
        d = m.ACGANDiscriminator()
        g_init = lambda r: g.init(r, jnp.zeros((2, g.z_dim)),
                                  jnp.zeros((2,), jnp.int32), train=False)
        d_init = lambda r: d.init(r, jnp.zeros((2, 32, 32, 3)), train=False)
        sampler = m.make_sampler(g)
    else:
        from ..models import pggan as m
        g = m.PGGANGenerator(resolution=args.resolution, width_mul=args.width_mul)
        d = m.PGGANDiscriminator(resolution=args.resolution, width_mul=args.width_mul)
        g_init = lambda r: g.init(r, jnp.zeros((2, g.z_dim)), 1.0)
        d_init = lambda r: d.init(r, jnp.zeros((4, args.resolution, args.resolution, 3)), 1.0)
        sampler = m.make_sampler(g)

    state = create_state(jax.random.PRNGKey(0), g_init, d_init, optim, optim,
                         ema_decay=0.999)
    ckpt = CheckpointManager(args.ckpt_dir)
    restored = ckpt.restore_latest(state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {args.ckpt_dir}")
    imgs = sampler(restored, jax.random.PRNGKey(args.seed), args.n)
    save_image_grid(jax.device_get(imgs), args.out)
    print(f"wrote {args.n} samples (step {int(restored.step)}) to {args.out}")


if __name__ == "__main__":
    main(sys.argv[1:])
