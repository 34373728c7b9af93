"""Sampling entry point: restore a checkpoint and write a sample grid
(reference surface §3.5: every model dir's "restore -> run G -> save_images").

Usage:
  python -m gan_lib_tensorflow_tpu.cli.sample --model sngan \
      --ckpt-dir runs/out/ckpt --out samples.png --n 64

``--export-dir DIR`` additionally writes a serving bundle for the generator —
the same two artifacts as pix2pix ``--mode export`` (the reference's only
export surface), generalized to every model family:
  1. an orbax checkpoint of the generator params (+ EMA when present), and
  2. ``generator_stablehlo.bin`` — a serialized StableHLO module of the
     jitted z -> images function with params baked in (labels / fade-in alpha
     fixed at export time), loadable via ``jax.export.deserialize`` with no
     model code.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp

from . import common
from ..train import CheckpointManager, eval_state_from_raw
from ..utils import save_image_grid


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   choices=["sngan", "sngan_imagenet", "imagenet", "acgan",
                            "pggan"])
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out", default="samples.png")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-classes", type=int, default=0)
    p.add_argument("--resolution", type=int, default=1024, help="pggan only")
    p.add_argument("--width-mul", type=float, default=1.0,
                   help="pggan/sngan_imagenet channel-width multiplier")
    p.add_argument("--export-dir", default=None,
                   help="also write a serving bundle (orbax params + "
                        "StableHLO of the jitted generator) here")
    args = p.parse_args(argv)
    common.enable_compile_cache()

    if args.model == "imagenet":  # cli.evaluate's name for the family
        args.model = "sngan_imagenet"
    if args.model in ("sngan", "sngan_imagenet"):
        from ..models import sngan as m
        g = (m.cifar_generator(num_classes=args.num_classes)
             if args.model == "sngan"
             else m.imagenet128_generator(num_classes=args.num_classes or 1000,
                                          width_mul=args.width_mul))
        sampler = m.make_sampler(g)
    elif args.model == "acgan":
        from ..models import acgan as m
        g = m.ACGANGenerator()
        sampler = m.make_sampler(g)
    else:
        from ..models import pggan as m
        g = m.PGGANGenerator(resolution=args.resolution, width_mul=args.width_mul)
        sampler = m.make_sampler(g)

    raw = CheckpointManager(args.ckpt_dir).restore_latest_raw()
    if raw is None:
        raise FileNotFoundError(f"no checkpoint under {args.ckpt_dir}")
    state = eval_state_from_raw(raw)
    imgs = sampler(state, jax.random.PRNGKey(args.seed), args.n)
    save_image_grid(jax.device_get(imgs), args.out)
    print(f"wrote {args.n} samples (step {int(state.step)}) to {args.out}")

    if args.export_dir:
        export_generator(args, g, state)


def export_generator(args, g, state):
    """Write the serving bundle (see module docstring). EMA params are used
    when the checkpoint carries them, matching the sampling path."""
    from ..train.export import write_serving_bundle

    params = state.ema_params if state.ema_params is not None else state.g_params
    n = args.n
    if args.model == "pggan":
        alpha = jnp.asarray(state.alpha, jnp.float32)

        def serve(z):
            return g.apply({"params": params}, z, alpha)
    elif args.model == "acgan" or getattr(g, "num_classes", 0) > 0:
        labels = jnp.arange(n) % g.num_classes

        def serve(z):
            return g.apply({"params": params, **state.g_state}, z, labels,
                           train=False)
    else:
        def serve(z):
            return g.apply({"params": params, **state.g_state}, z, train=False)

    write_serving_bundle(
        args.export_dir, int(state.step),
        {"g_params": state.g_params, "g_state": state.g_state,
         **({"ema_params": state.ema_params}
            if state.ema_params is not None else {})},
        serve, jax.ShapeDtypeStruct((n, g.z_dim), jnp.float32))


if __name__ == "__main__":
    main(sys.argv[1:])
