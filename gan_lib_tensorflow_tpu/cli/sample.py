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

from ..train import CheckpointManager, eval_state_from_raw
from ..utils import save_image_grid


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

    if args.model in ("sngan", "sngan_imagenet"):
        from ..models import sngan as m
        g = (m.cifar_generator(num_classes=args.num_classes)
             if args.model == "sngan"
             else m.imagenet128_generator(num_classes=args.num_classes or 1000))
        sampler = m.make_sampler(g)
    elif args.model == "acgan":
        from ..models import acgan as m
        sampler = m.make_sampler(m.ACGANGenerator())
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


if __name__ == "__main__":
    main(sys.argv[1:])
