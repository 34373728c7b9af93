"""IS/FID evaluation entry point (reference §3.4: generate 50k samples ->
Inception softmax/pool3 -> IS 10-split mean±std, FID vs real moments).

Usage:
  python -m gan_lib_tensorflow_tpu.cli.evaluate --model sngan \
      --ckpt-dir runs/out/ckpt --n-samples 50000 --data fake \
      [--inception-weights inception_v3.npz]

Without --inception-weights a seed-fixed random InceptionV3 is used: relative
comparisons (across checkpoints of the same run) remain meaningful; absolute
values are not Inception-comparable (documented in eval.inception_v3).
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import data as data_lib
from ..eval import compute_statistics, evaluate_generator
from ..eval.inception_v3 import InceptionV3Features
from ..train import CheckpointManager, eval_state_from_raw


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="sngan", choices=["sngan", "acgan"])
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--n-samples", type=int, default=50_000)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--data", default="auto", help="real-data source for FID moments")
    p.add_argument("--n-real", type=int, default=10_000)
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--num-classes", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.model == "sngan":
        from ..models import sngan as m
        g = m.cifar_generator(num_classes=args.num_classes)
        sampler = m.make_sampler(g)
    else:
        from ..models import acgan as m
        g = m.ACGANGenerator()
        sampler = m.make_sampler(g)

    raw = CheckpointManager(args.ckpt_dir).restore_latest_raw()
    if raw is None:
        raise FileNotFoundError(f"no checkpoint under {args.ckpt_dir}")
    state = eval_state_from_raw(raw)

    net = InceptionV3Features(params_npz=args.inception_weights)

    # real-data moments (explicit paths must resolve — never silently fake)
    import os
    if args.data == "fake":
        src = data_lib.FakeImages(batch_size=args.batch_size, image_size=32,
                                  seed=args.seed)
        real_source = "synthetic"
    elif args.data in ("auto", "cifar10"):
        try:
            src = data_lib.Cifar10(batch_size=args.batch_size, seed=args.seed)
            real_source = "cifar10"
        except FileNotFoundError:
            if args.data == "cifar10":
                raise
            src = data_lib.FakeImages(batch_size=args.batch_size, image_size=32,
                                      seed=args.seed)
            real_source = "synthetic"
    elif os.path.isdir(args.data):
        src = data_lib.Cifar10(batch_size=args.batch_size, data_dir=args.data,
                               seed=args.seed)
        real_source = args.data
    else:
        raise FileNotFoundError(f"--data {args.data!r}: no such directory")
    it = iter(src)
    real_batches = (next(it)["image"] for _ in range(args.n_real // args.batch_size))
    mu_r, cov_r = compute_statistics(net, real_batches, net.feature_dim)

    def sample_batch(rng):
        return sampler(state, rng, args.batch_size)

    out = evaluate_generator(
        sample_batch, net, net.feature_dim, n_samples=args.n_samples,
        batch_size=args.batch_size, rng=jax.random.PRNGKey(args.seed + 1),
        real_stats=(mu_r, cov_r))
    out["step"] = int(state.step)
    out["extractor"] = ("inception_v3_pretrained" if args.inception_weights
                        else "inception_v3_random_init")
    out["real_source"] = real_source
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main(sys.argv[1:])
