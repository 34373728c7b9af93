"""SNGAN-projection ImageNet-128 entry point (reference: conditional G with
cond-BN + projection D; TTUR-style lrs G 1e-4 / D 4e-4, n_dis=5, hinge;
SURVEY.md §2.4).

Usage: python -m gan_lib_tensorflow_tpu.cli.train_sngan_imagenet --steps 450000
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import optax

import glob as glob_mod

from .. import data as data_lib
from ..models import sngan


def glob_has_npz(path: str) -> bool:
    return os.path.isdir(path) and bool(glob_mod.glob(os.path.join(path, "*.npz")))

from ..train import (CheckpointManager, LoopConfig, create_state,
                     jit_train_step, train_loop)
from ..utils import save_image_grid
from . import common


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--n-critic", type=int, default=5)
    p.add_argument("--g-lr", type=float, default=1e-4)
    p.add_argument("--d-lr", type=float, default=4e-4)
    p.add_argument("--beta1", type=float, default=0.0)
    p.add_argument("--beta2", type=float, default=0.9)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--width-mul", type=float, default=1.0,
                   help="channel-width multiplier (1.0 = reference width; "
                        "evaluate with the same value)")
    p.add_argument("--ema-decay", type=float, default=0.9999,
                   help="EMA of G params for sampling/eval (improvement "
                        "over the reference, which has none — 0 disables "
                        "for strict parity; see models.sngan.make_sampler)")
    p.set_defaults(steps=450_000)
    args = p.parse_args(argv)
    common.configure(args)

    dtype = common.compute_dtype(args)
    g = sngan.imagenet128_generator(compute_dtype=dtype, num_classes=args.num_classes,
                                    width_mul=args.width_mul)
    d = sngan.imagenet128_discriminator(compute_dtype=dtype, num_classes=args.num_classes,
                                        width_mul=args.width_mul)
    spec = sngan.make_sngan_spec(g, d, n_critic=args.n_critic,
                                 ema_decay=args.ema_decay)
    g_optim = optax.adam(optax.linear_schedule(args.g_lr, 0.0, args.steps),
                         b1=args.beta1, b2=args.beta2)
    d_optim = optax.adam(optax.linear_schedule(args.d_lr, 0.0, args.steps),
                         b1=args.beta1, b2=args.beta2)

    state = create_state(
        jax.random.PRNGKey(args.seed),
        lambda r: g.init(r, jnp.zeros((2, g.z_dim)), jnp.zeros((2,), jnp.int32),
                         train=False),
        lambda r: d.init(r, jnp.zeros((2, 128, 128, 3)),
                         jnp.zeros((2,), jnp.int32)),
        g_optim, d_optim, ema_decay=spec.ema_decay)

    mesh = common.maybe_mesh(args)
    # --tp-shards > 1: wide kernels + Adam slots + EMA shard over 'model'
    # (the memory lever for width_mul > 1 variants; VERDICT r4 Missing #5)
    step_fn = jit_train_step(spec, g_optim, d_optim, mesh=mesh,
                             state_shardings=common.state_layout(
                                 args, state, mesh))
    synth = ("auto", "fake", "fake-rich", "device-fake", "device-rich")
    if args.data not in synth:
        # explicit path: resolve or fail loudly — never train on synthetic
        # data the user didn't ask for (same rule as common.image_source)
        if not os.path.exists(args.data):
            raise FileNotFoundError(f"--data {args.data!r}: no such path")
        if data_lib.is_packed_dir(args.data):
            # prepacked uint8 memmap store (tools/prepack_dataset.py):
            # device-cached in HBM when it fits (per-step wire cost = one
            # index array — the host->device link is the measured bottleneck,
            # docs/PERF.md transfer law), else streamed as uint8 with ONE
            # prefetch worker (single-core law)
            source = data_lib.packed_training_source(
                args.data, batch_size=args.batch_size, n_micro=spec.n_micro,
                seed=args.seed, mesh=mesh, **common.device_cache_kwargs(args))
        elif args.data.endswith(".npz") or glob_has_npz(args.data):
            source = data_lib.ThreadedSource(data_lib.ImageNetNpz(
                args.data, batch_size=args.batch_size, seed=args.seed))
        else:
            source = data_lib.ThreadedSource(data_lib.ImageFolderByClass(
                args.data, batch_size=args.batch_size, image_size=128,
                seed=args.seed))
    else:
        if args.data == "auto":
            args.data = "fake"
        # device-* styles generate on the accelerator — mandatory for long
        # runs here: 5x64 images of 128^2 per fused step is far beyond what
        # the single-core host renderer can sustain (~3 s/step observed)
        source = common.image_source(args, args.batch_size, 128,
                                     args.num_classes, n_micro=spec.n_micro,
                                     mesh=mesh)

    sampler = sngan.make_sampler(g)
    sample_rng = jax.random.PRNGKey(args.seed + 1)

    def sample_fn(st, it):
        imgs = sampler(st, sample_rng, 36)
        save_image_grid(jax.device_get(imgs),
                        os.path.join(args.out_dir, "samples", f"sample_{it:06d}.png"))

    cfg = LoopConfig(total_steps=args.steps, log_every=args.log_every,
                     sample_every=args.sample_every,
                     checkpoint_every=args.ckpt_every, out_dir=args.out_dir,
                     curves=args.curves, tensorboard=args.tensorboard,
                     trace_steps=args.trace_steps,
                     fault_inject_step=args.fault_inject_step)
    ckpt = CheckpointManager(os.path.join(args.out_dir, "ckpt"))
    train_loop(state, step_fn, source, spec.n_micro, cfg, mesh=mesh,
               sample_fn=sample_fn, ckpt=ckpt)


if __name__ == "__main__":
    main(sys.argv[1:])
