"""ACGAN CIFAR-10 training entry point (reference ``ACGAN/train.py``;
BASELINE.json's designated single-host CPU-runnable smoke config).

Usage: python -m gan_lib_tensorflow_tpu.cli.train_acgan --steps 50000
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import optax

from ..models import acgan
from ..train import (CheckpointManager, LoopConfig, create_state,
                     jit_train_step, train_loop)
from ..utils import save_image_grid
from . import common


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--beta1", type=float, default=0.5)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--adversarial", default="bce", choices=["bce", "hinge"])
    p.add_argument("--aux-weight", type=float, default=1.0)
    p.set_defaults(batch_size=100, steps=50_000)
    args = p.parse_args(argv)
    common.configure(args)

    dtype = common.compute_dtype(args)
    g = acgan.ACGANGenerator(compute_dtype=dtype)
    d = acgan.ACGANDiscriminator(compute_dtype=dtype)
    spec = acgan.make_acgan_spec(g, d, adversarial=args.adversarial,
                                 aux_weight=args.aux_weight)
    g_optim = optax.adam(args.lr, b1=args.beta1, b2=args.beta2)
    d_optim = optax.adam(args.lr, b1=args.beta1, b2=args.beta2)

    state = create_state(
        jax.random.PRNGKey(args.seed),
        lambda r: g.init(r, jnp.zeros((2, g.z_dim)), jnp.zeros((2,), jnp.int32),
                         train=False),
        lambda r: d.init(r, jnp.zeros((2, 32, 32, 3)), train=False),
        g_optim, d_optim)

    mesh = common.maybe_mesh(args)
    step_fn = jit_train_step(spec, g_optim, d_optim, mesh=mesh,
                             state_shardings=common.state_layout(
                                 args, state, mesh))
    source = common.image_source(args, args.batch_size, 32, 10,
                                 n_micro=spec.n_micro, mesh=mesh)

    sampler = acgan.make_sampler(g)
    sample_rng = jax.random.PRNGKey(args.seed + 1)

    def sample_fn(st, it):
        imgs = sampler(st, sample_rng, 100)
        save_image_grid(jax.device_get(imgs),
                        os.path.join(args.out_dir, "samples", f"sample_{it:06d}.png"),
                        rows=10)

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
