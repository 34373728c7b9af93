"""SNGAN CIFAR-10 training entry point — the metric/north-star config
(reference ``SNGAN/train.py``: hinge, Adam(2e-4, 0, 0.9), n_dis=5, batch 64,
linear lr decay over 100k G steps).

Usage: python -m gan_lib_tensorflow_tpu.cli.train_sngan --steps 100000
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import optax

from .. import data as data_lib
from ..models import sngan
from ..train import (CheckpointManager, LoopConfig, create_state,
                     jit_train_step, train_loop)
from ..utils import save_image_grid
from . import common


def build(args):
    dtype = common.compute_dtype(args)
    g = sngan.cifar_generator(compute_dtype=dtype, num_classes=args.num_classes)
    d = sngan.cifar_discriminator(compute_dtype=dtype, num_classes=args.num_classes)
    spec = sngan.make_sngan_spec(g, d, n_critic=args.n_critic,
                                 ema_decay=args.ema_decay)
    # decay horizon defaults to the full planned run (reference: linear decay
    # over 100k G steps); decouple for short smoke runs
    sched = optax.linear_schedule(args.lr, 0.0,
                                  args.lr_decay_steps or args.steps)
    g_optim = optax.adam(sched, b1=args.beta1, b2=args.beta2)
    d_optim = optax.adam(sched, b1=args.beta1, b2=args.beta2)

    def g_init(r):
        zz = jnp.zeros((2, g.z_dim))
        if args.num_classes:
            return g.init(r, zz, jnp.zeros((2,), jnp.int32), train=False)
        return g.init(r, zz, train=False)

    def d_init(r):
        xx = jnp.zeros((2, 32, 32, 3))
        if args.num_classes:
            return d.init(r, xx, jnp.zeros((2,), jnp.int32))
        return d.init(r, xx)

    state = create_state(jax.random.PRNGKey(args.seed), g_init, d_init,
                         g_optim, d_optim, ema_decay=spec.ema_decay)
    return g, d, spec, g_optim, d_optim, state


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--n-critic", type=int, default=5)
    p.add_argument("--beta1", type=float, default=0.0)
    p.add_argument("--beta2", type=float, default=0.9)
    p.add_argument("--num-classes", type=int, default=0,
                   help=">0 trains the conditional (projection-style) variant")
    p.add_argument("--ema-decay", type=float, default=0.9999,
                   help="EMA of G params for sampling/eval — a documented "
                        "IMPROVEMENT over the reference (which has no EMA; "
                        "SURVEY §2.4). 0 disables = strict reference "
                        "parity. EMA samples pair with the training BN "
                        "running stats (models.sngan.make_sampler)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="compute IS/FID every N steps (reference: periodic "
                        "IS/FID pauses; offline uses the random-init "
                        "InceptionV3 — relative trends only)")
    p.add_argument("--eval-samples", type=int, default=5000)
    p.add_argument("--inception-weights", default=None,
                   help="npz from tools/convert_inception_weights.py; absent "
                        "= seed-fixed random extractor (relative trends only)")
    p.add_argument("--lr-decay-steps", type=int, default=0,
                   help="linear-decay horizon (0 = --steps)")
    args = p.parse_args(argv)
    common.configure(args)

    g, d, spec, g_optim, d_optim, state = build(args)
    mesh = common.maybe_mesh(args)
    step_fn = jit_train_step(spec, g_optim, d_optim, mesh=mesh,
                             state_shardings=common.state_layout(
                                 args, state, mesh))
    source = common.image_source(args, args.batch_size, 32,
                                 max(args.num_classes, 10),
                                 n_micro=spec.n_micro, mesh=mesh)

    sampler = sngan.make_sampler(g)
    sample_rng = jax.random.PRNGKey(args.seed + 1)

    def sample_fn(st, it):
        imgs = sampler(st, sample_rng, 64)
        save_image_grid(jax.device_get(imgs),
                        os.path.join(args.out_dir, "samples", f"sample_{it:06d}.png"))

    eval_fn = None
    if args.eval_every:
        from ..eval import compute_statistics, evaluate_generator
        from ..eval.inception_v3 import InceptionV3Features
        net = InceptionV3Features(params_npz=args.inception_weights)
        eval_bs = 100
        n_real_batches = max(args.eval_samples // eval_bs, 1)
        from ..data.device_cache import DeviceCachedStore
        if (isinstance(source, DeviceCachedStore)
                and n_real_batches * eval_bs <= len(source)
                and (mesh is None or eval_bs % mesh.shape["data"] == 0)):
            # reuse the training store's resident HBM buffer for the one-time
            # real-moment pass — a second image_source() would upload and
            # keep a full duplicate of the dataset in HBM (ADVICE r4)
            real_it = source.sequential_batches(eval_bs, n_real_batches)
        else:
            def real_batches():
                # the source lives in THIS generator frame only, so
                # exhausting it (compute_statistics) releases the buffers
                real_src = iter(common.image_source(args, eval_bs, 32,
                                                    max(args.num_classes, 10)))
                for _ in range(n_real_batches):
                    img = jnp.asarray(next(real_src)["image"])
                    img = img[0] if img.ndim == 5 else img  # unstack n_micro
                    if img.dtype == jnp.uint8:
                        # uint8-wire streaming source: normalize on device
                        # (the train path does this in prefetch_to_device)
                        img = img.astype(jnp.float32) * (1.0 / 127.5) - 1.0
                    yield img

            real_it = real_batches()

        # on-device moment accumulation (features never reach host)
        real_stats = compute_statistics(net, real_it, net.feature_dim,
                                        mesh=mesh)
        # moments are all eval needs; drop the iterator (and with it any
        # second store the fallback path materialized) before training
        del real_it

        def eval_fn(st, it):
            return evaluate_generator(
                lambda r: sampler(st, r, eval_bs), net, net.feature_dim,
                n_samples=args.eval_samples, batch_size=eval_bs,
                rng=jax.random.PRNGKey(args.seed + it), real_stats=real_stats,
                mesh=mesh)

    cfg = LoopConfig(total_steps=args.steps, log_every=args.log_every,
                     sample_every=args.sample_every,
                     checkpoint_every=args.ckpt_every,
                     eval_every=args.eval_every, out_dir=args.out_dir,
                     curves=args.curves, tensorboard=args.tensorboard,
                     trace_steps=args.trace_steps,
                     fault_inject_step=args.fault_inject_step)
    ckpt = CheckpointManager(os.path.join(args.out_dir, "ckpt"))
    train_loop(state, step_fn, source, spec.n_micro, cfg, mesh=mesh,
               sample_fn=sample_fn, ckpt=ckpt, eval_fn=eval_fn)


if __name__ == "__main__":
    main(sys.argv[1:])
