"""pix2pix entry point with the reference's three modes (SURVEY.md §3.2):
train / test (paired translation + HTML gallery) / export (params+apply
bundle).

Usage:
  python -m gan_lib_tensorflow_tpu.cli.train_pix2pix --mode train --data fake
  python -m gan_lib_tensorflow_tpu.cli.train_pix2pix --mode test --data <dir>
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import data as data_lib
from ..models import pix2pix
from ..train import (CheckpointManager, LoopConfig, create_state,
                     jit_train_step, train_loop)
from ..utils import save_image_grid, to_uint8
from ..utils.html import write_gallery
from . import common


def paired_source(args, threaded: bool = True, num_workers: int = 2,
                  n_micro: int = 1, mesh=None):
    """Paired (input, target) source (reference: queue-runner threads,
    SURVEY.md §3.2; ``ThreadedSource`` is the host-side equivalent).

    On this single-core host the 256² numpy renderer (~24 ms/batch
    uncontended, 300+ ms under concurrent load) cannot outrun the ~13 ms
    fused device step and threads cannot help — so the ``device-fake`` /
    ``device-det`` backends rasterize pairs in a jitted function on the
    accelerator instead (``data.DeviceFakePairedImages``), the same design as
    ``DeviceFakeImages`` for the class-conditional models; with a mesh active
    each chip rasterizes its own 'data' shard. Host synthetics remain for CPU
    tests and test-mode galleries."""
    synth = ("auto", "fake", "fake-det", "device-fake", "device-det")
    if args.data in synth or not os.path.isdir(args.data):
        if args.data not in synth:
            raise FileNotFoundError(f"--data dir not found: {args.data}")
        if args.data.startswith("device") and threaded:
            # jitted on-device pair generation — ~0 host cost. Required
            # for long synthetic runs: this host has ONE core and the
            # numpy renderer alone costs more than the fused device step.
            return data_lib.DeviceFakePairedImages(
                batch_size=args.batch_size, image_size=args.image_size,
                seed=args.seed, n_micro=n_micro,
                deterministic_color=(args.data == "device-det"), mesh=mesh)
        base = data_lib.FakePairedImages(
            batch_size=args.batch_size, image_size=args.image_size,
            seed=args.seed,
            # '-det': colors are a fixed function of geometry, so the
            # translator can actually learn them (see data/fake.py)
            deterministic_color=args.data.endswith("-det"))
    elif data_lib.is_packed_dir(args.data):
        # prepacked paired store (tools/prepack_dataset.py --paired); the
        # store fixes scale_size, jitter happens per step. Train mode
        # device-caches the store when it fits (jitter+normalize run
        # on-accelerator; per-step wire cost = indices+offsets, docs/PERF.md
        # transfer law); test mode needs the host store's deterministic
        # eval_iter. Streaming fallback: ONE prefetch worker (2+ collapse on
        # a single core — PERF.md law)
        if threaded:
            return data_lib.packed_paired_training_source(
                args.data, batch_size=args.batch_size,
                image_size=args.image_size,
                which_direction=args.which_direction, flip=not args.no_flip,
                n_micro=n_micro, seed=args.seed, mesh=mesh,
                **common.device_cache_kwargs(args))
        num_workers = 1
        base = data_lib.PackedPairedStore(
            args.data, batch_size=args.batch_size,
            image_size=args.image_size,
            which_direction=args.which_direction, flip=not args.no_flip,
            seed=args.seed)
    else:
        base = data_lib.PairedImageFolder(
            args.data, batch_size=args.batch_size,
            image_size=args.image_size, scale_size=args.scale_size,
            which_direction=args.which_direction, flip=not args.no_flip,
            seed=args.seed)
    # test mode needs the base source's deterministic eval_iter / ordering
    return data_lib.ThreadedSource(base, num_workers=num_workers) if threaded else base


def build(args):
    dtype = common.compute_dtype(args)
    g = pix2pix.UNetGenerator(base_ch=args.ngf, compute_dtype=dtype)
    d = pix2pix.PatchGANDiscriminator(base_ch=args.ndf, compute_dtype=dtype)
    spec = pix2pix.make_pix2pix_spec(g, d, gan_weight=args.gan_weight,
                                     l1_weight=args.l1_weight)
    g_optim = optax.adam(args.lr, b1=args.beta1)
    d_optim = optax.adam(args.lr, b1=args.beta1)
    s = args.image_size
    state = create_state(
        jax.random.PRNGKey(args.seed),
        lambda r: g.init({"params": r, "dropout": jax.random.PRNGKey(7)},
                         jnp.zeros((1, s, s, 3)), train=False),
        lambda r: d.init(r, jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)),
                         train=False),
        g_optim, d_optim)
    return g, d, spec, g_optim, d_optim, state


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--mode", default="train", choices=["train", "test", "export"])
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--ndf", type=int, default=64)
    p.add_argument("--gan-weight", type=float, default=1.0)
    p.add_argument("--l1-weight", type=float, default=100.0)
    p.add_argument("--beta1", type=float, default=0.5)
    p.add_argument("--which-direction", default="AtoB", choices=["AtoB", "BtoA"])
    p.add_argument("--scale-size", type=int, default=286,
                   help="jitter: resize to this before random-cropping to "
                        "--image-size (reference load_examples default 286)")
    p.add_argument("--no-flip", action="store_true",
                   help="disable random horizontal flip augmentation")
    p.add_argument("--max-test-images", type=int, default=64)
    p.set_defaults(batch_size=1, steps=40_000)
    args = p.parse_args(argv)
    if args.scale_size < args.image_size:
        p.error(f"--scale-size {args.scale_size} must be >= --image-size "
                f"{args.image_size} (resize-then-crop jitter)")
    common.configure(args)

    g, d, spec, g_optim, d_optim, state = build(args)
    ckpt = CheckpointManager(os.path.join(args.out_dir, "ckpt"))

    if args.mode == "train":
        mesh = common.maybe_mesh(args)
        step_fn = jit_train_step(spec, g_optim, d_optim, mesh=mesh,
                                 state_shardings=common.state_layout(
                                     args, state, mesh))
        # decode/jitter/render on worker threads (the reference's queue-runner
        # role) or, for device-* synthetics, jitted on the accelerator
        source = paired_source(args, n_micro=spec.n_micro, mesh=mesh)
        if getattr(source, "yields_stacks", False):
            # draw the fixed visualization triple from a reserved stream
            # position (2^31-1 — fold_in needs a non-negative int32, and no
            # training run reaches that step count): the train loop re-primes
            # the counter to the resumed step, so training batches
            # (positions 0,1,...) never include it
            source.set_stream_position(2**31 - 1)
            fixed = {k: np.asarray(jax.device_get(v))[0]
                     for k, v in next(iter(source)).items()}
        else:
            # draw from an UNTHREADED twin so the fixed triple is a pure
            # function of --seed (worker queue races are not reproducible)
            fixed = next(iter(paired_source(args, threaded=False)))
        translator = pix2pix.make_translator(g)
        from ..utils.logging import ScalarLogger
        logger = ScalarLogger(args.out_dir, curves=args.curves,
                              tensorboard=args.tensorboard)

        def sample_fn(st, it):
            out = np.asarray(translator(pix2pix.generator_variables(st),
                                        jnp.asarray(fixed["input"]),
                                        jax.random.PRNGKey(0)))
            trip = np.concatenate([fixed["input"], out, fixed["target"]], axis=2)
            save_image_grid(trip, os.path.join(args.out_dir, "samples", f"{it:06d}.png"),
                            rows=len(trip))
            # reference writes tf.summary.image for inputs/outputs/targets
            logger.log_images(it, "inputs", fixed["input"])
            logger.log_images(it, "outputs", out)
            logger.log_images(it, "targets", fixed["target"])

        cfg = LoopConfig(total_steps=args.steps, log_every=args.log_every,
                         sample_every=args.sample_every,
                         checkpoint_every=args.ckpt_every, out_dir=args.out_dir,
                         curves=args.curves, tensorboard=args.tensorboard,
                     trace_steps=args.trace_steps,
                         fault_inject_step=args.fault_inject_step)
        train_loop(state, step_fn, source, spec.n_micro, cfg, mesh=mesh,
                   sample_fn=sample_fn, ckpt=ckpt, logger=logger)
        return

    restored = ckpt.restore_latest(state)
    if restored is not None:
        state = restored
        print(f"restored step {int(state.step)}", flush=True)

    if args.mode == "test":
        source = paired_source(args, threaded=False)
        it = (source.eval_iter() if hasattr(source, "eval_iter")
              else iter(source))
        translator = pix2pix.make_translator(g)
        img_dir = os.path.join(args.out_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        rows = []
        l1_sum, l1_n = 0.0, 0
        from PIL import Image
        for i, ex in enumerate(it):
            if i >= args.max_test_images:
                break
            out = np.asarray(translator(pix2pix.generator_variables(state),
                                        jnp.asarray(ex["input"]),
                                        jax.random.PRNGKey(i)))
            l1_sum += float(np.abs(out - np.asarray(ex["target"])).mean())
            l1_n += 1
            name = ex.get("name", f"{i:05d}")
            row = {"name": name}
            for kind, arr in (("input", ex["input"]), ("output", out),
                              ("target", ex["target"])):
                fn = f"{name}-{kind}.png"
                Image.fromarray(to_uint8(arr[0])).save(os.path.join(img_dir, fn))
                row[kind] = f"images/{fn}"
            rows.append(row)
        path = write_gallery(args.out_dir, rows)
        # aggregate test-set L1 (same [-1,1] scale as the training g_l1 term)
        metrics = {"test_l1": l1_sum / max(l1_n, 1), "n_examples": l1_n,
                   "step": int(state.step)}
        with open(os.path.join(args.out_dir, "test_metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(f"wrote {len(rows)} examples to {path}; "
              f"test L1 {metrics['test_l1']:.4f}", flush=True)
        return

    if args.mode == "export":
        # Serving bundle (reference: frozen meta-graph) — see
        # train/export.py for the two artifacts written
        from ..train.export import write_serving_bundle

        g_vars = pix2pix.generator_variables(state)
        fixed_rng = jax.random.PRNGKey(0)

        def serve(inp):
            return g.apply(g_vars, inp, train=False, rngs={"dropout": fixed_rng})

        s = args.image_size
        write_serving_bundle(
            os.path.join(args.out_dir, "export"), int(state.step),
            {"g_params": state.g_params, "g_state": state.g_state},
            serve, jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32))


if __name__ == "__main__":
    main(sys.argv[1:])
