"""PGGAN entry point: the full progressive ladder 4x4 -> --final-resolution
(reference ``PGGAN/train.py``; WGAN-GP, Adam(1e-3, 0, 0.99), fade-in then
stabilize per level).

Usage: python -m gan_lib_tensorflow_tpu.cli.train_pggan --final-resolution 1024
"""

from __future__ import annotations

import sys

import jax.numpy as jnp

from .. import data as data_lib
from ..train.pggan_loop import LadderConfig, train_pggan_ladder
from . import common


def parse_batch_by_res(spec: str) -> dict:
    """'512:16,1024:8' -> {512: 16, 1024: 8}; SystemExit on malformed input."""
    out = {}
    for pair in filter(None, spec.split(",")):
        res_s, _, b_s = pair.partition(":")
        try:
            out[int(res_s)] = int(b_s)
        except ValueError:
            raise SystemExit(
                f"--batch-by-res: bad entry {pair!r} (want RES:BATCH)")
    return out


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--final-resolution", type=int, default=1024)
    p.add_argument("--images-per-phase", type=int, default=600_000)
    p.add_argument("--width-mul", type=float, default=1.0)
    p.add_argument("--z-dim", type=int, default=512)
    p.add_argument("--steps-per-phase", type=int, default=0,
                   help="override phase length in steps (smoke runs)")
    p.add_argument("--remat-from", type=int, default=0,
                   help="rematerialize convs at resolutions >= this (0=off). "
                        "With the default fused D blocks even 1024^2 batch 4 "
                        "fits without remat (BASELINE.md round-2 sweep); set "
                        "512 if memory pressure returns")
    p.add_argument("--s2d-from", type=int, default=512,
                   help="compute levels >= this resolution on the "
                        "space-to-depth grid — exact, param-compatible "
                        "rewrite of the low-channel top levels (each ladder "
                        "stage applies it to its own top level only; "
                        "measured +33-40%% at the 512/1024 rungs, "
                        "docs/PERF.md). 0=off")
    p.add_argument("--fused-from", type=int, default=128,
                   help="fused conv+downscale D blocks (Karras fused_scale) "
                        "at resolutions >= this (0=off)")
    p.add_argument("--sp-shards", type=int, default=1,
                   help="shard image height over this many chips (GSPMD "
                        "spatial partitioning for high-res levels)")
    p.add_argument("--batch-by-res", type=str, default="",
                   help="override entries of the Karras per-resolution batch "
                        "schedule, e.g. '512:16,1024:8' (measured: batch 8 "
                        "at 1024^2 is +81%% throughput on one chip, "
                        "docs/PERF.md). Unlisted resolutions keep the "
                        "default; the generic --batch-size flag is NOT used "
                        "by the ladder")
    p.set_defaults(lr=1e-3)
    args = p.parse_args(argv)
    common.configure(args)

    cfg = LadderConfig(
        final_resolution=args.final_resolution,
        images_per_phase=args.images_per_phase,
        lr=args.lr, width_mul=args.width_mul, z_dim=args.z_dim,
        compute_dtype=common.compute_dtype(args), seed=args.seed,
        out_dir=args.out_dir, log_every=args.log_every,
        sample_every=args.sample_every, checkpoint_every=args.ckpt_every,
        steps_per_phase=args.steps_per_phase or None,
        spatial_axis="sp" if args.sp_shards > 1 else None,
        remat_from_resolution=args.remat_from,
        fused_from_resolution=args.fused_from,
        s2d_from_resolution=args.s2d_from)
    cfg.batch_by_res.update(parse_batch_by_res(args.batch_by_res))

    import jax
    from ..parallel import create_mesh
    if getattr(args, "tp_shards", 1) > 1:
        # the ladder rebuilds its train step per phase inside pggan_loop and
        # PGGAN's memory pressure is activations (spatial), not params — the
        # right multi-chip axis here is --sp-shards; fail loudly instead of
        # silently training replicated params on a 'model' axis
        raise SystemExit("--tp-shards is not supported by the PGGAN ladder; "
                         "use --sp-shards (spatial partitioning) for "
                         "high-res memory pressure")
    if args.sp_shards > 1:
        n = jax.device_count()
        if n % args.sp_shards:
            raise ValueError(f"--sp-shards {args.sp_shards} must divide "
                             f"device count {n}")
        mesh = create_mesh((n // args.sp_shards, args.sp_shards), ("data", "sp"))
    else:
        mesh = common.maybe_mesh(args)

    import os as _os
    synth = ("auto", "fake", "fake-rich", "device-fake", "device-rich")
    if args.data not in synth:
        if not _os.path.isdir(args.data):
            raise FileNotFoundError(f"--data {args.data!r}: no such directory")
        if data_lib.is_packed_dir(args.data) or data_lib.is_packed_dir(
                _os.path.join(args.data, f"r{args.final_resolution:04d}")):

            def source_factory(res, batch):
                # prepacked pyramid (tools/prepack_dataset.py --resolutions):
                # each phase gets its own-resolution uint8 store — held
                # device-resident when it fits the HBM budget (per-step wire
                # cost = one index array; the low rungs' stores are tiny) and
                # streamed as uint8 otherwise (docs/PERF.md transfer law)
                return data_lib.packed_training_source(
                    data_lib.resolve_pyramid_dir(args.data, res),
                    batch_size=batch, n_micro=1, seed=args.seed, mesh=mesh,
                    spatial_axis=cfg.spatial_axis,
                    **common.device_cache_kwargs(args))
        else:

            def source_factory(res, batch):
                # raw image folder: decode at full res, then box-downsample —
                # fine for smoke runs; prepack for reference-scale rates
                base = data_lib.ImageFolderFlat(
                    args.data, batch_size=batch,
                    image_size=args.final_resolution, seed=args.seed)
                multi = data_lib.MultiResolution(
                    base=base, batch_size=batch,
                    max_resolution=args.final_resolution, resolution=res)
                return data_lib.ThreadedSource(multi)
    elif args.data in ("device-fake", "device-rich"):

        def source_factory(res, batch):
            # jitted on-accelerator rendering at the phase resolution;
            # mesh-native (batch over 'data', height over 'sp' when spatial
            # sharding is on)
            return data_lib.DeviceFakeImages(
                batch_size=batch, image_size=res, num_classes=1,
                seed=args.seed, n_micro=1,
                style="rich" if args.data == "device-rich" else "blobs",
                mesh=mesh, spatial_axis=cfg.spatial_axis)
    else:

        def source_factory(res, batch):
            # synthetic reals are generated directly at the phase resolution —
            # rendering 1024^2 blobs to train a 4x4 phase would throttle the
            # fastest phases for nothing
            return data_lib.ThreadedSource(data_lib.FakeImages(
                batch_size=batch, image_size=res, num_classes=1,
                seed=args.seed,
                style="rich" if args.data == "fake-rich" else "blobs"))

    train_pggan_ladder(cfg, source_factory, mesh=mesh)


if __name__ == "__main__":
    main(sys.argv[1:])
