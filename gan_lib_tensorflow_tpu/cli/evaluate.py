"""IS/FID/SWD evaluation entry point (reference §3.4: generate 50k samples ->
Inception softmax/pool3 -> IS 10-split mean±std, FID vs real moments; PGGAN:
Karras-style MS-SSIM diversity + sliced Wasserstein distance).

Usage:
  python -m gan_lib_tensorflow_tpu.cli.evaluate --model sngan \
      --ckpt-dir runs/out/ckpt --n-samples 50000 --data fake \
      [--inception-weights inception_v3.npz] [--real-stats-npz stats.npz]

  python -m gan_lib_tensorflow_tpu.cli.evaluate --model pggan \
      --ckpt-dir runs/pg/ckpt --resolution 64 [--data <celeba-hq dir>]

  python -m gan_lib_tensorflow_tpu.cli.evaluate --model imagenet \
      --ckpt-dir runs/in128/ckpt --data <packed 128^2 store or class folder>
      # SNGAN-projection 128^2 conditional IS/FID (labels cycle 0..C-1)

Without --inception-weights a seed-fixed random InceptionV3 is used: relative
comparisons (across checkpoints of the same run) remain meaningful; absolute
values are not Inception-comparable (documented in eval.inception_v3).

``--real-stats-npz PATH`` caches the real-data moments: computed once and
saved if PATH is missing, loaded (skipping the real pass entirely) when
present — the reference recomputes real stats every eval invocation; a cached
moment file is what makes the repeated-eval/north-star loop cheap.

All feature and moment accumulation is on-device (eval.metrics); with >1
visible device the batch shards over a 'data' mesh and XLA reduces the
moments across chips.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from . import common
from .. import data as data_lib
from ..eval import compute_statistics, evaluate_generator
from ..eval.inception_v3 import InceptionV3Features
from ..train import CheckpointManager, eval_state_from_raw


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="sngan",
                   choices=["sngan", "acgan", "pggan", "imagenet",
                            "sngan_imagenet"])
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--n-samples", type=int, default=50_000)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--data", default="auto", help="real-data source for FID/SWD")
    p.add_argument("--n-real", type=int, default=10_000)
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--real-stats-npz", default=None,
                   help="cache file for real moments: saved on first run, "
                        "loaded (real pass skipped) thereafter")
    p.add_argument("--num-classes", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resolution", type=int, default=64, help="pggan only")
    p.add_argument("--swd-samples", type=int, default=None,
                   help="pggan only: image count per side for SWD (default "
                        "n_samples//10; Karras scale = 16384)")
    p.add_argument("--width-mul", type=float, default=1.0,
                   help="pggan/imagenet channel-width multiplier")
    p.add_argument("--out-json", default=None,
                   help="also write the result record to this file")
    args = p.parse_args(argv)
    common.enable_compile_cache()
    if args.model == "sngan_imagenet":  # cli.sample's name for the family
        args.model = "imagenet"

    out = (eval_pggan(args) if args.model == "pggan"
           else eval_is_fid(args))
    line = json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                       for k, v in out.items()})
    print(line)
    if args.out_json:
        with open(args.out_json, "w") as f:
            f.write(line + "\n")


def _mesh_or_none():
    from ..parallel import create_mesh
    return create_mesh() if jax.device_count() > 1 else None


def _restore(args):
    raw = CheckpointManager(args.ckpt_dir).restore_latest_raw()
    if raw is None:
        raise FileNotFoundError(f"no checkpoint under {args.ckpt_dir}")
    return eval_state_from_raw(raw)


def _real_image_source(args, image_size: int = 32):
    """Resolve --data for real moments; explicit sources fail loudly."""
    if args.data == "fake":
        return data_lib.FakeImages(batch_size=args.batch_size,
                                   image_size=image_size, seed=args.seed), "synthetic"
    if args.data == "cifar10" and image_size != 32:
        raise ValueError(
            f"--data cifar10 is 32^2 but --model {args.model} generates "
            f"{image_size}^2; point --data at a matching real source")
    if args.data in ("auto", "cifar10") and image_size == 32:
        try:
            return data_lib.Cifar10(batch_size=args.batch_size,
                                    seed=args.seed), "cifar10"
        except FileNotFoundError:
            if args.data == "cifar10":
                raise
    if args.data == "auto":
        return data_lib.FakeImages(batch_size=args.batch_size,
                                   image_size=image_size,
                                   seed=args.seed), "synthetic"
    if os.path.isdir(args.data):
        if data_lib.is_packed_dir(args.data):
            src = data_lib.PackedImageStore(
                args.data, batch_size=args.batch_size, seed=args.seed)
            if src.image_size != image_size:
                raise ValueError(
                    f"--data {args.data}: packed store is {src.image_size}^2 "
                    f"but --model {args.model} generates {image_size}^2")
            return src, args.data
        if image_size == 32:
            return data_lib.Cifar10(batch_size=args.batch_size,
                                    data_dir=args.data, seed=args.seed), args.data
        return data_lib.ImageFolderByClass(
            args.data, batch_size=args.batch_size, image_size=image_size,
            seed=args.seed), args.data
    raise FileNotFoundError(f"--data {args.data!r}: no such directory")


def _extractor_name(args) -> str:
    return ("inception_v3_pretrained" if args.inception_weights
            else "inception_v3_random_init")


def real_moments(args, net, mesh=None, image_size: int = 32):
    """Real-data (mu, cov) with npz caching (--real-stats-npz).

    A cached file records which feature extractor produced it; loading it
    under a different extractor is refused — FID moments are not comparable
    across extractors, and silently mixing them is exactly the garbage-FID
    failure the cache metadata exists to prevent."""
    cache = args.real_stats_npz
    if cache and os.path.exists(cache):
        d = np.load(cache)
        have = str(d["extractor"]) if "extractor" in d.files else None
        if have is not None and have != _extractor_name(args):
            raise ValueError(
                f"--real-stats-npz {cache}: cached moments were computed "
                f"with {have} but this run uses {_extractor_name(args)}; "
                f"delete the cache or pass a different path")
        if int(d["n_real"]) != args.n_real:
            print(f"note: {cache} was computed with n_real={int(d['n_real'])}",
                  flush=True)
        return (d["mu"], d["cov"]), str(d["source"])
    if args.n_real < args.batch_size:
        raise ValueError(
            f"--n-real {args.n_real} < --batch-size {args.batch_size}: "
            f"zero real batches would be accumulated")
    src, real_source = _real_image_source(args, image_size=image_size)
    it = iter(src)
    real_batches = (next(it)["image"]
                    for _ in range(args.n_real // args.batch_size))
    mu, cov = compute_statistics(net, real_batches, net.feature_dim, mesh=mesh)
    if cache:
        np.savez(cache, mu=mu, cov=cov, n_real=args.n_real,
                 source=real_source, extractor=_extractor_name(args))
        print(f"cached real moments to {cache}", flush=True)
    return (mu, cov), real_source


def eval_is_fid(args) -> dict:
    image_size = 32
    if args.model == "sngan":
        from ..models import sngan as m
        g = m.cifar_generator(num_classes=args.num_classes)
        sampler = m.make_sampler(g)
    elif args.model == "imagenet":
        # SNGAN-projection 128^2: class-conditional samples cycling the label
        # set (reference reports IS over 50k conditional samples, SURVEY §6)
        from ..models import sngan as m
        g = m.imagenet128_generator(num_classes=args.num_classes or 1000,
                                    width_mul=args.width_mul)
        sampler = m.make_sampler(g)
        image_size = 128
    else:
        from ..models import acgan as m
        g = m.ACGANGenerator()
        sampler = m.make_sampler(g)

    state = _restore(args)
    mesh = _mesh_or_none()
    net = InceptionV3Features(params_npz=args.inception_weights)
    (mu_r, cov_r), real_source = real_moments(args, net, mesh=mesh,
                                              image_size=image_size)

    def sample_batch(rng):
        return sampler(state, rng, args.batch_size)

    out = evaluate_generator(
        sample_batch, net, net.feature_dim, n_samples=args.n_samples,
        batch_size=args.batch_size, rng=jax.random.PRNGKey(args.seed + 1),
        real_stats=(mu_r, cov_r), mesh=mesh)
    out["step"] = int(state.step)
    out["extractor"] = _extractor_name(args)
    out["real_source"] = real_source
    return out


def eval_pggan(args) -> dict:
    """Karras-style PGGAN eval: MS-SSIM over generated pairs (diversity) +
    SWD per pyramid level vs real data when a real source resolves."""
    from ..eval import perceptual
    from ..models import pggan as m

    g = m.PGGANGenerator(resolution=args.resolution, width_mul=args.width_mul)
    sampler = m.make_sampler(g)
    state = _restore(args)
    bs = min(args.batch_size, 16)

    n_pairs = max(args.n_samples // 10, bs)
    ms_mean, ms_std = perceptual.ms_ssim_diversity(
        lambda r: sampler(state, r, 2 * bs),
        jax.random.PRNGKey(args.seed), n_pairs=n_pairs, batch_size=bs)
    out = {"ms_ssim": ms_mean, "ms_ssim_std": ms_std,
           "ms_ssim_pairs": (n_pairs // bs) * bs,
           "step": int(state.step), "resolution": args.resolution}

    real_src = None
    if os.path.isdir(args.data):
        # prepacked store / pyramid first (the format train_pggan itself
        # recommends and consumes); wrong-resolution stores fail loudly in
        # open_pyramid, plain image folders fall through to the PIL loader
        try:
            real_src = data_lib.open_pyramid(
                args.data, batch_size=bs, resolution=args.resolution,
                seed=args.seed)
        except FileNotFoundError:
            real_src = data_lib.ImageFolderFlat(
                args.data, batch_size=bs, image_size=args.resolution,
                seed=args.seed)
    elif args.data in ("device-rich", "device-fake"):
        # reals rendered on-accelerator at eval resolution — the same
        # distribution train_pggan's device-synthetic twin trains on, at
        # zero host/prepack cost (a 16,384-image real side at 1024² would
        # be a 51 GB uint8 store taking ~hours to prepack on a 1-core
        # host; the device renderer produces it batch-by-batch for free)
        dev = data_lib.DeviceFakeImages(
            batch_size=bs, image_size=args.resolution, num_classes=1,
            seed=args.seed, n_micro=1,
            style="rich" if args.data == "device-rich" else "blobs")
        real_src = ({"image": b["image"][0]} for b in dev)
    elif args.data != "auto":
        print(f"note: --data {args.data!r} is not a directory; "
              "skipping SWD (MS-SSIM only)", flush=True)
    if real_src is not None:
        import time
        swd_n = args.swd_samples or max(args.n_samples // 10, bs)
        n_b = max(swd_n // bs, 1)
        it = iter(real_src)

        def fake_batches():
            # lazy: one sampled batch in flight at a time. Pre-materializing
            # all fake images would hold n_b*bs full-resolution floats on
            # device (12.9 GB at 16,384 x 256^2) — far beyond HBM; the
            # pyramid descriptors swd_pyramid keeps are ~50x smaller.
            rng = jax.random.PRNGKey(args.seed + 1)
            for _ in range(n_b):
                rng, sub = jax.random.split(rng)
                yield sampler(state, sub, bs)

        t0 = time.perf_counter()
        out.update(perceptual.swd_pyramid(
            (next(it)["image"] for _ in range(n_b)), fake_batches(),
            resolution=args.resolution, seed=args.seed))
        out["swd_images"] = n_b * bs
        out["swd_seconds"] = round(time.perf_counter() - t0, 2)
        stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
        if stats and "peak_bytes_in_use" in stats:
            out["swd_peak_hbm_gb"] = round(
                stats["peak_bytes_in_use"] / 2**30, 3)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
