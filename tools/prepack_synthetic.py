"""Render the ``device-rich`` synthetic distribution to a prepacked uint8
store — the "real side" for SWD/FID-style evals of models trained on
``--data device-rich`` (no real CelebA-HQ/ImageNet exists on this machine).

The rich renderer (data/fake.py `_compose_rich`) is the same parametric
family the on-device training source samples from (same parameter ranges,
same composition), so a store rendered here is an i.i.d. draw from the
training distribution — exactly what the eval's "real" moments/descriptors
should come from. Quantization to uint8 matches the real-data path
(PackedImageStore normalizes u8 -> float [-1,1] at load).

``--resolutions 128,64,...,4`` additionally writes the PGGAN ladder pyramid
(``r{res:04d}/`` members, successive 2x box downsample of the base render —
same layout as ``tools/prepack_dataset.py --resolutions``), giving
``cli.train_pggan --data <out>`` a CelebA-HQ-shaped packed pyramid on a
machine with no real high-res dataset.

Usage:
  python tools/prepack_synthetic.py --out /tmp/rich256 --n 16384 --size 256
  python tools/prepack_synthetic.py --out /tmp/pyr128 --n 16384 --size 128 \
      --resolutions 128,64,32,16,8,4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gan_lib_tensorflow_tpu.data import fake, packed


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--num-classes", type=int, default=0,
                   help="0 = unconditional (labels all zero, no labels.npy)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--resolutions", default=None,
                   help="comma list starting at --size and descending by "
                        "2x: also write the PGGAN pyramid members "
                        "(r{res:04d}/ subdirs, box-downsampled)")
    args = p.parse_args(argv)

    resolutions = ([int(r) for r in args.resolutions.split(",")]
                   if args.resolutions else [args.size])
    if resolutions[0] != args.size or resolutions != sorted(
            resolutions, reverse=True):
        raise ValueError("--resolutions must start at --size and descend")
    multi = len(resolutions) > 1

    classes = ([str(i) for i in range(args.num_classes)]
               if args.num_classes else None)
    stores, labels_arrs = [], []
    for res in resolutions:
        d = os.path.join(args.out, f"r{res:04d}") if multi else args.out
        images, labels = packed.write_store(d, args.n, res, res, 3,
                                            classes=classes)
        stores.append(images)
        labels_arrs.append(labels)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    from prepack_dataset import _pyramid_write
    for pos in range(0, args.n, args.chunk):
        k = min(args.chunk, args.n - pos)
        lab = (rng.integers(0, args.num_classes, (k,)).astype(np.int32)
               if args.num_classes else np.zeros((k,), np.int32))
        x = fake._rich_images_np(rng, lab, args.size,
                                 max(args.num_classes, 1))
        chunk_u8 = np.clip(np.rint((x + 1.0) * 127.5), 0, 255).astype(np.uint8)
        _pyramid_write(stores, labels_arrs, pos, chunk_u8, lab, resolutions)
        if (pos // args.chunk) % 16 == 0:
            done = pos + k
            print(f"  {done}/{args.n} "
                  f"({done / max(time.time() - t0, 1e-9):.0f} img/s)",
                  flush=True)
    for res, images, labels in zip(resolutions, stores, labels_arrs):
        d = os.path.join(args.out, f"r{res:04d}") if multi else args.out
        packed.finalize_store(d, images, labels)
    dt = time.time() - t0
    print(json.dumps({"packed": args.n, "size": args.size, "out": args.out,
                      "resolutions": resolutions, "seconds": round(dt, 1),
                      "img_per_s": round(args.n / max(dt, 1e-9), 1)}))


if __name__ == "__main__":
    main()
