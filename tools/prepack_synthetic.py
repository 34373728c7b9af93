"""Render the ``device-rich`` synthetic distribution to a prepacked uint8
store — the "real side" for SWD/FID-style evals of models trained on
``--data device-rich`` (no real CelebA-HQ/ImageNet exists on this machine).

The rich renderer (data/fake.py `_compose_rich`) is the same parametric
family the on-device training source samples from (same parameter ranges,
same composition), so a store rendered here is an i.i.d. draw from the
training distribution — exactly what the eval's "real" moments/descriptors
should come from. Quantization to uint8 matches the real-data path
(PackedImageStore normalizes u8 -> float [-1,1] at load).

Usage:
  python tools/prepack_synthetic.py --out /tmp/rich256 --n 16384 --size 256
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
    args = p.parse_args(argv)

    classes = ([str(i) for i in range(args.num_classes)]
               if args.num_classes else None)
    images, labels = packed.write_store(args.out, args.n, args.size,
                                        args.size, 3, classes=classes)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for pos in range(0, args.n, args.chunk):
        k = min(args.chunk, args.n - pos)
        lab = (rng.integers(0, args.num_classes, (k,)).astype(np.int32)
               if args.num_classes else np.zeros((k,), np.int32))
        x = fake._rich_images_np(rng, lab, args.size,
                                 max(args.num_classes, 1))
        images[pos:pos + k] = np.clip(np.rint((x + 1.0) * 127.5),
                                      0, 255).astype(np.uint8)
        if labels is not None:
            labels[pos:pos + k] = lab
        if (pos // args.chunk) % 16 == 0:
            done = pos + k
            print(f"  {done}/{args.n} "
                  f"({done / max(time.time() - t0, 1e-9):.0f} img/s)",
                  flush=True)
    packed.finalize_store(args.out, images, labels)
    dt = time.time() - t0
    print(json.dumps({"packed": args.n, "size": args.size, "out": args.out,
                      "seconds": round(dt, 1),
                      "img_per_s": round(args.n / max(dt, 1e-9), 1)}))


if __name__ == "__main__":
    main()
