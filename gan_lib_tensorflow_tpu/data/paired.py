"""Paired-image folder loader for pix2pix.

Reference: ``pix2pix/pix2pix.py load_examples()`` — glob a directory of
combined A|B images, decode, split halves, jitter (resize to 286 -> random
crop 256 -> random flip), queue-runner batching. Here: PIL decode on host,
same jitter in numpy, infinite shuffled iterator (prefetch overlap comes from
``parallel.prefetch_to_device``).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, Optional

import numpy as np

from .base import DataSource


def _load_image(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR), np.uint8)


class PairedImageFolder(DataSource):
    def __init__(self, path: str, batch_size: int = 1, image_size: int = 256,
                 scale_size: int = 286, which_direction: str = "AtoB",
                 flip: bool = True, seed: int = 0):
        self.files = sorted(
            glob.glob(os.path.join(path, "*.jpg"))
            + glob.glob(os.path.join(path, "*.png")))
        if not self.files:
            raise FileNotFoundError(f"no images in {path}")
        self.batch_size = batch_size
        self.image_size = image_size
        self.scale_size = scale_size
        self.which_direction = which_direction
        self.flip = flip
        self.seed = seed

    def _example(self, rng: np.random.Generator, path: str):
        from . import native
        img = _load_image(path)
        w = img.shape[1] // 2
        a, b = img[:, :w], img[:, w:]
        if self.which_direction == "BtoA":
            a, b = b, a
        s, c = self.scale_size, self.image_size
        a, b = _resize(a, s, s), _resize(b, s, s)
        oy, ox = (int(v) for v in rng.integers(0, s - c + 1, 2))
        flip = bool(self.flip and rng.random() < 0.5)
        # fused crop+flip+normalize in the native tier (one pass over uint8)
        return (native.crop_flip_normalize(a, oy, ox, c, flip),
                native.crop_flip_normalize(b, oy, ox, c, flip))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        while True:
            order = rng.permutation(len(self.files))
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
                pairs = [self._example(rng, self.files[j])
                         for j in order[i:i + self.batch_size]]
                yield {
                    "input": np.stack([p[0] for p in pairs]),
                    "target": np.stack([p[1] for p in pairs]),
                }

    def eval_iter(self) -> Iterator[Dict[str, np.ndarray]]:
        """Deterministic single pass (test mode): center-crop, no flip."""
        c = self.image_size
        for f in self.files:
            img = _load_image(f)
            w = img.shape[1] // 2
            a, b = img[:, :w], img[:, w:]
            if self.which_direction == "BtoA":
                a, b = b, a
            a, b = _resize(a, c, c), _resize(b, c, c)
            to_f = lambda x: (x.astype(np.float32) / 127.5) - 1.0
            yield {"input": to_f(a)[None], "target": to_f(b)[None],
                   "name": os.path.basename(f)}
