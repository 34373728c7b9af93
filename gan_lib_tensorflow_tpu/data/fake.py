"""Deterministic synthetic data backends.

No datasets ship in this environment (SURVEY.md §7 environment facts), so
every loader has a procedural twin: class-structured blob images for the
class-conditional models and edge->photo-style pairs for pix2pix. The
structure is real enough that a GAN's losses move and a classifier head gets
signal, which is all the smoke/integration tests need.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from .base import DataSource


def _blob_images(rng: np.random.Generator, labels: np.ndarray, size: int) -> np.ndarray:
    """Class-dependent colored gaussian blobs + low noise, NHWC in [-1, 1]."""
    n = labels.shape[0]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    imgs = np.empty((n, size, size, 3), np.float32)
    for i, lab in enumerate(labels):
        g = np.random.default_rng(int(lab) * 7919 + 13)
        cx, cy = g.uniform(0.25, 0.75, 2)
        color = g.uniform(-1, 1, 3).astype(np.float32)
        sigma = 0.08 + 0.04 * (int(lab) % 5)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma**2)))
        # per-sample jitter so samples within a class differ
        jx, jy = rng.uniform(-0.08, 0.08, 2)
        blob2 = np.exp(-(((xx - cx - jx) ** 2 + (yy - cy - jy) ** 2) / (2 * sigma**2)))
        img = 0.5 * (blob + blob2)[..., None] * color[None, None]
        img += rng.normal(0, 0.05, img.shape)
        imgs[i] = np.clip(img, -1, 1)
    return imgs


class FakeImages(DataSource):
    """Synthetic class-conditional image source (CIFAR-10/ImageNet stand-in)."""

    def __init__(self, batch_size: int = 64, image_size: int = 32,
                 num_classes: int = 10, seed: int = 0):
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_classes = num_classes
        self.seed = seed

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        while True:
            labels = rng.integers(0, self.num_classes, self.batch_size).astype(np.int32)
            yield {
                "image": _blob_images(rng, labels, self.image_size),
                "label": labels,
            }


class FakePairedImages(DataSource):
    """Synthetic (input, target) pairs: target = colored shapes, input = its
    'edges' (gradient magnitude) — a procedural edges2shoes stand-in."""

    def __init__(self, batch_size: int = 1, image_size: int = 256, seed: int = 0):
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        s = self.image_size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / (s - 1)
        while True:
            tgt = np.empty((self.batch_size, s, s, 3), np.float32)
            for i in range(self.batch_size):
                img = np.full((s, s, 3), -1.0, np.float32)
                for _ in range(4):
                    cx, cy, r = rng.uniform(0.2, 0.8, 2).tolist() + [rng.uniform(0.05, 0.2)]
                    mask = ((xx - cx) ** 2 + (yy - cy) ** 2) < r**2
                    img[mask] = rng.uniform(-1, 1, 3)
                tgt[i] = img
            gx = np.abs(np.diff(tgt, axis=2, prepend=tgt[:, :, :1])).sum(-1, keepdims=True)
            gy = np.abs(np.diff(tgt, axis=1, prepend=tgt[:, :1])).sum(-1, keepdims=True)
            edges = np.clip((gx + gy), 0, 1) * 2 - 1
            inp = np.repeat(edges, 3, axis=-1).astype(np.float32)
            yield {"input": inp, "target": tgt}
