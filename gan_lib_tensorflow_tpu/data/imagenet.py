"""ImageNet loader for SNGAN-projection 128x128 conditional training.

Reference: ``common/small_imagenet.py`` lineage — either downsampled-ImageNet
npz archives (arrays 'data' [N, H*W*3] or [N,H,W,3] uint8 + 'labels') or a
folder of per-class subdirectories of JPEGs. Both paths yield NHWC float32
[-1,1] + int32 labels; the npz path keeps a uint8 store and assembles batches
through the native fused gather+normalize.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from .base import DataSource


class ImageNetNpz(DataSource):
    """Downsampled-ImageNet style npz (train_data_batch_*.npz or a single
    file with 'data' + 'labels')."""

    def __init__(self, path: str, batch_size: int = 64, image_size: int = 128,
                 seed: int = 0):
        files = sorted(glob.glob(os.path.join(path, "*.npz"))) \
            if os.path.isdir(path) else [path]
        if not files:
            raise FileNotFoundError(f"no npz files under {path}")
        xs, ys = [], []
        for f in files:
            d = np.load(f)
            x = d["data"]
            if x.ndim == 2:  # [N, H*W*3] row-major CHW like cifar
                x = x.reshape(-1, 3, image_size, image_size).transpose(0, 2, 3, 1)
            xs.append(np.ascontiguousarray(x, np.uint8))
            labels = d["labels"] if "labels" in d else d["label"]
            ys.append(np.asarray(labels, np.int32))
        self.images = np.concatenate(xs)
        # downsampled-ImageNet labels are 1-based
        self.labels = np.concatenate(ys)
        if self.labels.min() == 1:
            self.labels = self.labels - 1
        self.batch_size = batch_size
        self.seed = seed

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from . import native
        rng = np.random.default_rng(self.seed)
        n = len(self.images)
        while True:
            order = rng.permutation(n)
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                idx = order[i:i + self.batch_size]
                yield {"image": native.gather_normalize(self.images, idx),
                       "label": self.labels[idx]}


class ImageFolderFlat(DataSource):
    """Unlabeled folder of images (CelebA-HQ style) at a fixed resolution —
    the PGGAN real-data source (center-crop + resize on host; wrap with
    MultiResolution for the ladder)."""

    def __init__(self, path: str, batch_size: int = 16, image_size: int = 1024,
                 seed: int = 0):
        self.files = sorted(
            f for ext in ("*.jpg", "*.jpeg", "*.png")
            for f in glob.glob(os.path.join(path, ext)))
        if not self.files:
            raise FileNotFoundError(f"no images under {path}")
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed

    def _load(self, path: str) -> np.ndarray:
        from PIL import Image
        with Image.open(path) as im:
            im = im.convert("RGB")
            w, h = im.size
            s = min(w, h)
            im = im.crop(((w - s) // 2, (h - s) // 2,
                          (w + s) // 2, (h + s) // 2))
            im = im.resize((self.image_size,) * 2, Image.BILINEAR)
            return (np.asarray(im, np.float32) / 127.5) - 1.0

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        n = len(self.files)
        while True:
            order = rng.permutation(n)
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                yield {"image": np.stack(
                    [self._load(self.files[j])
                     for j in order[i:i + self.batch_size]])}


class ImageFolderByClass(DataSource):
    """Folder-of-class-subdirs JPEG loader (center-crop + resize to
    ``image_size``)."""

    def __init__(self, path: str, batch_size: int = 64, image_size: int = 128,
                 seed: int = 0):
        classes = sorted(d for d in os.listdir(path)
                         if os.path.isdir(os.path.join(path, d)))
        if not classes:
            raise FileNotFoundError(f"no class subdirectories under {path}")
        self.files: List[str] = []
        self.file_labels: List[int] = []
        for ci, c in enumerate(classes):
            for f in sorted(glob.glob(os.path.join(path, c, "*"))):
                if f.lower().endswith((".jpg", ".jpeg", ".png")):
                    self.files.append(f)
                    self.file_labels.append(ci)
        self.num_classes = len(classes)
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed

    def _load(self, path: str) -> np.ndarray:
        from PIL import Image
        with Image.open(path) as im:
            im = im.convert("RGB")
            w, h = im.size
            s = min(w, h)
            im = im.crop(((w - s) // 2, (h - s) // 2,
                          (w + s) // 2, (h + s) // 2))
            im = im.resize((self.image_size,) * 2, Image.BILINEAR)
            return (np.asarray(im, np.float32) / 127.5) - 1.0

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        n = len(self.files)
        labels = np.asarray(self.file_labels, np.int32)
        while True:
            order = rng.permutation(n)
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                idx = order[i:i + self.batch_size]
                yield {
                    "image": np.stack([self._load(self.files[j]) for j in idx]),
                    "label": labels[idx],
                }
