"""CIFAR-10 loader.

Reference: ``common/cifar10.py`` — unpickles ``cifar-10-batches-py``, yields an
infinite shuffled stream of (images, labels), images scaled to [-1, 1] at the
edge. Same here, as a host numpy iterator (epoch reshuffle by seed), NHWC.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, Optional

import numpy as np

from .base import DataSource

_SEARCH_PATHS = (
    "data/cifar-10-batches-py",
    "/root/data/cifar-10-batches-py",
    "/data/cifar-10-batches-py",
)


def find_cifar10(data_dir: Optional[str] = None) -> Optional[str]:
    candidates = ([data_dir] if data_dir else []) + [
        os.environ.get("GANTPU_DATA_DIR", ""), *_SEARCH_PATHS]
    for c in candidates:
        if c and os.path.isfile(os.path.join(c, "data_batch_1")):
            return c
    return None


class Cifar10(DataSource):
    def __init__(self, batch_size: int = 64, data_dir: Optional[str] = None,
                 split: str = "train", seed: int = 0):
        path = find_cifar10(data_dir)
        if path is None:
            raise FileNotFoundError(
                "cifar-10-batches-py not found (set GANTPU_DATA_DIR or pass "
                "data_dir); use data.FakeImages for synthetic data")
        files = ([f"data_batch_{i}" for i in range(1, 6)]
                 if split == "train" else ["test_batch"])
        images, labels = [], []
        for f in files:
            with open(os.path.join(path, f), "rb") as fh:
                d = pickle.load(fh, encoding="bytes")
            images.append(d[b"data"])
            labels.append(np.asarray(d[b"labels"]))
        x = np.concatenate(images).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        # Keep the store uint8 (150MB instead of 600MB float32); batches are
        # gathered + normalized to [-1, 1] in one fused native pass.
        self.images = np.ascontiguousarray(x)
        self.labels = np.concatenate(labels).astype(np.int32)
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
