"""Prepacked uint8 memmap image store — the reference-scale real-data path.

The reference decodes JPEGs per batch on the host (queue runners /
feed_dict); on this single-core host that caps at ~10^2 img/s, two orders of
magnitude below what the measured TPU step rates consume (docs/PERF.md
"single-core host input-pipeline law"). The TPU-native answer is to pay the
decode cost ONCE (tools/prepack_dataset.py: folder/npz -> uint8 memmap store,
optionally a resolution pyramid for the PGGAN ladder) and make the per-step
path a fused native gather+normalize out of a page-cached memmap — the same
code path that feeds CIFAR-10 at 131.6k img/s.

Store layout (one directory):
  meta.json   {"n", "height", "width", "channels", "num_classes", ...}
  images.u8   raw [N, H, W, C] uint8, C-contiguous (np.memmap'd read-only)
  labels.npy  int32 [N] (absent for unlabeled/flat datasets)

A 60 GB ImageNet-128 store stays on disk: the process heap never holds the
dataset — batch assembly reads file-backed pages through the read-only
memmap (reclaimable page cache), copying only one batch at a time into
anonymous memory. ``tests/test_packed.py::test_streaming_heap_bound``
asserts this: a full streamed epoch over a store grows the heap
(``/proc/self/statm`` data segment) by ≪ the store size;
``tools/bench_loader.py --rss-demo`` measures the page-cache side.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Optional

import numpy as np

from .base import DataSource

META_NAME = "meta.json"


def is_packed_dir(path: str) -> bool:
    return os.path.isfile(os.path.join(path, META_NAME))


def write_store(out_dir: str, n: int, height: int, width: int,
                channels: int = 3, classes=None):
    """Create a store for incremental writing; returns (images_memmap,
    labels_array or None). Caller fills them then calls ``finalize_store``."""
    os.makedirs(out_dir, exist_ok=True)
    images = np.memmap(os.path.join(out_dir, "images.u8"), np.uint8, "w+",
                       shape=(n, height, width, channels))
    labels = None if classes is None else np.zeros((n,), np.int32)
    meta = {"n": n, "height": height, "width": width, "channels": channels,
            "num_classes": 0 if classes is None else len(classes),
            "classes": classes, "format": "ganpack-v1"}
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f)
    return images, labels


def finalize_store(out_dir: str, images: np.memmap,
                   labels: Optional[np.ndarray]) -> None:
    images.flush()
    if labels is not None:
        np.save(os.path.join(out_dir, "labels.npy"), labels)


class PackedImageStore(DataSource):
    """Shuffled infinite batches out of a prepacked store.

    Batch assembly = ONE native fused gather+normalize over the read-only
    memmap (uint8 -> float32 [-1,1]); indices are sorted within each batch so
    the page-cache access pattern is quasi-sequential (order within a shuffled
    training batch is irrelevant; label pairing is preserved).

    ``wire_dtype="uint8"`` skips the host-side normalize and yields raw uint8
    batches — 4x fewer bytes over the host->device link; the device side of
    the pipeline (``prefetch_to_device``) normalizes on-accelerator with the
    bit-identical formula. This is the streaming mode for stores too big for
    ``DeviceCachedStore`` on hosts with a slow device link (docs/PERF.md
    "host->device transfer law").
    """

    def __init__(self, path: str, batch_size: int = 64, seed: int = 0,
                 wire_dtype: str = "float32"):
        meta_path = os.path.join(path, META_NAME)
        if not os.path.isfile(meta_path):
            raise FileNotFoundError(f"not a packed store (no {META_NAME}): {path}")
        with open(meta_path) as f:
            self.meta = json.load(f)
        m = self.meta
        self.images = np.memmap(
            os.path.join(path, "images.u8"), np.uint8, "r",
            shape=(m["n"], m["height"], m["width"], m["channels"]))
        labels_path = os.path.join(path, "labels.npy")
        self.labels = np.load(labels_path) if os.path.exists(labels_path) else None
        self.num_classes = m.get("num_classes", 0)
        self.image_size = m["height"]
        if m["n"] < batch_size:
            # the infinite __iter__ would yield ZERO batches per epoch and
            # spin forever — fail loudly instead of hanging
            raise ValueError(
                f"store {path} holds {m['n']} images < batch_size "
                f"{batch_size}; shrink --batch-size or repack more images")
        self.batch_size = batch_size
        self.seed = seed
        self.path = path
        if wire_dtype not in ("float32", "uint8"):
            raise ValueError(f"wire_dtype must be float32|uint8, got {wire_dtype!r}")
        self.wire_dtype = wire_dtype

    def __len__(self) -> int:
        return int(self.meta["n"])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from . import native
        rng = np.random.default_rng(self.seed)
        n = len(self)
        u8 = self.wire_dtype == "uint8"
        while True:
            order = rng.permutation(n)
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                idx = np.sort(order[i:i + self.batch_size])
                out = {"image": (self.images[idx] if u8
                                 else native.gather_normalize(self.images, idx))}
                if self.labels is not None:
                    out["label"] = self.labels[idx]
                yield out


class PackedPairedStore(DataSource):
    """Shuffled infinite paired batches (pix2pix) out of a prepacked store.

    The store holds combined A|B images at ``scale_size`` per half
    (``tools/prepack_dataset.py --paired``); per step each example gets the
    reference's jitter — one shared random crop ``scale->image_size`` and
    horizontal flip applied to BOTH halves — via the native fused
    crop+flip+normalize, so the per-image PIL decode (the path that cannot
    feed the measured batch-32 step rate, docs/PERF.md) is paid once at
    prepack time.
    """

    def __init__(self, path: str, batch_size: int = 1, image_size: int = 256,
                 which_direction: str = "AtoB", flip: bool = True,
                 seed: int = 0):
        meta_path = os.path.join(path, META_NAME)
        if not os.path.isfile(meta_path):
            raise FileNotFoundError(f"not a packed store (no {META_NAME}): {path}")
        with open(meta_path) as f:
            self.meta = json.load(f)
        if not self.meta.get("paired"):
            raise ValueError(
                f"{path} is a single-image store; repack with --paired "
                "for pix2pix")
        m = self.meta
        self.scale = m["height"]
        if image_size > self.scale:
            raise ValueError(f"image_size {image_size} exceeds the store's "
                             f"scale_size {self.scale}; repack with a larger "
                             f"--scale-size")
        self.images = np.memmap(
            os.path.join(path, "images.u8"), np.uint8, "r",
            shape=(m["n"], m["height"], m["width"], m["channels"]))
        self.image_size = image_size
        self.which_direction = which_direction
        self.flip = flip
        if m["n"] < batch_size:
            # same loud failure as PackedImageStore: an epoch with zero
            # batches would make __iter__ spin forever
            raise ValueError(
                f"store {path} holds {m['n']} pairs < batch_size "
                f"{batch_size}; shrink --batch-size or repack more images")
        self.batch_size = batch_size
        self.seed = seed
        self.path = path

    def __len__(self) -> int:
        return int(self.meta["n"])

    def _offsets(self):
        """(input_x, target_x) base offsets into the combined row."""
        return (self.scale, 0) if self.which_direction == "BtoA" \
            else (0, self.scale)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from . import native
        rng = np.random.default_rng(self.seed)
        n, s, c = len(self), self.scale, self.image_size
        in_x, tg_x = self._offsets()
        while True:
            order = rng.permutation(n)
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                idx = np.sort(order[i:i + self.batch_size])
                # fresh batch buffers each yield (consumers queue/prefetch
                # them); the C kernel writes every crop straight into its
                # row — no per-image allocation, no stack copy
                ins = np.empty((self.batch_size, c, c, 3), np.float32)
                tgts = np.empty((self.batch_size, c, c, 3), np.float32)
                for k, j in enumerate(idx):
                    # the combined row is contiguous: the C kernel crops each
                    # half straight out of it via the x offset (no
                    # intermediate half copy — reads only the crop window)
                    row = np.asarray(self.images[int(j)])
                    oy, ox = (int(v) for v in rng.integers(0, s - c + 1, 2))
                    flip = bool(self.flip and rng.random() < 0.5)
                    native.crop_flip_normalize(row, oy, in_x + ox, c, flip,
                                               out=ins[k])
                    native.crop_flip_normalize(row, oy, tg_x + ox, c, flip,
                                               out=tgts[k])
                yield {"input": ins, "target": tgts}

    def eval_iter(self) -> Iterator[Dict[str, np.ndarray]]:
        """Deterministic test-mode pass: center crop, no flip, store order."""
        from . import native
        s, c = self.scale, self.image_size
        o = (s - c) // 2
        in_x, tg_x = self._offsets()
        for j in range(len(self)):
            row = np.asarray(self.images[j])
            yield {"input": native.crop_flip_normalize(
                       row, o, in_x + o, c, False)[None],
                   "target": native.crop_flip_normalize(
                       row, o, tg_x + o, c, False)[None],
                   "name": f"{j:05d}"}


def resolve_pyramid_dir(path: str, resolution: int) -> str:
    """Resolve the store directory for ``resolution``: the
    ``r{resolution:04d}/`` member of a pyramid store written by
    ``tools/prepack_dataset.py --resolutions``, or ``path`` itself when it is
    a single-resolution store of the right size. Fails loudly otherwise."""
    sub = os.path.join(path, f"r{resolution:04d}")
    if is_packed_dir(sub):
        return sub
    if is_packed_dir(path):
        with open(os.path.join(path, META_NAME)) as f:
            height = json.load(f)["height"]
        if height != resolution:
            raise ValueError(
                f"store {path} is {height}px, wanted {resolution}px "
                f"and no r{resolution:04d}/ member exists")
        return path
    raise FileNotFoundError(f"no packed store at {path} (or {sub})")


def open_pyramid(path: str, batch_size: int, resolution: int,
                 seed: int = 0) -> PackedImageStore:
    """Open the pyramid member (or matching single store) at ``resolution``."""
    return PackedImageStore(resolve_pyramid_dir(path, resolution),
                            batch_size=batch_size, seed=seed)
