"""Device-resident packed store: the dataset lives in HBM, steps ship indices.

Round-4 measurement (docs/PERF.md "host->device transfer law"): the true
host->device bandwidth through the tunneled axon backend is ~35-40 MB/s, so
streaming the fused ImageNet-128 step's [5, 64, 128, 128, 3] float32 batch
stack (63 MB) costs ~1.6 s/step against a 148 ms step — the pipeline is
wire-bound at 9% utilization no matter how fast the host loader is. (On
directly-attached TPU hosts the wire is PCIe at tens of GB/s and streaming
is fine; the law still caps any deployment whose hosts feed chips over slow
links.)

The TPU-native answer for every store that fits in HBM: upload the uint8
store ONCE (~24 s for 1 GB through the tunnel), then per step send only the
``[n_micro, batch]`` int32 index array (~1 KB) and run a jitted fused
gather+normalize ON DEVICE. The per-step wire cost drops from O(batch bytes)
to O(batch indices); batch assembly rides HBM bandwidth (~800 GB/s) instead
of the host link.

Normalization matches ``native.gather_normalize`` bit-for-bit
(``u8 * (1/127.5) - 1`` in float32), so a cached run and a streamed run see
identical batches given identical indices (tested:
``tests/test_device_cache.py``).

Under a mesh the store is replicated (every chip holds the dataset — the
cache is only offered for stores that fit comfortably) and the gathered
batch is constrained batch-sharded over 'data' exactly like
``DeviceFakeImages``, so multi-chip recipes run unchanged.

The index stream is epoch-shuffled like ``PackedImageStore`` and
COUNTER-based like ``DeviceFakeImages``: step k's indices are a pure
function of (seed, k) — one ``default_rng((seed, epoch))`` permutation per
epoch, regenerated on demand — so ``set_stream_position`` makes
checkpoint-resume batch streams exactly match an uninterrupted run.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .packed import META_NAME, PackedImageStore

#: default HBM budget for the auto policy — big enough for CIFAR-scale and
#: demo ImageNet stores, small enough to leave a 16 GB chip room for the
#: ImageNet-128 training step's activations (peak 957 MB) plus headroom
DEFAULT_CACHE_BYTES = 2 * 2**30


def packed_training_source(path: str, batch_size: int, n_micro: int = 1,
                           seed: int = 0, mesh=None, spatial_axis=None,
                           policy: str = "auto",
                           budget_bytes: int = DEFAULT_CACHE_BYTES):
    """Pick the right way to feed a packed store to the train loop.

    - ``auto`` (default): ``DeviceCachedStore`` when the store fits the HBM
      budget — per-step wire cost collapses to the index array; otherwise
      stream with ``wire_dtype="uint8"`` (4x fewer bytes on the link, the
      normalize runs on device in ``prefetch_to_device``).
    - ``on``: device cache unconditionally (fails loudly above the budget so
      an OOM surfaces as a sized, actionable error).
    - ``off``: always stream (uint8 wire).
    """
    if policy not in ("auto", "on", "off"):
        raise ValueError(f"device-cache policy must be auto|on|off, got {policy!r}")
    if policy != "off":
        with open(os.path.join(path, META_NAME)) as f:
            m = json.load(f)
        nbytes = m["n"] * m["height"] * m["width"] * m["channels"]
        if policy == "on" or nbytes <= budget_bytes:
            # max_bytes passed in BOTH policies: the constructor (which
            # counts images+labels) is the single budget authority; the
            # meta-only pre-check above merely picks cache-vs-stream
            # (ADVICE r4: the two size checks must not drift)
            return DeviceCachedStore(
                path, batch_size=batch_size, n_micro=n_micro, seed=seed,
                mesh=mesh, spatial_axis=spatial_axis, max_bytes=budget_bytes)
        print(f"note: packed store {path} is {nbytes / 2**30:.2f} GiB > "
              f"device-cache budget {budget_bytes / 2**30:.2f} GiB; "
              "streaming with uint8 wire", flush=True)
    from .pipeline import ThreadedSource
    return ThreadedSource(
        PackedImageStore(path, batch_size=batch_size, seed=seed,
                         wire_dtype="uint8"),
        num_workers=1)


def _epoch_permutation(store, epoch: int) -> np.ndarray:
    """Memoized per-epoch shuffle: the permutation is a pure function of
    (seed, epoch), so regenerating the full O(n) shuffle on EVERY step (as
    the first cut did — hundreds of thousands of entries per step for
    near-budget stores, ADVICE r4) buys nothing; one copy per epoch is
    cached on the instance and resume determinism is untouched."""
    cached = getattr(store, "_perm_cache", None)
    if cached is None or cached[0] != epoch:
        order = np.random.default_rng((store.seed, epoch)).permutation(store.n)
        store._perm_cache = (epoch, order)
        return order
    return cached[1]


class DeviceCachedStore:
    """Infinite [n_micro, B, ...] device-resident batches out of a packed
    store held in HBM. ``yields_stacks`` protocol: the train loop consumes
    batches directly, no host prefetch/transfer in the step path."""

    yields_stacks = True  # already [n_micro, B, ...] and device-resident

    def __init__(self, path: Optional[str] = None, batch_size: int = 64,
                 n_micro: int = 1, seed: int = 0, mesh=None,
                 spatial_axis=None, max_bytes: Optional[int] = None,
                 images: Optional[np.ndarray] = None,
                 labels: Optional[np.ndarray] = None, num_classes: int = 0):
        import jax
        import jax.numpy as jnp

        if path is not None:
            store = PackedImageStore(path, batch_size=batch_size, seed=seed)
            images = np.asarray(store.images)  # materialize memmap pages once
            labels = store.labels
            num_classes = store.num_classes
            self.meta = store.meta
        elif images is None:
            raise ValueError("need a packed-store path or an images array")
        elif images.dtype != np.uint8 or images.ndim != 4:
            raise ValueError(f"images must be [N,H,W,C] uint8, got "
                             f"{images.dtype} {images.shape}")
        self.num_classes = num_classes
        self.image_size = images.shape[1]
        self.path = path
        nbytes = images.nbytes + (0 if labels is None else labels.nbytes)
        if max_bytes is not None and nbytes > max_bytes:
            raise ValueError(
                f"store {path or '<arrays>'} is {nbytes / 2**30:.2f} GiB > "
                f"device-cache budget {max_bytes / 2**30:.2f} GiB; stream it "
                "instead (--device-cache off, or raise --device-cache-gb)")
        take = n_micro * batch_size
        if len(images) < take:
            raise ValueError(
                f"store {path or '<arrays>'} holds {len(images)} images < "
                f"one fused-step stack of n_micro*batch = {take}; shrink "
                "--batch-size or repack more images")
        self.batch_size = batch_size
        self.n_micro = n_micro
        self.seed = seed
        self.n = len(images)
        self._steps_per_epoch = self.n // take

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            replicated = NamedSharding(mesh, P())
            put = lambda a: jax.device_put(a, replicated)
        else:
            put = jax.device_put
        self._images = put(images)
        self._labels = (None if labels is None
                        else put(labels.astype(np.int32)))

        def gather(images, labels, idx):
            img = images[idx]  # [n_micro, B, H, W, C] uint8 HBM gather
            out = {"image": img.astype(jnp.float32) * (1.0 / 127.5) - 1.0}
            if labels is not None:
                out["label"] = labels[idx]
            return out

        if mesh is not None:
            from .fake import _stack_shardings
            dims = {"image": 5}
            if self._labels is not None:
                dims["label"] = 2
            self._gather = jax.jit(
                gather, out_shardings=_stack_shardings(
                    mesh, dims, spatial_axis=spatial_axis),
                static_argnames=())
        else:
            self._gather = jax.jit(gather)
        self._pos = 0

    def __len__(self) -> int:
        return self.n

    def nbytes_resident(self) -> int:
        return int(self._images.nbytes
                   + (0 if self._labels is None else self._labels.nbytes))

    def set_stream_position(self, pos: int) -> None:
        """Prime the counter-based stream (train loop calls this with the
        resumed step so post-resume batches match an uninterrupted run)."""
        self._pos = int(pos)

    def indices_for(self, pos: int) -> np.ndarray:
        """Epoch-shuffled [n_micro, batch] int32 indices for step ``pos`` —
        a pure function of (seed, pos): O(1) seek for resume."""
        take = self.n_micro * self.batch_size
        epoch, off = divmod(pos, self._steps_per_epoch)
        order = _epoch_permutation(self, epoch)
        sl = order[off * take:(off + 1) * take]
        return sl.reshape(self.n_micro, self.batch_size).astype(np.int32)

    def __iter__(self):
        # stream position lives on the INSTANCE (see DeviceFakeImages): a
        # second iter() or a post-resume iter() continues, not replays
        while True:
            idx = self.indices_for(self._pos)
            self._pos += 1
            yield self._gather(self._images, self._labels, idx)

    def sequential_batches(self, batch_size: int, n_batches: int):
        """Normalized [B, H, W, C] float batches gathered from the RESIDENT
        store (unshuffled, first ``n_batches * batch_size`` images) — for
        one-shot eval passes like real FID moments. Reusing the training
        store's HBM buffer avoids uploading a second replica of the whole
        dataset through the (slow) host link just to read it once
        (ADVICE r4: train_sngan's eval path held two copies for the run's
        lifetime). Does not advance the training stream position."""
        if n_batches * batch_size > self.n:
            raise ValueError(
                f"sequential_batches({batch_size}, {n_batches}) needs "
                f"{n_batches * batch_size} images but the store holds {self.n}")
        for i in range(n_batches):
            idx = np.arange(i * batch_size, (i + 1) * batch_size,
                            dtype=np.int32).reshape(1, batch_size)
            yield self._gather(self._images, self._labels, idx)["image"][0]


def packed_paired_training_source(path: str, batch_size: int,
                                  image_size: int = 256,
                                  which_direction: str = "AtoB",
                                  flip: bool = True, n_micro: int = 1,
                                  seed: int = 0, mesh=None,
                                  policy: str = "auto",
                                  budget_bytes: int = DEFAULT_CACHE_BYTES):
    """Paired twin of ``packed_training_source`` (pix2pix train mode).

    Streaming fallback keeps the host-side jitter+normalize (the per-example
    random crop makes a uint8 wire mode pointless — the cache IS the device
    version of that jitter).
    """
    if policy not in ("auto", "on", "off"):
        raise ValueError(f"device-cache policy must be auto|on|off, got {policy!r}")
    if policy != "off":
        with open(os.path.join(path, META_NAME)) as f:
            m = json.load(f)
        nbytes = m["n"] * m["height"] * m["width"] * m["channels"]
        if policy == "on" or nbytes <= budget_bytes:
            return DeviceCachedPairedStore(
                path, batch_size=batch_size, image_size=image_size,
                which_direction=which_direction, flip=flip, n_micro=n_micro,
                seed=seed, mesh=mesh, max_bytes=budget_bytes)
        print(f"note: paired store {path} is {nbytes / 2**30:.2f} GiB > "
              f"device-cache budget {budget_bytes / 2**30:.2f} GiB; "
              "streaming with host jitter", flush=True)
    from .packed import PackedPairedStore
    from .pipeline import ThreadedSource
    return ThreadedSource(
        PackedPairedStore(path, batch_size=batch_size,
                          image_size=image_size,
                          which_direction=which_direction, flip=flip,
                          seed=seed),
        num_workers=1)


class DeviceCachedPairedStore:
    """pix2pix twin of ``DeviceCachedStore``: the combined A|B uint8 rows
    live in HBM; per step the host ships indices + crop offsets + flip bits
    (a few KB) and a jitted kernel does the reference's per-example jitter —
    shared random crop ``scale->image_size`` and horizontal flip applied to
    BOTH halves — plus normalize, ON DEVICE.

    Value-identical to ``PackedPairedStore``'s host path given the same
    (index, oy, ox, flip) controls (tested against
    ``native.crop_flip_normalize``); the control stream itself is
    counter-based — a pure function of (seed, position) — so resume matches
    an uninterrupted run.
    """

    yields_stacks = True

    def __init__(self, path: str, batch_size: int = 1, image_size: int = 256,
                 which_direction: str = "AtoB", flip: bool = True,
                 n_micro: int = 1, seed: int = 0, mesh=None,
                 max_bytes: Optional[int] = None):
        import jax
        import jax.numpy as jnp
        from .packed import PackedPairedStore

        host = PackedPairedStore(path, batch_size=batch_size,
                                 image_size=image_size,
                                 which_direction=which_direction, flip=flip,
                                 seed=seed)
        if max_bytes is not None and host.images.nbytes > max_bytes:
            raise ValueError(
                f"store {path} is {host.images.nbytes / 2**30:.2f} GiB > "
                f"device-cache budget {max_bytes / 2**30:.2f} GiB; stream it "
                "instead (--device-cache off, or raise --device-cache-gb)")
        take = n_micro * batch_size
        if len(host) < take:
            raise ValueError(
                f"store {path} holds {len(host)} pairs < one fused-step "
                f"stack of n_micro*batch = {take}")
        self.meta = host.meta
        self.image_size = image_size
        self.scale = host.scale
        self.flip = flip
        self.batch_size = batch_size
        self.n_micro = n_micro
        self.seed = seed
        self.path = path
        self.n = len(host)
        self._steps_per_epoch = self.n // take
        in_x, tg_x = host._offsets()

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            put = lambda a: jax.device_put(a, NamedSharding(mesh, P()))
        else:
            put = jax.device_put
        self._rows = put(np.asarray(host.images))  # [N, s, 2s, 3] uint8

        c = image_size

        def one(rows, i, y, x0, f):
            a = jax.lax.dynamic_slice(rows, (i, y, in_x + x0, 0),
                                      (1, c, c, 3))[0]
            b = jax.lax.dynamic_slice(rows, (i, y, tg_x + x0, 0),
                                      (1, c, c, 3))[0]
            a = jnp.where(f, a[:, ::-1, :], a)
            b = jnp.where(f, b[:, ::-1, :], b)
            return a, b

        def gather(rows, idx, oy, ox, fl):
            a, b = jax.vmap(one, in_axes=(None, 0, 0, 0, 0))(
                rows, idx, oy, ox, fl)
            norm = lambda x: (x.astype(jnp.float32) * (1.0 / 127.5) - 1.0
                              ).reshape(n_micro, batch_size, c, c, 3)
            return {"input": norm(a), "target": norm(b)}

        if mesh is not None:
            from .fake import _stack_shardings
            self._gather = jax.jit(gather, out_shardings=_stack_shardings(
                mesh, {"input": 5, "target": 5}))
        else:
            self._gather = jax.jit(gather)
        self._pos = 0

    def __len__(self) -> int:
        return self.n

    def set_stream_position(self, pos: int) -> None:
        self._pos = int(pos)

    def controls_for(self, pos: int):
        """(idx, oy, ox, flip) for step ``pos`` — pure in (seed, pos)."""
        take = self.n_micro * self.batch_size
        epoch, off = divmod(pos, self._steps_per_epoch)
        order = _epoch_permutation(self, epoch)
        idx = order[off * take:(off + 1) * take].astype(np.int32)
        jr = np.random.default_rng((self.seed, pos, 1))
        span = self.scale - self.image_size + 1
        oy, ox = jr.integers(0, span, (2, take)).astype(np.int32)
        fl = (jr.random(take) < 0.5) if self.flip else np.zeros(take, bool)
        return idx, oy, ox, fl

    def __iter__(self):
        while True:
            idx, oy, ox, fl = self.controls_for(self._pos)
            self._pos += 1
            yield self._gather(self._rows, idx, oy, ox, fl)
