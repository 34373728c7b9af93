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


_MAX_CLASS_TABLE = 1024


def _class_table(num_classes: int):
    """Per-class (cx, cy, color, sigma) lookup, deterministic in the class id."""
    g = np.random.default_rng(7919)
    n = min(num_classes, _MAX_CLASS_TABLE)
    cxy = g.uniform(0.25, 0.75, (n, 2)).astype(np.float32)
    color = g.uniform(-1, 1, (n, 3)).astype(np.float32)
    sigma = (0.08 + 0.04 * (np.arange(n) % 5)).astype(np.float32)
    return cxy, color, sigma


def _blob_images(rng: np.random.Generator, labels: np.ndarray, size: int,
                 num_classes: int) -> np.ndarray:
    """Class-dependent colored gaussian blobs + low noise, NHWC in [-1, 1].

    Fully vectorized over the batch — the loader must outrun an ~18ms fused
    TPU step, so no per-sample Python loops. The class table is sized by
    ``num_classes`` so class k's appearance is stable across batches (and
    matches DeviceFakeImages)."""
    n = labels.shape[0]
    cxy, color, sigma = _class_table(num_classes)
    lab = labels % len(sigma)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / max(size - 1, 1)
    cx = cxy[lab, 0][:, None, None]
    cy = cxy[lab, 1][:, None, None]
    sg = sigma[lab][:, None, None]
    jit = rng.uniform(-0.08, 0.08, (n, 2)).astype(np.float32)
    d1 = (xx[None] - cx) ** 2 + (yy[None] - cy) ** 2
    d2 = ((xx[None] - cx - jit[:, 0, None, None]) ** 2
          + (yy[None] - cy - jit[:, 1, None, None]) ** 2)
    inv = -1.0 / (2 * sg**2)
    blob = 0.5 * (np.exp(d1 * inv) + np.exp(d2 * inv))
    img = blob[..., None] * color[lab][:, None, None, :]
    img += 0.05 * rng.standard_normal(img.shape, dtype=np.float32)
    return np.clip(img, -1, 1, out=img)


_RICH_BLOBS = 3


def _compose_rich(xp, xx, yy, lab_color, centers, sigmas, weights, colors,
                  bg_color, bg_dir, noise):
    """Deterministic renderer shared by the host (numpy) and device (jnp)
    twins of the 'rich' synthetic style: K anisotropic gaussian blobs with
    continuous random centers/sizes/weights/colors + an oriented background
    gradient + noise. Blob 0's color is tinted toward the class color so
    conditional models still get label signal. Leading dims of the param
    arrays are arbitrary batch dims; xx/yy are (H, W) grids in [0, 1].

    Unlike the single class-pinned blob of the default style, every factor
    varies continuously per sample — the distribution has enough intrinsic
    entropy that a discriminator cannot trivially separate real from fake,
    which is what long-horizon GAN soak runs need (a 10-point distribution
    lets D win outright and the minimax race diverges; observed, see
    BASELINE.md round-2 notes)."""
    colors = xp.concatenate(
        [(0.5 * lab_color + 0.5 * colors[..., 0, :])[..., None, :],
         colors[..., 1:, :]], axis=-2)
    img = (bg_color[..., None, None, :]
           * (bg_dir[..., 0, None, None] * (xx - 0.5)
              + bg_dir[..., 1, None, None] * (yy - 0.5))[..., None])
    for k in range(_RICH_BLOBS):
        cx = centers[..., k, 0][..., None, None]
        cy = centers[..., k, 1][..., None, None]
        sx = sigmas[..., k, 0][..., None, None]
        sy = sigmas[..., k, 1][..., None, None]
        g = xp.exp(-((xx - cx) ** 2 / (2 * sx**2)
                     + (yy - cy) ** 2 / (2 * sy**2)))
        img = img + (weights[..., k][..., None, None, None]
                     * g[..., None] * colors[..., k, :][..., None, None, :])
    return xp.clip(img + noise, -1, 1)


def _rich_images_np(rng: np.random.Generator, labels: np.ndarray, size: int,
                    num_classes: int) -> np.ndarray:
    n = labels.shape[0]
    _, class_color, _ = _class_table(num_classes)
    lab_color = class_color[labels % len(class_color)]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / max(size - 1, 1)
    K = _RICH_BLOBS
    u = lambda lo, hi, shape: rng.uniform(lo, hi, shape).astype(np.float32)
    return _compose_rich(
        np, xx[None], yy[None], lab_color,
        centers=u(0.15, 0.85, (n, K, 2)), sigmas=u(0.05, 0.16, (n, K, 2)),
        weights=u(0.3, 1.0, (n, K)), colors=u(-1, 1, (n, K, 3)),
        bg_color=u(-0.4, 0.4, (n, 3)), bg_dir=u(-1, 1, (n, 2)),
        noise=0.05 * rng.standard_normal((n, size, size, 3)).astype(np.float32))


class FakeImages(DataSource):
    """Synthetic class-conditional image source (CIFAR-10/ImageNet stand-in).

    ``style='blobs'`` (default): one class-pinned gaussian blob — maximal
    label signal, ideal for classifier/conditioning smoke tests.
    ``style='rich'``: continuously-varying multi-blob compositions — a
    non-degenerate distribution a GAN can race on for long horizons."""

    def __init__(self, batch_size: int = 64, image_size: int = 32,
                 num_classes: int = 10, seed: int = 0, style: str = "blobs"):
        if style not in ("blobs", "rich"):
            raise ValueError(f"unknown synthetic style {style!r}")
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_classes = num_classes
        self.seed = seed
        self.style = style

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        render = (_rich_images_np if self.style == "rich" else _blob_images)
        while True:
            labels = rng.integers(0, self.num_classes, self.batch_size).astype(np.int32)
            yield {
                "image": render(rng, labels, self.image_size,
                                self.num_classes),
                "label": labels,
            }


def _stack_shardings(mesh, shapes_dict, spatial_axis=None):
    """out_shardings for a [n_micro, B, ...] batch dict: batch dim (axis 1)
    over 'data', optionally image height (axis 2 of 5-d entries) over
    ``spatial_axis`` (PGGAN SP levels), everything else replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    out = {}
    for k, nd in shapes_dict.items():
        rest = [None] * (nd - 2)
        if spatial_axis is not None and nd == 5:
            rest[0] = spatial_axis
        out[k] = NamedSharding(mesh, P(None, "data", *rest))
    return out


class DeviceFakeImages:
    """On-device synthetic twin of FakeImages: the whole batch is generated by
    a jitted function on the accelerator, so the input pipeline costs ~0 host
    time (used by bench/smoke paths where the loader must never be the
    bottleneck). Yields device arrays; ``prefetch_to_device`` passes them
    through untouched.

    ``mesh=...`` makes generation mesh-native: the jitted generator's outputs
    are constrained batch-sharded over the 'data' axis, so each chip renders
    only its shard (partitionable threefry keeps the stream identical to the
    single-device one). This is what lets the documented long-run recipes run
    unchanged on a v5e-8 (VERDICT r2 item #4).

    The RNG stream is COUNTER-based: batch k is ``gen(fold_in(key, k))``, and
    the position survives both re-iteration and checkpoint resume — the train
    loop primes ``set_stream_position(step)`` on start, so a resumed run sees
    exactly the batches the uninterrupted run would have (VERDICT r2 item #8).
    """

    yields_stacks = True  # already [n_micro, B, ...] and device-resident

    def __init__(self, batch_size: int = 64, image_size: int = 32,
                 num_classes: int = 10, seed: int = 0, n_micro: int = 1,
                 style: str = "blobs", mesh=None, spatial_axis=None):
        import jax
        import jax.numpy as jnp

        if style not in ("blobs", "rich"):
            raise ValueError(f"unknown synthetic style {style!r}")
        if mesh is not None and batch_size % mesh.shape["data"]:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"data-mesh size {mesh.shape['data']}")
        self.batch_size = batch_size
        cxy, color, sigma = _class_table(num_classes)
        cxy, color, sigma = jnp.asarray(cxy), jnp.asarray(color), jnp.asarray(sigma)
        s = image_size
        grid = jnp.mgrid[0:s, 0:s].astype(jnp.float32) / max(s - 1, 1)
        yy, xx = grid[0], grid[1]
        n_table = len(sigma)

        def gen_blobs(rng):
            rng_l, rng_j, rng_n = jax.random.split(rng, 3)
            shape = (n_micro, batch_size)
            lab = jax.random.randint(rng_l, shape, 0, num_classes) % n_table
            cx = cxy[lab, 0][..., None, None]
            cy = cxy[lab, 1][..., None, None]
            sg = sigma[lab][..., None, None]
            jit = jax.random.uniform(rng_j, shape + (2,), minval=-0.08, maxval=0.08)
            d1 = (xx - cx) ** 2 + (yy - cy) ** 2
            d2 = ((xx - cx - jit[..., 0, None, None]) ** 2
                  + (yy - cy - jit[..., 1, None, None]) ** 2)
            inv = -1.0 / (2 * sg**2)
            blob = 0.5 * (jnp.exp(d1 * inv) + jnp.exp(d2 * inv))
            img = blob[..., None] * color[lab][..., None, None, :]
            img = img + 0.05 * jax.random.normal(rng_n, img.shape)
            return {"image": jnp.clip(img, -1, 1),
                    "label": lab.astype(jnp.int32)}

        def gen_rich(rng):
            ks = jax.random.split(rng, 8)
            shape = (n_micro, batch_size)
            K = _RICH_BLOBS
            lab = jax.random.randint(ks[0], shape, 0, num_classes) % n_table
            u = lambda k, lo, hi, sh: jax.random.uniform(
                k, shape + sh, minval=lo, maxval=hi)
            img = _compose_rich(
                jnp, xx, yy, color[lab],
                centers=u(ks[1], 0.15, 0.85, (K, 2)),
                sigmas=u(ks[2], 0.05, 0.16, (K, 2)),
                weights=u(ks[3], 0.3, 1.0, (K,)),
                colors=u(ks[4], -1, 1, (K, 3)),
                bg_color=u(ks[5], -0.4, 0.4, (3,)),
                bg_dir=u(ks[6], -1, 1, (2,)),
                noise=0.05 * jax.random.normal(ks[7], shape + (s, s, 3)))
            return {"image": img, "label": lab.astype(jnp.int32)}

        gen = gen_rich if style == "rich" else gen_blobs
        if mesh is not None:
            out_sh = _stack_shardings(mesh, {"image": 5, "label": 2},
                                      spatial_axis=spatial_axis)
            self._gen = jax.jit(gen, out_shardings=out_sh)
        else:
            self._gen = jax.jit(gen)
        self._key = jax.random.PRNGKey(seed)
        self._pos = 0

    def set_stream_position(self, pos: int) -> None:
        """Prime the counter-based stream (train loop calls this with the
        resumed step so post-resume batches match an uninterrupted run)."""
        self._pos = int(pos)

    def __iter__(self):
        # The stream position lives on the INSTANCE, not the iterator: a
        # second iter() (or an iter() after checkpoint-resume priming)
        # continues the stream instead of replaying batch 0.
        import jax
        while True:
            sub = jax.random.fold_in(self._key, self._pos)
            self._pos += 1
            yield self._gen(sub)


class FakePairedImages(DataSource):
    """Synthetic (input, target) pairs: target = colored shapes, input = its
    'edges' (gradient magnitude) — a procedural edges2shoes stand-in.

    ``deterministic_color=True`` makes each circle's color a fixed function of
    its geometry (position + radius), so the target is fully *predictable*
    from the edge input. With the default (random colors) the color channel is
    irreducible noise and the L1-optimal translator regresses colors to the
    mean — correct behavior, but it makes convergence artifacts look gray.
    The deterministic variant lets a trained pix2pix demonstrate true
    colorization (the geometry IS visible in the edges)."""

    def __init__(self, batch_size: int = 1, image_size: int = 256, seed: int = 0,
                 deterministic_color: bool = False):
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed
        self.deterministic_color = deterministic_color

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
                    if self.deterministic_color:
                        # color := geometry (smooth, full-range): the edge map
                        # determines it, so the translator can learn it
                        color = np.array([2 * cx - 1, 2 * cy - 1,
                                          (r - 0.05) / 0.15 * 2 - 1], np.float32)
                    else:
                        color = rng.uniform(-1, 1, 3)
                    img[mask] = color
                tgt[i] = img
            gx = np.abs(np.diff(tgt, axis=2, prepend=tgt[:, :, :1])).sum(-1, keepdims=True)
            gy = np.abs(np.diff(tgt, axis=1, prepend=tgt[:, :1])).sum(-1, keepdims=True)
            edges = np.clip((gx + gy), 0, 1) * 2 - 1
            inp = np.repeat(edges, 3, axis=-1).astype(np.float32)
            yield {"input": inp, "target": tgt}


class DeviceFakePairedImages:
    """On-device twin of ``FakePairedImages``: circle rasterization + edge
    extraction jitted on the accelerator — zero host CPU per batch.

    This host has a SINGLE core (measured: the numpy renderer costs
    ~24 ms/batch uncontended and collapses to 300+ ms under any concurrent
    load; threads cannot help on one core), so long pix2pix synthetic runs
    must generate on device exactly like ``DeviceFakeImages`` does for the
    class-conditional models. Same geometry/color math as the host twin
    (distribution twins, not bitwise — different RNG streams).

    Yields ``{"input", "target"}`` stacked ``[n_micro, B, H, W, 3]``.
    """

    yields_stacks = True

    def __init__(self, batch_size: int = 1, image_size: int = 256,
                 seed: int = 0, n_micro: int = 1,
                 deterministic_color: bool = False, mesh=None):
        import jax
        import jax.numpy as jnp

        if mesh is not None and batch_size % mesh.shape["data"]:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"data-mesh size {mesh.shape['data']}")
        s = image_size
        grid = jnp.mgrid[0:s, 0:s].astype(jnp.float32) / max(s - 1, 1)
        yy, xx = grid[0], grid[1]
        self.batch_size = batch_size

        def gen(rng):
            shape = (n_micro, batch_size)
            k_geo, k_col = jax.random.split(rng)
            cxy = jax.random.uniform(k_geo, shape + (4, 2), minval=0.2, maxval=0.8)
            r = jax.random.uniform(jax.random.fold_in(k_geo, 1), shape + (4,),
                                   minval=0.05, maxval=0.2)
            if deterministic_color:
                color = jnp.stack([2 * cxy[..., 0] - 1, 2 * cxy[..., 1] - 1,
                                   (r - 0.05) / 0.15 * 2 - 1], axis=-1)
            else:
                color = jax.random.uniform(k_col, shape + (4, 3), minval=-1, maxval=1)
            tgt = jnp.full(shape + (s, s, 3), -1.0, jnp.float32)
            for k in range(4):  # sequential paint: later circles overwrite
                mask = ((xx - cxy[..., k, 0][..., None, None]) ** 2
                        + (yy - cxy[..., k, 1][..., None, None]) ** 2
                        ) < (r[..., k][..., None, None] ** 2)
                tgt = jnp.where(mask[..., None], color[..., k, :][..., None, None, :], tgt)
            gx = jnp.abs(jnp.diff(tgt, axis=-2, prepend=tgt[..., :, :1, :])).sum(-1)
            gy = jnp.abs(jnp.diff(tgt, axis=-3, prepend=tgt[..., :1, :, :])).sum(-1)
            edges = jnp.clip(gx + gy, 0, 1) * 2 - 1
            inp = jnp.repeat(edges[..., None], 3, axis=-1)
            return {"input": inp, "target": tgt}

        if mesh is not None:
            out_sh = _stack_shardings(mesh, {"input": 5, "target": 5})
            self._gen = jax.jit(gen, out_shardings=out_sh)
        else:
            self._gen = jax.jit(gen)
        self._key = jax.random.PRNGKey(seed)
        self._pos = 0

    def set_stream_position(self, pos: int) -> None:
        self._pos = int(pos)

    def __iter__(self):
        # instance-level counter-based stream — see DeviceFakeImages
        import jax
        while True:
            sub = jax.random.fold_in(self._key, self._pos)
            self._pos += 1
            yield self._gen(sub)
