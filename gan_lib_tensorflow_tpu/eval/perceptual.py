"""PGGAN evaluation metrics: MS-SSIM and Sliced Wasserstein Distance (SWD).

The reference's PGGAN lineage (Karras et al. 2018, progressive growing)
evaluates with (a) SWD between laplacian-pyramid patch distributions of real
vs generated images and (b) MS-SSIM between random pairs of generated images
(diversity: lower = more diverse). [RECON] expected reference path
``PGGAN/``; SURVEY.md §6 PGGAN row ("qualitative + SWD").

TPU-native: every stage — pyramid construction (depthwise convs), patch
descriptor gather, random projections (one MXU matmul), per-direction sorts,
and the MS-SSIM window statistics — is jax and jit-friendly; only the final
scalars come to host. Patch descriptors at Karras scale are 16,384 images x
128 descriptors x 7x7x3 per level per side, so they are stored in fp16
(~616 MB/level/side), each level is normalized+scored+freed before the next,
and the projection+sort runs in direction chunks (``lax.map``) over the
pooled device array, bounding peak memory at the fp16 store plus one level
in flight.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- pyramids

_GAUSS5 = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float32) / 256.0


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 5x5 gaussian, SAME, NHWC."""
    c = x.shape[-1]
    k = jnp.broadcast_to(jnp.asarray(_GAUSS5)[:, :, None, None], (5, 5, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _downsample(x: jnp.ndarray) -> jnp.ndarray:
    return _blur(x)[:, ::2, ::2, :]


def _upsample(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    up = jnp.zeros((n, 2 * h, 2 * w, c), x.dtype).at[:, ::2, ::2, :].set(x)
    return _blur(up) * 4.0


def laplacian_pyramid(x: jnp.ndarray, n_levels: int) -> List[jnp.ndarray]:
    """Standard laplacian pyramid, finest level first; the last entry is the
    residual gaussian level."""
    levels = []
    for _ in range(n_levels - 1):
        down = _downsample(x)
        levels.append(x - _upsample(down))
        x = down
    levels.append(x)
    return levels


# ------------------------------------------------------------------- SWD

def _patch_descriptors(imgs: jnp.ndarray, rng: jax.Array,
                       n_patches: int, patch: int,
                       desc_dtype=jnp.float16) -> jnp.ndarray:
    """Random patch x patch x C descriptors, ``n_patches`` per image.

    One fancy-gather builds all patches at once (no per-patch host loop):
    index grids of shape [B, P, patch, patch]. Returned in float16: the
    descriptors are accumulated on device across the whole eval set (~616 MB
    per level per side at Karras scale even in fp16), and laplacian values
    are O(1) so half precision costs ~1e-3 relative noise, well below the
    SWD's repeat-to-repeat spread."""
    b, h, w, c = imgs.shape
    ky, kx = jax.random.split(rng)
    y0 = jax.random.randint(ky, (b, n_patches), 0, h - patch + 1)
    x0 = jax.random.randint(kx, (b, n_patches), 0, w - patch + 1)
    dy = jnp.arange(patch)
    yy = y0[:, :, None, None] + dy[None, None, :, None]
    xx = x0[:, :, None, None] + dy[None, None, None, :]
    bb = jnp.arange(b)[:, None, None, None]
    patches = imgs[bb, yy, xx, :]  # [B, P, patch, patch, C]
    return patches.reshape(b * n_patches, patch * patch * c).astype(
        desc_dtype)


@functools.partial(jax.jit, static_argnames=("patch", "c"))
def _normalize_descriptors(d: jnp.ndarray, patch: int, c: int) -> jnp.ndarray:
    """Karras-style: remove per-channel mean/std computed over the whole
    descriptor set. Jitted so the whole pass fuses into one read of ``d``
    and one write of the output (out-of-jit, the ``(dc-mu)/sd`` chain
    materialized two full-set fp32 temporaries — the round-4 Karras-scale
    OOM); statistics accumulate in fp32 regardless of storage dtype."""
    dc = d.reshape(d.shape[0], patch * patch, c)
    mu = jnp.mean(dc, axis=(0, 1), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(dc.astype(jnp.float32)), axis=(0, 1), keepdims=True,
    ) - jnp.square(mu)
    sd = jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-8
    out = (dc.astype(jnp.float32) - mu) / sd
    return out.astype(d.dtype).reshape(d.shape)


def sliced_wasserstein(a: jnp.ndarray, b: jnp.ndarray, rng: jax.Array,
                       n_proj: int = 512, proj_chunk: int = 128) -> jnp.ndarray:
    """SWD between two equal-sized descriptor sets: project both onto
    ``n_proj`` random unit directions (one matmul each), sort along the
    sample axis per direction, mean absolute difference of the sorted
    projections.

    Directions are processed ``proj_chunk`` at a time under ``lax.map`` so
    peak memory is one [n_samples, proj_chunk] buffer per side, not
    [n_samples, n_proj] — at Karras scale (16,384 imgs x 128 descriptors =
    2.1M rows) the unchunked sort buffers would be ~4.3 GB/side in fp32.
    The projection matmul runs at HIGHEST precision: descriptor values are
    O(1) after normalization and bf16 multiplies would perturb the sorted
    order (the matmul is tiny — [N,147]x[147,chunk])."""
    dim = a.shape[-1]
    proj_chunk = min(proj_chunk, n_proj)
    n_chunks = -(-n_proj // proj_chunk)
    dirs = jax.random.normal(rng, (dim, n_chunks * proj_chunk))
    dirs = dirs / (jnp.linalg.norm(dirs, axis=0, keepdims=True) + 1e-12)
    dirs = dirs.reshape(dim, n_chunks, proj_chunk).transpose(1, 0, 2)

    def one_chunk(d):
        hi = jax.lax.Precision.HIGHEST
        pa = jnp.sort(jnp.matmul(a, d, precision=hi), axis=0)
        pb = jnp.sort(jnp.matmul(b, d, precision=hi), axis=0)
        return jnp.abs(pa - pb).mean()

    return jax.lax.map(one_chunk, dirs).mean()


def swd_pyramid(
    real_batches: Iterator[np.ndarray],
    fake_batches: Iterator[np.ndarray],
    resolution: int,
    min_res: int = 16,
    n_patches: int = 128,
    patch: int = 7,
    n_proj: int = 512,
    seed: int = 0,
    repeats: int = 4,
    desc_dtype=jnp.float16,
) -> Dict[str, float]:
    """SWD x10^3 per pyramid level (Karras Table 2 layout). Both iterators
    must yield the same number of same-shaped NHWC [-1,1] batches.

    Resolutions below ``min_res`` (the ladder's first rungs) evaluate as a
    single pyramid level at native resolution, with the patch size clamped to
    fit the image."""
    n_levels = max(int(np.log2(max(resolution // min_res, 1))) + 1, 1)
    patch = min(patch, resolution)
    pyr = jax.jit(functools.partial(laplacian_pyramid, n_levels=n_levels))
    desc = jax.jit(functools.partial(
        _patch_descriptors, n_patches=n_patches, patch=patch,
        desc_dtype=desc_dtype))

    rng = jax.random.PRNGKey(seed)
    per_level_r: List[List[jnp.ndarray]] = [[] for _ in range(n_levels)]
    per_level_f: List[List[jnp.ndarray]] = [[] for _ in range(n_levels)]
    for r_imgs, f_imgs in zip(real_batches, fake_batches):
        rng, kr, kf = jax.random.split(rng, 3)
        for lv, (rl, fl) in enumerate(zip(pyr(jnp.asarray(r_imgs)),
                                          pyr(jnp.asarray(f_imgs)))):
            per_level_r[lv].append(desc(rl, jax.random.fold_in(kr, lv)))
            per_level_f[lv].append(desc(fl, jax.random.fold_in(kf, lv)))

    c = 3
    out = {}
    swd_j = jax.jit(sliced_wasserstein,
                    static_argnames=("n_proj", "proj_chunk"))
    for lv in range(n_levels):
        # Process-and-free one level at a time: concatenate, drop the shard
        # list, normalize (fused, fp16 out), drop the raw concat, SWD, drop
        # the normalized sets. At Karras scale (16,384 imgs x 128 patches x
        # 5 levels x 2 sides) keeping every level's fp32 descriptors resident
        # through the loop was ~12 GB before the first sort buffer — the OOM
        # this structure replaces. Peak is now the fp16 store (~6 GB) + one
        # level in flight (~2 GB).
        raw_r = jnp.concatenate(per_level_r[lv])
        per_level_r[lv] = None
        dr = _normalize_descriptors(raw_r, patch, c)
        del raw_r
        raw_f = jnp.concatenate(per_level_f[lv])
        per_level_f[lv] = None
        df = _normalize_descriptors(raw_f, patch, c)
        del raw_f
        vals = []
        for rep in range(repeats):
            rng, k = jax.random.split(rng)
            vals.append(float(swd_j(dr, df, k, n_proj=n_proj)))
        del dr, df
        res = resolution // (2 ** lv)
        out[f"swd_{res}"] = float(np.mean(vals)) * 1e3
    out["swd_avg"] = float(np.mean(list(out.values())))
    # storage dtype recorded for cross-run comparability (ADVICE r4: fp16
    # descriptor storage is a deliberate deviation from the reference's fp32
    # pipeline; tests/test_perceptual.py pins the fp16-vs-fp32 tolerance)
    out["swd_desc_dtype"] = jnp.dtype(desc_dtype).name
    return out


# ---------------------------------------------------------------- MS-SSIM

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _ssim_window(c: int, win: int = 11) -> jnp.ndarray:
    g = np.exp(-0.5 * ((np.arange(win) - (win - 1) / 2.0) / 1.5) ** 2)
    g = (g / g.sum()).astype(np.float32)
    return jnp.broadcast_to(
        jnp.asarray(np.outer(g, g))[:, :, None, None], (win, win, 1, c))


def _ssim_cs(a: jnp.ndarray, b: jnp.ndarray,
             win: int = 11) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image mean luminance (l) and contrast-structure (cs) maps of SSIM
    (Wang et al.), images in [0,1] NHWC, ``win`` x ``win`` gaussian window,
    VALID."""
    c = a.shape[-1]
    k = _ssim_window(c, win)
    conv = lambda x: jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_a, mu_b = conv(a), conv(b)
    var_a = conv(a * a) - mu_a ** 2
    var_b = conv(b * b) - mu_b ** 2
    cov = conv(a * b) - mu_a * mu_b
    l = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
    cs = (2 * cov + c2) / (var_a + var_b + c2)
    axes = (1, 2, 3)
    return l.mean(axes), cs.mean(axes)


def ms_ssim(a: jnp.ndarray, b: jnp.ndarray,
            weights: Sequence[float] = _MSSSIM_WEIGHTS) -> jnp.ndarray:
    """Multi-scale SSIM per pair (Wang 2003): cs at every scale, luminance at
    the coarsest; inputs [-1,1] NHWC, returns [B]. Scales beyond what the
    resolution supports (11px window per scale) are dropped and the remaining
    exponents renormalized; images smaller than the 11px window (the ladder's
    4^2/8^2 rungs) use a single scale with the window shrunk to the image, so
    low PGGAN rungs still evaluate instead of returning NaN."""
    win = min(11, a.shape[1], a.shape[2])
    max_scales = max(int(np.log2(min(a.shape[1], a.shape[2]) / win)) + 1, 1)
    w_used = np.asarray(weights[:max_scales], np.float64)
    w_used = tuple(w_used / w_used.sum())
    a = (a + 1.0) * 0.5
    b = (b + 1.0) * 0.5
    vals = []
    for i, w in enumerate(w_used):
        l, cs = _ssim_cs(a, b, win=win)
        if i == len(w_used) - 1:
            vals.append(jnp.clip(l * cs, 0.0, None) ** w)
        else:
            vals.append(jnp.clip(cs, 0.0, None) ** w)
            a, b = _downsample(a), _downsample(b)
    return jnp.prod(jnp.stack(vals), axis=0)


def ms_ssim_diversity(sample_fn, rng: jax.Array, n_pairs: int,
                      batch_size: int = 8) -> Tuple[float, float]:
    """Mean MS-SSIM over random generated pairs (Karras diversity metric:
    lower = more diverse). ``sample_fn(rng) -> [batch_size*2, H, W, C]``
    stays jitted; pairs are split device-side."""
    @jax.jit
    def pair_scores(r):
        imgs = sample_fn(r)
        return ms_ssim(imgs[:batch_size], imgs[batch_size:])

    scores = []
    for _ in range(max(n_pairs // batch_size, 1)):
        rng, sub = jax.random.split(rng)
        scores.append(jax.device_get(pair_scores(sub)))
    s = np.concatenate(scores)
    return float(s.mean()), float(s.std())
