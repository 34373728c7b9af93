"""Space-to-depth rewrites for low-channel high-resolution convolutions.

Why this exists (measured, docs/PERF.md round-3): the Karras channel schedule
gives C=16 at 1024^2 and C=32 at 512^2. TPU vector memory tiles the
minor-most (channel) dim to 128 lanes, so a 16-channel conv uses 1/8 of the
MXU's output lanes and its activations carry dead padding through HBM — the
1024^2 PGGAN rung measured at ~6% of the chip's achievable rate while the
>=128-channel rungs sit at 57-80%.

The exact fix: re-express the top levels on the factor-2 space-to-depth grid
— a (B, H, W, C) tensor becomes (B, H/2, W/2, 4C), phase-major — and rewrite
each conv's kernel so the rewritten conv ON the S2D grid computes exactly the
original conv. For a stride-1 kxk SAME conv, output pixel (2i+r, 2j+s)
(phase r,s in {0,1}) reads input pixel (2i+r+dy, 2j+s+dx), which lives at
S2D cell offset floor((r+d)/2) in {-1,0,1} and input phase (r+d) mod 2 — so
every tap of the original kernel maps to one slot of a 3x3 cell-space kernel
over (4*C_in -> 4*C_out). The mapped kernel is block-sparse (each output
phase reads 9 of the 36 (cell, in-phase) slots), so the dense S2D conv does
up to 4x the MACs — the trade is deliberate: 4x the arithmetic at 4x the
channel width beats 1x at 1/8 MXU occupancy (measured ~4-10x net on the
1024-level shapes, docs/PERF.md).

Three kernel transforms cover every conv shape in the PGGAN top blocks; all
are *linear in the original kernel*, so equalized-LR scaling, checkpoints,
``migrate_params``, and gradients are untouched — the S2D path is a pure
compute-layout knob (``s2d_from`` on the PGGAN modules), bit-compatible in
parameters with the composed path:

* ``s2d_conv_kernel``       stride-1 conv, S2D in  -> S2D out
* ``s2d_upconv_kernel``     nearest-up2 + conv, normal in -> S2D out
                            (the G block entry; equal MACs to the fused
                            transposed-conv form on the out-phase diagonal)
* ``s2d_downconv_kernel``   conv + box-down2, S2D in -> normal out
                            (the D block exit / Karras fused_scale dual)

No reference counterpart: the reference lineage runs these shapes on GPUs
where cuDNN handles low-channel convs with implicit-GEMM tilings; on TPU the
rewrite is the idiomatic answer (same spirit as XLA's own space-to-depth
pass for stem convs, applied here to the GAN top blocks).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Dtype = jnp.dtype


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major: out channel
    (py*2 + px)*C + c holds input pixel (2i+py, 2j+px, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)       # B, H/2, W/2, py, px, C
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)       # B, H/2, py, W/2, px, C
    return x.reshape(b, 2 * h, 2 * w, c)


def _cell_kernel_size(k: int) -> int:
    """Cell-space kernel size covering taps r+d, r in {0,1}, |d| <= k//2."""
    half = k // 2
    lo = -((half + 1) // 2)                 # floor((0 - half) / 2)
    hi = (1 + half) // 2                    # floor((1 + half) / 2)
    return hi - lo + 1


def _build(w: jnp.ndarray, in_phases: bool, out_phases: bool,
           scale: float = 1.0) -> jnp.ndarray:
    """Shared constructor: scatter the kxk HWIO kernel into the cell-space
    kernel. 36 static .at[].add updates for k=3 — runs once at trace time."""
    k, _, ci, co = w.shape
    assert k % 2 == 1, "odd kernels only"
    half = k // 2
    kc = _cell_kernel_size(k)
    c0 = (kc - 1) // 2                      # center cell index
    shape = ((kc, kc)
             + ((2, 2) if in_phases else ())
             + (ci,)
             + ((2, 2) if out_phases else ())
             + (co,))
    out = jnp.zeros(shape, w.dtype)
    for r in (0, 1):
        for s in (0, 1):
            for dy in range(-half, half + 1):
                for dx in range(-half, half + 1):
                    ty, tx = r + dy, s + dx
                    cy, cx = ty // 2, tx // 2           # python floor div
                    py, px = ty % 2, tx % 2
                    idx = [c0 + cy, c0 + cx]
                    if in_phases:
                        idx += [py, px]
                    idx += [slice(None)]
                    if out_phases:
                        idx += [r, s]
                    idx += [slice(None)]
                    out = out.at[tuple(idx)].add(w[half + dy, half + dx]
                                                 * scale)
    # flatten phase dims into channels (phase-major, matching space_to_depth)
    i_dim = 4 * ci if in_phases else ci
    o_dim = 4 * co if out_phases else co
    return out.reshape(kc, kc, i_dim, o_dim)


def s2d_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(k,k,C,O) -> (kc,kc,4C,4O):
    ``conv_same(space_to_depth(x), out) == space_to_depth(conv_same(x, w))``."""
    return _build(w, in_phases=True, out_phases=True)


def s2d_upconv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(k,k,C,O) -> (kc,kc,C,4O):
    ``conv_same(x, out) == space_to_depth(conv_same(nearest_up2(x), w))``.
    Derivation: up(x)[2i+r+d] = x[i + floor((r+d)/2)] — the same cell-offset
    map with no input phase."""
    return _build(w, in_phases=False, out_phases=True)


def s2d_downconv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(k,k,C,O) -> (kc,kc,4C,O):
    ``conv_same(space_to_depth(x), out) == downsample_avg(conv_same(x, w))``.
    The pooled output (i,j) averages conv outputs at the 4 phases of cell
    (i,j) — the out-phase sum folded in with weight 1/4."""
    k = w.shape[0]
    kc = _cell_kernel_size(k)
    dense = _build(w, in_phases=True, out_phases=True, scale=0.25)
    ci4, co = 4 * w.shape[2], w.shape[3]
    return dense.reshape(kc, kc, ci4, 4, co).sum(axis=3)


def conv_same(x: jnp.ndarray, kernel: jnp.ndarray,
              compute_dtype: Optional[Dtype] = None) -> jnp.ndarray:
    """Plain stride-1 SAME NHWC/HWIO conv for the transformed kernels."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def tile_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """Per-channel bias in S2D layout: each phase group repeats it."""
    return jnp.tile(bias, 4)


def pixel_norm_s2d(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """PixelNorm on an S2D tensor: each original pixel is one (phase, C)
    group — normalize over its C channels only (exactly pixel_norm on the
    normal-layout tensor). Stats in fp32 like ops.norms.pixel_norm."""
    b, h, w, c4 = x.shape
    g = x.reshape(b, h, w, 4, c4 // 4).astype(jnp.float32)
    g = g * jax.lax.rsqrt(jnp.mean(g * g, axis=-1, keepdims=True) + eps)
    return g.reshape(b, h, w, c4).astype(x.dtype)
