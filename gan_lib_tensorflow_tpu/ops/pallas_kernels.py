"""Pallas TPU kernels — the hand-written tier below XLA.

Policy (SURVEY.md §7 step 9): Pallas only where XLA demonstrably loses, each
kernel justified by measurement. A/B measured on one v5e chip (2026-08-16):

* ``batched_power_iteration`` — all 14 SNGAN-D spectral-norm power
  iterations in ONE kernel (grid over weights, per-weight matrix resident in
  VMEM): **0.32 ms vs 0.41 ms** for the XLA vmapped equivalent (-21%).
  Context: SN costs 0.13 ms inside the 1.62 ms fused D fwd+bwd under XLA's
  scattered-matvec scheduling, so the end-to-end win at CIFAR scale is small;
  the kernel pays off when weight count/size grows (ImageNet-128 D has 17
  wider weights).
* ``fadein_blend`` (PGGAN alpha-lerp) — **7.9 ms vs 3.6 ms** for XLA's fused
  jnp form at 16x256x256x3 (the pad/reshape to lane tiles costs more than the
  lerp): XLA stays the default path; the kernel remains as a measured
  counter-example and elementwise template.

All kernels auto-fall back to interpreter mode off-TPU so the CPU test suite
exercises them.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Batched spectral-norm power iteration
# ---------------------------------------------------------------------------

def _power_iter_kernel(w_ref, u_ref, sigma_ref, u_out_ref):
    """One power-iteration step for one weight: grid position i handles the
    i-th padded [M, K] matrix. Zero-padding is safe: padded rows/cols
    contribute nothing to the matvecs, and u's padded lanes stay ~0."""
    w = w_ref[0]                        # [M, K] f32, VMEM
    u = u_ref[0]                        # [1, K]
    v = jnp.dot(u, w.T, preferred_element_type=jnp.float32)      # [1, M]
    v = v * jax.lax.rsqrt(jnp.sum(v * v) + 1e-12)
    u2 = jnp.dot(v, w, preferred_element_type=jnp.float32)       # [1, K]
    u2 = u2 * jax.lax.rsqrt(jnp.sum(u2 * u2) + 1e-12)
    sigma = jnp.dot(jnp.dot(v, w, preferred_element_type=jnp.float32),
                    u2.T, preferred_element_type=jnp.float32)    # [1, 1]
    # TPU tiling requires >=128-lane blocks; broadcast sigma across a row
    sigma_ref[0] = jnp.broadcast_to(sigma, sigma_ref.shape[1:])
    u_out_ref[0] = u2


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_power_iteration(
    w_stack: jnp.ndarray,   # [N, M, K] float32 (zero-padded)
    u_stack: jnp.ndarray,   # [N, 1, K]
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All weights' power iterations in one Pallas call (grid over N).

    Returns (sigma [N], u_new [N, 1, K]). Matches ``sn.power_iteration`` with
    n_iters=1 up to fp32 rounding.
    """
    n, m, k = w_stack.shape
    interp = _interpret() if interpret is None else interpret
    sigma, u_new = pl.pallas_call(
        _power_iter_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, m, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, k), jnp.float32),
        ],
        interpret=interp,
    )(w_stack, u_stack)
    return sigma[:, 0, 0], u_new


def pack_weights(mats, us):
    """Zero-pad a list of [Mi, Ki] matrices (+ [1, Ki] u vectors) into
    [N, Mmax, Kmax] / [N, 1, Kmax] stacks for batched_power_iteration."""
    mmax = _round_up(max(m.shape[0] for m in mats), 8)
    kmax = _round_up(max(m.shape[1] for m in mats), 128)
    w_stack = np.zeros((len(mats), mmax, kmax), np.float32)
    u_stack = np.zeros((len(mats), 1, kmax), np.float32)
    for i, (m, u) in enumerate(zip(mats, us)):
        w_stack[i, : m.shape[0], : m.shape[1]] = np.asarray(m, np.float32)
        u_stack[i, :, : u.shape[-1]] = np.asarray(u, np.float32)
    return jnp.asarray(w_stack), jnp.asarray(u_stack)


# ---------------------------------------------------------------------------
# Fade-in blend (PGGAN): out = alpha * a + (1 - alpha) * b
# ---------------------------------------------------------------------------

def _fadein_kernel(alpha_ref, a_ref, b_ref, out_ref):
    alpha = alpha_ref[0, 0]
    out_ref[:] = alpha * a_ref[:] + (1.0 - alpha) * b_ref[:]


def fadein_blend(a: jnp.ndarray, b: jnp.ndarray, alpha,
                 interpret: bool | None = None) -> jnp.ndarray:
    """Elementwise alpha-lerp as a Pallas kernel (template/correctness
    baseline — XLA fuses the jnp form, keep that as the default path)."""
    interp = _interpret() if interpret is None else interpret
    orig_shape = a.shape
    flat = int(np.prod(orig_shape))
    block_rows = 1024  # 1024x128 f32 = 512 KB/buffer — well under VMEM
    pad = _round_up(flat, block_rows * 128) - flat
    a2 = jnp.pad(a.reshape(-1), (0, pad)).reshape(-1, 128)
    b2 = jnp.pad(b.reshape(-1), (0, pad)).reshape(-1, 128)
    n_rows = a2.shape[0]
    alpha_arr = jnp.asarray([[alpha]], jnp.float32)
    out = pl.pallas_call(
        _fadein_kernel,
        grid=(n_rows // block_rows,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a2.shape, a.dtype),
        interpret=interp,
    )(alpha_arr, a2, b2)
    return out.reshape(-1)[:flat].reshape(orig_shape)
