"""PGGAN progressive-growing ladder: the staged-recompile schedule.

Reference outer loop (SURVEY.md §3.3): for each level 4 -> 1024, a transition
phase (alpha: 0 -> 1 linearly over N images) then a stabilization phase, with
``tf.reset_default_graph()`` + ``Saver.restore`` surgery between levels.
Here each (level, phase) jits its own fused train step (static shapes for
XLA), params migrate across stages by pytree surgery, and alpha is a traced
scalar — no recompiles inside a phase.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..data.base import DataSource
from ..models import pggan
from ..utils import save_image_grid
from ..utils.logging import ScalarLogger
from .checkpoint import CheckpointManager
from .loop import LoopConfig, train_loop
from .state import GANTrainState, create_state
from .step import jit_train_step

# Reference batch schedule shrinks with resolution to fit memory
# (SURVEY.md §2.4: 16 -> 4 by res).
DEFAULT_BATCH_BY_RES = {4: 16, 8: 16, 16: 16, 32: 16, 64: 16,
                        128: 16, 256: 8, 512: 4, 1024: 4}


@dataclasses.dataclass
class LadderConfig:
    start_resolution: int = 4
    final_resolution: int = 1024
    images_per_phase: int = 600_000
    batch_by_res: Dict[int, int] = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_BATCH_BY_RES))
    lr: float = 1e-3
    beta1: float = 0.0
    beta2: float = 0.99
    width_mul: float = 1.0
    z_dim: int = 512
    ema_decay: float = 0.999
    compute_dtype: Optional[object] = None
    seed: int = 0
    out_dir: Optional[str] = None
    log_every: int = 100
    sample_every: int = 1000
    checkpoint_every: int = 5000
    # Overrides for smoke tests: fixed step count per phase (None = derive
    # from images_per_phase / batch).
    steps_per_phase: Optional[int] = None
    # Mesh axis name for GSPMD spatial partitioning of the image height dim
    # (high-res levels where per-chip batch is too small for pure DP).
    spatial_axis: Optional[str] = None
    # Rematerialize convs from this resolution upward (0 = never); trades
    # FLOPs for activation memory at 512/1024 (SURVEY.md §7 hard part #3).
    remat_from_resolution: int = 0
    # Use the fused conv+downscale D blocks (Karras fused_scale variant)
    # from this resolution upward (0 = never). Param-compatible perf knob.
    fused_from_resolution: int = 0
    # Compute levels from this resolution upward on the space-to-depth grid
    # (ops/s2d.py) — the low-channel high-res perf knob. Exact and
    # param-compatible; supersedes fused_from at the covered levels. Measured
    # (docs/PERF.md round 3): at any given stage, rewriting ONLY the stage's
    # own top level is optimal (deeper coverage adds S2D/D2S transitions that
    # cost more than they save), so each stage uses
    # max(s2d_from_resolution, stage_resolution) as its effective threshold.
    s2d_from_resolution: int = 0


def resolutions(cfg: LadderConfig):
    r = cfg.start_resolution
    while r <= cfg.final_resolution:
        yield r
        r *= 2


def train_pggan_ladder(
    cfg: LadderConfig,
    source_factory: Callable[[int, int], DataSource],
    mesh=None,
    logger: Optional[ScalarLogger] = None,
    phase_hook: Optional[Callable[[str, int, str, GANTrainState], None]] = None,
) -> GANTrainState:
    """Run the full ladder. ``source_factory(resolution, batch_size)`` yields
    a DataSource of reals at that resolution. Returns the final stage state.

    ``phase_hook(when, res, phase, state)`` is called with ``when='start'``
    right after param migration (before any training step of the phase) and
    ``when='end'`` after the phase's train_loop — the observation point that
    lets tests assert bit-exact trunk carry through the ladder's own wiring."""
    logger = logger or ScalarLogger(cfg.out_dir)
    prev: Optional[GANTrainState] = None
    state = None

    for res in resolutions(cfg):
        phases = (["stabilize"] if res == cfg.start_resolution
                  else ["transition", "stabilize"])
        for phase in phases:
            fade = phase == "transition"
            s2d_eff = (max(cfg.s2d_from_resolution, res)
                       if cfg.s2d_from_resolution else 0)
            g = pggan.PGGANGenerator(resolution=res, fade_in=fade,
                                     z_dim=cfg.z_dim, width_mul=cfg.width_mul,
                                     remat_from=cfg.remat_from_resolution,
                                     s2d_from=s2d_eff,
                                     compute_dtype=cfg.compute_dtype)
            d = pggan.PGGANDiscriminator(resolution=res, fade_in=fade,
                                         width_mul=cfg.width_mul,
                                         remat_from=cfg.remat_from_resolution,
                                         fused_from=cfg.fused_from_resolution,
                                         s2d_from=s2d_eff,
                                         compute_dtype=cfg.compute_dtype)
            spec = pggan.make_pggan_spec(g, d, ema_decay=cfg.ema_decay)
            g_optim = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)
            d_optim = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)

            batch = cfg.batch_by_res[res]
            state = create_state(
                jax.random.PRNGKey(cfg.seed + res + (0 if fade else 1)),
                lambda r_: g.init(r_, jnp.zeros((2, cfg.z_dim)), 1.0),
                lambda r_: d.init(r_, jnp.zeros((4, res, res, 3)), 1.0),
                g_optim, d_optim, ema_decay=cfg.ema_decay)

            if prev is not None:
                g_params, g_copied = pggan.migrate_params(prev.g_params, state.g_params)
                d_params, d_copied = pggan.migrate_params(prev.d_params, state.d_params)
                ema_params, _ = pggan.migrate_params(prev.ema_params, state.ema_params)
                state = state.replace(g_params=g_params, d_params=d_params,
                                      ema_params=ema_params)
                print(f"[pggan] {res}x{res} {phase}: migrated "
                      f"{g_copied} G + {d_copied} D tensors", flush=True)

            if phase_hook is not None:
                phase_hook("start", res, phase, state)

            steps = cfg.steps_per_phase or max(cfg.images_per_phase // batch, 1)
            alpha_fn = ((lambda i, s=steps: min((i % s + 1) / s, 1.0))
                        if fade else (lambda i: 1.0))

            step_fn = jit_train_step(spec, g_optim, d_optim, mesh=mesh)
            source = source_factory(res, batch)

            phase_dir = (os.path.join(cfg.out_dir, f"{res}x{res}_{phase}")
                         if cfg.out_dir else None)
            g_sample = pggan.PGGANGenerator(
                resolution=res, fade_in=fade, z_dim=cfg.z_dim,
                width_mul=cfg.width_mul, compute_dtype=cfg.compute_dtype)
            sampler = pggan.make_sampler(g_sample)
            sample_rng = jax.random.PRNGKey(cfg.seed + 99)

            def sample_fn(st, it, _dir=phase_dir, _s=sampler):
                if _dir:
                    imgs = _s(st, sample_rng, 16)
                    save_image_grid(jax.device_get(imgs),
                                    os.path.join(_dir, f"sample_{it:06d}.png"))

            loop_cfg = LoopConfig(
                total_steps=steps, log_every=cfg.log_every,
                sample_every=cfg.sample_every,
                checkpoint_every=cfg.checkpoint_every, out_dir=phase_dir)
            ckpt = CheckpointManager(os.path.join(phase_dir, "ckpt")) if phase_dir else None
            state = train_loop(state, step_fn, source, spec.n_micro, loop_cfg,
                               mesh=mesh, sample_fn=sample_fn, ckpt=ckpt,
                               logger=ScalarLogger(phase_dir), alpha_fn=alpha_fn,
                               spatial_axis=cfg.spatial_axis)
            if ckpt:
                ckpt.close()
            if phase_hook is not None:
                phase_hook("end", res, phase, state)
            prev = state
    return state
