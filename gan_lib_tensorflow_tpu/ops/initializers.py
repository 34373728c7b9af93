"""Weight initializers matching the reference lineage's conventions.

Reference: ``common/ops/linear.py`` / ``common/ops/conv2d.py`` in
watsonyanghx/GAN_Lib_Tensorflow (tflib lineage) expose ``he_init`` /
Glorot-uniform choices; PGGAN (``PGGAN/model.py`` lineage) instead uses
*equalized learning rate*: unit-normal init with a He-scale multiplier applied
at **runtime** (Karras et al. 2018, §4.1).

TPU note: initializers produce float32 params; compute dtype (bfloat16 on the
MXU) is a separate, per-module concern — see ``ops.layers``.
"""

from __future__ import annotations

import numpy as np
from jax import nn

# He-normal on fan_in — the default for all conv/linear layers, matching the
# reference's `he_init=True` default.
he_normal = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")

# He-uniform — the tflib `initialization='he'` uniform variant.
he_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")

# Glorot-uniform — tflib's `initialization='glorot'` (used by output layers in
# some reference configs).
glorot_uniform = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")

# Unit normal — used with equalized LR (PGGAN) where the He scale is applied at
# runtime instead of at init.
unit_normal = nn.initializers.normal(stddev=1.0)

zeros = nn.initializers.zeros
ones = nn.initializers.ones


def get(name_or_fn):
    """Resolve an initializer from the tflib-style string vocabulary
    (``Linear(..., initialization='he'|'glorot'|...)``) or pass a callable
    through unchanged."""
    if callable(name_or_fn):
        return name_or_fn
    table = {
        "he": he_uniform,
        "he_normal": he_normal,
        "glorot": glorot_uniform,
        "glorot_uniform": glorot_uniform,
        "normal": unit_normal,
        "zeros": zeros,
        "ones": ones,
    }
    try:
        return table[name_or_fn]
    except KeyError:
        raise ValueError(
            f"unknown initializer {name_or_fn!r}; one of {sorted(table)}")


def he_scale(shape, gain: float = np.sqrt(2.0)) -> float:
    """Runtime He multiplier for equalized-LR layers: gain / sqrt(fan_in).

    ``shape`` is the kernel shape; fan_in is the product of all dims except the
    last (HWIO conv kernels / [in, out] dense kernels).
    """
    fan_in = int(np.prod(shape[:-1]))
    return float(gain / np.sqrt(fan_in))
