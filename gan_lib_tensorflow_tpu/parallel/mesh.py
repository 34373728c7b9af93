"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Defaults to a 1-D ``('data',)`` mesh over all devices — the DP layout that
    carries every headline config on a v5e-8 (SURVEY.md §2.3). Pass
    ``shape=(d, m), axis_names=('data', 'model')`` for DP x TP.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    try:
        dmesh = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        # CPU/virtual devices have no physical topology; plain reshape.
        dmesh = np.asarray(devices).reshape(shape)
    return Mesh(dmesh, tuple(axis_names))
