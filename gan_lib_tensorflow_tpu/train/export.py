"""Serving-bundle writer shared by every export surface.

The reference's only export is pix2pix ``--mode export`` (a frozen TF1
meta-graph, SURVEY.md §3.2). The JAX-equivalent bundle, written here for both
``cli.train_pix2pix --mode export`` and ``cli.sample --export-dir``:

1. an orbax checkpoint of the generator payload (params + state), and
2. ``generator_stablehlo.bin`` — the jitted serve function serialized as
   StableHLO with params baked in, loadable via ``jax.export.deserialize``
   and runnable with no model code at all.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict

import jax

from .checkpoint import CheckpointManager

BUNDLE_FILENAME = "generator_stablehlo.bin"


def write_serving_bundle(
    export_dir: str,
    step: int,
    payload: Dict[str, Any],
    serve_fn: Callable,
    example_input: jax.ShapeDtypeStruct,
) -> str:
    """Write the two-artifact bundle; returns the StableHLO file path."""
    ckpt = CheckpointManager(export_dir)
    ckpt.save(step, payload, wait=True)
    ckpt.close()

    from jax import export as jexport

    exported = jexport.export(jax.jit(serve_fn))(example_input)
    path = os.path.join(export_dir, BUNDLE_FILENAME)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    print(f"exported generator to {export_dir} "
          f"(orbax params + {BUNDLE_FILENAME})", flush=True)
    return path
