"""The sample CLI's serving-export surface: restore -> grid -> orbax bundle +
StableHLO module that reruns WITHOUT model code (reference parity: pix2pix
`--mode export` is the reference's only export surface; here it is
generalized to every generator — SURVEY.md §3.5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gan_lib_tensorflow_tpu.cli import sample as sample_cli
from gan_lib_tensorflow_tpu.models import pggan
from gan_lib_tensorflow_tpu.train import CheckpointManager


def test_sample_cli_exports_runnable_stablehlo(tmp_path):
    g = pggan.PGGANGenerator(resolution=8, width_mul=1 / 16)
    params = g.init(jax.random.PRNGKey(0),
                    jnp.zeros((2, g.z_dim)), jnp.float32(1.0))["params"]

    ckpt_dir = str(tmp_path / "ckpt")
    cm = CheckpointManager(ckpt_dir)
    cm.save(7, {"g_params": params, "g_state": {}, "step": 7,
                "alpha": jnp.float32(1.0)}, wait=True)
    cm.close()

    out_png = str(tmp_path / "grid.png")
    export_dir = str(tmp_path / "export")
    sample_cli.main(["--model", "pggan", "--ckpt-dir", ckpt_dir,
                     "--resolution", "8", "--width-mul", str(1 / 16),
                     "--n", "4", "--out", out_png,
                     "--export-dir", export_dir])

    assert os.path.exists(out_png)
    blob = open(os.path.join(export_dir, "generator_stablehlo.bin"), "rb").read()
    assert len(blob) > 1000

    # the serialized module must reproduce the generator with no model code
    from jax import export as jexport
    reloaded = jexport.deserialize(blob)
    z = jax.random.normal(jax.random.PRNGKey(3), (4, g.z_dim))
    got = np.asarray(reloaded.call(z))
    want = np.asarray(g.apply({"params": params}, z, jnp.float32(1.0)))
    assert got.shape == (4, 8, 8, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # the orbax side of the bundle restores the same params
    raw = CheckpointManager(export_dir).restore_latest_raw()
    leaves_a = jax.tree_util.tree_leaves(raw["g_params"])
    leaves_b = jax.tree_util.tree_leaves(params)
    assert all(np.array_equal(a, b) for a, b in zip(leaves_a, leaves_b))
