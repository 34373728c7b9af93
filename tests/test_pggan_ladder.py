"""PGGAN ladder integration: run levels 4 -> 8 at tiny width; assert trunk
migration happens, alpha hits 1.0 during transition, and training stays
finite (SURVEY.md §4 ladder test)."""

import numpy as np

from gan_lib_tensorflow_tpu import data
from gan_lib_tensorflow_tpu.train.pggan_loop import LadderConfig, train_pggan_ladder


def test_tiny_ladder_runs_and_grows():
    base = data.FakeImages(batch_size=4, image_size=8, num_classes=1, seed=0)
    multi = data.MultiResolution(base=base, batch_size=4, max_resolution=8)

    def source_factory(res, batch):
        return multi.at_resolution(res)

    cfg = LadderConfig(
        start_resolution=4, final_resolution=8,
        batch_by_res={4: 4, 8: 4}, width_mul=1 / 64, z_dim=8,
        steps_per_phase=2, log_every=1, sample_every=10**9,
        checkpoint_every=10**9, out_dir=None)
    state = train_pggan_ladder(cfg, source_factory)
    # final stage is 8x8 stabilize; 2 steps ran
    assert int(state.step) == 2
    assert float(state.alpha) == 1.0
    # trunk + new-level params both present
    assert "block_8" in state.g_params
    assert "dense_4" in state.g_params
    import jax
    for leaf in jax.tree_util.tree_leaves(state.g_params):
        assert np.all(np.isfinite(np.asarray(leaf)))
