"""InceptionV3 port tests: topology (param count matches keras' 23.85M) and
non-degeneracy of the random-init extractor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_lib_tensorflow_tpu.eval import frechet_distance
from gan_lib_tensorflow_tpu.eval.inception_v3 import InceptionV3, InceptionV3Features


def test_topology_matches_keras():
    m = InceptionV3()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    n = sum(x.size for x in jax.tree_util.tree_leaves(v))
    # keras InceptionV3(weights=None).count_params() == 23,851,784
    assert n == 23_851_784
    feats, logits = m.apply(v, jnp.zeros((2, 299, 299, 3)))
    assert feats.shape == (2, 2048)
    assert logits.shape == (2, 1000)


@pytest.mark.slow
def test_random_init_extractor_separates_distributions():
    net = InceptionV3Features()
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (32, 32, 32, 3)).astype(np.float32)
    b = np.clip(rng.normal(-0.5, 0.1, (32, 32, 32, 3)), -1, 1).astype(np.float32)

    def stats(x):
        feats, _ = net(jnp.asarray(x))
        f = np.asarray(feats, np.float64)
        return f.mean(0), np.cov(f, rowvar=False)

    mu_a, cov_a = stats(a)
    mu_b, cov_b = stats(b)
    fid = frechet_distance(mu_a, cov_a, mu_b, cov_b)
    assert np.isfinite(fid) and fid > 1e-3
    # features are not collapsed
    feats, logits = net(jnp.asarray(a[:8]))
    assert float(jnp.std(feats)) > 1e-3
    probs = jax.nn.softmax(logits, -1)
    assert float(jnp.std(probs)) > 1e-6
