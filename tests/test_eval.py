"""IS/FID machinery tests (extractor-agnostic properties)."""

import jax
import numpy as np

from gan_lib_tensorflow_tpu import eval as ev


def test_moment_accumulator_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 8))
    acc = ev.MomentAccumulator(8)
    for chunk in np.array_split(x, 7):
        acc.update(chunk)
    mu, cov = acc.finalize()
    np.testing.assert_allclose(mu, x.mean(0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), rtol=1e-8)


def test_frechet_distance_properties():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2000, 16))
    b = rng.standard_normal((2000, 16)) + 2.0  # shifted
    def stats(x):
        return x.mean(0), np.cov(x, rowvar=False)
    same = ev.frechet_distance(*stats(a), *stats(a))
    near = ev.frechet_distance(*stats(a), *stats(rng.standard_normal((2000, 16))))
    far = ev.frechet_distance(*stats(a), *stats(b))
    assert abs(same) < 1e-6
    assert far > near > 0
    # mean shift of 2 in 16 dims contributes ~16*4=64
    assert 50 < far < 90


def test_inception_score_bounds():
    n, k = 1000, 10
    uniform = np.full((n, k), 1.0 / k)
    m, s = ev.inception_score_from_probs(uniform)
    np.testing.assert_allclose(m, 1.0, rtol=1e-5)

    confident = np.eye(k)[np.arange(n) % k] * 0.999 + 0.0001
    m2, _ = ev.inception_score_from_probs(confident / confident.sum(1, keepdims=True))
    assert m2 > 8.0  # near the k=10 upper bound


def test_fixed_feature_net_separates_distributions():
    from gan_lib_tensorflow_tpu.eval.features import FixedFeatureNet
    net = FixedFeatureNet(image_size=16, feature_dim=32)
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (256, 16, 16, 3)).astype(np.float32)
    b = (rng.uniform(-1, 1, (256, 16, 16, 3)).astype(np.float32) * 0.2 - 0.5)
    mu_a, cov_a = ev.compute_statistics(net, iter(np.array_split(a, 4)), 32)
    mu_a2, cov_a2 = ev.compute_statistics(net, iter(np.array_split(a, 4)), 32)
    mu_b, cov_b = ev.compute_statistics(net, iter(np.array_split(b, 4)), 32)
    fid_same = ev.frechet_distance(mu_a, cov_a, mu_a2, cov_a2)
    fid_diff = ev.frechet_distance(mu_a, cov_a, mu_b, cov_b)
    assert fid_same < 1e-6
    # absolute scale depends on the extractor; what matters is separation
    assert fid_diff > 0.05 and fid_diff > 1e4 * max(fid_same, 1e-9)
