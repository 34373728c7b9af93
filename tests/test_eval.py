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


def test_device_accumulator_matches_host_oracles():
    """DeviceEvalAccumulator's on-device moments AND split-statistic IS must
    match the host float64 MomentAccumulator / inception_score_from_probs on
    identical feature batches (VERDICT r2 item #1)."""
    from gan_lib_tensorflow_tpu.eval.features import FixedFeatureNet
    from gan_lib_tensorflow_tpu.eval.metrics import DeviceEvalAccumulator

    net = FixedFeatureNet(image_size=16, feature_dim=32)
    rng = np.random.default_rng(1)
    n, bs, splits = 600, 50, 10
    split_size = (n // splits * splits) // splits
    imgs = rng.uniform(-1, 1, (n, 16, 16, 3)).astype(np.float32)

    dev = DeviceEvalAccumulator(net, 32, splits=splits, split_size=split_size)
    host = ev.MomentAccumulator(32)
    probs = []
    for chunk in np.split(imgs, n // bs):
        dev.add_images(chunk)
        feats, logits = net(chunk)
        host.update(jax.device_get(feats))
        probs.append(jax.device_get(jax.nn.softmax(logits, -1)))

    mu_d, cov_d = dev.moments()
    mu_h, cov_h = host.finalize()
    np.testing.assert_allclose(mu_d, mu_h, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cov_d, cov_h, rtol=1e-4, atol=1e-6)

    is_d, std_d = dev.inception_score()
    is_h, std_h = ev.inception_score_from_probs(np.concatenate(probs), splits)
    np.testing.assert_allclose(is_d, is_h, rtol=1e-5)
    np.testing.assert_allclose(std_d, std_h, rtol=1e-4, atol=1e-6)


def test_device_accumulator_mesh_sharded_matches_single_device():
    """Same statistics whether accumulated single-device or sharded over the
    8-virtual-device 'data' mesh (SURVEY §3.4: psum the activation moments)."""
    from gan_lib_tensorflow_tpu.eval.features import FixedFeatureNet
    from gan_lib_tensorflow_tpu.eval.metrics import DeviceEvalAccumulator
    from gan_lib_tensorflow_tpu.parallel import create_mesh

    net = FixedFeatureNet(image_size=16, feature_dim=32)
    mesh = create_mesh()
    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, (128, 16, 16, 3)).astype(np.float32)

    results = []
    for m in (None, mesh):
        acc = DeviceEvalAccumulator(net, 32, splits=4, split_size=32, mesh=m)
        for chunk in np.split(imgs, 4):
            acc.add_images(chunk)
        results.append((*acc.moments(), *acc.inception_score()))
    (mu_a, cov_a, is_a, std_a), (mu_b, cov_b, is_b, std_b) = results
    np.testing.assert_allclose(mu_a, mu_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cov_a, cov_b, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(is_a, is_b, rtol=1e-5)
    np.testing.assert_allclose(std_a, std_b, rtol=1e-4, atol=1e-6)


def test_evaluate_generator_fused_sampling_end_to_end():
    """evaluate_generator folds sampler+features into one jitted step and
    reports the batch-quantization remainder in its JSON (VERDICT Weak #7)."""
    from gan_lib_tensorflow_tpu.eval.features import FixedFeatureNet

    net = FixedFeatureNet(image_size=16, feature_dim=32)

    def sample(rng):
        return jax.random.uniform(rng, (50, 16, 16, 3), minval=-1, maxval=1)

    real = np.random.default_rng(3).uniform(
        -1, 1, (400, 16, 16, 3)).astype(np.float32)
    mu_r, cov_r = ev.compute_statistics(net, iter(np.split(real, 8)), 32)
    out = ev.evaluate_generator(
        sample, net, 32, n_samples=420, batch_size=50, splits=4,
        real_stats=(mu_r, cov_r))
    assert out["samples_evaluated"] == 400
    assert out["samples_dropped"] == 20
    assert np.isfinite(out["fid"]) and out["fid"] < 5.0  # same distribution
    assert np.isfinite(out["inception_score"])


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
