"""Data pipeline tests: CIFAR pickle fixture, ImageNet npz fixture, paired
folder (real PNG files), ThreadedSource, DeviceFakeImages, microbatch stacks."""

import os
import pickle

import numpy as np
import pytest

from gan_lib_tensorflow_tpu import data


def _write_cifar_fixture(tmp_path, n=64):
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": rng.integers(0, 256, (n, 3072), np.uint8),
                         b"labels": rng.integers(0, 10, n).tolist()}, f)
    with open(d / "test_batch", "wb") as f:
        pickle.dump({b"data": rng.integers(0, 256, (n, 3072), np.uint8),
                     b"labels": rng.integers(0, 10, n).tolist()}, f)
    return str(d)


def test_cifar10_loader_from_pickles(tmp_path):
    path = _write_cifar_fixture(tmp_path)
    src = data.Cifar10(batch_size=32, data_dir=path, seed=0)
    b = next(iter(src))
    assert b["image"].shape == (32, 32, 32, 3)
    assert b["image"].dtype == np.float32
    assert -1.001 <= b["image"].min() and b["image"].max() <= 1.001
    assert b["label"].dtype == np.int32 and b["label"].max() < 10
    # deterministic given seed
    b2 = next(iter(data.Cifar10(batch_size=32, data_dir=path, seed=0)))
    np.testing.assert_array_equal(b["image"], b2["image"])


def test_imagenet_npz_loader(tmp_path):
    rng = np.random.default_rng(0)
    np.savez(tmp_path / "train_data_batch_1.npz",
             data=rng.integers(0, 256, (20, 3 * 16 * 16), np.uint8),
             labels=rng.integers(1, 11, 20))  # 1-based like downsampled-ImageNet
    src = data.ImageNetNpz(str(tmp_path), batch_size=8, image_size=16)
    b = next(iter(src))
    assert b["image"].shape == (8, 16, 16, 3)
    assert b["label"].min() >= 0  # rebased to 0


def test_paired_folder_jitter(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(3):
        combined = rng.integers(0, 256, (64, 128, 3), np.uint8)  # A|B halves
        Image.fromarray(combined).save(tmp_path / f"{i}.png")
    src = data.PairedImageFolder(str(tmp_path), batch_size=2, image_size=32,
                                 scale_size=40, seed=0)
    b = next(iter(src))
    assert b["input"].shape == (2, 32, 32, 3)
    assert b["target"].shape == (2, 32, 32, 3)
    # eval_iter: deterministic, named
    ex = next(src.eval_iter())
    assert ex["input"].shape == (1, 32, 32, 3) and "name" in ex


def test_threaded_source_delivers():
    src = data.ThreadedSource(
        data.FakeImages(batch_size=8, image_size=8, seed=0), num_workers=2)
    it = iter(src)
    batches = [next(it) for _ in range(5)]
    for b in batches:
        assert b["image"].shape == (8, 8, 8, 3)
        assert np.isfinite(b["image"]).all()


def test_device_fake_images_stacked_on_device():
    src = data.DeviceFakeImages(batch_size=4, image_size=8, num_classes=3,
                                n_micro=2, seed=0)
    assert src.yields_stacks
    b = next(iter(src))
    assert b["image"].shape == (2, 4, 8, 8, 3)
    assert b["label"].shape == (2, 4)
    assert int(b["label"].max()) < 3
    import jax
    assert isinstance(b["image"], jax.Array)


def test_microbatch_stack_shapes():
    src = data.FakeImages(batch_size=4, image_size=8, seed=0)
    b = next(iter(data.microbatch_stack(src, 3)))
    assert b["image"].shape == (3, 4, 8, 8, 3)
    b1 = next(iter(data.microbatch_stack(src, 1)))
    assert b1["image"].shape == (1, 4, 8, 8, 3)

def test_rich_style_twins_match_distribution():
    """'rich' host and device twins: same shapes/range and matching low-order
    moments (distribution twins, not bitwise)."""
    import jax
    from gan_lib_tensorflow_tpu import data

    h = np.concatenate([
        next(iter(data.FakeImages(batch_size=256, image_size=16,
                                  style="rich", seed=s)))["image"]
        for s in range(2)])
    d = np.asarray(jax.device_get(next(iter(data.DeviceFakeImages(
        batch_size=512, image_size=16, style="rich", seed=9)))["image"]))[0]
    assert h.shape == (512, 16, 16, 3) and d.shape == (512, 16, 16, 3)
    assert h.min() >= -1 and h.max() <= 1
    assert abs(h.mean() - d.mean()) < 0.02
    assert abs(h.std() - d.std()) < 0.02
    # intrinsic diversity: per-image means must vary (the degenerate 'blobs'
    # style is why long GAN soaks diverged; rich must not collapse like that)
    per_img = h.reshape(512, -1).std(axis=1)
    assert per_img.std() > 0.01


def test_fake_style_validation():
    from gan_lib_tensorflow_tpu import data
    with pytest.raises(ValueError):
        data.FakeImages(style="nope")
    with pytest.raises(ValueError):
        data.DeviceFakeImages(style="nope")


def test_paired_device_twin_matches_host_distribution():
    """DeviceFakePairedImages == FakePairedImages distributionally: same
    shapes/range, matching edge-input statistics, deterministic colors agree
    as a function of geometry (not bitwise — independent RNG streams)."""
    import jax
    from gan_lib_tensorflow_tpu import data

    host = np.concatenate([b["target"] for b, _ in zip(
        iter(data.FakePairedImages(batch_size=8, image_size=32, seed=3,
                                   deterministic_color=True)), range(8))])
    dev = next(iter(data.DeviceFakePairedImages(
        batch_size=64, image_size=32, seed=11, n_micro=1,
        deterministic_color=True)))
    d_inp = np.asarray(jax.device_get(dev["input"]))[0]
    d_tgt = np.asarray(jax.device_get(dev["target"]))[0]
    assert d_inp.shape == d_tgt.shape == (64, 32, 32, 3)
    assert d_tgt.min() >= -1 and d_tgt.max() <= 1
    # background fraction and overall moments line up between the twins
    assert abs((host == -1).mean() - (d_tgt == -1).mean()) < 0.1
    assert abs(host.mean() - d_tgt.mean()) < 0.1
    # the edge input is grayscale (3 equal channels) and mostly background
    assert np.allclose(d_inp[..., 0], d_inp[..., 1])
    assert (d_inp == -1).mean() > 0.5
