"""--data resolution rules (self-review regression): explicit paths must
resolve or fail loudly — never a silent synthetic fallback — and worker
failures must surface, not hang."""

import types

import numpy as np
import pytest

from gan_lib_tensorflow_tpu import data
from gan_lib_tensorflow_tpu.cli import common


def _args(data, seed=0):
    return types.SimpleNamespace(data=data, seed=seed, no_mesh=True)


def test_fake_and_auto_fallback():
    src = common.image_source(_args("fake"), 4, 8, 3)
    assert isinstance(src, data.ThreadedSource)
    # auto falls back to synthetic when no CIFAR on disk (note printed)
    src = common.image_source(_args("auto"), 4, 8, 3)
    assert isinstance(src, data.ThreadedSource)


def test_explicit_missing_path_fails_loudly():
    with pytest.raises(FileNotFoundError, match="no such directory"):
        common.image_source(_args("/definitely/not/here"), 4, 8, 3)


def test_explicit_cifar_dir_resolves(tmp_path):
    import pickle
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": rng.integers(0, 256, (8, 3072), np.uint8),
                         b"labels": rng.integers(0, 10, 8).tolist()}, f)
    src = common.image_source(_args(str(d)), 4, 32, 10)
    # 40 uint8 images trivially fit the HBM budget -> device-cached stacks
    assert isinstance(src, data.DeviceCachedStore)
    b = next(iter(src))
    assert b["image"].shape == (1, 4, 32, 32, 3)
    assert b["image"].dtype == np.float32 and float(b["image"].max()) <= 1.001

    import types
    off = types.SimpleNamespace(data=str(d), seed=0, no_mesh=True,
                                device_cache="off")
    b = next(iter(common.image_source(off, 4, 32, 10)))
    assert b["image"].shape == (4, 32, 32, 3)


def test_threaded_source_propagates_worker_errors():
    class Bad(data.DataSource):
        batch_size = 1
        seed = 0

        def __iter__(self):
            yield {"x": np.zeros(1)}
            raise IOError("corrupt image")

    it = iter(data.ThreadedSource(Bad(), num_workers=1, depth=2))
    with pytest.raises(RuntimeError, match="worker failed"):
        for _ in range(5):
            next(it)


def test_rich_styles_resolve():
    src = common.image_source(_args("fake-rich"), 4, 8, 3)
    assert isinstance(src, data.ThreadedSource)
    b = next(iter(src))
    assert b["image"].shape == (4, 8, 8, 3)
    # device-rich on a single device returns the jitted on-device twin
    src = common.image_source(_args("device-rich"), 4, 8, 3, n_micro=2)
    assert isinstance(src, data.DeviceFakeImages)
    b = next(iter(src))
    assert b["image"].shape == (2, 4, 8, 8, 3)


def test_paired_deterministic_color_is_a_function_of_geometry():
    """fake-det: same geometry (seed) => same colors; the color channel is
    predictable from the edges, unlike the default random-color pairs."""
    a = next(iter(data.FakePairedImages(batch_size=2, image_size=32, seed=7,
                                        deterministic_color=True)))
    b = next(iter(data.FakePairedImages(batch_size=2, image_size=32, seed=7,
                                        deterministic_color=True)))
    np.testing.assert_array_equal(a["target"], b["target"])
    assert a["input"].shape == a["target"].shape == (2, 32, 32, 3)
    # non-background pixels carry non-gray color (the learnable signal)
    fg = a["target"][a["target"] != -1.0]
    assert fg.size > 0 and np.std(fg) > 0.1


def _mk_store(path, size=16, n=8, labeled=False):
    from gan_lib_tensorflow_tpu.data import packed
    imgs, labels = packed.write_store(str(path), n, size, size, 3,
                                      classes=["a", "b"] if labeled else None)
    imgs[:] = 1
    packed.finalize_store(str(path), imgs, labels)
    return str(path)


def test_packed_store_resolution_mismatch_fails_loudly(tmp_path):
    """Self-review regression: a 16^2 store fed to a 32^2 model must raise,
    not silently train the fully-convolutional D on wrong-size reals."""
    store = _mk_store(tmp_path / "store", size=16)
    with pytest.raises(ValueError, match=r"16\^2"):
        common.image_source(_args(store), 4, 32, 0)


def test_packed_store_missing_labels_for_conditional_model(tmp_path):
    store = _mk_store(tmp_path / "store", size=16, labeled=False)
    with pytest.raises(ValueError, match="labels.npy"):
        common.image_source(_args(store), 4, 16, 10)


def test_packed_store_matching_resolution_resolves(tmp_path):
    store = _mk_store(tmp_path / "store", size=16, labeled=True)
    src = common.image_source(_args(store), 4, 16, 2)
    # small store + default auto policy -> device-cached [n_micro, B] stacks
    assert isinstance(src, data.DeviceCachedStore)
    b = next(iter(src))
    assert b["image"].shape == (1, 4, 16, 16, 3)
    assert b["label"].shape == (1, 4)
