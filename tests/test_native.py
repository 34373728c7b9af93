"""Native pipeline kernels vs numpy fallback parity (skips if toolchain or
.so unavailable)."""

import importlib
import os

import numpy as np
import pytest

from gan_lib_tensorflow_tpu.data import native


@pytest.fixture(autouse=True)
def _restore_env():
    yield
    os.environ.pop("GANTPU_NO_NATIVE", None)
    importlib.reload(native)


def _both(fn, *args):
    os.environ.pop("GANTPU_NO_NATIVE", None)
    importlib.reload(native)
    if not native.available():
        pytest.skip("libganpipe.so unavailable")
    a = getattr(native, fn)(*args)
    os.environ["GANTPU_NO_NATIVE"] = "1"
    importlib.reload(native)
    b = getattr(native, fn)(*args)
    return a, b


def test_gather_normalize_parity():
    store = np.random.default_rng(0).integers(0, 256, (100, 8, 8, 3)).astype(np.uint8)
    idx = np.array([3, 99, 0, 42], np.int64)
    a, b = _both("gather_normalize", store, idx)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    assert a.dtype == np.float32
    assert a.min() >= -1.0 - 1e-5 and a.max() <= 1.0 + 1e-5  # 255*(1/127.5)-1 rounds to 1+eps


def test_box_downsample_parity():
    x = np.random.default_rng(0).random((3, 16, 16, 5)).astype(np.float32)
    a, b = _both("box_downsample", x, 4)
    assert a.shape == (3, 4, 4, 5)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_crop_flip_parity():
    img = np.random.default_rng(0).integers(0, 256, (20, 30, 3)).astype(np.uint8)
    for flip in (False, True):
        a, b = _both("crop_flip_normalize", img, 2, 5, 16, flip)
        assert a.shape == (16, 16, 3)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_resize_nearest_parity():
    img = np.random.default_rng(0).integers(0, 256, (10, 14, 3)).astype(np.uint8)
    a, b = _both("resize_nearest", img, 20, 28)
    assert a.shape == (20, 28, 3)
    np.testing.assert_array_equal(a, b)
