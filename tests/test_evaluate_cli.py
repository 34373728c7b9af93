"""cli.evaluate surface: PGGAN MS-SSIM/SWD entry and real-moment caching
(VERDICT r2 items #1/#10)."""

import json
import os
import types

import jax
import jax.numpy as jnp
import numpy as np

from gan_lib_tensorflow_tpu.cli import evaluate as eval_cli
from gan_lib_tensorflow_tpu.eval.features import FixedFeatureNet
from gan_lib_tensorflow_tpu.models import pggan
from gan_lib_tensorflow_tpu.train import CheckpointManager


def _pggan_ckpt(tmp_path, res=16, width=1 / 16):
    g = pggan.PGGANGenerator(resolution=res, width_mul=width)
    params = g.init(jax.random.PRNGKey(0),
                    jnp.zeros((2, g.z_dim)), jnp.float32(1.0))["params"]
    ckpt_dir = str(tmp_path / "ckpt")
    cm = CheckpointManager(ckpt_dir)
    cm.save(3, {"g_params": params, "g_state": {}, "step": 3,
                "alpha": jnp.float32(1.0)}, wait=True)
    cm.close()
    return ckpt_dir


def test_evaluate_pggan_ms_ssim_and_swd(tmp_path):
    ckpt_dir = _pggan_ckpt(tmp_path)

    # a tiny "CelebA-HQ" folder so the SWD branch also runs
    from PIL import Image
    real_dir = tmp_path / "celeba"
    real_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 256, (16, 16, 3), np.uint8)
                        ).save(real_dir / f"{i:03d}.png")

    out_json = str(tmp_path / "result.json")
    eval_cli.main(["--model", "pggan", "--ckpt-dir", ckpt_dir,
                   "--resolution", "16", "--width-mul", str(1 / 16),
                   "--n-samples", "40", "--batch-size", "4",
                   "--data", str(real_dir), "--out-json", out_json])
    rec = json.loads(open(out_json).read())
    assert np.isfinite(rec["ms_ssim"]) and 0 <= rec["ms_ssim"] <= 1
    assert rec["resolution"] == 16 and rec["step"] == 3
    assert np.isfinite(rec["swd_16"]) and np.isfinite(rec["swd_avg"])
    assert rec["ms_ssim_pairs"] > 0 and rec["swd_images"] > 0


def test_evaluate_pggan_without_real_dir_skips_swd(tmp_path, capsys):
    ckpt_dir = _pggan_ckpt(tmp_path)
    eval_cli.main(["--model", "pggan", "--ckpt-dir", ckpt_dir,
                   "--resolution", "16", "--width-mul", str(1 / 16),
                   "--n-samples", "16", "--batch-size", "4"])
    cap = capsys.readouterr().out
    rec = json.loads(cap.strip().splitlines()[-1])
    assert "ms_ssim" in rec and "swd_avg" not in rec


def test_evaluate_pggan_device_real_source(tmp_path):
    """--data device-rich renders the SWD real side on-accelerator (no
    prepacked store needed — the path the 1024² Karras eval uses)."""
    ckpt_dir = _pggan_ckpt(tmp_path)
    out_json = str(tmp_path / "result.json")
    eval_cli.main(["--model", "pggan", "--ckpt-dir", ckpt_dir,
                   "--resolution", "16", "--width-mul", str(1 / 16),
                   "--n-samples", "40", "--batch-size", "4",
                   "--data", "device-rich", "--out-json", out_json])
    rec = json.loads(open(out_json).read())
    assert np.isfinite(rec["swd_16"]) and np.isfinite(rec["swd_avg"])
    assert rec["swd_images"] > 0


def test_real_moments_npz_cache_roundtrip(tmp_path):
    """First call computes + saves; second call loads without touching the
    data source (VERDICT Missing #1: cached real moments)."""
    net = FixedFeatureNet(image_size=32, feature_dim=16)
    cache = str(tmp_path / "stats.npz")
    args = types.SimpleNamespace(
        data="fake", seed=0, batch_size=8, n_real=32,
        real_stats_npz=cache, inception_weights=None)
    (mu1, cov1), src1 = eval_cli.real_moments(args, net)
    assert os.path.exists(cache) and src1 == "synthetic"

    # poison the data path: a cache hit must not read any data source
    args2 = types.SimpleNamespace(
        data="/definitely/not/here", seed=0, batch_size=8, n_real=32,
        real_stats_npz=cache, inception_weights=None)
    (mu2, cov2), _ = eval_cli.real_moments(args2, net)
    np.testing.assert_array_equal(mu1, mu2)
    np.testing.assert_array_equal(cov1, cov2)


def test_evaluate_imagenet_conditional_entry(tmp_path, monkeypatch):
    """--model imagenet: SNGAN-projection 128^2 conditional IS/FID surface
    (class-conditional sampler, 128^2 real-source resolution)."""
    from gan_lib_tensorflow_tpu.models import sngan

    w, n_cls = 1 / 64, 6
    g = sngan.imagenet128_generator(num_classes=n_cls, width_mul=w)
    variables = g.init(jax.random.PRNGKey(0), jnp.zeros((2, g.z_dim)),
                       jnp.zeros((2,), jnp.int32), train=False)
    params = variables["params"]
    g_state = {k: v for k, v in variables.items() if k != "params"}
    ckpt_dir = str(tmp_path / "ckpt")
    cm = CheckpointManager(ckpt_dir)
    cm.save(7, {"g_params": params, "g_state": g_state, "step": 7}, wait=True)
    cm.close()

    # stand-in extractor at 128^2 so the test stays CPU-cheap
    monkeypatch.setattr(
        eval_cli, "InceptionV3Features",
        lambda params_npz=None: FixedFeatureNet(image_size=128,
                                                feature_dim=16))
    out_json = str(tmp_path / "result.json")
    eval_cli.main(["--model", "imagenet", "--ckpt-dir", ckpt_dir,
                   "--num-classes", str(n_cls), "--width-mul", str(w),
                   "--n-samples", "20", "--batch-size", "4", "--n-real", "8",
                   "--data", "fake", "--out-json", out_json])
    rec = json.loads(open(out_json).read())
    assert rec["step"] == 7
    assert np.isfinite(rec["inception_score"]) and np.isfinite(rec["fid"])
    assert rec["real_source"] == "synthetic"


def test_evaluate_imagenet_packed_store_size_mismatch(tmp_path):
    """A packed real store whose resolution differs from the model's output
    fails loudly instead of silently computing cross-resolution FID."""
    import pytest
    from gan_lib_tensorflow_tpu.data import PackedImageStore

    # write a tiny 32^2 packed store via the prepack tool's writer format
    import subprocess, sys as _sys
    from PIL import Image
    src = tmp_path / "imgs"; src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), np.uint8)
                        ).save(src / f"{i}.png")
    store = str(tmp_path / "store")
    subprocess.run([_sys.executable, "tools/prepack_dataset.py",
                    "--src", str(src), "--out", store, "--size", "32"],
                   check=True,
                   cwd=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
    args = types.SimpleNamespace(data=store, seed=0, batch_size=2, n_real=4,
                                 real_stats_npz=None, inception_weights=None,
                                 model="imagenet")
    with pytest.raises(ValueError, match="32\\^2"):
        eval_cli._real_image_source(args, image_size=128)


def test_real_moments_cache_extractor_mismatch_refused(tmp_path):
    """Cached moments from one feature extractor must not be silently
    compared against features from another (self-review fix)."""
    import pytest
    net = FixedFeatureNet(image_size=32, feature_dim=16)
    cache = str(tmp_path / "stats.npz")
    args = types.SimpleNamespace(
        data="fake", seed=0, batch_size=8, n_real=16,
        real_stats_npz=cache, inception_weights=None)
    eval_cli.real_moments(args, net)
    args_pre = types.SimpleNamespace(
        data="fake", seed=0, batch_size=8, n_real=16,
        real_stats_npz=cache, inception_weights="some_weights.npz")
    with pytest.raises(ValueError, match="inception_v3_random_init"):
        eval_cli.real_moments(args_pre, net)


def test_real_moments_n_real_below_batch_raises(tmp_path):
    import pytest
    args = types.SimpleNamespace(
        data="fake", seed=0, batch_size=100, n_real=50,
        real_stats_npz=None, inception_weights=None)
    with pytest.raises(ValueError, match="zero real batches"):
        eval_cli.real_moments(args, None)


def test_real_image_source_explicit_cifar_resolution_mismatch():
    import pytest
    args = types.SimpleNamespace(data="cifar10", seed=0, batch_size=8,
                                 model="imagenet")
    with pytest.raises(ValueError, match=r"32\^2"):
        eval_cli._real_image_source(args, image_size=128)


def test_evaluate_pggan_packed_store_real_source(tmp_path):
    """--data pointing at a prepacked store (the format train_pggan consumes)
    must feed the SWD branch instead of crashing in ImageFolderFlat."""
    from gan_lib_tensorflow_tpu.data import packed

    ckpt_dir = _pggan_ckpt(tmp_path)
    store = tmp_path / "store"
    imgs, _ = packed.write_store(str(store), 8, 16, 16, 3)
    imgs[:] = np.random.default_rng(0).integers(0, 256, imgs.shape, np.uint8)
    packed.finalize_store(str(store), imgs, None)

    out_json = str(tmp_path / "result.json")
    eval_cli.main(["--model", "pggan", "--ckpt-dir", ckpt_dir,
                   "--resolution", "16", "--width-mul", str(1 / 16),
                   "--n-samples", "40", "--batch-size", "4",
                   "--data", str(store), "--out-json", out_json])
    rec = json.loads(open(out_json).read())
    assert np.isfinite(rec["swd_16"]) and np.isfinite(rec["swd_avg"])
