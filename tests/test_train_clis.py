"""End-to-end smoke of every per-model train CLI ``main()``.

The reference exposes per-model train scripts as its public surface
([RECON] ``SNGAN/train.py``, ``ACGAN/train.py``, ``pix2pix/pix2pix.py``,
ImageNet SNGAN train script; SURVEY.md §1 L5). The evaluate/sample/
north-star CLIs already have main() tests; these cover the four training
entry points: argparse wiring -> build -> data resolution -> fused step ->
loop artifacts (log.jsonl, sample grid, checkpoint), a few steps on CPU.
"""

import json
import os

import pytest


def _assert_run_artifacts(out_dir, expect_samples=True):
    log = os.path.join(out_dir, "log.jsonl")
    assert os.path.exists(log), "loop wrote no scalar log"
    recs = [json.loads(l) for l in open(log)]
    steps = [r["step"] for r in recs if "step" in r]
    assert steps and steps[-1] == 2
    # every logged metric finite (the loop's NaN guard would have raised,
    # but assert on the artifact too)
    for r in recs:
        for k, v in r.items():
            if isinstance(v, float):
                assert v == v, f"non-finite {k} in log"
    if expect_samples:
        samples = os.listdir(os.path.join(out_dir, "samples"))
        assert samples, "no sample grid written"
    assert os.listdir(os.path.join(out_dir, "ckpt")), "no checkpoint written"


def _common(out_dir):
    # --compile-cache into the per-test tmp: exercises the flag end-to-end
    # and keeps test executables out of the repo-local .jax_cache
    return ["--steps", "2", "--log-every", "1", "--sample-every", "2",
            "--ckpt-every", "2", "--out-dir", out_dir,
            "--compute-dtype", "fp32", "--no-mesh", "--seed", "0",
            "--compile-cache", os.path.join(out_dir, "xla_cache")]


def test_train_sngan_cli_smoke(tmp_path):
    from gan_lib_tensorflow_tpu.cli import train_sngan
    out = str(tmp_path / "run")
    train_sngan.main(_common(out) + ["--batch-size", "8", "--n-critic", "1",
                                     "--data", "fake", "--ema-decay", "0.999"])
    _assert_run_artifacts(out)


def test_train_acgan_cli_smoke(tmp_path):
    from gan_lib_tensorflow_tpu.cli import train_acgan
    out = str(tmp_path / "run")
    train_acgan.main(_common(out) + ["--batch-size", "16", "--data", "fake"])
    _assert_run_artifacts(out)


def test_train_pix2pix_cli_smoke(tmp_path):
    from gan_lib_tensorflow_tpu.cli import train_pix2pix
    out = str(tmp_path / "run")
    train_pix2pix.main(_common(out) + [
        "--batch-size", "1", "--image-size", "64", "--ngf", "8", "--ndf", "8",
        "--data", "fake-det"])
    _assert_run_artifacts(out)
    # test mode reuses the checkpoint it just wrote and emits the HTML gallery
    train_pix2pix.main(["--mode", "test", "--out-dir", out,
                        "--image-size", "64", "--ngf", "8", "--ndf", "8",
                        "--batch-size", "1", "--data", "fake-det",
                        "--max-test-images", "2", "--compute-dtype", "fp32",
                        "--no-mesh"])
    assert os.path.exists(os.path.join(out, "index.html"))
    metrics = json.load(open(os.path.join(out, "test_metrics.json")))
    assert metrics["n_examples"] == 2 and 0.0 <= metrics["test_l1"] < 2.0


def test_train_sngan_imagenet_cli_smoke(tmp_path):
    from gan_lib_tensorflow_tpu.cli import train_sngan_imagenet
    out = str(tmp_path / "run")
    train_sngan_imagenet.main(_common(out) + [
        "--batch-size", "4", "--n-critic", "1", "--width-mul", "0.125",
        "--num-classes", "10", "--data", "fake", "--ema-decay", "0"])
    _assert_run_artifacts(out)


@pytest.mark.slow
def test_train_sngan_cli_tp_shards_smoke(tmp_path):
    """--tp-shards as a CLI surface (VERDICT r4 Missing #5): the stock
    train_sngan entry runs DP x TP end-to-end on the virtual 8-device mesh
    (data=4, model=2) — argparse -> (data,model) mesh -> state_layout ->
    jit_train_step(state_shardings=...) -> loop artifacts."""
    from gan_lib_tensorflow_tpu.cli import train_sngan
    out = str(tmp_path / "run")
    train_sngan.main(["--steps", "2", "--log-every", "1",
                      "--sample-every", "2", "--ckpt-every", "2",
                      "--out-dir", out, "--compute-dtype", "fp32",
                      "--seed", "0", "--batch-size", "8", "--n-critic", "1",
                      "--data", "fake", "--ema-decay", "0.999",
                      "--tp-shards", "2"])
    _assert_run_artifacts(out)


def test_compile_cache_helper(tmp_path):
    """enable_compile_cache points XLA's persistent cache at the requested
    dir ('none' is a no-op; default = repo-local .jax_cache, the one
    bench.py primes). Every CLI calls this via common.configure so tunnel
    recompiles are paid once per distinct computation, not per process."""
    import jax
    from gan_lib_tensorflow_tpu.cli import common
    prev = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "cache")
        assert common.enable_compile_cache(d) == d
        assert jax.config.jax_compilation_cache_dir == d
        assert common.enable_compile_cache("none") is None
        assert jax.config.jax_compilation_cache_dir == d  # untouched
        default = common.enable_compile_cache(None)
        assert default is not None and default.endswith(".jax_cache")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_tp_shards_conflicts_fail_loudly(tmp_path):
    """--no-mesh + --tp-shards conflict and the PGGAN ladder's unsupported
    --tp-shards both exit with an explanation instead of silently training
    replicated params on a 'model' axis."""
    from gan_lib_tensorflow_tpu.cli import train_pggan, train_sngan
    with pytest.raises(SystemExit):
        train_sngan.main(["--steps", "1", "--out-dir", str(tmp_path / "a"),
                          "--no-mesh", "--tp-shards", "2", "--data", "fake"])
    with pytest.raises(SystemExit):
        train_pggan.main(["--steps-per-phase", "1",
                          "--out-dir", str(tmp_path / "b"),
                          "--final-resolution", "8",
                          "--tp-shards", "2", "--data", "fake"])
