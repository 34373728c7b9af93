"""cli.north_star asset gating: the graded path must refuse to run without
real assets (never silently degrade to synthetic), and the asset resolvers
must find what's actually on disk (VERDICT r2 item #2)."""

import os

from gan_lib_tensorflow_tpu.cli import north_star


def test_find_cifar_locates_batches_dir(tmp_path):
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    (d / "data_batch_1").write_bytes(b"x")
    # both the parent and the dir itself resolve
    assert north_star.find_cifar(str(tmp_path)) is not None
    assert north_star.find_cifar(str(d)) is not None
    assert north_star.find_cifar(str(tmp_path / "nope")) is None


def test_resolve_inception_passthrough_and_missing(tmp_path):
    npz = tmp_path / "w.npz"
    npz.write_bytes(b"x")
    assert north_star.resolve_inception(str(npz), str(tmp_path)) == str(npz)
    assert north_star.resolve_inception(str(tmp_path / "gone.npz"),
                                        str(tmp_path)) is None
    assert north_star.resolve_inception(None, str(tmp_path)) is None


def test_graded_run_refuses_without_assets(tmp_path, capsys, monkeypatch):
    # make sure the repo-relative fallback dirs ("data", ~/data) can't
    # accidentally resolve on a machine that has them
    monkeypatch.chdir(tmp_path)
    rc = north_star.main(["--out-dir", str(tmp_path / "ns"),
                          "--data-dir", str(tmp_path / "missing")])
    assert rc == 2
    out = capsys.readouterr().out
    assert "CIFAR-10" in out and "InceptionV3 weights" in out
    assert "nothing trained" in out
    # no training artifacts were produced
    assert not os.path.exists(tmp_path / "ns" / "ckpt")


def test_resolve_inception_cache_keys_on_source(tmp_path, monkeypatch):
    """A converted-weights cache must be invalidated when the RAW source file
    changes (path, mtime, or size) — a stale conversion served for new
    weights would silently grade the north star with the wrong extractor
    (VERDICT r3 Weak #6)."""
    import subprocess

    calls = []

    def fake_run(cmd, check):
        calls.append(list(cmd))
        open(cmd[-1], "wb").write(b"converted")

    monkeypatch.setattr(subprocess, "run", fake_run)
    raw = tmp_path / "weights.h5"
    raw.write_bytes(b"v1")
    out = str(tmp_path)

    c1 = north_star.resolve_inception(str(raw), out)
    assert len(calls) == 1 and os.path.exists(c1)
    # unchanged source: cache hit, no new conversion
    assert north_star.resolve_inception(str(raw), out) == c1
    assert len(calls) == 1
    # replaced source (new mtime+size): MUST re-convert to a new cache entry
    raw.write_bytes(b"v2-different-size")
    os.utime(raw, (1, 1))
    c2 = north_star.resolve_inception(str(raw), out)
    assert c2 != c1 and len(calls) == 2 and os.path.exists(c2)


def test_skip_train_without_checkpoint_fails(tmp_path, capsys):
    rc = north_star.main(["--smoke", "--skip-train",
                          "--out-dir", str(tmp_path / "ns")])
    assert rc == 2
    out = capsys.readouterr().out
    assert "--skip-train: no checkpoint" in out
    # the error must contain the exact command that produces the checkpoint
    assert "python -m gan_lib_tensorflow_tpu.cli.north_star --smoke" in out
