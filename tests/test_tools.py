"""Tests for the repo tools: the PGGAN sweep benchmark and the run plotter
(artifact generators behind BASELINE.md's round-2 tables)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_pggan_time_config_tiny():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import bench_pggan
    finally:
        sys.path.pop(0)
    row = bench_pggan.time_config(resolution=8, batch=4, remat_from=8,
                                  fused_from=8, timed_steps=2,
                                  width_mul=1 / 64)
    assert row["ms_per_step"] > 0
    assert row["img_per_sec"] > 0


def test_plot_run_renders_artifact(tmp_path):
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    recs = [
        {"step": 100, "d_loss": 1.0, "g_loss": 2.0},
        {"step": 200, "d_loss": 0.8, "g_loss": 1.9, "fid": 30.0,
         "inception_score": 1.5},
        {"step": 300, "d_loss": 0.7, "g_loss": 1.8, "fid": 25.0,
         "inception_score": 1.7},
    ]
    with open(run_dir / "log.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    out = tmp_path / "summary.png"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plot_run.py"),
         str(run_dir), "--out", str(out)],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert out.exists() and out.stat().st_size > 1000


def test_plot_ladder_renders_and_orders_phases(tmp_path):
    """plot_ladder: phases sort 4x4_s < 8x8_t < 8x8_s and non-phase dirs are
    ignored; renders one figure from the concatenated logs."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import plot_ladder

    run = tmp_path / "ladder"
    for name, w in [("8x8_stabilize", 0.5), ("4x4_stabilize", 1.0),
                    ("8x8_transition", 0.7)]:
        d = run / name
        d.mkdir(parents=True)
        with open(d / "log.jsonl", "w") as f:
            for s in (100, 200):
                f.write(json.dumps({"step": s, "wdist": w, "gp": 0.01}) + "\n")
    (run / "not_a_phase").mkdir()

    phases = plot_ladder.load_ladder(str(run))
    assert [n for n, _ in phases] == ["4x4_stabilize", "8x8_transition",
                                      "8x8_stabilize"]
    out = tmp_path / "ladder.png"
    plot_ladder.main([str(run), "--out", str(out)])
    assert out.exists() and out.stat().st_size > 1000


def _write_log(run_dir, rows):
    run_dir.mkdir(parents=True, exist_ok=True)
    with open(run_dir / "log.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_report_run_healthy_shape(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import report_run
    finally:
        sys.path.pop(0)
    run = tmp_path / "run"
    rows = []
    # healthy hinge: early transient ~2 decaying into a ~0.9 band
    for i, step in enumerate(range(500, 10001, 500)):
        d = 2.0 if i < 2 else 0.9 + 0.01 * (i % 3)
        rows.append({"step": step, "d_loss": d, "g_loss": -0.5,
                     "sec_per_step": 0.013})
    rows[-1]["fid"] = 24.0
    _write_log(run, rows)
    (run / "ckpt" / "10000").mkdir(parents=True)
    rep = report_run.analyze(str(run))
    assert rep["flags"] == []
    assert rep["last_step"] == 10000
    assert rep["eval"]["fid"]["best"]["value"] == 24.0
    assert rep["checkpoints"] == [10000]
    band = rep["losses"]["d_loss"]["final_decile"]["mean"]
    assert 0.8 < band < 1.0
    # CLI exit code 0 on a clean run
    rc = report_run.main([str(run)])
    assert rc == 0


def test_report_run_flags_saturated_d(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import report_run
    finally:
        sys.path.pop(0)
    run = tmp_path / "sat"
    rows = [{"step": s, "d_loss": 0.0, "g_loss": 1.0}
            for s in range(100, 2001, 100)]
    _write_log(run, rows)
    rep = report_run.analyze(str(run))
    assert any("saturated" in fl for fl in rep["flags"])
    assert report_run.main([str(run)]) == 1


def test_prepack_synthetic_pyramid(tmp_path):
    """--resolutions writes a pyramid train_pggan can consume: every member
    opens through open_pyramid, lower members are exact 2x box downsamples
    of the base render (same path prepack_dataset uses), and batches land
    in [-1, 1]."""
    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import prepack_synthetic
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "pyr")
    prepack_synthetic.main(["--out", out, "--n", "16", "--size", "16",
                            "--resolutions", "16,8,4", "--seed", "3"])

    from gan_lib_tensorflow_tpu import data as data_lib
    for res in (16, 8, 4):
        src = data_lib.open_pyramid(out, batch_size=4, resolution=res)
        batch = next(iter(src))
        img = batch["image"] if isinstance(batch, dict) else batch
        img = np.asarray(img)
        assert img.shape[-3:] == (res, res, 3)
        assert img.min() >= -1.0 and img.max() <= 1.0

    # downsample exactness: r0008 is the 2x box mean of r0016 (quantized)
    top = np.memmap(os.path.join(out, "r0016", "images.u8"), np.uint8,
                    mode="r", shape=(16, 16, 16, 3))
    mid = np.memmap(os.path.join(out, "r0008", "images.u8"), np.uint8,
                    mode="r", shape=(16, 8, 8, 3))
    want = np.asarray(top, np.float32).reshape(16, 8, 2, 8, 2, 3).mean((2, 4))
    np.testing.assert_allclose(np.asarray(mid, np.float32), want, atol=1.0)


def test_plot_dose_response_sorts_and_fails_loud(tmp_path):
    """plot_dose_response: points sort by budget regardless of --run order,
    a run without its eval JSON fails loudly (unevaluated runs must not
    silently drop out of the artifact), and a figure renders."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import plot_dose_response

    for name, budget, swd64 in [("a", 96000, 32.3), ("b", 32000, 61.1)]:
        d = tmp_path / name
        d.mkdir()
        rec = {"swd_128": 35.0, "swd_64": swd64, "swd_32": 34.0,
               "swd_16": 36.0, "swd_avg": 41.0}
        with open(d / "eval_karras_128.json", "w") as f:
            json.dump(rec, f)

    pts = plot_dose_response.load_points(
        [f"{tmp_path}/a=96000", f"{tmp_path}/b=32000"])
    assert [b for b, _ in pts] == [32000, 96000]
    assert pts[0][1]["swd_64"] == 61.1

    (tmp_path / "c").mkdir()
    with pytest.raises(SystemExit):
        plot_dose_response.load_points([f"{tmp_path}/c=192000"])
    with pytest.raises(SystemExit):
        plot_dose_response.load_points([f"{tmp_path}/a"])  # budget missing

    out = tmp_path / "dose.png"
    plot_dose_response.main([
        "--run", f"{tmp_path}/b=32000", "--run", f"{tmp_path}/a=96000",
        "--out", str(out)])
    assert out.exists() and out.stat().st_size > 1000
