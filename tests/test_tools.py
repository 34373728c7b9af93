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
