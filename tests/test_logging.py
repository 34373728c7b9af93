"""ScalarLogger: JSONL history, running means, curve PNGs (plot.py parity)."""

import json
import os

from gan_lib_tensorflow_tpu.utils import ScalarLogger


def test_jsonl_and_running_means(tmp_path):
    lg = ScalarLogger(str(tmp_path))
    lg.log(1, {"loss": 2.0})
    lg.log(2, {"loss": 4.0})
    means = lg.flush(2)
    assert means["loss"] == 3.0  # mean since last flush
    lg.log(3, {"loss": 1.0})
    lg.flush(3, extra={"fid": 12.5})
    lines = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    assert lines[0] == {"step": 2, "loss": 3.0}
    assert lines[1]["fid"] == 12.5 and lines[1]["loss"] == 1.0
    assert "sec_per_step" in lines[1]  # timing appears from 2nd flush on


def test_curve_pngs(tmp_path):
    lg = ScalarLogger(str(tmp_path), curves=True)
    for it in (1, 2, 3):
        lg.log(it, {"d/loss": float(it)})
        lg.flush(it)
    assert os.path.exists(tmp_path / "d_loss.png")  # '/' sanitized
