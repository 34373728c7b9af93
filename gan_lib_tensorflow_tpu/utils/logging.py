"""Scalar logging — the ``common/plot.py`` equivalent.

Reference behavior: ``plot(name, val)`` accumulates, ``tick()`` advances the
step, ``flush()`` prints running means since the last flush, pickles history,
and writes per-stat curve images. TPU-native differences: metrics arrive as a
dict per fused step (device scalars — converted lazily, off the hot path),
history is JSONL (greppable, resumable) instead of a pickle, and curve PNGs
are optional.
"""

from __future__ import annotations

import collections
import json
import os
import time
from typing import Dict, Optional


class ScalarLogger:
    def __init__(self, out_dir: Optional[str] = None, curves: bool = False,
                 tensorboard: bool = False):
        self.out_dir = out_dir
        self.curves = curves
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        self._since_flush: Dict[str, list] = collections.defaultdict(list)
        self._history: Dict[str, list] = collections.defaultdict(list)
        self._t_last: Optional[float] = None
        self._step_last = 0
        self._tb = None
        if tensorboard and out_dir:
            # optional TB scalars (the reference pix2pix writes tf.summary);
            # torch's SummaryWriter works without TensorFlow
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception as e:  # pragma: no cover
                print(f"tensorboard logging unavailable: {e}", flush=True)

    def log(self, step: int, metrics: Dict[str, object]) -> None:
        for k, v in metrics.items():
            self._since_flush[k].append(float(v))

    def log_images(self, step: int, tag: str, images) -> None:
        """TB image summaries (the reference pix2pix's ``tf.summary.image``
        on inputs/outputs/targets). ``images``: NHWC float in [-1, 1].
        No-op unless TB logging is enabled."""
        if self._tb is None:
            return
        import numpy as np
        arr = np.clip((np.asarray(images, np.float32) + 1.0) / 2.0, 0.0, 1.0)
        self._tb.add_images(tag, arr, step, dataformats="NHWC")
        self._tb.flush()

    def flush(self, step: int, extra: Optional[Dict[str, float]] = None) -> Dict[str, float]:
        means = {k: sum(v) / len(v) for k, v in self._since_flush.items() if v}
        if extra:
            means.update(extra)
        now = time.time()
        if self._t_last is not None and step > self._step_last:
            means["sec_per_step"] = (now - self._t_last) / (step - self._step_last)
        self._t_last, self._step_last = now, step
        line = "  ".join(f"{k} {v:.5g}" for k, v in sorted(means.items()))
        print(f"step {step}  {line}", flush=True)
        if self.out_dir:
            with open(os.path.join(self.out_dir, "log.jsonl"), "a") as f:
                f.write(json.dumps({"step": step, **means}) + "\n")
        for k, v in means.items():
            self._history[k].append((step, v))
            if self._tb is not None:
                self._tb.add_scalar(k, v, step)
        if self._tb is not None:
            self._tb.flush()
        self._since_flush.clear()
        if self.curves and self.out_dir:
            self._write_curves()
        return means

    def _write_curves(self) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        for k, hist in self._history.items():
            if len(hist) < 2:
                continue
            xs, ys = zip(*hist)
            plt.figure(figsize=(6, 3))
            plt.plot(xs, ys)
            plt.title(k)
            plt.tight_layout()
            plt.savefig(os.path.join(self.out_dir, f"{k.replace('/', '_')}.png"))
            plt.close()
