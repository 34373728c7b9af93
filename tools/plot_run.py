"""Render a training-run artifact figure from a run dir's ``log.jsonl``:
loss curves (d_loss/g_loss) plus the FID/IS trend on a twin panel — the
loss-curve-shape comparison artifact for BASELINE.md (the reference's
``plot.py`` pickled history + per-stat JPGs, folded into one figure).

Usage: python tools/plot_run.py runs/long_sngan --out docs/artifacts/sngan_long_run.png
"""

from __future__ import annotations

import argparse
import json
import os


def load_history(run_dir: str):
    hist = {}
    with open(os.path.join(run_dir, "log.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "step" not in rec:  # config/header records carry no step
                continue
            step = rec.pop("step")
            for k, v in rec.items():
                hist.setdefault(k, []).append((step, v))
    return hist


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("--out", default=None)
    p.add_argument("--title", default="SNGAN CIFAR-10 long run (1x TPU v5e)")
    args = p.parse_args()
    out = args.out or os.path.join(args.run_dir, "run_summary.png")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    hist = load_history(args.run_dir)
    has_fid = "fid" in hist
    fig, axes = plt.subplots(1, 2 if has_fid else 1,
                             figsize=(11 if has_fid else 6, 3.5))
    ax0 = axes[0] if has_fid else axes
    for k in ("d_loss", "g_loss"):
        if k in hist:
            xs, ys = zip(*hist[k])
            ax0.plot(xs, ys, label=k, linewidth=0.8)
    ax0.set_xlabel("fused step")
    ax0.set_ylabel("loss")
    ax0.legend()
    ax0.set_title("losses")
    if has_fid:
        xs, ys = zip(*hist["fid"])
        handles = axes[1].plot(xs, ys, marker="o", label="FID")
        axes[1].set_xlabel("fused step")
        axes[1].set_ylabel("FID (fixed extractor)")
        axes[1].set_title("FID trend")
        if "inception_score" in hist:
            tw = axes[1].twinx()
            xs2, ys2 = zip(*hist["inception_score"])
            handles += tw.plot(xs2, ys2, color="tab:green", marker="s",
                               label="IS")
            tw.set_ylabel("IS")
        # one merged legend: twin-axis handles don't show up in ax.legend()
        axes[1].legend(handles, [h.get_label() for h in handles],
                       loc="upper right")
    fig.suptitle(args.title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
