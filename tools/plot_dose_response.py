"""Render the SWD dose-response artifact: per-level sliced Wasserstein
distance of the SAME 4^2->128^2 packed-pyramid ladder trained at increasing
per-phase image budgets, one curve per pyramid level (docs/PERF.md round 5
"Dose-response" section). The x axis is images/phase (log2); the reference
schedule's 600k/phase (SURVEY.md section 2.4, PGGAN row) is marked for scale.

Each point is one complete on-chip ladder run evaluated under the identical
Karras-scale protocol (cli.evaluate --model pggan, 16,384 images/side against
the packed store). This is the figure that closes the round-4 "SWD 64^2
outlier" item. The measured curve turned out NON-monotone: 32k->96k halves
every band (budget is the controlling knob, 64^2 falls fastest from the worst
start, confirming the diagnosis), but 96k->192k bends back up in the mid/fine
bands — ~12 epochs/phase over the 16,384-image store hits the finite
fixture's diversity ceiling and the critic memorizes (docs/PERF.md
"Dose-response" section). The figure should show the knee, not a monotone
drop; that IS the finding.

Usage:
  python tools/plot_dose_response.py \
      --run runs/pggan_packed_r5=32000 \
      --run runs/pggan_packed3x_r5=96000 \
      --run runs/pggan_packed6x_r5=192000 \
      --out docs/artifacts/pggan128_swd_dose_response.png
"""

from __future__ import annotations

import argparse
import json
import os

LEVEL_KEYS = ("swd_128", "swd_64", "swd_32", "swd_16", "swd_avg")
LEVEL_LABELS = {
    "swd_128": "128$^2$ (fine)",
    "swd_64": "64$^2$ (the outlier band)",
    "swd_32": "32$^2$",
    "swd_16": "16$^2$ (coarse)",
    "swd_avg": "average",
}


def load_points(run_specs):
    """[(budget, {level: swd}), ...] sorted by budget; fails loudly on a
    missing eval JSON (an unevaluated run must not silently drop out)."""
    pts = []
    for spec in run_specs:
        run_dir, _, budget = spec.partition("=")
        if not budget:
            raise SystemExit(f"--run needs DIR=IMAGES_PER_PHASE, got {spec!r}")
        path = os.path.join(run_dir, "eval_karras_128.json")
        if not os.path.isfile(path):
            raise SystemExit(
                f"{path} missing — evaluate the run first "
                f"(cli.evaluate --model pggan ... --out-json {path})")
        with open(path) as f:
            rec = json.load(f)
        missing = [k for k in LEVEL_KEYS if k not in rec]
        if missing:
            raise SystemExit(f"{path} lacks {missing}")
        pts.append((int(budget), {k: float(rec[k]) for k in LEVEL_KEYS}))
    pts.sort(key=lambda p: p[0])
    return pts


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", action="append", required=True,
                    metavar="DIR=IMAGES_PER_PHASE",
                    help="ladder run dir with eval_karras_128.json, and its "
                         "per-phase image budget (repeatable)")
    ap.add_argument("--reference-budget", type=int, default=600_000,
                    help="reference schedule images/phase, drawn as a marker")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = load_points(args.run)
    budgets = [p[0] for p in pts]

    fig, ax = plt.subplots(figsize=(7.0, 4.2))
    for key in LEVEL_KEYS:
        vals = [p[1][key] for p in pts]
        avg = key == "swd_avg"
        ax.plot(budgets, vals, marker="o", markersize=5,
                linewidth=2.6 if avg else 1.6,
                linestyle="--" if avg else "-",
                color="black" if avg else None,
                label=LEVEL_LABELS[key])
    ax.axvline(args.reference_budget, color="gray", linewidth=1.0,
               linestyle=":", zorder=0)
    ylo, yhi = ax.get_ylim()
    ax.text(args.reference_budget, ylo + 0.04 * (yhi - ylo),
            "reference schedule\n(600k images/phase) ",
            va="bottom", ha="right", fontsize=8, color="gray")
    ax.set_xscale("log", base=2)
    ax.set_xticks(budgets)
    ax.set_xticklabels([f"{b // 1000}k" for b in budgets])
    ax.set_xlabel("training images per ladder phase")
    ax.set_ylabel(r"SWD $\times 10^3$ (16,384 images/side)")
    ax.set_title("Packed-pyramid 4$^2$$\\to$128$^2$ ladder: SWD vs per-phase budget")
    ax.grid(True, alpha=0.3)
    ax.legend(fontsize=8, loc="upper right")
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=140)
    print(f"wrote {args.out} ({len(pts)} budgets)")


if __name__ == "__main__":
    main()
