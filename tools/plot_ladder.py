"""Render a PGGAN ladder-run artifact figure: Wasserstein distance and GP
across ALL phases on one global-step axis, with phase boundaries marked —
the progressive-growing analogue of tools/plot_run.py (the reference keeps
per-phase TF event files; a single cross-phase view of the ladder's
optimization is what you actually read convergence from).

Usage:
  python tools/plot_ladder.py runs/pggan256_r3 --out docs/artifacts/pg256.png
"""

from __future__ import annotations

import argparse
import json
import os
import re

_PHASE_RE = re.compile(r"^(\d+)x\1_(transition|stabilize)$")


def phase_order(name: str):
    m = _PHASE_RE.match(name)
    if not m:
        return None
    # transitions precede stabilizes at the same resolution
    return (int(m.group(1)), 0 if m.group(2) == "transition" else 1)


def load_ladder(run_dir: str):
    """[(phase_name, [record, ...]), ...] in ladder order; skips non-phase
    dirs and records without a step (config headers)."""
    phases = []
    for d in os.listdir(run_dir):
        key = phase_order(d)
        log = os.path.join(run_dir, d, "log.jsonl")
        if key is None or not os.path.isfile(log):
            continue
        recs = []
        with open(log) as f:
            for line in f:
                rec = json.loads(line)
                if "step" in rec:
                    recs.append(rec)
        if recs:
            phases.append((key, d, recs))
    phases.sort(key=lambda t: t[0])
    return [(name, recs) for _, name, recs in phases]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("--out", default=None)
    p.add_argument("--title", default="PGGAN progressive ladder (1x TPU v5e)")
    args = p.parse_args(argv)
    out = args.out or os.path.join(args.run_dir, "ladder_summary.png")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    phases = load_ladder(args.run_dir)
    if not phases:
        raise SystemExit(f"no phase dirs with log.jsonl under {args.run_dir}")

    fig, (ax_w, ax_gp) = plt.subplots(2, 1, figsize=(11, 5.5), sharex=True)
    offset = 0
    for name, recs in phases:
        xs = [offset + r["step"] for r in recs]
        ax_w.plot(xs, [r.get("wdist", float("nan")) for r in recs],
                  linewidth=0.9, color="tab:blue")
        ax_gp.plot(xs, [r.get("gp", float("nan")) for r in recs],
                   linewidth=0.9, color="tab:orange")
        ax_w.axvline(offset, color="0.85", linewidth=0.7, zorder=0)
        label = name.replace("_transition", " t").replace("_stabilize", " s")
        ax_w.annotate(label, (offset, 1.02), xycoords=("data", "axes fraction"),
                      fontsize=6, rotation=45)
        offset = xs[-1]
    ax_w.set_ylabel("Wasserstein distance")
    ax_gp.set_ylabel("gradient penalty")
    ax_gp.set_xlabel("global step (phases concatenated)")
    ax_gp.set_yscale("log")
    fig.suptitle(args.title)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({len(phases)} phases)")


if __name__ == "__main__":
    main()
