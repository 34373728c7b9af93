"""One-command north-star verdict — SNGAN CIFAR-10 FID ≤ 25 (BASELINE.json:5).

Does, in order:
  1. **Asset check** — real CIFAR-10 (``cifar-10-batches-py``) and a converted
     InceptionV3 npz (``tools/convert_inception_weights.py`` is invoked
     automatically when you point ``--inception-weights`` at raw keras .h5 /
     torchvision .pth weights instead). Missing assets abort with an exact
     list of what to drop where — nothing silently degrades to synthetic.
  2. **Train** the reference 100k-step schedule (hinge, n_dis=5, Adam(2e-4,
     0, 0.9), linear decay — cli.train_sngan defaults). Resumable: re-running
     the command continues from the latest checkpoint.
  3. **Real moments** — computed once and cached to ``real_stats.npz``
     (reused by every later eval).
  4. **Eval** 50k samples through the pretrained InceptionV3 (all
     accumulation on device) and print the verdict line:
     ``FID=<x> target<=25.0 PASS|FAIL``.

``--smoke`` runs the identical wiring end-to-end in ~a minute with synthetic
data + the random-init extractor; it prints the FID but marks the verdict
UNGRADED (absolute numbers are meaningless without the real assets).

Usage:
  python -m gan_lib_tensorflow_tpu.cli.north_star \
      --data-dir /data/cifar --inception-weights inception_v3.npz
  python -m gan_lib_tensorflow_tpu.cli.north_star --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys

FID_TARGET = 25.0


def find_cifar(data_dir: str | None):
    """Return the directory containing cifar-10-batches-py, or None."""
    candidates = []
    if data_dir:
        candidates += [data_dir, os.path.join(data_dir, "cifar-10-batches-py")]
    candidates += ["data", "data/cifar-10-batches-py",
                   os.path.expanduser("~/data"),
                   os.path.expanduser("~/data/cifar-10-batches-py")]
    for c in candidates:
        if os.path.isfile(os.path.join(c, "data_batch_1")):
            return os.path.dirname(os.path.abspath(
                os.path.join(c, "data_batch_1")))
        if os.path.isfile(os.path.join(c, "cifar-10-batches-py", "data_batch_1")):
            return c
    return None


def resolve_inception(path: str | None, out_dir: str):
    """Return a converted-npz path, invoking the weight converter for raw
    keras/torch files; None if nothing usable.

    The conversion cache is keyed on the SOURCE file's absolute path + mtime
    + size, so repointing ``--inception-weights`` at different raw weights
    (or replacing the file in place) re-converts instead of silently serving
    a stale npz from an earlier source."""
    if not path:
        return None
    if not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        return path
    import hashlib
    st = os.stat(path)
    key = hashlib.sha256(
        f"{os.path.abspath(path)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:16]
    converted = os.path.join(out_dir, f"inception_v3_converted.{key}.npz")
    if os.path.exists(converted):
        return converted
    import subprocess
    tools = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "..", "tools")
    print(f"converting {path} -> {converted}", flush=True)
    subprocess.run([sys.executable,
                    os.path.join(tools, "convert_inception_weights.py"),
                    path, converted], check=True)
    return converted


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None,
                   help="dir containing cifar-10-batches-py")
    p.add_argument("--inception-weights", default=None,
                   help="converted npz, or raw keras .h5 / torchvision .pth "
                        "(converted automatically)")
    p.add_argument("--out-dir", default="runs/north_star")
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--n-samples", type=int, default=50_000)
    p.add_argument("--n-real", type=int, default=50_000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="synthetic end-to-end wiring check (UNGRADED verdict)")
    p.add_argument("--skip-train", action="store_true",
                   help="evaluate the existing checkpoint only")
    args = p.parse_args(argv)
    from . import common
    common.enable_compile_cache()
    os.makedirs(args.out_dir, exist_ok=True)

    # ---- 1. assets -------------------------------------------------------
    if args.smoke:
        data_arg, weights, graded = "fake", None, False
        steps = min(args.steps, 60)
        n_samples = min(args.n_samples, 500)
        n_real = min(args.n_real, 500)
        print("SMOKE MODE: synthetic data + random-init extractor — the "
              "verdict below is UNGRADED wiring evidence only", flush=True)
    else:
        cifar_dir = find_cifar(args.data_dir)
        weights = resolve_inception(args.inception_weights, args.out_dir)
        missing = []
        if cifar_dir is None:
            missing.append(
                "  * CIFAR-10: put cifar-10-batches-py/ under --data-dir "
                "(https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz)")
        if weights is None:
            missing.append(
                "  * InceptionV3 weights: pass --inception-weights "
                "<converted.npz | keras .h5 | torchvision .pth> "
                "(see tools/convert_inception_weights.py)")
        if missing:
            print("north-star assets missing:\n" + "\n".join(missing))
            print("nothing trained; the verdict requires real assets "
                  "(BASELINE.json:5). Use --smoke for a wiring check.")
            return 2
        data_arg, graded = cifar_dir, True
        steps, n_samples, n_real = args.steps, args.n_samples, args.n_real

    # ---- 2. train (resumable) -------------------------------------------
    from . import evaluate as evaluate_cli
    from . import train_sngan
    ckpt_dir = os.path.join(args.out_dir, "ckpt")
    if args.skip_train and not os.path.isdir(ckpt_dir):
        print(f"--skip-train: no checkpoint at {ckpt_dir}. Train first:\n"
              f"  python -m gan_lib_tensorflow_tpu.cli.north_star"
              + (" --smoke" if args.smoke else
                 f" --data-dir {args.data_dir or '<dir>'}"
                 f" --inception-weights "
                 f"{args.inception_weights or '<weights>'}")
              + f" --out-dir {args.out_dir}")
        return 2
    if not args.skip_train:
        # smoke: one final ckpt/sample (orbax saves over the tunnel dominate
        # tiny runs); graded: reference-like periodic cadence
        cadence = steps if args.smoke else max(steps // 20, 1)
        train_sngan.main([
            "--steps", str(steps), "--batch-size", str(args.batch_size),
            "--data", data_arg, "--out-dir", args.out_dir,
            "--seed", str(args.seed),
            "--ckpt-every", str(cadence),
            "--sample-every", str(cadence),
        ])

    # ---- 3+4. cached real moments + 50k eval ----------------------------
    out_json = os.path.join(args.out_dir, "north_star_result.json")
    eval_args = ["--model", "sngan", "--ckpt-dir", ckpt_dir,
                 "--n-samples", str(n_samples),
                 "--n-real", str(n_real),
                 "--batch-size", "100",
                 "--data", data_arg,
                 "--real-stats-npz", os.path.join(args.out_dir, "real_stats.npz"),
                 "--seed", str(args.seed), "--out-json", out_json]
    if weights:
        eval_args += ["--inception-weights", weights]
    evaluate_cli.main(eval_args)

    rec = json.loads(open(out_json).read())
    fid = rec.get("fid")
    verdict = ("PASS" if fid is not None and fid <= FID_TARGET else "FAIL") \
        if graded else "UNGRADED(smoke)"
    line = (f"FID={fid:.3f} target<={FID_TARGET} {verdict} "
            f"(IS={rec.get('inception_score', float('nan')):.3f}, "
            f"step={rec.get('step')}, extractor={rec.get('extractor')})")
    print(line)
    rec.update({"target": FID_TARGET, "verdict": verdict, "graded": graded})
    with open(out_json, "w") as f:
        json.dump(rec, f)
    return 0 if verdict != "FAIL" else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
