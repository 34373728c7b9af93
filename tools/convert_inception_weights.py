#!/usr/bin/env python
"""Convert pretrained InceptionV3 weights into the framework's contract npz.

The reference (``common/inception_score.py`` [RECON]) downloads a frozen TF
Inception graph at runtime; this environment is offline, so FID/IS parity is
"one asset-drop away": obtain keras/TF-slim/torchvision InceptionV3 weights
anywhere, run this tool, and point ``InceptionV3Features(params_npz=...)`` at
the output.

Supported sources
-----------------
1. ``.npz``/``.h5`` with keras-style names (``conv2d_42/kernel``,
   ``batch_normalization_42/{beta,moving_mean,moving_variance}``,
   ``predictions/{kernel,bias}``; trailing ``:0`` ok). Keras enumerates its
   auto-named layers in topological creation order — the same order flax
   registers this repo's ``eval.inception_v3.InceptionV3`` params — so the
   indexed source layers zip 1:1 onto creation-ordered flax paths. Every leaf
   is shape-checked; inception's channel structure makes a silent
   misalignment essentially impossible to pass validation.
2. ``.npz`` already using this repo's flax paths (``mixed3/b3x3/conv/kernel``)
   — validated passthrough.
3. torchvision ``Inception3`` state_dict (``.pt``/``.pth``): OIHW conv
   kernels transpose to HWIO and BN gamma (absent in our scale-free BN) folds
   into (moving_variance, moving_mean): matching
   ``gamma*(x-mu)/sqrt(v+eps)+beta == (x-mu)/sqrt(v'+eps)+beta`` gives
   ``v' = (v+eps)/gamma^2 - eps`` (requires gamma > 0; hard-fails otherwise).

Usage: python tools/convert_inception_weights.py SRC OUT.npz [--verify]
"""

from __future__ import annotations

import argparse
import re
import sys

import numpy as np

BN_EPS = 1e-3  # keras/torchvision InceptionV3 BN epsilon, = eval.inception_v3


# ---------------------------------------------------------------------------
# Target side: creation-ordered flax param paths
# ---------------------------------------------------------------------------

def creation_order_paths():
    """[(path_tuple, shape)] in module-creation order (dict insertion order —
    NOT sorted; this is what aligns with keras layer auto-numbering)."""
    import jax
    import jax.numpy as jnp

    from gan_lib_tensorflow_tpu.eval.inception_v3 import InceptionV3

    v = InceptionV3().init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
    out = []

    def rec(node, prefix):
        for k, val in node.items():
            if hasattr(val, "items"):
                rec(val, prefix + (k,))
            else:
                out.append((prefix + (k,), tuple(val.shape)))

    rec(v["params"], ())
    return out


def _partition_targets(paths):
    """Split creation-ordered paths into conv kernels, BN triples, fc."""
    convs, bns, fc = [], {}, {}
    for path, shape in paths:
        name = path[-1]
        if name == "kernel" and path[-2] == "conv":
            convs.append((path, shape))
        elif path[:1] == ("fc",):
            fc[name] = (path, shape)
        elif name in ("beta", "moving_mean", "moving_variance"):
            # one BasicConv = one BN unit, keyed by its module prefix
            bns.setdefault(path[:-1], {})[name] = (path, shape)
        else:
            raise AssertionError(f"unexpected target param {path}")
    return convs, list(bns.values()), fc


# ---------------------------------------------------------------------------
# Source side
# ---------------------------------------------------------------------------

_KERAS_CONV = re.compile(r"(?:^|/)conv2d(?:_(\d+))?/kernel(?::0)?$")
_KERAS_BN = re.compile(
    r"(?:^|/)batch_normalization(?:_(\d+))?/"
    r"(beta|moving_mean|moving_variance)(?::0)?$")
_KERAS_FC = re.compile(r"(?:^|/)(?:predictions|dense)(?:_\d+)?/"
                       r"(kernel|bias)(?::0)?$")


def _read_source(path):
    """Load SRC into a flat {name: np.ndarray} dict."""
    if path.endswith((".pt", ".pth")):
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        return {k: v.numpy() for k, v in sd.items()}, "torch"
    if path.endswith(".h5"):
        try:
            import h5py
        except ImportError as e:
            raise SystemExit(f"reading {path} needs h5py (absent): {e}")
        flat = {}
        with h5py.File(path, "r") as f:
            root = f["model_weights"] if "model_weights" in f else f

            def visit(name, obj):
                if hasattr(obj, "shape") and obj.shape is not None:
                    flat[name] = np.asarray(obj)
            root.visititems(visit)
        return flat, "keras"
    if path.endswith(".npz"):
        return dict(np.load(path)), None  # format sniffed below
    raise SystemExit(f"unsupported source format: {path}")


def _from_keras(flat, convs, bns, fc_t):
    """Zip keras-named tensors onto creation-ordered targets."""
    def indexed(regex, n_groups=1):
        hits = {}
        for name, arr in flat.items():
            m = regex.search(name)
            if m:
                idx = int(m.group(1) or 0)
                key = (idx, m.group(2)) if n_groups == 2 else idx
                if key in hits:
                    raise SystemExit(f"duplicate source tensor for {key}: {name}")
                hits[key] = arr
        return hits

    src_convs = indexed(_KERAS_CONV)
    src_bns = indexed(_KERAS_BN, n_groups=2)
    out = {}
    if len(src_convs) != len(convs):
        raise SystemExit(f"source has {len(src_convs)} conv kernels, "
                         f"target needs {len(convs)}")
    for i, (path, shape) in enumerate(convs):
        if i not in src_convs:
            raise SystemExit(f"missing conv2d_{i}/kernel in source")
        out["/".join(path)] = src_convs[i]
    for i, unit in enumerate(bns):
        for stat, (path, shape) in unit.items():
            if (i, stat) not in src_bns:
                raise SystemExit(f"missing batch_normalization_{i}/{stat}")
            out["/".join(path)] = src_bns[(i, stat)]
    for name, arr in flat.items():
        m = _KERAS_FC.search(name)
        if m and m.group(1) in fc_t:
            out["/".join(fc_t[m.group(1)][0])] = arr
    return out


def _from_torch(flat, convs, bns, fc_t):
    """torchvision Inception3: creation order of its Conv2d/BN modules matches
    too (same topology); transpose kernels, fold gamma."""
    conv_w = [(k, v) for k, v in flat.items()
              if k.endswith(".conv.weight") and not k.startswith("AuxLogits")]
    bn_units = {}
    for k, v in flat.items():
        if k.startswith("AuxLogits"):
            continue
        m = re.match(r"(.*)\.bn\.(weight|bias|running_mean|running_var)$", k)
        if m:
            bn_units.setdefault(m.group(1), {})[m.group(2)] = v
    if len(conv_w) != len(convs) or len(bn_units) != len(bns):
        raise SystemExit(
            f"torch source has {len(conv_w)} convs / {len(bn_units)} BNs, "
            f"target needs {len(convs)} / {len(bns)}")
    out = {}
    for (path, shape), (_, w) in zip(convs, conv_w):
        out["/".join(path)] = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
    for unit_t, (prefix, unit_s) in zip(bns, sorted(
            bn_units.items(), key=lambda kv: conv_order_key(kv[0], conv_w))):
        gamma = unit_s["weight"].astype(np.float64)
        if np.any(gamma <= 0):
            raise SystemExit(
                f"{prefix}: {np.sum(gamma <= 0)} BN gammas <= 0 — cannot fold "
                "into a scale-free BN; use a keras-format source instead")
        v_fold = (unit_s["running_var"].astype(np.float64) + BN_EPS) / gamma**2 - BN_EPS
        out["/".join(unit_t["beta"][0])] = unit_s["bias"]
        out["/".join(unit_t["moving_mean"][0])] = unit_s["running_mean"]
        out["/".join(unit_t["moving_variance"][0])] = v_fold.astype(np.float32)
    if "fc.weight" in flat:
        out["/".join(fc_t["kernel"][0])] = flat["fc.weight"].T
        out["/".join(fc_t["bias"][0])] = flat["fc.bias"]
    return out


def conv_order_key(bn_prefix, conv_w):
    """Order torch BN units by their sibling conv's position in state_dict."""
    for i, (k, _) in enumerate(conv_w):
        if k == bn_prefix + ".conv.weight":
            return i
    raise SystemExit(f"BN unit {bn_prefix} has no sibling conv")


# ---------------------------------------------------------------------------

def convert(src_path: str) -> dict:
    flat, fmt = _read_source(src_path)
    paths = creation_order_paths()
    convs, bns, fc_t = _partition_targets(paths)

    if fmt is None:  # npz: sniff naming scheme
        if any(_KERAS_CONV.search(k) for k in flat):
            fmt = "keras"
        elif all("/".join(p) in flat for p, _ in paths):
            fmt = "flax"
        elif any(k.endswith(".conv.weight") for k in flat):
            fmt = "torch"
        else:
            raise SystemExit(
                "npz keys match neither keras names, torch names, nor this "
                "repo's flax paths — nothing to zip")

    if fmt == "keras":
        out = _from_keras(flat, convs, bns, fc_t)
    elif fmt == "torch":
        out = _from_torch(flat, convs, bns, fc_t)
    else:
        out = {"/".join(p): flat["/".join(p)] for p, _ in paths}

    # Hard shape validation against the target tree (same rule as
    # load_params_npz: no silent partial loads).
    for path, shape in paths:
        key = "/".join(path)
        if key not in out:
            raise SystemExit(f"converted output missing {key}")
        got = tuple(out[key].shape)
        if got != shape:
            raise SystemExit(f"shape mismatch {key}: source {got} != "
                             f"target {shape}")
        out[key] = np.asarray(out[key], np.float32)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("src", help="keras .h5/.npz, flax .npz, or torch .pt[h]")
    p.add_argument("out", help="output contract npz")
    p.add_argument("--verify", action="store_true",
                   help="load the result through InceptionV3Features and run "
                        "a forward pass")
    args = p.parse_args(argv)

    out = convert(args.src)
    np.savez(args.out, **out)
    print(f"wrote {len(out)} tensors -> {args.out}")

    if args.verify:
        import jax
        from gan_lib_tensorflow_tpu.eval.inception_v3 import InceptionV3Features
        net = InceptionV3Features(params_npz=args.out)
        feats, logits = net(jax.numpy.zeros((2, 64, 64, 3)))
        assert feats.shape == (2, 2048) and logits.shape == (2, 1000)
        print(f"verify ok: feats {feats.shape}, logits {logits.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
