"""Import a reference TF1 ``tf.train.Saver`` checkpoint into this framework.

The reference persists trained models as TF1 Saver checkpoints ([RECON]
per-model ``Saver`` dirs; SURVEY.md §5 checkpoint row). A user migrating from
``GAN_Lib_Tensorflow`` should not have to retrain: this tool reads such a
checkpoint (TF2's ``tf.train.load_checkpoint`` reads TF1 bundles), maps the
variables onto the target model's flax pytrees, and writes a step-0 orbax
checkpoint that every CLI consumes directly (``cli.sample``,
``cli.evaluate``, and train-CLI resume).

Mapping contract — evidence-driven, not name-bound (the mounted reference is
empty, so its exact variable names are unverifiable; SURVEY.md provenance
warning):

1. optimizer/bookkeeping slots are dropped (``Adam``, ``beta*_power``,
   ``global_step``, EMA shadow copies, ...);
2. variables partition into generator vs discriminator by name substring
   (``--g-prefix``/``--d-prefix``; default: auto-detect ``gen``/``dis``);
3. each variable gets a *role* from its trailing name component
   (W/weights/kernel/filter -> kernel, b/bias -> bias, gamma/scale -> scale,
   beta/offset -> BN bias, moving_mean -> mean, moving_variance -> var,
   u -> spectral-norm u, embed -> embedding), and flax leaves get roles from
   their key names (a ``bias`` whose module also holds ``scale`` is a BN
   beta);
4. within each (network, role, shape) group, TF variables in natural name
   order align with flax leaves in natural path order — stable for the
   sequential ResNet/U-Net stacks of this lineage;
5. anything still ambiguous or unmatched must be pinned via ``--map``
   (JSON ``{tf_var_name: "flax/leaf/path"}``); the tool writes a full report
   (every match + both remainders) next to the output and **fails loudly**
   on unmatched target leaves unless ``--allow-partial``.

Layouts: TF conv kernels are HWIO — identical to flax; dense kernels are
[in, out] — identical; no transposes. For igul222-lineage NCHW checkpoints,
``--nchw-boundary`` re-orders the G input dense's output columns and the
D output dense's input rows from (C,H,W) to (H,W,C) flattening so the
surrounding convs see the same tensor.

Example:
  python tools/import_tf1_checkpoint.py --model sngan \\
      --ckpt /path/to/tf1/model.ckpt-100000 --out-dir runs/imported \\
      --report-only          # first look at the proposed mapping
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from typing import Dict, List, Tuple

import numpy as np

_DROP = re.compile(
    r"(Adam|RMSProp|Momentum|beta1_power|beta2_power|global_step|"
    r"ExponentialMovingAverage|save_counter|_CHECKPOINTABLE)", re.I)

_ROLE_PATTERNS = [
    (re.compile(r"(^|[./])(moving_mean|mean|mu)$", re.I), "mean"),
    (re.compile(r"(^|[./])(moving_variance|variance|var|sigma2)$", re.I), "var"),
    (re.compile(r"(^|[./])(gamma|scale|g)$"), "scale"),
    (re.compile(r"(^|[./])(beta|offset)$", re.I), "bn_bias"),
    (re.compile(r"(^|[./])(W|w|kernel|weights?|filters?)$"), "kernel"),
    (re.compile(r"(^|[./])(b|bias|biases)$"), "bias"),
    (re.compile(r"(^|[./])u$"), "u"),
    (re.compile(r"embed", re.I), "embedding"),
]


def _natkey(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def tf_role(name: str) -> str:
    base = name.split(":")[0]
    for pat, role in _ROLE_PATTERNS:
        if pat.search(base):
            return role
    return "kernel" if name.count("/") else "unknown"


def flax_role(path: Tuple[str, ...], module: dict) -> str:
    leaf = path[-1]
    if leaf == "kernel":
        return "kernel"
    if leaf == "scale":
        return "scale"
    if leaf == "bias":
        # a bias sharing a module with `scale` is a norm offset (BN/LN beta)
        return "bn_bias" if "scale" in module else "bias"
    if leaf in ("mean", "var", "u", "embedding"):
        return leaf
    if leaf == "g":  # weight-norm magnitude
        return "scale"
    return leaf


def read_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    try:
        import tensorflow as tf  # noqa: deferred heavy import
    except ImportError as e:  # pragma: no cover - env without TF
        raise SystemExit(
            "tensorflow is required to read TF1 checkpoints "
            f"(import failed: {e})")
    reader = tf.train.load_checkpoint(path)
    out = {}
    for name in reader.get_variable_to_shape_map():
        if _DROP.search(name):
            continue
        out[name] = np.asarray(reader.get_tensor(name))
    if not out:
        raise SystemExit(f"no model variables found in checkpoint {path!r}")
    return out


def partition_networks(tf_vars, g_prefix, d_prefix):
    g, d, skipped = {}, {}, []
    for name, val in tf_vars.items():
        low = name.lower()
        if g_prefix and g_prefix.lower() in low:
            g[name] = val
        elif d_prefix and d_prefix.lower() in low:
            d[name] = val
        elif "gen" in low:
            g[name] = val
        elif "dis" in low or re.search(r"(^|/)d([_./]|$)", low):
            d[name] = val
        else:
            skipped.append(name)
    return g, d, skipped


def flatten_variables(variables) -> List[Tuple[str, Tuple[str, ...], np.ndarray, str]]:
    """-> [(path_str, path_tuple, value, role)] over all collections."""
    import jax.tree_util as jtu

    out = []
    for kp, leaf in jtu.tree_flatten_with_path(variables)[0]:
        keys = tuple(k.key if hasattr(k, "key") else str(k) for k in kp)
        node = variables
        for k in keys[:-1]:
            node = node[k]
        out.append(("/".join(keys), keys, np.asarray(leaf),
                    flax_role(keys, node)))
    return out


def match(tf_vars: Dict[str, np.ndarray], leaves, explicit: Dict[str, str],
          net: str):
    """Greedy (role, shape)-group alignment. Returns (assignments, report)."""
    assignments: Dict[Tuple[str, ...], np.ndarray] = {}
    report = {"network": net, "matched": [], "unmatched_tf": [],
              "unmatched_target": []}
    by_path = {p: (keys, v, role) for p, keys, v, role in leaves}
    used_tf, used_leaf = set(), set()

    for tf_name, leaf_path in explicit.items():
        if tf_name not in tf_vars:
            continue
        if leaf_path not in by_path:
            raise SystemExit(f"--map: no target leaf {leaf_path!r} in {net}")
        keys, target, _ = by_path[leaf_path]
        val = tf_vars[tf_name]
        if tuple(val.shape) != tuple(target.shape):
            raise SystemExit(
                f"--map: {tf_name} {val.shape} vs {leaf_path} {target.shape}")
        assignments[keys] = val
        used_tf.add(tf_name)
        used_leaf.add(leaf_path)
        report["matched"].append(
            {"tf": tf_name, "target": leaf_path, "how": "explicit"})

    groups: Dict[Tuple[str, tuple], List[str]] = {}
    for name, val in tf_vars.items():
        if name not in used_tf:
            groups.setdefault((tf_role(name), tuple(val.shape)), []).append(name)
    for key in groups:
        groups[key].sort(key=_natkey)

    leaf_groups: Dict[Tuple[str, tuple], List[str]] = {}
    for p, keys, v, role in leaves:
        if p not in used_leaf:
            leaf_groups.setdefault((role, tuple(v.shape)), []).append(p)
    for key in leaf_groups:
        leaf_groups[key].sort(key=_natkey)

    for key, names in sorted(groups.items(), key=lambda kv: str(kv[0])):
        targets = leaf_groups.get(key, [])
        for tf_name, leaf_path in zip(names, targets):
            keys, _, _ = by_path[leaf_path]
            assignments[keys] = tf_vars[tf_name]
            report["matched"].append(
                {"tf": tf_name, "target": leaf_path,
                 "how": "role+shape+order" if len(names) > 1 else "role+shape"})
        for tf_name in names[len(targets):]:
            report["unmatched_tf"].append(tf_name)
        leaf_groups[key] = targets[len(names):]
    for rest in leaf_groups.values():
        report["unmatched_target"].extend(rest)
    report["unmatched_target"].sort()
    report["unmatched_tf"].sort()
    return assignments, report


def apply_assignments(variables, assignments):
    import jax.tree_util as jtu

    def sub(kp, leaf):
        keys = tuple(k.key if hasattr(k, "key") else str(k) for k in kp)
        if keys in assignments:
            return assignments[keys].astype(np.asarray(leaf).dtype)
        return leaf

    return jtu.tree_map_with_path(sub, variables)


def nchw_boundary_fixups(g_vars, d_vars, model):
    """Permute the G input dense's output columns (and the D output dense's
    input rows) from NCHW to NHWC flattening order."""
    if model not in ("sngan", "acgan", "imagenet"):
        return g_vars, d_vars

    def fix_dense(tree, out_hw, transpose_rows):
        import jax.tree_util as jtu

        def sub(kp, leaf):
            keys = tuple(k.key if hasattr(k, "key") else str(k) for k in kp)
            arr = np.asarray(leaf)
            if keys[-1] not in ("kernel", "bias"):
                return leaf
            dim = arr.shape[0] if (transpose_rows and keys[-1] == "kernel") \
                else arr.shape[-1]
            h = w = out_hw
            if dim % (h * w):
                return leaf
            c = dim // (h * w)
            if c < 1 or "dense" not in "/".join(keys).lower():
                return leaf
            perm = np.arange(dim).reshape(c, h, w).transpose(1, 2, 0).ravel()
            if transpose_rows and keys[-1] == "kernel":
                return arr[perm, :]
            if not transpose_rows:
                return arr[..., perm]
            return leaf

        return jtu.tree_map_with_path(sub, tree)

    # G: z -> dense -> reshape to 4x4xC; D: features -> global pool (no fixup
    # needed: pooling removes spatial order). Only G's boundary matters.
    return fix_dense(g_vars, 4, transpose_rows=False), d_vars


def build_models(args):
    import jax
    import jax.numpy as jnp

    if args.model == "sngan":
        from gan_lib_tensorflow_tpu.models import sngan
        g = sngan.cifar_generator(num_classes=args.num_classes)
        d = sngan.cifar_discriminator(num_classes=args.num_classes)
        zz = jnp.zeros((2, g.z_dim))
        xx = jnp.zeros((2, 32, 32, 3))
        if args.num_classes:
            ll = jnp.zeros((2,), jnp.int32)
            return (g, d,
                    lambda r: g.init(r, zz, ll, train=False),
                    lambda r: d.init(r, xx, ll))
        return (g, d, lambda r: g.init(r, zz, train=False),
                lambda r: d.init(r, xx))
    if args.model == "acgan":
        from gan_lib_tensorflow_tpu.models import acgan
        g = acgan.ACGANGenerator()
        d = acgan.ACGANDiscriminator()
        return (g, d,
                lambda r: g.init(r, jnp.zeros((2, g.z_dim)),
                                 jnp.zeros((2,), jnp.int32), train=False),
                lambda r: d.init(r, jnp.zeros((2, 32, 32, 3)), train=False))
    if args.model == "imagenet":
        from gan_lib_tensorflow_tpu.models import sngan
        g = sngan.imagenet128_generator(num_classes=args.num_classes or 1000,
                                        width_mul=args.width_mul)
        d = sngan.imagenet128_discriminator(num_classes=args.num_classes or 1000,
                                            width_mul=args.width_mul)
        ll = jnp.zeros((2,), jnp.int32)
        return (g, d,
                lambda r: g.init(r, jnp.zeros((2, g.z_dim)), ll, train=False),
                lambda r: d.init(r, jnp.zeros((2, 128, 128, 3)), ll))
    if args.model == "pix2pix":
        from gan_lib_tensorflow_tpu.models import pix2pix
        g = pix2pix.UNetGenerator(base_ch=args.ngf)
        d = pix2pix.PatchGANDiscriminator(base_ch=args.ndf)
        s = args.image_size
        xx = jnp.zeros((1, s, s, 3))
        return (g, d, lambda r: g.init(r, xx, train=False),
                lambda r: d.init(r, jnp.concatenate([xx, xx], -1), train=False))
    if args.model == "pggan":
        from gan_lib_tensorflow_tpu.models import pggan
        g = pggan.PGGANGenerator(resolution=args.resolution, fade_in=False,
                                 width_mul=args.width_mul)
        d = pggan.PGGANDiscriminator(resolution=args.resolution, fade_in=False,
                                     width_mul=args.width_mul)
        s = args.resolution
        return (g, d,
                lambda r: g.init(r, jnp.zeros((2, g.z_dim)), train=False),
                lambda r: d.init(r, jnp.zeros((2, s, s, 3))))
    raise SystemExit(f"unknown --model {args.model!r}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--ckpt", required=True,
                   help="TF1 checkpoint prefix (the path Saver.save returned)")
    p.add_argument("--model", required=True,
                   choices=["sngan", "acgan", "pix2pix", "imagenet", "pggan"])
    p.add_argument("--out-dir", default="runs/imported")
    p.add_argument("--g-prefix", default=None,
                   help="substring marking generator variables")
    p.add_argument("--d-prefix", default=None)
    p.add_argument("--map", dest="map_json", default=None,
                   help="JSON file {tf_var_name: flax/leaf/path} overrides")
    p.add_argument("--num-classes", type=int, default=0)
    p.add_argument("--width-mul", type=float, default=1.0)
    p.add_argument("--resolution", type=int, default=64, help="pggan only")
    p.add_argument("--image-size", type=int, default=256, help="pix2pix only")
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--ndf", type=int, default=64)
    p.add_argument("--nchw-boundary", action="store_true",
                   help="apply NCHW->NHWC dense-boundary permutation "
                        "(igul222-lineage checkpoints)")
    p.add_argument("--allow-partial", action="store_true",
                   help="keep fresh init for unmatched target leaves")
    p.add_argument("--report-only", action="store_true",
                   help="write the mapping report and exit without importing")
    args = p.parse_args(argv)

    import jax
    import optax

    from gan_lib_tensorflow_tpu.train import CheckpointManager, create_state

    tf_vars = read_tf_checkpoint(args.ckpt)
    g_tf, d_tf, skipped = partition_networks(tf_vars, args.g_prefix,
                                             args.d_prefix)
    if not g_tf or not d_tf:
        raise SystemExit(
            f"could not partition checkpoint into G ({len(g_tf)} vars) / "
            f"D ({len(d_tf)} vars); pass --g-prefix/--d-prefix. "
            f"Variables seen: {sorted(tf_vars)[:20]} ...")

    explicit = {}
    if args.map_json:
        with open(args.map_json) as f:
            explicit = json.load(f)
        # validate every pin against the UNION of G/D variables up front: a
        # typo'd TF name would otherwise be skipped by both per-network match
        # passes (each correctly skips the other network's pins) and silently
        # fall back to the heuristic alignment the pin was meant to override
        unknown = sorted(set(explicit) - set(g_tf) - set(d_tf))
        if unknown:
            raise SystemExit(
                f"--map: TF variable(s) not in the checkpoint: {unknown}; "
                f"available: {sorted(set(g_tf) | set(d_tf))[:20]} ...")

    g, d, g_init, d_init = build_models(args)
    g_vars = g_init(jax.random.PRNGKey(0))
    d_vars = d_init(jax.random.PRNGKey(1))

    g_assign, g_report = match(g_tf, flatten_variables(g_vars), explicit, "G")
    d_assign, d_report = match(d_tf, flatten_variables(d_vars), explicit, "D")

    os.makedirs(args.out_dir, exist_ok=True)
    report = {"checkpoint": args.ckpt, "model": args.model,
              "skipped_unpartitioned": sorted(skipped),
              "generator": g_report, "discriminator": d_report}
    report_path = os.path.join(args.out_dir, "import_report.json")
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    n_match = len(g_report["matched"]) + len(d_report["matched"])
    n_miss = len(g_report["unmatched_target"]) + len(d_report["unmatched_target"])
    print(f"matched {n_match} variables; {n_miss} target leaves unmatched; "
          f"report: {report_path}", flush=True)

    if args.report_only:
        return 0
    if n_miss and not args.allow_partial:
        raise SystemExit(
            f"{n_miss} target leaves have no source variable (see "
            f"{report_path}); pin them with --map or pass --allow-partial "
            f"to keep their fresh initialization")

    g_vars = apply_assignments(g_vars, g_assign)
    d_vars = apply_assignments(d_vars, d_assign)
    if args.nchw_boundary:
        g_vars, d_vars = nchw_boundary_fixups(g_vars, d_vars, args.model)

    g_optim = optax.adam(2e-4, b1=0.0, b2=0.9)
    d_optim = optax.adam(2e-4, b1=0.0, b2=0.9)
    state = create_state(jax.random.PRNGKey(0), lambda r: g_vars,
                         lambda r: d_vars, g_optim, d_optim,
                         ema_decay=0.9999)
    # imported weights ARE the trained model: seed EMA with them
    ckpt = CheckpointManager(os.path.join(args.out_dir, "ckpt"))
    ckpt.save(0, state, wait=True)
    ckpt.close()
    print(f"wrote step-0 checkpoint to {os.path.join(args.out_dir, 'ckpt')}; "
          f"consume with cli.sample / cli.evaluate / any train CLI "
          f"(--out-dir {args.out_dir})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
