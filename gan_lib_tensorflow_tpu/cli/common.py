"""Shared CLI plumbing for the per-model entry points.

The reference exposes per-model ``train.py`` scripts with argparse/tf.app.flags
(SURVEY.md §1 L5); these entry points mirror that surface
(``python -m gan_lib_tensorflow_tpu.cli.train_sngan --...``) with one shared
flag vocabulary.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp

# Repo root (= parent of the package dir): the default home of the shared
# persistent XLA compile cache, the same one bench.py primes.
_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--steps", type=int, default=100_000, help="total G steps")
    p.add_argument("--batch-size", type=int, default=64, help="global batch size")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data", default="auto",
                   help="data backend: auto | fake | fake-rich | cifar10 | "
                        "device-fake | device-rich | <path>")
    p.add_argument("--out-dir", default="runs/out")
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--sample-every", type=int, default=1000)
    p.add_argument("--ckpt-every", type=int, default=5000)
    p.add_argument("--compute-dtype", default="bf16", choices=["fp32", "bf16"])
    p.add_argument("--no-mesh", action="store_true",
                   help="disable the data-parallel mesh even with >1 device")
    p.add_argument("--tp-shards", type=int, default=1,
                   help="tensor-parallel ('model' axis) shards; devices "
                        "split as (data = n/tp, model = tp). Wide kernels, "
                        "their Adam slots, and the EMA shard their "
                        "output-channel dim (parallel.train_state_shardings)")
    p.add_argument("--curves", action="store_true", help="write metric curve PNGs")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TB scalars (reference pix2pix parity)")
    p.add_argument("--trace-steps", type=int, default=0,
                   help="capture an XLA profile for N steps")
    p.add_argument("--fault-inject-step", type=int, default=0)
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans for NaN provenance (slow; "
                        "SURVEY.md §5 race/sanitizer row)")
    p.add_argument("--device-cache", default="auto",
                   choices=["auto", "on", "off"],
                   help="hold packed stores resident in HBM and ship only "
                        "per-step indices (auto: when the store fits "
                        "--device-cache-gb; docs/PERF.md host->device "
                        "transfer law)")
    p.add_argument("--device-cache-gb", type=float, default=2.0,
                   help="HBM budget for --device-cache auto/on")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compile-cache dir (default: "
                        "repo-local .jax_cache, or $GANTPU_COMPILE_CACHE; "
                        "'none' disables). First compile through the "
                        "tunneled backend costs minutes per distinct "
                        "computation — relaunches/resumes/ladder re-runs "
                        "replay from the cache in seconds")
    return p


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point XLA's persistent compile cache at ``path`` (shared default:
    repo-local ``.jax_cache``, the same cache ``bench.py`` primes).

    Cold compiles through the tunneled axon backend run minutes per distinct
    computation (observed ~13 min for the fused SNGAN step, ~3 min per PGGAN
    ladder phase); every training/eval CLI enables the cache so a resume,
    relaunch, or repeat eval replays executables in seconds. Best-effort —
    the experimental backend may decline to serialize, in which case this is
    a no-op (and XLA falls back to compiling, never fails)."""
    if path is None:
        path = os.environ.get("GANTPU_COMPILE_CACHE",
                              os.path.join(_REPO_ROOT, ".jax_cache"))
    if not path or path.lower() in ("none", "off"):
        return None
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - config keys vanish upstream
        print(f"note: compile cache unavailable: {e}", flush=True)
        return None
    return path


def device_cache_kwargs(args) -> dict:
    """--device-cache flags -> data.packed_training_source kwargs (tolerates
    hand-built args namespaces that predate the flags)."""
    return {"policy": getattr(args, "device_cache", "auto"),
            "budget_bytes": int(getattr(args, "device_cache_gb", 2.0) * 2**30)}


def configure(args) -> None:
    """Apply global debug/runtime flags before building any computation."""
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    enable_compile_cache(getattr(args, "compile_cache", None))


def compute_dtype(args) -> Optional[jnp.dtype]:
    return {"fp32": None, "bf16": jnp.bfloat16}[args.compute_dtype]


def maybe_mesh(args):
    from ..parallel import create_mesh
    tp = getattr(args, "tp_shards", 1)
    if args.no_mesh and tp > 1:
        raise SystemExit("--no-mesh and --tp-shards > 1 conflict: tensor "
                         "parallelism needs the device mesh")
    if args.no_mesh or (jax.device_count() == 1 and tp <= 1):
        return None
    if tp > 1:
        n = jax.device_count()
        if n % tp:
            raise ValueError(f"--tp-shards {tp} does not divide the "
                             f"device count {n}")
        return create_mesh((n // tp, tp), ("data", "model"))
    return create_mesh()


def state_layout(args, state, mesh):
    """State shardings for ``train.jit_train_step`` from the CLI flags:
    DP x TP layout when --tp-shards > 1, else None (fully replicated)."""
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return None
    from ..parallel import train_state_shardings
    return train_state_shardings(state, mesh)


def image_source(args, batch_size: int, image_size: int, num_classes: int,
                 n_micro: int = 1, mesh=None):
    """Resolve --data to a DataSource.

    'auto' prefers real CIFAR-10 (device-cached in HBM when it fits the
    --device-cache-gb budget, else a threaded prefetcher), falling back to
    synthetic with a note; 'cifar10' requires it; an explicit PATH must exist
    and resolve (cifar pickle dir, or a prepacked uint8 memmap store from
    tools/prepack_dataset.py) — a path never falls back silently;
    'device-fake' / 'device-rich' generate batches on the accelerator —
    mesh-native when ``mesh`` is passed (each chip renders its own 'data'
    shard); 'fake' / 'fake-rich' are the host synthetic twins ('rich' = the
    non-degenerate multi-blob style for long GAN runs)."""
    import os
    from .. import data

    def _cifar(data_dir=None):
        # the pickled store is 150 MB of uint8 — device-cache it whenever the
        # policy allows (per-step wire cost collapses to the index array;
        # docs/PERF.md host->device transfer law)
        store = data.Cifar10(batch_size=batch_size, data_dir=data_dir,
                             seed=args.seed)
        kw = device_cache_kwargs(args)
        if (kw["policy"] != "off"
                and store.images.nbytes <= kw["budget_bytes"]):
            return data.DeviceCachedStore(
                images=store.images, labels=store.labels, num_classes=10,
                batch_size=batch_size, n_micro=n_micro, seed=args.seed,
                mesh=mesh)
        return data.ThreadedSource(store)

    if args.data in ("auto", "cifar10"):
        try:
            return _cifar()
        except FileNotFoundError:
            if args.data == "cifar10":
                raise
            print("note: CIFAR-10 not found on disk; using synthetic data", flush=True)
    elif args.data in ("device-fake", "device-rich"):
        return data.DeviceFakeImages(
            batch_size=batch_size, image_size=image_size,
            num_classes=num_classes, seed=args.seed, n_micro=n_micro,
            style="rich" if args.data == "device-rich" else "blobs",
            mesh=mesh)
    elif args.data == "fake-rich":
        return data.ThreadedSource(
            data.FakeImages(batch_size=batch_size, image_size=image_size,
                            num_classes=num_classes, seed=args.seed,
                            style="rich"))
    elif args.data != "fake":
        # explicit path: resolve or fail loudly — never train on synthetic
        # data the user didn't ask for
        if os.path.isdir(args.data):
            if data.is_packed_dir(args.data):
                store = data.PackedImageStore(args.data, batch_size=batch_size,
                                              seed=args.seed)
                if store.image_size != image_size:
                    raise ValueError(
                        f"--data {args.data}: packed store is "
                        f"{store.image_size}^2 but this model trains at "
                        f"{image_size}^2 (repack with tools/prepack_dataset.py"
                        f" --size {image_size})")
                if num_classes > 0 and store.labels is None:
                    raise ValueError(
                        f"--data {args.data}: packed store has no labels.npy "
                        f"but the model is conditional "
                        f"(num_classes={num_classes})")
                # device-cache when it fits (per-step wire cost = one index
                # array), else stream uint8 with ONE prefetch worker
                # (single-core law + wire law, docs/PERF.md)
                return data.packed_training_source(
                    args.data, batch_size=batch_size, n_micro=n_micro,
                    seed=args.seed, mesh=mesh, **device_cache_kwargs(args))
            return _cifar(data_dir=args.data)
        raise FileNotFoundError(f"--data {args.data!r}: no such directory")
    return data.ThreadedSource(
        data.FakeImages(batch_size=batch_size, image_size=image_size,
                        num_classes=num_classes, seed=args.seed))
