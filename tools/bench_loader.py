"""Measure real-data loader feed rates + the memmap RSS bound
(VERDICT r2 item #3 "measured feed-rate table row per loader").

Builds a synthetic prepacked store (uint8 memmap, default ImageNet-128-like)
and measures:
  * PackedImageStore batch-assembly rate (native fused gather+normalize)
  * the same through ThreadedSource (the CLI's wrapping)
  * peak RSS delta while streaming — must stay far below the store size
    (memmap pages, not heap)

Usage:
  python tools/bench_loader.py --n 4000 --size 128 --batch 64
  python tools/bench_loader.py --n 16000 --size 128 --rss-demo   # ~3 GB store
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from gan_lib_tensorflow_tpu import data  # noqa: E402
from gan_lib_tensorflow_tpu.data import packed  # noqa: E402


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def build_store(out_dir: str, n: int, size: int, labeled: bool = True) -> None:
    """Fill a store with deterministic pseudo-image bytes WITHOUT holding it
    in RAM (chunked writes straight into the memmap)."""
    images, labels = packed.write_store(
        out_dir, n, size, size, 3,
        classes=[str(i) for i in range(1000)] if labeled else None)
    rng = np.random.default_rng(0)
    chunk = 256
    for i in range(0, n, chunk):
        take = min(chunk, n - i)
        images[i:i + take] = rng.integers(0, 256, (take, size, size, 3),
                                          np.uint8)
        if labels is not None:
            labels[i:i + take] = rng.integers(0, 1000, take)
    packed.finalize_store(out_dir, images, labels)


def measure(source, batch_size: int, n_batches: int) -> dict:
    it = iter(source)
    next(it)  # warm: first batch pays permutation + page faults
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = next(it)
    dt = time.perf_counter() - t0
    assert b["image"].dtype == np.float32
    return {"img_per_s": round(n_batches * batch_size / dt, 1),
            "ms_per_batch": round(dt / n_batches * 1000, 3)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=4000)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n-batches", type=int, default=100)
    p.add_argument("--store-dir", default=None,
                   help="reuse an existing store instead of building one")
    p.add_argument("--keep", action="store_true")
    p.add_argument("--rss-demo", action="store_true",
                   help="report RSS before/after streaming the whole store")
    args = p.parse_args()

    store_dir = args.store_dir or os.path.join(
        tempfile.gettempdir(), f"ganpack_bench_{args.n}x{args.size}")
    if not packed.is_packed_dir(store_dir):
        t0 = time.perf_counter()
        build_store(store_dir, args.n, args.size)
        print(json.dumps({"built": store_dir, "n": args.n, "size": args.size,
                          "gb": round(args.n * args.size**2 * 3 / 1e9, 2),
                          "build_s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    base_rss = rss_mb()
    store = data.PackedImageStore(store_dir, batch_size=args.batch, seed=0)
    row = {"loader": "PackedImageStore", "n": len(store), "size": args.size,
           "batch": args.batch,
           "store_gb": round(len(store) * args.size**2 * 3 / 1e9, 2)}
    row.update(measure(store, args.batch, args.n_batches))
    row["rss_delta_mb"] = round(rss_mb() - base_rss, 1)
    print(json.dumps(row), flush=True)

    # num_workers=1 is what the CLIs use (measured: 1 worker overlaps, 2+
    # thrash on this single-core host)
    threaded = data.ThreadedSource(
        data.PackedImageStore(store_dir, batch_size=args.batch, seed=0),
        num_workers=1)
    row2 = {"loader": "ThreadedSource(PackedImageStore, workers=1)",
            "batch": args.batch}
    row2.update(measure(threaded, args.batch, args.n_batches))
    print(json.dumps(row2), flush=True)

    if args.rss_demo:
        # fresh subprocess: isolates the streaming RSS from this process's
        # thread queues / allocator arenas. heap_delta excludes the
        # file-backed (reclaimable) memmap pages via VmRSS - mapped-file
        # resident size.
        import subprocess
        code = f"""
import json, numpy as np, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from gan_lib_tensorflow_tpu import data
def rss():
    return next(int(l.split()[1]) for l in open('/proc/self/status')
                if l.startswith('VmRSS')) / 1024.0
def file_rss():
    # resident file-backed pages (RssFile) — the reclaimable memmap part
    return next((int(l.split()[1]) for l in open('/proc/self/status')
                 if l.startswith('RssFile')), 0) / 1024.0
r0, f0 = rss(), file_rss()
src = data.PackedImageStore({store_dir!r}, batch_size={args.batch}, seed=1)
r_open = rss()
it = iter(src); n = len(src) // {args.batch}
for _ in range(n):
    b = next(it)
r1, f1 = rss(), file_rss()
print(json.dumps({{"rss_demo": True, "streamed_batches": n,
    "open_cost_mb": round(r_open - r0, 1),
    "rss_delta_mb": round(r1 - r0, 1),
    "file_backed_mb": round(f1 - f0, 1),
    "heap_delta_mb": round((r1 - r0) - (f1 - f0), 1)}}))
"""
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, check=True)
        print(out.stdout.strip(), flush=True)

    if not args.keep and not args.store_dir:
        shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
