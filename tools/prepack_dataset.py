"""Prepack an image dataset into a uint8 memmap store (data/packed.py).

One-time decode cost; after this, batch assembly is a fused native
gather+normalize out of a page-cached memmap at CIFAR-class rates — the only
input-pipeline design that survives reference-scale data on a single-core
host (docs/PERF.md input-pipeline law; VERDICT r2 item #3).

Inputs:
  * folder of class subdirectories of images  -> labeled store (ImageNet-128)
  * flat folder of images                     -> unlabeled store (CelebA-HQ)
  * .npz file(s) with 'data' + 'labels'       -> labeled store (downsampled
    ImageNet npz; streamed file-by-file, never concatenated in RAM)

Usage:
  python tools/prepack_dataset.py --src /data/imagenet_train --out /data/packed128 --size 128
  python tools/prepack_dataset.py --src /data/celeba_hq --out /data/pg --size 1024 \
      --resolutions 1024,512,256,128,64,32,16,8,4   # PGGAN ladder pyramid
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from gan_lib_tensorflow_tpu.data import native, packed  # noqa: E402

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _list_inputs(src: str):
    """-> (kind, entries). kind 'files': [(path, label|None)]; kind 'npz':
    [npz paths]; classes list or None."""
    if os.path.isfile(src) and src.endswith(".npz"):
        return "npz", [src], None
    if os.path.isdir(src):
        npzs = sorted(glob.glob(os.path.join(src, "*.npz")))
        if npzs:
            return "npz", npzs, None
        subdirs = sorted(d for d in os.listdir(src)
                         if os.path.isdir(os.path.join(src, d)))
        class_files = []
        if subdirs:
            for ci, c in enumerate(subdirs):
                for f in sorted(os.listdir(os.path.join(src, c))):
                    if f.lower().endswith(IMG_EXTS):
                        class_files.append((os.path.join(src, c, f), ci))
            if class_files:
                return "files", class_files, subdirs
        flat = [(os.path.join(src, f), None) for f in sorted(os.listdir(src))
                if f.lower().endswith(IMG_EXTS)]
        if flat:
            return "files", flat, None
    raise FileNotFoundError(f"--src {src!r}: no images, class dirs, or npz found")


def _decode(path: str, size: int) -> np.ndarray:
    """PIL decode -> center-crop -> resize -> uint8 [size, size, 3]."""
    from PIL import Image
    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        s = min(w, h)
        im = im.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
        if im.size != (size, size):
            im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im, np.uint8)


def _decode_paired(path: str, scale: int) -> np.ndarray:
    """Combined A|B image -> uint8 [scale, 2*scale, 3] (each half resized)."""
    from PIL import Image
    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        a = im.crop((0, 0, w // 2, h)).resize((scale, scale), Image.BILINEAR)
        b = im.crop((w // 2, 0, w, h)).resize((scale, scale), Image.BILINEAR)
        return np.concatenate([np.asarray(a, np.uint8),
                               np.asarray(b, np.uint8)], axis=1)


def _npz_count(files) -> int:
    total = 0
    for f in files:
        with np.load(f) as d:
            total += d["data"].shape[0]
    return total


def _pyramid_write(stores, labels_arrs, pos: int, chunk_u8: np.ndarray,
                   labels_chunk, resolutions):
    """Write a decoded top-resolution uint8 chunk into every pyramid level
    (successive 2x box downsample, vectorized in the native tier)."""
    cur = chunk_u8
    cur_res = resolutions[0]
    f32 = None
    for res, (store, labels) in zip(resolutions, zip(stores, labels_arrs)):
        if res != cur_res:
            if f32 is None:
                f32 = cur.astype(np.float32)
            while cur_res > res:
                f32 = native.box_downsample(f32, 2)
                cur_res //= 2
            cur = np.clip(np.rint(f32), 0, 255).astype(np.uint8)
        store[pos:pos + len(cur)] = cur
        if labels is not None and labels_chunk is not None:
            labels[pos:pos + len(cur)] = labels_chunk


def _pack_paired(args) -> None:
    """--paired: flat folder of combined A|B images -> [N, size, 2*size, 3]
    store (size = the SCALE resolution, e.g. 286; the train-time crop to the
    model's image_size is PackedPairedStore's job)."""
    kind, entries, _ = _list_inputs(args.src)
    if kind != "files":
        raise ValueError("--paired expects a folder of combined A|B images")
    files = [p for p, _ in entries]
    n = min(len(files), args.limit) if args.limit else len(files)
    s = args.size
    store, _ = packed.write_store(args.out, n, s, 2 * s, 3, classes=None)
    t0 = time.time()
    for pos in range(n):
        store[pos] = _decode_paired(files[pos], s)
        if (pos + 1) % (args.chunk * 4) == 0:
            print(f"  {pos + 1}/{n} ({(pos + 1) / (time.time() - t0):.0f} img/s)",
                  flush=True)
    packed.finalize_store(args.out, store, None)
    meta = json.load(open(os.path.join(args.out, packed.META_NAME)))
    meta["paired"] = True
    json.dump(meta, open(os.path.join(args.out, packed.META_NAME), "w"))
    dt = time.time() - t0
    print(json.dumps({"packed": n, "paired": True, "scale_size": s,
                      "out": args.out, "seconds": round(dt, 1),
                      "img_per_s": round(n / max(dt, 1e-9), 1),
                      "bytes": int(np.prod(store.shape))}))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, required=True,
                   help="target (top) resolution")
    p.add_argument("--resolutions", default=None,
                   help="comma list (descending, each a power-of-2 divisor "
                        "chain) -> pyramid store with r{res:04d}/ members")
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--limit", type=int, default=0, help="cap image count (testing)")
    p.add_argument("--paired", action="store_true",
                   help="combined A|B images (pix2pix): store both halves at "
                        "--size per half; per-step jitter happens in "
                        "data.PackedPairedStore")
    args = p.parse_args(argv)

    if args.paired:
        return _pack_paired(args)

    resolutions = ([int(r) for r in args.resolutions.split(",")]
                   if args.resolutions else [args.size])
    if resolutions[0] != args.size or resolutions != sorted(resolutions, reverse=True):
        raise ValueError("--resolutions must start at --size and descend")

    kind, entries, classes = _list_inputs(args.src)
    if kind == "npz":
        n = _npz_count(entries)
        classes = []  # labels come from the npz; class names unknown
    else:
        n = len(entries)
        if classes is None:
            pass  # flat/unlabeled
    if args.limit:
        n = min(n, args.limit)

    multi = len(resolutions) > 1
    stores, labels_arrs, dirs = [], [], []
    for res in resolutions:
        d = os.path.join(args.out, f"r{res:04d}") if multi else args.out
        store, labels = packed.write_store(
            d, n, res, res, 3,
            classes=classes if (classes is not None and kind == "files") or kind == "npz" else None)
        stores.append(store)
        labels_arrs.append(labels)
        dirs.append(d)

    t0 = time.time()
    pos = 0
    if kind == "npz":
        # 1-indexed label detection must be decided ONCE over the whole
        # dataset, not per shard: a 0-indexed shard that happens to contain
        # no class-0 sample would otherwise be shifted while its siblings
        # are not, silently corrupting the label space
        label_min = None
        for f in entries:
            with np.load(f) as d:
                y = np.asarray(d["labels"] if "labels" in d else d["label"])
                m = int(y.min())
                label_min = m if label_min is None else min(label_min, m)
        shift = 1 if label_min == 1 else 0
        if shift:
            print("note: labels are 1-indexed across all npz files; "
                  "reindexing to 0-based", flush=True)
        for f in entries:
            if pos >= n:
                break
            with np.load(f) as d:
                x = d["data"]
                if x.ndim == 2:
                    x = x.reshape(-1, 3, args.size, args.size).transpose(0, 2, 3, 1)
                y = np.asarray(d["labels"] if "labels" in d else d["label"],
                               np.int64) - shift
                for i in range(0, len(x), args.chunk):
                    if pos >= n:
                        break
                    take = min(args.chunk, n - pos, len(x) - i)
                    _pyramid_write(stores, labels_arrs, pos,
                                   np.ascontiguousarray(x[i:i + take], np.uint8),
                                   y[i:i + take].astype(np.int32), resolutions)
                    pos += take
        # npz stores are labeled; record the label range as num_classes
        ncls = int(max(la.max() for la in labels_arrs if la is not None) + 1) \
            if labels_arrs[0] is not None and pos else 0
        for d in dirs:
            meta = json.load(open(os.path.join(d, packed.META_NAME)))
            meta["num_classes"] = ncls
            meta["classes"] = None
            json.dump(meta, open(os.path.join(d, packed.META_NAME), "w"))
    else:
        chunk_imgs, chunk_labels = [], []
        for path, label in entries[:n]:
            chunk_imgs.append(_decode(path, args.size))
            chunk_labels.append(-1 if label is None else label)
            if len(chunk_imgs) == args.chunk:
                _pyramid_write(stores, labels_arrs, pos,
                               np.stack(chunk_imgs),
                               np.asarray(chunk_labels, np.int32), resolutions)
                pos += len(chunk_imgs)
                chunk_imgs, chunk_labels = [], []
                if pos % (args.chunk * 8) == 0:
                    rate = pos / (time.time() - t0)
                    print(f"  {pos}/{n} ({rate:.0f} img/s)", flush=True)
        if chunk_imgs:
            _pyramid_write(stores, labels_arrs, pos, np.stack(chunk_imgs),
                           np.asarray(chunk_labels, np.int32), resolutions)
            pos += len(chunk_imgs)

    for d, store, labels in zip(dirs, stores, labels_arrs):
        packed.finalize_store(d, store, labels)
    dt = time.time() - t0
    print(json.dumps({
        "packed": pos, "resolutions": resolutions, "out": args.out,
        "seconds": round(dt, 1), "img_per_s": round(pos / max(dt, 1e-9), 1),
        "bytes": sum(int(np.prod(s.shape)) for s in stores)}))


if __name__ == "__main__":
    main()
