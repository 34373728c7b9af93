"""Prepacked uint8 memmap store + prepack tool (VERDICT r2 item #3)."""

import json
import os
import sys

import numpy as np
import pytest

from gan_lib_tensorflow_tpu import data

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import prepack_dataset  # noqa: E402


def _class_folder(tmp_path, n_classes=3, per_class=5, size=32):
    from PIL import Image
    src = tmp_path / "raw"
    rng = np.random.default_rng(0)
    truth = {}
    for c in range(n_classes):
        d = src / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(per_class):
            arr = rng.integers(0, 256, (size, size, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i:03d}.png")
            truth[(c, i)] = arr
    return str(src), truth


def test_prepack_class_folder_roundtrip(tmp_path):
    src, truth = _class_folder(tmp_path)
    out = str(tmp_path / "packed")
    prepack_dataset.main(["--src", src, "--out", out, "--size", "32",
                          "--chunk", "4"])
    store = data.PackedImageStore(out, batch_size=5, seed=0)
    assert len(store) == 15
    assert store.num_classes == 3
    assert isinstance(store.images, np.memmap)

    # stored bytes must be the decoded pixels exactly (PNG is lossless and
    # no resize happened)
    first = np.asarray(store.images[0])
    assert any(np.array_equal(first, t) for t in truth.values())

    b = next(iter(store))
    assert b["image"].shape == (5, 32, 32, 3)
    assert b["image"].dtype == np.float32
    assert b["image"].min() >= -1 - 1e-5 and b["image"].max() <= 1 + 1e-5
    assert b["label"].dtype == np.int32 and (b["label"] < 3).all()

    # label pairing survives the sorted-gather: image i must be the decode of
    # some file of class label[i]
    for img, lab in zip(b["image"], b["label"]):
        u8 = np.clip(np.rint((img + 1) * 127.5), 0, 255).astype(np.uint8)
        assert any(np.array_equal(u8, truth[(c, i)])
                   for (c, i) in truth if c == lab)


def test_prepack_pyramid_consistency(tmp_path):
    src, _ = _class_folder(tmp_path, n_classes=1, per_class=4, size=32)
    out = str(tmp_path / "pyr")
    prepack_dataset.main(["--src", src, "--out", out, "--size", "32",
                          "--resolutions", "32,16,8"])
    s32 = data.open_pyramid(out, 2, 32)
    s16 = data.open_pyramid(out, 2, 16)
    s8 = data.open_pyramid(out, 2, 8)
    assert (s32.image_size, s16.image_size, s8.image_size) == (32, 16, 8)
    # each level is the 2x box downsample of the one above (within rounding)
    a = s32.images[:].astype(np.float32)
    want16 = a.reshape(4, 16, 2, 16, 2, 3).mean((2, 4))
    np.testing.assert_allclose(s16.images[:].astype(np.float32), want16,
                               atol=0.51)


def test_prepack_npz_streaming(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(2):
        np.savez(tmp_path / f"train_{i}.npz",
                 data=rng.integers(0, 256, (6, 8, 8, 3), np.uint8),
                 labels=rng.integers(1, 4, (6,)))  # 1-based like the real npz
    out = str(tmp_path / "packed")
    prepack_dataset.main(["--src", str(tmp_path), "--out", out,
                          "--size", "8", "--chunk", "4"])
    store = data.PackedImageStore(out, batch_size=4, seed=0)
    assert len(store) == 12
    assert store.labels.min() >= 0 and store.labels.max() <= 2  # rebased
    assert store.num_classes == 3


def test_image_source_resolves_packed_dir(tmp_path):
    import types
    src, _ = _class_folder(tmp_path, n_classes=2, per_class=4)
    out = str(tmp_path / "packed")
    prepack_dataset.main(["--src", src, "--out", out, "--size", "32"])
    from gan_lib_tensorflow_tpu.cli import common
    args = types.SimpleNamespace(data=out, seed=0, no_mesh=True)
    source = common.image_source(args, 4, 32, 2)
    # small store + default auto policy -> device-resident cache yielding
    # [n_micro, B, ...] stacks (round-4 host->device transfer law)
    assert isinstance(source, data.DeviceCachedStore)
    b = next(iter(source))
    assert b["image"].shape == (1, 4, 32, 32, 3) and "label" in b

    args_off = types.SimpleNamespace(data=out, seed=0, no_mesh=True,
                                     device_cache="off")
    streamed = common.image_source(args_off, 4, 32, 2)
    b = next(iter(streamed))
    assert b["image"].shape == (4, 32, 32, 3) and b["image"].dtype == np.uint8


def test_open_pyramid_wrong_resolution_fails(tmp_path):
    src, _ = _class_folder(tmp_path, n_classes=1, per_class=2)
    out = str(tmp_path / "packed")
    prepack_dataset.main(["--src", src, "--out", out, "--size", "32"])
    with pytest.raises(ValueError, match="wanted 16px"):
        data.open_pyramid(out, 2, 16)


# ---------------------------------------------------------------- paired


def _paired_folder(tmp_path, n=6, h=40, w=80):
    """Combined A|B images where A is a constant ramp and B = 255 - A, so
    crop-consistency between the halves is checkable after jitter."""
    from PIL import Image
    src = tmp_path / "pairs"
    src.mkdir()
    base = ((np.arange(h)[:, None, None] * 6 + np.arange(w // 2)[None, :, None]
             + np.arange(3)[None, None, :]) % 256).astype(np.int64)
    for i in range(n):
        a = ((base + i) % 256).astype(np.uint8)
        b = 255 - a
        Image.fromarray(np.concatenate([a, b], axis=1)).save(src / f"{i}.png")
    return str(src)


def test_paired_prepack_and_store(tmp_path):
    src = _paired_folder(tmp_path)
    out = str(tmp_path / "packedp")
    prepack_dataset.main(["--src", src, "--out", out, "--size", "36",
                          "--paired"])
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["paired"] and meta["height"] == 36 and meta["width"] == 72

    store = data.PackedPairedStore(out, batch_size=2, image_size=32, seed=0)
    assert len(store) == 6
    batch = next(iter(store))
    assert batch["input"].shape == (2, 32, 32, 3)
    assert batch["target"].shape == (2, 32, 32, 3)
    assert batch["input"].dtype == np.float32
    assert -1.0 <= batch["input"].min() and batch["input"].max() <= 1.0
    # jitter consistency: B = 255 - A must survive crop+flip (both halves
    # got the SAME window), i.e. input + target == 0 in [-1,1] scale
    np.testing.assert_allclose(batch["input"] + batch["target"], 0.0,
                               atol=2 / 127.5)

    # BtoA swaps the roles
    rev = data.PackedPairedStore(out, batch_size=2, image_size=32,
                                 which_direction="BtoA", seed=0)
    b2 = next(iter(rev))
    np.testing.assert_array_equal(b2["input"], batch["target"])

    # eval_iter: deterministic, sequential, named
    names = []
    for ex in rev.eval_iter():
        assert ex["input"].shape == (1, 32, 32, 3)
        names.append(ex["name"])
    assert names == [f"{i:05d}" for i in range(6)]

    # guards
    with pytest.raises(ValueError, match="exceeds"):
        data.PackedPairedStore(out, image_size=64)
    single = str(tmp_path / "single")
    prepack_dataset.main(["--src", src, "--out", single, "--size", "32"])
    with pytest.raises(ValueError, match="repack with --paired"):
        data.PackedPairedStore(single)


def test_pix2pix_cli_trains_from_paired_store(tmp_path):
    src = _paired_folder(tmp_path, n=4, h=40, w=80)
    out_store = str(tmp_path / "packedp")
    prepack_dataset.main(["--src", src, "--out", out_store, "--size", "36",
                          "--paired"])
    from gan_lib_tensorflow_tpu.cli import train_pix2pix
    run = str(tmp_path / "run")
    train_pix2pix.main(["--steps", "2", "--batch-size", "2",
                        "--image-size", "32", "--ngf", "8", "--ndf", "8",
                        "--log-every", "1", "--sample-every", "2",
                        "--ckpt-every", "2", "--compute-dtype", "fp32",
                        "--no-mesh", "--out-dir", run, "--data", out_store])
    recs = [json.loads(l) for l in open(os.path.join(run, "log.jsonl"))]
    assert [r["step"] for r in recs if "step" in r][-1] == 2
    # test mode consumes the store's deterministic eval_iter
    train_pix2pix.main(["--mode", "test", "--out-dir", run,
                        "--image-size", "32", "--ngf", "8", "--ndf", "8",
                        "--batch-size", "1", "--data", out_store,
                        "--max-test-images", "2", "--compute-dtype", "fp32",
                        "--no-mesh"])
    metrics = json.load(open(os.path.join(run, "test_metrics.json")))
    assert metrics["n_examples"] == 2


def test_prepack_npz_label_reindex_is_global(tmp_path):
    """1-indexed detection is decided once over ALL shards: a 0-indexed shard
    whose min label happens to be 1 must NOT be shifted (self-review fix)."""
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 8, 8, 3), np.uint8)
    # shard A contains class 0; shard B's min label is 1 but is 0-indexed
    np.savez(tmp_path / "a.npz", data=imgs, labels=np.array([0, 2, 1, 3]))
    np.savez(tmp_path / "b.npz", data=imgs, labels=np.array([1, 3, 2, 1]))
    out = str(tmp_path / "store")
    prepack_dataset.main(["--src", str(tmp_path), "--out", out,
                          "--size", "8"])
    labels = np.load(os.path.join(out, "labels.npy"))
    np.testing.assert_array_equal(labels, [0, 2, 1, 3, 1, 3, 2, 1])

    # genuinely 1-indexed shards (both min >= 1, global min == 1) DO shift
    np.savez(tmp_path / "a.npz", data=imgs, labels=np.array([1, 2, 4, 3]))
    np.savez(tmp_path / "b.npz", data=imgs, labels=np.array([2, 4, 3, 1]))
    out2 = str(tmp_path / "store2")
    prepack_dataset.main(["--src", str(tmp_path), "--out", out2,
                          "--size", "8"])
    labels2 = np.load(os.path.join(out2, "labels.npy"))
    np.testing.assert_array_equal(labels2, [0, 1, 3, 2, 1, 3, 2, 0])


def test_store_smaller_than_batch_raises(tmp_path):
    """An epoch with zero batches would make the infinite __iter__ spin
    forever; both store classes must fail loudly at construction instead
    (ADVICE r3)."""
    from gan_lib_tensorflow_tpu.data import packed

    imgs, _ = packed.write_store(str(tmp_path / "small"), 8, 16, 16, 3)
    packed.finalize_store(str(tmp_path / "small"), imgs, None)
    with pytest.raises(ValueError, match="8 images < batch_size 100"):
        data.PackedImageStore(str(tmp_path / "small"), batch_size=100)

    imgs, _ = packed.write_store(str(tmp_path / "smallp"), 4, 16, 32, 3)
    packed.finalize_store(str(tmp_path / "smallp"), imgs, None)
    meta_p = tmp_path / "smallp" / "meta.json"
    meta = json.loads(meta_p.read_text())
    meta["paired"] = True
    meta_p.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="4 pairs < batch_size 16"):
        data.PackedPairedStore(str(tmp_path / "smallp"), batch_size=16,
                               image_size=16)


def _statm_data_mb() -> float:
    """Anonymous data+stack segment of this process, in MB (statm field 6,
    pages). File-backed memmap pages do NOT count here — exactly the
    distinction the store's no-heap-copy claim is about."""
    with open("/proc/self/statm") as f:
        return int(f.read().split()[5]) * os.sysconf("SC_PAGE_SIZE") / 2**20


def test_streaming_heap_bound(tmp_path):
    """Backs data/packed.py's header claim: streaming an epoch must not pull
    the store into anonymous memory — heap growth stays a small fraction of
    the store size (the store streams through reclaimable page cache)."""
    from gan_lib_tensorflow_tpu.data import packed

    n, size = 3000, 64  # 3000*64*64*3 = ~35 MB store
    imgs, _ = packed.write_store(str(tmp_path / "big"), n, size, size, 3)
    imgs[:] = 127  # touch every page once at write time
    packed.finalize_store(str(tmp_path / "big"), imgs, None)
    del imgs
    store_mb = n * size * size * 3 / 2**20

    store = data.PackedImageStore(str(tmp_path / "big"), batch_size=50)
    it = iter(store)
    next(it)  # warm: allocator pools, native lib, first batch buffers
    before = _statm_data_mb()
    for _ in range(n // 50 - 1):  # the rest of one full epoch
        b = next(it)
    after = _statm_data_mb()
    assert b["image"].shape == (50, size, size, 3)
    growth = after - before
    # one batch is ~2.3 MB float32; allow allocator slack but stay far
    # below the 35 MB store
    assert growth < store_mb / 4, (growth, store_mb)
