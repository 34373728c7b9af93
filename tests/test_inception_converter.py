"""Inception weight-converter pipeline test (VERDICT r1 next-step #3).

No pretrained weights exist offline, so the test builds SYNTHETIC source
checkpoints — random arrays under keras-style auto-numbered names (and a
torch-style state dict) with the real InceptionV3 shapes — and proves the
conversion pipeline roundtrips: convert -> contract npz -> load_params_npz
accepts it -> values land at the right flax paths. FID parity is then exactly
one asset-drop away.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "convert_inception_weights",
    os.path.join(REPO, "tools", "convert_inception_weights.py"))
conv_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(conv_mod)


@pytest.fixture(scope="module")
def target_paths():
    return conv_mod.creation_order_paths()


def _synthetic_keras_npz(target_paths, path):
    """Random keras-named source with the real shapes, in creation order."""
    rng = np.random.default_rng(0)
    convs, bns, fc = conv_mod._partition_targets(target_paths)
    src = {}
    for i, (_, shape) in enumerate(convs):
        name = "conv2d/kernel:0" if i == 0 else f"conv2d_{i}/kernel:0"
        src[name] = rng.standard_normal(shape).astype(np.float32)
    for i, unit in enumerate(bns):
        base = ("batch_normalization" if i == 0
                else f"batch_normalization_{i}")
        for stat, (_, shape) in unit.items():
            arr = rng.standard_normal(shape).astype(np.float32)
            if stat == "moving_variance":
                arr = np.abs(arr) + 0.1
            src[f"{base}/{stat}:0"] = arr
    for name, (_, shape) in fc.items():
        src[f"predictions/{name}:0"] = rng.standard_normal(shape).astype(np.float32)
    np.savez(path, **src)
    return src


def test_keras_npz_roundtrip(tmp_path, target_paths):
    src_path = str(tmp_path / "keras_src.npz")
    src = _synthetic_keras_npz(target_paths, src_path)

    out = conv_mod.convert(src_path)
    # complete + shape-exact
    assert set(out) == {"/".join(p) for p, _ in target_paths}
    for path, shape in target_paths:
        assert out["/".join(path)].shape == shape

    # spot-check the zip order: first conv kernel -> stem1, a mixed-block
    # kernel lands where keras' enumeration says it should
    np.testing.assert_array_equal(out["stem1/conv/kernel"],
                                  src["conv2d/kernel:0"])
    np.testing.assert_array_equal(out["stem1/beta"],
                                  src["batch_normalization/beta:0"])

    # the contract consumer accepts it bitwise
    out_path = str(tmp_path / "contract.npz")
    np.savez(out_path, **out)
    from gan_lib_tensorflow_tpu.eval.inception_v3 import load_params_npz
    shape_tree = _unflatten_shapes(target_paths)
    tree = load_params_npz(out_path, shape_tree)
    import jax
    flat = {tuple(k): v for k, v in _flatten(tree).items()}
    np.testing.assert_array_equal(
        np.asarray(flat[("stem1", "conv", "kernel")]), src["conv2d/kernel:0"])


def test_flax_npz_passthrough(tmp_path, target_paths):
    rng = np.random.default_rng(1)
    src = {"/".join(p): rng.standard_normal(s).astype(np.float32)
           for p, s in target_paths}
    src_path = str(tmp_path / "flax_src.npz")
    np.savez(src_path, **src)
    out = conv_mod.convert(src_path)
    for k, v in src.items():
        np.testing.assert_array_equal(out[k], v)


def test_shape_mismatch_hard_fails(tmp_path, target_paths):
    src_path = str(tmp_path / "bad.npz")
    src = _synthetic_keras_npz(target_paths, src_path)
    src["conv2d_5/kernel:0"] = np.zeros((1, 1, 7, 7), np.float32)
    np.savez(src_path, **src)
    with pytest.raises(SystemExit, match="shape mismatch"):
        conv_mod.convert(src_path)


def test_missing_tensor_hard_fails(tmp_path, target_paths):
    src_path = str(tmp_path / "short.npz")
    src = _synthetic_keras_npz(target_paths, src_path)
    del src["conv2d_3/kernel:0"]
    np.savez(src_path, **src)
    with pytest.raises(SystemExit):
        conv_mod.convert(src_path)


def test_torch_state_dict_roundtrip(tmp_path, target_paths):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    convs, bns, fc = conv_mod._partition_targets(target_paths)
    # torchvision-style module names in creation order; shapes OIHW
    names = [f"layer{i:03d}" for i in range(len(convs))]
    sd = {}
    for name, (_, shape) in zip(names, convs):
        h, w, i, o = shape
        sd[f"{name}.conv.weight"] = torch.tensor(
            rng.standard_normal((o, i, h, w)).astype(np.float32))
    for name, unit in zip(names, bns):
        n = unit["beta"][1][0]
        sd[f"{name}.bn.weight"] = torch.tensor(
            (np.abs(rng.standard_normal(n)) + 0.5).astype(np.float32))
        sd[f"{name}.bn.bias"] = torch.tensor(
            rng.standard_normal(n).astype(np.float32))
        sd[f"{name}.bn.running_mean"] = torch.tensor(
            rng.standard_normal(n).astype(np.float32))
        sd[f"{name}.bn.running_var"] = torch.tensor(
            (np.abs(rng.standard_normal(n)) + 0.1).astype(np.float32))
    sd["fc.weight"] = torch.tensor(
        rng.standard_normal((1000, 2048)).astype(np.float32))
    sd["fc.bias"] = torch.tensor(rng.standard_normal(1000).astype(np.float32))

    src_path = str(tmp_path / "torch_src.pth")
    torch.save(sd, src_path)
    out = conv_mod.convert(src_path)
    assert set(out) == {"/".join(p) for p, _ in target_paths}
    # OIHW -> HWIO transpose happened
    w0 = sd["layer000.conv.weight"].numpy()
    np.testing.assert_array_equal(out["stem1/conv/kernel"],
                                  np.transpose(w0, (2, 3, 1, 0)))
    # gamma fold: gamma*(x-mu)/sqrt(v+eps) == (x-mu)/sqrt(v'+eps)
    g = sd["layer000.bn.weight"].numpy().astype(np.float64)
    v = sd["layer000.bn.running_var"].numpy().astype(np.float64)
    eps = conv_mod.BN_EPS
    np.testing.assert_allclose(
        1.0 / np.sqrt(out["stem1/moving_variance"].astype(np.float64) + eps),
        g / np.sqrt(v + eps), rtol=1e-5)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if hasattr(v, "items"):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten_shapes(target_paths):
    tree = {}
    for path, shape in target_paths:
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = shape
    return tree
