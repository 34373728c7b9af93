"""InceptionV3 in flax — the real IS/FID feature network.

Reference behavior: ``common/inception_score.py`` downloads the frozen TF
Inception graph (``classify_image_graph_def.pb``) and runs softmax / pool3
activations. Offline here, so this module provides the exact keras/TF-slim
InceptionV3 topology (BN(scale=False, eps=1e-3) + ReLU after every conv,
mixed0..mixed10, 2048-d global-average pool3 features, 1000-way logits) with
randomly-initialized params plus ``load_params_npz`` to drop in converted
pretrained weights when assets are available.

Weight conversion: the npz must use THIS module's parameter paths as keys
('/'-joined flax paths, e.g. ``stem1/conv/kernel``, ``mixed0/b1x1/beta`` — the
full list comes from ``param_paths()``). Keras' auto-generated layer names
(conv2d_N/batch_normalization_N) enumerate in the same topological creation
order as this module builds, so a converter zips keras' ordered weight list
onto ``param_paths()`` output; run it wherever keras weights are available
and validate shapes (``load_params_npz`` hard-fails on any mismatch).

Input: NHWC float in [-1, 1] (inception's native scale), any resolution —
resized to 299x299 bilinear on device, matching the reference pipeline's
resize semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv(nn.Module):
    """Conv (no bias) + BN(scale=False, eps=1e-3) + ReLU — keras BasicConv2d.

    ``use_actual_stats``: normalize with the current batch's statistics
    instead of the stored moving stats. Required in random-init mode — with
    untrained weights the stored (0, 1) stats are a no-op and 48 conv layers
    collapse/saturate, making features degenerate (observed: IS pinned at 1.0,
    FID ~0 for any pair of distributions). Pretrained mode keeps stored stats.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_actual_stats: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        # inference-only network: BN folds to per-channel affine from stored
        # moving stats; we keep explicit beta/mean/var params (gamma absent,
        # like keras scale=False).
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        mean = self.param("moving_mean", nn.initializers.zeros, (self.features,))
        var = self.param("moving_variance", nn.initializers.ones, (self.features,))
        if self.use_actual_stats:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) + beta
        return nn.relu(x)


def _pool_same(x, window=3, stride=1, kind="avg"):
    if kind == "avg":
        # TF/keras SAME average pooling EXCLUDES padding from the denominator
        # (edge windows divide by the number of valid taps, not window^2);
        # count_include_pad=False reproduces that. Verified numerically
        # against keras InceptionV3 (tests/test_inception_keras_parity.py).
        return nn.avg_pool(x, (window, window), (stride, stride), "SAME",
                           count_include_pad=False)
    return nn.max_pool(x, (window, window), (stride, stride), "SAME")


def _pool_valid(x, window=3, stride=2, kind="max"):
    if kind == "avg":
        return nn.avg_pool(x, (window, window), (stride, stride), "VALID")
    return nn.max_pool(x, (window, window), (stride, stride), "VALID")


class InceptionA(nn.Module):  # mixed 0-2, 35x35
    pool_features: int
    use_actual_stats: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), use_actual_stats=self.use_actual_stats, name="b1x1")(x)
        b5 = BasicConv(48, (1, 1), use_actual_stats=self.use_actual_stats, name="b5x5_1")(x)
        b5 = BasicConv(64, (5, 5), use_actual_stats=self.use_actual_stats, name="b5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), use_actual_stats=self.use_actual_stats, name="b3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), use_actual_stats=self.use_actual_stats, name="b3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), use_actual_stats=self.use_actual_stats, name="b3x3dbl_3")(b3)
        bp = _pool_same(x, 3, 1, "avg")
        bp = BasicConv(self.pool_features, (1, 1), use_actual_stats=self.use_actual_stats, name="bpool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):  # mixed 3, 35->17
    use_actual_stats: bool = False
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), padding="VALID", use_actual_stats=self.use_actual_stats, name="b3x3")(x)
        bd = BasicConv(64, (1, 1), use_actual_stats=self.use_actual_stats, name="b3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), use_actual_stats=self.use_actual_stats, name="b3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), padding="VALID",
                       use_actual_stats=self.use_actual_stats,
                       name="b3x3dbl_3")(bd)
        bp = _pool_valid(x, 3, 2, "max")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):  # mixed 4-7, 17x17
    c7: int
    use_actual_stats: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), use_actual_stats=self.use_actual_stats, name="b1x1")(x)
        b7 = BasicConv(c7, (1, 1), use_actual_stats=self.use_actual_stats, name="b7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), use_actual_stats=self.use_actual_stats, name="b7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), use_actual_stats=self.use_actual_stats, name="b7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), use_actual_stats=self.use_actual_stats, name="b7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), use_actual_stats=self.use_actual_stats, name="b7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), use_actual_stats=self.use_actual_stats, name="b7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), use_actual_stats=self.use_actual_stats, name="b7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), use_actual_stats=self.use_actual_stats, name="b7x7dbl_5")(bd)
        bp = _pool_same(x, 3, 1, "avg")
        bp = BasicConv(192, (1, 1), use_actual_stats=self.use_actual_stats, name="bpool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):  # mixed 8, 17->8
    use_actual_stats: bool = False
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), use_actual_stats=self.use_actual_stats, name="b3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), padding="VALID",
                       use_actual_stats=self.use_actual_stats,
                       name="b3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), use_actual_stats=self.use_actual_stats, name="b7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), use_actual_stats=self.use_actual_stats, name="b7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), use_actual_stats=self.use_actual_stats, name="b7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), padding="VALID",
                       use_actual_stats=self.use_actual_stats,
                       name="b7x7x3_4")(b7)
        bp = _pool_valid(x, 3, 2, "max")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):  # mixed 9-10, 8x8
    use_actual_stats: bool = False
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), use_actual_stats=self.use_actual_stats, name="b1x1")(x)
        b3 = BasicConv(384, (1, 1), use_actual_stats=self.use_actual_stats, name="b3x3_1")(x)
        b3a = BasicConv(384, (1, 3), use_actual_stats=self.use_actual_stats, name="b3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), use_actual_stats=self.use_actual_stats, name="b3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), use_actual_stats=self.use_actual_stats, name="b3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), use_actual_stats=self.use_actual_stats, name="b3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), use_actual_stats=self.use_actual_stats, name="b3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), use_actual_stats=self.use_actual_stats, name="b3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _pool_same(x, 3, 1, "avg")
        bp = BasicConv(192, (1, 1), use_actual_stats=self.use_actual_stats, name="bpool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    use_actual_stats: bool = False

    @nn.compact
    def __call__(self, x):
        # stem (299x299 -> 35x35x192)
        x = BasicConv(32, (3, 3), strides=(2, 2), padding="VALID", use_actual_stats=self.use_actual_stats, name="stem1")(x)
        x = BasicConv(32, (3, 3), padding="VALID", use_actual_stats=self.use_actual_stats, name="stem2")(x)
        x = BasicConv(64, (3, 3), use_actual_stats=self.use_actual_stats, name="stem3")(x)
        x = _pool_valid(x, 3, 2, "max")
        x = BasicConv(80, (1, 1), padding="VALID", use_actual_stats=self.use_actual_stats, name="stem4")(x)
        x = BasicConv(192, (3, 3), padding="VALID", use_actual_stats=self.use_actual_stats, name="stem5")(x)
        x = _pool_valid(x, 3, 2, "max")

        x = InceptionA(32, use_actual_stats=self.use_actual_stats, name="mixed0")(x)
        x = InceptionA(64, use_actual_stats=self.use_actual_stats, name="mixed1")(x)
        x = InceptionA(64, use_actual_stats=self.use_actual_stats, name="mixed2")(x)
        x = InceptionB(use_actual_stats=self.use_actual_stats, name="mixed3")(x)
        x = InceptionC(128, use_actual_stats=self.use_actual_stats, name="mixed4")(x)
        x = InceptionC(160, use_actual_stats=self.use_actual_stats, name="mixed5")(x)
        x = InceptionC(160, use_actual_stats=self.use_actual_stats, name="mixed6")(x)
        x = InceptionC(192, use_actual_stats=self.use_actual_stats, name="mixed7")(x)
        x = InceptionD(use_actual_stats=self.use_actual_stats, name="mixed8")(x)
        x = InceptionE(use_actual_stats=self.use_actual_stats, name="mixed9")(x)
        x = InceptionE(use_actual_stats=self.use_actual_stats, name="mixed10")(x)

        feats = jnp.mean(x, axis=(1, 2))  # pool3: [N, 2048]
        logits = nn.Dense(self.num_classes, name="fc")(feats)
        return feats, logits


class InceptionV3Features:
    """IS/FID extractor: images [-1,1] NHWC any size -> (2048-d feats, logits).

    With ``params_npz=None`` the net is randomly initialized (fixed seed) —
    usable as a deterministic stand-in extractor; absolute IS/FID values then
    are NOT comparable to published Inception numbers (SURVEY.md §7 risk #4).
    """

    feature_dim = 2048

    def __init__(self, params_npz: Optional[str] = None, seed: int = 0):
        # Random-init mode normalizes with per-batch stats — with stored
        # (0, 1) stats an untrained 48-conv stack saturates and every
        # distribution maps to the same degenerate features.
        self.model = InceptionV3(use_actual_stats=params_npz is None)
        self.variables = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 299, 299, 3)))
        if params_npz is not None:
            self.variables = {"params": load_params_npz(
                params_npz, jax.tree_util.tree_map(np.shape, self.variables["params"]))}

        def apply(v, images):
            images = jax.image.resize(
                images, (images.shape[0], 299, 299, 3), "bilinear")
            return self.model.apply(v, images)

        self._apply = jax.jit(apply)

    def __call__(self, images):
        return self._apply(self.variables, images)


def param_paths(shape_tree=None) -> list:
    """Expected npz keys (and shapes) for ``load_params_npz`` — the contract
    for offline weight conversion."""
    from flax.traverse_util import flatten_dict

    if shape_tree is None:
        m = InceptionV3()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
        shape_tree = jax.tree_util.tree_map(np.shape, v["params"])
    return [("/".join(k), tuple(s)) for k, s in
            sorted(flatten_dict(shape_tree).items())]


def load_params_npz(path: str, shape_tree) -> dict:
    """Load a flat npz (keys = '/'-joined flax paths) into the param tree.
    Raises on any missing key or shape mismatch — silent partial loads would
    quietly corrupt FID."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    raw = dict(np.load(path))
    flat_shapes = flatten_dict(shape_tree)
    out = {}
    for k, shp in flat_shapes.items():
        key = "/".join(k)
        if key not in raw:
            raise KeyError(f"missing weight {key} in {path}")
        if tuple(raw[key].shape) != tuple(shp):
            raise ValueError(f"shape mismatch {key}: {raw[key].shape} != {shp}")
        out[k] = jnp.asarray(raw[key])
    return unflatten_dict(out)
