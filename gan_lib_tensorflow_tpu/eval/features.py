"""Feature extractors for IS/FID.

The reference downloads a frozen Inception pb (``classify_image_graph_def.pb``)
— unobtainable in this offline environment (SURVEY.md §7 hard part #4). Two
extractors are provided:

* ``inception_v3.InceptionV3`` (sibling module) — the real architecture;
  plug in converted weights via ``load_params`` when assets exist.
* ``FixedFeatureNet`` (here) — a deterministic, seed-fixed random conv net,
  **test-only** (not exported from ``eval``; no CLI uses it). It exists so
  unit tests can exercise the IS/FID math cheaply. Random convolutional
  features are a recognized proxy for distribution distance (FID's Gaussian
  machinery is extractor-agnostic), but its numbers live on a different scale
  than the headline InceptionV3 extractor's and must never mix with them.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import Conv, Dense, downsample_avg


class _FixedCNN(nn.Module):
    width: int = 64
    feature_dim: int = 256
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        h = x
        for i, mul in enumerate((1, 2, 4)):
            h = Conv(self.width * mul, 3, strides=2, name=f"conv{i}")(h)
            h = nn.relu(h)
            h = Conv(self.width * mul, 3, name=f"conv{i}b")(h)
            h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))
        feats = Dense(self.feature_dim, name="feat")(h)
        logits = Dense(self.num_classes, name="logits")(nn.relu(feats))
        return feats, logits


class FixedFeatureNet:
    """Seed-fixed random CNN: images [-1,1] NHWC -> (features, logits)."""

    def __init__(self, image_size: int = 32, feature_dim: int = 256,
                 num_classes: int = 10, seed: int = 1234):
        self.model = _FixedCNN(feature_dim=feature_dim, num_classes=num_classes)
        self.feature_dim = feature_dim
        self.variables = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, image_size, image_size, 3)))
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    def __call__(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._apply(self.variables, images)
