"""Inception Score + FID machinery — on-device feature/moment accumulation.

Reference: ``common/inception_score.py`` (frozen Inception pb, softmax over
50k samples in batches of 100, IS = exp(E KL(p(y|x) || p(y))), 10 splits) and
``common/fid.py`` (Frechet distance between pool3 moments) — SURVEY.md §2.1.

TPU-native redesign (SURVEY.md §3.4): the reference round-trips every batch
through host numpy into a separate Inception graph. Here the generator forward
AND the feature net run in one jitted function per batch; only the O(D^2)
moment accumulators come back to host. The feature extractor is pluggable:
the real InceptionV3 port (``eval.inception_v3``) when weights are available,
or any fixed feature net — IS/FID are meaningful as *relative* metrics under
any fixed extractor.

The final covariance sqrtm runs on host scipy (one 2048^2 eigendecomposition —
not a TPU-shaped problem).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class MomentAccumulator:
    """Streaming mean/covariance of feature vectors (float64 on host)."""

    dim: int

    def __post_init__(self):
        self.n = 0
        self.s1 = np.zeros((self.dim,), np.float64)
        self.s2 = np.zeros((self.dim, self.dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.s1 += f.sum(0)
        self.s2 += f.T @ f

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        mu = self.s1 / self.n
        cov = (self.s2 - self.n * np.outer(mu, mu)) / max(self.n - 1, 1)
        return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (Heusel et al. 2017)."""
    import scipy.linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(cov1 @ cov2)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2 * np.trace(covmean))


def inception_score_from_probs(probs: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """IS = exp(E KL(p(y|x) || p(y))), mean +/- std over ``splits`` chunks —
    exactly the reference's formula."""
    scores = []
    n = probs.shape[0]
    for part in np.array_split(probs[: (n // splits) * splits], splits):
        py = part.mean(0, keepdims=True)
        kl = (part * (np.log(part + 1e-16) - np.log(py + 1e-16))).sum(1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))


def compute_statistics(
    feature_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    batches: Iterator[np.ndarray],
    dim: int,
    want_probs: bool = False,
):
    """Stream image batches ([-1,1] NHWC) through ``feature_fn`` (jitted:
    images -> (features, logits)); return (mu, cov[, probs])."""
    acc = MomentAccumulator(dim)
    all_probs = []
    for imgs in batches:
        feats, logits = feature_fn(jnp.asarray(imgs))
        acc.update(jax.device_get(feats))
        if want_probs:
            all_probs.append(jax.device_get(jax.nn.softmax(logits, -1)))
    mu, cov = acc.finalize()
    if want_probs:
        return mu, cov, np.concatenate(all_probs)
    return mu, cov


def evaluate_generator(
    sample_batch_fn: Callable[[jax.Array], jnp.ndarray],
    feature_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    dim: int,
    n_samples: int = 50_000,
    batch_size: int = 100,
    rng: Optional[jax.Array] = None,
    real_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    splits: int = 10,
) -> dict:
    """The reference's eval entry (§3.4): generate n_samples, compute IS (and
    FID when real moments are given). ``sample_batch_fn(rng) -> images`` stays
    jitted; features accumulate streaming."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    acc = MomentAccumulator(dim)
    all_probs = []
    n_batches = max(n_samples // batch_size, 1)
    if n_samples % batch_size and n_samples > batch_size:
        print(f"note: evaluating {n_batches * batch_size} of {n_samples} "
              f"samples (remainder dropped)", flush=True)
    for i in range(n_batches):
        rng, sub = jax.random.split(rng)
        imgs = sample_batch_fn(sub)
        feats, logits = feature_fn(imgs)
        acc.update(jax.device_get(feats))
        all_probs.append(jax.device_get(jax.nn.softmax(logits, -1)))
    is_mean, is_std = inception_score_from_probs(np.concatenate(all_probs), splits)
    out = {"inception_score": is_mean, "inception_score_std": is_std}
    if real_stats is not None:
        mu, cov = acc.finalize()
        out["fid"] = frechet_distance(mu, cov, *real_stats)
    return out
