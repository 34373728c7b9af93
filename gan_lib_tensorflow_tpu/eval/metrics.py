"""Inception Score + FID machinery — on-device feature/moment accumulation.

Reference: ``common/inception_score.py`` (frozen Inception pb, softmax over
50k samples in batches of 100, IS = exp(E KL(p(y|x) || p(y))), 10 splits) and
``common/fid.py`` (Frechet distance between pool3 moments) — SURVEY.md §2.1.

TPU-native redesign (SURVEY.md §3.4): the reference round-trips every batch
through host numpy into a separate Inception graph. Here the generator
forward, the feature net, AND the moment/IS-statistic accumulation all run in
ONE jitted program per batch (``DeviceEvalAccumulator``): features and
per-class probabilities never leave HBM; only the O(D^2) accumulator pytree
transfers to host, exactly once, at ``finalize()``. Inception Score is also
reduced on device via per-split sufficient statistics — per split s,
``IS_s = exp(E_x[Σ_y p log p] − Σ_y p̄_s log p̄_s)``, which is algebraically
the reference's ``exp(E KL(p||p̄_s))`` — so the 50k×C probability matrix is
never materialized on host either.

Under an active ``Mesh`` the image batch is sharded over the 'data' axis and
the accumulators are constrained replicated: XLA GSPMD inserts the
cross-device reductions (SURVEY §3.4 "psum the activation moments") inside
the same jitted update; no host-side gather exists at any scale.

The final covariance sqrtm runs on host scipy (one 2048^2 eigendecomposition —
not a TPU-shaped problem).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class MomentAccumulator:
    """Streaming mean/covariance of feature vectors (float64 on host).

    Host-side reference implementation — kept as the parity oracle for
    ``DeviceEvalAccumulator`` (tests/test_eval.py) and for callers that
    already hold numpy features. The hot paths use the device accumulator.
    """

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
    exactly the reference's formula. Host reference path (parity oracle for
    the device split-statistic reduction)."""
    scores = []
    n = probs.shape[0]
    for part in np.array_split(probs[: (n // splits) * splits], splits):
        py = part.mean(0, keepdims=True)
        kl = (part * (np.log(part + 1e-16) - np.log(py + 1e-16))).sum(1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))


def _replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def _batch_sharded(mesh, ndim: int):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


class DeviceEvalAccumulator:
    """On-device streaming IS/FID statistics.

    One jitted, buffer-donated update per batch computes features (optionally
    generating the batch first — generator and feature net fuse into a single
    XLA program) and folds them into:

    * ``n, s1, s2``   — FID moment sums (s2 accumulated via an MXU matmul),
    * ``plogp, py, split_n`` — per-IS-split sufficient statistics, with one
      overflow row for samples beyond ``splits * split_size`` (the reference
      truncates IS to a multiple of the split count; FID uses all samples).

    With ``mesh`` given, incoming images are constrained batch-sharded over
    the 'data' axis and the accumulator leaves replicated — GSPMD emits the
    cross-device psum of the moments inside the update (SURVEY §3.4).
    """

    def __init__(self, feature_fn: Callable, dim: int, *,
                 sample_fn: Optional[Callable] = None,
                 splits: int = 0, split_size: int = 0, mesh=None):
        self.feature_fn = feature_fn
        self.sample_fn = sample_fn
        self.dim = dim
        self.splits = splits
        self.split_size = max(int(split_size), 1)
        self.mesh = mesh
        self._acc = None  # lazy: num_classes read off the first logits batch
        self._count = 0

        def update(acc, images, start):
            if self.mesh is not None:
                images = jax.lax.with_sharding_constraint(
                    images, _batch_sharded(self.mesh, images.ndim))
            feats, logits = self.feature_fn(images)
            f = feats.astype(jnp.float32)
            p = jax.nn.softmax(logits.astype(jnp.float32), -1)
            b = f.shape[0]
            sid = jnp.minimum((start + jnp.arange(b)) // self.split_size,
                              self.splits)  # row `splits` = overflow bucket
            new = {
                "n": acc["n"] + b,
                "s1": acc["s1"] + f.sum(0),
                "s2": acc["s2"] + jnp.matmul(
                    f.T, f, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST),
                "plogp": acc["plogp"].at[sid].add(
                    (p * jnp.log(p + 1e-16)).sum(-1)),
                "py": acc["py"].at[sid].add(p),
                "split_n": acc["split_n"].at[sid].add(1.0),
            }
            if self.mesh is not None:
                new = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, _replicated(self.mesh)), new)
            return new

        self._update_images = jax.jit(update, donate_argnums=0)
        if sample_fn is not None:
            def sample_update(acc, rng, start):
                return update(acc, self.sample_fn(rng), start)
            self._update_sample = jax.jit(sample_update, donate_argnums=0)

    def _init_acc(self, num_classes: int):
        z = functools.partial(jnp.zeros, dtype=jnp.float32)
        acc = {
            "n": z(()), "s1": z((self.dim,)), "s2": z((self.dim, self.dim)),
            "plogp": z((self.splits + 1,)),
            "py": z((self.splits + 1, num_classes)),
            "split_n": z((self.splits + 1,)),
        }
        if self.mesh is not None:
            acc = jax.device_put(acc, _replicated(self.mesh))
        return acc

    def _ensure_acc(self, images=None, rng=None):
        if self._acc is None:
            # one un-donated probe call to learn the class count. The probe's
            # forward pass is discarded — the update that follows recomputes
            # it — so the first batch's COMPUTE is paid twice (once per eval);
            # no samples are lost
            probe = images if images is not None else self.sample_fn(rng)
            _, logits = self.feature_fn(probe)
            self._acc = self._init_acc(logits.shape[-1])

    def add_images(self, images) -> None:
        images = jnp.asarray(images)
        self._ensure_acc(images=images)
        self._acc = self._update_images(
            self._acc, images, jnp.asarray(self._count, jnp.int32))
        self._count += int(images.shape[0])

    def add_samples(self, rng, batch_size: int) -> None:
        """Generate a batch with ``sample_fn(rng)`` and fold it in — one
        fused XLA program; the images never exist on host."""
        self._ensure_acc(rng=rng)
        self._acc = self._update_sample(
            self._acc, rng, jnp.asarray(self._count, jnp.int32))
        self._count += batch_size

    @property
    def count(self) -> int:
        return self._count

    def moments(self) -> Tuple[np.ndarray, np.ndarray]:
        """Host transfer happens HERE, once: mu (D,), cov (D, D)."""
        a = jax.device_get(self._acc)
        n = float(a["n"])
        mu = a["s1"].astype(np.float64) / n
        cov = (a["s2"].astype(np.float64) - n * np.outer(mu, mu)) / max(n - 1, 1)
        return mu, cov

    def inception_score(self) -> Tuple[float, float]:
        """Reference 10-split IS from the device-side split statistics."""
        a = jax.device_get(self._acc)
        ns = a["split_n"][: self.splits].astype(np.float64)
        if not (ns > 0).all():
            raise ValueError(
                f"IS needs >= {self.splits * self.split_size} samples; "
                f"split counts {ns}")
        plogp = a["plogp"][: self.splits].astype(np.float64) / ns
        py = a["py"][: self.splits].astype(np.float64) / ns[:, None]
        scores = np.exp(plogp - (py * np.log(py + 1e-16)).sum(-1))
        return float(scores.mean()), float(scores.std())


def compute_statistics(
    feature_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    batches: Iterator[np.ndarray],
    dim: int,
    want_probs: bool = False,
    mesh=None,
):
    """Stream image batches ([-1,1] NHWC) through ``feature_fn`` (jitted:
    images -> (features, logits)); return (mu, cov[, probs]). Accumulation is
    on-device (``DeviceEvalAccumulator``); with ``want_probs`` the softmax
    batches are additionally fetched to host (test/diagnostic path only)."""
    acc = DeviceEvalAccumulator(feature_fn, dim, mesh=mesh)
    all_probs = []
    for imgs in batches:
        imgs = jnp.asarray(imgs)
        acc.add_images(imgs)
        if want_probs:
            _, logits = feature_fn(imgs)
            all_probs.append(jax.device_get(jax.nn.softmax(logits, -1)))
    mu, cov = acc.moments()
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
    mesh=None,
) -> dict:
    """The reference's eval entry (§3.4): generate n_samples, compute IS (and
    FID when real moments are given). Generator forward, feature forward, and
    statistic accumulation run as ONE jitted program per batch; the only host
    transfers are the final accumulators. ``samples_evaluated`` /
    ``samples_dropped`` report the batch-quantization remainder."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n_batches = max(n_samples // batch_size, 1)
    total = n_batches * batch_size
    is_n = (total // splits) * splits
    acc = DeviceEvalAccumulator(
        feature_fn, dim, sample_fn=sample_batch_fn,
        splits=splits, split_size=max(is_n // splits, 1), mesh=mesh)
    for _ in range(n_batches):
        rng, sub = jax.random.split(rng)
        acc.add_samples(sub, batch_size)
    is_mean, is_std = acc.inception_score()
    out = {"inception_score": is_mean, "inception_score_std": is_std,
           "samples_evaluated": total,
           "samples_dropped": max(n_samples - total, 0)}
    if real_stats is not None:
        mu, cov = acc.moments()
        out["fid"] = frechet_distance(mu, cov, *real_stats)
    return out
