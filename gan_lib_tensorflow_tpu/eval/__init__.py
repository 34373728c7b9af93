"""Evaluation: IS/FID machinery, feature nets, sample grids."""

from .features import FixedFeatureNet
from .metrics import (
    MomentAccumulator,
    compute_statistics,
    evaluate_generator,
    frechet_distance,
    inception_score_from_probs,
)

__all__ = [
    "FixedFeatureNet",
    "MomentAccumulator", "compute_statistics", "evaluate_generator",
    "frechet_distance", "inception_score_from_probs",
]
