"""Evaluation: IS/FID machinery, feature nets, sample grids.

The ONE feature extractor for all headline paths (cli/evaluate.py,
``train_sngan --eval-every``) is ``inception_v3.InceptionV3Features`` —
pretrained when a converted npz is supplied (tools/convert_inception_weights),
deterministic random-init stand-in otherwise. ``features.FixedFeatureNet`` is
deliberately NOT exported: it exists only so unit tests can exercise the
IS/FID math with a cheap net (importable as ``eval.features.FixedFeatureNet``);
its numbers are on a different scale and must never mix with the headline
extractor's.
"""

from .metrics import (
    DeviceEvalAccumulator,
    MomentAccumulator,
    compute_statistics,
    evaluate_generator,
    frechet_distance,
    inception_score_from_probs,
)
from . import perceptual

__all__ = [
    "DeviceEvalAccumulator", "MomentAccumulator", "compute_statistics",
    "evaluate_generator", "frechet_distance", "inception_score_from_probs",
    "perceptual",
]
