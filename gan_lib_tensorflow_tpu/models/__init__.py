"""Model families (reference parity set, BASELINE.json configs 1-5):
ACGAN, SNGAN (CIFAR), SNGAN-projection (ImageNet-128), pix2pix, PGGAN."""

from . import acgan, pggan, pix2pix, sngan

__all__ = ["acgan", "pggan", "pix2pix", "sngan"]
