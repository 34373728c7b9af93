"""Multi-resolution source for PGGAN's progressive ladder.

Reference: PGGAN trains from pre-downscaled per-resolution dataset files
(CelebA-HQ); each phase feeds reals at the current level's resolution
(SURVEY.md §3.3). Here a base source (real folder or synthetic) is wrapped
with on-host box-downsampling to the requested level; the level changes only
at phase boundaries (between jitted step compilations), so shapes stay static
inside each phase.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from .base import DataSource
from .fake import FakeImages


def box_downsample(x: np.ndarray, factor: int) -> np.ndarray:
    from . import native
    return native.box_downsample(np.asarray(x, np.float32), factor)


class MultiResolution(DataSource):
    """Wraps a base max-resolution source; yields at ``resolution``."""

    def __init__(self, base: Optional[DataSource] = None, batch_size: int = 16,
                 max_resolution: int = 1024, resolution: int = 4, seed: int = 0):
        self.base = base or FakeImages(
            batch_size=batch_size, image_size=max_resolution,
            num_classes=1, seed=seed)
        self.batch_size = batch_size
        self.max_resolution = max_resolution
        self.resolution = resolution
        self.seed = getattr(self.base, "seed", seed)

    def reseeded(self, seed: int) -> "MultiResolution":
        out = self.at_resolution(self.resolution)
        out.base = self.base.reseeded(seed)
        out.seed = seed
        return out

    def at_resolution(self, resolution: int) -> "MultiResolution":
        out = MultiResolution.__new__(MultiResolution)
        out.base = self.base
        out.batch_size = self.batch_size
        out.max_resolution = self.max_resolution
        out.resolution = resolution
        out.seed = self.seed
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        factor = self.max_resolution // self.resolution
        for b in self.base:
            img = box_downsample(b["image"], factor).astype(np.float32)
            yield {"image": img}
