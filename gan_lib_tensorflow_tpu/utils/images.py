"""Sample-grid writer — the ``common/save_images.py`` equivalent.

Reference: ``save_images(X, path)`` tiles a batch into an N x N grid,
denormalizes from [-1, 1], writes a PNG.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np


def to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8."""
    return np.clip((np.asarray(x, np.float32) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def save_image_grid(images: np.ndarray, path: str, rows: Optional[int] = None) -> None:
    """Tile [N, H, W, C] (float in [-1,1] or uint8) into a grid PNG."""
    from PIL import Image

    images = np.asarray(images)
    if images.dtype != np.uint8:
        images = to_uint8(images)
    n, h, w, c = images.shape
    rows = rows or int(math.ceil(math.sqrt(n)))
    cols = int(math.ceil(n / rows))
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i in range(n):
        r, cc = divmod(i, cols)
        grid[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = images[i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid.squeeze() if c == 1 else grid).save(path)
