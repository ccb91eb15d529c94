"""Shared color kernels for the media lanes."""

from __future__ import annotations

import numpy as np

__all__ = ["bt601_luma"]


def bt601_luma(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) uint8 RGB → (...) uint8 integer BT.601 luma (floor), the
    single formula all image/video lanes share (PNG, JPEG, GIF palettes)."""
    rgb = rgb.astype(np.int64)
    return ((299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2])
            // 1000).astype(np.uint8)
