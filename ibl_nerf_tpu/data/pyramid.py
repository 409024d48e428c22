"""Prefiltered ground-truth pyramid.

Parity: NerfDataset.get_coarse_images
(/root/reference/src/dataset/dataset_interface.py:162-176): level k is
the image downsampled by coarse_resize_scale**k (=4**k, computed from
the *original* resolution) then upsampled back to working resolution —
an area low-pass used as supervision for the K coarse radiance heads.

cv2 INTER_AREA downsample approximates torchvision's antialiased
bilinear; upsample is plain bilinear.
"""

from __future__ import annotations

import cv2
import numpy as np

COARSE_RESIZE_SCALE = 4


def build_prefiltered_pyramid(images: np.ndarray, levels: int,
                              image_scale: float = 1.0) -> np.ndarray:
    """images: (N, H, W, 3) float; returns (levels, N, H, W, 3)."""
    n, h, w, _ = images.shape
    out = np.empty((levels, n, h, w, 3), dtype=images.dtype)
    for level in range(1, levels + 1):
        sh = int(h / image_scale)
        sw = int(w / image_scale)
        for _ in range(level):
            sh //= COARSE_RESIZE_SCALE
            sw //= COARSE_RESIZE_SCALE
        sh, sw = max(sh, 1), max(sw, 1)
        for i in range(n):
            small = cv2.resize(images[i], (sw, sh), interpolation=cv2.INTER_AREA)
            out[level - 1, i] = cv2.resize(small, (w, h),
                                           interpolation=cv2.INTER_LINEAR)
    return out
