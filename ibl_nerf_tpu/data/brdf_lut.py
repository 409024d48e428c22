"""Pre-integrated split-sum environment-BRDF LUT.

Parity: LUT load at /root/reference/src/train.py:81-88 — 512x512 png,
channels (A, B) indexed by (n·v, roughness), values in [0, 1].
The asset ships with the package (data/ibl_brdf_lut.png).
"""

from __future__ import annotations

import os

import cv2
import numpy as np

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "ibl_brdf_lut.png")


def load_brdf_lut(path: str | None = None) -> np.ndarray:
    """Returns the LUT as (H, W, 3) float32 in [0, 1] (RGB order)."""
    p = path or _DEFAULT_PATH
    img = cv2.imread(p)
    if img is None:
        raise FileNotFoundError(p)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 255.0
