"""Instance-label encoders.

Parity: /root/reference/src/utils/label_utils.py:8-176 — vestigial in
the reference (imported by train/test but never used on any live path;
inherited from a prior semantic-NeRF project). Provided for capability
completeness: colored-mask <-> label maps and the four label encodings
(one-hot / scalar / colored / random-code), jnp-native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def colored_mask_to_label_map(colored_mask: np.ndarray,
                              color_list: np.ndarray) -> np.ndarray:
    """(H, W, 3) colored mask -> (H, W) int labels (first match wins
    from the end, parity label_utils.py:8-18)."""
    label = np.zeros(colored_mask.shape[:-1], dtype=np.int32)
    for i in range(len(color_list)):
        label = np.where(np.all(colored_mask == color_list[i], axis=-1),
                         i, label)
    return label


def label_to_colored_label(label: jnp.ndarray,
                           color_list: jnp.ndarray) -> jnp.ndarray:
    """(...,) int labels -> (..., 3) colors."""
    return jnp.take(color_list, label, axis=0)


class LabelEncoder:
    """Base: maps integer instance labels to a trainable-target encoding."""

    def __init__(self, label_color_list: np.ndarray):
        self.label_color_list = jnp.asarray(label_color_list)
        self.label_number = len(label_color_list)

    def get_dimension(self) -> int:
        raise NotImplementedError

    def encode(self, label: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def decode(self, encoded: jnp.ndarray, th: float = 0.0) -> jnp.ndarray:
        raise NotImplementedError

    def encoded_label_to_colored_label(self, encoded, th: float = 0.0):
        return label_to_colored_label(self.decode(encoded, th),
                                      self.label_color_list)

    def error(self, output_encoded, target_label):
        """Mean-squared error in encoded space."""
        target = self.encode(target_label)
        return jnp.mean((output_encoded - target) ** 2)


class OneHotLabelEncoder(LabelEncoder):
    def get_dimension(self):
        return self.label_number

    def encode(self, label):
        return jax.nn.one_hot(label, self.label_number)

    def decode(self, encoded, th: float = 0.0):
        return jnp.argmax(encoded, axis=-1)


class ScalarLabelEncoder(LabelEncoder):
    def get_dimension(self):
        return 1

    def encode(self, label):
        return (label[..., None].astype(jnp.float32)
                / max(self.label_number - 1, 1))

    def decode(self, encoded, th: float = 0.0):
        x = jnp.clip(encoded[..., 0], 0.0, 1.0)
        return jnp.round(x * (self.label_number - 1)).astype(jnp.int32)


class ColoredLabelEncoder(LabelEncoder):
    def get_dimension(self):
        return 3

    def encode(self, label):
        return (jnp.take(self.label_color_list, label, axis=0)
                .astype(jnp.float32) / 255.0)

    def decode(self, encoded, th: float = 0.0):
        colors = self.label_color_list.astype(jnp.float32) / 255.0
        d = jnp.sum((encoded[..., None, :] - colors) ** 2, axis=-1)
        return jnp.argmin(d, axis=-1)


class RandomLabelEncoder(LabelEncoder):
    """Random unit code per label (nearest-code decode)."""

    def __init__(self, label_color_list, dim: int = 16, seed: int = 0):
        super().__init__(label_color_list)
        self.dim = dim
        codes = jax.random.normal(jax.random.key(seed),
                                  (self.label_number, dim))
        self.codes = codes / jnp.linalg.norm(codes, axis=-1, keepdims=True)

    def get_dimension(self):
        return self.dim

    def encode(self, label):
        return jnp.take(self.codes, label, axis=0)

    def decode(self, encoded, th: float = 0.0):
        d = jnp.sum((encoded[..., None, :] - self.codes) ** 2, axis=-1)
        return jnp.argmin(d, axis=-1)
