"""Physically-based shading: Fresnel, GGX microfacet, split-sum pieces.

Parity targets:
 - fresnel_schlick_roughness: /root/reference/src/nerf_models/microfacet.py:8-12
   (the only microfacet piece on the live split-sum path).
 - Full GGX microfacet BRDF (Monte-Carlo baseline path):
   microfacet.py:15-221.
 - reflect(): ibl_nerf_renderer.py:439.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_BIAS = 1e-5


def fresnel_schlick_roughness(
    cos_theta: jnp.ndarray, f0: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    """Roughness-aware Schlick Fresnel.

    cos_theta: (...,); f0: (..., 3); roughness: (...,). Returns (..., 3).
    """
    cos_theta = cos_theta[..., None]
    roughness = roughness[..., None]
    f1 = jnp.maximum(1.0 - roughness, f0) - f0
    return f0 + f1 * jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect direction d about normal n (both (..., 3))."""
    return d - 2.0 * jnp.sum(n * d, axis=-1, keepdims=True) * n


def _normalize(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def ggx_distribution(m: jnp.ndarray, n: jnp.ndarray, alpha) -> jnp.ndarray:
    """GGX normal distribution D. m: (N, L, 3) half vectors; n: (N, 3)."""
    cos_tm = jnp.clip(jnp.einsum("ijk,ik->ij", m, n), 0.0, 1.0)
    a2 = alpha**2
    denom = np.pi * jnp.square(jnp.square(cos_tm) * (a2 - 1.0) + 1.0)
    return a2 / (denom + _BIAS)


def _g_ggx(n_dot_x, r):
    k = r * r / 2.0
    return n_dot_x / (n_dot_x * (1.0 - k) + k + _BIAS)


def ggx_geometry(n_dot_v: jnp.ndarray, n_dot_l: jnp.ndarray, alpha) -> jnp.ndarray:
    """Smith geometry term (product of view/light GGX lambda terms)."""
    return _g_ggx(n_dot_l, alpha) * _g_ggx(n_dot_v, alpha)


def schlick_fresnel(l: jnp.ndarray, m: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
    """Schlick Fresnel. l, m: (N, L, 3); f0: (N, 3) -> (N, L, 3)."""
    cos_theta = jnp.clip(jnp.einsum("ijk,ijk->ij", l, m), 0.0, 1.0)[..., None]
    f0 = f0[:, None, :]
    return f0 + (1.0 - f0) * (1.0 - cos_theta) ** 5


def microfacet_brdf(
    pts2l: jnp.ndarray,
    pts2c: jnp.ndarray,
    normal: jnp.ndarray,
    albedo: jnp.ndarray | None = None,
    rough: jnp.ndarray | None = None,
    f0_scalar: float = 0.04,
    default_rough: float = 0.3,
):
    """Full GGX microfacet BRDF (glossy, diffuse, l·n) — Monte-Carlo
    baseline path, parity with Microfacet.__call__ (microfacet.py:24-91).

    pts2l: (N, L, 3) surface-to-light dirs; pts2c: (N, 3) to-camera;
    normal/albedo: (N, 3); rough: (N, 1).
    """
    n = pts2c.shape[0]
    if albedo is None:
        albedo = jnp.ones((n, 3), dtype=pts2c.dtype)
    if rough is None:
        rough = jnp.full((n, 1), default_rough, dtype=pts2c.dtype)

    pts2l = _normalize(pts2l)
    pts2c = _normalize(pts2c)
    normal = _normalize(normal)

    h = _normalize(pts2l + pts2c[:, None, :])
    metallic = 1.0 - rough
    f0 = f0_scalar * (1.0 - metallic) + albedo * metallic
    f = schlick_fresnel(pts2l, h, f0)
    alpha = rough**2

    l_dot_n = jnp.clip(jnp.einsum("ijk,ik->ij", pts2l, normal), 0.0, 1.0)
    v_dot_n = jnp.clip(jnp.einsum("ij,ij->i", pts2c, normal), 0.0, 1.0)[..., None]

    d = ggx_distribution(h, normal, alpha)[..., None]
    g = ggx_geometry(v_dot_n, l_dot_n, alpha)[..., None]
    denom = (4.0 * l_dot_n * v_dot_n)[..., None]

    brdf_glossy = f * g * d / (denom + _BIAS)
    lambert = albedo / np.pi
    brdf_diffuse = (1.0 - f) * lambert[:, None, :] * (1.0 - metallic[..., None])
    return brdf_glossy, brdf_diffuse, l_dot_n[..., None]
