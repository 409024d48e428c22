"""Normal estimators from depth gradients.

Parity: /root/reference/src/nerf_models/normal_from_depth.py:16-183.
Four variants:
 - position / direction epsilon (finite differences, the live configs'
   choice `normal_map_from_depth_gradient_epsilon`): one 4x-batched
   density query;
 - position / direction autograd: the reference differentiates the
   rendered depth wrt per-ray pixel-basis offsets (a, b) with
   `backward()` inside the forward pass; here each derivative is a
   single `jax.jvp` (forward-mode) of the depth render — exact, no
   double-backward machinery.

All estimators return *detached* normals (the reference detaches every
live use), so we stop_gradient at the call site in the renderer.

`query_sigma` is a closure (pts[..., 3] -> raw sigma[...]) so estimators
stay agnostic of the field internals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ibl_nerf_tpu.ops.compositing import (
    alpha_from_sigma,
    dists_from_z_vals,
    weights_from_alpha,
)


def _normalize(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _pixel_basis(rays_d: jnp.ndarray):
    """right/up basis per ray (normal_from_depth.py:20-24 — unnormalized,
    matching the reference exactly)."""
    up_world = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], rays_d.dtype),
                                rays_d.shape)
    right = jnp.cross(rays_d, up_world)
    up = jnp.cross(right, rays_d)
    return right, up


def _depth_from_sigma(sigma_raw, dists, z_vals):
    alpha = alpha_from_sigma(sigma_raw, dists)
    w = weights_from_alpha(alpha)
    return jnp.sum(w * z_vals, axis=-1)


def _sweep_sigma(query_sigma, new_pts, scan: bool):
    """Evaluate the (4, B, S, 3) ε-offset point set.

    scan=False: ONE batched (4B, S, 3) density query — a single MXU
    sweep, fastest when activations fit HBM. The flatten keeps the RAY
    axis MAJOR ((B, 4, ...) -> (4B, ...)): under a rays-sharded mesh,
    merging (4, B) with B sharded is unrepresentable and XLA inserts a
    full all-gather of the sweep points (measured 6.3 MB/step at live
    shapes before this ordering); merging (B, 4) keeps every offset ray
    on its primary ray's chip.
    scan=True: lax.map over the 4 offsets — 4x lower activation peak so
    big inference chunks fit (the estimator is always stop_gradient'd,
    so the scan never has to be differentiated).
    """
    b = new_pts.shape[1]
    if scan:
        return jax.lax.map(lambda p: query_sigma(p)[..., 0], new_pts)
    pts_bmajor = jnp.swapaxes(new_pts, 0, 1)  # (B, 4, S, 3)
    sigma = query_sigma(
        pts_bmajor.reshape(4 * b, *new_pts.shape[2:]))[..., 0]
    return jnp.swapaxes(sigma.reshape(b, 4, -1), 0, 1)


def normal_from_depth_gradient_epsilon(query_sigma, rays_o, rays_d, z_vals,
                                       epsilon: float = 0.01,
                                       scan: bool = False):
    """Finite-difference normals wrt *position* offsets.

    The 4 offset ray sets are evaluated as ONE batched density query
    (4B, S, 3) — a single MXU sweep (parity: normal_from_depth.py:139-183).
    """
    right, up = _pixel_basis(rays_d)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]

    offsets = jnp.stack([right, -right, up, -up], axis=0)  # (4, B, 3)
    new_pts = pts[None] + epsilon * offsets[:, :, None, :]  # (4, B, S, 3)
    sigma = _sweep_sigma(query_sigma, new_pts, scan)

    dists = dists_from_z_vals(z_vals, rays_d)
    d_r = _depth_from_sigma(sigma[0], dists, z_vals)
    d_l = _depth_from_sigma(sigma[1], dists, z_vals)
    d_u = _depth_from_sigma(sigma[2], dists, z_vals)
    d_d = _depth_from_sigma(sigma[3], dists, z_vals)

    dx = 2 * epsilon * right + (d_r - d_l)[..., None] * rays_d
    dy = 2 * epsilon * up + (d_u - d_d)[..., None] * rays_d
    return _normalize(jnp.cross(dx, dy))


def normal_from_depth_gradient_direction_epsilon(query_sigma, rays_o, rays_d,
                                                 z_vals, epsilon: float = 0.01,
                                                 scan: bool = False):
    """Finite-difference normals wrt *direction* offsets
    (normal_from_depth.py:55-99)."""
    right, up = _pixel_basis(rays_d)

    nd_r = _normalize(rays_d + epsilon * right)
    nd_l = _normalize(rays_d - epsilon * right)
    nd_u = _normalize(rays_d + epsilon * up)
    nd_d = _normalize(rays_d - epsilon * up)

    new_d = jnp.stack([nd_r, nd_l, nd_u, nd_d], axis=0)        # (4, B, 3)
    pts = (rays_o[None, :, None, :]
           + new_d[:, :, None, :] * z_vals[None, :, :, None])   # (4, B, S, 3)
    sigma = _sweep_sigma(query_sigma, pts, scan)

    dists = dists_from_z_vals(z_vals, rays_d)
    depths = [_depth_from_sigma(sigma[i], dists, z_vals) for i in range(4)]

    pos_r = rays_o + depths[0][..., None] * nd_r
    pos_l = rays_o + depths[1][..., None] * nd_l
    pos_u = rays_o + depths[2][..., None] * nd_u
    pos_d = rays_o + depths[3][..., None] * nd_d
    return _normalize(jnp.cross(pos_r - pos_l, pos_u - pos_d))


def normal_from_depth_gradient(query_sigma, rays_o, rays_d, z_vals):
    """Autograd normals wrt position offsets (normal_from_depth.py:102-136)
    via two forward-mode JVPs of the depth render."""
    right, up = _pixel_basis(rays_d)
    dists = dists_from_z_vals(z_vals, rays_d)

    def depth_of(ab):
        a, b = ab[..., 0:1], ab[..., 1:2]
        new_x = rays_o + right * a + up * b
        pts = new_x[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
        sigma = query_sigma(pts)[..., 0]
        return _depth_from_sigma(sigma, dists, z_vals)

    zero = jnp.zeros((*rays_d.shape[:-1], 2), rays_d.dtype)
    ea = jnp.zeros_like(zero).at[..., 0].set(1.0)
    eb = jnp.zeros_like(zero).at[..., 1].set(1.0)
    _, dx = jax.jvp(depth_of, (zero,), (ea,))
    _, dy = jax.jvp(depth_of, (zero,), (eb,))

    grad = right * dx[..., None] + up * dy[..., None]
    return _normalize(grad - rays_d)


def normal_from_depth_gradient_direction(query_sigma, rays_o, rays_d, z_vals):
    """Autograd normals wrt direction offsets (normal_from_depth.py:16-52)."""
    right, up = _pixel_basis(rays_d)
    dists = dists_from_z_vals(z_vals, rays_d)

    def depth_of(ab):
        a, b = ab[..., 0:1], ab[..., 1:2]
        new_d = a * right + b * up + jnp.sqrt(1.0 - a * a - b * b) * rays_d
        pts = rays_o[..., None, :] + new_d[..., None, :] * z_vals[..., :, None]
        sigma = query_sigma(pts)[..., 0]
        return _depth_from_sigma(sigma, dists, z_vals)

    zero = jnp.zeros((*rays_d.shape[:-1], 2), rays_d.dtype)
    ea = jnp.zeros_like(zero).at[..., 0].set(1.0)
    eb = jnp.zeros_like(zero).at[..., 1].set(1.0)
    _, dx = jax.jvp(depth_of, (zero,), (ea,))
    _, dy = jax.jvp(depth_of, (zero,), (eb,))

    grad = right * dx[..., None] + up * dy[..., None]
    return _normalize(grad - rays_d)


def normal_from_sigma_gradient(query_sigma, pts, weights):
    """Density-gradient normals composited along the ray.

    The reference *calls* this variant but its import is commented out
    (ibl_nerf_renderer.py:15,349 — a NameError in the reference); we
    provide a working implementation: n = -normalize(grad sigma),
    weighted by compositing weights.
    """
    def sigma_sum(p):
        return jnp.sum(query_sigma(p))

    g = jax.grad(sigma_sum)(pts)  # (B, S, 3)
    n = -_normalize(g)
    return _normalize(jnp.einsum("bs,bsc->bc", weights, n))


def normal_from_sigma_gradient_surface(query_sigma, x_surface):
    """Density-gradient normals at the composited surface point."""
    def sigma_sum(p):
        return jnp.sum(query_sigma(p[..., None, :]))

    g = jax.grad(sigma_sum)(x_surface)
    return -_normalize(g)
