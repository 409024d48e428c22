"""The IBL-NeRF neural field.

Capability parity with the reference model
(/root/reference/src/nerf_models/ibl_nerf.py:14-217): an 8x256 trunk MLP
with a skip connection at layer 4, plus heads for density sigma(1),
albedo(3), roughness(1), irradiance(1), radiance(3) and K "coarse
(prefiltered) radiance" heads (3 each). Raw output channel layout is
``[sigma, albedo3, rough, irrad, rad3, coarse3*K]`` — activations
(relu-in-compositor for sigma, sigmoids, etc.) are applied by the
renderer, not here, exactly as in the reference.

TPU-first design decisions (deliberately NOT a torch translation):
 - params are a flat pytree of dense (in, out) matrices; the MLP is a
   chain of large (N, W) x (W, W) matmuls that map straight onto the MXU;
 - all W//2-wide head feature layers (albedo, irradiance, K coarse
   radiance) are *packed into a single fused matmul* (W, (2+K)*W//2)
   followed by a block einsum for the output projections — one MXU op
   instead of 2+K small ones;
 - freeze_radiance / freeze_roughness (reference forward_freezed,
   ibl_nerf.py:88-152) are expressed as `jax.lax.stop_gradient` on the
   exact tensors the reference computes under `torch.no_grad()`;
 - compute dtype is a parameter: bf16 activations/weights on the MXU
   with f32 accumulation for training speed, f32 for parity tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ibl_nerf_tpu.ops.embedding import embedding_dim

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Static architecture config (hashable; usable as a jit static arg)."""

    depth: int = 8
    width: int = 256
    multires: int = 10          # positional-encoding bands for positions
    multires_views: int = 4     # positional-encoding bands for directions
    skips: tuple[int, ...] = (4,)
    coarse_radiance_number: int = 3
    color_independent_to_direction: bool = False

    @property
    def input_ch(self) -> int:
        return embedding_dim(3, self.multires)

    @property
    def input_ch_views(self) -> int:
        return embedding_dim(3, self.multires_views)


def field_raw_channels(cfg: FieldConfig) -> int:
    """sigma(1) + albedo(3) + rough(1) + irrad(1) + rad(3) + K*3."""
    return 9 + 3 * cfg.coarse_radiance_number


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both weight and bias (kept for weight-port parity)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_field_params(key: jax.Array, cfg: FieldConfig) -> Params:
    W, D = cfg.width, cfg.depth
    in_ch, in_ch_views = cfg.input_ch, cfg.input_ch_views
    K = cfg.coarse_radiance_number
    keys = iter(jax.random.split(key, 64))

    trunk = []
    for i in range(D):
        fan_in = in_ch if i == 0 else (W + in_ch if (i - 1) in cfg.skips else W)
        trunk.append(_linear_init(next(keys), fan_in, W))

    params: Params = {
        "trunk": trunk,
        "sigma": _linear_init(next(keys), W, 1),
        "albedo_feat": _linear_init(next(keys), W, W // 2),
        "albedo": _linear_init(next(keys), W // 2, 3),
        "roughness": _linear_init(next(keys), W, 1),
        "irradiance_feat": _linear_init(next(keys), W, W // 2),
        "irradiance": _linear_init(next(keys), W // 2, 1),
        "feature": _linear_init(next(keys), W, W),
        "views": [_linear_init(next(keys), in_ch_views + W, W)],
        "radiance": _linear_init(next(keys), W, 3),
        "coarse_feat": [_linear_init(next(keys), W, W // 2) for _ in range(K)],
        "coarse": [_linear_init(next(keys), W // 2, 3) for _ in range(K)],
    }
    return params


def _dense(p, x):
    return x @ p["w"] + p["b"]


def _trunk(params: Params, pts_emb: jnp.ndarray, cfg: FieldConfig) -> jnp.ndarray:
    h = pts_emb
    for i, layer in enumerate(params["trunk"]):
        h = jax.nn.relu(_dense(layer, h))
        if i in cfg.skips:
            h = jnp.concatenate([pts_emb, h], axis=-1)
    return h


def _packed_half_heads(params: Params, h: jnp.ndarray, cfg: FieldConfig):
    """Fused evaluation of all W//2-wide feature heads.

    Packs albedo_feat / irradiance_feat (position branch) — the K coarse
    feature heads are packed separately because they read the view branch.
    Returns (albedo_raw(3), irradiance_raw(1)).
    """
    wf = jnp.concatenate(
        [params["albedo_feat"]["w"], params["irradiance_feat"]["w"]], axis=1)
    bf = jnp.concatenate(
        [params["albedo_feat"]["b"], params["irradiance_feat"]["b"]], axis=0)
    feats = jax.nn.relu(h @ wf + bf)
    half = params["albedo_feat"]["w"].shape[1]
    albedo = _dense(params["albedo"], feats[..., :half])
    irradiance = _dense(params["irradiance"], feats[..., half:])
    return albedo, irradiance


def _coarse_heads(params: Params, h2: jnp.ndarray) -> list[jnp.ndarray]:
    """Fused K coarse-radiance heads from the view-branch features."""
    if not params["coarse_feat"]:
        return []
    wf = jnp.concatenate([p["w"] for p in params["coarse_feat"]], axis=1)
    bf = jnp.concatenate([p["b"] for p in params["coarse_feat"]], axis=0)
    feats = jax.nn.relu(h2 @ wf + bf)
    half = params["coarse_feat"][0]["w"].shape[1]
    outs = []
    for i, p in enumerate(params["coarse"]):
        outs.append(_dense(p, feats[..., i * half:(i + 1) * half]))
    return outs


def apply_field_density(params: Params, pts_emb: jnp.ndarray,
                        cfg: FieldConfig,
                        freeze_radiance: bool = False) -> jnp.ndarray:
    """Density-only query (viewdirs=None path, ibl_nerf.py:110-111,175-176).

    Returns raw sigma (..., 1). Under freeze_radiance the trunk+sigma run
    inside no_grad in the reference — stop_gradient on the output.
    """
    h = _trunk(params, pts_emb, cfg)
    sigma = _dense(params["sigma"], h)
    if freeze_radiance:
        sigma = jax.lax.stop_gradient(sigma)
    return sigma


def apply_field(
    params: Params,
    pts_emb: jnp.ndarray,
    dirs_emb: jnp.ndarray,
    cfg: FieldConfig,
    freeze_radiance: bool = False,
    freeze_roughness: bool = False,
) -> jnp.ndarray:
    """Full field query -> raw (..., 9 + 3K).

    stop_gradient placement mirrors forward_freezed exactly
    (ibl_nerf.py:88-152): trunk+sigma no-grad; albedo/irradiance heads get
    grads to their own head params only; roughness optionally fully
    frozen; radiance + view branch + coarse heads no-grad.
    """
    h = _trunk(params, pts_emb, cfg)
    if freeze_radiance:
        h_heads = jax.lax.stop_gradient(h)
        sigma = jax.lax.stop_gradient(_dense(params["sigma"], h_heads))
    else:
        h_heads = h
        sigma = _dense(params["sigma"], h_heads)

    albedo, irradiance = _packed_half_heads(params, h_heads, cfg)
    roughness = _dense(params["roughness"], h_heads)
    if freeze_radiance and freeze_roughness:
        roughness = jax.lax.stop_gradient(roughness)

    # View branch.
    if cfg.color_independent_to_direction:
        h2 = h_heads
    else:
        feat = _dense(params["feature"], h_heads)
        h2 = jnp.concatenate([feat, dirs_emb], axis=-1)
        for layer in params["views"]:
            h2 = jax.nn.relu(_dense(layer, h2))

    radiance = _dense(params["radiance"], h2)
    coarse = _coarse_heads(params, h2)
    if freeze_radiance:
        radiance = jax.lax.stop_gradient(radiance)
        coarse = [jax.lax.stop_gradient(c) for c in coarse]

    return jnp.concatenate([sigma, albedo, roughness, irradiance, radiance] + coarse,
                           axis=-1)
