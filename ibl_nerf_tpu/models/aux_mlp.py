"""Auxiliary head MLPs.

Parity with /root/reference/src/networks/MLP.py:6-74:
 - PositionMLP: position-only trunk (skip at 4) + linear out; used for
   normal / albedo / roughness / irradiance override heads.
 - PositionDirectionMLP: trunk + feature layer + W//2-wide view branch
   of D//2 layers + linear out; used for depth / visibility heads.

Params are pure pytrees of arrays (optimizer-safe); static structure
(skip indices) is passed as function arguments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ibl_nerf_tpu.models.field import _dense, _linear_init

SKIPS = (4,)


def init_position_mlp(key, depth=8, width=256, input_ch=63, out_ch=3,
                      skips=SKIPS):
    keys = iter(jax.random.split(key, depth + 2))
    trunk = []
    for i in range(depth):
        fan_in = input_ch if i == 0 else (
            width + input_ch if (i - 1) in skips else width)
        trunk.append(_linear_init(next(keys), fan_in, width))
    return {"trunk": trunk, "out": _linear_init(next(keys), width, out_ch)}


def apply_position_mlp(params, pts_emb: jnp.ndarray, skips=SKIPS) -> jnp.ndarray:
    h = pts_emb
    for i, layer in enumerate(params["trunk"]):
        h = jax.nn.relu(_dense(layer, h))
        if i in skips:
            h = jnp.concatenate([pts_emb, h], axis=-1)
    return _dense(params["out"], h)


def init_position_direction_mlp(key, depth=8, width=256, input_ch=63,
                                input_ch_views=27, out_ch=1, skips=SKIPS):
    keys = iter(jax.random.split(key, 2 * depth + 4))
    trunk = []
    for i in range(depth):
        fan_in = input_ch if i == 0 else (
            width + input_ch if (i - 1) in skips else width)
        trunk.append(_linear_init(next(keys), fan_in, width))
    views = [_linear_init(next(keys), input_ch_views + width, width // 2)]
    views += [_linear_init(next(keys), width // 2, width // 2)
              for _ in range(depth // 2 - 1)]
    return {
        "trunk": trunk,
        "feature": _linear_init(next(keys), width, width),
        "views": views,
        "out": _linear_init(next(keys), width // 2, out_ch),
    }


def apply_position_direction_mlp(params, pts_emb: jnp.ndarray,
                                 dirs_emb: jnp.ndarray,
                                 skips=SKIPS) -> jnp.ndarray:
    h = pts_emb
    for i, layer in enumerate(params["trunk"]):
        h = jax.nn.relu(_dense(layer, h))
        if i in skips:
            h = jnp.concatenate([pts_emb, h], axis=-1)
    feat = _dense(params["feature"], h)
    h2 = jnp.concatenate([feat, dirs_emb], axis=-1)
    for layer in params["views"]:
        h2 = jax.nn.relu(_dense(layer, h2))
    return _dense(params["out"], h2)
