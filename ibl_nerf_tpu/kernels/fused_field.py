"""Fused IBL-NeRF field evaluation as a single Pallas TPU kernel.

Why: evaluated pointwise by XLA, each of the field's ~12 matmuls writes
its (N, 256) activation to HBM and the next reads it back — ~9 GB of
HBM traffic for one fine-pass ε-normal sweep. This kernel tiles the
point axis, holds the activation tile and ALL weights (~2.6 MB f32) in
VMEM, and runs embedding + trunk + every head in one pass: HBM traffic
drops to one (TILE, 128) read + one (TILE, 128) write per tile.

Math parity with models/field.apply_field (reference ibl_nerf.py
154-210) — verified by allclose tests. Used on the renderer's
no-gradient sweeps (ε-normal rays, reflected march), which carry ~80%
of the MLP FLOPs in the live config (SURVEY.md §3.1).

Design notes:
 - input is the 128-padded embedded features [pts_emb(63) | dirs_emb(27)
   | 0-pad]; all sub-128 contractions are expressed as 128-wide matmuls
   against zero-padded weights (skip concat becomes a split matmul —
   no concats inside the kernel);
 - every head lands in one (TILE, 128) output accumulated from four
   matmuls with column-placed packed weights:
   out = h@A + pos_feat@B + h2@C + view_feat@D + bias;
 - output columns [0..18) = [σ, albedo3, ρ, irr, rad3, coarse3K].
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ibl_nerf_tpu.models.field import FieldConfig

LANE = 128
TILE = 1024  # points per grid step


def _pad_to(x: np.ndarray | jnp.ndarray, rows: int, cols: int):
    r, c = x.shape
    return jnp.pad(x, ((0, rows - r), (0, cols - c)))


def pack_field_weights(params: dict, cfg: FieldConfig,
                       dtype=jnp.float32) -> dict[str, jnp.ndarray]:
    """Pre-pack field params into kernel-shaped padded matrices.

    Supports the default architecture: depth 8, width 256, skip at 4,
    multires 10/4 (63+27=90 embedded channels <= 128 lanes).
    """
    W = cfg.width
    K = cfg.coarse_radiance_number
    in_ch = cfg.input_ch
    assert cfg.skips == (4,), "packed kernel supports the default skip"
    assert in_ch + cfg.input_ch_views <= LANE
    half = W // 2
    n_out = 9 + 3 * K
    assert n_out <= LANE

    t = params["trunk"]
    packed: dict[str, Any] = {}
    # layer 0: (in_ch -> W), rows padded over the full 128-lane input
    packed["w0"] = _pad_to(t[0]["w"], LANE, W)
    # layers 1..4 standard (W -> W)
    for i in (1, 2, 3, 4):
        packed[f"w{i}"] = jnp.asarray(t[i]["w"])
    # layer 5 consumes [pts_emb(63) | h(W)]: split into input-part + h-part
    packed["w5x"] = _pad_to(t[5]["w"][:in_ch], LANE, W)
    packed["w5h"] = jnp.asarray(t[5]["w"][in_ch:])
    for i in (6, 7):
        packed[f"w{i}"] = jnp.asarray(t[i]["w"])
    packed["tb"] = jnp.stack([t[i]["b"] for i in range(8)])  # (8, W)

    # position-branch feature heads packed: [albedo_feat | irr_feat]
    packed["wpf"] = jnp.concatenate(
        [params["albedo_feat"]["w"], params["irradiance_feat"]["w"]], axis=1)
    packed["bpf"] = jnp.concatenate(
        [params["albedo_feat"]["b"], params["irradiance_feat"]["b"]])

    # view branch
    packed["wfeat"] = jnp.asarray(params["feature"]["w"])
    packed["bfeat"] = jnp.asarray(params["feature"]["b"])
    vw = params["views"][0]["w"]  # (W + in_ch_views, W)
    packed["wv_f"] = jnp.asarray(vw[:W])
    # dirs part comes from input lanes [in_ch, in_ch+27): place rows there
    wv_d = jnp.zeros((LANE, W), vw.dtype)
    wv_d = wv_d.at[in_ch:in_ch + cfg.input_ch_views].set(vw[W:])
    packed["wv_d"] = wv_d
    packed["bv"] = jnp.asarray(params["views"][0]["b"])

    # coarse feature heads packed: (W, K*half)
    if K:
        packed["wcf"] = jnp.concatenate(
            [p["w"] for p in params["coarse_feat"]], axis=1)
        packed["bcf"] = jnp.concatenate(
            [p["b"] for p in params["coarse_feat"]])
    else:
        packed["wcf"] = jnp.zeros((W, half))
        packed["bcf"] = jnp.zeros((half,))

    # Output assembly matrices (columns = raw channel layout).
    A = jnp.zeros((W, LANE))
    A = A.at[:, 0:1].set(params["sigma"]["w"])
    A = A.at[:, 4:5].set(params["roughness"]["w"])
    packed["A"] = A

    B = jnp.zeros((2 * half, LANE))
    B = B.at[:half, 1:4].set(params["albedo"]["w"])
    B = B.at[half:, 5:6].set(params["irradiance"]["w"])
    packed["B"] = B

    C = jnp.zeros((W, LANE))
    C = C.at[:, 6:9].set(params["radiance"]["w"])
    packed["C"] = C

    D = jnp.zeros((max(K, 1) * half, LANE))
    for k in range(K):
        D = D.at[k * half:(k + 1) * half, 9 + 3 * k:12 + 3 * k].set(
            params["coarse"][k]["w"])
    packed["D"] = D

    bias = jnp.zeros((LANE,))
    bias = bias.at[0].set(params["sigma"]["b"][0])
    bias = bias.at[1:4].set(params["albedo"]["b"])
    bias = bias.at[4].set(params["roughness"]["b"][0])
    bias = bias.at[5].set(params["irradiance"]["b"][0])
    bias = bias.at[6:9].set(params["radiance"]["b"])
    for k in range(K):
        bias = bias.at[9 + 3 * k:12 + 3 * k].set(params["coarse"][k]["b"])
    packed["bias"] = bias.reshape(1, LANE)

    # TPU VMEM wants >=2D operands: lift 1-D biases to (1, n).
    for k, v in packed.items():
        if v.ndim == 1:
            packed[k] = v.reshape(1, -1)

    return {k: v.astype(dtype) for k, v in packed.items()}


_WEIGHT_ORDER = ["w0", "w1", "w2", "w3", "w4", "w5x", "w5h", "w6", "w7",
                 "tb", "wpf", "bpf", "wfeat", "bfeat", "wv_f", "wv_d", "bv",
                 "wcf", "bcf", "A", "B", "C", "D", "bias"]


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _field_kernel(x_ref, *refs, density_only: bool):
    w = dict(zip(_WEIGHT_ORDER, [r[...] for r in refs[:-1]]))
    out_ref = refs[-1]
    x = x_ref[...]
    dt = x.dtype

    relu = lambda v: jnp.maximum(v, 0.0)

    tb = w["tb"]
    h = relu(_mm(x, w["w0"]) + tb[0]).astype(dt)
    for i in (1, 2, 3, 4):
        h = relu(_mm(h, w[f"w{i}"]) + tb[i]).astype(dt)
    # skip: layer 5 reads [pts_emb | h]
    h = relu(_mm(x, w["w5x"]) + _mm(h, w["w5h"]) + tb[5]).astype(dt)
    for i in (6, 7):
        h = relu(_mm(h, w[f"w{i}"]) + tb[i]).astype(dt)

    if density_only:
        out = _mm(h, w["A"]) + w["bias"].astype(jnp.float32)
        out_ref[...] = out.astype(out_ref.dtype)
        return

    pos_feat = relu(_mm(h, w["wpf"]) + w["bpf"]).astype(dt)
    feature = (_mm(h, w["wfeat"]) + w["bfeat"]).astype(dt)
    h2 = relu(_mm(feature, w["wv_f"]) + _mm(x, w["wv_d"]) + w["bv"]).astype(dt)
    view_feat = relu(_mm(h2, w["wcf"]) + w["bcf"]).astype(dt)

    out = (_mm(h, w["A"]) + _mm(pos_feat, w["B"]) + _mm(h2, w["C"])
           + _mm(view_feat, w["D"]) + w["bias"].astype(jnp.float32))
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("density_only", "interpret"))
def _fused_call(x_padded, weights_list, density_only: bool,
                interpret: bool = False):
    n = x_padded.shape[0]
    grid = (n // TILE,)

    w_specs = [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM)
               for w in weights_list]

    return pl.pallas_call(
        functools.partial(_field_kernel, density_only=density_only),
        grid=grid,
        in_specs=[pl.BlockSpec((TILE, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((TILE, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, LANE), jnp.float32),
        interpret=interpret,
    )(x_padded, *weights_list)


def _embed_and_pad(pts, dirs, cfg: FieldConfig, dtype):
    from ibl_nerf_tpu.ops.embedding import positional_encoding

    pe = positional_encoding(pts, cfg.multires)
    feats = [pe]
    used = cfg.input_ch
    if dirs is not None:
        de = positional_encoding(dirs, cfg.multires_views)
        de = jnp.broadcast_to(de[..., None, :],
                              (*pts.shape[:-1], de.shape[-1]))
        feats.append(de)
        used += cfg.input_ch_views
    x = jnp.concatenate(feats, axis=-1)
    x = x.reshape(-1, used)
    x = jnp.pad(x, ((0, (-x.shape[0]) % TILE), (0, LANE - used)))
    return x.astype(dtype)


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def fused_field_apply(packed: dict, pts: jnp.ndarray, dirs: jnp.ndarray,
                      cfg: FieldConfig, interpret: bool | None = None):
    """Full field query via the fused kernel.

    pts (..., S, 3), dirs (..., 3) -> raw (..., S, 9+3K). No gradient
    rule — use on stop_gradient paths only. interpret=None auto-selects
    interpreter mode off-TPU (CPU tests).
    """
    interpret = _auto_interpret(interpret)
    dtype = packed["w0"].dtype
    x = _embed_and_pad(pts, dirs, cfg, dtype)
    n_pts = int(np.prod(pts.shape[:-1]))
    out = _fused_call(x, [packed[k] for k in _WEIGHT_ORDER],
                      density_only=False, interpret=interpret)
    out = out[:n_pts, :9 + 3 * cfg.coarse_radiance_number]
    return out.reshape(*pts.shape[:-1], out.shape[-1])


def fused_field_density(packed: dict, pts: jnp.ndarray, cfg: FieldConfig,
                        interpret: bool | None = None):
    """Density-only query via the fused kernel: (..., 3) -> (..., 1)."""
    interpret = _auto_interpret(interpret)
    dtype = packed["w0"].dtype
    x = _embed_and_pad(pts, None, cfg, dtype)
    n_pts = int(np.prod(pts.shape[:-1]))
    out = _fused_call(x, [packed[k] for k in _WEIGHT_ORDER],
                      density_only=True, interpret=interpret)
    return out[:n_pts, 0:1].reshape(*pts.shape[:-1], 1)
