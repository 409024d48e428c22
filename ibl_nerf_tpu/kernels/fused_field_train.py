"""Fused IBL-NeRF field fwd+bwd as Pallas TPU kernels (custom_vjp).

Why: the XLA gradient path runs at ~61-63% of the measured 97 TF/s
dependent-chain MXU ceiling while the pure no-grad density chain hits
91% (RESULTS.md phase table) — the gap is activation round-trips and
the dx-chain/dW scheduling of the backward. This module fuses the full
field query's forward AND backward:

  forward : one kernel per tile computes embedding (in-kernel, as in
            kernels/fused_field.py) + trunk + heads, emitting the raw
            output (f32, the MXU's accumulation — same semantics as
            models/field._mm_f32out) plus 11 residual activations
            (bf16) for the backward;
  backward: one kernel per tile recomputes the embedding, replays the
            reverse chain entirely in VMEM (relu masks from the saved
            activations, bf16 MXU passes, f32 accumulation), and
            accumulates ALL weight/bias gradients in f32 VMEM blocks
            that persist across the grid (constant index maps) — dW
            leaves the kernel in f32, never rounded to bf16.

Gradient semantics: positions/directions carry NO gradient (zeros
returned) — correct for this framework's training step, where sample
positions are stop-gradient-rooted (z importance samples are stopped,
rays are data; renderer.py render_rays). The renderer only routes
query_full through this op on non-freeze phases (under freeze the
trunk has no cotangent and XLA's cheap head-only backward is used).

Capability parity: apply_field (reference ibl_nerf.py:154-210) — the
same math as kernels/fused_field.py plus its exact transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ibl_nerf_tpu.models.field import FieldConfig
from ibl_nerf_tpu.kernels.fused_field import (
    LANE, IN_COLS, _WEIGHT_ORDER, _pack_inputs, _auto_interpret)

import os

# fwd tile (12 output buffers double-buffered in VMEM) / bwd tile
# (residual inputs + f32 dW accumulators). At libtpu's DEFAULT 16 MB
# scoped-VMEM cap, TILE_B=512 OOMs in-step (18.2 MB stack), so 256 is
# the stock-safe default — which round 4 measured as perf parity with
# XLA. Round 5: raising the cap to 24 MB (utils/tpu.py, wired into the
# trainer and bench when use_pallas_train is on) fits the 512 tile and
# wins ~12% whole-step in both normal modes. Env overrides
# (IBL_PTRAIN_TILE_{F,B}) always take precedence for tile sweeps.


def _tile_from_env(var: str, default: int) -> int:
    """Validated tile override: positive, 8-aligned (sublane), else a
    clear error naming the env var instead of an opaque Mosaic one."""
    raw = os.environ.get(var)
    if raw is None:
        return default
    try:
        val = int(raw)
    except ValueError as e:
        raise ValueError(
            f"{var}={raw!r} is not an integer; expected a positive "
            f"multiple of 8 (default {default})") from e
    if val <= 0 or val % 8 != 0:
        raise ValueError(
            f"{var}={val} must be a positive multiple of 8 "
            f"(TPU sublane alignment; default {default})")
    return val


TILE_F = _tile_from_env("IBL_PTRAIN_TILE_F", 512)
TILE_B = _tile_from_env("IBL_PTRAIN_TILE_B", 256)

_RES_ORDER = ["h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7",
              "pf", "ft", "hv"]

# dW outputs, in order; shapes mirror the packed-weight entries.
_DW_ORDER = ["w0", "w1", "w2", "w3", "w4", "w5x", "w5h", "w6", "w7",
             "tb", "wpf", "bpf", "wfeat", "bfeat", "wv_f", "wv_d", "bv",
             "wcf", "bcf", "A", "B", "C", "D", "bias"]


def _mmf(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a^T @ b contracting the point (row) axis: (T,m)x(T,n) -> (m,n) f32."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_bt(a, b):
    """a @ b^T contracting the feature axis: (T,m)x(n,m) -> (T,n) f32."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _embed(x_in, w):
    t = jnp.dot(x_in, w["emb_E"], preferred_element_type=jnp.float32)
    return jnp.where(w["emb_id"] > 0.0, t, jnp.sin(t + w["emb_phase"]))


def _fwd_kernel(x_ref, *refs):
    w = dict(zip(_WEIGHT_ORDER, [r[...] for r in refs[:len(_WEIGHT_ORDER)]]))
    outs = refs[len(_WEIGHT_ORDER):]
    raw_ref = outs[0]
    res_refs = dict(zip(_RES_ORDER, outs[1:]))
    dt = w["w0"].dtype
    relu = lambda v: jnp.maximum(v, 0.0)
    tb = w["tb"]

    x = _embed(x_ref[...], w).astype(dt)
    h = relu(_mmf(x, w["w0"]) + tb[0]).astype(dt)
    res_refs["h0"][...] = h
    for i in (1, 2, 3, 4):
        h = relu(_mmf(h, w[f"w{i}"]) + tb[i]).astype(dt)
        res_refs[f"h{i}"][...] = h
    h = relu(_mmf(x, w["w5x"]) + _mmf(h, w["w5h"]) + tb[5]).astype(dt)
    res_refs["h5"][...] = h
    for i in (6, 7):
        h = relu(_mmf(h, w[f"w{i}"]) + tb[i]).astype(dt)
        res_refs[f"h{i}"][...] = h

    pf = relu(_mmf(h, w["wpf"]) + w["bpf"]).astype(dt)
    res_refs["pf"][...] = pf
    ft = (_mmf(h, w["wfeat"]) + w["bfeat"]).astype(dt)
    res_refs["ft"][...] = ft
    hv = relu(_mmf(ft, w["wv_f"]) + _mmf(x, w["wv_d"]) + w["bv"]).astype(dt)
    res_refs["hv"][...] = hv
    vf = relu(_mmf(hv, w["wcf"]) + w["bcf"]).astype(dt)

    raw_ref[...] = (_mmf(h, w["A"]) + _mmf(pf, w["B"]) + _mmf(hv, w["C"])
                    + _mmf(vf, w["D"]) + w["bias"].astype(jnp.float32))


def _bwd_kernel(x_ref, g_ref, *refs):
    n_res = len(_RES_ORDER)
    res = dict(zip(_RES_ORDER,
                   [r[...] for r in refs[:n_res]]))
    w = dict(zip(_WEIGHT_ORDER,
                 [r[...] for r in refs[n_res:n_res + len(_WEIGHT_ORDER)]]))
    dw = dict(zip(_DW_ORDER, refs[n_res + len(_WEIGHT_ORDER):]))
    dt = w["w0"].dtype

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for r in dw.values():
            r[...] = jnp.zeros_like(r)

    def msk(val, d):
        """relu backward: pass d where the saved activation is > 0.
        Comparison in f32 — Mosaic/v5e has no bf16 vector cmpf."""
        return jnp.where(val.astype(jnp.float32) > 0.0, d, 0.0).astype(dt)

    x = _embed(x_ref[...], w).astype(dt)
    g = g_ref[...]                      # (T, LANE) f32
    g16 = g.astype(dt)
    h7, pf, ft, hv = res["h7"], res["pf"], res["ft"], res["hv"]

    # ---- heads / assembly -------------------------------------------
    vf = jnp.maximum(_mmf(hv, w["wcf"]) + w["bcf"], 0.0).astype(dt)

    dw["A"][...] += _dot_t(h7, g16)
    dw["B"][...] += _dot_t(pf, g16)
    dw["C"][...] += _dot_t(hv, g16)
    dw["D"][...] += _dot_t(vf, g16)
    dw["bias"][...] += jnp.sum(g, axis=0, keepdims=True)

    dvf = msk(vf, _dot_bt(g16, w["D"]))
    dw["wcf"][...] += _dot_t(hv, dvf)
    dw["bcf"][...] += jnp.sum(dvf.astype(jnp.float32), axis=0, keepdims=True)

    dhv = msk(hv, _dot_bt(g16, w["C"]) + _dot_bt(dvf, w["wcf"]))
    dw["wv_f"][...] += _dot_t(ft, dhv)
    dw["wv_d"][...] += _dot_t(x, dhv)
    dw["bv"][...] += jnp.sum(dhv.astype(jnp.float32), axis=0, keepdims=True)

    dft = _dot_bt(dhv, w["wv_f"]).astype(dt)   # ft has no relu
    dw["wfeat"][...] += _dot_t(h7, dft)
    dw["bfeat"][...] += jnp.sum(dft.astype(jnp.float32), axis=0,
                                keepdims=True)

    dpf = msk(pf, _dot_bt(g16, w["B"]))
    dw["wpf"][...] += _dot_t(h7, dpf)
    dw["bpf"][...] += jnp.sum(dpf.astype(jnp.float32), axis=0, keepdims=True)

    # ---- trunk ------------------------------------------------------
    dh = (_dot_bt(g16, w["A"]) + _dot_bt(dft, w["wfeat"])
          + _dot_bt(dpf, w["wpf"]))

    d7 = msk(h7, dh)
    dw["w7"][...] += _dot_t(res["h6"], d7)
    dtb = dw["tb"]
    dtb[7, :] += jnp.sum(d7.astype(jnp.float32), axis=0)
    d6 = msk(res["h6"], _dot_bt(d7, w["w7"]))
    dw["w6"][...] += _dot_t(res["h5"], d6)
    dtb[6, :] += jnp.sum(d6.astype(jnp.float32), axis=0)
    d5 = msk(res["h5"], _dot_bt(d6, w["w6"]))
    dw["w5h"][...] += _dot_t(res["h4"], d5)
    dw["w5x"][...] += _dot_t(x, d5)
    dtb[5, :] += jnp.sum(d5.astype(jnp.float32), axis=0)
    d = msk(res["h4"], _dot_bt(d5, w["w5h"]))
    for i in (4, 3, 2, 1):
        dw[f"w{i}"][...] += _dot_t(res[f"h{i - 1}"], d)
        dtb[i, :] += jnp.sum(d.astype(jnp.float32), axis=0)
        d = msk(res[f"h{i - 1}"], _dot_bt(d, w[f"w{i}"]))
    dw["w0"][...] += _dot_t(x, d)
    dtb[0, :] += jnp.sum(d.astype(jnp.float32), axis=0)


def _const_spec(arr):
    nd = arr.ndim
    return pl.BlockSpec(arr.shape, lambda i, nd=nd: (0,) * nd,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(x_padded, weights_list, interpret: bool = False):
    n = x_padded.shape[0]
    dt = weights_list[_WEIGHT_ORDER.index("w0")].dtype
    W = weights_list[_WEIGHT_ORDER.index("w1")].shape[0]
    grid = (n // TILE_F,)
    row = lambda i: (i, 0)
    out_shapes = ([jax.ShapeDtypeStruct((n, LANE), jnp.float32)]
                  + [jax.ShapeDtypeStruct((n, W), dt) for _ in _RES_ORDER])
    out_specs = ([pl.BlockSpec((TILE_F, LANE), row, memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec((TILE_F, W), row, memory_space=pltpu.VMEM)
                    for _ in _RES_ORDER])
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((TILE_F, IN_COLS), row,
                               memory_space=pltpu.VMEM)]
        + [_const_spec(w) for w in weights_list],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x_padded, *weights_list)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(x_padded, g_padded, res_list, weights_list,
              interpret: bool = False):
    n = x_padded.shape[0]
    grid = (n // TILE_B,)
    row = lambda i: (i, 0)
    W = weights_list[_WEIGHT_ORDER.index("w1")].shape[0]
    wmap = dict(zip(_WEIGHT_ORDER, weights_list))
    dw_shapes = [jax.ShapeDtypeStruct(wmap[k].shape, jnp.float32)
                 for k in _DW_ORDER]
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=(
            [pl.BlockSpec((TILE_B, IN_COLS), row, memory_space=pltpu.VMEM),
             pl.BlockSpec((TILE_B, LANE), row, memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((TILE_B, W), row, memory_space=pltpu.VMEM)
               for _ in _RES_ORDER]
            + [_const_spec(w) for w in weights_list]),
        out_specs=[_const_spec(s) for s in dw_shapes],
        out_shape=dw_shapes,
        interpret=interpret,
    )(x_padded, g_padded, *res_list, *weights_list)


def _to_bf16(packed32):
    """Kernel-side weights: bf16 except the f32 embedding constants."""
    return {k: (v if k.startswith("emb_") else v.astype(jnp.bfloat16))
            for k, v in packed32.items()}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_field_train(packed32, x_packed, interpret=False):
    """Full field query, fwd+bwd fused: (packed f32, (N, 8)) -> (N, 128).

    packed32: pack_field_weights(params, cfg, dtype=f32) WITHOUT
    stop_gradient — gradients flow back through the packing (slices).
    x_packed: _pack_inputs(pts, dirs), N a multiple of TILE_F/TILE_B.
    Positions/dirs receive ZERO gradient (see module docstring).
    """
    w16 = _to_bf16(packed32)
    outs = _fwd_call(x_packed, [w16[k] for k in _WEIGHT_ORDER],
                     interpret=interpret)
    return outs[0]


def _train_fwd(packed32, x_packed, interpret=False):
    w16 = _to_bf16(packed32)
    outs = _fwd_call(x_packed, [w16[k] for k in _WEIGHT_ORDER],
                     interpret=interpret)
    raw, res = outs[0], outs[1:]
    return raw, (packed32, x_packed, tuple(res))


def _train_bwd(interpret, saved, g):
    packed32, x_packed, res = saved
    w16 = _to_bf16(packed32)
    dws = _bwd_call(x_packed, g.astype(jnp.float32), list(res),
                    [w16[k] for k in _WEIGHT_ORDER], interpret=interpret)
    d = dict(zip(_DW_ORDER, dws))
    d_packed = {}
    for k, v in packed32.items():
        if k in d:
            d_packed[k] = d[k].astype(v.dtype)
        else:  # emb_E / emb_phase / emb_id: constants
            d_packed[k] = jnp.zeros_like(v)
    return d_packed, jnp.zeros_like(x_packed)


fused_field_train.defvjp(_train_fwd, _train_bwd)


def fused_field_apply_train(packed32: dict, pts: jnp.ndarray,
                            dirs: jnp.ndarray, cfg: FieldConfig,
                            interpret: bool | None = None):
    """apply_field-shaped wrapper: pts (..., S, 3), dirs (..., 3) ->
    raw (..., S, 9+3K) f32, differentiable wrt packed32."""
    interpret = _auto_interpret(interpret)
    x = _pack_inputs(pts, dirs)
    pad = (-x.shape[0]) % np.lcm(TILE_F, TILE_B)
    if x.shape[0] % np.lcm(TILE_F, TILE_B):
        x = jnp.pad(x, ((0, pad), (0, 0)))
    n_pts = int(np.prod(pts.shape[:-1]))
    out = fused_field_train(packed32, x, interpret)
    out = out[:n_pts, :9 + 3 * cfg.coarse_radiance_number]
    return out.reshape(*pts.shape[:-1], out.shape[-1])
