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
 - input is the raw (TILE, 8) packed [pts(3) | dirs(3) | 0-pad]; the
   positional encoding is computed IN-KERNEL as one (8→128) matmul plus
   a VPU sin: emb = where(id_col, t, sin(t + phase)), t = x @ E, where
   E places frequency 2^k on the right input row per output column and
   phase π/2 turns sin into cos. This removes the (N, 128) embedded
   activation XLA had to materialize in HBM (v1's "repack boundary"):
   HBM input traffic per point drops 16× (32 B vs 512 B);
 - all sub-128 contractions are expressed as 128-wide matmuls against
   zero-padded weights (skip concat becomes a split matmul — no concats
   inside the kernel);
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
TILE = 2048   # points per grid step (best of 512..4096 sweep on v5e)
NSPLIT = 2    # independent half-chains per tile: lets the scheduler
              # overlap one half's VPU (bias+relu+cast) with the other
              # half's MXU matmul (~5% measured on v5e)
IN_COLS = 8   # packed kernel input: [pts(3) | dirs(3) | pad(2)]


def _pad_to(x: np.ndarray | jnp.ndarray, rows: int, cols: int):
    r, c = x.shape
    return jnp.pad(x, ((0, rows - r), (0, cols - c)))


def _embedding_constants(cfg: FieldConfig):
    """Constants for the in-kernel positional encoding.

    Returns (E (IN_COLS, LANE), phase (1, LANE), id_mask (1, LANE)) such
    that with t = x_in @ E the reference embedding layout
    [x, sin(f0 x), cos(f0 x), sin(f1 x), ...] (positional_embedder.py:
    24-44; ops/embedding.py) is  where(id_mask, t, sin(t + phase)).
    Zero columns give sin(0) = 0 — identical to v1's zero padding.
    """
    from ibl_nerf_tpu.ops.embedding import frequency_bands

    E = np.zeros((IN_COLS, LANE), np.float32)
    phase = np.zeros((1, LANE), np.float32)
    id_mask = np.zeros((1, LANE), np.float32)

    def fill(row0, n_freqs, col0):
        col = col0
        for i in range(3):  # include_input
            E[row0 + i, col + i] = 1.0
            id_mask[0, col + i] = 1.0
        col += 3
        for f in frequency_bands(n_freqs):
            for trig in range(2):  # sin block then cos block
                for i in range(3):
                    E[row0 + i, col] = f
                    phase[0, col] = trig * np.pi / 2.0
                    col += 1
        return col

    col = fill(0, cfg.multires, 0)
    fill(3, cfg.multires_views, col)
    return jnp.asarray(E), jnp.asarray(phase), jnp.asarray(id_mask)


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

    packed = {k: v.astype(dtype) for k, v in packed.items()}

    # In-kernel embedding constants stay f32: sin(2^9 · x) needs more
    # mantissa than bf16 carries.
    E, phase, id_mask = _embedding_constants(cfg)
    packed["emb_E"] = E
    packed["emb_phase"] = phase
    packed["emb_id"] = id_mask
    return packed


_WEIGHT_ORDER = ["emb_E", "emb_phase", "emb_id",
                 "w0", "w1", "w2", "w3", "w4", "w5x", "w5h", "w6", "w7",
                 "tb", "wpf", "bpf", "wfeat", "bfeat", "wv_f", "wv_d", "bv",
                 "wcf", "bcf", "A", "B", "C", "D", "bias"]


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _field_kernel(x_ref, *refs, density_only: bool):
    w = dict(zip(_WEIGHT_ORDER, [r[...] for r in refs[:-1]]))
    out_ref = refs[-1]
    dt = w["w0"].dtype
    relu = lambda v: jnp.maximum(v, 0.0)
    tb = w["tb"]
    half = TILE // NSPLIT

    # NSPLIT independent dependency chains; the scheduler interleaves
    # one chain's VPU epilogue with the other's MXU matmul.
    xs = []
    for s in range(NSPLIT):
        # In-kernel positional encoding (f32): one (half, 8)x(8, 128)
        # matmul then a masked sin; identity columns pass t through,
        # zero columns give sin(0)=0 (the lane padding).
        t = jnp.dot(x_ref[s * half:(s + 1) * half], w["emb_E"],
                    preferred_element_type=jnp.float32)
        xs.append(jnp.where(w["emb_id"] > 0.0, t,
                            jnp.sin(t + w["emb_phase"])).astype(dt))

    hs = [relu(_mm(x, w["w0"]) + tb[0]).astype(dt) for x in xs]
    for i in (1, 2, 3, 4):
        hs = [relu(_mm(h, w[f"w{i}"]) + tb[i]).astype(dt) for h in hs]
    # skip: layer 5 reads [pts_emb | h]
    hs = [relu(_mm(x, w["w5x"]) + _mm(h, w["w5h"]) + tb[5]).astype(dt)
          for x, h in zip(xs, hs)]
    for i in (6, 7):
        hs = [relu(_mm(h, w[f"w{i}"]) + tb[i]).astype(dt) for h in hs]

    bias = w["bias"].astype(jnp.float32)
    for s in range(NSPLIT):
        h, x = hs[s], xs[s]
        if density_only:
            out = _mm(h, w["A"]) + bias
        else:
            pos_feat = relu(_mm(h, w["wpf"]) + w["bpf"]).astype(dt)
            feature = (_mm(h, w["wfeat"]) + w["bfeat"]).astype(dt)
            h2 = relu(_mm(feature, w["wv_f"]) + _mm(x, w["wv_d"])
                      + w["bv"]).astype(dt)
            view_feat = relu(_mm(h2, w["wcf"]) + w["bcf"]).astype(dt)
            out = (_mm(h, w["A"]) + _mm(pos_feat, w["B"]) + _mm(h2, w["C"])
                   + _mm(view_feat, w["D"]) + bias)
        out_ref[s * half:(s + 1) * half] = out.astype(out_ref.dtype)


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
        in_specs=[pl.BlockSpec((TILE, IN_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((TILE, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, LANE), jnp.float32),
        interpret=interpret,
    )(x_padded, *weights_list)


def _pack_inputs(pts, dirs):
    """(N, 8) f32 kernel input [pts | dirs | 0-pad]; N padded to TILE.

    The embedding itself happens in-kernel — this is the only
    XLA-materialized activation on the fused path (32 B/point)."""
    flat_pts = pts.reshape(-1, 3)
    if dirs is None:
        flat_dirs = jnp.zeros_like(flat_pts)
    else:
        flat_dirs = jnp.broadcast_to(
            dirs[..., None, :], pts.shape).reshape(-1, 3)
    x = jnp.concatenate(
        [flat_pts, flat_dirs,
         jnp.zeros((flat_pts.shape[0], IN_COLS - 6), flat_pts.dtype)],
        axis=-1)
    x = jnp.pad(x, ((0, (-x.shape[0]) % TILE), (0, 0)))
    return x.astype(jnp.float32)


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
    x = _pack_inputs(pts, dirs)
    n_pts = int(np.prod(pts.shape[:-1]))
    out = _fused_call(x, [packed[k] for k in _WEIGHT_ORDER],
                      density_only=False, interpret=interpret)
    out = out[:n_pts, :9 + 3 * cfg.coarse_radiance_number]
    return out.reshape(*pts.shape[:-1], out.shape[-1])


def fused_field_density(packed: dict, pts: jnp.ndarray, cfg: FieldConfig,
                        interpret: bool | None = None):
    """Density-only query via the fused kernel: (..., 3) -> (..., 1)."""
    interpret = _auto_interpret(interpret)
    x = _pack_inputs(pts, None)
    n_pts = int(np.prod(pts.shape[:-1]))
    out = _fused_call(x, [packed[k] for k in _WEIGHT_ORDER],
                      density_only=True, interpret=interpret)
    return out[:n_pts, 0:1].reshape(*pts.shape[:-1], 1)
