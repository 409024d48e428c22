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


def _mm(x, w, amp: bool = False):
    """Matmul; under `amp`, one bf16×bf16 MXU pass with f32 accumulation.

    amp ("automatic mixed precision") keeps every tensor that LIVES
    anywhere — params, activations, cotangents, dW — in f32, and rounds
    only the two matmul OPERANDS to bf16 with preferred_element_type=
    f32. On TPU this is the same input rounding XLA's DEFAULT matmul
    precision applies to f32 dots, so forward numerics match the f32
    mode; the win is that autodiff saves the bf16 operand casts as the
    residuals (halved fwd→bwd HBM traffic) while dW still accumulates
    and emerges in f32 (the bf16_grad mode's dW is rounded to bf16,
    which is where its @10k quality loss lives — RESULTS.md).
    """
    if amp:
        return jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return x @ w


def _mm_f32out(x, w, amp: bool = False):
    """Matmul whose output keeps the MXU's f32 accumulation.

    For bf16 operands this is free (the MXU accumulates in f32 anyway;
    we just skip the final round-to-bf16) and it is what makes the bf16
    compute modes match f32 quality: the raw head outputs — sigma
    especially, which drives alpha→weights→depth→ε-normal finite
    differences — leave the network at f32 precision instead of being
    quantized to 8 mantissa bits. For f32/f64 operands it is the plain
    dot (preferred_element_type would otherwise down/up-cast f64/f32).
    """
    if amp or x.dtype == jnp.bfloat16:
        return jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return x @ w


def _dense(p, x, amp: bool = False):
    return _mm(x, p["w"], amp) + p["b"]


def _trunk(params: Params, pts_emb: jnp.ndarray, cfg: FieldConfig,
           amp: bool = False) -> jnp.ndarray:
    # Keeping the skip as a real concat: the split-matmul form
    # (pts_emb @ W[:in] + h @ W[in:]) measured +0.3 ms on the f32
    # backward and nothing on bf16 — XLA fuses this concat fine.
    h = pts_emb
    for i, layer in enumerate(params["trunk"]):
        h = jax.nn.relu(_dense(layer, h, amp))
        if i in cfg.skips:
            h = jnp.concatenate([pts_emb, h], axis=-1)
    return h


def _pos_features(params: Params, h: jnp.ndarray,
                  amp: bool = False) -> jnp.ndarray:
    """Fused position-branch feature heads: (N, 2·half) =
    relu(h @ [albedo_feat | irradiance_feat])."""
    wf = jnp.concatenate(
        [params["albedo_feat"]["w"], params["irradiance_feat"]["w"]], axis=1)
    bf = jnp.concatenate(
        [params["albedo_feat"]["b"], params["irradiance_feat"]["b"]], axis=0)
    return jax.nn.relu(_mm(h, wf, amp) + bf)


def _coarse_features(params: Params, h2: jnp.ndarray,
                     amp: bool = False) -> jnp.ndarray | None:
    """Fused K coarse-radiance feature heads: (N, K·half)."""
    if not params["coarse_feat"]:
        return None
    wf = jnp.concatenate([p["w"] for p in params["coarse_feat"]], axis=1)
    bf = jnp.concatenate([p["b"] for p in params["coarse_feat"]], axis=0)
    return jax.nn.relu(_mm(h2, wf, amp) + bf)


def _zeros_like_cols(w: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.zeros((w.shape[0], n), w.dtype)


def _assembly_matrices(params: Params, cfg: FieldConfig,
                       freeze_radiance: bool, freeze_roughness: bool):
    """Column-packed output projections.

    The raw output layout [σ, albedo3, ρ, irrad, rad3, coarse3K] is
    produced as  h@A + pos_feat@B + h2@C + view_feat@D + bias  — four
    lane-wide matmuls instead of ~8 (N, 1..3)-column head matmuls plus
    a minor-dim concat, which dominate the full-head query cost on TPU
    (the MLP itself is MXU-bound; the tiny heads are layout-bound).

    Freeze semantics (reference forward_freezed, ibl_nerf.py:88-152)
    become column-wise stop_gradient on the packed weights: a stopped
    column with a stopped input reproduces "computed under no_grad"
    exactly — including h2: its matmul input must ALSO be stopped by
    the caller so no cotangent reaches the view branch.
    """
    stop = jax.lax.stop_gradient
    K = cfg.coarse_radiance_number
    n_out = 9 + 3 * K
    half = params["albedo_feat"]["w"].shape[1]

    s_sig = stop if freeze_radiance else (lambda x: x)
    s_rough = stop if (freeze_radiance and freeze_roughness) else (lambda x: x)
    s_rad = stop if freeze_radiance else (lambda x: x)

    w_sig = s_sig(params["sigma"]["w"])
    w_rough = s_rough(params["roughness"]["w"])
    A = jnp.concatenate(
        [w_sig, _zeros_like_cols(w_sig, 3), w_rough,
         _zeros_like_cols(w_sig, 4 + 3 * K)], axis=1)

    w_alb = params["albedo"]["w"]
    w_irr = params["irradiance"]["w"]
    B_top = jnp.concatenate(
        [_zeros_like_cols(w_alb, 1), w_alb,
         _zeros_like_cols(w_alb, 5 + 3 * K)], axis=1)
    B_bot = jnp.concatenate(
        [_zeros_like_cols(w_irr, 5), w_irr,
         _zeros_like_cols(w_irr, 3 + 3 * K)], axis=1)
    B = jnp.concatenate([B_top, B_bot], axis=0)

    w_rad = s_rad(params["radiance"]["w"])
    C = jnp.concatenate(
        [_zeros_like_cols(w_rad, 6), w_rad,
         _zeros_like_cols(w_rad, 3 * K)], axis=1)

    D = None
    if K:
        rows = []
        for k, p in enumerate(params["coarse"]):
            w_k = s_rad(p["w"])  # (half, 3)
            rows.append(jnp.concatenate(
                [_zeros_like_cols(w_k, 9 + 3 * k), w_k,
                 _zeros_like_cols(w_k, 3 * (K - k - 1))], axis=1))
        D = jnp.concatenate(rows, axis=0)  # (K*half, n_out)

    bias = jnp.concatenate(
        [s_sig(params["sigma"]["b"]), params["albedo"]["b"],
         s_rough(params["roughness"]["b"]), params["irradiance"]["b"],
         s_rad(params["radiance"]["b"])]
        + [s_rad(p["b"]) for p in params["coarse"]], axis=0)
    assert bias.shape[0] == n_out
    return A, B, C, D, bias


def apply_field_density(params: Params, pts_emb: jnp.ndarray,
                        cfg: FieldConfig,
                        freeze_radiance: bool = False,
                        amp: bool = False) -> jnp.ndarray:
    """Density-only query (viewdirs=None path, ibl_nerf.py:110-111,175-176).

    Returns raw sigma (..., 1). Under freeze_radiance the trunk+sigma run
    inside no_grad in the reference — stop_gradient on the output.
    """
    h = _trunk(params, pts_emb, cfg, amp)
    sigma = _mm_f32out(h, params["sigma"]["w"], amp) + params["sigma"]["b"]
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
    amp: bool = False,
) -> jnp.ndarray:
    """Full field query -> raw (..., 9 + 3K).

    stop_gradient placement mirrors forward_freezed exactly
    (ibl_nerf.py:88-152): trunk+sigma no-grad; albedo/irradiance heads get
    grads to their own head params only; roughness optionally fully
    frozen; radiance + view branch + coarse heads no-grad.

    TPU shape discipline: the output is assembled as four column-packed
    matmuls (see _assembly_matrices) and the skip/view concats are split
    matmuls — no (N, small) activations anywhere on the hot path.
    """
    stop = jax.lax.stop_gradient
    W = params["feature"]["w"].shape[0]
    h = _trunk(params, pts_emb, cfg, amp)
    h_heads = stop(h) if freeze_radiance else h

    pos_feat = _pos_features(params, h_heads, amp)

    # View branch; concat([feature, dirs_emb]) @ W -> split matmul.
    if cfg.color_independent_to_direction:
        h2 = h_heads
    else:
        feat = _dense(params["feature"], h_heads, amp)
        vw, vb = params["views"][0]["w"], params["views"][0]["b"]
        h2 = jax.nn.relu(_mm(feat, vw[:W], amp) + _mm(dirs_emb, vw[W:], amp)
                         + vb)
        for layer in params["views"][1:]:
            h2 = jax.nn.relu(_dense(layer, h2, amp))

    view_feat = _coarse_features(params, h2, amp)

    A, B, C, D, bias = _assembly_matrices(
        params, cfg, freeze_radiance, freeze_roughness)

    # Under freeze the radiance/coarse columns must be dead ends for the
    # view branch too: stop the matmul inputs so no cotangent reaches
    # feature/views/coarse_feat params (parity with no_grad).
    h2_in = stop(h2) if freeze_radiance else h2
    raw = (_mm_f32out(h_heads, A, amp) + _mm_f32out(pos_feat, B, amp)
           + _mm_f32out(h2_in, C, amp) + bias)
    if view_feat is not None:
        vf_in = stop(view_feat) if freeze_radiance else view_feat
        raw = raw + _mm_f32out(vf_in, D, amp)
    return raw
