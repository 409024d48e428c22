"""The volumetric renderer: hierarchical sampling, intrinsic
compositing, and split-sum image-based-lighting shading.

Capability parity with the reference hot loop
(/root/reference/src/nerf_models/ibl_nerf_renderer.py:26-756):
`render_rays` here covers render_rays + raw2outputs + raw2outputs_simple
+ raw2outputs_depth in one jittable function; `render_image` covers
render_decomp's full-image path.

TPU-first design (not a torch translation):
 - everything is one traced function with static shapes — no ray
   chunking inside a batch (the reference serializes 1024-ray chunks and
   65536-point net chunks to bound GPU memory; on TPU the whole
   512-ray x 192-sample batch is a single fused program);
 - gradient-semantics parity: every torch `.detach_()`/`no_grad` site
   maps to an explicit `stop_gradient` (weights detached for intrinsic
   maps but NOT radiance; x_surface detached; reflected march detached
   by default; fine z_samples detached);
 - boolean-mask edit/insert overrides become `jnp.where` selects;
 - the four ε-offset normal rays go through the field as one 4B-batched
   density query; reflected rays as one more — each a single MXU sweep.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ibl_nerf_tpu.models.field import (
    apply_field,
    apply_field_density,
)
from ibl_nerf_tpu.models.aux_mlp import (
    apply_position_mlp,
    apply_position_direction_mlp,
)
from ibl_nerf_tpu.ops.compositing import (
    alpha_from_sigma,
    dists_from_z_vals,
    weights_from_alpha,
    accumulate,
    composite_depth_disp_acc,
)
from ibl_nerf_tpu.ops.embedding import positional_encoding
from ibl_nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals
from ibl_nerf_tpu.ops.texture import grid_sample_2d, mip_interp
from ibl_nerf_tpu.ops.shading import fresnel_schlick_roughness, reflect
from ibl_nerf_tpu.ops.color import rgb_to_srgb, tonemap_reinhard
from ibl_nerf_tpu.ops.rays import get_rays_full_image
from ibl_nerf_tpu.render.config import RenderConfig
from ibl_nerf_tpu.render import normals as normals_mod

stop = jax.lax.stop_gradient


# ---------------------------------------------------------------------------
# Field query helpers
# ---------------------------------------------------------------------------

def _make_queries(field_params, rcfg: RenderConfig):
    """Closures querying the field; embedding fused into the trace.

    Returns (query_full, query_sigma, query_full_ng, query_sigma_ng).
    The `_ng` (no-gradient) variants may route through the Pallas
    fused-field kernel (rcfg.use_pallas) — legal only on stop_gradient
    paths (the kernel has no vjp rule).

    compute_dtype:
      "float32"  — everything f32;
      "bfloat16" — all MLP matmuls on the bf16 MXU path (f32 raw out);
      "mixed"    — gradient path f32, no-grad sweeps (ε-normals +
                   reflected march, ~60% of FLOPs) bf16: throughput
                   without touching gradient precision;
      "bf16_grad" — the inverse split: gradient path bf16 (fast
                   fwd+bwd), no-grad sweeps f32 (exact ε-normal depth
                   differences + reflected radiance);
      "amp"      — f32 everywhere EXCEPT the matmul operands, which are
                   rounded to bf16 with f32 accumulation (one MXU pass,
                   preferred_element_type=f32). Params, activations,
                   cotangents and dW all stay f32 — on TPU the forward
                   matmul numerics equal f32-at-DEFAULT-precision, so
                   quality tracks f32 while fwd→bwd activation traffic
                   is halved (the residuals are the bf16 operand casts).
    """
    fcfg = rcfg.field
    amp = rcfg.compute_dtype == "amp"
    if rcfg.compute_dtype == "float64":
        # full-f64 queries (requires jax_enable_x64): the strict parity
        # mode used by scripts/kitchen_gate.py stage A, where rounding
        # chaos at high PE frequencies would otherwise mask real errors.
        dt_grad = dt_ng = jnp.float64
    else:
        dt_grad = (jnp.bfloat16
                   if rcfg.compute_dtype in ("bfloat16", "bf16_grad")
                   else jnp.float32)
        dt_ng = (jnp.bfloat16 if rcfg.compute_dtype in ("bfloat16", "mixed")
                 else jnp.float32)

    query_full, query_sigma = _make_query_pair(field_params, rcfg, dt_grad,
                                               amp=amp)

    if (rcfg.use_pallas_train and dt_grad == jnp.bfloat16
            and not rcfg.freeze_radiance
            and fcfg.depth == 8 and fcfg.skips == (4,)
            and not fcfg.color_independent_to_direction):
        # Fused fwd+bwd custom-vjp kernel on the gradient-path full
        # query (kernels/fused_field_train.py). Gradients flow through
        # the f32 packing; sample positions are stop-rooted in training
        # (the kernel returns zero cotangent for them). Under freeze
        # phases the trunk carries no cotangent and the XLA head-only
        # backward is cheap — kernel not used there.
        from ibl_nerf_tpu.kernels.fused_field import pack_field_weights
        from ibl_nerf_tpu.kernels.fused_field_train import (
            fused_field_apply_train)

        packed32 = pack_field_weights(field_params, fcfg,
                                      dtype=jnp.float32)

        def query_full(pts, viewdirs):  # noqa: F811
            return fused_field_apply_train(packed32, pts, viewdirs, fcfg)

    if rcfg.use_pallas:
        from ibl_nerf_tpu.kernels.fused_field import (
            fused_field_apply,
            fused_field_density,
            pack_field_weights,
        )

        packed = pack_field_weights(jax.lax.stop_gradient(field_params),
                                    fcfg, dtype=dt_ng)

        def query_full_ng(pts, viewdirs):
            return fused_field_apply(packed, pts, viewdirs, fcfg)

        def query_sigma_ng(pts):
            return fused_field_density(packed, pts, fcfg)
    elif dt_ng != dt_grad:
        query_full_ng, query_sigma_ng = _make_query_pair(
            jax.lax.stop_gradient(field_params), rcfg, dt_ng)
    elif amp:
        # amp keeps the no-grad sweeps at plain f32 (like bf16_grad):
        # the ε-normal finite differences divide by a small ε, so bf16
        # operand rounding there moves the normal TARGETS (and through
        # them the gradients) far more than it moves the shaded output;
        # sweep dtype is speed-neutral on v5e anyway (RESULTS.md).
        query_full_ng, query_sigma_ng = _make_query_pair(
            jax.lax.stop_gradient(field_params), rcfg, dt_ng)
    else:
        query_full_ng, query_sigma_ng = query_full, query_sigma

    return query_full, query_sigma, query_full_ng, query_sigma_ng


def _make_query_pair(field_params, rcfg, dt, amp: bool = False):
    """(query_full, query_sigma) closures at compute dtype `dt`."""
    fcfg = rcfg.field
    params_c = (jax.tree.map(lambda x: x.astype(dt), field_params)
                if dt != jnp.float32 else field_params)
    # raw output dtype: bf16 compute returns f32 raws; f64 stays f64.
    out_dt = jnp.float32 if dt == jnp.bfloat16 else dt

    def query_full(pts, viewdirs):
        # pts (B, S, 3); viewdirs (B, 3) broadcast over samples.
        pe = positional_encoding(pts, fcfg.multires).astype(dt)
        de = positional_encoding(viewdirs, fcfg.multires_views).astype(dt)
        de = jnp.broadcast_to(de[..., None, :],
                              (*pts.shape[:-1], de.shape[-1]))
        raw = apply_field(params_c, pe, de, fcfg,
                          freeze_radiance=rcfg.freeze_radiance,
                          freeze_roughness=rcfg.freeze_roughness,
                          amp=amp)
        return raw.astype(out_dt)

    def query_sigma(pts):
        pe = positional_encoding(pts, fcfg.multires).astype(dt)
        raw = apply_field_density(params_c, pe, fcfg,
                                  freeze_radiance=rcfg.freeze_radiance,
                                  amp=amp)
        return raw.astype(out_dt)

    return query_full, query_sigma


def _radiance_f(rcfg: RenderConfig):
    if rcfg.use_radiance_linear:
        return lambda x: jax.nn.relu(x)
    return jax.nn.sigmoid


def _raw_sigma_with_noise(key, raw_sigma, rcfg: RenderConfig):
    if rcfg.raw_noise_std > 0.0:
        noise = jax.random.normal(key, raw_sigma.shape) * rcfg.raw_noise_std
        return raw_sigma + noise
    return raw_sigma


# ---------------------------------------------------------------------------
# Sub-renderers (parity: raw2outputs_simple / raw2outputs_depth)
# ---------------------------------------------------------------------------

def _composite_radiance_stack(raw, z_vals, rays_d, rcfg: RenderConfig,
                              detach: bool = False):
    """radiance + K coarse-radiance maps from a raw field output.

    Parity: raw2outputs_simple (ibl_nerf_renderer.py:38-68).
    Returns (radiance_map (B,3), [coarse maps (B,3)]).
    """
    rf = _radiance_f(rcfg)
    dists = dists_from_z_vals(z_vals, rays_d)
    alpha = alpha_from_sigma(raw[..., 0], dists)
    weights = weights_from_alpha(alpha)
    if detach:
        weights = stop(weights)

    radiance_map = accumulate(weights, rf(raw[..., 6:9]))
    coarse_maps = []
    for k in range(rcfg.field.coarse_radiance_number):
        c = rf(raw[..., 9 + 3 * k: 12 + 3 * k])
        coarse_maps.append(accumulate(weights, c))
    return radiance_map, coarse_maps


def _render_depth_only(key, query_sigma, rays_o, rays_d, z_vals,
                       rcfg: RenderConfig):
    """Depth/visibility-only pass (parity: raw2outputs_depth,
    ibl_nerf_renderer.py:121-150)."""
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    raw = query_sigma(pts)[..., 0]
    dists = dists_from_z_vals(z_vals, rays_d)
    raw = _raw_sigma_with_noise(key, raw, rcfg)
    alpha = alpha_from_sigma(raw, dists)
    from ibl_nerf_tpu.ops.compositing import transmittance_and_weights

    weights, visibility = transmittance_and_weights(alpha)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    return {"depth_map": depth_map, "weights": weights,
            "visibility": visibility}


# ---------------------------------------------------------------------------
# Edit / insert mask machinery
# ---------------------------------------------------------------------------

def _decode_object_masks(mask_img: jnp.ndarray, num_objects: int):
    """Object masks from gray levels ~10(i+1)/255 (parity:
    ibl_nerf_renderer.py:220-238). mask_img: (B,) channel-0 values."""
    masks = []
    for i in range(num_objects):
        lo = 9.0 * (i + 1) / 255.0
        hi = 11.0 * (i + 1) / 255.0
        masks.append(jnp.logical_and(mask_img < hi, mask_img > lo))
    mask_all = mask_img > 0
    return masks, mask_all


def _where(mask, new, old):
    """Masked override; mask (B,), values (B,) or (B,C)."""
    if old.ndim > mask.ndim:
        mask = mask[..., None]
    return jnp.where(mask, new, old)


# ---------------------------------------------------------------------------
# The main per-ray renderer
# ---------------------------------------------------------------------------

def _raw2outputs(key, variables, consts, rays_o, rays_d, z_vals,
                 z_vals_constant, near, far, rcfg: RenderConfig,
                 gt_values=None):
    """Full compositing + shading for one sample set.

    Parity: raw2outputs (ibl_nerf_renderer.py:153-527).
    """
    fcfg = rcfg.field
    rf = _radiance_f(rcfg)
    (query_full, query_sigma,
     query_full_ng, query_sigma_ng) = _make_queries(
        variables["coarse_or_fine"], rcfg)
    k_noise, k_noise_refl = jax.random.split(key)

    gt = gt_values or {}
    edit = rcfg.edit

    # --- primary march -----------------------------------------------------
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    raw = query_full(pts, rays_d)

    dists = dists_from_z_vals(z_vals, rays_d)
    sigma_raw = _raw_sigma_with_noise(k_noise, raw[..., 0], rcfg)
    alpha = alpha_from_sigma(sigma_raw, dists)
    weights = weights_from_alpha(alpha)
    weights_det = stop(weights)

    depth_map, disp_map, acc_map = composite_depth_disp_acc(weights, z_vals)

    # --- edit/insert masks -------------------------------------------------
    masks, mask_all = [], None
    if edit is not None:
        mask_key = ("edit_intrinsic_mask" if edit.mode == "edit"
                    else "object_insert_mask")
        masks, mask_all = _decode_object_masks(gt[mask_key][:, 0],
                                               edit.num_objects)

    # --- target depth ------------------------------------------------------
    target_depth_map = depth_map
    if rcfg.depth_map_from_ground_truth:
        target_depth_map = gt["depth"][..., 0]
    if edit is not None and edit.mode == "edit" and edit.edit_depth:
        target_depth_map = _where(mask_all, gt["edit_depth"][..., 0],
                                  target_depth_map)
    if edit is not None and edit.mode == "insert":
        target_depth_map = _where(mask_all, gt["object_insert_depth"][..., 0],
                                  target_depth_map)

    # surface point (detached — ibl_nerf_renderer.py:262-263)
    x_surface = stop(rays_o + rays_d * target_depth_map[..., None])

    # --- inferred normal head ---------------------------------------------
    inferred_normal_map = None
    if rcfg.infer_normal:
        nm = variables["normal_mlp"]
        if rcfg.infer_normal_at_surface:
            pe = positional_encoding(x_surface, fcfg.multires)
            out = apply_position_mlp(nm, pe)
            inferred_normal_map = 2.0 * jax.nn.sigmoid(out) - 1.0
        else:
            pe = positional_encoding(pts, fcfg.multires)
            out = 2.0 * jax.nn.sigmoid(apply_position_mlp(nm, pe)) - 1.0
            inferred_normal_map = accumulate(weights_det, out)

    # --- intrinsic maps (detached weights — :281-306) ----------------------
    albedo = jax.nn.sigmoid(raw[..., 1:4])
    albedo_map = accumulate(weights_det, albedo)

    roughness = jax.nn.sigmoid(raw[..., 4])
    roughness_map = accumulate(weights_det, roughness)

    irradiance = rf(raw[..., 5])
    irradiance_map = accumulate(weights_det, irradiance)

    # optional separate aux-MLP overrides (:290-303)
    if rcfg.infer_albedo_separate:
        pe = positional_encoding(pts, fcfg.multires)
        a = jax.nn.sigmoid(apply_position_mlp(variables["albedo_mlp"], pe)[..., 0:3])
        albedo_map = accumulate(weights_det, a)
    if rcfg.infer_roughness_separate:
        pe = positional_encoding(pts, fcfg.multires)
        r = jax.nn.sigmoid(apply_position_mlp(variables["roughness_mlp"], pe)[..., 0])
        roughness_map = accumulate(weights_det, r)
    if rcfg.infer_irradiance_separate:
        pe = positional_encoding(pts, fcfg.multires)
        ir = jax.nn.sigmoid(apply_position_mlp(variables["irradiance_mlp"], pe)[..., 0])
        irradiance_map = accumulate(weights_det, ir)

    # radiance composited with NON-detached weights (:305-306)
    radiance_map = accumulate(weights, rf(raw[..., 6:9]))

    coarse_radiance_maps = []
    for k in range(fcfg.coarse_radiance_number):
        c = rf(raw[..., 9 + 3 * k: 12 + 3 * k])
        coarse_radiance_maps.append(accumulate(weights_det, c))

    # --- gt substitutions (:320-330) ---------------------------------------
    target_albedo_map = (gt["albedo"] if rcfg.calculate_albedo_from_gt
                         else albedo_map)
    target_roughness_map = (gt["roughness"][..., 0]
                            if rcfg.calculate_roughness_from_gt
                            else roughness_map)
    target_irradiance_map = (gt["irradiance"]
                             if rcfg.calculate_irradiance_from_gt
                             else irradiance_map[..., None])

    # --- split-sum shading --------------------------------------------------
    target_normal_map = None
    approximated_radiance_map = None
    specular_map = diffuse_map = None
    n_dot_v = None
    reflected_radiance_map = None
    prefiltered_reflected_map = None
    reflected_coarse_maps = []

    if rcfg.approximate_radiance:
        target_normal_map = _estimate_normal(
            query_sigma, query_sigma_ng, rays_o, rays_d, z_vals, pts,
            x_surface, weights_det, inferred_normal_map, gt, rcfg)

        # edit/insert overrides of intrinsics before shading (:377-410)
        if edit is not None:
            (target_normal_map, target_albedo_map, target_roughness_map,
             target_irradiance_map) = _apply_edit_overrides(
                edit, masks, mask_all, gt,
                target_normal_map, target_albedo_map, target_roughness_map,
                target_irradiance_map)

        n_dot_v = jnp.clip(jnp.sum(-rays_d * target_normal_map, -1), 0.0, 1.0)

        if rcfg.shading_mode == "monte_carlo":
            diffuse_map, specular_map = _monte_carlo_shading(
                query_full_ng, rays_d, x_surface, z_vals_constant,
                target_normal_map, target_albedo_map, target_roughness_map,
                rcfg)
            approximated_radiance_map = diffuse_map + specular_map
            return _assemble_outputs(
                rcfg, approximated_radiance_map, radiance_map,
                coarse_radiance_maps, [], target_irradiance_map, None, None,
                target_albedo_map, target_roughness_map, specular_map,
                diffuse_map, n_dot_v, inferred_normal_map, target_normal_map,
                disp_map, acc_map, depth_map, target_depth_map, weights)

        # BRDF LUT fetch (:418-421)
        lut_uv = jnp.stack(
            [2.0 * n_dot_v - 1.0, 2.0 * target_roughness_map - 1.0], axis=-1)
        env_brdf = grid_sample_2d(consts["brdf_lut"], lut_uv)
        env_c1 = env_brdf[..., 0:1]
        env_c0 = env_brdf[..., 1:2]

        # dielectric F0 with metallic = 1 - roughness (:424-427)
        target_metallic = (1.0 - target_roughness_map)[..., None]
        f0 = jnp.asarray([0.04, 0.04, 0.04], raw.dtype)
        f0 = f0 * (1.0 - target_metallic) + target_albedo_map * target_metallic

        fresnel_map = fresnel_schlick_roughness(n_dot_v, f0, target_roughness_map)
        if rcfg.lut_coefficient == "F":
            spec_coeff = fresnel_map * env_c1 + env_c0
        elif rcfg.lut_coefficient == "F0":
            spec_coeff = f0 * env_c1 + env_c0
        else:
            raise ValueError(rcfg.lut_coefficient)

        # reflected-ray second march along constant coarse z (:439-453)
        reflected_dirs = reflect(rays_d, target_normal_map)
        reflected_pts = (x_surface[..., None, :]
                         + reflected_dirs[..., None, :]
                         * z_vals_constant[..., :, None])

        if rcfg.use_gradient_for_incident_radiance:
            r_raw = query_full(reflected_pts, reflected_dirs)
            reflected_radiance_map, reflected_coarse_maps = (
                _composite_radiance_stack(r_raw, z_vals_constant,
                                          reflected_dirs, rcfg))
        else:
            r_raw = query_full_ng(stop(reflected_pts), stop(reflected_dirs))
            reflected_radiance_map, reflected_coarse_maps = jax.tree.map(
                stop, _composite_radiance_stack(r_raw, z_vals_constant,
                                                reflected_dirs, rcfg))

        prefiltered = jnp.stack(
            [reflected_radiance_map] + list(reflected_coarse_maps), axis=1)

        # roughness-driven mip level (:456-470)
        if rcfg.correct_depth_for_prefiltered_radiance_infer:
            depth_0 = (far + near) * 0.5
            mip_level = roughness_map * stop(depth_map) / depth_0[..., 0]
            mip_level = jnp.clip(mip_level, 0.0, 1.0)
        else:
            mip_level = roughness_map
        prefiltered_reflected_map = mip_interp(prefiltered, mip_level)

        # diffuse + specular combine (:472-474)
        diffuse_map = ((1.0 - fresnel_map) * (1.0 - target_metallic)
                       * target_albedo_map * target_irradiance_map)
        specular_map = spec_coeff * prefiltered_reflected_map
        approximated_radiance_map = diffuse_map + specular_map

    return _assemble_outputs(
        rcfg, approximated_radiance_map, radiance_map, coarse_radiance_maps,
        reflected_coarse_maps, target_irradiance_map, reflected_radiance_map,
        prefiltered_reflected_map, target_albedo_map, target_roughness_map,
        specular_map, diffuse_map, n_dot_v, inferred_normal_map,
        target_normal_map, disp_map, acc_map, depth_map, target_depth_map,
        weights)


def _assemble_outputs(rcfg, approximated_radiance_map, radiance_map,
                      coarse_radiance_maps, reflected_coarse_maps,
                      target_irradiance_map, reflected_radiance_map,
                      prefiltered_reflected_map, target_albedo_map,
                      target_roughness_map, specular_map, diffuse_map,
                      n_dot_v, inferred_normal_map, target_normal_map,
                      disp_map, acc_map, depth_map, target_depth_map,
                      weights):
    """Output transforms + map dict (parity: :480-525)."""
    if rcfg.use_radiance_linear:
        ldr = tonemap_reinhard
    else:
        ldr = lambda x: x
    if rcfg.gamma_correct:
        gam = rgb_to_srgb
    else:
        gam = lambda x: x

    out_f = lambda x: None if x is None else gam(ldr(x))
    alb_f = lambda x: None if x is None else gam(x)

    results: dict[str, Any] = {}
    results["color_map"] = out_f(approximated_radiance_map)
    results["radiance_map"] = out_f(radiance_map)
    for k, cm in enumerate(coarse_radiance_maps):
        results[f"radiance_map_{k + 1}"] = out_f(cm)
    for k, cm in enumerate(reflected_coarse_maps):
        results[f"reflected_coarse_radiance_map_{k + 1}"] = out_f(cm)

    results["irradiance_map"] = out_f(target_irradiance_map)
    results["reflected_radiance_map"] = out_f(reflected_radiance_map)
    results["prefiltered_reflected_map"] = out_f(prefiltered_reflected_map)

    results["albedo_map"] = alb_f(target_albedo_map)
    results["roughness_map"] = target_roughness_map
    results["specular_map"] = out_f(specular_map)
    results["diffuse_map"] = out_f(diffuse_map)
    results["n_dot_v_map"] = n_dot_v

    results["inferred_normal_map"] = inferred_normal_map
    results["target_normal_map"] = target_normal_map
    # Alias the estimator's own key so infer_normal_target losses can
    # reference it (the reference would KeyError here — train.py:314
    # looks up e.g. result["normal_map_from_depth_gradient_epsilon"]
    # which its raw2outputs never stores; documented fix).
    if target_normal_map is not None and rcfg.normal_type.startswith("normal_map"):
        results[rcfg.normal_type] = target_normal_map

    results["disp_map"] = disp_map
    results["acc_map"] = acc_map
    results["depth_map"] = depth_map
    results["target_depth_map"] = target_depth_map
    results["weights"] = weights

    return {k: v for k, v in results.items() if v is not None}


def _monte_carlo_shading(query_full_ng, rays_d, x_surface, z_vals_constant,
                         normal_map, albedo_map, roughness_map,
                         rcfg: RenderConfig):
    """Full GGX microfacet Monte-Carlo shading (live branch).

    The reference ships the estimator's parts (Microfacet,
    microfacet.py:8-221; hemisphere samplers, math_utils.py:150-182) but
    never wires them into raw2outputs — this is the integration it
    implies: M = mc_samples_axis^2 low-discrepancy hemisphere directions
    about the shading normal, each marched through the (no-grad) field
    for incident radiance, weighted by the GGX glossy + Lambert diffuse
    BRDF and the uniform-hemisphere 2π/M Monte-Carlo weight. Gradient
    semantics mirror split-sum: incident radiance is detached (like the
    default reflected march), BRDF terms carry gradients to the
    intrinsic maps.

    Returns (diffuse_map (B,3), specular_map (B,3)).
    """
    from ibl_nerf_tpu.ops.geometry import get_tbn, hemisphere_samples
    from ibl_nerf_tpu.ops.shading import microfacet_brdf

    b = rays_d.shape[0]
    s = z_vals_constant.shape[-1]
    local = jnp.asarray(hemisphere_samples(rcfg.mc_samples_axis))  # (M, 3)
    m = local.shape[0]

    binormal, tangent = get_tbn(normal_map)
    # world-space sample dirs (B, M, 3); local frame (tangent, binormal,
    # normal) with +z = normal.
    wdirs = (local[None, :, 0, None] * tangent[:, None, :]
             + local[None, :, 1, None] * binormal[:, None, :]
             + local[None, :, 2, None] * normal_map[:, None, :])
    wdirs = stop(wdirs / jnp.maximum(
        jnp.linalg.norm(wdirs, axis=-1, keepdims=True), 1e-12))

    # incident radiance: march every (ray, sample-dir) as one batch
    z = jnp.broadcast_to(z_vals_constant[:, None, :], (b, m, s))
    pts = (x_surface[:, None, None, :]
           + wdirs[:, :, None, :] * z[..., None]).reshape(b * m, s, 3)
    flat_dirs = wdirs.reshape(b * m, 3)
    raw = query_full_ng(stop(pts), flat_dirs)
    incident, _ = _composite_radiance_stack(
        raw, z.reshape(b * m, s), flat_dirs, rcfg)
    incident = stop(incident).reshape(b, m, 3)

    brdf_glossy, brdf_diffuse, l_dot_n = microfacet_brdf(
        wdirs, -rays_d, normal_map, albedo_map, roughness_map[..., None])

    w_mc = 2.0 * jnp.pi / m  # uniform-hemisphere pdf = 1/2π
    specular = w_mc * jnp.sum(brdf_glossy * incident * l_dot_n, axis=1)
    diffuse = w_mc * jnp.sum(brdf_diffuse * incident * l_dot_n, axis=1)
    return diffuse, specular


def _estimate_normal(query_sigma, query_sigma_ng, rays_o, rays_d, z_vals,
                     pts, x_surface, weights_det, inferred_normal_map, gt,
                     rcfg: RenderConfig):
    """Select + compute the shading normal (parity: :348-375).

    All estimator outputs are detached (the reference detaches every
    live variant). The ε finite-difference variants run through the
    no-grad query (Pallas-eligible); the autograd variants need the
    differentiable query for their forward-mode JVPs."""
    nt = rcfg.normal_type
    if nt == "ground_truth":
        n = gt["normal"]
        n = 2.0 * n - 1.0
        return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    if nt == "inferred_normal_map":
        return inferred_normal_map
    if nt == "normal_map_from_depth_gradient_epsilon":
        return stop(normals_mod.normal_from_depth_gradient_epsilon(
            query_sigma_ng, stop(rays_o), stop(rays_d), stop(z_vals),
            rcfg.epsilon, scan=rcfg.sweep_scan))
    if nt == "normal_map_from_depth_gradient_direction_epsilon":
        return stop(normals_mod.normal_from_depth_gradient_direction_epsilon(
            query_sigma_ng, stop(rays_o), stop(rays_d), stop(z_vals),
            rcfg.epsilon_direction, scan=rcfg.sweep_scan))
    if nt == "normal_map_from_depth_gradient":
        return stop(normals_mod.normal_from_depth_gradient(
            query_sigma, rays_o, rays_d, z_vals))
    if nt == "normal_map_from_depth_gradient_direction":
        return stop(normals_mod.normal_from_depth_gradient_direction(
            query_sigma, rays_o, rays_d, z_vals))
    if nt == "normal_map_from_sigma_gradient":
        return stop(normals_mod.normal_from_sigma_gradient(
            lambda p: query_sigma(p)[..., 0], pts, weights_det))
    if nt == "normal_map_from_sigma_gradient_surface":
        return stop(normals_mod.normal_from_sigma_gradient_surface(
            lambda p: query_sigma(p)[..., 0], x_surface))
    raise ValueError(nt)


def _apply_edit_overrides(edit, masks, mask_all, gt, normal_map, albedo_map,
                          roughness_map, irradiance_map):
    """Intrinsic overrides before shading (parity: :377-410)."""
    if edit.mode == "edit":
        if edit.edit_normal:
            g = gt["edit_normal"] * 2.0 - 1.0
            g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
            normal_map = _where(mask_all, g, normal_map)
        if edit.edit_albedo:
            if edit.edit_albedo_by_img:
                albedo_map = _where(mask_all, gt["edit_albedo"], albedo_map)
            else:
                for i, m in enumerate(masks):
                    tgt = jnp.asarray(edit.target_albedo[3 * i: 3 * i + 3],
                                      albedo_map.dtype)
                    albedo_map = _where(m, tgt, albedo_map)
        if edit.edit_roughness:
            if edit.edit_roughness_by_img:
                roughness_map = _where(mask_all, gt["edit_roughness"][..., 0],
                                       roughness_map)
            else:
                for i, r in enumerate(edit.target_roughness):
                    roughness_map = _where(masks[i], r, roughness_map)
    else:  # insert
        g = gt["object_insert_normal"] * 2.0 - 1.0
        g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        normal_map = _where(mask_all, g, normal_map)
        for i, m in enumerate(masks):
            roughness_map = _where(m, edit.target_roughness[i], roughness_map)
            if edit.target_irradiance and edit.target_irradiance[i] > 0:
                irradiance_map = _where(m, edit.target_irradiance[i],
                                        irradiance_map)
            tgt = jnp.asarray(edit.target_albedo[3 * i: 3 * i + 3],
                              albedo_map.dtype)
            albedo_map = _where(m, tgt, albedo_map)
    return normal_map, albedo_map, roughness_map, irradiance_map


# ---------------------------------------------------------------------------
# render_rays: coarse -> importance resample -> fine
# ---------------------------------------------------------------------------

def make_ray_batch(rays_o, rays_d, near, far):
    """Pack a ray batch dict; near/far scalars or (B,) arrays."""
    b = rays_o.shape[0]
    near = jnp.broadcast_to(jnp.asarray(near, rays_o.dtype), (b,))[..., None]
    far = jnp.broadcast_to(jnp.asarray(far, rays_o.dtype), (b,))[..., None]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return {"rays_o": rays_o, "rays_d": rays_d, "viewdirs": viewdirs,
            "near": near, "far": far}


def render_rays(key, variables, consts, batch, rcfg: RenderConfig,
                gt_values=None, is_depth_only: bool = False):
    """Render a ray batch into all output maps.

    variables: {'coarse': field params, 'fine': field params | absent,
                optional aux mlps 'normal_mlp'/'depth_mlp'/...}
    consts:    {'brdf_lut': (H, W, C)} non-trainable assets.
    batch:     make_ray_batch output.
    Returns dict of maps; coarse-pass results are suffixed '0' when a
    fine network runs (parity: render_rays, ibl_nerf_renderer.py:629-732).
    """
    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    near, far = batch["near"], batch["far"]

    k_strat, k_coarse, k_pdf, k_fine = jax.random.split(key, 4)

    z_vals = stratified_z_vals(
        k_strat, near, far, rcfg.n_samples,
        lindisp=rcfg.lindisp, perturb=rcfg.perturb)
    z_vals_constant = z_vals

    coarse_vars = dict(variables)
    coarse_vars["coarse_or_fine"] = variables["coarse"]

    if is_depth_only:
        _, query_sigma, _, _ = _make_queries(variables["coarse"], rcfg)
        result = _render_depth_only(k_coarse, query_sigma, rays_o, rays_d,
                                    z_vals, rcfg)
    elif not rcfg.coarse_shading and rcfg.n_importance > 0:
        # Inference fast path: the coarse pass only has to produce the
        # importance-resampling weights (+ depth). apply_field_density
        # shares trunk+sigma with the full query, so every fine buffer
        # is identical to coarse_shading=True — the coarse shading graph
        # (ε-normal sweeps, reflected march, heads) is simply not built.
        # query_sigma (the primary-march dtype) keeps the weights
        # bit-identical to what the full coarse pass would produce.
        _, query_sigma, _, _ = _make_queries(variables["coarse"], rcfg)
        result = _render_depth_only(k_coarse, query_sigma, rays_o, rays_d,
                                    z_vals, rcfg)
    else:
        result = _raw2outputs(k_coarse, coarse_vars, consts, rays_o, rays_d,
                              z_vals, z_vals_constant, near, far, rcfg,
                              gt_values)

    if rcfg.n_importance > 0:
        weights = result["weights"]
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(k_pdf, z_mid, weights[..., 1:-1],
                               rcfg.n_importance, det=not rcfg.perturb)
        z_samples = stop(z_samples)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)

        fine_vars = dict(variables)
        fine_vars["coarse_or_fine"] = variables.get("fine", variables["coarse"])

        # Distinct fine architecture: swap the field config for the fine
        # pass only (multires/K are shared, so every downstream shape —
        # embeddings, raw channels, maps — is unchanged).
        rcfg_f = rcfg
        if rcfg.field_fine is not None:
            rcfg_f = rcfg.replace(field=rcfg.field_fine, field_fine=None)

        if is_depth_only:
            _, query_sigma_f, _, _ = _make_queries(
                fine_vars["coarse_or_fine"], rcfg_f)
            result_fine = _render_depth_only(k_fine, query_sigma_f, rays_o,
                                             rays_d, z_all, rcfg_f)
        else:
            result_fine = _raw2outputs(k_fine, fine_vars, consts, rays_o,
                                       rays_d, z_all, z_vals_constant, near,
                                       far, rcfg_f, gt_values)

        for k, v in result.items():
            result_fine[k + "0"] = v
        result = result_fine
        result["z_std"] = jnp.std(z_samples, axis=-1)

    if rcfg.infer_depth:
        pe = positional_encoding(rays_o[..., None, :], rcfg.field.multires)
        de = positional_encoding(batch["viewdirs"][..., None, :],
                                 rcfg.field.multires_views)
        out = apply_position_direction_mlp(variables["depth_mlp"], pe, de)
        result["inferred_depth_map"] = jax.nn.relu(out[..., 0]).squeeze(-1)

    return result


# ---------------------------------------------------------------------------
# Scanned whole-frame renderer (inference fast path)
# ---------------------------------------------------------------------------

def make_frame_render_fn(variables, consts, rcfg: RenderConfig,
                         output_keys: tuple[str, ...] | None = None,
                         staticcam: bool = False, unroll: int = 1):
    """Build ONE jitted program that renders a whole frame.

    The frame arrives pre-tiled as (n_chunks, chunk, 3) ray arrays and is
    rendered by `lax.map` over the tile axis — a single XLA dispatch per
    frame (no per-chunk host round-trips), with peak memory bounded by
    one tile. `output_keys` filters the result dict INSIDE the traced
    function, so XLA dead-code-eliminates the compute feeding any
    dropped buffer. Compiles once per (n_chunks, chunk) shape; reuse the
    returned fn across poses.

    Returns fn(key, rays_o_t, rays_d_t, viewdirs_t, gt_t, near, far)
    -> {name: (n_chunks, chunk, C?)}. `gt_t` is a (possibly empty) dict
    of (n_chunks, chunk, C) arrays; viewdirs_t is only consulted when
    staticcam=True (parity: render_decomp's c2w_staticcam,
    ibl_nerf_renderer.py:792-796).

    unroll > 1 unrolls the scan over tiles so XLA can interleave
    adjacent tiles' programs (fills MXU pipeline bubbles between a
    tile's dependent MLP chains); n_chunks must stay divisible by it.
    """
    from functools import partial

    @partial(jax.jit, donate_argnums=())
    def run(key, rays_o_t, rays_d_t, viewdirs_t, gt_t, near, far):
        def one(_, args):
            ro, rd, vd, gt = args
            batch = make_ray_batch(ro, rd, near, far)
            if staticcam:
                batch["viewdirs"] = vd / jnp.linalg.norm(
                    vd, axis=-1, keepdims=True)
            out = render_rays(key, variables, consts, batch, rcfg,
                              gt_values=gt if gt else None)
            if output_keys is not None:
                out = {k: out[k] for k in output_keys if k in out}
            return None, out

        _, out = jax.lax.scan(one, None,
                              (rays_o_t, rays_d_t, viewdirs_t, gt_t),
                              unroll=unroll)
        return out

    return run


def render_frame(fn, key, rays_o, rays_d, near, far, chunk: int,
                 gt_values=None, viewdirs=None):
    """Drive a make_frame_render_fn program over flat (N, 3) rays:
    pad to a chunk multiple, tile, run, un-tile. Returns {name: (N, C?)}."""
    n = rays_o.shape[0]
    pad = (-n) % chunk
    tile = lambda x: (jnp.concatenate(
        [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0) if pad else x
    ).reshape(-1, chunk, *x.shape[1:])
    gt_t = {k: tile(v) for k, v in (gt_values or {}).items()}
    vd_t = tile(viewdirs if viewdirs is not None else rays_d)
    out = fn(key, tile(rays_o), tile(rays_d), vd_t, gt_t,
             jnp.asarray(near, jnp.float32), jnp.asarray(far, jnp.float32))
    return {k: v.reshape(-1, *v.shape[2:])[:n] for k, v in out.items()}


# ---------------------------------------------------------------------------
# Full-image rendering (parity: render_decomp with c2w)
# ---------------------------------------------------------------------------

def render_image(key, variables, consts, H, W, K, c2w, near, far,
                 rcfg: RenderConfig, gt_values=None, chunk: int = 2048,
                 render_fn=None, c2w_staticcam=None):
    """Render a full image by mapping a jitted chunk renderer over rows of
    rays. gt_values entries must be flattened (H*W, C).

    `render_fn` lets callers supply a pre-jitted render_rays closure
    (key, batch, gt) -> maps so compilation is shared across frames.
    c2w_staticcam: when given, ray origins/directions come from it while
    viewdirs keep c2w — visualizes the view-dependence (parity:
    render_decomp, ibl_nerf_renderer.py:792-796).
    """
    rays_o, rays_d = get_rays_full_image(H, W, K, c2w)
    viewdirs_src = rays_d
    if c2w_staticcam is not None:
        rays_o, rays_d = get_rays_full_image(H, W, K, c2w_staticcam)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    viewdirs_src = viewdirs_src.reshape(-1, 3)
    n = rays_o.shape[0]

    pad = (-n) % chunk
    if pad:
        padder = lambda x: jnp.concatenate(
            [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        rays_o, rays_d = padder(rays_o), padder(rays_d)
        viewdirs_src = padder(viewdirs_src)
        if gt_values:
            gt_values = {k: padder(v) for k, v in gt_values.items()}

    outs = []
    for i in range(0, n + pad, chunk):
        batch = make_ray_batch(rays_o[i:i + chunk], rays_d[i:i + chunk],
                               near, far)
        if c2w_staticcam is not None:
            vd = viewdirs_src[i:i + chunk]
            batch["viewdirs"] = vd / jnp.linalg.norm(vd, axis=-1,
                                                     keepdims=True)
        gt_i = ({k: v[i:i + chunk] for k, v in gt_values.items()}
                if gt_values else None)
        if render_fn is not None:
            out = render_fn(key, batch, gt_i)
        else:
            out = render_rays(key, variables, consts, batch, rcfg, gt_i)
        outs.append({k: v for k, v in out.items()})

    merged = {}
    for k in outs[0]:
        v = jnp.concatenate([o[k] for o in outs], axis=0)[:n]
        if v.ndim >= 1 and v.shape[0] == n:
            v = v.reshape(H, W, *v.shape[1:])
        merged[k] = v
    return merged
