"""Loss-assembly parity: compute_losses vs a direct transcription of the
reference's train-loop loss math (train.py:299-441) evaluated in torch
on identical synthetic render outputs."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from ibl_nerf_tpu.train.losses import LossConfig, compute_losses, resolve_phase


B = 32
K = 3


@pytest.fixture()
def fake_render(rng):
    """Synthetic render result + pixel info with coarse ('0') variants."""
    def r(*shape):
        return rng.uniform(0, 1, shape).astype(np.float32)

    result = {}
    for key, shape in [
        ("color_map", (B, 3)), ("radiance_map", (B, 3)),
        ("albedo_map", (B, 3)), ("roughness_map", (B,)),
        ("irradiance_map", (B, 1)), ("depth_map", (B,)),
    ]:
        result[key] = r(*shape)
        result[key + "0"] = r(*shape)
    for k in range(K):
        result[f"radiance_map_{k+1}"] = r(B, 3)
        result[f"radiance_map_{k+1}0"] = r(B, 3)

    pixel_info = {
        "rgb": r(B, 3),
        "prior_albedo": r(B, 3),
        "prior_irradiance": r(B),
        "depth": r(B, 1),
    }
    for k in range(K):
        pixel_info[f"rgb_{k+1}"] = r(B, 3)
    return result, pixel_info


def torch_reference_total(result, pixel_info, cfg: LossConfig, step: int,
                          prior_mean: float, far: float):
    """Transcription of the reference loss assembly (train.py:299-441)."""
    t = {k: torch.tensor(v) for k, v in result.items()}
    p = {k: torch.tensor(v) for k, v in pixel_info.items()}
    mse = torch.nn.MSELoss()

    def calc(key, target):
        loss = mse(t[key], target)
        if key + "0" in t:
            loss = loss + mse(t[key + "0"], target)
        return loss

    target_rgb = p["rgb"]
    loss_radiance = calc("radiance_map", target_rgb)
    total = cfg.beta_radiance_render * loss_radiance
    for k in range(cfg.coarse_radiance_number):
        total = total + cfg.beta_radiance_render * calc(
            f"radiance_map_{k+1}", p[f"rgb_{k+1}"])

    if (cfg.depth_map_from_ground_truth
            and cfg.train_depth_from_ground_truth):
        loss_sd = calc("depth_map", p["depth"][..., 0]) / (far * far * 0.1)
        total = total + cfg.beta_sigma_depth * loss_sd

    if cfg.initialize_roughness and step < cfg.n_iter_ignore_approximated_radiance:
        rt = torch.full_like(t["roughness_map"], cfg.roughness_init)
        loss_ri = (torch.mean((t["roughness_map"] - cfg.roughness_init) ** 2)
                   + torch.mean((t["roughness_map0"] - cfg.roughness_init) ** 2))
        total = total + cfg.beta_roughness_render * loss_ri

    if step >= cfg.n_iter_ignore_approximated_radiance:
        total = total + cfg.beta_render * calc("color_map", target_rgb)

    if cfg.load_priors and step >= cfg.n_iter_ignore_prior:
        if cfg.albedo_prior_type == "chrom":
            # fine-only: reference stores only "albedo_chrom_map" so the
            # '0'-suffix branch of calculate_loss never fires
            pc = p["prior_albedo"] / (
                p["prior_albedo"].norm(dim=-1, keepdim=True) + 1e-10)
            ac = t["albedo_map"] / (
                t["albedo_map"].norm(dim=-1, keepdim=True) + 1e-10)
            loss_pa = mse(ac, pc)
        else:
            loss_pa = calc("albedo_map", p["prior_albedo"])
        # shape-matched prior irradiance (our documented fix of the
        # reference's (B,1)x(B,) broadcast bug)
        loss_pi = calc("irradiance_map", p["prior_irradiance"][..., None])
        loss_ir = mse(t["irradiance_map"],
                      torch.full_like(t["irradiance_map"], prior_mean))
        total = (total + cfg.beta_prior_albedo * loss_pa
                 + cfg.beta_prior_irradiance * loss_pi
                 + cfg.beta_irradiance_reg * loss_ir)
    return float(total)


CASES = [
    # (step, cfg overrides) spanning all three live phases + extras
    (100, {}),                                     # phase A
    (20000, {}),                                   # phase B (color on)
    (110000, {}),                                  # phase C (priors+freeze)
    (110000, {"albedo_prior_type": "chrom"}),
    (100, {"initialize_roughness": True}),
    (20000, {"depth_map_from_ground_truth": True,
             "train_depth_from_ground_truth": True}),
]


@pytest.mark.parametrize("step,overrides", CASES)
def test_total_loss_parity(fake_render, step, overrides):
    result, pixel_info = fake_render
    cfg = LossConfig(
        load_priors=True, freeze_roughness=True,
        n_iter_ignore_approximated_radiance=10000,
        n_iter_ignore_prior=100000,
        beta_prior_albedo=1.0, beta_prior_irradiance=0.5,
        beta_irradiance_reg=0.1,
        coarse_radiance_number=K,
        **overrides)
    phase = resolve_phase(step, cfg)

    jr = {k: jnp.asarray(v) for k, v in result.items()}
    jp = {k: jnp.asarray(v) for k, v in pixel_info.items()}
    total, scalars = compute_losses(jr, jp, cfg, phase,
                                    prior_irradiance_mean=0.62, far=6.6)
    ref = torch_reference_total(result, pixel_info, cfg, step,
                                prior_mean=0.62, far=6.6)
    np.testing.assert_allclose(float(total), ref, rtol=1e-5)
