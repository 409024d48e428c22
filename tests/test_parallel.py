"""SPMD correctness on the 8-device virtual CPU mesh: the sharded train
step must produce the same loss/params as the unsharded step (same PRNG
stream), and per-ray work must stay chip-local."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ibl_nerf_tpu.models.field import FieldConfig, init_field_params
from ibl_nerf_tpu.parallel.mesh import make_mesh, make_sharded_train_step
from ibl_nerf_tpu.render import RenderConfig
from ibl_nerf_tpu.train.losses import LossConfig, resolve_phase
from ibl_nerf_tpu.train.step import (
    build_optimizer,
    init_train_state,
    make_train_step,
)


FCFG = FieldConfig(depth=2, width=32, coarse_radiance_number=2, skips=())
RCFG = RenderConfig(field=FCFG, n_samples=8, n_importance=8, perturb=True,
                    normal_type="normal_map_from_depth_gradient_epsilon")
LCFG = LossConfig(coarse_radiance_number=2,
                  n_iter_ignore_approximated_radiance=0,
                  n_iter_ignore_prior=10**9)
PHASE = resolve_phase(1, LCFG)

H, W, NIMG = 16, 16, 3
BATCH = 32


def _arrays():
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(
            rng.uniform(0, 1, (NIMG, H, W, 3)).astype(np.float32)),
        "prefiltered_images": jnp.asarray(
            rng.uniform(0, 1, (2, NIMG, H, W, 3)).astype(np.float32)),
        "poses": jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * NIMG)),
        "K": jnp.asarray(np.array(
            [[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)),
    }


def _state_and_opt():
    variables = {"coarse": init_field_params(jax.random.key(0), FCFG),
                 "fine": init_field_params(jax.random.key(1), FCFG)}
    optimizer = build_optimizer(variables, lcfg=LCFG)
    return init_train_state(variables, optimizer), optimizer


CONSTS = {"brdf_lut": jnp.full((8, 8, 3), 0.4, jnp.float32)}


class TestShardedStep:
    def test_matches_unsharded(self):
        assert len(jax.devices()) >= 8, "conftest forces an 8-device CPU mesh"
        arrays = _arrays()

        # unsharded
        state_a, opt_a = _state_and_opt()
        step_a = make_train_step(RCFG, LCFG, PHASE, opt_a, CONSTS, H, W,
                                 BATCH, prior_irradiance_mean=0.7,
                                 near=2.0, far=6.0, donate=False)
        state_a, scal_a = step_a(state_a, jax.random.key(7), arrays)

        # sharded over 8 devices
        mesh = make_mesh(jax.devices()[:8])
        state_b, opt_b = _state_and_opt()
        step_b, place_state, place_arrays = make_sharded_train_step(
            RCFG, LCFG, PHASE, opt_b, CONSTS, H, W, BATCH,
            prior_irradiance_mean=0.7, near=2.0, far=6.0, mesh=mesh)
        state_b = place_state(state_b)
        state_b, scal_b = step_b(state_b, jax.random.key(7),
                                 place_arrays(arrays))

        np.testing.assert_allclose(float(scal_a["loss_total"]),
                                   float(scal_b["loss_total"]),
                                   rtol=1e-5)
        la = jax.tree.leaves(state_a.variables)
        lb = jax.tree.leaves(state_b.variables)
        # sharded grad-reduction order differs -> tiny float drift
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3)

    def test_multiple_steps_stable(self):
        mesh = make_mesh(jax.devices()[:8])
        state, opt = _state_and_opt()
        step, place_state, place_arrays = make_sharded_train_step(
            RCFG, LCFG, PHASE, opt, CONSTS, H, W, BATCH,
            prior_irradiance_mean=0.7, near=2.0, far=6.0, mesh=mesh)
        state = place_state(state)
        arrays = place_arrays(_arrays())
        losses = []
        for i in range(5):
            state, scal = step(state, jax.random.fold_in(jax.random.key(3), i),
                               arrays)
            losses.append(float(scal["loss_total"]))
        assert all(np.isfinite(losses))

    def test_sharded_full_image_render(self):
        """Sharded eval renderer matches the single-device renderer."""
        from ibl_nerf_tpu.parallel.mesh import make_sharded_render_fn
        from ibl_nerf_tpu.render.renderer import render_image

        mesh = make_mesh(jax.devices()[:8])
        variables = {"coarse": init_field_params(jax.random.key(0), FCFG),
                     "fine": init_field_params(jax.random.key(1), FCFG)}
        rcfg = RCFG.replace(perturb=False)
        render_fn = make_sharded_render_fn(mesh, variables, CONSTS, rcfg)

        K = jnp.asarray(np.array(
            [[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]], np.float32))
        c2w = jnp.eye(4)[:3]
        out_sharded = render_image(
            jax.random.key(0), variables, CONSTS, 16, 16, K, c2w, 2.0, 6.0,
            rcfg, chunk=64, render_fn=render_fn)
        out_single = render_image(
            jax.random.key(0), variables, CONSTS, 16, 16, K, c2w, 2.0, 6.0,
            rcfg, chunk=64)
        np.testing.assert_allclose(
            np.asarray(out_sharded["radiance_map"]),
            np.asarray(out_single["radiance_map"]), atol=1e-4)
        assert out_sharded["radiance_map"].shape == (16, 16, 3)

    def test_compiled_step_is_sharded(self):
        """HLO-level gate: the COMPILED sharded step must (a) contain the
        cross-device gradient all-reduce and (b) keep per-ray tensors
        partitioned over the 8-way rays axis — i.e. the program is
        actually SPMD, not silently replicated."""
        mesh = make_mesh(jax.devices()[:8])
        state, opt = _state_and_opt()
        step, place_state, place_arrays = make_sharded_train_step(
            RCFG, LCFG, PHASE, opt, CONSTS, H, W, BATCH,
            prior_irradiance_mean=0.7, near=2.0, far=6.0, mesh=mesh)
        state = place_state(state)
        arrays = place_arrays(_arrays())
        compiled = step.lower(state, jax.random.key(7), arrays).compile()
        hlo = compiled.as_text()

        # (a) the parameter-gradient psum is a real collective
        assert "all-reduce" in hlo, "no gradient all-reduce in compiled HLO"

        # (b) per-ray intermediates are 8-way partitioned: the module is
        # compiled for 8 partitions and per-ray tensors appear at their
        # LOCAL shard shape (BATCH/8 rays x samples), proving the rays
        # axis was split rather than replicated.
        assert "num_partitions=8" in hlo
        local = BATCH // 8
        n_total = RCFG.n_samples + RCFG.n_importance
        assert (f"f32[{local},{n_total}]" in hlo
                or f"f32[{local},{RCFG.n_samples}]" in hlo), (
            "no per-ray tensor at local shard shape in compiled HLO")

    def test_global_step_input_shardings(self):
        """The distributed (pre-sampled batch) step compiles with rays
        inputs sharded P('rays') and params replicated."""
        from ibl_nerf_tpu.parallel import distributed as dist

        mesh = dist.global_mesh()
        state, opt = _state_and_opt()
        step_fn, place_state = dist.make_global_train_step(
            RCFG, LCFG, PHASE, opt, CONSTS, BATCH,
            prior_irradiance_mean=0.7, near=2.0, far=6.0, mesh=mesh)
        state = place_state(state)
        sampler = dist.HostShardedSampler(
            _arrays(), mesh, BATCH, H, W, process_index=0, process_count=1)
        pixel_info, rays_o, rays_d = sampler.sample(0)
        assert len(rays_o.sharding.device_set) == 8

        compiled = step_fn.lower(state, jax.random.key(7), pixel_info,
                                 rays_o, rays_d).compile()
        hlo = compiled.as_text()
        assert "all-reduce" in hlo
        assert "num_partitions=8" in hlo
