"""Optimizer-update parity: our optax chain (build_optimizer) vs
torch.optim.Adam driven exactly as the reference drives it.

The reference integration surface under test:
 - named-group Adam, defaults lr=args.lrate, betas=(0.9, 0.999),
   eps=1e-8 (/root/reference/src/nerf_models/ibl_nerf.py:336);
 - per-group exponential LR decay applied AFTER optimizer.step() and
   only when global_step > the group's start count
   (/root/reference/src/train.py:483-498) — so the Adam step at
   iteration i uses the LR computed from global_step = i-1;
 - aux param groups whose gated losses have not run yet have
   `.grad is None` and are skipped by torch.optim.Adam entirely (their
   bias-correction t starts at their first real gradient);
 - frozen-but-previously-trained params have zero grad TENSORS
   (zero_grad() zeroes existing grads) and keep receiving
   momentum-decay updates in torch — same as optax with zero grads.

Per-step render/loss/grad parity is covered elsewhere
(test_grad_parity, test_loss_parity); this file isolates the optimizer
integration that only shows up over many steps.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from ibl_nerf_tpu.train.losses import LossConfig
from ibl_nerf_tpu.train.step import build_optimizer

LRATE = 5e-4
DECAY = 1  # lrate_decay -> decay_steps = 1000: visible decay in ~50 steps


def _torch_reference_driver(groups, grads_fn, n_steps, starts,
                            lrate=LRATE, lrate_decay=DECAY):
    """Runs torch Adam exactly as the reference train loop does.

    groups: {name: np params}; grads_fn(i) -> {name: np grad or None}.
    starts: {name: start_count} for set_lr.
    Returns the param history [(step, {name: np}), ...].
    """
    t_params = {k: torch.tensor(v, requires_grad=True)
                for k, v in groups.items()}
    opt = torch.optim.Adam(
        [{"params": [t_params[k]], "name": k, "lr": lrate} for k in groups],
        lr=lrate, betas=(0.9, 0.999))
    original_lr = {k: lrate for k in groups}
    decay_steps = lrate_decay * 1000
    history = []
    global_step = 0
    for i in range(n_steps):
        grads = grads_fn(i)
        # reference zero_grad(): zeroes grads that exist; params never
        # touched by backward keep .grad None and Adam skips them
        for k, p in t_params.items():
            if p.grad is not None:
                p.grad.zero_()
            if grads[k] is not None:
                g = torch.tensor(grads[k])
                p.grad = p.grad + g if p.grad is not None else g
        opt.step()
        # set_lr AFTER step (train.py:483-498)
        for pg in opt.param_groups:
            name = pg["name"]
            if global_step > starts.get(name, 0):
                pg["lr"] = original_lr[name] * (
                    0.1 ** ((global_step - starts.get(name, 0)) / decay_steps))
        global_step += 1
        history.append((i, {k: p.detach().numpy().copy()
                            for k, p in t_params.items()}))
    return history


def _ours_driver(groups, grads_fn, n_steps, lcfg=None, lrate=LRATE,
                 lrate_decay=DECAY):
    """Runs our optax chain; None grads become explicit zeros (what a
    jitted loss whose gated term is off produces)."""
    variables = {k: jnp.asarray(v) for k, v in groups.items()}
    opt = build_optimizer(variables, lrate=lrate, lrate_decay=lrate_decay,
                          lcfg=lcfg)
    state = opt.init(variables)
    history = []
    for i in range(n_steps):
        grads = grads_fn(i)
        g = {k: (jnp.asarray(grads[k]) if grads[k] is not None
                 else jnp.zeros_like(variables[k])) for k in variables}
        updates, state = opt.update(g, state, variables)
        variables = jax.tree.map(lambda p, u: p + u, variables, updates)
        history.append((i, {k: np.asarray(v) for k, v in variables.items()}))
    return history


def _assert_history_close(ours, ref, rtol=2e-5, atol=1e-8):
    for (i, a), (_, b) in zip(ours, ref):
        for k in a:
            np.testing.assert_allclose(
                a[k], b[k], rtol=rtol, atol=atol,
                err_msg=f"step {i} group {k}")


@pytest.fixture()
def rng():
    return np.random.default_rng(11)


class TestAdamStep:
    def test_single_step(self, rng):
        """One torch.optim.Adam step (reference defaults) == one update
        of our chain, on equal params + grads."""
        groups = {"coarse": rng.standard_normal((6, 5)).astype(np.float32),
                  "fine": rng.standard_normal((4,)).astype(np.float32)}
        grads = {k: rng.standard_normal(v.shape).astype(np.float32)
                 for k, v in groups.items()}
        ours = _ours_driver(groups, lambda i: grads, 1)
        ref = _torch_reference_driver(groups, lambda i: grads, 1,
                                      starts={})
        _assert_history_close(ours, ref, rtol=1e-6)

    def test_multi_step_with_lr_decay(self, rng):
        """60 steps with fresh grads each step: bias correction, eps
        placement, and the after-step LR decay all line up."""
        groups = {"coarse": rng.standard_normal((8, 3)).astype(np.float32),
                  "fine": rng.standard_normal((5, 2)).astype(np.float32)}
        gs = [{k: rng.standard_normal(v.shape).astype(np.float32)
               for k, v in groups.items()} for _ in range(60)]
        ours = _ours_driver(groups, lambda i: gs[i], 60)
        ref = _torch_reference_driver(groups, lambda i: gs[i], 60, starts={})
        _assert_history_close(ours, ref)

    def test_zero_grad_momentum_decay(self, rng):
        """Freeze-phase semantics: grads become zero TENSORS (the
        reference zero_grad() zeroes existing grads; frozen heads get
        nothing from backward) and the params keep drifting on decaying
        momentum identically on both sides."""
        groups = {"coarse": rng.standard_normal((6, 4)).astype(np.float32)}
        gs = [{"coarse": rng.standard_normal((6, 4)).astype(np.float32)}
              for _ in range(10)]

        def grads_fn(i):
            if i < 10:
                return gs[i]
            return {"coarse": np.zeros((6, 4), np.float32)}

        ours = _ours_driver(groups, grads_fn, 30)
        ref = _torch_reference_driver(groups, grads_fn, 30, starts={})
        # params MUST keep moving for a while after the freeze
        drift = np.abs(ours[15][1]["coarse"] - ours[10][1]["coarse"]).max()
        assert drift > 0
        _assert_history_close(ours, ref)

    def test_delayed_aux_group(self, rng):
        """An aux MLP whose loss activates at iteration `start`: torch
        sees .grad None until then (Adam skips: t starts at 1 at the
        first real grad); ours sees explicit zeros. The delayed-start
        wrapper + schedule must reproduce the torch trajectory exactly,
        including the set_lr(name, start) decay offset."""
        start = 12
        groups = {"coarse": rng.standard_normal((5, 3)).astype(np.float32),
                  "normal_mlp": rng.standard_normal((4, 2)).astype(np.float32)}
        gs = [{k: rng.standard_normal(v.shape).astype(np.float32)
               for k, v in groups.items()} for _ in range(50)]

        def grads_ref(i):
            return {"coarse": gs[i]["coarse"],
                    "normal_mlp": gs[i]["normal_mlp"] if i >= start else None}

        lcfg = LossConfig(n_iter_ignore_normal=start, infer_normal=True)
        ours = _ours_driver(groups, grads_ref, 50, lcfg=lcfg)
        ref = _torch_reference_driver(groups, grads_ref, 50,
                                      starts={"normal_mlp": start})
        # before start: aux params must not have moved at all
        np.testing.assert_array_equal(ours[start - 1][1]["normal_mlp"],
                                      groups["normal_mlp"])
        _assert_history_close(ours, ref)
