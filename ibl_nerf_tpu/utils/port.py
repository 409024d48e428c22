"""Port PyTorch reference checkpoints into ibl_nerf_tpu param pytrees.

The reference checkpoints (.tar torch.save dicts, see
/root/reference/src/nerf_models/ibl_nerf.py:344-378) hold state_dicts
whose Linear weights are (out, in); our dense params are (in, out).
Everything here takes *numpy* dicts so torch is only needed by the
caller that reads the .tar file.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _lin(sd: dict, name: str):
    return {
        "w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T),
        "b": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
    }


def field_params_from_torch_state(sd: dict, coarse_radiance_number: int = 3,
                                  depth: int = 8):
    """Map an IBLNeRF state_dict (as numpy arrays) to our field pytree."""
    return {
        "trunk": [_lin(sd, f"positions_linears.{i}") for i in range(depth)],
        "sigma": _lin(sd, "sigma_linear"),
        "albedo_feat": _lin(sd, "albedo_feature_linear"),
        "albedo": _lin(sd, "albedo_linear"),
        "roughness": _lin(sd, "roughness_linear"),
        "irradiance_feat": _lin(sd, "irradiance_feature_linear"),
        "irradiance": _lin(sd, "irradiance_linear"),
        "feature": _lin(sd, "feature_linear"),
        "views": [_lin(sd, "views_linears.0")],
        "radiance": _lin(sd, "radiance_linear"),
        "coarse_feat": [
            _lin(sd, f"additional_radiance_feature_linear.{i}")
            for i in range(coarse_radiance_number)
        ],
        "coarse": [
            _lin(sd, f"additional_radiance_linear.{i}")
            for i in range(coarse_radiance_number)
        ],
    }


def position_mlp_params_from_torch_state(sd: dict, depth: int = 8):
    return {
        "trunk": [_lin(sd, f"positions_linears.{i}") for i in range(depth)],
        "out": _lin(sd, "out_linears"),
    }


def position_direction_mlp_params_from_torch_state(sd: dict, depth: int = 8):
    n_views = 1 + (depth // 2 - 1)
    return {
        "trunk": [_lin(sd, f"positions_linears.{i}") for i in range(depth)],
        "feature": _lin(sd, "feature_linear"),
        "views": [_lin(sd, f"views_linears.{i}") for i in range(n_views)],
        "out": _lin(sd, "final_linear"),
    }


def load_reference_checkpoint(path: str, coarse_radiance_number: int = 3,
                              depth: int = 8):
    """Read a reference .tar checkpoint into (coarse, fine, step, elapsed).

    Requires torch; returns jnp pytrees.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")

    def np_sd(sd):
        return {k: v.detach().cpu().numpy() for k, v in sd.items()}

    coarse = field_params_from_torch_state(
        np_sd(ckpt["network_fn_state_dict"]), coarse_radiance_number, depth)
    fine = None
    if "network_fine_state_dict" in ckpt and ckpt["network_fine_state_dict"]:
        fine = field_params_from_torch_state(
            np_sd(ckpt["network_fine_state_dict"]), coarse_radiance_number,
            depth)
    return coarse, fine, ckpt.get("global_step", 0), ckpt.get("elapsed_time", 0.0)
