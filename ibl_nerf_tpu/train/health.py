"""Training-health machinery: dead-init rejection + collapse detection.

Background (measured, scripts/init_mortality.py): with the reference's
architecture — ReLU density on a Linear head initialized
U(+-1/sqrt(fan_in)) — roughly 30% of field initializations start with
raw sigma NEGATIVE at every point of the scene volume, in BOTH this
framework and the imported torch reference (33% vs 29.8% over 200
seeds, anchor config). A dead-at-init field is dead forever: ReLU
density is identically 0, so the gradient through density is
identically 0, while the total loss settles into a plausible band (the
radiance heads fit "black"). The reference has no defense against this
(its NaN scans, ibl_nerf_renderer.py:728-730, never fire — the failure
is silent in loss space); its published runs simply drew live seeds.

Two defenses, both beyond-reference:

1. `reject_dead_inits` — at init time, probe raw sigma along actual
   training-view rays; re-draw any dead field from a deterministically
   folded key. Default-on (`--no_init_rejection` restores verbatim
   reference init semantics); a healthy draw is returned unchanged, so
   behavior only differs in runs that were otherwise doomed.

2. `collapse detection` — the train step logs `acc_mean` (mean fine
   compositing weight mass per batch, free: acc_map is already
   computed) and the periodic testset render checks held-out acc
   coverage; both warn loudly and are recorded in metrics.jsonl.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ibl_nerf_tpu.models.field import FieldConfig, apply_field_density, \
    init_field_params
from ibl_nerf_tpu.ops.embedding import positional_encoding

# acc below this, averaged over a train batch or a held-out render, is
# "the field sees (almost) nothing" — a live scene batch sits near 1.0.
ACC_COLLAPSE_THRESHOLD = 0.05


def probe_points_from_scene(scene, n_rays: int = 256, n_samples: int = 32
                            ) -> np.ndarray:
    """Points along training-view rays between near and far — exactly
    the region the renderer queries during training."""
    from ibl_nerf_tpu.ops.rays import get_rays_full_image

    Kmat = jnp.asarray(scene.focal_matrix())
    poses = np.asarray(scene.poses)
    per_pose = max(1, n_rays // len(poses))
    t = np.linspace(float(scene.near), float(scene.far), n_samples,
                    dtype=np.float32)
    rng = np.random.default_rng(0)
    pts = []
    for pose in poses:
        o, d = get_rays_full_image(scene.height, scene.width, Kmat,
                                   jnp.asarray(pose[:3, :4]))
        o = np.asarray(o).reshape(-1, 3)
        d = np.asarray(d).reshape(-1, 3)
        sel = rng.integers(0, o.shape[0], per_pose)
        pts.append(o[sel, None, :] + d[sel, None, :] * t[None, :, None])
    return np.concatenate(pts).reshape(-1, 3).astype(np.float32)


def field_density_stats(params, fcfg: FieldConfig, probe_pts: np.ndarray):
    """(fraction of probe points with raw sigma > 0, max raw sigma)."""
    pe = positional_encoding(jnp.asarray(probe_pts), fcfg.multires)
    raw = apply_field_density(params, pe, fcfg)[..., 0]
    return float(jnp.mean(raw > 0.0)), float(jnp.max(raw))


def reject_dead_inits(key, variables: dict, fcfg: FieldConfig,
                      probe_pts: np.ndarray,
                      fcfg_fine: FieldConfig | None = None,
                      max_retries: int = 16, min_fracpos: float = 0.01,
                      logger=None) -> dict:
    """Re-draw any density field whose initialization is dead or near-dead.

    A field is dead when max raw sigma <= 0 over the probe points: ReLU
    density is 0 everywhere it will ever be queried, and its gradient is
    identically 0, so training can never revive it. It is NEAR-dead when
    fewer than `min_fracpos` of the probe points are positive — measured
    (docs/data/init_mortality*.json) as another ~8-14% of draws, which
    train but to degraded quality (the torch reference's anchor seed 4:
    22.2 dB vs the healthy 27-28 dB band). Re-draws fold the field's
    name and retry index into `key`, so results are deterministic per
    (seed, field). `min_fracpos=0` restores the dead-only gate.
    """
    out = dict(variables)
    for name in ("coarse", "fine"):
        if name not in out:
            continue
        cfg = fcfg_fine if (name == "fine" and fcfg_fine is not None) else fcfg
        fp, mx = field_density_stats(out[name], cfg, probe_pts)
        retry = 0
        while (mx <= 0.0 or fp < min_fracpos) and retry < max_retries:
            retry += 1
            k = jax.random.fold_in(jax.random.fold_in(
                key, ord(name[0])), retry)
            out[name] = init_field_params(k, cfg)
            fp, mx = field_density_stats(out[name], cfg, probe_pts)
        if retry and logger is not None:
            logger.warning(
                "init rejection: %s field density was dead or near-dead "
                "at init (over %d scene probe points) — re-drew %d "
                "time(s); now fracpos=%.3f max=%.3f. (~30%% of "
                "reference-init draws are dead, another ~8-14%% "
                "near-dead; see scripts/init_mortality.py)",
                name, len(probe_pts), retry, fp, mx)
        if (mx <= 0.0 or fp < min_fracpos) and logger is not None:
            logger.error(
                "init rejection: %s field STILL dead/near-dead after %d "
                "retries — training quality will suffer for this field",
                name, max_retries)
    return out


def testset_acc_coverage(results: dict) -> float | None:
    """Mean held-out acc coverage from a render_path result stack."""
    if "acc" not in results:
        return None
    return float(np.mean(np.asarray(results["acc"])))


def check_collapse(acc_mean: float, step: int, logger=None,
                   source: str = "train-batch") -> bool:
    """True (and warns loudly) when acc coverage has cratered."""
    if acc_mean is None or acc_mean >= ACC_COLLAPSE_THRESHOLD:
        return False
    if logger is not None:
        logger.error(
            "COLLAPSE DETECTED at step %d: %s acc coverage %.4f < %.2f "
            "while loss may still look plausible — the density field is "
            "(nearly) empty. If this is early training, the init was "
            "likely dead (run with init rejection enabled, the default); "
            "a mid-training crater indicates optimization collapse.",
            step, source, acc_mean, ACC_COLLAPSE_THRESHOLD)
    return True
