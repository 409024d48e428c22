"""Dead-init mortality study: how often does a freshly initialized
IBL-NeRF field start with raw sigma < 0 over the whole scene volume?

Context (VERDICT r3 weak #1): the anchor seed-0 collapse traced to the
FINE field being dead at initialization — raw sigma negative at every
point between near and far, so ReLU density is identically zero, the
density gradient is identically zero, and the field can never learn
geometry. Loss stays in a plausible band (the model fits "black").

This measures P(dead init) for
  - our init (models/field.py init_field_params — torch-default
    U(+-1/sqrt(fan_in)) on weights and biases), and
  - the actual torch reference init (nerf_models/ibl_nerf.py IBLNeRF(),
    state-dict-ported into our apply via utils/port.py, the
    parity-tested path),
over --n_seeds seeds each, probing raw sigma at points sampled along
train-view rays of the anchor scene. A comparable rate on both sides
shows the basin is intrinsic to the reference's architecture+init, not
an artifact of our port.

    env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo:/root/repo/tests \
        JAX_PLATFORMS=cpu python scripts/init_mortality.py --n_seeds 200
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from reference_anchor import build_scene, load_scenes, D, W_NET, K, NS


def probe_points(scene, n_rays=256):
    """Points along train-view rays between near and far — the exact
    region the renderer ever queries."""
    import jax.numpy as jnp

    from ibl_nerf_tpu.ops.rays import get_rays_full_image

    Kmat = jnp.asarray(scene.focal_matrix())
    pts = []
    rng = np.random.default_rng(0)
    t = np.linspace(float(scene.near), float(scene.far), NS)
    for pose in np.asarray(scene.poses):
        o, d = get_rays_full_image(scene.height, scene.width, Kmat,
                                   jnp.asarray(pose[:3, :4]))
        o = np.asarray(o).reshape(-1, 3)
        d = np.asarray(d).reshape(-1, 3)
        sel = rng.integers(0, o.shape[0], n_rays // 8)
        pts.append(o[sel, None, :] + d[sel, None, :] * t[None, :, None])
    return np.concatenate(pts).reshape(-1, 3)


def main():
    ap = argparse.ArgumentParser("init_mortality")
    ap.add_argument("--scene", default="/tmp/anchor_scene_64")
    ap.add_argument("--n_seeds", type=int, default=200)
    ap.add_argument("--depth", type=int, default=D,
                    help="field depth (default: anchor config)")
    ap.add_argument("--width", type=int, default=W_NET)
    ap.add_argument("--out", default="/tmp/init_mortality.json")
    ap.add_argument("--post_rejection", action="store_true",
                    help="also measure the rates AFTER train/health.py's "
                         "default init-rejection gate (expected: 0%% "
                         "dead+near-dead, healthy draws bit-untouched)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ibl_nerf_tpu.models.field import (
        FieldConfig, apply_field_density, init_field_params)
    from ibl_nerf_tpu.ops.embedding import positional_encoding

    root = build_scene(args.scene)
    train_scene, _ = load_scenes(root)
    pts = probe_points(train_scene)
    fcfg = FieldConfig(depth=args.depth, width=args.width,
                       coarse_radiance_number=K)
    pe = jnp.asarray(positional_encoding(jnp.asarray(pts), fcfg.multires))

    density = jax.jit(lambda p: apply_field_density(p, pe, fcfg)[..., 0])

    def stats(params):
        raw = np.asarray(density(params))
        return float((raw > 0).mean()), float(raw.max())

    # ---- ours ----------------------------------------------------------
    ours = []
    for seed in range(args.n_seeds):
        keys = jax.random.split(jax.random.key(seed), 16)
        for net, k in (("coarse", keys[0]), ("fine", keys[1])):
            fp, mx = stats(init_field_params(k, fcfg))
            ours.append({"seed": seed, "net": net, "fracpos": fp, "max": mx})

    # ---- ours, after the default rejection gate ------------------------
    post = []
    if args.post_rejection:
        import jax as _jax

        from ibl_nerf_tpu.train import health

        untouched = changed = 0
        for seed in range(args.n_seeds):
            keys = jax.random.split(jax.random.key(seed), 16)
            variables = {"coarse": init_field_params(keys[0], fcfg),
                         "fine": init_field_params(keys[1], fcfg)}
            pre = {n: stats(variables[n]) for n in variables}
            fixed = health.reject_dead_inits(
                _jax.random.fold_in(jax.random.key(seed), 0x5EED),
                variables, fcfg, np.asarray(pts, np.float32))
            for net in ("coarse", "fine"):
                fp, mx = stats(fixed[net])
                post.append({"seed": seed, "net": net, "fracpos": fp,
                             "max": mx})
                same = all(np.array_equal(a, b) for a, b in zip(
                    jax.tree_util.tree_leaves(variables[net]),
                    jax.tree_util.tree_leaves(fixed[net])))
                was_healthy = (pre[net][1] > 0.0 and pre[net][0] >= 0.01)
                if was_healthy:
                    untouched += int(same)
                    changed += int(not same)
        print(f"post-rejection: healthy draws untouched {untouched}, "
              f"healthy draws changed {changed} (must be 0)")

    # ---- torch reference -----------------------------------------------
    if "torchvision" not in sys.modules:
        _tv = types.ModuleType("torchvision")
        _tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = _tv
        sys.modules["torchvision.transforms"] = _tv.transforms
    sys.path.insert(0, "/root/reference/src")
    import torch

    from nerf_models.ibl_nerf import IBLNeRF
    from ibl_nerf_tpu.utils.port import field_params_from_torch_state

    ref = []
    for seed in range(args.n_seeds):
        torch.manual_seed(seed)
        for net in ("coarse", "fine"):
            m = IBLNeRF(D=args.depth, W=args.width, input_ch=63,
                    input_ch_views=27,
                        skips=[4], coarse_radiance_number=K,
                        is_color_independent_to_direction=False)
            sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
            params = field_params_from_torch_state(sd, K, args.depth)
            fp, mx = stats(params)
            ref.append({"seed": seed, "net": net, "fracpos": fp, "max": mx})

    def summarize(rows, tag):
        dead = [r for r in rows if r["max"] <= 0.0]
        near_dead = [r for r in rows if r["fracpos"] < 0.01]
        fine_dead = [r for r in dead if r["net"] == "fine"]
        print(f"{tag}: {len(rows)} field inits over {args.n_seeds} seeds")
        print(f"  dead (max raw sigma <= 0):   {len(dead)} "
              f"({100 * len(dead) / len(rows):.1f}%)  "
              f"seeds {[r['seed'] for r in dead][:12]}")
        print(f"  near-dead (<1% positive):    {len(near_dead)} "
              f"({100 * len(near_dead) / len(rows):.1f}%)")
        return {"n": len(rows), "dead": len(dead),
                "dead_seeds": [(r["seed"], r["net"]) for r in dead],
                "near_dead": len(near_dead),
                "fracpos_mean": float(np.mean([r["fracpos"] for r in rows]))}

    report = {"ours": summarize(ours, "ours"),
              "reference": summarize(ref, "torch reference")}
    if post:
        report["ours_post_rejection"] = summarize(
            post, "ours AFTER default rejection gate")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
