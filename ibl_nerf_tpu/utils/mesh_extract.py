"""Density-field mesh extraction.

Parity: /root/reference/src/utils/mesh_utils.py:7-28 (density grid
query + marching cubes -> mesh, behind `--extract_mesh`). PyMCubes /
trimesh are unavailable here; we implement marching *tetrahedra* (each
grid cell split into 6 tets) — same capability, no 256-entry case
tables — with OBJ export. The density grid query is a jitted chunked
sweep of the field on TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ibl_nerf_tpu.models.field import apply_field_density
from ibl_nerf_tpu.ops.embedding import positional_encoding


def query_density_grid(params, fcfg, n: int = 128, radius: float = 1.5,
                       chunk: int = 65536) -> np.ndarray:
    """Evaluate sigma on an n^3 grid in [-radius, radius]^3."""
    t = np.linspace(-radius, radius, n, dtype=np.float32)
    grid = np.stack(np.meshgrid(t, t, t, indexing="ij"), -1).reshape(-1, 3)

    @jax.jit
    def f(pts):
        pe = positional_encoding(pts, fcfg.multires)
        return apply_field_density(params, pe, fcfg)[..., 0]

    out = np.empty((grid.shape[0],), np.float32)
    for i in range(0, grid.shape[0], chunk):
        out[i:i + chunk] = np.asarray(f(jnp.asarray(grid[i:i + chunk])))
    return out.reshape(n, n, n)


# The 6 tetrahedra of a unit cube (vertex indices into the 8 corners).
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
])
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
])


def marching_tetrahedra(values: np.ndarray, iso: float = 50.0,
                        origin=(-1.5, -1.5, -1.5), spacing=None):
    """Extract an iso-surface triangle mesh from a scalar grid.

    Returns (verts (V,3) float32, faces (F,3) int32).
    """
    n = values.shape[0]
    if spacing is None:
        spacing = 3.0 / (n - 1)

    cells = np.stack(np.meshgrid(np.arange(n - 1), np.arange(n - 1),
                                 np.arange(n - 1), indexing="ij"),
                     -1).reshape(-1, 3)
    # corner values (C, 8)
    corner_idx = cells[:, None, :] + _CORNERS[None]
    cv = values[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]
    # keep cells crossing the iso-surface
    crossing = (cv.min(1) < iso) & (cv.max(1) > iso)
    cells, cv, corner_idx = cells[crossing], cv[crossing], corner_idx[crossing]

    verts_list, faces_list = [], []
    v_count = 0
    corner_pos = corner_idx.astype(np.float32) * spacing + np.asarray(
        origin, np.float32)

    for tet in _TETS:
        tv = cv[:, tet]                       # (C, 4)
        tp = corner_pos[:, tet]               # (C, 4, 3)
        inside = tv > iso                     # (C, 4)
        n_in = inside.sum(1)

        for n_target, flip in [(1, False), (3, True)]:
            sel = n_in == n_target
            if not sel.any():
                continue
            tvs, tps, ins = tv[sel], tp[sel], inside[sel]
            if flip:
                ins = ~ins
            # single vertex on one side -> one triangle
            apex = np.argmax(ins, axis=1)
            others = np.array([[j for j in range(4) if j != a] for a in apex])
            ar = np.arange(len(apex))
            va = tvs[ar, apex][:, None]
            pa = tps[ar, apex][:, None]
            vo = np.take_along_axis(tvs, others, 1)
            po = np.take_along_axis(tps, others[..., None].repeat(3, -1), 1)
            t = (iso - va) / np.where(np.abs(vo - va) < 1e-12, 1e-12, vo - va)
            tri = pa + t[..., None] * (po - pa)   # (S, 3, 3)
            verts_list.append(tri.reshape(-1, 3))
            f = np.arange(tri.shape[0] * 3).reshape(-1, 3) + v_count
            faces_list.append(f)
            v_count += tri.shape[0] * 3

        sel = n_in == 2
        if sel.any():
            tvs, tps, ins = tv[sel], tp[sel], inside[sel]
            # two-in/two-out -> quad -> two triangles
            in_idx = np.stack([np.argmax(ins, 1),
                               3 - np.argmax(ins[:, ::-1], 1)], 1)
            out_mask = ~ins
            out_idx = np.stack([np.argmax(out_mask, 1),
                                3 - np.argmax(out_mask[:, ::-1], 1)], 1)
            ar = np.arange(len(tvs))

            def interp(i_a, i_b):
                va = tvs[ar, i_a]
                vb = tvs[ar, i_b]
                pa = tps[ar, i_a]
                pb = tps[ar, i_b]
                t = ((iso - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12,
                                           vb - va))[:, None]
                return pa + t * (pb - pa)

            p00 = interp(in_idx[:, 0], out_idx[:, 0])
            p01 = interp(in_idx[:, 0], out_idx[:, 1])
            p10 = interp(in_idx[:, 1], out_idx[:, 0])
            p11 = interp(in_idx[:, 1], out_idx[:, 1])
            quad_tris = np.concatenate([
                np.stack([p00, p01, p11], 1),
                np.stack([p00, p11, p10], 1),
            ], 0)
            verts_list.append(quad_tris.reshape(-1, 3))
            f = np.arange(quad_tris.shape[0] * 3).reshape(-1, 3) + v_count
            faces_list.append(f)
            v_count += quad_tris.shape[0] * 3

    if not verts_list:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    verts = np.concatenate(verts_list, 0).astype(np.float32)
    faces = np.concatenate(faces_list, 0).astype(np.int32)
    # weld duplicate vertices
    rounded = np.round(verts / (spacing * 1e-4)).astype(np.int64)
    uniq, inv = np.unique(rounded, axis=0, return_inverse=True)
    welded = np.zeros((uniq.shape[0], 3), np.float32)
    welded[inv] = verts
    return welded, inv[faces].astype(np.int32)


def export_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
    return path


def extract_mesh(params, fcfg, path: str, n: int = 128, radius: float = 1.5,
                 iso: float = 50.0):
    grid = query_density_grid(params, fcfg, n, radius)
    verts, faces = marching_tetrahedra(grid, iso, origin=(-radius,) * 3,
                                       spacing=2 * radius / (n - 1))
    return export_obj(path, verts, faces)
