"""Unit tests for ibl_nerf_tpu.ops — numerical parity vs torch reference
formulas, plus gradient checks vs finite differences."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as TF

from ibl_nerf_tpu import ops


def t2n(x):
    return x.detach().cpu().numpy()


class TestEmbedding:
    def test_matches_reference_ordering(self, rng):
        x = rng.standard_normal((17, 3)).astype(np.float32)
        out = np.asarray(ops.positional_encoding(jnp.asarray(x), num_freqs=10))
        assert out.shape == (17, 63)

        # reference: [x] + per-freq [sin, cos]
        tx = torch.tensor(x)
        freqs = 2.0 ** torch.linspace(0.0, 9.0, 10)
        parts = [tx]
        for f in freqs:
            parts.append(torch.sin(tx * f))
            parts.append(torch.cos(tx * f))
        ref = torch.cat(parts, -1)
        np.testing.assert_allclose(out, t2n(ref), rtol=1e-5, atol=1e-5)

    def test_dims(self):
        assert ops.embedding_dim(3, 10) == 63
        assert ops.embedding_dim(3, 4) == 27


class TestRays:
    def _ref_get_rays(self, H, W, K, c2w):
        i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32), indexing="xy")
        dirs = np.stack(
            [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1)
        rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], -1)
        rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
        return rays_o, rays_d

    def test_full_image(self, rng):
        H, W = 12, 16
        K = np.array([[20.0, 0, 8.0], [0, 20.0, 6.0], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[:3, :3] = np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(np.float32)
        c2w[:, 3] = [1.0, 2.0, 3.0]
        ro, rd = ops.get_rays_full_image(H, W, jnp.asarray(K), jnp.asarray(c2w))
        ro_ref, rd_ref = self._ref_get_rays(H, W, K, c2w)
        np.testing.assert_allclose(np.asarray(ro), ro_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rd), rd_ref, atol=1e-5)

    def test_pixels_consistent_with_full(self, rng):
        H, W = 10, 14
        K = np.array([[25.0, 0, 7.0], [0, 25.0, 5.0], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)[:3]
        _, rd_full = ops.get_rays_full_image(H, W, jnp.asarray(K), jnp.asarray(c2w))
        uv = jnp.asarray([[3.0, 4.0], [0.0, 0.0], [13.0, 9.0]])
        _, rd_few = ops.get_rays_for_pixels(uv, jnp.asarray(K), jnp.asarray(c2w))
        np.testing.assert_allclose(np.asarray(rd_few[0]), np.asarray(rd_full[4, 3]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rd_few[2]), np.asarray(rd_full[9, 13]), atol=1e-6)

    def test_neighbor_coords(self):
        uv = jnp.asarray([[5, 5]])
        n = np.asarray(ops.neighbor_coords(uv))
        assert n.shape == (1, 8, 2)
        assert {tuple(p) for p in n[0]} == {
            (4, 4), (4, 5), (4, 6), (5, 4), (5, 6), (6, 4), (6, 5), (6, 6)}


class TestCompositing:
    def _torch_weights(self, sigma_raw, z_vals, rays_d):
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = torch.cat([dists, torch.tensor([1e10]).expand(dists[..., :1].shape)], -1)
        dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
        alpha = 1.0 - torch.exp(-TF.relu(sigma_raw) * dists)
        w = alpha * torch.cumprod(
            torch.cat([torch.ones((alpha.shape[0], 1)), 1.0 - alpha + 1e-10], -1), -1
        )[:, :-1]
        return alpha, w

    def test_weights_parity(self, rng):
        B, S = 7, 64
        sigma = rng.standard_normal((B, S)).astype(np.float32) * 2
        z = np.sort(rng.uniform(1.0, 8.0, (B, S)).astype(np.float32), -1)
        rd = rng.standard_normal((B, 3)).astype(np.float32)

        dists = ops.dists_from_z_vals(jnp.asarray(z), jnp.asarray(rd))
        alpha = ops.alpha_from_sigma(jnp.asarray(sigma), dists)
        w = ops.weights_from_alpha(alpha)

        a_ref, w_ref = self._torch_weights(
            torch.tensor(sigma), torch.tensor(z), torch.tensor(rd))
        np.testing.assert_allclose(np.asarray(alpha), t2n(a_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), t2n(w_ref), atol=1e-5)

    def test_accumulate_and_maps(self, rng):
        B, S, C = 5, 32, 3
        w = rng.uniform(0, 0.05, (B, S)).astype(np.float32)
        v = rng.uniform(0, 1, (B, S, C)).astype(np.float32)
        z = np.sort(rng.uniform(1, 5, (B, S)).astype(np.float32), -1)
        acc = ops.accumulate(jnp.asarray(w), jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(acc), (w[..., None] * v).sum(1), rtol=1e-5)

        depth, disp, accm = ops.composite_depth_disp_acc(jnp.asarray(w), jnp.asarray(z))
        d_ref = (w * z).sum(-1)
        np.testing.assert_allclose(np.asarray(depth), d_ref, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(disp), 1.0 / np.maximum(1e-10, d_ref / w.sum(-1)), rtol=1e-4)

    def test_grad_finite(self, rng):
        B, S = 3, 16
        sigma = rng.standard_normal((B, S)).astype(np.float32)
        z = np.sort(rng.uniform(1, 4, (B, S)).astype(np.float32), -1)
        rd = rng.standard_normal((B, 3)).astype(np.float32)

        def f(s):
            dists = ops.dists_from_z_vals(jnp.asarray(z), jnp.asarray(rd))
            w = ops.weights_from_alpha(ops.alpha_from_sigma(s, dists))
            return jnp.sum(w * jnp.asarray(z))

        g = jax.grad(f)(jnp.asarray(sigma))
        assert np.all(np.isfinite(np.asarray(g)))
        # finite differences on a few entries
        eps = 1e-3
        f0 = float(f(jnp.asarray(sigma)))
        for (i, j) in [(0, 0), (1, 5), (2, 15)]:
            sp = sigma.copy(); sp[i, j] += eps
            fd = (float(f(jnp.asarray(sp))) - f0) / eps
            np.testing.assert_allclose(np.asarray(g)[i, j], fd, atol=2e-2)


class TestSamplePDF:
    def _ref_sample_pdf(self, bins, weights, N_samples, u):
        """Torch port of reference sample_pdf with injected u."""
        weights = weights + 1e-5
        pdf = weights / torch.sum(weights, -1, keepdim=True)
        cdf = torch.cumsum(pdf, -1)
        cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
        u = u.contiguous()
        inds = torch.searchsorted(cdf, u, right=True)
        below = torch.max(torch.zeros_like(inds - 1), inds - 1)
        above = torch.min((cdf.shape[-1] - 1) * torch.ones_like(inds), inds)
        inds_g = torch.stack([below, above], -1)
        matched_shape = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
        cdf_g = torch.gather(cdf.unsqueeze(1).expand(matched_shape), 2, inds_g)
        bins_g = torch.gather(bins.unsqueeze(1).expand(matched_shape), 2, inds_g)
        denom = cdf_g[..., 1] - cdf_g[..., 0]
        denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
        t = (u - cdf_g[..., 0]) / denom
        return bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])

    def test_det_parity(self, rng):
        B, M, N = 9, 63, 128
        bins = np.sort(rng.uniform(1, 8, (B, M)).astype(np.float32), -1)
        w = rng.uniform(0, 1, (B, M - 1)).astype(np.float32)
        out = ops.sample_pdf(None, jnp.asarray(bins), jnp.asarray(w), N, det=True)

        u = torch.linspace(0, 1, N).expand(B, N)
        ref = self._ref_sample_pdf(torch.tensor(bins), torch.tensor(w), N, u)
        np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=1e-4)

    def test_stochastic_in_range(self, rng):
        B, M, N = 4, 63, 32
        bins = np.sort(rng.uniform(2, 6, (B, M)).astype(np.float32), -1)
        w = rng.uniform(0, 1, (B, M - 1)).astype(np.float32)
        out = np.asarray(ops.sample_pdf(jax.random.key(0), jnp.asarray(bins),
                                        jnp.asarray(w), N, det=False))
        assert out.min() >= bins.min() - 1e-4 and out.max() <= bins.max() + 1e-4

    def test_stratified_z(self):
        near = jnp.full((5, 1), 2.0)
        far = jnp.full((5, 1), 6.0)
        z = np.asarray(ops.sampling.stratified_z_vals(None, near, far, 64,
                                                      perturb=False))
        np.testing.assert_allclose(z[:, 0], 2.0, atol=1e-6)
        np.testing.assert_allclose(z[:, -1], 6.0, atol=1e-6)
        zr = np.asarray(ops.sampling.stratified_z_vals(
            jax.random.key(1), near, far, 64, perturb=True))
        assert (np.diff(zr, axis=-1) > 0).all()
        assert (zr >= 2.0 - 1e-5).all() and (zr <= 6.0 + 1e-5).all()


class TestTexture:
    def test_grid_sample_parity(self, rng):
        H, W, C = 32, 32, 3
        tex = rng.uniform(0, 1, (H, W, C)).astype(np.float32)
        uv = rng.uniform(-1, 1, (50, 2)).astype(np.float32)
        out = ops.grid_sample_2d(jnp.asarray(tex), jnp.asarray(uv))

        t_tex = torch.tensor(tex).permute(2, 0, 1)[None]  # (1,C,H,W)
        t_grid = torch.tensor(uv)[None, :, None, :]       # (1,N,1,2)
        ref = TF.grid_sample(t_tex, t_grid, align_corners=True)
        ref = ref[0, :, :, 0].T  # (N,C)
        np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=1e-5)

    def test_mip_interp_parity(self, rng):
        B, L, C = 40, 4, 3
        stack = rng.uniform(0, 1, (B, L, C)).astype(np.float32)
        lv = rng.uniform(0, 1, (B,)).astype(np.float32)
        out = ops.mip_interp(jnp.asarray(stack), jnp.asarray(lv))

        t = torch.tensor(stack)
        level = torch.tensor(lv) * (L - 1)
        i1 = torch.clip(level.long(), 0, L - 1)
        i2 = torch.clip(i1 + 1, 0, L - 1)
        rem = (level - i1)[..., None]
        ref = (1 - rem) * t[torch.arange(B), i1] + rem * t[torch.arange(B), i2]
        np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=1e-6)


class TestShading:
    def test_fresnel_parity(self, rng):
        N = 30
        cos = rng.uniform(0, 1, (N,)).astype(np.float32)
        f0 = rng.uniform(0, 1, (N, 3)).astype(np.float32)
        rough = rng.uniform(0, 1, (N,)).astype(np.float32)
        out = ops.fresnel_schlick_roughness(
            jnp.asarray(cos), jnp.asarray(f0), jnp.asarray(rough))

        tc, tf0, tr = torch.tensor(cos)[..., None], torch.tensor(f0), torch.tensor(rough)[..., None]
        f1 = torch.maximum(1.0 - tr, tf0) - tf0
        ref = tf0 + f1 * torch.pow(torch.clip(1.0 - tc, 0, 1), 5.0)
        np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=1e-6)

    def test_reflect(self):
        d = jnp.asarray([[0.0, -1.0, 0.0]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        np.testing.assert_allclose(np.asarray(ops.reflect(d, n)), [[0, 1, 0]], atol=1e-6)

    def test_microfacet_parity_vs_reference(self, rng):
        """Full GGX microfacet BRDF vs the reference Microfacet class."""
        import sys

        sys.path.insert(0, "/root/reference/src")
        from nerf_models.microfacet import Microfacet

        N, L = 6, 10
        p2l = rng.standard_normal((N, L, 3)).astype(np.float32)
        p2c = rng.standard_normal((N, 3)).astype(np.float32)
        nrm = rng.standard_normal((N, 3)).astype(np.float32)
        alb = rng.uniform(0, 1, (N, 3)).astype(np.float32)
        rgh = rng.uniform(0.1, 1, (N, 1)).astype(np.float32)
        g, df, ldn = ops.microfacet_brdf(
            jnp.asarray(p2l), jnp.asarray(p2c), jnp.asarray(nrm),
            jnp.asarray(alb), jnp.asarray(rgh))
        assert g.shape == (N, L, 3) and df.shape == (N, L, 3) and ldn.shape == (N, L, 1)

        ref = Microfacet()
        with torch.no_grad():
            rg, rdf, rldn = ref(torch.tensor(p2l), torch.tensor(p2c),
                                torch.tensor(nrm), torch.tensor(alb),
                                torch.tensor(rgh))
        np.testing.assert_allclose(np.asarray(g), t2n(rg), atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(df), t2n(rdf), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ldn), t2n(rldn), atol=1e-5)


class TestGeometry:
    def test_tbn_orthogonal(self, rng):
        n = rng.standard_normal((20, 3)).astype(np.float32)
        n = n / np.linalg.norm(n, axis=-1, keepdims=True)
        b, t = ops.get_tbn(jnp.asarray(n))
        b, t = np.asarray(b), np.asarray(t)
        # binormal orthogonal to normal; tangent orthogonal to both
        np.testing.assert_allclose((b * n).sum(-1), 0, atol=1e-5)
        np.testing.assert_allclose((t * b).sum(-1), 0, atol=1e-5)

    def test_hemisphere_samples(self):
        d = ops.hemisphere_samples(16)
        assert d.shape == (256, 3)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        assert (d[:, 2] >= -1e-6).all()  # upper hemisphere about +z

    def test_depth_to_normal_flat_plane(self):
        # camera at origin looking down -z at plane z=-2 -> normals +z
        H, W = 8, 8
        f = 10.0
        K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
        c2w = jnp.eye(4)[:3]
        i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32), indexing="xy")
        dirs = np.stack([(i - W / 2) / f, -(j - H / 2) / f, -np.ones_like(i)], -1)
        dirs_n = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        # depth along the normalized ray to reach plane z = -2
        depth = 2.0 / (-dirs_n[..., 2])
        nrm = np.asarray(ops.depth_to_normal_image_space(
            jnp.asarray(depth), c2w, K))
        inner = nrm[2:-2, 2:-2]
        np.testing.assert_allclose(inner[..., 2], 1.0, atol=1e-3)

    def test_pose_spherical_shape(self):
        p = ops.pose_spherical(30.0, -45.0, 4.0)
        assert p.shape == (4, 4)
        # rotation block orthonormal
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestColor:
    def test_roundtrip_srgb(self, rng):
        x = rng.uniform(0, 1, (64,)).astype(np.float32)
        y = ops.srgb_to_linear_np(ops.linear_to_srgb_np(x))
        np.testing.assert_allclose(y, x, atol=1e-5)

    def test_tonemap(self):
        np.testing.assert_allclose(
            np.asarray(ops.tonemap_reinhard(jnp.asarray([1.0]))), [0.5])
