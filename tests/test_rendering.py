"""Tests for volume rendering against a torch re-derivation of the
reference compositor (volume_rendering_utils.py:6-51)."""

import numpy as np
import torch
import jax.numpy as jnp

from nvsr_tpu.ops.rendering import cumprod_exclusive, mse2psnr, volume_render


def _torch_volume_render(radiance_field, z_vals, rd, white_background=False,
                         mip=False):
    radiance_field = torch.from_numpy(radiance_field)
    z_vals = torch.from_numpy(z_vals)
    rd = torch.from_numpy(rd)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    if not mip:
        dists = torch.cat(
            [dists, torch.full_like(z_vals[..., :1], 1e10)], dim=-1)
    dists = dists * rd[..., None, :].norm(p=2, dim=-1)
    rgb = torch.sigmoid(radiance_field[..., :3])
    sigma = torch.relu(radiance_field[..., 3])
    alpha = 1.0 - torch.exp(-sigma * dists)
    t = torch.cumprod(1.0 - alpha + 1e-10, -1)
    t = torch.roll(t, 1, -1)
    t[..., 0] = 1.0
    weights = alpha * t
    rgb_map = (weights[..., None] * rgb).sum(-2)
    if mip:
        z_vals = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
    depth = (weights * z_vals).sum(-1)
    acc = weights.sum(-1)
    disp = 1.0 / torch.clamp(depth / acc, min=1e-10)
    if white_background:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return (rgb_map.numpy(), disp.numpy(), acc.numpy(), weights.numpy(),
            depth.numpy())


def test_cumprod_exclusive(rng):
    x = rng.random((4, 7)).astype(np.float32) + 0.1
    ours = np.asarray(cumprod_exclusive(jnp.asarray(x)))
    ref = np.concatenate([np.ones((4, 1), np.float32),
                          np.cumprod(x, -1)[:, :-1]], -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_volume_render_matches_torch(rng):
    R, S = 13, 17
    rf = rng.standard_normal((R, S, 4)).astype(np.float32)
    z = np.sort(rng.random((R, S)).astype(np.float32) * 4 + 2, -1)
    rd = rng.standard_normal((R, 3)).astype(np.float32)
    out = volume_render(jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd))
    ref = _torch_volume_render(rf, z, rd)
    np.testing.assert_allclose(np.asarray(out.rgb), ref[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.disp), ref[1], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc), ref[2], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), ref[3], rtol=1e-4,
                               atol=1e-6)


def test_volume_render_white_background(rng):
    R, S = 5, 9
    rf = rng.standard_normal((R, S, 4)).astype(np.float32)
    z = np.sort(rng.random((R, S)).astype(np.float32) + 2, -1)
    rd = rng.standard_normal((R, 3)).astype(np.float32)
    out = volume_render(jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd),
                        white_background=True)
    ref = _torch_volume_render(rf, z, rd, white_background=True)
    np.testing.assert_allclose(np.asarray(out.rgb), ref[0], rtol=1e-4, atol=1e-5)


def test_volume_render_mip_midpoints(rng):
    R, S = 6, 8
    rf = rng.standard_normal((R, S, 4)).astype(np.float32)
    z = np.sort(rng.random((R, S + 1)).astype(np.float32) + 2, -1)  # edges
    rd = rng.standard_normal((R, 3)).astype(np.float32)
    out = volume_render(jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd),
                        mip=True)
    ref = _torch_volume_render(rf, z, rd, mip=True)
    np.testing.assert_allclose(np.asarray(out.rgb), ref[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), ref[4], rtol=1e-4,
                               atol=1e-5)


def test_mse2psnr():
    np.testing.assert_allclose(float(mse2psnr(jnp.asarray(0.01))), 20.0,
                               rtol=1e-4)
    np.testing.assert_allclose(float(mse2psnr(jnp.asarray(0.0))), 50.0,
                               rtol=1e-5)


def _ssim_oracle(p, t, data_range=1.0, size=11, sigma=1.5):
    """Direct Wang-et-al. definition: explicit sliding windows, one
    gaussian-weighted moment set per valid position per channel."""
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x * x) / (2 * sigma * sigma))
    w = np.outer(g, g)
    w /= w.sum()
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    H, W, C = p.shape
    vals = []
    for c in range(C):
        for i in range(H - size + 1):
            for j in range(W - size + 1):
                a = p[i:i + size, j:j + size, c]
                b = t[i:i + size, j:j + size, c]
                mu_a, mu_b = (w * a).sum(), (w * b).sum()
                va = (w * a * a).sum() - mu_a ** 2
                vb = (w * b * b).sum() - mu_b ** 2
                cov = (w * a * b).sum() - mu_a * mu_b
                vals.append(((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                            / ((mu_a ** 2 + mu_b ** 2 + c1)
                               * (va + vb + c2)))
    return float(np.mean(vals))


def test_ssim_matches_windowed_definition(rng):
    from nvsr_tpu.ops.rendering import ssim
    p = rng.random((18, 20, 3)).astype(np.float32)
    t = np.clip(p + 0.05 * rng.standard_normal((18, 20, 3)), 0, 1
                ).astype(np.float32)
    np.testing.assert_allclose(float(ssim(jnp.asarray(p), jnp.asarray(t))),
                               _ssim_oracle(p, t), rtol=1e-5)
    np.testing.assert_allclose(float(ssim(jnp.asarray(p), jnp.asarray(p))),
                               1.0, rtol=1e-6)
