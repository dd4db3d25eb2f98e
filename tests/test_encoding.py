"""Tests for positional / integrated positional encodings."""

import numpy as np
import torch
import jax.numpy as jnp

from nvsr_tpu.ops.encoding import (
    cast_rays,
    integrated_positional_encoding,
    make_ipe_encoder,
    positional_encoding,
)


def _torch_pe(x, n, include_input=True):
    x = torch.from_numpy(x)
    enc = [x] if include_input else []
    for i in range(n):
        for fn in (torch.sin, torch.cos):
            enc.append(fn(2.0 ** i * x))
    return torch.cat(enc, -1).numpy()


def test_positional_encoding_matches_reference_order(rng):
    x = rng.standard_normal((10, 3)).astype(np.float32)
    for include in (True, False):
        ours = np.asarray(positional_encoding(jnp.asarray(x), 6,
                                              include_input=include))
        ref = _torch_pe(x, 6, include)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def _torch_ipe(means, covs, max_deg):
    """Torch re-derivation of reference mip.py:170-199."""
    x = torch.from_numpy(means)
    x_cov = torch.from_numpy(covs)
    scales = torch.tensor([2.0 ** i for i in range(0, max_deg)])
    shape = list(x.shape[:-1]) + [-1]
    y = torch.reshape(x[..., None, :] * scales[:, None], shape)
    y_var = torch.reshape(x_cov[..., None, :] * scales[:, None] ** 2, shape)
    xx = torch.cat([y, y + 0.5 * np.pi], -1)
    vv = torch.cat([y_var] * 2, -1)
    return (torch.exp(-0.5 * vv) * torch.sin(xx)).numpy()


def test_ipe_matches_torch(rng):
    means = rng.standard_normal((5, 7, 3)).astype(np.float32)
    covs = rng.random((5, 7, 3)).astype(np.float32) * 0.1
    ours = np.asarray(integrated_positional_encoding(
        (jnp.asarray(means), jnp.asarray(covs)), min_deg=0, max_deg=9))
    ref = _torch_ipe(means, covs, 9)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ipe_encoder_dims():
    enc = make_ipe_encoder(multires=10)
    assert enc.out_dims == 3 * 2 * 9
    out = enc((jnp.zeros((4, 3)), jnp.ones((4, 3))))
    assert out.shape == (4, enc.out_dims)


def _torch_cast_rays(t_vals, origins, dirs, radii):
    """Torch re-derivation of reference mip.py:9-43."""
    t_vals = torch.from_numpy(t_vals)
    origins = torch.from_numpy(origins)
    d = torch.from_numpy(dirs)
    t0, t1 = t_vals[..., :-1], t_vals[..., 1:]
    mu = (t0 + t1) / 2
    hw = (t1 - t0) / 2
    t_mean = mu + (2 * mu * hw ** 2) / (3 * mu ** 2 + hw ** 2)
    t_var = (hw ** 2) / 3 - (4 / 15) * ((hw ** 4 * (12 * mu ** 2 - hw ** 2)) /
                                        (3 * mu ** 2 + hw ** 2) ** 2)
    r_var = radii ** 2 * ((mu ** 2) / 4 + (5 / 12) * hw ** 2 - 4 / 15 *
                          (hw ** 4) / (3 * mu ** 2 + hw ** 2))
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = torch.clamp(torch.sum(d ** 2, -1, keepdim=True), min=1e-10)
    d_outer = d ** 2
    null_outer = 1 - d_outer / d_mag_sq
    cov = (t_var[..., None] * d_outer[..., None, :]
           + r_var[..., None] * null_outer[..., None, :])
    return (mean + origins[..., None, :]).numpy(), cov.numpy()


def test_cast_rays_matches_torch(rng):
    t_vals = np.sort(rng.random((6, 9)).astype(np.float32) * 4 + 2, -1)
    ro = rng.standard_normal((6, 3)).astype(np.float32)
    rd = rng.standard_normal((6, 3)).astype(np.float32)
    radii = 0.001
    means, covs = cast_rays(jnp.asarray(t_vals), jnp.asarray(ro),
                            jnp.asarray(rd), radii)
    ref_means, ref_covs = _torch_cast_rays(t_vals, ro, rd, radii)
    np.testing.assert_allclose(np.asarray(means), ref_means, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(covs), ref_covs, rtol=1e-4,
                               atol=1e-7)
