"""Positional encodings (pure jnp, jit-safe).

  * Classic sin/cos positional encoding
    (reference: nerf_helpers.py:552-575).
  * Mip-NeRF integrated positional encoding over conical-frustum
    Gaussians (reference: mip.py:9-43,154-199).
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x, num_encoding_functions: int = 6,
                        include_input: bool = True):
    """[..., D] -> [..., D*(include + 2*num_fn)].

    Frequency-major interleaving: for each i, append sin(2^i x) then
    cos(2^i x) (matching reference nerf_helpers.py:569-575).
    """
    encoding = [x] if include_input else []
    for i in range(num_encoding_functions):
        encoding.append(jnp.sin((2.0 ** i) * x))
        encoding.append(jnp.cos((2.0 ** i) * x))
    if len(encoding) == 1:
        return encoding[0]
    return jnp.concatenate(encoding, axis=-1)


# ---------------------------------------------------------------------------
# Mip-NeRF: conical frustums -> Gaussians -> integrated PE
# ---------------------------------------------------------------------------

def lift_gaussian(d, t_mean, t_var, r_var):
    """Lift a Gaussian along a ray to 3D diagonal covariance.

    Matches reference mip.py:32-43.
    """
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d ** 2, axis=-1, keepdims=True))
    d_outer_diag = d ** 2
    null_outer_diag = 1.0 - d_outer_diag / d_mag_sq
    t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
    xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
    return mean, t_cov_diag + xy_cov_diag


def conical_frustum_to_gaussian(d, t0, t1, base_radius):
    """Approximate a conical frustum by a Gaussian (reference mip.py:21-29)."""
    mu = (t0 + t1) / 2.0
    hw = (t1 - t0) / 2.0
    t_mean = mu + (2.0 * mu * hw ** 2) / (3.0 * mu ** 2 + hw ** 2)
    t_var = (hw ** 2) / 3.0 - (4.0 / 15.0) * (
        (hw ** 4 * (12.0 * mu ** 2 - hw ** 2)) / (3.0 * mu ** 2 + hw ** 2) ** 2)
    r_var = base_radius ** 2 * (
        (mu ** 2) / 4.0 + (5.0 / 12.0) * hw ** 2
        - (4.0 / 15.0) * (hw ** 4) / (3.0 * mu ** 2 + hw ** 2))
    return lift_gaussian(d, t_mean, t_var, r_var)


def cast_rays(t_vals, origins, directions, radii):
    """Cast conical frustums between consecutive t values.

    Args:
      t_vals: [..., S+1]; origins/directions: [..., 3]; radii: scalar.
    Returns:
      (means [..., S, 3], cov_diags [..., S, 3]).
    Matches reference mip.py:9-18.
    """
    t0 = t_vals[..., :-1]
    t1 = t_vals[..., 1:]
    means, covs = conical_frustum_to_gaussian(directions, t0, t1, radii)
    means = means + origins[..., None, :]
    return means, covs


def expected_sin(x, x_var):
    """E[sin(z)], z ~ N(x, x_var) (reference mip.py:193-199)."""
    return jnp.exp(-0.5 * x_var) * jnp.sin(x)


def integrated_positional_encoding(means_covs, min_deg: int = 0,
                                   max_deg: int = 16):
    """IPE of a diagonal Gaussian (reference mip.py:170-191).

    Args:
      means_covs: tuple (x [..., 3], x_cov_diag [..., 3]).
    Returns:
      [..., 3 * 2 * (max_deg - min_deg)] encoding.
    """
    x, x_cov_diag = means_covs
    scales = jnp.array([2 ** i for i in range(min_deg, max_deg)],
                       dtype=x.dtype)
    shape = list(x.shape[:-1]) + [-1]
    y = jnp.reshape(x[..., None, :] * scales[:, None], shape)
    y_var = jnp.reshape(x_cov_diag[..., None, :] * scales[:, None] ** 2, shape)
    return expected_sin(
        jnp.concatenate([y, y + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([y_var, y_var], axis=-1))


def make_ipe_encoder(multires: int = 10):
    """IPE encoder with the reference's constructor convention.

    `multires` maps to max_deg = multires - 1 and output dim
    3*2*(multires-1) (reference mip.py:154-167).
    """
    max_deg = multires - 1

    def encode(means_covs):
        return integrated_positional_encoding(means_covs, min_deg=0,
                                              max_deg=max_deg)
    encode.out_dims = 3 * 2 * max_deg
    return encode
