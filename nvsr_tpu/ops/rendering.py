"""Volume rendering: alpha compositing of radiance samples.

Pure-jnp re-derivation of the reference compositor
(reference volume_rendering_utils.py:6-51, nerf_helpers.py:409-430).
Everything fuses under jit into the decoder epilogue.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray      # [R, 3]
    disp: jnp.ndarray     # [R]
    acc: jnp.ndarray      # [R]
    weights: jnp.ndarray  # [R, S]
    depth: jnp.ndarray    # [R]
    # per-sample depths the weights refer to (interval midpoints for
    # mip); consumed by the surface-AABB occupancy estimator (train.py)
    z_vals: jnp.ndarray = None  # [R, S]


def cumprod_exclusive(x):
    """tf.math.cumprod(..., exclusive=True) along the last axis.

    Matches reference nerf_helpers.py:409-430 (cumprod, shift right,
    leading 1).
    """
    cp = jnp.cumprod(x, axis=-1)
    return jnp.concatenate([jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1)


def volume_render(radiance_field, z_vals, ray_directions, *,
                  noise_key=None, radiance_field_noise_std: float = 0.0,
                  white_background: bool = False, mip: bool = False,
                  return_z: bool = False):
    """Composite per-sample (rgb, sigma) into per-ray maps.

    Args:
      radiance_field: [R, S, 4] raw (rgb logits, density logit).
      z_vals: [R, S] (non-mip) or [R, S+1] interval edges (mip).
      ray_directions: [R, 3] unnormalized; their norm scales the sample
        distances (reference volume_rendering_utils.py:27).
      noise_key: PRNG key for density noise (train-time regularizer).

    Matches reference volume_rendering_utils.py:6-51: last interval is
    1e10 (non-mip), weights use exp-transmittance with the +1e-10 alpha
    floor, and mip depths use interval midpoints.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    if not mip:
        dists = jnp.concatenate(
            [dists, jnp.full_like(z_vals[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(ray_directions, axis=-1, keepdims=True)

    rgb = jax.nn.sigmoid(radiance_field[..., :3])
    sigma_logit = radiance_field[..., 3]
    if radiance_field_noise_std > 0.0 and noise_key is not None:
        sigma_logit = sigma_logit + radiance_field_noise_std * jax.random.normal(
            noise_key, sigma_logit.shape, dtype=sigma_logit.dtype)
    sigma = jax.nn.relu(sigma_logit)

    alpha = 1.0 - jnp.exp(-sigma * dists)
    # DEGENERATE rays (zero z span) composite to pure background: these
    # only arise from occupancy tightening's miss rays
    # (ops/occupancy.py::tighten_near_far), whose premise is that no
    # render mass lies along them — zeroing alpha also silences the
    # 1e10 background interval, which would otherwise surface whatever
    # junk density sits at the collapsed sample point
    span = z_vals[..., -1] - z_vals[..., 0]
    alpha = jnp.where(span[..., None] > 0, alpha, 0.0)
    weights = alpha * cumprod_exclusive(1.0 - alpha + 1e-10)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_vals = z_vals
    if mip:
        depth_vals = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
    depth_map = jnp.sum(weights * depth_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map,
                         depth_vals if return_z else None)


def img2mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def mse2psnr(mse):
    # replace an exactly-zero mse (reference nerf_helpers.py:265-269)
    mse = jnp.where(mse == 0, 1e-5, mse)
    return -10.0 * jnp.log10(mse)


def _ssim_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


@functools.partial(jax.jit,
                   static_argnames=("data_range", "window_size", "sigma"))
def ssim(pred, target, data_range: float = 1.0,
         window_size: int = 11, sigma: float = 1.5):
    """Structural similarity (Wang et al. 2004) of two [H, W, C] images.

    The reference code reports only PSNR (train_nerf.py:688-695), but
    the paper it implements (arXiv 2212.04666) reports PSNR/SSIM —
    this is the standard single-scale SSIM those tables use: an 11x11
    Gaussian window (sigma 1.5), K1=0.01 / K2=0.03, 'valid'
    convolution, averaged over channels. Separable depthwise convs so
    XLA maps it onto two small convolutions per moment.
    """
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = _ssim_window(window_size, sigma)

    def blur(img):
        # [H, W, C] -> depthwise separable gaussian, VALID
        x = jnp.moveaxis(img, -1, 0)[:, None]            # [C, 1, H, W]
        kh = win.reshape(1, 1, -1, 1)
        kw = win.reshape(1, 1, 1, -1)
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
        x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
        return x[:, 0]                                   # [C, H', W']

    p = jnp.asarray(pred, jnp.float32)
    t = jnp.asarray(target, jnp.float32)
    mu_p, mu_t = blur(p), blur(t)
    var_p = blur(p * p) - mu_p * mu_p
    var_t = blur(t * t) - mu_t * mu_t
    cov = blur(p * t) - mu_p * mu_t
    num = (2.0 * mu_p * mu_t + c1) * (2.0 * cov + c2)
    den = (mu_p * mu_p + mu_t * mu_t + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)
