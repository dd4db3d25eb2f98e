"""Plane / image resizing as separable weight-matrix matmuls.

TPU-native replacement for torch.nn.functional.interpolate as used by the
reference for plane up/downsampling (reference nerf_helpers.py:498-505,
models.py:212-221,858-859): bilinear & bicubic, align_corners both ways,
optional antialiasing (used by the image-inconsistency loss,
reference nerf_helpers.py:501-505).

Rather than gather-based interpolation, each resize is expressed as
``out = A_h @ x @ A_w^T`` with sampling matrices built in numpy at trace
time (sizes are static under jit). On TPU the matmuls run on the MXU and
fuse cleanly with surrounding ops; the backward pass is the transposed
matmul, so no scatter is ever generated.

Validated against torch.nn.functional.interpolate in tests/test_resize.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp


def _kernel_linear(x):
    x = np.abs(x)
    return np.maximum(0.0, 1.0 - x)


def _kernel_cubic(x, A: float = -0.75):
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    return np.where(
        x <= 1.0,
        (A + 2.0) * x3 - (A + 3.0) * x2 + 1.0,
        np.where(x < 2.0, A * x3 - 5.0 * A * x2 + 8.0 * A * x - 4.0 * A, 0.0),
    )


_KERNELS = {
    "bilinear": (_kernel_linear, 1.0),
    "linear": (_kernel_linear, 1.0),
    "bicubic": (_kernel_cubic, 2.0),
    "cubic": (_kernel_cubic, 2.0),
}


@lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, mode: str,
                   align_corners: bool, antialias: bool) -> np.ndarray:
    """[out_size, in_size] row-stochastic sampling matrix."""
    kernel, support = _KERNELS[mode]
    if in_size == out_size and not antialias:
        return np.eye(in_size, dtype=np.float32)

    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
        src = np.arange(out_size, dtype=np.float64) * scale
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    if antialias:
        # torch's AA kernels always use the half-pixel center formula;
        # align_corners only changes the scale value
        # (ATen upsample_aa: center = scale * (i + 0.5)).
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5

    filt_scale = max(scale, 1.0) if antialias else 1.0
    sup = support * filt_scale

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        lo = int(np.floor(src[i] - sup)) + 1
        hi = int(np.floor(src[i] + sup)) + 1  # exclusive
        taps = np.arange(lo, hi)
        w = kernel((taps - src[i]) / filt_scale)
        if antialias:
            # torch's AA path restricts the window to valid pixels and
            # renormalizes; out-of-range taps are dropped, not clamped.
            valid = (taps >= 0) & (taps < in_size)
            taps, w = taps[valid], w[valid]
            s = w.sum()
            if s > 0:
                w = w / s
            np.add.at(mat[i], taps, w)
        else:
            # non-AA: out-of-range taps clamp to the border pixel
            # (equivalent to torch's index clamping).
            np.add.at(mat[i], np.clip(taps, 0, in_size - 1), w)
    return mat.astype(np.float32)


@partial(jax.jit, static_argnames=("out_h", "out_w", "mode", "align_corners",
                                   "antialias"))
def resize_2d(x, out_h: int, out_w: int, mode: str = "bilinear",
              align_corners: bool = True, antialias: bool = False):
    """Resize the last two axes of x to (out_h, out_w).

    Args:
      x: [..., H, W].
    Returns:
      [..., out_h, out_w].
    """
    H, W = x.shape[-2], x.shape[-1]
    a_h = jnp.asarray(_resize_matrix(H, out_h, mode, align_corners, antialias),
                      dtype=x.dtype)
    a_w = jnp.asarray(_resize_matrix(W, out_w, mode, align_corners, antialias),
                      dtype=x.dtype)
    y = jnp.einsum("oh,...hw->...ow", a_h, x)
    return jnp.einsum("pw,...ow->...op", a_w, y)


def scale_2d(x, scale_factor: float, mode: str = "bilinear",
             align_corners: bool = True, antialias: bool = False):
    """torch-interpolate-style scale_factor resize (out = floor(in * sf))."""
    H, W = x.shape[-2], x.shape[-1]
    out_h = int(np.floor(H * scale_factor))
    out_w = int(np.floor(W * scale_factor))
    return resize_2d(x, out_h, out_w, mode=mode, align_corners=align_corners,
                     antialias=antialias)


def downsample_plane(plane, ds_factor: int, mode: str = "bilinear",
                     align_corners: bool = True, antialias: bool = False):
    """Downsample a feature plane by an integer factor.

    Matches reference nerf_helpers.py:498-499
    (interpolate(scale_factor=1/ds)).
    """
    return scale_2d(plane, 1.0 / ds_factor, mode=mode,
                    align_corners=align_corners, antialias=antialias)


def upsample_plane(plane, scale_factor: int, mode: str = "bilinear",
                   align_corners: bool = True):
    """Upsample a feature plane (SR residual path, reference models.py:858-859)."""
    return scale_2d(plane, float(scale_factor), mode=mode,
                    align_corners=align_corners)


def avg_downsample_pixels(pixels, ds_factor: int):
    """Average ds_factor x ds_factor pixel patches into single pixels.

    Used by the image-inconsistency training iterations
    (reference train_nerf.py:613-616). `pixels` is [N*ds*ds, 3] laid out
    patch-major (as produced by the patch-aligned ray selection).
    """
    return jnp.mean(pixels.reshape(-1, ds_factor, ds_factor, 3), axis=(1, 2))


def image_inconsistency_loss(sr_image, ds_factor: int, gt_lr=None, gt_hr=None,
                             mode: str = "bilinear", align_corners: bool = True):
    """L1 between antialias-downsampled SR render and the LR ground truth.

    Matches reference nerf_helpers.py:501-505. Images are [..., H, W]
    channel-first (i.e. [1, 3, H, W] in the driver).
    """
    assert (gt_lr is None) != (gt_hr is None)
    target = gt_lr if gt_hr is None else downsample_plane(
        gt_hr, ds_factor, mode=mode, align_corners=align_corners,
        antialias=True)
    pred = downsample_plane(sr_image, ds_factor, mode=mode,
                            align_corners=align_corners, antialias=True)
    return jnp.mean(jnp.abs(target - pred))
