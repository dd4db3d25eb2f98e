"""Golden tests for resize ops against torch.nn.functional.interpolate."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from nvsr_tpu.ops.resize import (
    downsample_plane,
    image_inconsistency_loss,
    resize_2d,
    upsample_plane,
)


def _torch_interp(x, out_hw, mode, align_corners, antialias=False):
    t = torch.from_numpy(x)
    return torch.nn.functional.interpolate(
        t, size=out_hw, mode=mode, align_corners=align_corners,
        antialias=antialias).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("size", [(16, 16, 37, 41), (8, 8, 64, 64)])
def test_resize_matches_torch(rng, mode, align_corners, size):
    in_h, in_w, out_h, out_w = size
    x = rng.standard_normal((1, 3, in_h, in_w)).astype(np.float32)
    ours = np.asarray(resize_2d(jnp.asarray(x), out_h, out_w, mode=mode,
                                align_corners=align_corners))
    ref = _torch_interp(x, (out_h, out_w), mode, align_corners)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_downsample_matches_torch(rng, mode, align_corners):
    x = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
    ours = np.asarray(downsample_plane(jnp.asarray(x), 4, mode=mode,
                                       align_corners=align_corners))
    ref = _torch_interp(x, (16, 16), mode, align_corners)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_antialias_downsample_matches_torch(rng, align_corners):
    x = rng.standard_normal((1, 3, 48, 48)).astype(np.float32)
    ours = np.asarray(downsample_plane(jnp.asarray(x), 4, mode="bilinear",
                                       align_corners=align_corners,
                                       antialias=True))
    ref = _torch_interp(x, (12, 12), "bilinear", align_corners, antialias=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)


def test_upsample_matches_torch(rng):
    x = rng.standard_normal((1, 48, 25, 25)).astype(np.float32)
    ours = np.asarray(upsample_plane(jnp.asarray(x), 4, mode="bilinear",
                                     align_corners=True))
    ref = _torch_interp(x, (100, 100), "bilinear", True)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)


def test_image_inconsistency_loss_matches_torch(rng):
    """Full parity with reference calc_im_inconsistency_loss semantics."""
    hr = rng.random((1, 3, 32, 32)).astype(np.float32)
    sr = rng.random((1, 3, 32, 32)).astype(np.float32)
    ds = 4
    ours = float(image_inconsistency_loss(jnp.asarray(sr), ds,
                                          gt_hr=jnp.asarray(hr)))
    t_hr = torch.nn.functional.interpolate(
        torch.from_numpy(hr), scale_factor=1 / ds, mode="bilinear",
        align_corners=True, antialias=True)
    t_sr = torch.nn.functional.interpolate(
        torch.from_numpy(sr), scale_factor=1 / ds, mode="bilinear",
        align_corners=True, antialias=True)
    ref = float(torch.nn.functional.l1_loss(t_hr, t_sr))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
